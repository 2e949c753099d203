package graft.serve

import graft.SparkSpec
import graft.ml.{Scorer, TestModels}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

class ScoringServerSpec extends SparkSpec {

  private lazy val server = {
    val models = TestModels.models(spark)
    val s = new ScoringServer(new Scorer(spark, models._1, models._2),
      TestModels.plays(spark), port = 0)
    s.start()
    s
  }
  private lazy val base = s"http://localhost:${server.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private val goldenJson =
    """{"qtr":3,"down":3,"TimeSecs":60,"yrdline100":50,"ydstogo":8,"ydsnet":15,
      |"month_day":920,"posteam":"PIT","DefensiveTeam":"NE","PlayType_lag":"Run"}""".stripMargin

  test("golden request returns the reference response shape with both yardages") {
    val r = post("/api", goldenJson)
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"best_play\":\"Running Play\""))
    assert(r.body().contains("passing_yards") && r.body().contains("running_yards"))
  }

  test("missing field → 400 naming the field") {
    val r = post("/api", """{"qtr":1}""")
    assert(r.statusCode() === 400 && r.body().contains("down"))
  }

  test("non-POST → 405; bad replay row → 404; health → ok") {
    assert(get("/api").statusCode() === 405)
    assert(get("/play/99999999").statusCode() === 404)
    assert(get("/health").body() === """{"status":"ok"}""")
  }

  test("replay cursor returns the first historical play") {
    val r = get("/play/0")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"PlayType_lag\":\"FirstPlay\""))
  }

  test("HTML form page prefills from the replay row and scores a submission") {
    // GET /: form prefilled from historical row 0
    val pageR = get("/?n=0")
    assert(pageR.statusCode() === 200)
    assert(pageR.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
    val page = pageR.body()
    assert(page.contains("<form method=\"POST\""))
    // categorical fields render as the reference's dropdowns: 32 teams
    // for posteam/DefensiveTeam, Run/Pass (+ the out-of-list replay
    // value, still selectable) for PlayType_lag
    assert(page.contains("<select name=\"posteam\">") &&
      page.contains("<select name=\"DefensiveTeam\">"))
    assert("<option value=\"[A-Z]{2,3}\"".r.findAllIn(page).size >= 64)
    assert(page.contains("<option value=\"FirstPlay\" selected>"))
    // POST /: the golden request as a form submission → rendered
    // verdict with both rounded yardages + the advance link
    val form = "qtr=3&down=3&TimeSecs=60&yrdline100=50&ydstogo=8&ydsnet=15" +
      "&month_day=920&posteam=PIT&DefensiveTeam=NE&PlayType_lag=Run"
    val scored = post("/?n=0", form)
    assert(scored.statusCode() === 200)
    assert(scored.body().contains("<b>Running Play</b>"))
    assert(scored.body().contains("id=\"passing_yards\"") &&
      scored.body().contains("id=\"running_yards\""))
    assert(scored.body().contains("href=\"/?n=1\"")) // cursor advanced
    // unknown paths under the root context still 404
    assert(get("/nope").statusCode() === 404)
    // malformed submission → 400 naming the field
    val bad = post("/?n=0", "qtr=notanint")
    assert(bad.statusCode() === 400 && bad.body().contains("qtr"))
  }
}
