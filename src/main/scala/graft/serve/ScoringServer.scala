package graft.serve

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.ml.{PlayRequest, Scorer}
import org.apache.spark.sql.DataFrame

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** JSON scoring service — the Spark-native rebuild of the reference's
  * Flask app (`assets/app_nfl.py:282-316`): same `/api` request and
  * response fields, no Py4J boundaries, models preloaded once.
  *
  * Endpoints:
  *  - POST /api  {qtr,down,TimeSecs,yrdline100,ydstogo,ydsnet,
  *                month_day,posteam,DefensiveTeam,PlayType_lag}
  *           →  {best_play, passing_yards, running_yards}
  *  - GET  /play/{n}  replay cursor over the historical table (the
  *    reference's form pre-fill semantics, JSON instead of HTML;
  *    `assets/app_nfl.py:68-71,247-248`).
  *  - GET  /health
  *
  * Uses the JDK's HttpServer (build.sbt is offline; SURVEY.md §7) and
  * Jackson from Spark's own classpath for JSON.
  */
final class ScoringServer(scorer: Scorer, replayTable: DataFrame, port: Int = 0) {

  private val mapper = new ObjectMapper()

  /** Replay rows cached driver-side once — the reference holds the full
    * 29k-row table in memory the same way (`assets/app_nfl.py:42-65`). */
  private lazy val replayRows: Array[Map[String, Any]] = {
    val cols = Seq("qtr", "down", "TimeSecs", "yrdline100", "ydstogo",
      "ydsnet", "month_day", "posteam", "DefensiveTeam", "PlayType_lag")
    replayTable.selectExpr(cols: _*).collect()
      .map(r => cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
  }

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def err(ex: HttpExchange, code: Int, msg: String): Unit =
    respond(ex, code, s"""{"error":${mapper.writeValueAsString(msg)}}""")

  private object ApiHandler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        if (ex.getRequestMethod != "POST") { err(ex, 405, "POST required"); return }
        val json: JsonNode = mapper.readTree(ex.getRequestBody)
        def intField(n: String): Int = {
          val f = json.get(n)
          if (f == null || !f.canConvertToInt)
            throw new IllegalArgumentException(s"missing/invalid int field: $n")
          f.asInt()
        }
        def strField(n: String): String = {
          val f = json.get(n)
          if (f == null || !f.isTextual)
            throw new IllegalArgumentException(s"missing/invalid string field: $n")
          f.asText()
        }
        val req = PlayRequest(
          qtr = intField("qtr"), down = intField("down"),
          TimeSecs = intField("TimeSecs"), yrdline100 = intField("yrdline100"),
          ydstogo = intField("ydstogo"), ydsnet = intField("ydsnet"),
          month_day = intField("month_day"), posteam = strField("posteam"),
          DefensiveTeam = strField("DefensiveTeam"),
          PlayType_lag = strField("PlayType_lag"))
        // local fast path: no Spark job per request (same doubles as
        // the transform path, asserted in PlayPipelineSpec)
        val p = scorer.scoreOneFast(req)
        respond(ex, 200,
          s"""{"best_play":${mapper.writeValueAsString(p.bestPlay)},""" +
            s""""passing_yards":${p.passingYards},"running_yards":${p.runningYards}}""")
      } catch {
        case e: IllegalArgumentException => err(ex, 400, e.getMessage)
        case e: Exception => err(ex, 500, s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
  }

  private object PlayHandler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val n = ex.getRequestURI.getPath.stripPrefix("/play/").toInt
        if (n < 0 || n >= replayRows.length) { err(ex, 404, s"row $n out of range"); return }
        respond(ex, 200, mapper.writeValueAsString(
          replayRows(n).map { case (k, v) => k -> String.valueOf(v) }
            .foldLeft(mapper.createObjectNode()) { case (o, (k, v)) => o.put(k, v); o }))
      } catch {
        case _: NumberFormatException => err(ex, 400, "bad row number")
        case e: Exception => err(ex, 500, e.getMessage)
      }
  }

  def start(): Unit = {
    server.createContext("/api", ApiHandler)
    server.createContext("/play/", PlayHandler)
    server.createContext("/health",
      (ex: HttpExchange) => respond(ex, 200, """{"status":"ok"}"""))
    server.setExecutor(null) // serial, like the reference's threaded=False
    server.start()
  }

  def stop(): Unit = server.stop(0)
}
