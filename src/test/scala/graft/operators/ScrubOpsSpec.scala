package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts + scale-shape of the scrubbing/curation stages
  * (q74–q78). Cross-engine value parity is the DuckDB gate's job. */
class ScrubOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii masks every class and counts match on a known fixture") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.co and eve@ex.org, call 415-555-0042"),
      (2L, "server at 192.168.0.1 or 10.0.300.7 no mail"),
      (3L, "plain words only"),
      (4L, "reach me at 10.1.2.3@corp.example.com")).toDF("id", "txt")
    val got = ScrubOps.redactPiiOver(df, $"id", $"txt")
      .orderBy($"doc_id").collect()
    assert(got(0).getAs[Int]("n_emails") === 2)
    assert(got(0).getAs[Int]("n_phones") === 1)
    assert(got(0).getAs[String]("clean_text") ===
      "mail <EMAIL> and <EMAIL>, call <PHONE>")
    // \d{1,3} is a syntactic net, not semantic IPv4 validation: 300 matches
    assert(got(1).getAs[Int]("n_ips") === 2)
    assert(got(1).getAs[String]("clean_text") === "server at <IP> or <IP> no mail")
    assert(got(2).toSeq.drop(1) === Seq(0, 0, 0, "plain words only"))
    // counts reconcile with the masks actually applied: the dotted
    // local part is consumed by the email mask, so it is NOT an IP
    assert(got(3).toSeq.drop(1) === Seq(1, 0, 0, "reach me at <EMAIL>"))
  }

  test("redactPii and stripMarkup plans: zero shuffles — pure projections") {
    for (body <- Seq(
        ScrubOps.redactPiiOver(sf001.documents, $"doc_id", $"text"),
        ScrubOps.stripMarkupOver(sf001.documents, $"doc_id", $"text"))) {
      val plan = body.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"scrub stage should not shuffle:\n$plan")
    }
  }

  test("stripMarkup removes tags/emphasis, keeps link anchor text") {
    val df = Seq(
      (1L, "<h1>T</h1> **bold** [anchor](https://x.y/z?a=(1)) tail <br/>"),
      (2L, "no markup at all")).toDF("id", "txt")
    val got = ScrubOps.stripMarkupOver(df, $"id", $"txt").orderBy($"doc_id").collect()
    // `[^)]*` stops at the FIRST ')' — parens inside URLs survive; the
    // oracle applies the same rule, so this pins the shared contract
    assert(got(0).getAs[String]("clean_text") === "T bold anchor) tail ")
    assert(got(0).getAs[Int]("removed_chars") ===
      "<h1>T</h1> **bold** [anchor](https://x.y/z?a=(1)) tail <br/>".length
        - "T bold anchor) tail ".length)
    assert(got(1).getAs[String]("clean_text") === "no markup at all")
    assert(got(1).getAs[Int]("removed_chars") === 0)
  }

  test("urlDomains counts urls and distinct docs per host") {
    val df = Seq(
      (1L, "a https://a.example.org/x b http://b.example.net/y"),
      (2L, "c https://a.example.org/z https://a.example.org/w"),
      (3L, "no urls")).toDF("id", "txt")
    val got = ScrubOps.urlDomainsOver(df, $"id", $"txt")
      .orderBy($"domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("a.example.org", 3L, 2L), ("b.example.net", 1L, 1L)))
  }

  test("stratifiedSample: exact n per stratum, deterministic, salt-invariant") {
    val docs = sf001.documents
    val s1 = ScrubOps.stratifiedSampleOver(docs, $"lang", $"doc_id", 5, saltParts = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // same membership under a different salting — salting steers only
    // parallelism, never the sample
    val s2 = ScrubOps.stratifiedSampleOver(docs, $"lang", $"doc_id", 5, saltParts = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s1 === s2)
    val perStratum = s1.groupBy(_._1).map { case (l, rows) => l -> rows.size }
    val strataSizes = docs.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, size) <- strataSizes)
      assert(perStratum.getOrElse(lang, 0) === math.min(5L, size).toInt,
        s"stratum $lang: expected min(5, $size)")
    // matches the naive single-window reference exactly
    val naive = docs
      .select($"lang", $"doc_id",
        md5(concat(lit("smp:"), $"doc_id".cast("string"))).as("rk"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"rk", $"doc_id")))
      .filter($"rn" <= 5).select($"lang", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s1 === naive)
  }

  test("intervalJoin equals the naive non-equi join on the events fixture") {
    val t = sf001
    val got = EventOps.purchaseWindowEvents(t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = t.events.select($"event_id", $"user_id", unix_micros($"ts").as("us"))
    val w = t.events.filter($"event_type" === "purchase")
      .select($"event_id".as("w_id"), $"user_id".as("w_user"), unix_micros($"ts").as("w_us"))
    val naive = ev.join(w,
        $"user_id" === $"w_user" && $"us" >= $"w_us" &&
          $"us" < $"w_us" + 1800L * 1000000L && $"event_id" =!= $"w_id")
      .select($"w_id", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(got.nonEmpty, "fixture should produce at least one contained event")
  }

  test("intervalJoin plan: equi-join on (key, bucket), no cartesian") {
    val plan = EventOps.purchaseWindowEvents(sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join must stay an equi-join:\n$plan")
  }

  test("intervalJoin handles multi-bucket windows and empty intervals") {
    val wins = Seq((1L, 7L, 100L, 350L), (2L, 7L, 400L, 400L)) // second is empty
      .toDF("win_id", "key", "start_us", "end_us")
    val pts = Seq((10L, 7L, 100L), (11L, 7L, 349L), (12L, 7L, 350L), (13L, 8L, 200L))
      .toDF("pt_id", "key", "pt_us")
    val got = EventOps.intervalJoinOver(
        wins, $"win_id", $"key", $"start_us", $"end_us",
        pts, $"pt_id", $"key", $"pt_us", bucketUs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // [100,350) spans buckets 1..3; point at 350 excluded (half-open),
    // other-key point excluded, empty window matches nothing — and no
    // duplicate rows despite the window living in 3 buckets
    assert(got === Set((1L, 10L, 0L), (1L, 11L, 249L)))
  }

  test("transitionMatrix rows are probability distributions per prev state") {
    val m = EventOps.transitionMatrix(sf001)
    val sums = m.groupBy("prev_type")
      .agg(org.apache.spark.sql.functions.sum("p").as("total")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12,
      s"${r.getString(0)} rows sum to ${r.getDouble(1)}"))
    assert(m.filter(col("p") < 0 || col("p") > 1).count() === 0)
  }

  test("cohortRetention: activity weeks never precede the cohort week, cohort sizes at week 0") {
    val r = EventOps.cohortRetention(sf001)
    assert(r.filter(col("week") < col("cohort_week")).count() === 0)
    // at (cohort_week, cohort_week) every cohort member is active by definition:
    // that cell is the max over the cohort's row
    val diag = r.filter(col("week") === col("cohort_week"))
      .select(col("cohort_week"), col("n_active").as("size"))
    val bad = r.join(diag, "cohort_week").filter(col("n_active") > col("size"))
    assert(bad.count() === 0)
  }

  test("conversionLatency: non-negative, consistent with the raw event stream") {
    val c = EventOps.conversionLatency(sf001)
    assert(c.filter(col("latency_s") < 0).count() === 0)
    assert(c.filter(col("purchase_ts") < col("signup_ts")).count() === 0)
    assert(c.count() > 0)
  }

  test("locfResample carries the last observation forward onto the fixture grid") {
    val got = EventOps.locfResample(sf001).collect()
    assert(got.nonEmpty)
    // per user, last_value changes only at grid points with a fresh
    // event in between — so along the grid, last_ts is non-decreasing
    val byUser = got.groupBy(_.getLong(0))
    byUser.values.foreach { rows =>
      val ts = rows.sortBy(_.getTimestamp(1).getTime).map(_.getTimestamp(3).getTime)
      assert(ts.zip(ts.tail).forall { case (a, b) => a <= b },
        "carry-forward timestamp went backwards")
    }
    // sentinel rows (grid before first event) use the q40 convention
    val sentinels = got.filter(_.getDouble(2) == -1.0)
    assert(sentinels.forall(_.getTimestamp(3).getTime == 0L))
    // every user has the same grid length (shared global span)
    val sizes = byUser.values.map(_.length).toSet
    assert(sizes.size === 1)
  }
}
