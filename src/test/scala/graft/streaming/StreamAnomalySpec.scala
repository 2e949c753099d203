package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming rolling z-score anomalies: immediate in-batch emission,
  * ring-state semantics across micro-batch boundaries, and stream ≡
  * batch (q146) on the fixture. */
class StreamAnomalySpec extends graft.SparkSpec {
  import spark.implicits._
  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("a spike after 5 priors flags in ITS OWN micro-batch, ring spans batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = StreamAnomaly.anomaliesPerUser(
      input.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sanom").start()
    try {
      // 3 priors in batch 1, 2 in batch 2 — the ring must carry over
      input.addData((1 to 3).map(i =>
        UserEvent(i.toLong, ts(f"2024-01-01 00:0$i:00"), 1, "a", 10.0)))
      q.processAllAvailable()
      input.addData((4 to 5).map(i =>
        UserEvent(i.toLong, ts(f"2024-01-01 00:0$i:00"), 1, "a", 10.0)))
      q.processAllAvailable()
      assert(spark.table("sanom").count() === 0, "no anomaly yet")
      // the spike arrives — must emit NOW, without any watermark flush
      input.addData(Seq(UserEvent(6L, ts("2024-01-01 00:06:00"), 1, "a", 99.0)))
      q.processAllAvailable()
      val got = spark.table("sanom").as[AnomalyHit].collect()
      assert(got.length === 1 && got(0).event_id === 6L)
      // σ = 0 window (five equal priors): any deviation flags, z = None
      assert(got(0).z.isEmpty, s"zero-variance window must report no z: $got")
    } finally q.stop()
  }

  test("stream anomalies over micro-batches equal the batch operator (q146) on the fixture") {
    val t = sf001
    val want = graft.operators.EventOps.rollingAnomalies(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(_._1).toList
    implicit val sqlCtx = spark.sqlContext
    val rows = t.events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .orderBy($"ts", $"event_id").as[UserEvent].collect().toSeq
    val sentinel = UserEvent(-1L,
      new java.sql.Timestamp(rows.map(_.ts.getTime).max + 366L * 86400000L),
      -1L, "__flush__", 0.0)
    val input = MemoryStream[UserEvent]
    // quiet horizon past the fixture span — no mid-stream ring reset
    val q = StreamAnomaly.anomaliesPerUser(
      input.toDS().withWatermark("ts", "0 seconds"),
      quietMs = 180L * 86400000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sanom_fix").start()
    try {
      (rows.grouped((rows.length + 2) / 3).toSeq ++ Seq(Seq(sentinel), Seq(sentinel)))
        .foreach { c => input.addData(c); q.processAllAvailable() }
      val got = spark.table("sanom_fix").as[AnomalyHit].collect()
        .filter(_.user_id >= 0)
        .map(h => (h.event_id, h.user_id, h.value, h.z))
        .sortBy(_._1).toList
      assert(got === want, "stream anomalies != batch anomalies")
    } finally q.stop()
  }
}
