package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming EWMA: O(1)-state fold ≡ the batch sequential fold, and
  * the event-time-timeout flush semantics. */
class StreamEwmaSpec extends graft.SparkSpec {
  import spark.implicits._
  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("quiet-flush emits the exact sequential fold; a later burst starts fresh") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = StreamEwma.ewmaPerUser(
      input.toDS().withWatermark("ts", "0 seconds"),
      alpha = 0.5, quietMs = 10 * 60 * 1000)
      .writeStream.outputMode("append")
      .format("memory").queryName("sewma").start()
    try {
      // burst of three values; fold = ((1.0·0.5+3.0·0.5)·0.5+5.0·0.5)
      input.addData(
        UserEvent(1, ts("2024-01-01 00:00:00"), 1, "a", 1.0),
        UserEvent(2, ts("2024-01-01 00:01:00"), 1, "a", 3.0),
        UserEvent(3, ts("2024-01-01 00:02:00"), 1, "a", 5.0))
      q.processAllAvailable()
      // another user an hour later → watermark passes 00:02 + 10 min
      input.addData(UserEvent(4, ts("2024-01-01 01:00:00"), 2, "a", 7.0))
      q.processAllAvailable()
      // and one more advance so user 2's own quiet horizon passes
      input.addData(UserEvent(5, ts("2024-01-01 03:00:00"), 3, "a", 0.0))
      q.processAllAvailable()
      val got = spark.table("sewma").as[UserEwma].collect()
        .map(e => e.user_id -> ((e.n_events, e.ewma_value))).toMap
      val expect1 = (1.0 * 0.5 + 3.0 * 0.5) * 0.5 + 5.0 * 0.5
      assert(got(1L) === ((3L, expect1)))
      assert(got(2L) === ((1L, 7.0)))
      // user 1 events after the flush start a NEW segment (state was
      // removed) — streaming quiet-segment semantics
      input.addData(UserEvent(6, ts("2024-01-01 04:00:00"), 1, "a", 9.0))
      input.addData(UserEvent(7, ts("2024-01-01 06:00:00"), 9, "a", 0.0))
      q.processAllAvailable()
      val again = spark.table("sewma").as[UserEwma].collect()
        .filter(_.user_id == 1L).map(e => (e.n_events, e.ewma_value)).toSet
      assert(again === Set((3L, expect1), (1L, 9.0)), s"got $again")
    } finally q.stop()
  }

  test("stream fold over micro-batches equals the batch operator (q70) on the fixture") {
    val t = sf001
    // batch q70 per-user EWMA, keyed map
    val want = graft.operators.EventOps.ewmaPerUser(t).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getDouble(2)))).toMap
    // stream the WHOLE events table (no cutoff) in 3 ts-ordered
    // chunks through the streaming fold, flush far in the future
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val rows = t.events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .orderBy($"ts", $"event_id").as[UserEvent].collect().toSeq
    val sentinel = UserEvent(-1L,
      new java.sql.Timestamp(rows.map(_.ts.getTime).max + 366L * 86400000L),
      -1L, "__flush__", 0.0)
    val input = MemoryStream[UserEvent]
    val q = StreamEwma.ewmaPerUser(
      input.toDS().withWatermark("ts", "0 seconds"),
      alpha = 0.5, quietMs = 180L * 86400000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sewma_fix").start()
    try {
      (rows.grouped((rows.length + 2) / 3).toSeq ++ Seq(Seq(sentinel), Seq(sentinel)))
        .foreach { c => input.addData(c); q.processAllAvailable() }
      val got = spark.table("sewma_fix").as[UserEwma].collect()
        .filter(_.user_id >= 0)
        .map(e => e.user_id -> ((e.n_events, e.ewma_value))).toMap
      assert(got === want, "stream EWMA != batch EWMA")
    } finally q.stop()
  }
}
