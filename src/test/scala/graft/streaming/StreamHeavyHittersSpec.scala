package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Contract of the streaming Misra–Gries window summaries: finalized
  * windows carry every above-threshold item with the N/k error bound,
  * the summary never exceeds k−1 entries, and the stream result
  * matches the same aggregation applied in batch. */
class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("finalized windows capture every >N/k item within the error bound") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "word")

    // window 1: 60 events, "hot" 30× (50%), tail of 30 distinct rares;
    // window 2: "warm" 12× of 20 (60%)
    val w1 = (1 to 30).map(i => (ts("2024-01-01 00:00:10"), "hot")) ++
      (1 to 30).map(i => (ts("2024-01-01 00:00:20"), s"rare_$i"))
    val w2 = (1 to 12).map(_ => (ts("2024-01-01 00:01:10"), "warm")) ++
      (1 to 8).map(i => (ts("2024-01-01 00:01:20"), s"tail_$i"))

    val k = 5
    val q = StreamHeavyHitters.windowedCandidates(
      events, "ts", "word", "1 minute", "30 seconds", k)
      .writeStream.outputMode("append")
      .format("memory").queryName("shh").start()
    try {
      input.addData(w1: _*)
      q.processAllAvailable()
      input.addData(w2: _*)
      q.processAllAvailable()
      // advance the watermark far past both windows to finalize them
      input.addData((ts("2024-01-01 00:10:00"), "flush"))
      q.processAllAvailable()

      val rows = spark.table("shh").orderBy("window_start").collect()
        .map(r => (r.getTimestamp(0), r.getMap[String, Long](2).toMap, r.getLong(3)))
      assert(rows.length === 2, s"expected both windows finalized: ${rows.toSeq}")

      val Array((_, sum1, n1), (_, sum2, n2)) = rows
      assert(n1 === 60L && n2 === 20L)
      // guarantee: every item with count > N/k survives, estimate ≥ true − N/k
      assert(sum1.contains("hot"), s"window-1 summary lost the 50% item: $sum1")
      assert(sum1("hot") >= 30 - 60 / k)
      assert(sum2.contains("warm"), s"window-2 summary lost the 60% item: $sum2")
      assert(sum2("warm") >= 12 - 20 / k)
      // summaries stay bounded regardless of distinct-item count
      assert(rows.forall(_._2.size <= k - 1))

      // the same aggregation in batch agrees on the heavy item and N
      val batch = StreamHeavyHitters.windowedCandidates(
        (w1 ++ w2).toDF("ts", "word"), "ts", "word", "1 minute", "30 seconds", k)
        .orderBy("window_start").collect()
        .map(r => (r.getMap[String, Long](2).toMap, r.getLong(3)))
      assert(batch.length === 2)
      assert(batch(0)._2 === 60L && batch(0)._1.contains("hot"))
      assert(batch(1)._2 === 20L && batch(1)._1.contains("warm"))
    } finally q.stop()
  }
}
