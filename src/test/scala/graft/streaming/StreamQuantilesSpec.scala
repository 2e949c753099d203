package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Contract of the streaming windowed quantile sketch: finalized
  * windows honor the N/accuracy rank bound and the stream result
  * matches the same aggregation applied in batch. */
class StreamQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("finalized windows honor the rank-error bound and match batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val values = input.toDF().toDF("ts", "v")

    // window 1: values 1..200 shuffled deterministically; window 2: 1..50
    val r = new scala.util.Random(11)
    val w1 = r.shuffle((1 to 200).toVector).map(v => (ts("2024-01-01 00:00:10"), v.toDouble))
    val w2 = r.shuffle((1 to 50).toVector).map(v => (ts("2024-01-01 00:01:10"), v.toDouble))

    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val q = StreamQuantiles.windowed(
      values, "ts", "v", "1 minute", "30 seconds", qs, accuracy = 1000)
      .writeStream.outputMode("append")
      .format("memory").queryName("squant").start()
    try {
      input.addData(w1: _*)
      q.processAllAvailable()
      input.addData(w2: _*)
      q.processAllAvailable()
      input.addData((ts("2024-01-01 00:10:00"), 0.0))
      q.processAllAvailable()

      val rows = spark.table("squant").orderBy("window_start").collect()
        .map(r => (r.getSeq[Double](2), r.getLong(3)))
      assert(rows.length === 2, s"expected both windows finalized")

      // rank bound per window: value's exact rank within target ± N/acc
      for (((vals, n), src) <- rows.zip(Seq(w1, w2)); (v, quant) <- vals.zip(qs)) {
        val sorted = src.map(_._2).sorted
        val lo = sorted.count(_ < v)
        val hi = sorted.count(_ <= v)
        val target = quant * n
        val err = n.toDouble / 1000
        assert(hi >= target - err - 1 && lo <= target + err + 1,
          s"rank bound violated: q=$quant v=$v ranks($lo,$hi] target=$target n=$n")
      }
      // stream ≡ batch: same agg over the union gives the same windows
      val batch = StreamQuantiles.windowed(
        (w1 ++ w2).toDF("ts", "v"), "ts", "v", "1 minute", "30 seconds", qs, 1000)
        .orderBy("window_start").collect()
        .map(r => (r.getSeq[Double](2), r.getLong(3)))
      assert(batch.toSeq === rows.toSeq)
    } finally q.stop()
  }
}
