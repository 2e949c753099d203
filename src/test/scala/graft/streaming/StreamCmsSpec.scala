package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q124 contract: a CMS cell is an exact count of a hashed bucket, so
  * the streaming windowed aggregation must produce gate rows whose
  * engine-neutral half (window, user, n_exact) equals the pure batch
  * computation, with every bound met — stream ≡ batch regardless of
  * how the replay chunks the slice. */
class StreamCmsSpec extends SparkSpec {
  import spark.implicits._

  test("q124 streaming CMS gate equals the batch top-k truth and meets every bound") {
    val got = StreamReplay.streamCmsGate(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.nonEmpty)
    assert(got.forall(_._4), s"bound violated: ${got.filterNot(_._4).toSeq}")
    // batch truth: per-day top-5 users by exact count (count desc, id)
    val t = sf001
    val ev = t.events
      .filter(col("ts") < to_timestamp(lit("2024-01-08 00:00:00")))
      .select(window(col("ts"), "1 day").getField("start").as("w"), col("user_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w")).orderBy(col("n").desc, col("user_id"))
    val want = ev.groupBy(col("w"), col("user_id")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("w"), col("user_id"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.map(r => (r._1, r._2, r._3)).toSet === want)
    // per window exactly 5 tracked users (or the whole window if fewer)
    val perWin = got.groupBy(_._1).map(_._2.size)
    assert(perWin.forall(_ <= 5))
  }
}
