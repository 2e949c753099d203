package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q177: streaming view maintenance — the foreachBatch fold must equal
  * the from-scratch aggregate regardless of micro-batch chunking. */
class StreamIvmSpec extends SparkSpec {

  test("streamed rollup equals the one-shot aggregation") {
    import spark.implicits._
    val streamed = StreamIvm.orderRollup(spark, sf001.dir)
    val truth = sf001.orders
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).cast("double")
          / 100.0).as("total_price"),
        (min(floor($"o_totalprice" * 100 + 0.5).cast("long")).cast("double")
          / 100.0).as("min_price"),
        (max(floor($"o_totalprice" * 100 + 0.5).cast("long")).cast("double")
          / 100.0).as("max_price"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(truth).isEmpty && truth.exceptAll(streamed).isEmpty,
      "streamed view fold diverges from one-shot aggregation")
  }
}
