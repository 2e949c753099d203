package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q172: streaming CDC upsert — the foreachBatch fold must equal the
  * one-shot batch snapshot regardless of micro-batch chunking (the
  * stream ≡ batch contract every replay query carries). */
class StreamCdcSpec extends SparkSpec {

  test("streamed upsert snapshot equals the batch latest-wins snapshot") {
    import spark.implicits._
    val streamed = StreamCdc.cdcUpsert(spark, sf001.dir)
    // batch truth: the full change log filtered to the replayed slice
    // (same week cutoff), folded once
    val cutoff = to_timestamp(lit("2024-01-08 00:00:00"))
    val log = graft.operators.Cdc.eventChangeLog(sf001)
    val slice = log.join(
        sf001.events.filter($"ts" < cutoff).select($"event_id".as("seq")),
        Seq("seq"), "left_semi")
      .select("key", "us", "seq", "op", "value", "etype")
    val truth = graft.operators.Cdc.mergeApply(None, slice)
      .select($"key".as("user_id"), $"value", $"etype",
        timestamp_micros($"us").as("updated_ts"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(truth).isEmpty && truth.exceptAll(streamed).isEmpty,
      "foreachBatch fold diverges from the one-shot batch snapshot")
  }

  test("streamed SCD2 history equals the one-shot batch assembly") {
    import spark.implicits._
    val streamed = StreamCdc.scd2Stream(spark, sf001.dir)
    val cutoff = to_timestamp(lit("2024-01-08 00:00:00"))
    val log = graft.operators.Cdc.eventChangeLog(sf001)
    val slice = log.join(
        sf001.events.filter($"ts" < cutoff).select($"event_id".as("seq")),
        Seq("seq"), "left_semi")
      .select("key", "us", "seq", "op", "value", "etype")
    val truth = graft.operators.Cdc.scd2Over(slice)
      .select($"key".as("user_id"), $"value", $"etype",
        timestamp_micros($"valid_from_us").as("valid_from"),
        timestamp_micros($"valid_to_us").as("valid_to"), $"is_current")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(truth).isEmpty && truth.exceptAll(streamed).isEmpty,
      "streamed SCD2 merge diverges from the one-shot assembly")
  }
}
