package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-side half of the dedup
  * story (batch-side: operators/Dedup, TextOps.exactDedup). A document
  * stream is deduplicated by content fingerprint as it arrives, so
  * downstream training-data storage never sees the duplicate bytes.
  *
  * Scale/state design: state per distinct fingerprint is 16 bytes
  * (md5), NOT the document text, and `dropDuplicatesWithinWatermark`
  * expires state once the watermark passes — bounded memory no matter
  * how long the stream runs. Exactly-once emission of the FIRST
  * occurrence; duplicates arriving within the watermark horizon are
  * dropped (beyond it they are by definition no longer tracked — the
  * horizon is the dedup guarantee window).
  */
object StreamDedup {

  /** NOTE: the fingerprint column is part of the state-store key
    * schema — changing its type (e.g. hex string ↔ binary) is a
    * checkpoint-breaking change requiring a fresh checkpoint location.
    *
    * @param docs   streaming DataFrame with an event-time column and a
    *               text column
    * @param tsCol  event-time column name (watermark anchor)
    * @param textCol document text column name
    * @param delay  watermark delay, e.g. "10 minutes" — also the
    *               horizon within which duplicates are guaranteed caught
    */
  def dedupedByContent(
      docs: DataFrame, tsCol: String, textCol: String, delay: String): DataFrame =
    docs
      // unhex → 16-byte binary fingerprint; md5's hex STRING would
      // double the per-key state store footprint
      .withColumn("fp", unhex(md5(col(textCol))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
}
