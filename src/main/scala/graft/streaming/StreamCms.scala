package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed Count–Min sketch over an unbounded keyed stream — the
  * production form behind q124 (`StreamReplay.streamCmsGate` replays
  * the fixture slice through exactly this transform).
  *
  * Per event-time window the stream state is ONLY the d×w counter
  * grid — O(depth·width), independent of key cardinality — versus
  * key-scale state for exact counting; watermark finalizes each
  * window's grid as append output. A CMS cell is an exact count of a
  * hashed bucket, so stream ≡ batch by construction whatever the
  * micro-batch chunking, and estimates carry the standard CMS
  * contract: one-sided (est ≥ exact) with overshoot ≤ εN at
  * ε = e/width per row, taken to the min over `depth` rows.
  * Hashes are seeded xxhash64(key, row) — deterministic across
  * partitionings, batch/stream, and engines. */
object StreamCms {

  /** Finalized per-window grid cells `(window_start, r, c, cell)`.
    * Works over both streaming and batch frames (same plan). */
  def windowedCells(events: DataFrame, tsCol: String,
      keyCol: org.apache.spark.sql.Column, windowDur: String,
      watermarkDelay: String, width: Int = 1024, depth: Int = 5): DataFrame = {
    require(width >= 2 && depth >= 1, s"bad CMS shape: w=$width d=$depth")
    val rows = array((0 until depth).map(lit): _*)
    events
      .select(col(tsCol).as("__ts"), keyCol.as("__key"))
      .withWatermark("__ts", watermarkDelay)
      .select(col("__ts"), col("__key"), explode(rows).as("r"))
      .withColumn("c", pmod(xxhash64(col("__key"), col("r")), lit(width)))
      .groupBy(window(col("__ts"), windowDur), col("r"), col("c"))
      .agg(count(lit(1)).as("cell"))
      .select(col("window.start").as("window_start"),
        col("r"), col("c"), col("cell"))
  }
}
