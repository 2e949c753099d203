package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming heavy hitters — the ingest-side half of the q106 exact
  * two-pass Misra–Gries pipeline (SURVEY §2 sketch family; north-star
  * scope). Per event-time window, the stream folds into the SAME
  * mergeable FREQUENT summary the batch path uses
  * ([[graft.functions.Aggregators.MisraGries]]), so a window's
  * finalized summary carries the identical guarantee: every item with
  * true in-window count > N/k is present, with estimate ≥ true − N/k.
  *
  * Scale/state design: state per open window is one ≤ (k−1)-entry map
  * plus a count — O(k), independent of item cardinality and rate
  * (the property that makes a sketch streamable at all); partial
  * aggregation applies within each micro-batch exactly as it does
  * across batch partitions (Mergeable Summaries, PODS'12). The
  * watermark finalizes windows in append mode, so downstream gets one
  * immutable summary row per window — ready for the batch second pass
  * (candidates-only exact count, as q106 does) wherever exactness is
  * required after the fact.
  */
object StreamHeavyHitters {

  /** @param items     streaming DataFrame with an event-time column
    *                  and an item column
    * @param windowDur tumbling-window duration, e.g. "1 minute"
    * @param delay     watermark delay — how late an item may arrive
    *                  and still count toward its window
    * @param k         summary size: guarantees capture of all items
    *                  with in-window frequency > 1/k
    */
  def windowedCandidates(
      items: DataFrame, tsCol: String, itemCol: String,
      windowDur: String, delay: String, k: Int): DataFrame =
    items
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur))
      .agg(
        graft.functions.Aggregators.misraGries(col(itemCol), k).as("summary"),
        count(lit(1)).as("n_total"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("summary"), col("n_total"))
}
