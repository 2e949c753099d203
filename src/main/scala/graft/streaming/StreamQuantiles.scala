package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming approximate quantiles — the ingest-side counterpart of
  * the q107 rank-error-gated batch path (SURVEY §2 sketch family;
  * north-star scope). Per event-time window, values fold into Spark's
  * mergeable GK-style `approx_percentile` sketch, carrying the same
  * contract q107 gates in batch: each returned value's exact rank is
  * within N/accuracy of its target rank.
  *
  * Scale/state design: state per open window is one bounded sketch —
  * O(accuracy·log N), independent of value cardinality and rate;
  * partial aggregation merges sketches within and across
  * micro-batches exactly as across batch partitions. The watermark
  * finalizes windows in append mode: downstream receives one
  * immutable quantile row per window, and where after-the-fact
  * exactness matters the batch gate (Relational.approxQuantileGate)
  * re-verifies the rank interval on the stored window.
  */
object StreamQuantiles {

  /** @param values    streaming DataFrame with an event-time column
    *                  and a numeric column
    * @param windowDur tumbling-window duration, e.g. "1 minute"
    * @param delay     watermark delay
    * @param qs        target quantiles in [0, 1]
    * @param accuracy  sketch accuracy: rank error ≤ N/accuracy
    */
  def windowed(
      values: DataFrame, tsCol: String, valueCol: String,
      windowDur: String, delay: String,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      accuracy: Int = 1000): DataFrame =
    values
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur))
      .agg(
        percentile_approx(col(valueCol), lit(qs.toArray), lit(accuracy))
          .as("quantiles"),
        count(lit(1)).as("n_total"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("quantiles"), col("n_total"))
}
