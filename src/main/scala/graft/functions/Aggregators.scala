package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, struct, udaf}

/** Custom typed aggregates (`Aggregator[IN, BUF, OUT]` registered via
  * `udaf`) — SURVEY.md §2.5's "typed aggregates" row.
  *
  * WeightedMean accumulates exact BigDecimals (inputs are pre-cast to
  * DECIMAL by the caller), so merges are order-independent — the same
  * determinism-under-partitioning property as the DECIMAL sums in
  * Relational — and the final double division matches the oracle's
  * CAST(SUM(..) AS DOUBLE)/CAST(SUM(..) AS DOUBLE) bit-for-bit.
  */
object Aggregators {

  type Buf = (BigDecimal, BigDecimal)

  /** Weighted mean: sum(w·x)/sum(w) over exact decimal inputs. */
  object WeightedMean extends Aggregator[(BigDecimal, BigDecimal), Buf, Double] {
    override def zero: Buf = (BigDecimal(0), BigDecimal(0))
    override def reduce(b: Buf, in: (BigDecimal, BigDecimal)): Buf = {
      val (wx, w) = in
      (b._1 + (if (wx == null) BigDecimal(0) else wx),
        b._2 + (if (w == null) BigDecimal(0) else w))
    }
    override def merge(a: Buf, b: Buf): Buf = (a._1 + b._1, a._2 + b._2)
    override def finish(b: Buf): Double =
      if (b._2.signum == 0) Double.NaN else b._1.toDouble / b._2.toDouble
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: weighted_mean(x·w as decimal, w as decimal). */
  def weightedMean(wx: Column, w: Column): Column =
    udaf(WeightedMean, Encoders.product[(BigDecimal, BigDecimal)])
      .apply(wx, w)

  /** Convenience: weighted mean of `x` with weights `w`, with the
    * products cast to DECIMAL(18,4) / DECIMAL(18,2) exactly like the
    * oracle SQL does. */
  def weightedMeanOf(x: Column, w: Column): Column =
    weightedMean(
      (x * w).cast(org.apache.spark.sql.types.DecimalType(18, 4)),
      w.cast(org.apache.spark.sql.types.DecimalType(18, 2)))

  /** Mergeable Misra–Gries heavy-hitters summary: at most k−1
    * (item, weight) entries, with the FREQUENT-algorithm guarantee
    * that every item of true count > N/k appears in the summary
    * (estimate ≥ true − N/k > 0). Partial aggregation applies — each
    * partition builds its own summary, merges subtract the k-th
    * largest weight (Agarwal et al., "Mergeable Summaries", PODS'12,
    * which preserves the N/k error bound) — so memory is O(k) per
    * task regardless of corpus size, unlike an exact word count whose
    * hash map is vocabulary-sized. TextOps.heavyHittersExact composes
    * this with a candidates-only exact second pass into exact
    * above-threshold counts (q106). */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, s"k must be >= 2, got $k")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
      b.get(w) match {
        case Some(c) => b.updated(w, c + 1)
        case None if b.size < k - 1 => b.updated(w, 1L)
        case None => b.flatMap { case (kk, v) =>
          if (v > 1) Some(kk -> (v - 1)) else None }
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (m, (kk, v)) =>
        m.updated(kk, m.getOrElse(kk, 0L) + v) }
      if (combined.size <= k - 1) combined
      else {
        // subtract the k-th largest weight: at most k-1 entries stay
        val kth = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
        combined.flatMap { case (kk, v) =>
          if (v > kth) Some(kk -> (v - kth)) else None }
      }
    }
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: misra_gries(word) → map<string, long> summary. */
  def misraGries(word: Column, k: Int): Column =
    udaf(new MisraGries(k), Encoders.STRING).apply(word)
}
