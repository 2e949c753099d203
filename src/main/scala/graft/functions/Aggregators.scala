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
}
