package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-aware aggregation: two-phase salted groupBy.
  *
  * A plain `groupBy(k).agg(...)` hash-partitions on k; with few hot
  * keys (l_returnflag has 3 values) the whole table lands on ≤3 of
  * 1000 reducers. Salting splits each key into `buckets` subkeys for
  * the first (wide, well-distributed) aggregation, then merges the
  * per-salt partials in a second, tiny aggregation. Works for any
  * algebraic aggregate; here sum/count. AQE's skew handling covers
  * skewed JOINS, but skewed aggregation keys still need this pattern.
  *
  * The DECIMAL accumulation keeps the result bit-identical to the
  * unsalted plan — which is exactly what the oracle checks.
  */
object Skew {

  /** sum+count aggregation over one skewed key, salted into `buckets`
    * partial groups. */
  def saltedSumCount(
      df: DataFrame, key: String, valueExpr: Column, buckets: Int,
      sumName: String, cntName: String): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(key), col("_salt"))
      .agg(
        sum(valueExpr.cast(DecimalType(18, 4))).as("_psum"),
        count(lit(1)).as("_pcnt"))
    partial
      .groupBy(col(key))
      .agg(
        sum(col("_psum")).cast("double").as(sumName),
        sum(col("_pcnt")).as(cntName))
  }

  /** q42: revenue by returnflag — a genuinely skewed key (3 values
    * across the whole lineitem table) — via the salted two-phase plan.
    * Result must equal the direct GROUP BY (the oracle). */
  def saltedRevenue(t: Tables): DataFrame = {
    import t.spark.implicits._
    saltedSumCount(
      t.lineitem, "l_returnflag",
      $"l_extendedprice" * (lit(1) - $"l_discount"),
      buckets = 32, sumName = "revenue", cntName = "n_rows")
      .orderBy($"l_returnflag")
  }
}
