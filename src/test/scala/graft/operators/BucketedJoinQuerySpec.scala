package graft.operators

/** q116's plan contract: the declared query's fact-fact join runs
  * through the bucketed layout with ZERO exchange operators — the
  * storage-layout property the one-time bucket write buys. */
class BucketedJoinQuerySpec extends graft.SparkSpec {

  test("q116's co-located join plans with no Exchange; only the final agg shuffles") {
    val join = Bucketing.bucketedOrderJoin(sf001)
    val joinPlan = join.queryExecution.executedPlan.toString
    assert(joinPlan.contains("SortMergeJoin"),
      s"expected the forced sort-merge path:\n$joinPlan")
    assert(!joinPlan.contains("Exchange"),
      s"expected shuffle-free bucketed join:\n$joinPlan")
    // the full declared query only shuffles for the 5-group aggregate
    val full = Bucketing.bucketedRevenueByPriority(sf001)
    val fullPlan = full.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(fullPlan).length
    assert(exchanges <= 2, // partial->final agg (+ the orderBy range exchange)
      s"unexpected exchanges ($exchanges) in:\n$fullPlan")
    // and the layout changes nothing about the values
    val viaBuckets = full.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val plain = sf001.lineitem
      .join(sf001.orders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
        .cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(viaBuckets === plain)
    assert(viaBuckets.nonEmpty)
  }
}
