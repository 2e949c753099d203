package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime filtering — the two optimizer features that matter most at
  * 100 TB and only show up under join-shaped plans:
  *
  *  - Dynamic partition pruning: a selective dimension filter prunes
  *    the fact table's hive partitions AT RUNTIME via a subquery on
  *    the build side — a decade-long fact table reads only the
  *    partitions the dimension predicate selects.
  *  - Runtime bloom-filter injection: for non-partition join keys,
  *    Catalyst plants a bloom filter built from the filtered build
  *    side in front of the probe scan, discarding non-joining rows
  *    before the shuffle.
  *
  * Production defaults leave both on; the size thresholds here are
  * lowered only because the fixture is tiny. */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter dynamically prunes fact partitions") {
    val t = sf001
    val path = "target/test-partitioned/lineitem_by_supp"
    Bucketing.writePartitioned(t.lineitem, path, "l_suppkey")
    val fact = spark.read.parquet(path)
    // the filter is on a NON-join dim column: the matching supplier
    // keys are only known at runtime, so static constraint pushdown
    // can't prune — only DPP's build-side subquery can
    val nk = t.supplier.select(col("s_nationkey")).head().getAs[Number](0).longValue
    val dim = t.supplier.filter(col("s_nationkey") === nk)
      .select(col("s_suppkey"), col("s_name"))
    val joined = withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false") {
      val j = fact.join(dim, fact("l_suppkey") === dim("s_suppkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruningexpression"),
        s"expected dynamic partition pruning in plan:\n$plan")
      j
    }
    // correctness: same rows as the statically-joined plain read
    assert(joined.count() ===
      t.lineitem.join(dim, col("l_suppkey") === col("s_suppkey")).count())
    assert(joined.count() > 0)
  }

  test("selective build side injects a runtime bloom filter on the probe scan") {
    val t = sf001
    val result = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // selective filter on the build side; probe side joins on a
      // non-partition key → bloom, not DPP, is the applicable filter
      val build = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val probe = t.lineitem.select(col("l_orderkey"), col("l_quantity"))
      val j = probe.join(build, probe("l_orderkey") === build("o_orderkey"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom filter (might_contain) in:\n$plan")
      j.count()
    }
    val expected = t.lineitem.join(
      t.orders.filter(col("o_orderpriority") === "1-URGENT"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(result === expected)
  }
}
