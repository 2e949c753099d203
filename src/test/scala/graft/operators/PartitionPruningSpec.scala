package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition pruning as a plan property: a predicate on the hive
  * partition column must reach the scan as a PartitionFilter (pruned
  * at planning/listing time — directories never read), not as a
  * post-scan data filter. */
class PartitionPruningSpec extends SparkSpec {

  test("year predicate on a partitioned table prunes to matching partitions") {
    val t = sf001
    val path = "target/test-partitioned/lineitem_by_year"
    Bucketing.writePartitioned(
      t.lineitem.withColumn("ship_year", year(col("l_shipdate"))),
      path, "ship_year")

    val pruned = spark.read.parquet(path).filter(col("ship_year") === 1997)
    // sparkPlan (pre-AQE-wrapping) exposes the file scan directly
    val scan = pruned.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec leaf"))

    assert(scan.toString.contains("PartitionFilters") &&
      scan.toString.contains("ship_year"),
      s"partition filter did not reach the scan:\n$scan")
    // the pruned scan must read strictly fewer partitions than exist
    val allYears = spark.read.parquet(path)
      .select("ship_year").distinct().count()
    assert(allYears > 1, "fixture spans multiple years")
    val prunedParts = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).length
    assert(prunedParts === 1, s"expected exactly one partition read, got $prunedParts")
    // correctness: pruned read equals post-hoc filter of a full read
    val full = spark.read.parquet(path)
      .filter(col("ship_year") === 1997).count()
    assert(pruned.count() === full)
  }
}
