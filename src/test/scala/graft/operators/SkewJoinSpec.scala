package graft.operators

import org.apache.spark.sql.functions._

/** AQE must split skewed join partitions at runtime — the engine-side
  * half of the skew story (operators/Skew covers skewed AGGREGATION
  * with salting; joins rely on AQE's runtime re-plan, which this spec
  * pins down with thresholds scaled to fixture size).
  *
  * Two ingredients this spec documents because both silently disable
  * the optimization when missing:
  *  - the hot partition must come from MULTIPLE map tasks — AQE splits
  *    a skewed reducer partition along map-output ranges, so a
  *    single-mapper stage (one small parquet file) cannot be split;
  *  - no downstream operator may require the join's hash partitioning
  *    (the split breaks strict hash distribution, and AQE won't add a
  *    recovery shuffle unless forceOptimizeSkewedJoin is set).
  */
class SkewJoinSpec extends graft.SparkSpec {
  import spark.implicits._

  test("AQE marks and splits the skewed partition in a sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // fixture-scale thresholds: the real defaults (256 MB) are sized
    // for cluster partitions; the MECHANISM under test is identical
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 90% of lineitem lands on key 1 — one hot shuffle partition,
      // fed by 8 mappers so it is splittable by map-output ranges
      val left = sf001.lineitem.repartition(8).select(
        when($"l_orderkey" % 10 =!= 0, lit(1L)).otherwise($"l_orderkey").as("k"),
        $"l_quantity")
      // orders keys are unique → no fan-out, and no post-shuffle
      // operator sits between the sort and the shuffle stage
      val right = sf001.orders.select($"o_orderkey".as("k"), $"o_totalprice")
      val joined = left.join(right, "k")
      // execute THIS QueryExecution (a write/count would plan its own
      // copy and the inspected plan would never finalize)
      val nRows = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n$plan")
      assert(plan.contains("AQEShuffleRead skewed"), s"no skewed shuffle read:\n$plan")
      assert(nRows.toLong === left.count()) // unique right keys: no fan-out
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
