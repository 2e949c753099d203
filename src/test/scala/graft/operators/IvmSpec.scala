package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q167: incremental aggregate maintenance — merge ≡ from-scratch for
  * every split of the facts, multi-step roll-forward, and the
  * view-side zero-exchange plan over the bucketed layout. */
class IvmSpec extends SparkSpec {

  private def cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")

  private def scratch = Ivm.partials(sf001.orders, col("o_custkey"), cents)

  test("merged view equals from-scratch aggregation for any date split") {
    import spark.implicits._
    for (cut <- Seq("1994-01-01", "1997-01-01", "1999-01-01")) {
      // the extreme cuts exercise empty-base and empty-delta merges
      val c = lit(s"$cut 00:00:00").cast("timestamp")
      Ivm.buildAggIndex(sf001.orders.filter($"o_orderdate" < c),
        $"o_custkey", cents, "graft_test_ivm")
      val merged = Ivm.mergeDelta(sf001.orders.filter($"o_orderdate" >= c),
        $"o_custkey", cents, "graft_test_ivm")
      assert(merged.exceptAll(scratch).isEmpty &&
        scratch.exceptAll(merged).isEmpty,
        s"incremental merge diverges from scratch at cut $cut")
    }
  }

  test("two-step roll-forward equals one-shot (merge is associative)") {
    import spark.implicits._
    val c1 = lit("1995-01-01 00:00:00").cast("timestamp")
    val c2 = lit("1997-01-01 00:00:00").cast("timestamp")
    Ivm.buildAggIndex(sf001.orders.filter($"o_orderdate" < c1),
      $"o_custkey", cents, "graft_test_ivm_a")
    // roll the first delta forward into a new persisted view
    // (same orphaned-location hygiene as buildAggIndex)
    spark.sql("DROP TABLE IF EXISTS graft_test_ivm_b")
    graft.Tables.deleteRec(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_test_ivm_b"))
    Ivm.mergeDelta(sf001.orders.filter($"o_orderdate" >= c1 && $"o_orderdate" < c2),
        $"o_custkey", cents, "graft_test_ivm_a")
      .write.bucketBy(8, "key").sortBy("key")
      .saveAsTable("graft_test_ivm_b")
    // ...then fold the second delta into THAT
    val merged = Ivm.mergeDelta(sf001.orders.filter($"o_orderdate" >= c2),
      $"o_custkey", cents, "graft_test_ivm_b")
    assert(merged.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(merged).isEmpty,
      "two-step roll-forward diverges from one-shot aggregation")
  }

  test("the merge join reads the view buckets without a view-side exchange") {
    import spark.implicits._
    val c = lit("1997-01-01 00:00:00").cast("timestamp")
    Ivm.buildAggIndex(sf001.orders.filter($"o_orderdate" < c),
      $"o_custkey", cents, "graft_test_ivm_plan")
    val merged = Ivm.mergeDelta(sf001.orders.filter($"o_orderdate" >= c),
      $"o_custkey", cents, "graft_test_ivm_plan")
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // exactly TWO exchanges: the delta's partial agg, then its shuffle
    // into the view's bucket layout; the bucketed view scan is free
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"view side must not re-shuffle:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"view scan should use the bucket layout:\n$plan")
  }

  test("q167 fixture query returns the full rollup") {
    val r = Ivm.incrementalOrderRollup(sf001)
    assert(r.count() === sf001.orders.select("o_custkey").distinct().count())
    // spot-check the monoid: totals are non-negative, min <= max
    assert(r.filter(col("min_price") > col("max_price")).count() === 0)
    assert(r.filter(col("n_orders") <= 0).count() === 0)
  }
}
