package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Operator-level sanity over sf0.001. Cross-engine value parity is
  * covered by the DuckDB harness (tools/parity_check.py / driver t2);
  * these tests pin shapes, invariants, and plan properties. */
class OperatorsSpec extends SparkSpec {

  test("every declared query runs and returns a well-formed result on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      val n = df.count()
      assert(n >= 0, s"$name failed")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("oracle keys are a subset of query keys and flagship entry returns rows") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 aggregates reconcile: group counts sum to filtered row count") {
    val t = sf001
    val total = Relational.pricingSummary(t)
      .agg(sum("count_order")).head().getLong(0)
    val expected = t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total === expected)
  }

  test("q08 emits at most 3 rows per customer, ranked 1..3") {
    val top = Relational.topOrdersPerCustomer(sf001)
    val maxPer = top.groupBy("o_custkey").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPer <= 3)
    assert(top.filter(col("rn") < 1 || col("rn") > 3).count() === 0)
  }

  test("q29 returns exactly 10 neighbours per query vector, none self") {
    val knn = Similarity.knnBruteForce(sf001)
    val counts = knn.groupBy("q_id").count().collect()
    assert(counts.length === 5 && counts.forall(_.getLong(1) === 10))
    assert(knn.filter(col("q_id") === col("vec_id")).count() === 0)
  }

  test("q22 exact dedup: keeper count equals distinct text count") {
    val t = sf001
    val keepers = TextOps.exactDedup(t).count()
    val distinctTexts = t.documents.select("text").distinct().count()
    assert(keepers === distinctTexts)
  }

  test("broadcast hints survive into the physical plan for dimension joins") {
    val plan = Relational.nationRevenue(sf001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("parquet filter pushdown reaches the lineitem scan in q02") {
    val plan = Relational.revenueFilter(sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      plan.contains("PushedFilters: ["), s"no pushed filters:\n$plan")
  }

  test("minhash pairs are symmetric-deduped and within distance bound") {
    val pairs = Dedup.minhashPairs(sf001, maxDist = 0.4)
    assert(pairs.filter(col("id_a") >= col("id_b")).count() === 0)
    assert(pairs.filter(col("jaccard_dist") > 0.4).count() === 0)
  }
}
