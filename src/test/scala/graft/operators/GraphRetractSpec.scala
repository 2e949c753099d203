package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q208: delete-capable incremental CC — a bridge deletion splits its
  * component, a non-bridge deletion relabels to the same components,
  * combined insert+delete equals the from-scratch closure, phantom
  * deletes raise, and the persisted state never shuffles. */
class GraphRetractSpec extends SparkSpec {

  private def emptyEdges = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("a", "b")
  }

  test("bridge deletion splits; non-bridge deletion keeps the component") {
    import spark.implicits._
    // path 1-2-3-4 (edge (2,3) is a bridge) plus triangle 5-6-7
    // (edge (5,6) is not — the 5-7-6 path survives)
    val nodes = (1L to 7L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L)).toDF("a", "b")
    Graph.buildCcStateFull(nodes, edges, "graft_test_ccr_hand")
    val deletes = Seq((2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Graph.ccApplyChanges(emptyEdges, deletes, "graft_test_ccr_hand")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 5L, 7L -> 5L),
      s"bridge must split {1,2,3,4} into {1,2}+{3,4}; triangle must " +
        s"survive the non-bridge delete — got $got")
  }

  test("q208 fixture equals the from-scratch closure over (base \\ D) ∪ I") {
    import spark.implicits._
    val got = Graph.ccCoPurchaseRetract(sf001)
    val finalEdges = Graph.customerCoEdges(sf001)
      .filter(($"a" + $"b") % 7 =!= 0)
    val truth = Dedup.connectedComponents(
        sf001.customer.select($"c_custkey"), finalEdges)
      .select($"id".as("c_custkey"), $"component")
    assert(got.count() === sf001.customer.count())
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
      "delete-capable increment diverges from the from-scratch closure")
  }

  test("phantom delete raises loudly") {
    import spark.implicits._
    val nodes = (1L to 3L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("a", "b")
    Graph.buildCcStateFull(nodes, edges, "graft_test_ccr_phantom")
    val e = intercept[IllegalArgumentException] {
      Graph.ccApplyChanges(emptyEdges,
        Seq((2L, 3L)).toDF("a", "b"), "graft_test_ccr_phantom")
    }
    assert(e.getMessage.contains("phantom"),
      s"expected the phantom-delete raise, got: $e")
  }

  test("untouched components pass through byte-identically; state never shuffles") {
    import spark.implicits._
    // two components: {1,2,3} (a triangle) and {10,11}
    val nodes = Seq(1L, 2L, 3L, 10L, 11L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L)).toDF("a", "b")
    Graph.buildCcStateFull(nodes, edges, "graft_test_ccr_plan")
    // delete the non-bridge (1,2): component 1 re-solves (same
    // labels), component 10 must pass through untouched
    val got = Graph.ccApplyChanges(emptyEdges,
      Seq((1L, 2L)).toDF("a", "b"), "graft_test_ccr_plan")
    got.collect()
    val m = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L),
      s"got $m")
    val plan = got.queryExecution.executedPlan
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    val offenders = shuffles.filter(_.toString.contains("graft_test_ccr_plan"))
    assert(offenders.isEmpty,
      s"persisted CC state crossed an exchange:\n${offenders.mkString("\n")}")
  }
}
