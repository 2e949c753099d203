package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q202/q203: incremental graph maintenance — CC edge-insert folds
  * against persisted components (condensation-exact vs from-scratch),
  * and PageRank warm-starting (fewer rounds to the same fixed point). */
class GraphIncrementSpec extends SparkSpec {

  // ── q202: incremental connected components ─────────────────────────

  test("ccIncrement equals from-scratch CC over the union of edges") {
    import spark.implicits._
    val edges = Graph.customerCoEdges(sf001)
    val base = edges.filter(($"a" + $"b") % 5 =!= 0)
    val delta = edges.filter(($"a" + $"b") % 5 === 0)
    val nodes = sf001.customer.select($"c_custkey")
    Graph.buildCcState(nodes, base, "graft_test_ccinc")
    val got = Graph.ccIncrement(delta, "graft_test_ccinc")
    val truth = Dedup.connectedComponents(nodes, edges)
    assert(got.count() === nodes.count())
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
      "incremental CC diverges from the from-scratch labeling")
  }

  test("hand fixture: merge, pass-through, and node insert in one batch") {
    import spark.implicits._
    // components {1,2} (label 1), {5,6} (label 5), {9} — the state
    val state = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("id", "component")
    // one edge welds 2–6 (merging 1 and 5 under label 1); one edge
    // attaches BRAND-NEW node 50 to 9; component {9,50} labels 9
    val delta = Seq((2L, 6L), (50L, 9L)).toDF("a", "b")
    val got = Graph.ccIncrementFrames(delta, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      9L -> 9L, 50L -> 9L), s"got $got")
  }

  test("untouched components pass through and the state never shuffles") {
    import spark.implicits._
    val edges = Graph.customerCoEdges(sf001)
    val base = edges.filter(($"a" + $"b") % 5 =!= 0)
    val nodes = sf001.customer.select($"c_custkey")
    Graph.buildCcState(nodes, base, "graft_test_ccinc_plan")
    val state = spark.table("graft_test_ccinc_plan")
    // a single real delta edge, collected up front (delta-sized input)
    val e0 = edges.filter(($"a" + $"b") % 5 === 0).limit(1).collect()(0)
    val delta = Seq((e0.getLong(0), e0.getLong(1))).toDF("a", "b")
    val got = Graph.ccIncrement(delta, "graft_test_ccinc_plan")
    got.collect()
    // components not reachable from the edge keep their exact rows
    val touchedComps = state
      .filter(col("id").isin(e0.getLong(0), e0.getLong(1)))
      .select(col("component")).distinct()
    val untouchedBefore = state.join(touchedComps, Seq("component"), "left_anti")
      .select(col("id"), col("component"))
    val untouchedAfter = got.join(touchedComps, Seq("component"), "left_anti")
    assert(untouchedAfter.exceptAll(untouchedBefore).isEmpty &&
      untouchedBefore.exceptAll(untouchedAfter).isEmpty,
      "rows of untouched components changed under the increment")
    val plan = got.queryExecution.executedPlan
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    val offenders = shuffles.filter(_.toString.contains("graft_test_ccinc_plan"))
    assert(offenders.isEmpty,
      s"persisted CC state crossed an exchange:\n${offenders.mkString("\n")}")
  }

  // ── q203: PageRank warm-start ──────────────────────────────────────

  test("warm-started PageRank reaches the fixed point in fewer rounds") {
    import spark.implicits._
    val pairs = sf001.orders
      .join(sf001.lineitem, $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct()
    def sym(p: org.apache.spark.sql.DataFrame) =
      p.select($"c".as("src"), $"s".as("dst"))
        .union(p.select($"s".as("src"), $"c".as("dst")))
    val basePairs = sf001.orders.filter($"o_orderkey" % 11 =!= 0)
      .join(sf001.lineitem, $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct()
    val full = sym(pairs)
    val tol = 1e-7
    // "yesterday": converge the base graph, persist those ranks
    val (prior, _) = Graph.pageRankConvergedRounds(sym(basePairs),
      $"src", $"dst", d = 0.85, tol = tol)
    val (cold, coldRounds) = Graph.pageRankConvergedRounds(full,
      $"src", $"dst", d = 0.85, tol = tol)
    val (warm, warmRounds) = Graph.pageRankConvergedRounds(full,
      $"src", $"dst", d = 0.85, tol = tol, init = Some(prior))
    assert(warmRounds < coldRounds,
      s"warm start saved no rounds: warm=$warmRounds cold=$coldRounds")
    // both are within tol of the same fixed point → within a small
    // multiple of tol of each other (contraction with factor d)
    val maxDiff = warm.as("w")
      .join(cold.select($"id", $"pr".as("__c")), Seq("id"))
      .agg(max(abs($"pr" - $"__c"))).head().getDouble(0)
    assert(maxDiff < tol * 20,
      s"warm and cold fixed points diverge: $maxDiff")
    if (sys.env.contains("GRAFT_DEBUG"))
      System.err.println(s"[pr-warm] cold=$coldRounds warm=$warmRounds")
  }

  test("q203 fixture returns every full-graph node exactly once") {
    import spark.implicits._
    val got = Graph.pageRankWarmTrade(sf001)
    val nodes = sf001.orders
      .join(sf001.lineitem, $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("id")).distinct()
      .union(sf001.orders
        .join(sf001.lineitem, $"o_orderkey" === $"l_orderkey")
        .select(($"l_suppkey" * 2 + 1).as("id")).distinct())
      .distinct()
    assert(got.count() === nodes.count())
    assert(got.groupBy($"id").count().filter($"count" > 1).count() === 0)
    // rank mass stays near 1 (quantization loss bounded)
    val mass = got.agg(sum($"pr")).head().getDouble(0)
    assert(math.abs(mass - 1.0) < 0.05, s"rank mass drifted: $mass")
  }
}
