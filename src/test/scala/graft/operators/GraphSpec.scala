package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

/** PageRank contracts: mass conservation, hand-checked values on a
  * tiny graph (replicating the exact fold order), and the fixture
  * query's shape. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // the operator's fixed-point arithmetic, replicated verbatim:
  // contributions quantized at 2^-40, exact integer sum, then
  // base + d*(Σq/2^40)
  private val S = 1099511627776.0 // 2^40
  private def q(c: Double): Long = math.floor(c * S + 0.5).toLong
  private def step(d: Double, n: Int, qs: Long): Double =
    (1.0 - d) / n + d * (qs.toDouble / S)

  test("pageRank on a 3-node star matches the hand-unrolled quantized iteration exactly") {
    // star: 1↔2, 1↔3 (symmetrized). deg(1)=2, deg(2)=deg(3)=1, N=3.
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val d = 0.85
    val got = Graph.pageRankOver(edges, $"src", $"dst", iters = 2, d = d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val p0 = 1.0 / 3
    val p1c = step(d, 3, q(p0 / 1) + q(p0 / 1)) // node 1 ← {2,3}
    val p1l = step(d, 3, q(p0 / 2))             // nodes 2,3 ← {1}
    val p2c = step(d, 3, q(p1l / 1) + q(p1l / 1))
    val p2l = step(d, 3, q(p1c / 2))
    assert(got === Map(1L -> p2c, 2L -> p2l, 3L -> p2l))
  }

  test("personalized pageRank: all-seed personalization reduces bit-identically to uniform") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val uni = Graph.pageRankOver(edges, $"src", $"dst", iters = 3, d = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ppr = Graph.pageRankPersonalizedOver(
      edges, $"src", $"dst", _ => lit(true), iters = 3, d = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppr === uni, "uniform seeds must reproduce classic PageRank exactly")
  }

  test("personalized pageRank: restart mass stays near the seed, totals conserve") {
    // path 1-2-3-4 (symmetrized), seed = {1}: the seed outranks every
    // other node, the farthest node ranks last (strict monotonicity
    // does NOT hold on a reflecting path — node 4 funnels all its
    // mass back to 3), and total mass stays ≈ 1
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val got = Graph.pageRankPersonalizedOver(
      edges, $"src", $"dst", id => id === 1L, iters = 6, d = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == got.values.max, s"seed must rank first: $got")
    assert(got(4L) == got.values.min, s"farthest node must rank last: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass conserved: ${got.values.sum}")
  }

  test("labelPropagation equals a sequential synchronous reference on random graphs") {
    // deterministic random graphs with dup-heavy edges so plurality
    // ties (the min-label branch) actually occur
    for (seed <- 1 to 5; iters <- Seq(1, 3)) {
      val rnd = new scala.util.Random(seed)
      val n = 12 + rnd.nextInt(10)
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // sequential reference: symmetrized distinct adjacency, labels
      // start at node id, each round every node takes the plurality
      // neighbor label with ties to the smallest label
      val sym = (edges ++ edges.map(_.swap)).distinct
      val adj = sym.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
      var lab = adj.keys.map(k => k -> k).toMap
      for (_ <- 1 to iters) {
        lab = adj.map { case (v, nbrs) =>
          val counts = nbrs.map(lab).groupBy(identity).view.mapValues(_.size)
          v -> counts.maxBy { case (l, c) => (c.toLong, -l) }._1
        }
      }
      val got = Graph.labelPropagationOver(
        edges.toDF("src", "dst"), $"src", $"dst", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === lab, s"seed=$seed iters=$iters")
    }
  }

  test("labelPropagation: two disjoint cliques collapse to their min ids") {
    val clique = (xs: Seq[Long]) => for (a <- xs; b <- xs if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L)))
      .toDF("src", "dst")
    val got = Graph.labelPropagationOver(edges, $"src", $"dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("HITS: bipartite hand-check — breadth ranks hubs, buyer breadth ranks authorities") {
    // hubs {1, 2}, authorities {10, 11}: 1→10, 2→10, 2→11
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val got = Graph.hitsOver(edges, $"src", $"dst", iters = 2)
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getDouble(2)).toMap
    // authority: 10 has both hubs, 11 only the weaker share of hub 2
    assert(got(("auth", 10L)) > got(("auth", 11L)), s"got $got")
    // hub: 2 points at both authorities, 1 at one
    assert(got(("hub", 2L)) > got(("hub", 1L)), s"got $got")
    // L1 normalization: each side sums to ≈ 1
    val sums = got.groupBy(_._1._1).view.mapValues(_.values.sum)
    assert(math.abs(sums("auth") - 1.0) < 1e-9 && math.abs(sums("hub") - 1.0) < 1e-9,
      s"sums $sums")
    // first-round authority is exactly indegree/|E| under the exact
    // quantized recipe: a(10) = 2/3, a(11) = 1/3 feeds round 2
    val a2 = got(("auth", 10L))
    assert(a2 > 0.6 && a2 < 0.8, s"auth(10) = $a2")
  }

  test("pageRank executes exactly one NEW shuffle per additional iteration, any edge storage") {
    // the 100×-scale contract — each power-iteration round may
    // MATERIALIZE only the contribution regroup by dst; the repeated
    // deg / node-count subtrees over the checkpointed edge scan must
    // collapse to ReusedExchange (AQE stage reuse), not re-shuffle.
    // Counted in the FINAL adaptive plan (after execution), excluding
    // reused and broadcast exchanges — the shuffles that actually ran.
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    def executedShuffles(iters: Int,
        storage: org.apache.spark.storage.StorageLevel): Int = {
      val df = Graph.pageRankOver(edges, $"src", $"dst", iters, 0.85, storage)
      df.collect()
      val fin = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
        .split("== Initial Plan ==").head
      fin.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("ReusedExchange") &&
          (l.contains("hashpartitioning") || l.contains("SinglePartition")))
    }
    import org.apache.spark.storage.StorageLevel.{DISK_ONLY, MEMORY_AND_DISK}
    for (st <- Seq(MEMORY_AND_DISK, DISK_ONLY)) {
      assert(executedShuffles(4, st) - executedShuffles(3, st) === 1,
        s"storage=$st")
      assert(executedShuffles(6, st) - executedShuffles(5, st) === 1,
        s"storage=$st")
    }
    // and DISK_ONLY changes no values (same plan, different blocks)
    val a = Graph.pageRankOver(edges, $"src", $"dst", 3, 0.85).collect().toSet
    val b = Graph.pageRankOver(edges, $"src", $"dst", 3, 0.85,
      org.apache.spark.storage.StorageLevel.DISK_ONLY).collect().toSet
    assert(a === b)
  }

  test("a pure-source node keeps its base rank and its out-edges keep feeding") {
    // directed: 1→2, 2→1, 3→1 — node 3 has out-degree 1 (contract-
    // legal) but in-degree 0; it must survive every iteration with the
    // base rank, and node 1 must keep receiving its contribution
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val d = 0.85
    val got = Graph.pageRankOver(edges, $"src", $"dst", iters = 2, d = d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = (1.0 - d) / 3
    val p0 = 1.0 / 3
    val p1a = step(d, 3, q(p0 / 1) + q(p0 / 1)) // 1 ← {2, 3}
    val p1b = step(d, 3, q(p0 / 1))             // 2 ← {1}
    val p2a = step(d, 3, q(p1b / 1) + q(base / 1))
    val p2b = step(d, 3, q(p1a / 1))
    assert(got === Map(1L -> p2a, 2L -> p2b, 3L -> base))
    // out-deg ≥ 1 everywhere ⇒ mass is conserved up to quantization
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("quantized pageRank tracks the unquantized ordered fold within the error bound") {
    // the quantization perturbs each rank by ≤ in-deg·2^-41 per
    // iteration; on the fixture graph after 3 iterations that is far
    // below 1e-9 — and the ordered-fold variant is the proof the
    // hub-safe integer-sum path computes the same PageRank
    val pairs = sf001.orders
      .join(sf001.lineitem, $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select($"c".as("src"), $"s".as("dst"))
      .union(pairs.select($"s".as("src"), $"c".as("dst")))
    val fixed = Graph.pageRankOver(edges, $"src", $"dst", iters = 3, d = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val folded = Graph.pageRankOrderedFold(edges, $"src", $"dst", iters = 3, d = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fixed.keySet === folded.keySet)
    val maxDiff = fixed.map { case (id, pr) => math.abs(pr - folded(id)) }.max
    assert(maxDiff < 1e-9, s"quantized vs ordered-fold drift: $maxDiff")
  }

  test("triangle counts: 4-clique plus pendant edge, counted from min-rank corners") {
    // K4 on {1,2,3,4} has C(4,3)=4 triangles, every clique node in 3 of
    // them; pendant node 5 (degree 1) is in none and must not appear
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.triangleCountsOver(edges, $"src", $"dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle counts are orientation-invariant: reversed/duplicated edges change nothing") {
    // same K4+pendant, but edges arrive reversed and with duplicates —
    // canonicalization + distinct must absorb both
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (3L, 2L), (4L, 2L),
      (4L, 3L), (5L, 4L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.triangleCountsOver(edges, $"src", $"dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle counts on a hub-and-spoke graph: wedges never center on the hub") {
    // hub 10 connected to 6 spokes, one spoke pair closed: exactly one
    // triangle. Degree ordering makes every spoke rank below the hub,
    // so the hub's 6 neighbors generate no wedge pairs at the hub —
    // the property that keeps skewed graphs from quadratic blow-up.
    val spokes = (1L to 6L).map(s => (10L, s))
    val edges = (spokes :+ (1L, 2L)).toDF("src", "dst")
    val got = Graph.triangleCountsOver(edges, $"src", $"dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("degree distribution of the fixture co-purchase graph is a partition of the node set") {
    val edges = Graph.customerCoEdges(sf001)
    val nNodes = edges.select($"a".as("n")).union(edges.select($"b")).distinct().count()
    val dist = Graph.degreeDistribution(sf001).collect()
    assert(dist.map(_.getLong(1)).sum === nNodes)
    // Σ deg·count = 2|E| (handshake lemma)
    assert(dist.map(r => r.getLong(0) * r.getLong(1)).sum === 2 * edges.count())
  }

  test("assortativity: a star is perfectly disassortative, a clique is degenerate") {
    // star K1,4: every edge joins deg-4 hub to a deg-1 leaf → r = -1
    // (standard identity; our decimal-moment formula must hit it
    // exactly: num = -den in exact arithmetic)
    import org.apache.spark.sql.functions.{col, count, lit, sum, nullif}
    val e = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)).toDF("a", "b")
    val sym = e.select($"a".as("u"), $"b".as("v"))
      .union(e.select($"b".as("u"), $"a".as("v")))
    val deg = sym.groupBy($"u").agg(count(lit(1)).as("deg"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = sym.join(deg.select($"u", $"deg".as("du")), "u")
      .join(deg.select($"u".as("v"), $"deg".as("dv")), "v")
      .agg(count(lit(1)).as("n"), sum($"du".cast(dec)).as("sx"),
        sum(($"du" * $"dv").cast(dec)).as("sxy"), sum(($"du" * $"du").cast(dec)).as("sxx"))
    val nD = col("n").cast("double"); val sxD = col("sx").cast("double")
    val r = m.select(((nD * col("sxy").cast("double") - sxD * sxD) /
      nullif(nD * col("sxx").cast("double") - sxD * sxD, lit(0.0))).as("r"))
      .head().getDouble(0)
    assert(r === -1.0)
    // fixture graph: a defined value strictly inside [-1, 1]
    val fix = Graph.assortativity(sf001).head()
    assert(!fix.isNullAt(1) && math.abs(fix.getDouble(1)) <= 1.0)
  }

  test("top co-purchase partner: unique per customer, ties break to the smaller id") {
    val top = Graph.topCoPurchasePartner(sf001)
    val perCust = top.groupBy("cust").count().filter($"count" > 1)
    assert(perCust.count() === 0)
    // symmetric sanity: every (cust, partner) pair's shared count is
    // mirrored — partner counting is direction-independent
    val e = Graph.customerCoEdges(sf001)
    assert(top.count() === e.select($"a".as("n")).union(e.select($"b")).distinct().count())
  }

  test("pageRank conserves probability mass (no dangling nodes by construction)") {
    val pr = Graph.pageRankCustSupp(sf001, iters = 3)
    val total = pr.agg(org.apache.spark.sql.functions.sum("pr")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"mass drifted: $total")
    assert(pr.filter($"pr" <= 0).count() === 0)
    // the hub side of a bipartite trade graph concentrates rank:
    // suppliers are ~6% of nodes but must hold far more than 6% of mass
    val suppMass = pr.filter($"kind" === "supplier")
      .agg(org.apache.spark.sql.functions.sum("pr")).head().getDouble(0)
    val suppFrac = pr.filter($"kind" === "supplier").count().toDouble / pr.count()
    assert(suppMass > 2 * suppFrac, s"supplier mass $suppMass vs node share $suppFrac")
  }
}
