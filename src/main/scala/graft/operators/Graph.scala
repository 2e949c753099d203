package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics beyond connected components (Dedup.scala): PageRank
  * by power iteration, expressed as the classic pregel-ish shuffle —
  * per iteration, one join (rank onto out-edges) and one aggregation
  * (contributions by destination). Every iteration is two narrow
  * shuffles on node ids; nothing driver-side grows with the graph.
  *
  * Exactness across engines despite double arithmetic: contributions
  * fold per destination in SOURCE-ID ORDER (sorted struct array ↔
  * `list(x ORDER BY src)` + `list_reduce`), and each iteration's value
  * expression — `(1-d)/N + d·Σ` — has the identical IEEE shape on both
  * sides, so ranks stay bit-identical inductively. Dangling nodes are
  * impossible by construction here (edges are symmetrized), which is
  * what makes plain power iteration mass-conserving.
  */
object Graph {

  /** `iters` rounds of PageRank with damping `d` over a directed edge
    * list (src, dst). Every node must have out-degree ≥ 1 (symmetrize
    * first for undirected graphs — `pageRankCustSupp` does). */
  def pageRankOver(
      edges: DataFrame, srcCol: Column, dstCol: Column,
      iters: Int, d: Double): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // LAZY localCheckpoint: the deduped edge list is consumed 2·iters+2
    // times across the unrolled plan; checkpointing cuts the edge
    // derivation (often a fact-fact join) to ONE computation per
    // action without running a job at construction (queries stay
    // declarative). Blocks are context-cleaned once the plan dies.
    val e = edges.select(srcCol.as("src"), dstCol.as("dst")).distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("id")).distinct()
    val nAgg = nodes.agg(count(lit(1)).as("n"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // init: uniform 1/N (one-row broadcast keeps the plan lazy)
    val pr0 = nodes.crossJoin(broadcast(nAgg))
      .select(col("id"), (lit(1.0) / col("n")).as("pr"))
    (1 to iters).foldLeft(pr0) { (pr, _) =>
      val contrib = e.join(pr, e("src") === pr("id"))
        .join(deg, "src")
        .select(col("dst"), col("src"), (col("pr") / col("deg")).as("c"))
        .groupBy(col("dst"))
        .agg(sort_array(collect_list(struct(col("src"), col("c")))).as("arr"))
      // left join onto the FULL node set: a node with in-degree 0
      // (legal under the out-degree-≥-1 contract, e.g. a pure source
      // in a directed graph) still holds its (1-d)/N base rank —
      // dropping it would also sever its out-edges from the next
      // iteration's inner join and leak rank mass
      nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .crossJoin(broadcast(nAgg))
        .select(nodes("id"),
          (lit(1.0 - d) / col("n") +
            lit(d) * coalesce(aggregate(col("arr"), lit(0.0),
              (a, x) => a + x.getField("c")), lit(0.0))).as("pr"))
    }
  }

  /** q85: PageRank over the customer–supplier trade graph — nodes are
    * customers (even ids: 2·custkey) and suppliers (odd: 2·suppkey+1),
    * an edge per distinct trading pair, symmetrized. High-rank
    * suppliers are the ones many well-connected customers buy from. */
  def pageRankCustSupp(t: Tables, iters: Int = 3, d: Double = 0.85): DataFrame = {
    import t.spark.implicits._
    val pairs = t.orders
      .join(t.lineitem, $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select($"c".as("src"), $"s".as("dst"))
      .union(pairs.select($"s".as("src"), $"c".as("dst")))
    pageRankOver(edges, $"src", $"dst", iters, d)
      .select($"id",
        when($"id" % 2 === 0, "customer").otherwise("supplier").as("kind"),
        $"pr")
      .orderBy($"id")
  }
}
