package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q163: distributed Bellman–Ford SSSP — hand-checked toy graph,
  * Dijkstra property test on random graphs, convergence semantics. */
class SsspSpec extends SparkSpec {
  import spark.implicits._

  test("sssp on a hand-built weighted graph") {
    // 1 →(1) 2 →(1) 3; 1 →(5) 3; 4 isolated-from-source component
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (4L, 5L, 2L))
      .toDF("src", "dst", "w")
    val got = Graph.ssspOver(edges, $"src", $"dst", $"w", _ === 1L, iters = 4)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> -1L, 5L -> -1L))
  }

  test("parallel edges collapse to the minimum weight") {
    val edges = Seq((1L, 2L, 9L), (1L, 2L, 3L)).toDF("src", "dst", "w")
    val got = Graph.ssspOver(edges, $"src", $"dst", $"w", _ === 1L, iters = 1)
      .filter($"id" === 2L).head().getLong(1)
    assert(got === 3L)
  }

  test("converged distances match sequential Dijkstra on random graphs") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 4) {
      val n = 30 + rnd.nextInt(40)
      val m = 3 * n
      val raw = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        (1 + rnd.nextInt(9)).toLong)).filter { case (a, b, _) => a != b }
      val sources = (0 until n).filter(_ => rnd.nextDouble() < 0.1)
        .map(_.toLong).toSet match {
        case s if s.isEmpty => Set(0L)
        case s => s
      }
      // sequential multi-source Dijkstra
      val adj = raw.groupBy(_._1).map { case (k, v) =>
        k -> v.map(e => (e._2, e._3)) }
      val distRef = scala.collection.mutable.Map[Long, Long]()
      val pq = scala.collection.mutable.PriorityQueue[(Long, Long)]()(
        Ordering.by(-_._1))
      sources.foreach { s => distRef(s) = 0L; pq.enqueue((0L, s)) }
      while (pq.nonEmpty) {
        val (dcur, u) = pq.dequeue()
        if (distRef(u) == dcur)
          adj.getOrElse(u, Nil).foreach { case (v, w) =>
            if (!distRef.contains(v) || dcur + w < distRef(v)) {
              distRef(v) = dcur + w; pq.enqueue((dcur + w, v))
            }
          }
      }
      val (df, rounds) = Graph.ssspConverged(
        raw.toDF("src", "dst", "w"), $"src", $"dst", $"w",
        id => id.isin(sources.toSeq: _*), maxIters = 64)
      assert(rounds < 64, s"trial $trial did not converge")
      val got = df.collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val allNodes = raw.flatMap(e => Seq(e._1, e._2)).toSet
      allNodes.foreach { v =>
        assert(got(v) === distRef.getOrElse(v, -1L),
          s"trial $trial node $v: got ${got(v)}, dijkstra ${distRef.get(v)}")
      }
    }
  }

  test("q163 fixture: seeds at 0, all-integer distances, converges within the unroll") {
    val res = Graph.ssspCustSupp(sf001) // requires rounds-1 <= 8 internally
    assert(res.filter($"id" % 40 === 0 && $"dist" =!= 0L).count() === 0)
    assert(res.filter($"dist" < 0).count() === 0)
    assert(res.filter($"dist".isNotNull).count() > 0)
  }

  test("negative weights are rejected by the converged driver") {
    val edges = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      Graph.ssspConverged(edges, $"src", $"dst", $"w", _ === 1L)
    }
  }
}
