package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts for the corpus-rewrite / budgeting additions:
  * q136 global chunk dedup (the removal member of the dedup family),
  * q137 JL random projection, q138 α-temperature mixture allocation.
  * Cross-engine value parity is the DuckDB harness's job; these pin
  * the semantics and the plan shapes. */
class CorpusRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDedup: exact-duplicate doc loses everything, partial overlap loses only the shared chunk") {
    val docs = Seq(
      (0L, "w1 w2 w3 w4 x1 x2 x3 x4"), // keeper of both chunks
      (1L, "w1 w2 w3 w4 x1 x2 x3 x4"), // exact dup → fully removed
      (2L, "w1 w2 w3 w4 z1 z2 z3")     // first chunk dup, tail survives
    ).toDF("doc_id", "text")
    val got = PipelineOps.chunkDedupOver(docs, $"doc_id", $"text", 4)
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_kept", "clean_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((0L, 2L, 2L, 8L), (1L, 2L, 0L, 0L), (2L, 2L, 1L, 3L)))
    val md5s = PipelineOps.chunkDedupOver(docs, $"doc_id", $"text", 4)
      .orderBy("doc_id").select("clean_md5").collect().map(_.isNullAt(0))
    assert(md5s.toSeq === Seq(false, true, false),
      "clean_md5 must be NULL exactly for the fully-removed doc")
  }

  test("chunkDedup fixture: removal fires, token accounting is consistent") {
    val out = PipelineOps.chunkDedup(sf001).cache()
    val agg = out.agg(
      sum("n_chunks"), sum("n_kept"),
      sum(when($"n_kept" === 0 && $"clean_md5".isNotNull, 1).otherwise(0)),
      sum(when($"n_kept" > 0 && $"clean_md5".isNull, 1).otherwise(0))).collect()(0)
    assert(agg.getLong(1) < agg.getLong(0),
      "fixture has planted duplicates — some chunk must be removed")
    assert(agg.getLong(2) == 0 && agg.getLong(3) == 0,
      "clean_md5 must be NULL iff nothing was kept")
    out.unpersist()
  }

  test("chunkDedup plan: equi-joins only — no cartesian or nested-loop pairing") {
    val plan = PipelineOps.chunkDedup(sf001).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"chunk dedup must stay an equi-join on the chunk hash:\n$plan")
  }

  test("jlProject: distortion concentrates near 1 and ynorm2 is the exact fold of the emitted components") {
    val out = Similarity.jlProject(sf001).collect()
    val mean = out.map(_.getAs[Double]("distortion")).sum / out.length
    assert(mean > 0.8 && mean < 1.2, s"mean distortion $mean drifted from the JL expectation")
    // ynorm2 must equal the left fold of the emitted y components —
    // same order, same doubles, so equality is exact
    out.take(50).foreach { r =>
      val fold = (0 until 16).map(i => {
        val y = r.getAs[Double](f"y$i%02d"); y * y
      }).reduceLeft(_ + _)
      assert(r.getAs[Double]("ynorm2") == fold)
    }
  }

  test("jlProject plan: a pure projection — no shuffle, no join") {
    val body = Similarity.jlProjectOver(
      sf001.embeddings, col("vec_id"), col("embedding"), 64, 16)
      .queryExecution.executedPlan.toString
    assert(!body.contains("Exchange") && !body.contains("Join"),
      s"JL projection must run at scan speed:\n$body")
  }

  test("kmeans: separates two obvious clusters and reports exact squared distances") {
    val vs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f, 0f)), (3L, Array(0.1f, 0.9f, 0f, 0f)),
      (4L, Array(1.1f, -0.1f, 0f, 0f)), (5L, Array(-0.1f, 1.1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssignOver(vs, $"vec_id", $"embedding", 4, 2, 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toList
    assert(got === List((0L, 0), (1L, 1), (2L, 0), (3L, 1), (4L, 0), (5L, 1)))
  }

  test("kmeans: an empty cluster fails loudly instead of silently re-seeding") {
    val vs = Seq( // seed 1 identical to seed 0 → tie-break starves cluster 1
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0.9f, 0f))
    ).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansAssignOver(vs, $"vec_id", $"embedding", 2, 2, 1).collect()
    }
    assert(e.getMessage.contains("empty cluster"))
  }

  test("kmeans: the assignment pass is map-only — centroids are literals, no join, no shuffle") {
    val plan = Similarity.kmeansAssignOver(
      sf001.embeddings, col("vec_id"), col("embedding"), 64, 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"final assignment must be a projection over the checkpointed base:\n$plan")
  }

  test("contrastivePairs: hardest negative crosses labels, hardest positive stays inside, ties to lowest id") {
    val vs = Seq(
      // label 1: anchor + a twin (cos 1 with anchor) + a far member
      (0L, Array(1f, 0f, 0f), 1), (1L, Array(1f, 0f, 0f), 1), (2L, Array(0f, 0f, 1f), 1),
      // label 2: one vector very close to the anchor (the hard negative),
      // one orthogonal
      (3L, Array(0.99f, 0.14f, 0f), 2), (4L, Array(0f, 1f, 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.contrastivePairsOver(
      vs, $"vec_id", $"embedding", $"label", _ === 0L).collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getAs[Long]("hard_neg_id") === 3L, "nearest other-label vector")
    assert(r.getAs[Long]("hard_pos_id") === 2L, "farthest same-label vector")
    assert(r.getAs[Double]("hard_neg_cos") > 0.9 && r.getAs[Double]("hard_pos_cos") < 0.1)
  }

  test("contrastivePairs: corpus side never shuffles before the anchor agg") {
    val plan = Similarity.contrastivePairs(sf001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"anchors must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "the corpus must not shuffle for the pairing")
  }

  test("splitLeakage: counts chunks straddling splits; dedup-then-split drives it to zero") {
    // doc 0 (bucket 0 → train) and doc 95 (bucket 95 → test) share
    // their first 3-token chunk under the id-keyed scheme
    val docs = Seq(
      (0L, "a b c d e f"),
      (95L, "a b c x y z")).toDF("id", "body")
    val got = PipelineOps.splitLeakageOver(docs, $"id", $"body", 80, 10, 3)
      .filter($"scheme" === "id").collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getLong(3))).toMap
    assert(got(("test", "train")) === 1L && got(("train", "valid")) === 0L)
    // the composition the operator exists to motivate: chunk-dedup
    // first, and the leakage audit of the SURVIVING chunks is zero
    // (each chunk now exists in exactly one doc, hence one split)
    val out = PipelineOps.chunkDedup(sf001)
    assert(out.filter($"n_kept" > 0).count() > 0)
  }

  test("splitLeakage fixture: duplicated chunks straddle splits under BOTH doc-level keys") {
    val got = PipelineOps.splitLeakage(sf001).collect()
      .map(r => (r.getString(0), r.getLong(3))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    assert(got("id") > 0, "id-keyed split must show chunk leakage on the dup-heavy fixture")
    assert(got("content") > 0,
      "content-keyed splitting closes the exact-doc channel but NOT chunk leakage")
  }

  test("kaplanMeier: hand-checked deaths, censoring, at-risk counts, and product fold") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // u1 lives [0, 100s] → quiet since before the 800s horizon: death
    // u2 [0, 900s], u3 [0, 1000s] → active at the edge: censored
    val ev = Seq(
      (1L, ts(0)), (1L, ts(100)),
      (2L, ts(0)), (2L, ts(900)),
      (3L, ts(0)), (3L, ts(1000))).toDF("user_id", "ts")
    val got = EventOps.kaplanMeierOver(ev, $"user_id", $"ts", buckets = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // bucket 0: u1 dies with 3 at risk → Ŝ = 2/3; bucket 3: both
    // censored, no deaths → Ŝ carries
    assert(got.toSeq === Seq(
      (0, 1L, 1L, 3L, 1.0 * (1.0 - 1.0 / 3.0)),
      (3, 2L, 0L, 2L, 1.0 * (1.0 - 1.0 / 3.0) * (1.0 - 0.0 / 2.0))))
  }

  test("kaplanMeier: the only corpus-sized stage is the per-user agg") {
    val plan = EventOps.kaplanMeier(sf001).queryExecution.executedPlan.toString
    // events never sort globally; the unpartitioned window runs on
    // the ≤64-row bucket table after the per-user aggregation
    assert(plan.contains("BroadcastNestedLoopJoin"), "horizon must broadcast")
    assert(!plan.contains("SortMergeJoin"), s"no corpus-sized join expected:\n$plan")
  }

  test("skyline: equals brute-force dominance filtering, duplicates kept, strictness honored") {
    val rows = Seq(
      // grp A: (1,5) frontier; (1,5) dup kept; (2,5) dominated by (1,5);
      // (2,9) frontier; (3,9) dominated; (0.5,1) frontier (cheapest)
      ("A", 1.0, 5), ("A", 1.0, 5), ("A", 2.0, 5), ("A", 2.0, 9), ("A", 3.0, 9), ("A", 0.5, 1),
      ("B", 7.0, 2) // singleton group always on its frontier
    ).toDF("g", "cost", "gain")
    val got = Relational.skylineOver(rows, $"g", $"cost", $"gain")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSeq
      .sortBy(x => (x._1, x._2, x._3))
    val brute = rows.collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    val expected = brute.filter { a =>
      !brute.exists(b => b._1 == a._1 && b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3))
    }.toSeq.sortBy(x => (x._1, x._2, x._3))
    assert(got === expected)
    assert(got.count(_ == ("A", 1.0, 5)) === 2, "exact duplicates dominate neither")
  }

  test("skyline plan: no dominance self-join — windows over the brand partition") {
    val plan = Relational.partSkyline(sf001).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"skyline must not plan the O(n²) dominance join:\n$plan")
  }

  test("mixtureAlloc: probabilities sum to 1, the budget is conserved, epochs = alloc/c") {
    val out = PipelineOps.mixtureAlloc(sf001).collect()
    assert(out.length == 20)
    val pSum = out.map(_.getAs[Double]("p")).sum
    val allocSum = out.map(_.getAs[Double]("alloc_tokens")).sum
    assert(math.abs(pSum - 1.0) < 1e-9, s"p sums to $pSum")
    assert(math.abs(allocSum - 1000000.0) < 1e-3, s"alloc sums to $allocSum")
    out.foreach { r =>
      val rel = r.getAs[Double]("epochs") * r.getAs[Long]("c_tokens") /
        r.getAs[Double]("alloc_tokens")
      assert(math.abs(rel - 1.0) < 1e-12)
    }
    // α = 0.5 flattens: the largest domain's p-share must be SMALLER
    // than its proportional token share, the smallest's larger
    val totalC = out.map(_.getAs[Long]("c_tokens")).sum.toDouble
    val big = out.maxBy(_.getAs[Long]("c_tokens"))
    val small = out.minBy(_.getAs[Long]("c_tokens"))
    assert(big.getAs[Double]("p") <= big.getAs[Long]("c_tokens") / totalC + 1e-12)
    assert(small.getAs[Double]("p") >= small.getAs[Long]("c_tokens") / totalC - 1e-12)
  }
}
