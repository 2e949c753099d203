package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion semantics + the q160/q161 fixture wiring. */
class RrfSpec extends SparkSpec {

  test("rrfFuseOver: both-list docs outrank single-list docs, ties on doc_id") {
    import spark.implicits._
    // q 1: doc 10 is rank 1 in both lists; docs 20/30 rank 2 in one
    // list each (identical rrf) — the tie must break to doc 20
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("q_id", "doc_id", "rank")
    val b = Seq((1L, 10L, 1), (1L, 30L, 2)).toDF("q_id", "doc_id", "rank")
    val out = PipelineOps.rrfFuseOver(Seq("a" -> a, "b" -> b), k = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(10L, 20L, 30L))
    val top = out.head
    assert(top.getDouble(top.fieldIndex("rrf")) === 1.0 / 61 + 1.0 / 61)
    val second = out(1)
    assert(second.getDouble(second.fieldIndex("rrf")) === 1.0 / 62 + 0.0)
    // absent-list rank columns are NULL, present ones carry the rank
    assert(second.getInt(second.fieldIndex("rank_a")) === 2)
    assert(second.isNullAt(second.fieldIndex("rank_b")))
  }

  test("q160 fused docs come from the input lists with consistent rrf") {
    val fused = PipelineOps.rrfHybrid(sf001)
    assert(fused.count() > 0)
    // every row keeps at least one source rank, ranks within k
    assert(fused.filter(col("rank_bm25").isNull && col("rank_cos").isNull)
      .count() === 0)
    assert(fused.filter(col("rank") < 1 || col("rank") > 10).count() === 0)
    // rrf recomputes from the rank columns exactly
    val term = (r: org.apache.spark.sql.Column) =>
      when(r.isNotNull, lit(1.0) / (lit(60) + r).cast("double")).otherwise(0.0)
    val bad = fused.filter(
      col("rrf") =!= (term(col("rank_bm25")) + term(col("rank_cos")))).count()
    assert(bad === 0)
  }

  test("q161 ANN fusion clears the overlap floor on the fixture") {
    val gate = PipelineOps.rrfAnnGate(sf001)
    val rows = gate.collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getBoolean(1)), s"gate failed:\n${rows.mkString("\n")}")
  }
}
