package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** q205: streaming ANN ingest — the chunked foreachBatch append
  * produces exactly the one-shot batch append's index (row-set
  * equality), probes answer identically, the only cross-batch state
  * is the frozen one-row model sidecar, and the gate holds. */
class StreamAnnSpec extends SparkSpec {

  test("streamed index equals the one-shot batch append, row for row") {
    import spark.implicits._
    val streamed = StreamAnn.ensureStreamedIndex(spark,
      "/root/testdata/sf0.001")
    Similarity.buildAnnIndex(
      sf001.embeddings.filter($"vec_id" % 10 =!= 7),
      $"vec_id", $"embedding", "graft_test_ann_oneshot")
    Similarity.updateAnnIndex(
      sf001.embeddings.filter($"vec_id" % 10 === 7),
      $"vec_id", $"embedding", "graft_test_ann_oneshot")
    val a = spark.table(streamed).select($"vec_id", $"ivf_list", $"codes")
    val b = spark.table("graft_test_ann_oneshot")
      .select($"vec_id", $"ivf_list", $"codes")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed index diverges from the one-shot batch append")
    // the frozen models are identical — training never saw the stream
    assert(Similarity.loadPqModel(spark, streamed) ===
      Similarity.loadPqModel(spark, "graft_test_ann_oneshot"))
    // probes answer identically from either index
    val probes = sf001.embeddings.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val raw = sf001.embeddings.select($"vec_id", $"embedding")
    val pa = Similarity.annIndexProbe(spark, streamed, probes, raw).collect()
    val pb = Similarity.annIndexProbe(spark, "graft_test_ann_oneshot",
      probes, raw).collect()
    assert(pa.toSeq === pb.toSeq, "probe diverges between the two indexes")
  }

  test("cross-batch state is the one-row frozen-model sidecar only") {
    val streamed = StreamAnn.ensureStreamedIndex(spark,
      "/root/testdata/sf0.001")
    assert(spark.table(s"${streamed}_meta").count() === 1,
      "model sidecar must stay one row across the whole stream")
  }

  test("q205 gate: recall >= 0.9 from the streamed index at sf0.001") {
    val r = StreamAnn.annIngestGate(spark, "/root/testdata/sf0.001").collect()
    assert(r.length === 5 && r.forall(_.getBoolean(1)),
      s"streamed-ingest recall gate failed: ${r.mkString(", ")}")
  }
}
