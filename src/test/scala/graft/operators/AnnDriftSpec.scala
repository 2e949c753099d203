package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q204: quantizer-drift detection + retrain — the PSI detector
  * separates drifted from in-distribution deltas, frozen codebooks
  * measurably lose recall on the drifted cohort, the retrain recovers
  * it, and the blue/green swap leaves a fully-functional index. */
class AnnDriftSpec extends SparkSpec {

  private def base = sf001.embeddings
    .filter(col("vec_id") % 3 =!= 0).select(col("vec_id"), col("embedding"))

  test("PSI separates a drifted delta from an in-distribution delta") {
    import spark.implicits._
    Similarity.buildAnnIndex(base, $"vec_id", $"embedding",
      "graft_test_drift_psi")
    // in-distribution delta: untransformed held-out cohort
    val inDist = sf001.embeddings.filter($"vec_id" % 3 === 0)
      .select($"vec_id", $"embedding")
    val psiIn = Similarity.annAssignmentPsi(spark, "graft_test_drift_psi",
      inDist).head().getDouble(2)
    val psiDrift = Similarity.annAssignmentPsi(spark, "graft_test_drift_psi",
      Similarity.driftedCohort(sf001)).head().getDouble(2)
    assert(psiIn < 0.25, s"in-distribution delta tripped the detector: $psiIn")
    assert(psiDrift > 0.25, s"drifted delta must trip the detector: $psiDrift")
    assert(psiDrift > psiIn * 4,
      s"detector barely separates: in=$psiIn drift=$psiDrift")
  }

  test("frozen codebooks lose recall on the drifted cohort; retrain recovers it") {
    import spark.implicits._
    val drifted = Similarity.driftedCohort(sf001)
    // FROZEN path: build on base, append the drifted delta frozen
    Similarity.buildAnnIndex(base, $"vec_id", $"embedding",
      "graft_test_drift_frozen")
    Similarity.updateAnnIndex(drifted, $"vec_id", $"embedding",
      "graft_test_drift_frozen")
    val frozenRecall = Similarity.driftProbeRecall(sf001,
      "graft_test_drift_frozen")
    // RETRAIN path: same index name lifecycle, refit on the union
    Similarity.buildAnnIndex(base, $"vec_id", $"embedding",
      "graft_test_drift_retr")
    Similarity.retrainAnnIndex(base.unionByName(drifted),
      $"vec_id", $"embedding", "graft_test_drift_retr")
    val retrainedRecall = Similarity.driftProbeRecall(sf001,
      "graft_test_drift_retr")
    assert(frozenRecall < 0.9,
      s"fixture defect: frozen recall must measurably fail, got $frozenRecall")
    assert(retrainedRecall >= 0.9,
      s"retrain must clear the floor, got $retrainedRecall")
    assert(retrainedRecall > frozenRecall,
      s"retrain did not recover: $frozenRecall -> $retrainedRecall")
    if (sys.env.contains("GRAFT_DEBUG"))
      System.err.println(s"[drift] frozen=$frozenRecall retrained=$retrainedRecall")
  }

  test("blue/green swap leaves a live, append-able, probe-able index") {
    import spark.implicits._
    Similarity.buildAnnIndex(base, $"vec_id", $"embedding",
      "graft_test_drift_swap")
    Similarity.retrainAnnIndex(base.unionByName(Similarity.driftedCohort(sf001)),
      $"vec_id", $"embedding", "graft_test_drift_swap")
    assert(!spark.catalog.tableExists("graft_test_drift_swap_green"),
      "green staging table must not survive the swap")
    assert(!spark.catalog.tableExists("graft_test_drift_swap_green_meta"),
      "green meta sidecar must not survive the swap")
    // the swapped index keeps the full lifecycle: frozen append lands
    val pre = spark.table("graft_test_drift_swap").count()
    Similarity.updateAnnIndex(
      sf001.embeddings.filter($"vec_id" < 8)
        .select(($"vec_id" + 2000000000L).as("vec_id"), $"embedding"),
      $"vec_id", $"embedding", "graft_test_drift_swap")
    assert(spark.table("graft_test_drift_swap").count() === pre + 24)
    // and the meta sidecar round-trips the retrained model
    val model = Similarity.loadPqModel(spark, "graft_test_drift_swap")
    assert(model.nList === 16 && model.m === 16)
  }

  test("q204 gate: all flags true at sf0.001") {
    val r = Similarity.annDriftGate(sf001).collect()
    assert(r.length === 5 &&
      r.forall(x => x.getBoolean(1) && x.getBoolean(2) && x.getBoolean(3)),
      s"drift gate failed: ${r.mkString(", ")}")
  }
}
