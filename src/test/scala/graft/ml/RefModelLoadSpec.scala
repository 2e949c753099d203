package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.PipelineModel

/** Cross-version model fidelity: Spark 4 loads the REFERENCE'S OWN
  * fitted Spark-2.1 `PipelineModel`s (the ML persistence format is
  * stable across major versions) and this engine's Scorer reproduces
  * the persisted trees' predictions exactly.
  *
  * The expected doubles below were verified by an INDEPENDENT
  * hand-walk of the persisted tree parquet (split thresholds,
  * categorical sets, leaf predictions, GBT weights 1.0 then
  * stepSize=0.1): both paths give (4.213519030614257,
  * 5.338774165685845) for the reference's documented curl input
  * (`assets/app_nfl.py:286`). Note the reference's inline comment
  * anchor `('Running Play', 3.984419701538829, 5.375515688399204)`
  * (`assets/app_nfl.py:314`) does NOT match its own shipped model
  * files for any documented input — it predates them; the argmax
  * ("Running Play") is unchanged. Faithfulness here is to the
  * persisted models, which are the reference's actual behavior.
  */
class RefModelLoadSpec extends SparkSpec {

  private val refAssets = "/root/reference/assets/static/assets"

  private lazy val refModels: Option[(PipelineModel, PipelineModel)] =
    if (!new java.io.File(s"$refAssets/nfl_model_pass").isDirectory) None
    else {
      assert(spark != null) // force lazy session init before ML load
      Some((PipelineModel.load(s"$refAssets/nfl_model_pass"),
        PipelineModel.load(s"$refAssets/nfl_model_run")))
    }

  // the documented curl input (assets/app_nfl.py:286)
  private val golden = PlayRequest(qtr = 3, down = 3, TimeSecs = 60,
    yrdline100 = 50, ydstogo = 8, ydsnet = 15, month_day = 920,
    posteam = "PIT", DefensiveTeam = "NE", PlayType_lag = "Run")

  test("reference Spark-2.1 models load: same stage shapes as our rebuild") {
    assume(refModels.nonEmpty, "reference models not present")
    val (pass, run) = refModels.get
    for (m <- Seq(pass, run)) {
      assert(m.stages.map(_.getClass.getSimpleName).toSeq ===
        Seq("StringIndexerModel", "VectorAssembler", "GBTRegressionModel"))
      val gbt = m.stages(2).asInstanceOf[org.apache.spark.ml.regression.GBTRegressionModel]
      assert(gbt.getNumTrees === 20 && gbt.numFeatures === 8)
    }
  }

  test("scoring through the reference's own models is bit-exact vs the persisted trees") {
    assume(refModels.nonEmpty, "reference models not present")
    val (pass, run) = refModels.get
    val scorer = new Scorer(spark, pass, run)
    val p = scorer.scoreOne(golden)
    assert(p.bestPlay === "Running Play") // the reference's documented argmax
    assert(p.passingYards === 4.213519030614257,
      s"pass prediction drifted: ${p.passingYards}")
    assert(p.runningYards === 5.338774165685845,
      s"run prediction drifted: ${p.runningYards}")
    // the fast driver-local path agrees with transform on these models too
    val fast = scorer.scoreOneFast(golden)
    assert(fast === p)
  }
}
