package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.feature.{StringIndexer, StringIndexerModel}

/** Pins the documented sklearn-twin divergence (SURVEY §2.3): pandas
  * `astype('category').cat.codes` assigns LEXICOGRAPHIC codes, while
  * Spark's default StringIndexer assigns FREQUENCY-DESC codes — the
  * same column indexes differently unless `alphabetAsc` is requested
  * explicitly. The reference's two deployments
  * (sklearn_deployment/main.py:119-122 vs the PySpark pipeline) carry
  * this mismatch silently; here it is explicit and tested. */
class IndexerOrderSpec extends SparkSpec {
  import spark.implicits._

  // skewed category column: frequency order (Run, Pass, FirstPlay)
  // deliberately disagrees with lexicographic (FirstPlay, Pass, Run)
  private lazy val df = (Seq.fill(5)("Run") ++ Seq.fill(3)("Pass") ++
    Seq("FirstPlay")).toDF("play")

  private def fit(orderType: String): Seq[String] =
    new StringIndexer()
      .setInputCol("play").setOutputCol("idx")
      .setStringOrderType(orderType)
      .fit(df).asInstanceOf[StringIndexerModel]
      .labelsArray.head.toSeq

  test("alphabetAsc reproduces pandas cat.codes order; the default diverges") {
    val pandasLike = fit("alphabetAsc")
    assert(pandasLike === Seq("FirstPlay", "Pass", "Run"),
      "alphabetAsc must equal pandas' sorted-category codes")
    val sparkDefault = fit("frequencyDesc")
    assert(sparkDefault === Seq("Run", "Pass", "FirstPlay"))
    // the divergence is real: every non-degenerate code differs
    assert(pandasLike !== sparkDefault)
    val codes = pandasLike.zipWithIndex.toMap
    val defCodes = sparkDefault.zipWithIndex.toMap
    assert(codes.forall { case (label, c) => defCodes(label) != c ||
      label == "Pass" }, // Pass happens to get code 1 under both
      "expected distinct integer codes for Run/FirstPlay across orderings")
  }
}
