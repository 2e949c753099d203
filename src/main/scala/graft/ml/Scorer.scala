package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** One scoring request — the 10 fields of the reference's `/api`
  * JSON contract (reference `assets/app_nfl.py:286-297`). */
final case class PlayRequest(
    qtr: Int, down: Int, TimeSecs: Int, yrdline100: Int, ydstogo: Int,
    ydsnet: Int, month_day: Int, posteam: String, DefensiveTeam: String,
    PlayType_lag: String)

/** Result of the two-model argmax (reference `assets/app_nfl.py:151-160`):
  * score both models, recommend the play predicted to gain more yards. */
final case class PlayPrediction(
    bestPlay: String, passingYards: Double, runningYards: Double)

/** Serving-side scorer: both fitted models preloaded once (the
  * reference preloads at startup, `assets/app_nfl.py:337-338`), then
  * per-request 1-row transform + head.
  */
final class Scorer(spark: SparkSession, passModel: PipelineModel, runModel: PipelineModel) {

  private val requestSchema = StructType(Seq(
    StructField("qtr", IntegerType), StructField("down", IntegerType),
    StructField("TimeSecs", IntegerType), StructField("yrdline100", IntegerType),
    StructField("ydstogo", IntegerType), StructField("ydsnet", IntegerType),
    StructField("month_day", IntegerType), StructField("posteam", StringType),
    StructField("DefensiveTeam", StringType), StructField("PlayType_lag", StringType)))

  private def toDf(r: PlayRequest): DataFrame =
    spark.createDataFrame(
      java.util.List.of(Row(
        r.qtr, r.down, r.TimeSecs, r.yrdline100, r.ydstogo, r.ydsnet,
        r.month_day, r.posteam, r.DefensiveTeam, r.PlayType_lag)),
      requestSchema)

  private def predictOne(model: PipelineModel, df: DataFrame): Double =
    model.transform(df).select("prediction").head().getDouble(0)

  /** §3.1 semantics: two 1-row transforms, argmax. */
  def scoreOne(r: PlayRequest): PlayPrediction = {
    val df = toDf(r)
    val pass = predictOne(passModel, df)
    val run = predictOne(runModel, df)
    val best = if (pass > run) "Passing Play" else "Running Play"
    PlayPrediction(best, pass, run)
  }

  /** Vectorized batch scoring: one distributed transform per model,
    * no per-row driver round trips — the path that scales. */
  def scoreBatch(plays: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val pass = passModel.transform(plays)
      .withColumnRenamed("prediction", "passing_yards")
      .drop("PlayType_lag_index", "features")
    val run = runModel.transform(pass)
      .withColumnRenamed("prediction", "running_yards")
      .drop("PlayType_lag_index", "features")
    run.withColumn("best_play",
      when(col("passing_yards") > col("running_yards"), lit("Passing Play"))
        .otherwise(lit("Running Play")))
  }
}
