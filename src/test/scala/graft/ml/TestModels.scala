package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Train-once cache shared by every suite in the test JVM (GBT
  * training is the expensive fixture; both models take ~30 s). */
object TestModels {
  private var cachedPlays: Option[DataFrame] = None
  private var cached: Option[(PipelineModel, PipelineModel)] = None

  def plays(spark: SparkSession): DataFrame = synchronized {
    cachedPlays.getOrElse {
      val df = PlayFeatures.derive(
        PlayFeatures.readCsv(spark, TrainMain.DefaultCsv)).cache()
      cachedPlays = Some(df)
      df
    }
  }

  def models(spark: SparkSession): (PipelineModel, PipelineModel) = synchronized {
    cached.getOrElse {
      val m = PlayPipeline.train(plays(spark))
      cached = Some(m)
      m
    }
  }
}
