package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: drift-gate recall under the Verify session
  * config, per nProbe/rerank combination. */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.warmLayout(spark, sfDir)
    val t = graft.Tables(spark, sfDir)
    import spark.implicits._
    val base = t.embeddings.filter($"vec_id" % 3 =!= 0)
      .select($"vec_id", $"embedding")
    val drifted = graft.operators.Similarity.driftedCohort(t)
    graft.operators.Similarity.buildAnnIndex(base, $"vec_id", $"embedding",
      "graft_dp")
    graft.operators.Similarity.retrainAnnIndex(base.unionByName(drifted),
      $"vec_id", $"embedding", "graft_dp")
    println("DP retrained recall: " +
      graft.operators.Similarity.driftProbeRecall(t, "graft_dp"))
    spark.stop()
  }
}
