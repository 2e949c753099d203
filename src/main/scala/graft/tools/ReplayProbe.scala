package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Diagnostic: replay q111's stream manually and dump per-batch
  * durationMs from the streaming progress. Usage:
  * runMain graft.tools.ReplayProbe <sfDir> */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "5")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("warm tables")(graft.Tables(spark, dir).events.count())
    val slice = t("slice collect") {
      graft.Tables(spark, dir).events
        .filter($"ts" < to_timestamp(lit("2024-01-08 00:00:00")))
        .select($"ts", $"event_id", $"user_id", $"event_type", $"value")
        .orderBy($"ts", $"event_id")
        .as[graft.streaming.ReplayEvent].collect().toSeq
    }
    val sentinel = graft.streaming.ReplayEvent(
      new java.sql.Timestamp(slice.map(_.ts.getTime).max + 40L * 86400000L),
      -1L, -1L, "__flush__", 0.0)
    for (round <- 1 to 2) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[graft.streaming.ReplayEvent]
      val q = t(s"r$round start") {
        input.toDS()
          .withWatermark("ts", "1 hour")
          .groupBy(window($"ts", "1 day"), $"event_type")
          .agg(count(lit(1)).as("n_events"),
            sum($"value".cast(DecimalType(18, 4))).cast("double").as("total_value"))
          .select($"window.start".as("day_start"), $"event_type",
            $"n_events", $"total_value")
          .writeStream.outputMode("append")
          .format("memory").queryName(s"probe$round").start()
      }
      val chunks = slice.grouped((slice.length + 7) / 8).toSeq :+ Seq(sentinel)
      chunks.zipWithIndex.foreach { case (c, i) =>
        t(s"r$round chunk$i") { input.addData(c); q.processAllAvailable() }
      }
      q.recentProgress.foreach { p =>
        println(s"[probe] r$round batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
      q.stop()
    }
    spark.stop()
  }
}
