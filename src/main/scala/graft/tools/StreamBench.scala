package graft.tools

import graft.ml.{PlayFeatures, PlayPipeline, Scorer, TrainMain}
import graft.streaming.{PlayStream, StreamDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming throughput / state-footprint evidence (BASELINE.md):
  *
  *  1. Sustained events/sec of the RESILIENT scoring stream
  *     ([[PlayStream.scoreStreamResilient]]) at 10×, 100× and 1000×
  *     the reference's NiFi arrival rate (1 event/s, reference
  *     `NFL_Spark_Model_Scoring.xml` GenerateFlowFile 1/s): rate
  *     source at R rows/s for `secs` seconds; reports the mean
  *     processedRowsPerSecond over completed micro-batches (first
  *     batch excluded — codegen warm-up) and the delivered-row count.
  *  2. State footprint of the watermark-bounded streaming dedup
  *     ([[StreamDedup.dedupedByContent]]) at the same rates: rows
  *     and bytes held in the state store after `secs` seconds of
  *     arrivals inside one watermark horizon (the worst case — no
  *     eviction yet).
  *
  * Usage: runMain graft.tools.StreamBench [secsPerRate]
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8") // streaming state: small per-batch shuffles
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the scoring model pair (train once; ~30 s — same fixture path
    // the test suite uses)
    val plays = PlayFeatures.derive(PlayFeatures.readCsv(spark, TrainMain.DefaultCsv))
    val (passM, runM) = PlayPipeline.train(plays)
    val scorer = new Scorer(spark, passM, runM)

    for (rate <- Seq(10, 100, 1000)) {
      val delivered = new java.util.concurrent.atomic.AtomicLong(0)
      val q = PlayStream.scoreStreamResilient(
        PlayStream.simulatedPlays(spark, rate), scorer,
        sink = scored => { delivered.addAndGet(scored.count()): Unit },
        deadLetter = (_, e) => System.err.println(s"[streambench] dead letter: $e"))
      Thread.sleep(secs * 1000L)
      val progress = q.recentProgress.toSeq
      q.stop()
      // only batches that actually processed rows count: no-data
      // catch-up batches would bias the mean low, and a mean alone can
      // call a falling-behind stream "sustained" — the verdict uses
      // the MAX data-batch wall against the trigger interval AND the
      // processed-vs-input rate
      val data = progress.drop(1).filter(_.numInputRows > 0)
      val rates = data.map(_.processedRowsPerSecond).filter(_ > 0)
      val batchMs = data.map(_.durationMs.get("triggerExecution").toDouble)
      val maxBatch = if (batchMs.nonEmpty) batchMs.max else 0.0
      val meanProc = if (rates.nonEmpty) rates.sum / rates.size else 0.0
      val sustained = batchMs.nonEmpty && maxBatch < 1000 && meanProc >= rate
      println(f"[streambench] scoring rate=$rate%d ev/s: delivered=${delivered.get()}%d " +
        f"meanProcessed=$meanProc%.0f rows/s " +
        f"meanBatch=${if (batchMs.nonEmpty) batchMs.sum / batchMs.size else 0.0}%.0f ms " +
        f"maxBatch=$maxBatch%.0f ms (sustained=$sustained%s)")
    }

    // watermark-bounded content dedup: rate-source docs, ~20% dups
    // (every 5th row repeats the previous row's text), 10-minute
    // watermark so nothing evicts during the run — worst-case state
    for (rate <- Seq(10, 100, 1000)) {
      val docs = spark.readStream.format("rate")
        .option("rowsPerSecond", rate).load()
        .select(col("timestamp").as("ts"),
          concat(lit("document body "),
            (col("value") - col("value") % 5)).as("text"))
      val q = StreamDedup.dedupedByContent(docs, "ts", "text", "10 minutes")
        .writeStream.outputMode("append").format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
        .start()
      Thread.sleep(secs * 1000L)
      val last = q.recentProgress.lastOption
      q.stop()
      last.flatMap(_.stateOperators.headOption) match {
        case Some(so) =>
          println(f"[streambench] dedup rate=$rate%d ev/s: stateRows=${so.numRowsTotal}%d " +
            f"stateBytes=${so.memoryUsedBytes}%d " +
            f"bytesPerRow=${if (so.numRowsTotal > 0) so.memoryUsedBytes.toDouble / so.numRowsTotal else 0.0}%.0f")
        case None => println(s"[streambench] dedup rate=$rate: no progress recorded")
      }
    }
    // streaming embedding near-dup: rate-source synthetic 64-dim
    // vectors, every 10th row a planted twin of the previous row →
    // measured end-to-end throughput (banding + anchor verify) and
    // per-bucket anchor state at the same three rates
    import graft.streaming.{EmbedEvent, StreamEmbedDedup}
    import spark.implicits._
    def vecFor(seed: Long): Array[Double] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextGaussian())
    }
    for (rate <- Seq(10, 100, 1000)) {
      val hits = new java.util.concurrent.atomic.AtomicLong(0)
      val events = spark.readStream.format("rate")
        .option("rowsPerSecond", rate).load()
        .as[(java.sql.Timestamp, Long)]
        .map { case (ts, v) =>
          val base = vecFor(v - v % 10)
          val emb = if (v % 10 == 9) {
            val r = new scala.util.Random(v)
            base.map(_ + 0.05 * r.nextGaussian())
          } else vecFor(v)
          EmbedEvent(ts, v, emb)
        }
      val q = StreamEmbedDedup.nearDups(events, minCos = 0.9,
        delayMs = 10L * 60 * 1000)
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.EmbedNearDup], _: Long) =>
          hits.addAndGet(df.select("anchor_id", "dup_id").distinct().count()): Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
        .start()
      Thread.sleep(secs * 1000L)
      val progress = q.recentProgress.toSeq
      q.stop()
      val data = progress.drop(1).filter(_.numInputRows > 0)
      val rates = data.map(_.processedRowsPerSecond).filter(_ > 0)
      val batchMs = data.map(_.durationMs.get("triggerExecution").toDouble)
      val meanProc = if (rates.nonEmpty) rates.sum / rates.size else 0.0
      val maxBatch = if (batchMs.nonEmpty) batchMs.max else 0.0
      val st = progress.lastOption.flatMap(_.stateOperators.headOption)
      println(f"[streambench] embdedup rate=$rate%d ev/s: twinHits=${hits.get()}%d " +
        f"meanProcessed=$meanProc%.0f rows/s maxBatch=$maxBatch%.0f ms " +
        f"stateRows=${st.map(_.numRowsTotal).getOrElse(0L)}%d " +
        f"stateBytes=${st.map(_.memoryUsedBytes).getOrElse(0L)}%d")
    }
    spark.stop()
  }
}
