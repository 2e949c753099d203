package graft.streaming

import graft.ml.Scorer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming scoring path — the Spark-native equivalent of the
  * reference's NiFi flow (GenerateFlowFile → Jython event synth →
  * InvokeHTTP POST /api, reference `NFL_Spark_Model_Scoring.xml:
  * 486-523,633-644`): a rate source synthesizes plays with the same
  * value domains, and `foreachBatch` scores micro-batches in-process
  * instead of HTTP round trips.
  */
object PlayStream {

  /** Synthetic play stream with the NiFi generator's value domains:
    * qtr∈[1,4], down∈[1,3], TimeSecs∈[5,600], yrdline100∈[1,75],
    * ydstogo∈[1,12], ydsnet∈[1,35], month_day=920, posteam=PIT,
    * DefensiveTeam=NE, PlayType_lag∈{Run,Pass}. */
  def simulatedPlays(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame = {
    val rate = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
    def randInt(lo: Int, hi: Int): org.apache.spark.sql.Column =
      (floor(rand() * (hi - lo + 1)) + lo).cast("int")
    rate.select(
      col("timestamp").as("event_time"),
      col("value").as("event_id"),
      randInt(1, 4).as("qtr"),
      randInt(1, 3).as("down"),
      randInt(5, 600).as("TimeSecs"),
      randInt(1, 75).as("yrdline100"),
      randInt(1, 12).as("ydstogo"),
      randInt(1, 35).as("ydsnet"),
      lit(920).as("month_day"),
      lit("PIT").as("posteam"),
      lit("NE").as("DefensiveTeam"),
      when(rand() < 0.5, "Run").otherwise("Pass").as("PlayType_lag"))
  }

  /** Score a play stream micro-batch-wise with the two-model argmax
    * (stateless — each event independent, matching the reference's
    * per-request semantics). The scored batch is handed to `sink`. */
  def scoreStream(
      plays: DataFrame,
      scorer: Scorer,
      sink: DataFrame => Unit,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    plays.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) sink(scorer.scoreBatch(batch))
      }
      .start()

  /** [[scoreStream]] with the delivery policy of the reference's NiFi
    * flow (RouteOnAttribute relationships Retry / Failure, reference
    * `NFL_Spark_Model_Scoring.xml:680-691`): a failed sink delivery is
    * retried up to `maxAttempts` times (transient-failure parity with
    * NiFi's Retry relationship); a batch that exhausts its attempts is
    * routed to `deadLetter` with the last error (Failure relationship)
    * and the STREAM SURVIVES — the next micro-batch processes
    * normally, instead of the whole query dying on one poison batch.
    *
    * The scored rows are persisted once per batch so retries
    * re-deliver the same materialized result rather than re-running
    * the scoring jobs, and released deterministically when the batch
    * completes (a long-running stream must not accumulate dead blocks
    * until GC). `deadLetter` receives the SCORED batch (what failed
    * to deliver); if the dead-letter write itself throws, the
    * micro-batch fails and streaming-level retry applies — the same
    * backpressure NiFi exerts when its failure queue is full. */
  def scoreStreamResilient(
      plays: DataFrame,
      scorer: Scorer,
      sink: DataFrame => Unit,
      deadLetter: (DataFrame, Throwable) => Unit,
      maxAttempts: Int = 3,
      backoffMs: Long = 0L,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1: $maxAttempts")
    plays.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val scored = scorer.scoreBatch(batch).persist()
          try {
            scored.count(): Unit // materialize once; retries re-read the cache
            var attempt = 0
            var delivered = false
            var lastErr: Throwable = null
            while (!delivered && attempt < maxAttempts) {
              try { sink(scored); delivered = true }
              catch {
                case scala.util.control.NonFatal(e) =>
                  lastErr = e
                  attempt += 1
                  if (backoffMs > 0 && attempt < maxAttempts) Thread.sleep(backoffMs)
              }
            }
            if (!delivered) deadLetter(scored, lastErr)
          } finally scored.unpersist(): Unit
        }
      }
      .start()
  }
}
