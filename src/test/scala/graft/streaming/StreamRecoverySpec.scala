package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.StreamingQueryException
import java.nio.file.Files

/** Crash-recovery: the checkpointed stateful operators must survive a
  * mid-stream death and resume to EXACTLY the uninterrupted output.
  * Runs on the RocksDB state store provider with changelog
  * checkpointing — the declared production configuration — so the
  * recovery path exercised here (changelog replay onto the last
  * snapshot) is the one a real deployment would take.
  *
  * The crash is deterministic: the foreachBatch sink throws on a fixed
  * batchId AFTER recording that batch's rows — the worst case (sink
  * output escaped, commit log didn't) — so the restart MUST redeliver
  * that batch and the idempotent sink must absorb the duplicate.
  * See [[StreamRecovery]] for why every run is bit-reproducible.
  */
class StreamRecoverySpec extends SparkSpec {

  private val NFiles = 12
  private val RowsPerFile = 300 // % 3 == 0: dup triples never straddle files
  private val NRows = NFiles * RowsPerFile
  private val CrashAt = 5L // batch 5 of 14 (12 data files + 2 sentinels)

  private def withRocksDb[A](body: => A): A = {
    val conf = spark.conf
    val prevProvider = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevChangelog = conf.getOption(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    try body
    finally {
      prevProvider match {
        case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      prevChangelog match {
        case Some(v) => conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", v)
        case None => conf.unset(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      }
    }
  }

  private lazy val inDir: String = {
    val d = Files.createTempDirectory("recovery_in").toString
    StreamRecovery.writeInput(spark, d, NFiles, RowsPerFile)
    d
  }

  /** Uninterrupted vs crash-and-resume, one workload. */
  private def recoveryCase(
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      truth: Vector[String]): Unit = withRocksDb {
    // uninterrupted reference run, fresh checkpoint
    val ckA = Files.createTempDirectory("recovery_ckA").toString
    val sinkA = new StreamRecovery.CollectingSink()
    val qA = StreamRecovery.start(spark, inDir, ckA, transform, sinkA)
    qA.awaitTermination()
    assert(sinkA.allRealRows === truth, "uninterrupted run != batch truth")
    assert(sinkA.redelivered.isEmpty)

    // crashed run: dies at batch CrashAt (rows already recorded)
    val ckB = Files.createTempDirectory("recovery_ckB").toString
    val sinkB = new StreamRecovery.CollectingSink(crashAtBatch = CrashAt)
    val qB1 = StreamRecovery.start(spark, inDir, ckB, transform, sinkB)
    val died = intercept[StreamingQueryException] { qB1.awaitTermination() }
    assert(died.getMessage.contains("injected sink crash"),
      s"query died for the wrong reason: ${died.getMessage.take(200)}")
    val committedBefore = sinkB.batchIds.max
    assert(committedBefore === CrashAt, "crash landed on the wrong batch")
    assert(sinkB.batchIds.size < NFiles + 2, "crash was not mid-stream")

    // resume from the SAME checkpoint: must redeliver the failed batch
    // (byte-identical — asserted inside the sink) and run to the end
    val t0 = System.nanoTime()
    val qB2 = StreamRecovery.start(spark, inDir, ckB, transform, sinkB)
    qB2.awaitTermination()
    val resumeSec = (System.nanoTime() - t0) / 1e9
    info(f"resume wall: $resumeSec%.1f s, redelivered=${sinkB.redelivered}")

    import scala.jdk.CollectionConverters._
    // zero loss, zero dup: idempotent union over batchIds == truth ==
    // the uninterrupted run, and the only redelivery is the crashed batch
    assert(sinkB.allRealRows === truth, "recovered output != batch truth")
    assert(sinkB.allRealRows === sinkA.allRealRows,
      "recovered output != uninterrupted output")
    assert(sinkB.redelivered.asScala.toSet === Set(CrashAt),
      s"unexpected redeliveries: ${sinkB.redelivered}")
    assert(sinkB.batchIds === sinkA.batchIds,
      "recovered batch sequence != uninterrupted sequence")
  }

  test("windowed agg recovers from a mid-stream crash (RocksDB + changelog): " +
    "output equals the uninterrupted run, zero loss, zero dup") {
    recoveryCase(StreamRecovery.windowedAgg,
      StreamRecovery.aggTruth(spark, NRows))
  }

  test("fingerprint dedup recovers from a mid-stream crash (RocksDB + changelog): " +
    "output equals the uninterrupted run, zero loss, zero dup") {
    recoveryCase(StreamRecovery.fingerprintDedup,
      StreamRecovery.dedupTruth(spark, NRows))
  }

  test("gap sessionization (flatMapGroupsWithState custom state) recovers from a " +
    "mid-stream crash (RocksDB + changelog): output equals the uninterrupted run") {
    recoveryCase(StreamRecovery.sessionize,
      StreamRecovery.sessionTruth(spark, NRows))
  }

  test("streaming as-of join (buffered custom state + pending timeouts) recovers " +
    "from a mid-stream crash (RocksDB + changelog): output equals the uninterrupted run") {
    recoveryCase(StreamRecovery.asOfJoin,
      StreamRecovery.asOfTruth(spark, NRows))
  }

  test("rolling-anomaly ring state (q150) recovers from a mid-stream crash " +
    "(RocksDB + changelog): output equals the batch operator, zero loss, zero dup") {
    val truth = StreamRecovery.anomalyTruth(spark, NRows)
    assert(truth.nonEmpty, "workload must actually flag anomalies")
    recoveryCase(StreamRecovery.anomalies, truth)
  }
}
