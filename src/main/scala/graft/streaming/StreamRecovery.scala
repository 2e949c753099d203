package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Crash-recovery harness for the checkpointed streaming operators —
  * the evidence layer for the one production property a clean run
  * can't show: a query that DIES mid-stream and restarts from its
  * checkpoint must produce exactly the uninterrupted output (zero
  * loss, zero duplication beyond whole-batch redelivery into an
  * idempotent sink — the standard Structured Streaming exactly-once
  * contract: replayable source + idempotent batch sink).
  *
  * Design for determinism (so "recovered ≡ uninterrupted" is a hash
  * assert, not a statistical claim):
  *  - the source is a parquet FILE stream with `maxFilesPerTrigger=1`
  *    and ascending file mtimes → micro-batch i always carries file i,
  *    in both the first attempt and the recovered one (the offset log
  *    replays the planned-but-uncommitted batch file-for-file);
  *  - duplicate texts sit in the SAME single-row-group file, so the
  *    dedup's first-occurrence choice never depends on batch order;
  *  - two far-future SENTINEL files close the stream: the first
  *    advances the watermark past every real window, the second gives
  *    append mode the extra batch it needs to flush them — so the
  *    final emitted window set is total and identical in every run;
  *  - the crash is INJECTED deterministically: the foreachBatch sink
  *    throws on a chosen batchId after recording its rows — the worst
  *    case (sink wrote, commit log didn't), which forces a redelivery
  *    the idempotent sink must absorb.
  *
  * Used by StreamRecoverySpec (correctness, RocksDB + changelog
  * checkpointing) and `StreamBench --recovery` (recovery-time
  * numbers for BASELINE.md).
  */
object StreamRecovery {

  val EventSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("text", StringType),
    StructField("event_id", LongType),
    StructField("user_id", LongType)))

  val Epoch0: Long =
    java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
  /** Real events stay below this; sentinel events sit at/above it. */
  val SentinelMs: Long =
    java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime

  final case class Ev(ts: java.sql.Timestamp, event_type: String,
      value: Double, text: String, event_id: Long, user_id: Long)

  /** i-th synthetic event: 7-second cadence, 1-in-97 value cycle,
    * text duplicated in adjacent triples (i, i+1, i+2 share a body —
    * so a 3-divisible rowsPerFile keeps each dup group in one file).
    * Users come in BURSTS of 10 consecutive events (user (i/10) % 50):
    * in-burst gaps are 7 s, the user's next burst is ≥ 3500 s away —
    * so a 600 s session gap closes exactly one session per burst,
    * which is what the sessionization recovery workload needs. */
  def eventAt(i: Int): Ev = Ev(
    new java.sql.Timestamp(Epoch0 + i * 7000L),
    Seq("click", "view", "purchase")(i % 3),
    (i % 97).toDouble,
    s"document body ${i - i % 3}",
    i.toLong,
    (i / 10) % 50L)

  def realEvents(n: Int): Seq[Ev] = (0 until n).map(eventAt)

  /** Write `nFiles` single-row-group parquet files (rowsPerFile each,
    * `rowsPerFile % 3 == 0`) plus two sentinel files, mtimes strictly
    * ascending so the file source's batch order is reproducible. */
  def writeInput(spark: SparkSession, dir: String, nFiles: Int,
      rowsPerFile: Int): Unit = {
    require(rowsPerFile % 3 == 0, "dup groups must not straddle files")
    import spark.implicits._
    val root = Paths.get(dir)
    Files.createDirectories(root)
    def writeOne(name: String, rows: Seq[Ev], mtime: Long): Unit = {
      val tmp = root.resolve(s"__tmp_$name").toString
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      require(part.length == 1, s"expected one part file, got ${part.length}")
      val dst = root.resolve(name)
      Files.move(Paths.get(part.head), dst, StandardCopyOption.REPLACE_EXISTING)
      Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p): Unit)
      dst.toFile.setLastModified(mtime): Unit
    }
    val base = System.currentTimeMillis() - 3600L * 1000
    for (f <- 0 until nFiles)
      writeOne(f"f$f%03d.parquet",
        (f * rowsPerFile until (f + 1) * rowsPerFile).map(eventAt),
        base + f * 1000L)
    // sentinels: unique texts, far-future ts — the first pushes the
    // watermark past all real windows, the second flushes them
    writeOne("z0_sentinel.parquet",
      Seq(Ev(new java.sql.Timestamp(SentinelMs), "sentinel", 0.0,
        "sentinel body 0", 1000000L, 99999L)), base + nFiles * 1000L)
    writeOne("z1_sentinel.parquet",
      Seq(Ev(new java.sql.Timestamp(SentinelMs + 3600L * 1000), "sentinel",
        0.0, "sentinel body 1", 1000001L, 99998L)), base + (nFiles + 1) * 1000L)
  }

  def fileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

  /** Workload 1: event-time tumbling windowed aggregation (the
    * stateful-agg recovery case — watermark + window state). */
  def windowedAgg(events: DataFrame): DataFrame =
    EventStream.tumblingCounts(
      events.select("ts", "event_type", "value"), "10 minutes", "10 minutes")

  /** Workload 2: content-fingerprint dedup (the
    * dropDuplicatesWithinWatermark state recovery case). */
  def fingerprintDedup(events: DataFrame): DataFrame =
    StreamDedup.dedupedByContent(
      events.select("ts", "text"), "ts", "text", "30 minutes")
      .select("ts", "text")

  /** Workload 3: gap sessionization — the CUSTOM-state class
    * (flatMapGroupsWithState + event-time timeout), whose recovery
    * path restores an arbitrary user-defined state object, not a
    * built-in agg/dedup map. Burst structure (see [[eventAt]]) closes
    * one session per 10-event burst; the sentinels advance the
    * watermark so every timeout fires and the final sessions emit. */
  def sessionize(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val ue = events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withWatermark("ts", "30 minutes")
      .as[UserEvent]
    Sessionize.sessions(ue, gapMs = 600000L).toDF()
  }

  /** Workload 4: streaming as-of join — the SECOND custom-state class
    * ([[StreamAsOf]], q132), whose recovery restores buffered
    * click/error vectors plus a pending event-time timeout, not a
    * scalar fold. Purchases are re-labelled as the error side, so
    * each purchase finalizes against the user's latest prior click
    * once the watermark passes it; the sentinels flush the tail. */
  def asOfJoin(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val ue = events
      .select(col("event_id"), col("ts"), col("user_id"),
        when(col("event_type") === "purchase", "error")
          .otherwise(col("event_type")).as("event_type"),
        col("value"))
      .withWatermark("ts", "30 minutes")
      .as[UserEvent]
    StreamAsOf.asOfMatches(ue).toDF()
  }

  /** Workload 5: rolling z-score anomalies — the THIRD custom-state
    * class ([[StreamAnomaly]], q150): recovery must restore a
    * per-user RING of the last 5 quantized values (an ordered buffer,
    * not a scalar fold or a pending join) so that a hit whose window
    * straddles the crash batch still fires exactly once. In-burst
    * gaps are 7 s and inter-burst gaps ≈ 3500 s < the 3600 s quiet
    * horizon (with the 30-min watermark delay the eviction timeout
    * never fires mid-stream), so the ring is equivalent to the batch
    * operator's frame and the truth is batch q146 over the real
    * events. */
  def anomalies(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val ue = events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withWatermark("ts", "30 minutes")
      .as[UserEvent]
    StreamAnomaly.anomaliesPerUser(ue).toDF()
  }

  /** Ground truth for [[anomalies]]: the batch q146 operator (the
    * sentinel users carry < lookback events — they flag nothing). */
  def anomalyTruth(spark: SparkSession, nRows: Int): Vector[String] = {
    import spark.implicits._
    graft.operators.EventOps.rollingAnomaliesOver(
      realEvents(nRows).toDF(), col("user_id"), col("ts"),
      col("event_id"), col("value"))
      .collect().map(_.toString).toVector.sorted
  }

  /** Driver-side idempotent batch sink with optional one-shot crash
    * injection. Rows are canonicalized (sorted strings) per batchId;
    * a redelivered batchId must carry byte-identical content —
    * asserted here, where the redelivery lands. */
  final class CollectingSink(crashAtBatch: Long = -1L) {
    private val batches =
      new java.util.concurrent.ConcurrentHashMap[Long, Vector[String]]()
    val redelivered = new java.util.concurrent.CopyOnWriteArrayList[Long]()
    @volatile private var armed = crashAtBatch >= 0

    def onBatch(df: DataFrame, batchId: Long): Unit = {
      val rows = df.collect().map(_.toString).toVector.sorted
      val prev = batches.put(batchId, rows)
      if (prev != null) {
        redelivered.add(batchId): Unit
        require(prev == rows,
          s"redelivered batch $batchId differs from its first delivery: " +
            s"was ${prev.take(3)}… now ${rows.take(3)}…")
      }
      if (armed && batchId == crashAtBatch) {
        armed = false // crash exactly once — the restart sails past
        throw new RuntimeException(s"injected sink crash at batch $batchId")
      }
    }

    def batchIds: Seq[Long] = {
      import scala.jdk.CollectionConverters._
      batches.keySet().asScala.toSeq.sorted
    }
    /** All recorded rows (idempotent union), sentinel rows excluded. */
    def allRealRows: Vector[String] = {
      import scala.jdk.CollectionConverters._
      batches.values().asScala.toVector.flatten
        .filterNot(isSentinelRow).sorted
    }
  }

  /** A row string mentioning a sentinel timestamp/body — excluded
    * from comparisons (the 2nd sentinel's own window never flushes,
    * which is fine: it exists only to flush everything else). */
  def isSentinelRow(s: String): Boolean =
    s.contains("sentinel") || s.contains("2024-02-")

  /** Start a recoverable query over `transform(fileStream)` writing
    * through `sink`, checkpointed at `ckDir`. AvailableNow: processes
    * every pending file then terminates (or dies at the injected
    * crash — `awaitTermination` then throws). */
  def start(spark: SparkSession, inDir: String, ckDir: String,
      transform: DataFrame => DataFrame, sink: CollectingSink): StreamingQuery =
    transform(fileStream(spark, inDir))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .foreachBatch((df: DataFrame, id: Long) => sink.onBatch(df, id))
      .trigger(Trigger.AvailableNow())
      .start()

  /** Batch ground truth for [[windowedAgg]] over the real events. */
  def aggTruth(spark: SparkSession, nRows: Int): Vector[String] = {
    import spark.implicits._
    windowedAgg(realEvents(nRows).toDF())
      .collect().map(_.toString).toVector.sorted
  }

  /** Ground truth for [[sessionize]]: fold the real events per user in
    * (ts, event_id) order — the operator's own deterministic order —
    * splitting at >600 s gaps; the value total accumulates in the same
    * IEEE sequence the operator uses. Rendered through a DataFrame so
    * the row strings compare byte-for-byte with the sink's. */
  def sessionTruth(spark: SparkSession, nRows: Int): Vector[String] = {
    import spark.implicits._
    val gapUs = 600000000L
    def us(t: java.sql.Timestamp): Long = Sessionize.toMicros(t)
    val sessions = realEvents(nRows).groupBy(_.user_id).toSeq.flatMap {
      case (uid, evs) =>
        val sorted = evs.sortBy(e => (us(e.ts), e.event_id))
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        var cur: Option[(Long, Long, Long, Double)] = None // start, last, n, total
        for (e <- sorted) {
          val t = us(e.ts)
          cur match {
            case Some((s, l, n, tot)) if t - l <= gapUs =>
              cur = Some((s, math.max(l, t), n + 1, tot + e.value))
            case Some((s, l, n, tot)) =>
              out += ((uid, Sessionize.fromMicros(s), Sessionize.fromMicros(l), n, tot))
              cur = Some((t, t, 1L, e.value))
            case None =>
              cur = Some((t, t, 1L, e.value))
          }
        }
        cur.foreach { case (s, l, n, tot) =>
          out += ((uid, Sessionize.fromMicros(s), Sessionize.fromMicros(l), n, tot))
        }
        out
    }
    sessions
      .toDF("user_id", "session_start", "session_end", "n_events", "total_value")
      .collect().map(_.toString).toVector.sorted
  }

  /** Ground truth for [[asOfJoin]]: per purchase, the latest
    * same-user click at-or-before it (micros compare, max-id
    * tie-break — the operator's own deterministic order), −1/epoch
    * when none. Rendered through a DataFrame so the row strings
    * compare byte-for-byte with the sink's. */
  def asOfTruth(spark: SparkSession, nRows: Int): Vector[String] = {
    import spark.implicits._
    val evs = realEvents(nRows)
    val byUser = evs.groupBy(_.user_id)
    val rows = evs.filter(_.event_type == "purchase").map { e =>
      val clicks = byUser(e.user_id).filter(c => c.event_type == "click" &&
        Sessionize.toMicros(c.ts) <= Sessionize.toMicros(e.ts))
      if (clicks.isEmpty)
        (e.user_id, e.event_id, -1L, new java.sql.Timestamp(0L))
      else {
        val best = clicks.maxBy(c => (Sessionize.toMicros(c.ts), c.event_id))
        (e.user_id, e.event_id, best.event_id, best.ts)
      }
    }
    rows.toDF("user_id", "error_id", "click_id", "click_ts")
      .collect().map(_.toString).toVector.sorted
  }

  /** Batch ground truth for [[fingerprintDedup]]: the first occurrence
    * of each dup triple is its earliest-ts member (arrival order is
    * ascending i within a single-row-group file). */
  def dedupTruth(spark: SparkSession, nRows: Int): Vector[String] = {
    import spark.implicits._
    realEvents(nRows).toDF()
      .groupBy($"text").agg(min($"ts").as("ts"))
      .select($"ts", $"text")
      .collect().map(_.toString).toVector.sorted
  }
}
