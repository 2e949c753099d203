package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Contract of the streaming embedding near-dup path: planted twins
  * are flagged against their anchors, novel vectors are not, the
  * emitted pair set matches the batch banded path on the same data,
  * and anchors expire with the watermark horizon. */
class StreamEmbedDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // deterministic corpus: 8 anchors, twins of anchors 0..3 (cos ≈ 1),
  // 4 unrelated novel vectors (cos ≈ 0 at dim 64)
  private def gauss(seed: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextGaussian())
  }
  private def twin(v: Array[Double], seed: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    v.map(_ + 0.05 * r.nextGaussian())
  }
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
  }

  test("planted twins are flagged against their anchors; novel vectors are not") {
    implicit val sqlCtx = spark.sqlContext
    val anchors = (0 until 8).map(i => gauss(100 + i))
    val twins = (0 until 4).map(i => twin(anchors(i), 200 + i))
    twins.zipWithIndex.foreach { case (t, i) =>
      assert(cos(anchors(i), t) > 0.95, s"planted twin $i too far")
    }

    val input = MemoryStream[EmbedEvent]
    val out = StreamEmbedDedup.nearDups(
      input.toDS(), minCos = 0.9, delayMs = 60L * 60 * 1000, dim = dim)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("embdedup").start()
    try {
      input.addData(anchors.zipWithIndex.map { case (v, i) =>
        EmbedEvent(ts("2024-01-01 00:00:00"), i.toLong, v)
      }: _*)
      q.processAllAvailable()
      // twins (ids 100..103) + novel vectors (ids 900..903) arrive later
      input.addData(twins.zipWithIndex.map { case (v, i) =>
        EmbedEvent(ts("2024-01-01 00:10:00"), 100L + i, v)
      } ++ (0 until 4).map(i =>
        EmbedEvent(ts("2024-01-01 00:10:00"), 900L + i, gauss(300 + i))): _*)
      q.processAllAvailable()

      val hits = spark.table("embdedup").as[EmbedNearDup].collect()
      val pairs = hits.map(h => (h.anchor_id, h.dup_id)).distinct.sorted
      assert(pairs.toSeq === Seq((0L, 100L), (1L, 101L), (2L, 102L), (3L, 103L)),
        s"got $pairs")
      assert(hits.forall(_.cos_sim >= 0.9))
      // batch path on the same corpus agrees on the pair set (streamed
      // ids are offset so id order matches arrival order)
      val df = (anchors.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
        twins.zipWithIndex.map { case (v, i) => (100L + i, v) } ++
        (0 until 4).map(i => (900L + i, gauss(300 + i)))).toDF("id", "emb")
      val batch = graft.operators.Dedup
        .embeddingNearDupsBanded(df, $"id", $"emb", minCos = 0.9, dim = dim)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(batch.toSeq === pairs.toSeq, s"stream $pairs vs batch ${batch.toSeq}")
      // cosines are bit-equal to the batch native-expression fold
      val batchCos = graft.operators.Dedup
        .embeddingNearDupsBanded(df, $"id", $"emb", minCos = 0.9, dim = dim)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      hits.foreach { h =>
        assert(batchCos((h.anchor_id, h.dup_id)) === h.cos_sim,
          s"cos mismatch for (${h.anchor_id},${h.dup_id})")
      }
    } finally q.stop()
  }

  test("a late-admitted row behind the current watermark cannot kill the query") {
    // Spark's late filter can run on an older watermark than the one
    // state timeouts validate against (they are distinct values in the
    // engine), so a row admitted into an idle gap could be asked to
    // anchor with a timeout at-or-below the watermark —
    // setTimeoutTimestamp rejects that and the query dies. The
    // operator guards by never retaining a row whose window is
    // already over (also the right semantics); this pins the
    // idle-gap/backfill scenario end to end.
    implicit val sqlCtx = spark.sqlContext
    val v = gauss(600)
    val input = MemoryStream[EmbedEvent]
    val out = StreamEmbedDedup.nearDups(
      input.toDS(), minCos = 0.9, delayMs = 10L * 60 * 1000, dim = dim)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("emblate").start()
    try {
      input.addData(EmbedEvent(ts("2024-01-01 00:00:00"), 1L, v))
      q.processAllAvailable()
      // jump the watermark far ahead (idle gap / backfill burst)
      input.addData(EmbedEvent(ts("2024-01-01 00:00:30"), 2L, gauss(601)),
        EmbedEvent(ts("2024-01-01 01:00:00"), 3L, gauss(602)))
      q.processAllAvailable()
      // the late filter for THIS batch still uses the pre-batch-2
      // watermark (~23:50), so a 00:30 event is admitted — but the
      // eviction watermark is already 00:50, past the event's whole
      // retention window [00:30, 00:40]: retaining it would set a
      // timeout below the watermark
      input.addData(EmbedEvent(ts("2024-01-01 00:30:00"), 4L, twin(v, 603)),
        EmbedEvent(ts("2024-01-01 02:00:00"), 5L, gauss(604)))
      q.processAllAvailable()
      assert(q.isActive, s"query died: ${Option(q.exception).flatten}")
      // and the stream still works going forward
      input.addData(EmbedEvent(ts("2024-01-01 02:00:30"), 6L, gauss(604)))
      q.processAllAvailable()
      assert(q.isActive)
    } finally q.stop()
  }

  test("anchors expire with the watermark; a twin of an expired anchor re-anchors") {
    implicit val sqlCtx = spark.sqlContext
    val v = gauss(500)
    val input = MemoryStream[EmbedEvent]
    // 10-minute guarantee window
    val out = StreamEmbedDedup.nearDups(
      input.toDS(), minCos = 0.9, delayMs = 10L * 60 * 1000, dim = dim)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("embexpire").start()
    try {
      input.addData(EmbedEvent(ts("2024-01-01 00:00:00"), 1L, v))
      q.processAllAvailable()
      // push the watermark far past the anchor's expiry
      input.addData(EmbedEvent(ts("2024-01-01 02:00:00"), 2L, gauss(501)))
      q.processAllAvailable()
      // a copy of the expired anchor: NOT flagged (outside the window),
      // becomes the bucket's new anchor instead
      input.addData(EmbedEvent(ts("2024-01-01 02:00:30"), 3L, twin(v, 502)))
      q.processAllAvailable()
      // a copy arriving within the new anchor's window IS flagged vs 3
      input.addData(EmbedEvent(ts("2024-01-01 02:01:00"), 4L, twin(v, 503)))
      q.processAllAvailable()

      val pairs = spark.table("embexpire").as[EmbedNearDup].collect()
        .map(h => (h.anchor_id, h.dup_id)).distinct.sorted
      assert(pairs.toSeq === Seq((3L, 4L)), s"got $pairs")
    } finally q.stop()
  }
}
