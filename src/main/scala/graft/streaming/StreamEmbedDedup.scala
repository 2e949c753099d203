package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An embedding arriving on the ingest stream. */
case class EmbedEvent(ts: java.sql.Timestamp, vec_id: Long, emb: Array[Double])

/** A verified near-duplicate hit: `dup_id` arrived after `anchor_id`,
  * landed in the same LSH bucket in `band`, and exact cosine confirmed
  * the match. The same true pair can fire in several bands
  * (at-least-once) — consumers distinct on (anchor_id, dup_id). */
case class EmbedNearDup(anchor_id: Long, dup_id: Long, cos_sim: Double, band: Int)

/** Per-bucket retained representative (public for encoder codegen). */
case class BucketAnchor(id: Long, emb: Array[Double], nrm: Double, tsMs: Long)

/** One (band, key) bucket hit for an arriving embedding (public for
  * encoder codegen). Carries the event-time column itself (not just
  * millis): the watermark must be declared on a column that reaches
  * the stateful operator, and a typed flatMap severs the upstream tag. */
case class BandHit(
    band: Int, key: Int, ts: java.sql.Timestamp, id: Long, emb: Array[Double])

/** Streaming embedding near-duplicate detection — the ingest-side
  * analog of [[graft.operators.Dedup.embeddingNearDupsBanded]]
  * (SURVEY §2 dedup family; reference scope is batch-only, this is
  * north-star pipeline scope like the batch banded path). Same LSH
  * construction, same planes (shared [[graft.operators.Dedup.bandPlanes]]
  * generator, same seed ⇒ identical sign bits), so a vector lands in
  * the same buckets whether it arrives in a stream or a batch scan.
  *
  * Semantics: the FIRST vector seen in a bucket is retained as that
  * bucket's anchor; every later arrival in the bucket within the
  * watermark horizon is exact-verified against the anchor and emitted
  * as an [[EmbedNearDup]] when cosine ≥ `minCos`. An item that misses
  * every anchor is itself retained in each of its still-empty buckets
  * — with b independent bands, a genuinely novel item anchors nearly
  * all of its buckets (an occupied-but-non-matching bucket is a
  * random sign-code collision, p ≈ 2^-planesPerBand per band), so
  * later copies of it are still caught. This is first-occurrence
  * dedup (flag copies of retained items), not full pairwise
  * clustering — the batch path owns that.
  *
  * Scale/state design: state per occupied bucket is ONE vector +
  * id + norm (not the bucket's history), so state is bounded by
  * distinct-buckets-in-horizon ≤ arrivals-in-horizon, independent of
  * stream length; `EventTimeTimeout` expires an anchor `delayMs`
  * past its event time, exactly the guarantee window
  * [[StreamDedup]] documents for the exact-fingerprint half.
  * Verification reuses the identical sequential double fold as the
  * native batch expression (`graft.expr.CosineSim.compute` order),
  * so emitted cosines are bit-equal to the batch path's. */
object StreamEmbedDedup {

  /** @param events  streaming Dataset with event time, id, embedding
    * @param minCos  exact-verify threshold (near-dup regime, ≳ 0.8 —
    *                the banded recall math in Dedup.scala applies)
    * @param delayMs watermark delay AND anchor lifetime: duplicates of
    *                an anchor are guaranteed caught only within this
    *                event-time horizon of the anchor's arrival
    */
  def nearDups(
      events: Dataset[EmbedEvent], minCos: Double,
      delayMs: Long, bands: Int = 12, planesPerBand: Int = 4,
      dim: Int = 64, seed: Long = 42L): Dataset[EmbedNearDup] = {
    val planes = graft.operators.Dedup.bandPlanes(bands, planesPerBand, dim, seed)
    val planesB = events.sparkSession.sparkContext.broadcast(planes)

    implicit val hitEnc = Encoders.product[BandHit]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    implicit val stateEnc = Encoders.product[BucketAnchor]
    implicit val outEnc = Encoders.product[EmbedNearDup]

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }

    val hits = events
      .flatMap { e =>
        require(e.emb.length == dim,
          s"StreamEmbedDedup: dim=$dim but embedding has ${e.emb.length} elements")
        val ps = planesB.value
        (0 until bands).iterator.map { b =>
          var key = 0
          var i = 0
          while (i < planesPerBand) {
            if (dot(ps(b)(i), e.emb) >= 0) key |= 1 << i
            i += 1
          }
          BandHit(b, key, e.ts, e.vec_id, e.emb)
        }
      }
      .withWatermark("ts", s"$delayMs milliseconds")

    def fn(bk: (Int, Int), rows: Iterator[BandHit],
        state: GroupState[BucketAnchor]): Iterator[EmbedNearDup] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var out = List.empty[EmbedNearDup]
      var cur = state.getOption
      // arrival order within a micro-batch: event time, then id —
      // deterministic anchor election under replay
      rows.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
        cur match {
          case None =>
            cur = Some(BucketAnchor(r.id, r.emb, math.sqrt(dot(r.emb, r.emb)), r.ts.getTime))
          case Some(a) if a.id == r.id => () // replay of the anchor itself
          case Some(a) =>
            val cos = dot(a.emb, r.emb) /
              (a.nrm * math.sqrt(dot(r.emb, r.emb)))
            if (cos >= minCos) out ::= EmbedNearDup(a.id, r.id, cos, bk._1)
        }
      }
      cur.foreach { a =>
        state.update(a)
        state.setTimeoutTimestamp(a.tsMs + delayMs)
      }
      out.reverseIterator
    }

    hits.groupByKey(h => (h.band, h.key))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
