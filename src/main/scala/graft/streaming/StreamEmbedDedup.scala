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

/** One retained representative of a bucket (public for encoder
  * codegen). */
case class BucketAnchor(id: Long, emb: Array[Double], nrm: Double, tsMs: Long)

/** A bucket's bounded ring of recent representatives (public for
  * encoder codegen). */
case class BucketAnchors(as: Seq[BucketAnchor])

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
  * Semantics: each bucket retains a ring of its `maxAnchors` most
  * recent NON-duplicate arrivals. An arrival is exact-verified against
  * every retained representative of its bucket; each cosine ≥ `minCos`
  * emits an [[EmbedNearDup]]. A miss joins the ring (evicting the
  * oldest beyond `maxAnchors`); a hit does not — duplicates never
  * accumulate state. A single anchor per bucket is NOT enough at
  * sustained rates: with 2^planesPerBand buckets per band the buckets
  * saturate and unrelated vectors capture them, silently dropping
  * recall (measured in tools.StreamBench — hits flatlined until the
  * ring was added). The guarantee is therefore: a duplicate is caught
  * if its original is among the bucket's `maxAnchors` most recent
  * distinct items AND within the watermark horizon — the near-dup
  * ingest case (copies arrive close to their originals); full
  * pairwise clustering stays a batch concern.
  *
  * Scale/state design: state per occupied bucket is ≤ `maxAnchors`
  * vectors, so total state is bounded by
  * `bands · 2^planesPerBand · maxAnchors` slots regardless of stream
  * length or rate; size `planesPerBand` ≈ log2(expected distinct
  * items per horizon) to keep buckets ≈ corpus so the ring rarely
  * evicts inside the horizon. Expired representatives (event time
  * older than the watermark minus `delayMs`) are pruned on update,
  * and `EventTimeTimeout` removes idle buckets wholesale — the same
  * guarantee window [[StreamDedup]] documents for the exact-
  * fingerprint half. Verification uses the identical sequential
  * double fold as the native batch expression
  * (`graft.expr.CosineSim.compute` order), so emitted cosines are
  * bit-equal to the batch path's. */
object StreamEmbedDedup {

  /** @param events  streaming Dataset with event time, id, embedding
    * @param minCos  exact-verify threshold (near-dup regime, ≳ 0.8 —
    *                the banded recall math in Dedup.scala applies)
    * @param delayMs watermark delay AND representative lifetime:
    *                duplicates of a retained item are guaranteed
    *                caught only within this event-time horizon
    * @param maxAnchors ring size per bucket — the recency window of
    *                retained representatives
    */
  def nearDups(
      events: Dataset[EmbedEvent], minCos: Double,
      delayMs: Long, bands: Int = 12, planesPerBand: Int = 4,
      dim: Int = 64, seed: Long = 42L, maxAnchors: Int = 8): Dataset[EmbedNearDup] = {
    val planes = graft.operators.Dedup.bandPlanes(bands, planesPerBand, dim, seed)
    val planesB = events.sparkSession.sparkContext.broadcast(planes)

    implicit val hitEnc = Encoders.product[BandHit]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    implicit val stateEnc = Encoders.product[BucketAnchors]
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
        state: GroupState[BucketAnchors]): Iterator[EmbedNearDup] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var out = List.empty[EmbedNearDup]
      var ring: Vector[BucketAnchor] =
        state.getOption.map(_.as.toVector).getOrElse(Vector.empty)
      // prune representatives the watermark has outlived — their
      // guarantee window is over even if the bucket stays busy
      val wm = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs() else 0L
      ring = ring.filter(_.tsMs + delayMs > wm)
      // arrival order within a micro-batch: event time, then id —
      // deterministic ring contents under replay
      rows.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
        if (!ring.exists(_.id == r.id)) { // replay of a retained item
          val rNrm = math.sqrt(dot(r.emb, r.emb))
          val matches = ring.flatMap { a =>
            val cos = dot(a.emb, r.emb) / (a.nrm * rNrm)
            if (cos >= minCos) Some(EmbedNearDup(a.id, r.id, cos, bk._1)) else None
          }
          if (matches.nonEmpty) out = matches.toList reverse_::: out
          // a row the late-filter admitted with the PREVIOUS batch's
          // watermark can still be behind the CURRENT one (idle gap /
          // backfill burst): its window is already over, so retaining
          // it — or deriving a timeout from it — would set a timeout
          // below the watermark, which Spark rejects and the query
          // dies. Check against what it can, retain only if live.
          else if (r.ts.getTime + delayMs > wm)
            ring = (ring :+ BucketAnchor(r.id, r.emb, rNrm, r.ts.getTime))
              .takeRight(maxAnchors)
        }
      }
      if (ring.isEmpty) state.remove()
      else {
        state.update(BucketAnchors(ring))
        state.setTimeoutTimestamp(ring.map(_.tsMs).max + delayMs)
      }
      out.reverseIterator
    }

    hits.groupByKey(h => (h.band, h.key))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
