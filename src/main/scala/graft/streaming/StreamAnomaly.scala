package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ring of the last `lookback` quantized values, oldest first
  * (public for encoder codegen). */
case class AnomalyState(ring: Seq[Long], lastUs: Long)

/** One flagged event; z is None when the lookback window had zero
  * variance (any deviation flags there). */
case class AnomalyHit(event_id: Long, user_id: Long, value: Double,
    z: Option[Double])

/** Streaming rolling z-score anomalies — the unbounded-stream twin of
  * the batch [[graft.operators.EventOps.rollingAnomaliesOver]] (q146).
  * O(lookback) state per user: a ring of the last `lookback`
  * 10⁻⁶-quantized values folded in (ts, event_id) order. The flag is
  * the same denominator-cleared integer inequality as the batch
  * operator — (W·q − Σq)² > z²·(W·Σq² − (Σq)²) — evaluated in exact
  * BigInt (the stream-side spelling of the batch DECIMAL(38,0)), so
  * stream ≡ batch bit-for-bit including the reported z (identical
  * integer→double casts and IEEE expression).
  *
  * Anomalies depend only on PRECEDING events, so each hit emits
  * immediately in the micro-batch that carries it — no watermark wait;
  * the event-time timeout exists purely to evict idle users' state
  * (the production unbounded-key posture). Eviction RESETS the ring:
  * a user quiet for `quietMs` starts a fresh baseline window (hits
  * are never lost — they were already emitted — but the next
  * `lookback` events after a long gap score nothing). Callers that
  * need strict batch ≡ stream over a bounded slice set `quietMs`
  * past the slice span, as the q150 replay does. The feed must be
  * event-time-ordered across micro-batches (watermarked source;
  * the replay harness feeds monotone chunks) — within a batch, events
  * are sorted here. */
object StreamAnomaly {

  def anomaliesPerUser(events: Dataset[UserEvent], lookback: Int = 5,
      zThresh: Int = 3, quietMs: Long = 3600000L): Dataset[AnomalyHit] = {
    require(lookback >= 2 && zThresh >= 1,
      s"bad params: lookback=$lookback z=$zThresh")
    implicit val outEnc = Encoders.product[AnomalyHit]
    implicit val longEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[AnomalyState]

    def fn(userId: Long, evs: Iterator[UserEvent],
        state: GroupState[AnomalyState]): Iterator[AnomalyHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var cur = state.getOption.getOrElse(AnomalyState(Vector.empty, 0L))
      val hits = Vector.newBuilder[AnomalyHit]
      evs.toSeq.sortBy(e => (Sessionize.toMicros(e.ts), e.event_id)).foreach { e =>
        // identical quantization IEEE ops to the batch operator
        val q = math.floor(e.value * 1e6 + 0.5).toLong
        if (cur.ring.length == lookback) {
          val sq = BigInt(cur.ring.sum)
          val sqq = cur.ring.map(v => BigInt(v) * v).sum
          val num = BigInt(lookback) * q - sq
          val den = BigInt(lookback) * sqq - sq * sq
          if (num * num > BigInt(zThresh * zThresh) * den) {
            val z = if (den > 0)
              Some(num.toDouble / math.sqrt(den.toDouble)) else None
            hits += AnomalyHit(e.event_id, userId, e.value, z)
          }
        }
        val ring = (cur.ring :+ q).takeRight(lookback)
        cur = AnomalyState(ring,
          math.max(cur.lastUs, Sessionize.toMicros(e.ts)))
      }
      state.update(cur)
      state.setTimeoutTimestamp(
        math.floorDiv(cur.lastUs + 999L, 1000L) + quietMs)
      hits.result().iterator
    }

    events.groupByKey(_.user_id)(longEnc)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)(stateEnc, outEnc)
  }
}
