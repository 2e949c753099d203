package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running EWMA per user (public for encoder codegen). */
case class EwmaState(n: Long, ewma: Double, lastUs: Long)

/** Final per-user EWMA emitted when a user's stream goes quiet. */
case class UserEwma(user_id: Long, n_events: Long, ewma_value: Double)

/** Streaming EWMA features — the unbounded-stream twin of the batch
  * [[graft.operators.EventOps.ewmaPerUser]] (q70), which its Scaladoc
  * promised and round 6 delivers: O(1) state per user
  * (mapGroupsWithState-style fold instead of the batch
  * sort_array(collect_list) shuffle), sequential (ts, event_id)-order
  * accumulation so the double fold is bit-identical to the batch
  * operator and the list_reduce oracle, and an event-time timeout that
  * emits the final feature row once the watermark passes the user's
  * last event + `quietMs` — the "user went quiet, flush the feature"
  * semantics a training-feature stream wants.
  */
object StreamEwma {

  /** Per-user EWMA with α = `alpha`, folded in (ts, event_id) order.
    * The feed must be event-time-ordered across micro-batches (a
    * watermarked source guarantees no late data; the replay harness
    * feeds monotone chunks) — within a batch, events are sorted here.
    * Emits one [[UserEwma]] per user when the watermark passes their
    * last event + `quietMs`. Callers set the input watermark. */
  def ewmaPerUser(events: Dataset[UserEvent], alpha: Double = 0.5,
      quietMs: Long = 3600000L): Dataset[UserEwma] = {
    implicit val outEnc = Encoders.product[UserEwma]
    implicit val longEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[EwmaState]

    def fn(userId: Long, evs: Iterator[UserEvent],
        state: GroupState[EwmaState]): Iterator[UserEwma] = {
      var cur = state.getOption
      evs.toSeq.sortBy(e => (Sessionize.toMicros(e.ts), e.event_id)).foreach { e =>
        val t = Sessionize.toMicros(e.ts)
        cur = cur match {
          // seed with the first value, then fold — the exact batch
          // `aggregate(slice(recs, 2, ...), first.v, ...)` shape
          case None    => Some(EwmaState(1L, e.value, t))
          case Some(s) => Some(EwmaState(s.n + 1L,
            s.ewma * (1 - alpha) + e.value * alpha, math.max(s.lastUs, t)))
        }
      }
      if (state.hasTimedOut) {
        val out = cur.map(s => UserEwma(userId, s.n, s.ewma))
        state.remove()
        out.iterator
      } else {
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(
            math.floorDiv(s.lastUs + 999L, 1000L) + quietMs)
        }
        Iterator.empty
      }
    }

    events.groupByKey(_.user_id)(longEnc)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)(stateEnc, outEnc)
  }
}
