package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time processing over `events`-shaped streams (event_id, ts,
  * user_id, event_type, value, props) — tumbling/sliding windows with
  * watermarking, and sessionization via stateful processing.
  *
  * Scale: windowed aggregation shuffles on (window, event_type) with
  * partial aggregation before the shuffle; the watermark bounds state
  * size regardless of stream length — the property that matters at
  * 100 TB/day ingest.
  */
object EventStream {

  /** Tumbling event-time windows with a watermark for late data.
    * Works over both streaming and batch frames (same plan). */
  def tumblingCounts(
      events: DataFrame,
      window_ : String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding windows (window/slide), e.g. a 10-minute window advancing
    * every 5 minutes. */
  def slidingValue(
      events: DataFrame,
      window_ : String = "10 minutes",
      slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("total_value"))

  /** Stream-stream interval join: each error pairs with the same
    * user's clicks from the preceding `horizon`. Both sides carry a
    * watermark and the join condition bounds event-time distance, so
    * Spark can expire buffered rows — state stays proportional to the
    * horizon, not the stream length (the stream-stream analogue of
    * the batch as-of join in operators/AsOfJoin). */
  def errorsWithRecentClicks(
      errors: DataFrame, clicks: DataFrame,
      horizon: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val e = errors
      .select(col("ts").as("err_ts"), col("user_id"),
        col("event_id").as("error_id"))
      .withWatermark("err_ts", horizon)
    val c = clicks
      .select(col("ts").as("click_ts"), col("user_id").as("click_user"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", horizon)
    // joinType "left_outer": an error with no click in its horizon
    // emits with a NULL click side — but only once the watermark
    // passes the point where no future click can match, the
    // state-timeout semantics that distinguish a streaming outer join
    // from a batch one (inner matches emit eagerly either way)
    e.join(c, expr(
      s"""user_id = click_user AND
         |click_ts >= err_ts - INTERVAL $horizon AND
         |click_ts <= err_ts""".stripMargin), joinType)
      .select(col("error_id"), col("user_id"), col("click_id"),
        col("err_ts"), col("click_ts"))
  }
}

/** Typed event row for stateful processing. */
case class UserEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** A closed user session (gap-based sessionization output). */
case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

/** Per-user open-session state (must be public for encoder codegen).
  * `start`/`last` are epoch MICROS: java.sql.Timestamp.getTime is
  * millis, and a session operator that truncates to millis disagrees
  * with a micros-exact batch oracle on boundary gaps and on
  * session_start/end values. */
case class SessState(start: Long, last: Long, n: Int, total: Double)

/** An emitted as-of match: the error and the latest same-user click
  * at-or-before it (click_id −1 / epoch click_ts when none exists —
  * q40's left-join convention). */
case class AsOfRow(user_id: Long, error_id: Long, click_id: Long,
    click_ts: java.sql.Timestamp)

/** One buffered event (epoch micros + id) in as-of state. */
case class AsOfEvt(ts: Long, id: Long)

/** Per-user as-of state: candidate clicks + errors awaiting
  * watermark finalization (public for encoder codegen). */
case class AsOfBuf(clicks: Seq[AsOfEvt], errors: Seq[AsOfEvt])

/** Streaming as-of join — the unbounded-stream twin of the batch
  * union+window as-of in operators/AsOfJoin (q40), built on custom
  * state because Spark's stream-stream joins can express "clicks
  * within a horizon" (q117) but not "the LATEST prior click,
  * horizon-free": argmax-per-left-row is not a join predicate.
  *
  * Per user, clicks and errors buffer in [[AsOfBuf]]; an error
  * finalizes — emits its latest at-or-before click, exactly once —
  * when the watermark passes its event time, because only then can no
  * earlier-or-equal click still arrive. Ties at equal click ts break
  * to the highest click id (deterministic; the fixture has no such
  * ties, so batch q40 agrees). State is bounded by the watermark
  * horizon: finalized errors leave, and of the clicks at-or-below the
  * watermark only the LATEST survives pruning (it dominates — every
  * future error's event time is ≥ the watermark, so older clicks can
  * never again be the argmax). An event-time timeout re-invokes the
  * group when the watermark passes its earliest pending error, so
  * finalization doesn't wait for the user's next event.
  *
  * Scale: one shuffle of both sides on user_id into the state
  * operator; per-key state is O(pending errors + 1 carry click +
  * in-horizon clicks) regardless of stream length — the same
  * watermark-bounds-state property as q117/q118. KEY-SPACE bound:
  * a user whose pending errors all drain still holds one carry
  * click, so without eviction the number of live keys grows with
  * the all-time user count. `idleEvictUs` bounds it (the
  * StreamAnomaly quietMs posture): clicks-only state is dropped
  * once the watermark passes carry-click ts + idleEvictUs, so an
  * error arriving later than that after the user's last click
  * matches NULL (−1) instead of the evicted click — a documented
  * retention horizon, the same class of contract as late-data
  * drop. Default 30 days; replay harnesses sit far inside it, so
  * q132's oracle equivalence is unchanged. */
object StreamAsOf {
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
  import org.apache.spark.sql.{Dataset, Encoders}
  import Sessionize.{toMicros, fromMicros}

  /** Default carry-click retention: 30 days in micros. */
  val DefaultIdleEvictUs: Long = 30L * 24 * 3600 * 1000000L

  def asOfMatches(events: Dataset[UserEvent],
      idleEvictUs: Long = DefaultIdleEvictUs): Dataset[AsOfRow] = {
    require(idleEvictUs > 0, s"idleEvictUs must be > 0: $idleEvictUs")
    implicit val rowEnc = Encoders.product[AsOfRow]
    implicit val longEnc = Encoders.scalaLong
    implicit val bufEnc = Encoders.product[AsOfBuf]

    def fn(userId: Long, evs: Iterator[UserEvent],
        state: GroupState[AsOfBuf]): Iterator[AsOfRow] = {
      val prev = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
      val incoming = evs.toVector
      def merge(kept: Seq[AsOfEvt], kind: String) =
        (kept ++ incoming.filter(_.event_type == kind)
          .map(e => AsOfEvt(toMicros(e.ts), e.event_id)))
          .sortBy(c => (c.ts, c.id)).toVector
      val clicks = merge(prev.clicks, "click")
      val errors = merge(prev.errors, "error")
      // micros form of the engine's millis watermark: truncation only
      // lowers it, so finalization stays conservative (never early)
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (done, pending) = errors.partition(_.ts < wmUs)
      val out = done.map { e =>
        clicks.filter(_.ts <= e.ts).lastOption match {
          case Some(c) => AsOfRow(userId, e.id, c.id, fromMicros(c.ts))
          case None    => AsOfRow(userId, e.id, -1L, new java.sql.Timestamp(0L))
        }
      }
      val i = clicks.lastIndexWhere(_.ts < wmUs)
      val keptClicks = if (i < 0) clicks else clicks.drop(i)
      // clicks-only idle eviction: the carry click is only retained
      // for errors arriving within idleEvictUs of it; past that the
      // key is dropped entirely (bounded key-space, see object doc)
      val evictAtUs =
        if (keptClicks.isEmpty) Long.MaxValue
        else if (keptClicks.last.ts > Long.MaxValue - idleEvictUs) Long.MaxValue
        else keptClicks.last.ts + idleEvictUs
      val clicksOnlyExpired = pending.isEmpty && wmUs >= evictAtUs
      if ((pending.isEmpty && keptClicks.isEmpty) || clicksOnlyExpired) {
        if (state.exists) state.remove()
      } else {
        state.update(AsOfBuf(keptClicks, pending))
        // pending.head.ts ≥ wmUs, so ceil-to-millis + 1 is strictly
        // beyond the current watermark (the API's requirement) and
        // fires as soon as the watermark passes the earliest pending
        // error; with no pending errors the timeout is the idle
        // eviction point instead (also > watermark by the branch above)
        val fireUs = if (pending.nonEmpty) pending.head.ts else evictAtUs
        if (fireUs != Long.MaxValue)
          state.setTimeoutTimestamp(
            math.floorDiv(fireUs + 999L, 1000L) + 1L)
      }
      out.iterator
    }

    events.groupByKey(_.user_id)(longEnc)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)(bufEnc, rowEnc)
  }
}

object Sessionize {
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
  import org.apache.spark.sql.{Dataset, Encoders}

  /** Timestamp → epoch micros without millis truncation
    * (getTime = seconds·1000 + nanos/10⁶, so floorDiv recovers the
    * seconds; getNanos carries the full sub-second). */
  def toMicros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Epoch micros → Timestamp, micros preserved in the nanos field. */
  def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization via flatMapGroupsWithState: a session
    * closes when no event arrives for `gapMs` (event time). State per
    * user is O(1); the watermark set by the caller bounds how long
    * state lives — the stateful-processing pattern that scales to
    * unbounded streams (SURVEY.md §2.4 streaming mapping).
    */
  def sessions(events: Dataset[UserEvent], gapMs: Long): Dataset[UserSession] = {
    implicit val sessEnc = Encoders.product[UserSession]
    implicit val longEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[SessState]

    val gapUs = gapMs * 1000L
    def fn(userId: Long, evs: Iterator[UserEvent],
        state: GroupState[SessState]): Iterator[UserSession] = {
      var closed = List.empty[UserSession]
      var cur = state.getOption
      // (micros, event_id) order: same-timestamp events fold in a
      // deterministic order, so the double accumulation in `total` is
      // bit-reproducible across engines and replays; micros (not
      // getTime's millis) so boundary gaps agree with a micros-exact
      // batch oracle
      evs.toSeq.sortBy(e => (toMicros(e.ts), e.event_id)).foreach { e =>
        val t = toMicros(e.ts)
        cur match {
          case Some(s) if t - s.last <= gapUs =>
            cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
              total = s.total + e.value))
          case Some(s) =>
            closed ::= UserSession(userId, fromMicros(s.start),
              fromMicros(s.last), s.n, s.total)
            cur = Some(SessState(t, t, 1, e.value))
          case None =>
            cur = Some(SessState(t, t, 1, e.value))
        }
      }
      if (state.hasTimedOut) {
        cur.foreach { s =>
          closed ::= UserSession(userId, fromMicros(s.start),
            fromMicros(s.last), s.n, s.total)
        }
        state.remove()
      } else {
        cur.foreach { s =>
          state.update(s)
          // timeout API is millis; round UP so the event-time timeout
          // never fires a micro-fraction before the gap has elapsed
          state.setTimeoutTimestamp(
            math.floorDiv(s.last + gapUs + 999L, 1000L))
        }
      }
      closed.reverseIterator
    }

    events.groupByKey(_.user_id)(longEnc)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)(stateEnc, sessEnc)
  }
}
