package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeFunctions.tsMicros

/** Event-stream analytics beyond windows/as-of: funnel completion and
  * exponentially-weighted features — the per-user sequential semantics
  * a behavioral feature pipeline derives before training. Timestamps
  * are compared as exact microsecond longs; doubles only appear in the
  * EWMA fold, which both engines evaluate in the same order
  * (sorted-list fold ↔ `list_reduce(list(... ORDER BY ...))`).
  */
object EventOps {

  /** N-step funnel per user over ARBITRARY step sequences: for each
    * step, the first event of that type strictly AFTER the previous
    * step's time. One narrow conditional aggregation per step joined
    * on the user key (each shuffles a handful of longs per user);
    * null marks an uncompleted step. Emits `<step>_us` per step. */
  def funnelOver(
      df: DataFrame, userCol: org.apache.spark.sql.Column,
      typeCol: org.apache.spark.sql.Column, tsCol: org.apache.spark.sql.Column,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct: $steps")
    val ev = df.select(userCol.as("user_id"), typeCol.as("__type"),
      tsMicros(tsCol).as("__us"))
    val init = ev.select(col("user_id")).distinct()
    steps.foldLeft((init, Option.empty[String])) { case ((acc, prev), step) =>
      val c = s"${step}_us"
      val cond = prev match {
        case None    => col("__type") === step
        case Some(p) => col("__type") === step && col("__us") > col(p)
      }
      val carried = acc.columns.filter(_ != "user_id")
        .map(n => min(col(n)).as(n)) // constant per user, carried through
      val agg = ev.join(acc, "user_id")
        .groupBy(col("user_id"))
        .agg(min(when(cond, col("__us"))).as(c), carried.toSeq: _*)
      (agg, Some(c))
    }._1
  }

  /** q69: the signup → click → purchase fixture funnel; -1 marks an
    * uncompleted step, `steps` counts the completed prefix. */
  def funnel(t: Tables): DataFrame = {
    import t.spark.implicits._
    val stepNames = Seq("signup", "click", "purchase")
    val f = funnelOver(t.events, $"user_id", $"event_type", $"ts", stepNames)
    f.select(
      (col("user_id") +:
        stepNames.map(s => coalesce(col(s"${s}_us"), lit(-1L)).as(s"${s}_us"))) :+
        stepNames.map(s => when(col(s"${s}_us").isNotNull, 1).otherwise(0))
          .reduce(_ + _).as("steps"): _*)
      .orderBy($"user_id")
  }

  /** Batch interval-containment join: each window row [start_us,
    * end_us) collects the points with the same key falling inside it.
    *
    * The Spark-first scale path for a non-equi join: a naive
    * `w.join(p, range-cond)` has no equi key beyond `key` and degrades
    * to a per-key cross product (and with a hot key, to a straggler
    * task). Instead both sides are mapped onto fixed-width time
    * buckets — windows EXPLODE to every bucket they overlap (≤
    * ceil(len/width)+1 rows, small when width ≈ window length), points
    * to exactly one — and the join becomes an equi-join on
    * (key, bucket) followed by the exact range filter. Each (window,
    * point) pair meets in EXACTLY ONE bucket (the point's), so no
    * dedup pass is needed; shuffle volume is linear in rows, and AQE
    * can split a residual hot (key, bucket). */
  def intervalJoinOver(
      windows: DataFrame, winIdCol: Column, winKeyCol: Column,
      startUsCol: Column, endUsCol: Column,
      points: DataFrame, ptIdCol: Column, ptKeyCol: Column, ptUsCol: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    // exact floor division in PURE integer arithmetic: subtracting the
    // (always non-negative) pmod makes the dividend an exact multiple,
    // then integral `div` keeps the whole computation in long — a
    // double quotient would be exact only below 2^53 and could misbin
    // nanosecond-scale epochs. Floor (not truncate) semantics hold for
    // negative (pre-epoch) values too, since the dividend is already
    // rounded down to a multiple.
    def fdiv(sqlExpr: String): Column =
      expr(s"(($sqlExpr) - pmod($sqlExpr, ${bucketUs}L)) div ${bucketUs}L")
    val w = windows
      .select(winIdCol.as("win_id"), winKeyCol.as("key"),
        startUsCol.as("start_us"), endUsCol.as("end_us"))
      .filter(col("end_us") > col("start_us")) // empty interval ⇒ no bucket list
      .withColumn("bucket", explode(sequence(
        fdiv("start_us"), fdiv("end_us - 1"))))
    val p = points.select(ptIdCol.as("pt_id"), ptKeyCol.as("key"), ptUsCol.as("pt_us"))
      .withColumn("bucket", fdiv("pt_us"))
    w.join(p, Seq("key", "bucket"))
      .filter(col("pt_us") >= col("start_us") && col("pt_us") < col("end_us"))
      .select(col("win_id"), col("pt_id"), col("key"),
        (col("pt_us") - col("start_us")).as("delta_us"))
  }

  /** q78: the 30 minutes after each purchase — which same-user events
    * land inside (the purchase itself excluded)? Bucket width = the
    * window length, so every window explodes to exactly 1–2 rows. */
  def purchaseWindowEvents(t: Tables, horizonSeconds: Long = 1800L): DataFrame = {
    import t.spark.implicits._
    val us = horizonSeconds * 1000000L
    val wins = t.events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", tsMicros($"ts").as("start_us"))
      .withColumn("end_us", $"start_us" + us)
    val pts = t.events.select($"event_id", $"user_id", tsMicros($"ts").as("pt_us"))
    intervalJoinOver(
      wins, $"event_id", $"user_id", $"start_us", $"end_us",
      pts, $"event_id", $"user_id", $"pt_us", bucketUs = us)
      .filter($"win_id" =!= $"pt_id")
      .select($"win_id", $"pt_id", $"key".as("user_id"), $"delta_us")
      .orderBy($"win_id", $"pt_id")
  }

  // ── q129: interval-OVERLAP join (two interval sets) ─────────────────
  /** The general form q78's point-in-window join specializes: pairs of
    * intervals (same key) whose ranges intersect, with the exact
    * overlap length. Same bucketed de-quadratication — both sides
    * explode to their covered fixed-width buckets, the join is an
    * equi-join on (key, bucket) plus the exact overlap predicate —
    * but a pair of OVERLAPPING intervals shares every bucket of its
    * intersection, so the pair is kept only in the bucket containing
    * max(start_l, start_r): exactly one bucket per pair by
    * construction, no dedup pass, shuffle stays linear in
    * rows × buckets-per-interval. */
  def overlapJoinOver(
      left: DataFrame, lIdCol: Column, lKeyCol: Column,
      lStartUsCol: Column, lEndUsCol: Column,
      right: DataFrame, rIdCol: Column, rKeyCol: Column,
      rStartUsCol: Column, rEndUsCol: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    def fdiv(sqlExpr: String): Column =
      expr(s"(($sqlExpr) - pmod($sqlExpr, ${bucketUs}L)) div ${bucketUs}L")
    val l = left
      .select(lIdCol.as("l_id"), lKeyCol.as("key"),
        lStartUsCol.as("l_start"), lEndUsCol.as("l_end"))
      .filter(col("l_end") > col("l_start"))
      .withColumn("bucket", explode(sequence(fdiv("l_start"), fdiv("l_end - 1"))))
    val r = right
      .select(rIdCol.as("r_id"), rKeyCol.as("key"),
        rStartUsCol.as("r_start"), rEndUsCol.as("r_end"))
      .filter(col("r_end") > col("r_start"))
      .withColumn("bucket", explode(sequence(fdiv("r_start"), fdiv("r_end - 1"))))
    l.join(r, Seq("key", "bucket"))
      .filter(col("l_start") < col("r_end") && col("r_start") < col("l_end"))
      .filter(col("bucket") === fdiv("greatest(l_start, r_start)"))
      .select(col("l_id"), col("r_id"), col("key"),
        (least(col("l_end"), col("r_end")) -
          greatest(col("l_start"), col("r_start"))).as("overlap_us"))
  }

  /** q129: purchase influence windows (30 min) overlapped with click
    * attention windows (10 min) per user — which purchases and clicks
    * compete for the same attention span, and for how long. */
  def purchaseClickOverlaps(t: Tables): DataFrame = {
    import t.spark.implicits._
    val us30 = 1800L * 1000000L
    val us10 = 600L * 1000000L
    val p = t.events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", tsMicros($"ts").as("s"))
      .withColumn("e", $"s" + us30)
    val c = t.events.filter($"event_type" === "click")
      .select($"event_id", $"user_id", tsMicros($"ts").as("s"))
      .withColumn("e", $"s" + us10)
    overlapJoinOver(p, $"event_id", $"user_id", $"s", $"e",
        c, $"event_id", $"user_id", $"s", $"e", bucketUs = us30)
      .select($"l_id", $"r_id", $"key".as("user_id"), $"overlap_us")
      .orderBy($"l_id", $"r_id")
  }

  /** q96: LOCF resampling — regularize each user's irregular event
    * stream onto a fixed time grid, carrying the last observation
    * forward. Composes two existing pieces: a broadcast-span grid
    * (users × `sequence(...)` — the span is ONE row, so grid
    * construction adds no shuffle beyond the user-distinct) and the
    * as-of join's union+window technique (one shuffle of
    * |grid|+|events| on user_id, no range explosion). Grid points
    * before a user's first event surface the q40 sentinel convention
    * (-1 / epoch) instead of NULLs. */
  def locfResample(t: Tables, stepMinutes: Int = 360): DataFrame = {
    import t.spark.implicits._
    val ev = t.events.select($"user_id", $"ts", $"value")
    val span = ev.agg(date_trunc("hour", min($"ts")).as("mn"), max($"ts").as("mx"))
    val grid = ev.select($"user_id").distinct()
      .crossJoin(broadcast(span))
      .select($"user_id", explode(sequence($"mn", $"mx",
        expr(s"interval $stepMinutes minutes"))).as("grid_ts"))
    AsOfJoin.joinPrior(
      grid.withColumn("g", $"grid_ts"), ev,
      "user_id", "grid_ts", "ts", "g", "value")
      .select($"user_id", $"grid_ts",
        coalesce($"asof_val", lit(-1.0)).as("last_value"),
        coalesce($"asof_ts", lit("1970-01-01 00:00:00").cast("timestamp")).as("last_ts"))
      .orderBy($"user_id", $"grid_ts")
  }

  /** Linear-interpolation resampling — the other half of q96's grid
    * regularization: where LOCF carries the last value flat,
    * telemetry/feature pipelines usually want the value INTERPOLATED
    * between the bracketing observations,
    *
    *   v(t) = v0 + (v1 − v0) · (t − t0)/(t1 − t0)
    *
    * with v at an exact observation equal to that observation, and
    * NULL outside the observed span (strict interpolation, no
    * extrapolation — silently extending the series is how bad
    * features get made).
    *
    * Plan: observations are first canonicalized to one value per
    * (user, µs) (min-event-id wins — a deterministic tie-break, not
    * an average, so the bracket values are real observations), then
    * grid and observation rows UNION into one frame and a single
    * (user | us, tag) window pass computes both brackets: prev =
    * last non-null observation in the unbounded-preceding frame,
    * next = first in the unbounded-following frame. One exchange +
    * one in-partition sort total for both directions — the same
    * union+window recipe as the as-of join, never a range join. The
    * interpolation itself is integer µs differences and a fixed
    * left-to-right IEEE chain (one division, one multiply, one add),
    * so any engine replaying the same brackets hashes identically.
    *
    * A grid point coinciding with an observation takes the frac = 0
    * leg when a later observation exists and the explicit t0 = t leg
    * when it is the LAST observation (the following frame is empty
    * there — the coincident observation sorts BEFORE its grid row). */
  def interpolateResampleOver(obs: DataFrame, keyCol: Column, usCol: Column,
      valCol: Column, tieCol: Column, grid: DataFrame): DataFrame = {
    // NULL-valued observations are dropped up front (the robustOutliers
    // convention): keeping them would desynchronize the brackets — t0
    // from last(obsUs) would include the row that last(obsV,
    // ignoreNulls) skips, so t0/v0 would come from DIFFERENT rows
    val o = obs.filter(valCol.isNotNull)
      .groupBy(keyCol.as("key"), usCol.as("us"))
      .agg(min_by(valCol, tieCol).as("v"))
      .select(col("key"), col("us"), lit(0).as("tag"), col("v"))
    val g = grid.select(col("key"), col("us"), lit(1).as("tag"),
      lit(null).cast(o.schema("v").dataType).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("us"), col("tag"))
    val obsUs = when(col("tag") === 0, col("us"))
    val obsV = when(col("tag") === 0, col("v"))
    val prevF = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nextF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    o.unionByName(g)
      // one select so CollapseWindow folds same-frame brackets into
      // TWO Window passes over the single exchange+sort (4 chained
      // withColumns planned as 4 passes)
      .select(col("key"), col("us"), col("tag"),
        last(obsUs, ignoreNulls = true).over(prevF).as("t0"),
        last(obsV, ignoreNulls = true).over(prevF).as("v0"),
        first(obsUs, ignoreNulls = true).over(nextF).as("t1"),
        first(obsV, ignoreNulls = true).over(nextF).as("v1"))
      .filter(col("tag") === 1)
      .select(col("key"), col("us"),
        when(col("t0") === col("us"), col("v0"))
          .when(col("t0").isNotNull && col("t1").isNotNull,
            col("v0") + (col("v1") - col("v0")) *
              ((col("us") - col("t0")).cast("double") /
                (col("t1") - col("t0")).cast("double")))
          .as("v_interp"))
  }

  /** q169 fixture instance: event values interpolated onto the q96
    * grid (global hour-truncated span, 6-hour step, per user). */
  def interpolateResample(t: Tables, stepMinutes: Int = 360): DataFrame = {
    import t.spark.implicits._
    val ev = t.events.select($"user_id", tsMicros($"ts").as("us"),
      $"value", $"event_id")
    val span = t.events.agg(
      tsMicros(date_trunc("hour", min($"ts"))).as("mn"), tsMicros(max($"ts")).as("mx"))
    val stepUs = stepMinutes.toLong * 60L * 1000000L
    val grid = ev.select($"user_id").distinct()
      .crossJoin(broadcast(span))
      .select($"user_id".as("key"),
        explode(sequence($"mn", $"mx", lit(stepUs))).as("us"))
    interpolateResampleOver(ev, $"user_id", $"us", $"value", $"event_id", grid)
      .select($"key".as("user_id"), timestamp_micros($"us").as("grid_ts"),
        $"v_interp")
      .orderBy($"user_id", $"grid_ts")
  }

  /** Time-weighted average (TWAP) — the telemetry/finance mean that
    * weights each observation by HOW LONG it held (a sensor emitting
    * one reading per quiet hour and sixty during a spike must not
    * average as if every reading counted equally):
    *
    *   twap = Σ vᵢ·(tᵢ₊₁ − tᵢ) / Σ (tᵢ₊₁ − tᵢ)
    *
    * over each key's time-ordered observations (LOCF segments; the
    * last observation holds nothing and contributes no segment).
    *
    * Exactness at scale: values ride integer-quantized (cents) and
    * durations as integer µs, so each product is an exact ≤ 2⁶³ long
    * and the two sums accumulate in DECIMAL(38,0) — order-independent
    * exact integers no matter the partitioning (Spark decimal ↔
    * DuckDB HUGEINT; the one final double division sees identical
    * operands). A double-product sum would be partition-order
    * dependent and hash-diverge. Plan: one lag/lead window (single
    * exchange on the key) + one map-side-combinable agg. Zero-length
    * segments (timestamp ties, ordered by the tie column) carry zero
    * weight — harmless and deterministic. */
  def twapOver(obs: DataFrame, keyCol: Column, usCol: Column,
      valueCentsCol: Column, tieCol: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__us"), col("__tie"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    obs
      .select(keyCol.as("__k"), usCol.as("__us"), valueCentsCol.as("__vc"),
        tieCol.as("__tie"))
      .withColumn("__dt", lead(col("__us"), 1).over(w) - col("__us"))
      .filter(col("__dt").isNotNull)
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("__dt").cast(dec)).as("__sdt"),
        // one operand cast to DECIMAL before the product: the long×long
        // form was exact only while cents×µs < 2⁶³ (~10¹⁸); the decimal
        // product removes that ceiling for free (same values below it)
        sum(col("__vc").cast(dec) * col("__dt")).as("__svdt"))
      .select(col("__k"), col("n_segments"),
        col("__sdt").cast("long").as("held_us"),
        when(col("__sdt") > 0,
          col("__svdt").cast("double") / col("__sdt").cast("double") / 100.0)
          .as("twap"))
  }

  /** q176: per-user TWAP of event values (cents-quantized) over the
    * full fixture span. */
  def userTwap(t: Tables): DataFrame = {
    import t.spark.implicits._
    twapOver(t.events, $"user_id", tsMicros($"ts"),
        floor($"value" * 100 + 0.5).cast("long"), $"event_id")
      .select($"__k".as("user_id"), $"n_segments", $"held_us", $"twap")
      .orderBy($"user_id")
  }

  /** q97: event-type transition matrix — the per-user first-order
    * Markov estimate: P(next | prev) = c(prev, next) / c(prev, ·)
    * over each user's time-ordered stream. One lag window per user
    * (unique (ts, event_id) order) + one narrow count shuffle; the
    * probability is one IEEE division of identical integer operands
    * per engine. */
  def transitionMatrix(t: Tables): DataFrame = {
    import t.spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = t.events
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy($"prev_type").agg(sum($"n").as("n_prev"))
    pairs.join(totals, "prev_type")
      .select($"prev_type", $"next_type", $"n",
        ($"n".cast("double") / $"n_prev").as("p"))
      .orderBy($"prev_type", $"next_type")
  }

  /** q98: equal-width histogram of event values — bin ids from one
    * floor division (identical IEEE op both engines), then a count
    * per bin. The zero-shuffle-per-row / one-narrow-agg shape of any
    * distribution profile at scale. */
  def valueHistogram(t: Tables, binWidth: Double = 25.0): DataFrame = {
    import t.spark.implicits._
    t.events
      .select((floor($"value" / binWidth)).cast("int").as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("bin_lo", $"bin" * binWidth)
      .orderBy($"bin")
  }

  /** q99: weekly cohort retention — users grouped by first-activity
    * week, counted per subsequent active week. Weeks are integer
    * day-offsets DIV 7 from a fixed epoch date (engine-neutral
    * integer arithmetic — date_trunc('week') would pull in
    * engine-specific week-start conventions). Two narrow shuffles:
    * per-user first week, then (cohort, week) distinct-user count. */
  def cohortRetention(t: Tables, epoch: String = "2024-01-01"): DataFrame = {
    import t.spark.implicits._
    val weeks = t.events.select($"user_id",
      expr(s"CAST(datediff(to_date(ts), DATE '$epoch') div 7 AS INT)").as("week"))
      .distinct()
    val cohorts = weeks.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    weeks.join(cohorts, "user_id")
      .groupBy($"cohort_week", $"week")
      .agg(countDistinct($"user_id").as("n_active"))
      .orderBy($"cohort_week", $"week")
  }

  /** q100: conversion latency — per user, the first signup and the
    * first purchase STRICTLY AFTER it, with the latency in whole
    * seconds (exact integer micros arithmetic). Built on the same
    * [[funnelOver]] primitive as q69 so "first subsequent" has ONE
    * definition: a user whose earliest-ever purchase predates their
    * signup still converts if they purchase again afterwards. */
  def conversionLatency(t: Tables): DataFrame = {
    import t.spark.implicits._
    funnelOver(t.events, $"user_id", $"event_type", $"ts", Seq("signup", "purchase"))
      .filter($"signup_us".isNotNull && $"purchase_us".isNotNull)
      .select($"user_id",
        timestamp_micros($"signup_us").as("signup_ts"),
        timestamp_micros($"purchase_us").as("purchase_ts"),
        expr("(purchase_us - signup_us) div 1000000").as("latency_s"))
      .orderBy($"user_id")
  }

  /** q70: exponentially-weighted moving average of `value` per user
    * (α = 0.5), folded in (ts, event_id) order. The sequential fold is
    * the oracle-parity formulation (sort_array(collect_list) ↔
    * `list(value ORDER BY ...)` + list_reduce — bit-identical
    * doubles); the unbounded-stream twin keeps EWMA as O(1)
    * flatMapGroupsWithState state instead
    * ([[graft.streaming.StreamEwma]], driver-checked as q119). */
  def ewmaPerUser(t: Tables, alpha: Double = 0.5): DataFrame = {
    import t.spark.implicits._
    val ordered = t.events
      .select($"user_id", struct(tsMicros($"ts").as("ts_us"), $"event_id",
        $"value".as("v")).as("rec"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list($"rec")).as("recs"))
    ordered.select($"user_id",
      size($"recs").as("n_events"),
      aggregate(
        slice($"recs", lit(2), size($"recs") - 1),
        element_at($"recs", 1).getField("v"),
        (acc, r) => acc * (1 - alpha) + r.getField("v") * alpha).as("ewma_value"))
      .orderBy($"user_id")
  }

  // ── q142: Kaplan–Meier survival over user lifetimes ─────────────────
  /** The survival-analysis member of the events family (churn/
    * retention modeling's standard estimator): per user, lifetime =
    * last − first event (exact micros); a user is an observed
    * "death" if their last event predates the global horizon by more
    * than span/5 (quiet users churned), otherwise right-censored
    * (still active at the edge of the window). Lifetimes bucket into
    * `buckets` fixed-width bins — pure integer arithmetic, so the
    * discretization is engine-exact and the K-M table is bounded by
    * the bucket count regardless of corpus size. Ŝ(b) =
    * Π_{j ≤ b} (1 − d_j/n_j) folds ascending over the ≤`buckets`-row
    * table (left product, init 1.0 ↔ DuckDB's init-free
    * `list_reduce` — 1.0·x = x exactly), the q79 recipe.
    *
    * Plan: the only corpus-sized work is the per-user (min, max) agg
    * — one narrow shuffle, map-side combined. Everything after runs
    * on ≤`buckets` rows riding one-row broadcasts. */
  def kaplanMeierOver(df: DataFrame, userCol: Column, tsCol: Column,
      buckets: Int = 64, censorDiv: Int = 5): DataFrame = {
    val perUser = df
      .groupBy(userCol.as("user_id"))
      .agg(min(tsMicros(tsCol)).as("first_us"), max(tsMicros(tsCol)).as("last_us"))
    val g = perUser.agg(max(col("last_us")).as("m_us"), min(col("first_us")).as("lo_us"))
    val u = perUser.crossJoin(broadcast(g))
      .select(col("user_id"),
        (col("last_us") - col("first_us")).as("life_us"),
        (col("m_us") - col("lo_us")).as("span"),
        (col("last_us") <= col("m_us") - expr("(m_us - lo_us) div " + censorDiv))
          .as("death"))
      .withColumn("bucket", expr(s"(life_us * $buckets) div (span + 1)").cast("int"))
    val bk = u.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("death"), 1L).otherwise(0L)).as("n_deaths"))
    // at-risk = users whose bucket ≥ b: total − cumsum of earlier
    // buckets; windows/folds below run on ≤ `buckets` rows
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val withRisk = bk
      .crossJoin(broadcast(u.agg(count(lit(1)).as("n_total"))))
      .withColumn("n_at_risk",
        col("n_total") - coalesce(sum(col("n_users")).over(w), lit(0L)))
    val arr = withRisk
      .agg(sort_array(collect_list(
        struct(col("bucket"), col("n_deaths"), col("n_at_risk")))).as("km"))
    withRisk.crossJoin(broadcast(arr))
      .select(col("bucket"), col("n_users"), col("n_deaths"), col("n_at_risk"),
        aggregate(
          filter(col("km"), x => x.getField("bucket") <= col("bucket")),
          lit(1.0),
          (acc, x) => acc * (lit(1.0) -
            x.getField("n_deaths").cast("double") /
              x.getField("n_at_risk").cast("double"))).as("s_hat"))
  }

  def kaplanMeier(t: Tables): DataFrame = {
    import t.spark.implicits._
    kaplanMeierOver(t.events, $"user_id", $"ts").orderBy($"bucket")
  }

  // ── q146: rolling z-score anomaly detection ─────────────────────────
  /** Classic streaming-metrics outlier flag, made ENGINE-EXACT: per
    * user (ordered by ts, then event_id for sub-µs ties), each event
    * is scored against the mean/std of its `lookback` PRECEDING
    * events (the event itself excluded — no self-masking). All frame
    * moments are exact integers over 10⁻⁶-quantized values
    * (`floor(v·10⁶ + 0.5)` — identical IEEE ops both engines), and
    * the anomaly predicate clears denominators:
    *   |v − μ| > z·σ  ⇔  (W·q − Σq)² > z²·(W·Σq² − (Σq)²)
    * — DECIMAL(38,0) on both sides so no overflow at any value scale
    * and the flag is bit-free of float rounding. The reported z
    * itself is one double expression over those exact integers
    * (NULL when the window is constant — σ = 0 — where the flag
    * alone decides). A zero-variance window flags ANY deviation, by
    * the same inequality.
    *
    * Plan: one window over (user, time) — a single hash-partitioned
    * sort, no joins, nothing corpus-sized on the driver; at 100×
    * the partition key is the user and frames never exceed
    * `lookback`. */
  def rollingAnomaliesOver(
      df: DataFrame, userCol: Column, tsCol: Column, idCol: Column,
      valueCol: Column, lookback: Int = 5, zThresh: Int = 3): DataFrame = {
    require(lookback >= 2 && zThresh >= 1,
      s"bad params: lookback=$lookback z=$zThresh")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
      .rowsBetween(-lookback, -1)
    val dec = "decimal(38,0)"
    val base = df.select(userCol.as("user_id"), idCol.as("event_id"),
        tsMicros(tsCol).as("__us"), valueCol.as("value"))
      .withColumn("q",
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("cnt", count(col("q")).over(w))
      .withColumn("sq", sum(col("q").cast(dec)).over(w))
      .withColumn("sqq", sum(col("q").cast(dec) * col("q")).over(w))
    val num = lit(lookback) * col("q") - col("sq")
    val den = lit(lookback) * col("sqq") - col("sq") * col("sq")
    base
      .filter(col("cnt") === lookback &&
        num.cast(dec) * num > lit(zThresh * zThresh) * den)
      .select(col("event_id"), col("user_id"), col("value"),
        when(den > 0,
          num.cast("double") / sqrt(den.cast("double"))).as("z"))
  }

  def rollingAnomalies(t: Tables): DataFrame = {
    import t.spark.implicits._
    rollingAnomaliesOver(t.events, $"user_id", $"ts", $"event_id", $"value")
      .orderBy($"event_id")
  }

  // ── q148: multi-touch attribution ────────────────────────────────────
  /** Linear multi-touch attribution, the standard marketing-analytics
    * credit split: every click/view in the `horizonSeconds` before a
    * purchase (strictly before — the purchase instant itself doesn't
    * self-attribute) is a touch, and the purchase's unit of credit
    * splits evenly across its touches; per (purchase, channel) the
    * credit is n_channel/n_touches — one double division over exact
    * integer counts, so rows are engine-exact. Purchases with no
    * touches in the horizon are unattributed and not emitted.
    *
    * Plan: the touch set comes from [[intervalJoinOver]]'s bucketed
    * equi-join (linear shuffle, no per-user cross product), channel
    * names ride a narrow event_id join, and the per-purchase total is
    * a window over the (purchase, channel) aggregate — partition size
    * = a purchase's channel count (≤ the channel-type cardinality,
    * never corpus-scale). */
  def attributionOver(
      events: DataFrame, idCol: Column, userCol: Column, tsCol: Column,
      typeCol: Column, purchaseType: String, touchTypes: Seq[String],
      horizonSeconds: Long = 1800L): DataFrame = {
    require(touchTypes.nonEmpty && horizonSeconds > 0, "bad attribution params")
    val us = horizonSeconds * 1000000L
    val ev = events.select(idCol.as("event_id"), userCol.as("user_id"),
      tsMicros(tsCol).as("__us"), typeCol.as("event_type"))
    val wins = ev.filter(col("event_type") === purchaseType)
      .select(col("event_id"), col("user_id"),
        (col("__us") - us).as("start_us"), col("__us").as("end_us"))
    val pts = ev.filter(col("event_type").isin(touchTypes: _*))
      .select(col("event_id"), col("user_id"), col("__us").as("pt_us"),
        col("event_type").as("channel"))
    val touched = intervalJoinOver(
        wins, col("event_id"), col("user_id"), col("start_us"), col("end_us"),
        pts.select(col("event_id"), col("user_id"), col("pt_us")),
        col("event_id"), col("user_id"), col("pt_us"), bucketUs = us)
      .join(pts.select(col("event_id").as("pt_id"), col("channel")), "pt_id")
    val perChannel = touched
      .groupBy(col("win_id").as("purchase_id"), col("channel"))
      .agg(count(lit(1)).as("n_ch"))
    val wp = Window.partitionBy(col("purchase_id"))
    perChannel
      .withColumn("n_touches", sum(col("n_ch")).over(wp))
      .select(col("purchase_id"), col("channel"), col("n_ch"), col("n_touches"),
        (col("n_ch").cast("double") / col("n_touches")).as("credit"))
  }

  def purchaseAttribution(t: Tables): DataFrame = {
    import t.spark.implicits._
    attributionOver(t.events, $"event_id", $"user_id", $"ts", $"event_type",
      purchaseType = "purchase", touchTypes = Seq("click", "view"))
      .orderBy($"purchase_id", $"channel")
  }

  // ── q152: behavioral path mining (event-type trigrams) ──────────────
  /** The "most common 3-step user paths" product-analytics query: per
    * user, consecutive event-type triples in (ts, event_id) order,
    * counted globally, with each trigram's share of all trigrams.
    * Exact: integer counts; share is one double division (n/total).
    *
    * Plan: one window shuffle by user (the lag pair), one narrow
    * map-side-combined agg to ≤ |types|³ rows; the share rides a
    * single-partition window over that tiny aggregated frame — never
    * corpus-scale. */
  def pathTrigramsOver(df: DataFrame, userCol: Column, tsCol: Column,
      idCol: Column, typeCol: Column): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
    val tri = df.select(userCol.as("user_id"), idCol.as("event_id"),
        tsMicros(tsCol).as("__us"), typeCol.as("t2"))
      .withColumn("t1", lag(col("t2"), 1).over(w))
      .withColumn("t0", lag(col("t2"), 2).over(w))
      .filter(col("t0").isNotNull)
      .groupBy(col("t0"), col("t1"), col("t2"))
      .agg(count(lit(1)).as("n"))
    val all = Window.partitionBy()
    tri.select(col("t0"), col("t1"), col("t2"), col("n"),
      (col("n").cast("double") / sum(col("n")).over(all)).as("share"))
  }

  def pathTrigrams(t: Tables): DataFrame = {
    import t.spark.implicits._
    pathTrigramsOver(t.events, $"user_id", $"ts", $"event_id", $"event_type")
      .orderBy($"t0", $"t1", $"t2")
  }
}
