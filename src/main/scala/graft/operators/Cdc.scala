package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeFunctions.tsMicros

/** Change-data-capture application — the mutation primitive every
  * other operator family here lacks: a warehouse doesn't only READ
  * snapshots, it assembles them from upstream change feeds (the
  * reference's own serving table is a point-in-time snapshot of the
  * play-by-play feed, `/root/reference/assets/app_nfl.py:42-65`;
  * this family is how such snapshots are maintained from a log).
  *
  * Canonical change-log shape, shared by both operators: one row per
  * change with columns `key` (entity), `us`/`seq` (total event order:
  * exact epoch micros, unique sequence tie-break), `op` ('U' upsert /
  * 'D' delete), plus any payload columns. Both operators are pure
  * log algebra — no payload arithmetic — so results are hash-exact
  * against any engine that orders (us, seq) the same way.
  */
object Cdc {

  private val MetaCols = Seq("key", "us", "seq", "op")

  /** Latest-wins CDC apply: fold a change log onto an optional base
    * snapshot, producing the new snapshot. The latest change per key
    * (max (us, seq)) wins; a latest-'D' key is absent from the
    * snapshot; keys untouched by the log keep their base row.
    *
    * Snapshots carry (key, us, seq, payload...) — the change metadata
    * of the row that produced them — which makes apply ASSOCIATIVE:
    * `apply(apply(∅, early), late) = apply(∅, early ∪ late)` for any
    * split of the log (ties across batches resolve identically
    * because (us, seq) rides along). q158 verifies exactly that
    * algebra against a full-log oracle.
    *
    * Scale: the per-key latest is ONE map-side-combinable `min_by`
    * agg over a struct ordering key — no window, no per-key sort, and
    * a hot key combines within each map task, so a skewed entity
    * never serializes (contrast a row_number window, which sorts the
    * hot key's rows in one partition). The base join is a plain
    * keyed full-outer (broadcastable when the delta's key set is
    * small — AQE decides from the agg's output stats). */
  def mergeApply(base: Option[DataFrame], changes: DataFrame): DataFrame = {
    val payload = changes.columns.filterNot(MetaCols.contains).toSeq
    require(changes.columns.take(4).sameElements(MetaCols),
      s"changes must lead with (key, us, seq, op): ${changes.columns.toSeq}")
    // min_by on (−us, −seq): latest change, collision-free for any
    // long domain (the q145/q157 struct-key recipe)
    val ordKey = struct((-col("us")).as("nu"), (-col("seq")).as("ns"))
    val latest = changes.groupBy(col("key")).agg(
      min_by(struct(col("us") +: col("seq") +: col("op") +:
        payload.map(col): _*), ordKey).as("__c"))
    base match {
      case None =>
        latest.filter(col("__c.op") === "U")
          .select(col("key") +: col("__c.us").as("us") +:
            col("__c.seq").as("seq") +:
            payload.map(p => col(s"__c.$p").as(p)): _*)
      case Some(b) =>
        require(b.columns.take(3).sameElements(Seq("key", "us", "seq")),
          s"base must lead with (key, us, seq): ${b.columns.toSeq}")
        val joined = b.as("b").join(latest.as("d"), Seq("key"), "full_outer")
        val useDelta = col("__c").isNotNull
        joined
          .filter(!useDelta || col("__c.op") === "U")
          .select(col("key") +:
            when(useDelta, col("__c.us")).otherwise(col("b.us")).as("us") +:
            when(useDelta, col("__c.seq")).otherwise(col("b.seq")).as("seq") +:
            payload.map(p =>
              when(useDelta, col(s"__c.$p")).otherwise(col(s"b.$p")).as(p)): _*)
    }
  }

  /** SCD2 snapshot assembly: turn the change log into slowly-changing
    * dimension type-2 rows `(key, payload..., valid_from_us,
    * valid_to_us, is_current)` — one version row per contiguous run
    * of identical live state, the standard warehouse history table.
    *
    * True SCD2 opens a version only when tracked state CHANGES, so a
    * suppression pass precedes interval assignment: an upsert equal
    * to the immediately preceding change's payload is a no-op, as is
    * a delete with no live state (previous change also 'D', or no
    * previous change). The immediate-predecessor comparison is exact
    * because a suppressed upsert's payload EQUALS the effective state
    * by definition — induction carries the equality through any run.
    * Retained rows then take `valid_to = lead(us)` (the next retained
    * change closes the version); deletes emit no row of their own,
    * they only close their predecessor. `is_current` marks open
    * intervals (valid_to NULL).
    *
    * Plan: two window passes over the SAME (key | us, seq) spec —
    * one exchange + one in-partition sort total, the filter between
    * them is pipelined; nothing else touches corpus-scale data. */
  def scd2Over(changes: DataFrame): DataFrame = {
    val payload = changes.columns.filterNot(MetaCols.contains).toSeq
    require(changes.columns.take(4).sameElements(MetaCols),
      s"changes must lead with (key, us, seq, op): ${changes.columns.toSeq}")
    val w = Window.partitionBy(col("key")).orderBy(col("us"), col("seq"))
    val samePayload = payload
      .map(p => col(p) <=> lag(col(p), 1).over(w))
      .reduce(_ && _)
    val pop = lag(col("op"), 1).over(w)
    val retained = changes
      .withColumn("__keep",
        when(col("op") === "D", pop === "U")
          .otherwise(pop.isNull || pop === "D" || !samePayload))
      .filter(col("__keep"))
    retained
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .filter(col("op") === "U")
      .select(col("key") +: payload.map(col) :+
        col("us").as("valid_from_us") :+ col("valid_to_us") :+
        col("valid_to_us").isNull.as("is_current"): _*)
  }

  /** Incremental SCD2 maintenance (q193) — the dimension MERGE a
    * warehouse actually runs: the history table is not rebuilt from
    * the full log on every load, it absorbs the day's change slice.
    * `dim` is the [[scd2Over]] output for some log prefix; `late` is
    * a change slice wholly AFTER the prefix in (us, seq) order per key
    * — the shape any (us, seq)-ordered log split satisfies (a time cut
    * being the common case); stated loudly here rather than scanned
    * for.
    *
    * Algebra: versions of keys the slice never touches pass through
    * untouched, as do CLOSED versions of touched keys (history is
    * immutable — that's the point of SCD2). Only each touched key's
    * OPEN version participates: it re-enters [[scd2Over]] as a
    * synthetic leading upsert (its payload IS the key's live state,
    * so the suppression induction carries across the boundary — a
    * late upsert equal to it is a no-op, exactly as in the full-log
    * run), alongside the late changes. The synthetic seq is
    * Long.MinValue — ordering below any real change at the same us,
    * unreachable anyway under the cut precondition. Result:
    * `scd2Increment(scd2Over(log<t), log≥t) ≡ scd2Over(log)` for ANY
    * cut t — CdcSpec property-tests three cuts, q193's oracle IS
    * q159's full-log oracle.
    *
    * Scale: O(dim-of-touched-keys + |late|) — two semi/anti joins
    * against the delta's key set (AQE broadcasts the small side) and
    * one scd2 window over touched keys only; the untouched history
    * (the overwhelming mass at 100 TB) is never read past the
    * anti-join. */
  def scd2Increment(dim: DataFrame, late: DataFrame): DataFrame = {
    val payload = late.columns.filterNot(MetaCols.contains).toSeq
    require(late.columns.take(4).sameElements(MetaCols),
      s"late changes must lead with (key, us, seq, op): ${late.columns.toSeq}")
    require(dim.columns.sameElements(
      "key" +: payload :+ "valid_from_us" :+ "valid_to_us" :+ "is_current"),
      s"dim must be scd2Over-shaped over the same payload: " +
        s"${dim.columns.toSeq} vs payload $payload")
    val touched = late.select(col("key")).distinct()
    val untouched = dim.join(touched, Seq("key"), "left_anti")
    val touchedDim = dim.join(touched, Seq("key"), "left_semi")
    val closed = touchedDim.filter(!col("is_current"))
    val pseudo = touchedDim.filter(col("is_current"))
      .select(col("key") +: col("valid_from_us").as("us") +:
        lit(Long.MinValue).as("seq") +: lit("U").as("op") +:
        payload.map(col): _*)
    // Fail-loud guard on the cut precondition (cheap, delta-bounded):
    // the open version's valid_from_us is the us of its key's LAST
    // prefix change, so a late change with us strictly below it cannot
    // be "wholly after the prefix" — silently proceeding would weave
    // the violator into immutable history (corrupt closed versions).
    // Equal-us violations need the prefix's seq (not retained in the
    // dim) and stay under the documented contract.
    val openFrom = touchedDim.filter(col("is_current"))
      .select(col("key"), col("valid_from_us").as("__open_from"))
    val guardedLate = late
      .join(openFrom, Seq("key"), "left")
      .withColumn("us",
        when(col("__open_from").isNull || col("us") >= col("__open_from"),
          col("us"))
        .otherwise(raise_error(concat(
          lit("scd2Increment: late change predates its key's open "
            + "version (cut precondition violated), key="),
          col("key").cast("string"))).cast("long")))
      .drop("__open_from")
    val re = scd2Over(pseudo.unionByName(
      guardedLate.select(col("key") +: col("us") +: col("seq") +: col("op") +:
        payload.map(col): _*)))
    untouched.unionByName(closed).unionByName(re)
  }

  /** Snapshot diff / change-feed generation — the INVERSE of
    * [[mergeApply]]: given two snapshots of the same table, emit the
    * minimal change set ('I' insert / 'D' delete / 'U' update) that
    * turns the old one into the new one. The production pairing is
    * obvious: a source that republishes full snapshots (the
    * reference's play-by-play CSVs are exactly that,
    * `assets/app_nfl.py:42-65`) is converted to an incremental feed
    * once, then every downstream consumer applies the small diff
    * instead of re-reading the world.
    *
    * Semantics: keys only in `newSnap` → I; keys only in `oldSnap` →
    * D; keys in both with any payload column different (null-safe) →
    * U; payload-identical keys emit NOTHING — change metadata (us,
    * seq) is not compared, so a re-delivered upsert with an unchanged
    * payload produces an empty diff, which is what makes the feed
    * minimal. [[diffToLog]] re-shapes the diff as a [[mergeApply]]
    * change log, closing the algebra: `mergeApply(old, diffToLog(
    * tableDiff(old, new)))` reproduces `new` exactly on (key,
    * payload) for ANY two snapshots — exactly BECAUSE the diff is
    * minimal, a payload-identical key keeps its OLD change metadata
    * through the round trip (CdcSpec property-tests this).
    *
    * Scale: one keyed full-outer join (AQE broadcasts whichever side
    * is small; at 100 TB both snapshots would live bucketed by key
    * and the join plans shuffle-free) + a per-row classification map.
    * No window, no agg — snapshots are already one-row-per-key. */
  def tableDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    require(oldSnap.columns.sameElements(newSnap.columns),
      s"snapshot schemas differ: ${oldSnap.columns.toSeq} vs ${newSnap.columns.toSeq}")
    require(oldSnap.columns.take(3).sameElements(Seq("key", "us", "seq")),
      s"snapshots must lead with (key, us, seq): ${oldSnap.columns.toSeq}")
    val payload = oldSnap.columns.drop(3).toSeq
    // explicit presence markers — inferring presence from metadata
    // nullability would misclassify a row whose `us` is NULL (a key in
    // both snapshots with NULL old us must not emit a spurious 'I')
    val o = oldSnap.select(col("key") +: lit(true).as("__o_present") +:
      (Seq("us", "seq") ++ payload).map(c => col(c).as(s"__o_$c")): _*)
    val n = newSnap.select(col("key") +: lit(true).as("__n_present") +:
      (Seq("us", "seq") ++ payload).map(c => col(c).as(s"__n_$c")): _*)
    val inOld = col("__o_present") <=> lit(true)
    val inNew = col("__n_present") <=> lit(true)
    val changed = payload
      .map(p => !(col(s"__o_$p") <=> col(s"__n_$p")))
      .foldLeft(lit(false))(_ || _)
    o.join(n, Seq("key"), "full_outer")
      .withColumn("change",
        when(!inOld, "I").when(!inNew, "D")
          .when(changed, "U"))
      .filter(col("change").isNotNull)
      .select(col("key") +: col("change") +:
        // change metadata rides from the surviving side (new for I/U,
        // old for D) so the diff is itself a valid change log
        when(col("change") === "D", col("__o_us")).otherwise(col("__n_us")).as("us") +:
        when(col("change") === "D", col("__o_seq")).otherwise(col("__n_seq")).as("seq") +:
        (payload.map(p => col(s"__o_$p").as(s"${p}_old")) ++
          payload.map(p => col(s"__n_$p").as(s"${p}_new"))): _*)
  }

  /** Re-shape a [[tableDiff]] result as a [[mergeApply]] change log:
    * I/U rows become upserts carrying the new payload, D rows become
    * deletes. `mergeApply(Some(old), diffToLog(tableDiff(old, new)))`
    * equals `new` exactly (a delta row always supersedes the base
    * row, so the carried (us, seq) only matters for ordering INSIDE
    * the log — and a diff has one row per key by construction). */
  def diffToLog(diff: DataFrame): DataFrame = {
    val payload = diff.columns.filter(_.endsWith("_new"))
      .map(_.stripSuffix("_new")).toSeq
    diff.select(col("key") +: col("us") +: col("seq") +:
      when(col("change") === "D", "D").otherwise("U").as("op") +:
      payload.map(p => col(s"${p}_new").as(p)): _*)
  }

  /** Point-in-time dimension lookup — the feature-store read the SCD2
    * history exists FOR: each fact row is joined to the dimension
    * version that was live STRICTLY BEFORE the fact's instant (state
    * at t−1µs), the leakage-safe semantics of training-data assembly —
    * a label event must never see state its own upsert created
    * (Kakade et al.'s "point-in-time correctness"; every production
    * feature store documents exactly this contract).
    *
    * `facts` must lead with (key, us); remaining columns are fact
    * payload. `dim` must be [[scd2Over]]-shaped: (key, payload...,
    * valid_from_us, valid_to_us, is_current). Output: the fact columns
    * + dim payload + valid_from_us/valid_to_us, all dim-side columns
    * NULL when no version was live at t−1 (no history yet, or the key
    * was deleted — SCD2 gaps are real states and surface as misses,
    * not as stale reads).
    *
    * Semantics on integer micros: the version live at t−1 is the one
    * with valid_from_us < t ≤ coalesce(valid_to_us, +∞) — intervals
    * are disjoint half-open [from, to), so at most one matches.
    *
    * Scale: NOT a range join (O(|F|·|V|) pair explosion a 100 TB fact
    * table cannot pay). The [[AsOfJoin]] union+window technique: tag
    * both sides, ONE shuffle of |F|+|V| rows on the key, one
    * partition-local sort by (us, tag) with probes (tag 0) sorting
    * BEFORE versions (tag 1) at equal us — so the ignoreNulls carry
    * sees only versions with valid_from strictly below the probe — and
    * the gap check `us <= valid_to` is a per-row comparison after the
    * carry. Sort-merge-join cost, AQE-skew-safe, no pair blowup. */
  def pointInTimeLookup(facts: DataFrame, dim: DataFrame): DataFrame = {
    require(facts.columns.take(2).sameElements(Seq("key", "us")),
      s"facts must lead with (key, us): ${facts.columns.toSeq}")
    val dimMeta = Seq("valid_from_us", "valid_to_us", "is_current")
    require(dim.columns.head == "key" &&
      dim.columns.takeRight(3).sameElements(dimMeta),
      s"dim must be scd2Over-shaped: ${dim.columns.toSeq}")
    val payload = dim.columns.filterNot(c => c == "key" || dimMeta.contains(c)).toSeq
    val factPayload = facts.columns.drop(2).toSeq
    // drop EMPTY versions ([from, from) — opened and closed at the same
    // instant by a same-us successor): they can never be live at any
    // t−1, and they are the only way two versions of a key share a
    // valid_from — removing them makes the (us, tag) sort key unique
    // per key on the version side, so the carry is deterministic
    val dimLive = dim.filter(
      col("valid_to_us").isNull || col("valid_to_us") > col("valid_from_us"))
    val vStruct = struct(
      (payload.map(col) :+ col("valid_from_us") :+ col("valid_to_us")): _*)
    val vStructType = org.apache.spark.sql.types.StructType(
      (payload :+ "valid_from_us" :+ "valid_to_us")
        .map(c => org.apache.spark.sql.types.StructField(
          c, dim.schema(c).dataType)))
    val probes = facts.select(col("key") +: col("us") +: lit(0).as("__tag") +:
      lit(null).cast(vStructType).as("__v") +: factPayload.map(col): _*)
    val versions = dimLive.select(col("key") +: col("valid_from_us").as("us") +:
      lit(1).as("__tag") +: vStruct.as("__v") +:
      factPayload.map(c => lit(null).cast(facts.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col("key")).orderBy(col("us"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val live = col("__c").isNotNull &&
      (col("__c.valid_to_us").isNull || col("us") <= col("__c.valid_to_us"))
    probes.unionByName(versions)
      .withColumn("__c", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .select(col("key") +: col("us") +: factPayload.map(col) ++:
        payload.map(p => when(live, col(s"__c.$p")).as(p)) ++:
        Seq(when(live, col("__c.valid_from_us")).as("valid_from_us"),
          when(live, col("__c.valid_to_us")).as("valid_to_us")): _*)
  }

  /** q186: point-in-time profile lookup — every purchase event joined
    * to the SCD2 profile version live strictly before it. Purchases
    * are themselves upserts in the change log, so the strict-prior
    * semantics is load-bearing: a purchase that OPENED a version must
    * surface the predecessor state, not its own — the oracle's range
    * join replays the interval predicate literally. */
  def purchaseProfileAsOf(t: Tables): DataFrame = {
    import t.spark.implicits._
    val dim = scd2Over(eventChangeLog(t))
    val facts = t.events.filter($"event_type" === "purchase")
      .select($"user_id".as("key"), tsMicros($"ts").as("us"),
        $"event_id".as("purchase_id"))
    pointInTimeLookup(facts, dim)
      .select($"key".as("user_id"), $"purchase_id",
        timestamp_micros($"us").as("purchase_ts"),
        $"value".as("prior_value"), $"etype".as("prior_etype"),
        timestamp_micros($"valid_from_us").as("valid_from"))
      .orderBy($"user_id", $"purchase_id")
  }

  /** The fixture change log: `events` as a CDC feed over per-user
    * profile state — key = user_id, order = (ts micros, event_id),
    * 'error' events are deletes, everything else upserts carrying
    * (value, etype). */
  def eventChangeLog(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.events.select(
      $"user_id".as("key"), tsMicros($"ts").as("us"), $"event_id".as("seq"),
      when($"event_type" === "error", "D").otherwise("U").as("op"),
      $"value", $"event_type".as("etype"))
  }

  /** q158: CDC merge — build a base snapshot from the log's first two
    * weeks, merge the remaining delta onto it, and emit the result,
    * which by [[mergeApply]]'s associativity must equal the full-log
    * latest-wins snapshot the oracle computes directly. */
  def cdcMergeSnapshot(t: Tables): DataFrame = {
    import t.spark.implicits._
    val log = eventChangeLog(t)
    val cutoffUs = lit(java.time.Instant.parse("2024-01-15T00:00:00Z")
      .getEpochSecond * 1000000L)
    val base = mergeApply(None, log.filter($"us" < cutoffUs))
    mergeApply(Some(base), log.filter($"us" >= cutoffUs))
      .select($"key".as("user_id"), $"value", $"etype",
        timestamp_micros($"us").as("updated_ts"))
      .orderBy($"user_id")
  }

  /** q166: snapshot diff — the mid-January snapshot diffed against
    * the full-log snapshot; what a consumer of republished full
    * snapshots applies instead of the second full read. */
  def snapshotDiff(t: Tables): DataFrame = {
    import t.spark.implicits._
    val log = eventChangeLog(t)
    val cutoffUs = lit(java.time.Instant.parse("2024-01-15T00:00:00Z")
      .getEpochSecond * 1000000L)
    val oldSnap = mergeApply(None, log.filter($"us" < cutoffUs))
    val newSnap = mergeApply(None, log)
    tableDiff(oldSnap, newSnap)
      .select($"key".as("user_id"), $"change",
        $"value_old", $"etype_old", $"value_new", $"etype_new")
      .orderBy($"user_id")
  }

  /** q193: incremental SCD2 — the dimension built from the log's first
    * two weeks, then MERGED with the remainder via [[scd2Increment]];
    * by the increment identity the result must hash-equal q159's
    * full-log assembly, so the oracle is q159's verbatim. */
  def scd2HistoryIncremental(t: Tables): DataFrame = {
    import t.spark.implicits._
    val log = eventChangeLog(t)
    val cutoffUs = lit(java.time.Instant.parse("2024-01-15T00:00:00Z")
      .getEpochSecond * 1000000L)
    val dim = scd2Over(log.filter($"us" < cutoffUs))
    scd2Increment(dim, log.filter($"us" >= cutoffUs))
      .select($"key".as("user_id"), $"value", $"etype",
        timestamp_micros($"valid_from_us").as("valid_from"),
        timestamp_micros($"valid_to_us").as("valid_to"), $"is_current")
      .orderBy($"user_id", $"valid_from")
  }

  /** q159: SCD2 history assembly over the full fixture change log. */
  def scd2History(t: Tables): DataFrame = {
    import t.spark.implicits._
    scd2Over(eventChangeLog(t))
      .select($"key".as("user_id"), $"value", $"etype",
        timestamp_micros($"valid_from_us").as("valid_from"),
        timestamp_micros($"valid_to_us").as("valid_to"), $"is_current")
      .orderBy($"user_id", $"valid_from")
  }
}
