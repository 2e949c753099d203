package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for aggregates — the batch-side dual
  * of streaming state: a 100 TB warehouse does not recompute its
  * per-customer / per-day rollups from the raw facts on every load,
  * it keeps the AGGREGATE TABLE itself and folds each delta in. The
  * reference's serving layer reads exactly such precomputed rollups
  * (`assets/app_nfl.py:42-65` loads snapshot CSVs rather than
  * re-deriving them); this operator is how those stay fresh.
  *
  * Algebra: the maintained measures are the classic commutative
  * monoids — count, sum (exact integer quantities), min, max — whose
  * partials merge associatively: agg(base ∪ delta) = merge(agg(base),
  * agg(delta)). That identity is the whole correctness story, and
  * q167's oracle checks it from the OUTSIDE: the engine maintains
  * incrementally, the oracle aggregates the union from scratch, the
  * hashes must coincide. Min/max make the view INSERT-ONLY (they are
  * not retractable); deletions would drop min/max or demand a
  * re-aggregation of affected groups — stated loudly rather than
  * silently mis-merged.
  *
  * Scale: the aggregate table is persisted BUCKETED BY the group key
  * (the q116 layout machinery), so the merge join reads it with zero
  * exchanges — only the delta's partials (one map-side-combined agg,
  * |groups-touched| rows, not |delta| rows) shuffle into the bucket
  * layout. Cost per refresh is O(delta + groups-touched), independent
  * of the view's (or the fact history's) total size — the property
  * that makes daily loads O(day) instead of O(history).
  */
object Ivm {

  private val Meta = Seq("key", "n", "s", "mn", "mx")

  /** Per-group partial aggregates of one integer-quantized measure:
    * (key, n, s, mn, mx). `measureQ` must be an exact integer column
    * (quantize floats to their domain unit first) so `s` is
    * order-independent. */
  def partials(facts: DataFrame, keyCol: Column, measureQ: Column): DataFrame =
    facts.groupBy(keyCol.as("key")).agg(
      count(lit(1)).as("n"), sum(measureQ).as("s"),
      min(measureQ).as("mn"), max(measureQ).as("mx"))

  /** Persist `facts`' partial aggregates as a bucketed managed table —
    * the one-time (or per-load, rolled forward) view materialization. */
  def buildAggIndex(facts: DataFrame, keyCol: Column, measureQ: Column,
      table: String, buckets: Int = 8): Unit = {
    val spark = facts.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    graft.Tables.deleteRec(new java.io.File(wh, table))
    partials(facts, keyCol, measureQ)
      .repartition(buckets, col("key")).write.bucketBy(buckets, "key").sortBy("key")
      .saveAsTable(table)
  }

  /** Monoid-wise combine of two partial-aggregate frames (both shaped
    * (key, n, s, mn, mx)) — the associative core both the batch
    * roll-forward (q167) and the streaming fold (q177) reduce to. */
  def mergePartials(a: DataFrame, b: DataFrame): DataFrame =
    a.as("i").hint("merge")
      .join(b.as("d"), Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("i.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"),
        (coalesce(col("i.s"), lit(0L)) + coalesce(col("d.s"), lit(0L))).as("s"),
        least(col("i.mn"), col("d.mn")).as("mn"),   // least/greatest skip NULLs
        greatest(col("i.mx"), col("d.mx")).as("mx"))

  /** Merge a delta fact slice into the persisted view: aggregate the
    * delta to partials (map-side combined — the only pass over delta
    * rows), full-outer join the bucketed view on its own layout
    * (merge-hinted; the view side plans with NO exchange,
    * IvmSpec-asserted), and combine monoid-wise. Returns the UPDATED
    * view; writing it back under a new table name is the roll-forward
    * (same recipe as the dedup index's updateDedupIndex). */
  def mergeDelta(delta: DataFrame, keyCol: Column, measureQ: Column,
      table: String): DataFrame = {
    val spark = delta.sparkSession
    val idx = spark.table(table)
    require(idx.columns.sameElements(Meta),
      s"$table is not an Ivm aggregate table: ${idx.columns.toSeq}")
    mergePartials(idx, partials(delta, keyCol, measureQ))
  }

  // ── Retraction-aware maintenance (q180) ────────────────────────────
  // [[mergeDelta]] is insert-only BECAUSE min/max are not retractable
  // monoids; this half closes the mutation family: a CDC delta
  // carrying deletes and updates (the exact shape [[Cdc.tableDiff]]
  // emits) maintains the same view. The algebra splits by measure:
  //
  //  - count/sum ARE retractable (they form groups, not just
  //    monoids): n' = n + |inserts| − |deletes|, s' = s + Σnew − Σold,
  //    one map-side-combined signed agg over the delta — O(delta).
  //  - min/max are re-aggregated for ONLY the groups that LOST a
  //    value (a 'D', or a 'U' retracting its old row): surviving base
  //    facts of those groups stream off the facts table's BUCKETED
  //    layout (zero-exchange agg; the removed fact ids anti-join as a
  //    broadcast), and the delta rows landing there merge in
  //    monoid-wise. Groups touched only by inserts extend min/max
  //    monoid-wise exactly as before — no fact scan at all.
  //
  // Refresh cost: O(delta + facts-of-touched-groups), still
  // independent of history size — the standard production IVM
  // treatment of deletes (retract what retracts, recompute the
  // non-retractable residue on the touched slice).

  /** Persist a keyed fact slice `(fkey, key, q)` bucketed by the GROUP
    * key — the layout [[mergeDeltaRetract]]'s touched-group
    * re-aggregation reads with zero exchanges. `fkey` must identify
    * the fact row (delta deletes/updates reference it). */
  def buildFactIndex(facts: DataFrame, table: String, buckets: Int = 8): Unit = {
    require(facts.columns.sameElements(Seq("fkey", "key", "q")),
      s"fact index must be (fkey, key, q): ${facts.columns.toSeq}")
    val spark = facts.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    graft.Tables.deleteRec(new java.io.File(wh, table))
    // repartition to the bucket spec first: bucketBy from an N-task
    // upstream writes up to N files PER BUCKET (measured 255 files for
    // an 8-bucket sidecar at sf0.001), and every later touched-group
    // re-aggregation pays one scan task per file; pre-partitioned, the
    // table is exactly one well-sized file per bucket (guide §6)
    facts.repartition(buckets, col("key"))
      .write.bucketBy(buckets, "key").sortBy("key").saveAsTable(table)
  }

  /** Fold a fact-level change set into the persisted view. `delta` is
    * [[Cdc.tableDiff]]-shaped over the fact table: one row per changed
    * fact, `(fkey, change 'I'|'D'|'U', key_old, q_old, key_new,
    * q_new)` — old side NULL for I, new side NULL for D; an update may
    * move the fact between groups (key_old ≠ key_new). Returns the
    * updated `(key, n, s, mn, mx)` view over the SURVIVING facts;
    * groups whose last fact was deleted drop out, a delete of a
    * nonexistent fact fails loudly (negative count). The facts table
    * must hold the PRE-delta fact rows ([[buildFactIndex]] layout). */
  def mergeDeltaRetract(delta: DataFrame, viewTable: String,
      factsTable: String): DataFrame = {
    val spark = delta.sparkSession
    val view = spark.table(viewTable)
    require(view.columns.sameElements(Meta),
      s"$viewTable is not an Ivm aggregate table: ${view.columns.toSeq}")
    val facts = spark.table(factsTable)
    require(facts.columns.sameElements(Seq("fkey", "key", "q")),
      s"$factsTable is not an Ivm fact index: ${facts.columns.toSeq}")
    // delta materialized once: the fold references it in five branches
    // (signed contributions, touched keys, removed fkeys, insert
    // extension, survivor merge) and a delta derived from a fact scan
    // would re-run that scan per branch — a production change log is a
    // materialized table already (the MultiIvm.mergeMultiDelta note);
    // the streaming fold (q187) calls the *Frames core with in-memory
    // batches and never pays this job
    mergeDeltaRetractFrames(delta.localCheckpoint(true), view, facts)
  }

  /** Frame-level core of [[mergeDeltaRetract]]: `view` is any
    * (key, n, s, mn, mx) frame, `facts` any (fkey, key, q) frame
    * holding the PRE-delta facts. The table entry point reads both off
    * their persisted bucketed layouts (zero-exchange, plan-asserted);
    * the streaming fold (q187) passes its rolled-forward in-memory
    * frames through the SAME algebra — one code path, two deployments. */
  def mergeDeltaRetractFrames(delta: DataFrame, view: DataFrame,
      facts: DataFrame): DataFrame = {
    require(delta.columns.sameElements(
      Seq("fkey", "change", "key_old", "q_old", "key_new", "q_new")),
      s"delta must be (fkey, change, key_old, q_old, key_new, q_new): " +
        s"${delta.columns.toSeq}")
    val retracts = delta.filter(col("change").isin("D", "U"))
    val adds = delta.filter(col("change").isin("I", "U"))
    // signed count/sum contributions — one map-side-combined agg
    val dns = retracts
      .select(col("key_old").as("key"), lit(-1L).as("dn"), (-col("q_old")).as("dq"))
      .unionByName(adds
        .select(col("key_new").as("key"), lit(1L).as("dn"), col("q_new").as("dq")))
      .groupBy(col("key")).agg(sum(col("dn")).as("dn"), sum(col("dq")).as("ds"))
    // groups that lost a value: min/max must be re-derived from the
    // surviving facts (broadcast-bounded by the delta)
    val touched = retracts.select(col("key_old").as("key")).distinct()
    val removed = retracts.select(col("fkey")).distinct()
    // surviving BASE facts of touched groups, aggregated on the
    // bucketed layout (both joins broadcast, so no exchange precedes
    // the agg); delta rows landing in touched groups aggregate apart
    // (delta-scale) and merge in monoid-wise — exact, since neither
    // part retracts internally
    val survBase = facts
      .join(broadcast(touched), Seq("key"), "left_semi")
      .join(broadcast(removed), Seq("fkey"), "left_anti")
      .groupBy(col("key")).agg(min(col("q")).as("bmn"), max(col("q")).as("bmx"))
    val survNew = adds
      .join(broadcast(touched), adds("key_new") === touched("key"), "left_semi")
      .groupBy(col("key_new").as("key"))
      .agg(min(col("q_new")).as("nmn"), max(col("q_new")).as("nmx"))
    val reagg = survBase.as("b").hint("merge")
      .join(survNew.as("nw"), Seq("key"), "full_outer")
      .select(col("key"), lit(true).as("retracted"),
        least(col("bmn"), col("nmn")).as("rmn"),
        greatest(col("bmx"), col("nmx")).as("rmx"))
    // monoid min/max extension for groups touched only by inserts
    val insExt = adds.groupBy(col("key_new").as("key"))
      .agg(min(col("q_new")).as("imn"), max(col("q_new")).as("imx"))
    val n2 = coalesce(col("v.n"), lit(0L)) + coalesce(col("dn"), lit(0L))
    view.as("v").hint("merge")
      .join(dns.as("d"), Seq("key"), "full_outer")
      .join(insExt.as("i"), Seq("key"), "left")
      .join(reagg.as("r"), Seq("key"), "left")
      .select(col("key"),
        when(n2 >= 0, n2).otherwise(raise_error(concat(
          lit("Ivm.mergeDeltaRetract: negative count — delta retracts a "
            + "fact the view never held, key="), col("key").cast("string")))
          .cast("long")).as("n"),
        (coalesce(col("v.s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"),
        when(col("retracted") <=> lit(true), col("rmn"))
          .otherwise(least(col("v.mn"), col("imn"))).as("mn"),
        when(col("retracted") <=> lit(true), col("rmx"))
          .otherwise(greatest(col("v.mx"), col("imx"))).as("mx"))
      .filter(col("n") > 0)
  }

  // ── Dimension-move maintenance (q195) ──────────────────────────────
  // The classic HARD case of join-view maintenance: the view is an
  // aggregate over fact ⋈ dim (per-nation revenue), and the DIMENSION
  // changes — a customer moves nation (the SCD1 update every CRM
  // emits). Naively that reprices every fact of the moved customer;
  // at 100 TB the fact table cannot be in the loop. The standard fix
  // is a TWO-LEVEL rollup: a persisted per-dim-key aggregate (the
  // q167 bucketed index — maintained by fact deltas exactly as
  // before) plus the group-level view. A dim move then transfers the
  // dim key's ENTIRE partial between groups: −(n_c, s_c) from the old
  // group, +(n_c, s_c) to the new — O(|dim delta|) work, INDEPENDENT
  // of the fact count, because count/sum partials are group elements
  // (min/max are NOT move-transferable — they'd need a group-wide
  // re-aggregation — so this operator maintains the retractable pair
  // only, stated loudly, the q167/q180 division of labor).

  /** Fold a dimension-move delta `(key, g_old, g_new)` — one row per
    * moved dim key, groups nullable for enter/leave — into a
    * group-level view `(g, n, s)`, reading each moved key's partial
    * off the per-key aggregate table ([[buildAggIndex]] layout, its
    * bucketed join zero-exchange). Keys with no facts contribute
    * nothing; groups emptied drop out; a phantom move (retracting
    * more than a group holds) fails loudly. */
  def mergeDimMove(view: DataFrame, aggTable: String,
      delta: DataFrame): DataFrame = {
    val spark = delta.sparkSession
    require(view.columns.sameElements(Seq("g", "n", "s")),
      s"view must be (g, n, s): ${view.columns.toSeq}")
    require(delta.columns.sameElements(Seq("key", "g_old", "g_new")),
      s"delta must be (key, g_old, g_new): ${delta.columns.toSeq}")
    val perKey = spark.table(aggTable)
    require(perKey.columns.sameElements(Meta),
      s"$aggTable is not an Ivm aggregate table: ${perKey.columns.toSeq}")
    // broadcast the (small) move delta against ONE narrow zero-
    // exchange scan of the per-key index — the fact table is out of
    // the loop entirely; a storage layer with point reads / partition
    // pruning makes the index leg O(delta) too
    val contrib = perKey
      .join(broadcast(delta), Seq("key"))
      .select(explode(array(
        struct(col("g_old").as("g"), (-col("n")).as("dn"), (-col("s")).as("ds")),
        struct(col("g_new").as("g"), col("n").as("dn"), col("s").as("ds"))))
        .as("c"))
      .select(col("c.g"), col("c.dn"), col("c.ds"))
      .filter(col("g").isNotNull)
      .groupBy(col("g")).agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
    val n2 = coalesce(col("v.n"), lit(0L)) + coalesce(col("dn"), lit(0L))
    view.as("v")
      .join(contrib.as("d"), Seq("g"), "full_outer")
      .select(col("g"),
        when(n2 >= 0, n2).otherwise(raise_error(concat(
          lit("Ivm.mergeDimMove: negative count — move retracts more "
            + "than the group holds, g="), col("g").cast("string")))
          .cast("long")).as("n"),
        (coalesce(col("v.s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .filter(col("n") > 0)
  }

  /** q195: the per-nation revenue view maintained under a
    * deterministic customer-move delta (every c_custkey ≡ 0 mod 89
    * moves to nation (c_nationkey + 7) mod 25). Base view and the
    * per-customer aggregate index build once (memoized); the move
    * delta folds in at query time reading ONLY the moved customers'
    * partials — must hash-equal the oracle's from-scratch GROUP BY
    * over the post-move world. */
  private val dimMoveBuilt = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), String]()

  /** The memoized per-customer aggregate index (q195/q199). */
  private[graft] def ensureCustAggIndex(t: Tables): String = {
    import t.spark.implicits._
    val fp = Integer.toHexString(
      graft.Tables.parallelLayout(t.spark, t.dir, "orders").hashCode)
    dimMoveBuilt.computeIfAbsent((t.spark.sparkContext, fp), _ => {
      val name = s"graft_ivm_cust_$fp"
      buildAggIndex(t.orders, $"o_custkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long"), name)
      name
    })
  }

  /** The pre-move per-nation (g, n, s) view off the per-customer
    * index (shared by q195 and the q199 stream). */
  private[graft] def nationBaseView(t: Tables, aggTable: String): DataFrame = {
    import t.spark.implicits._
    t.spark.table(aggTable)
      .join(broadcast(t.customer.select($"c_custkey", $"c_nationkey")),
        $"key" === $"c_custkey")
      .join(broadcast(t.nation.select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("g"))
      .agg(sum($"n").as("n"), sum($"s").as("s"))
  }

  /** The deterministic customer-move delta (every c_custkey ≡ 0 mod
    * 89 moves to nation (c_nationkey + 7) mod 25), named by n_name. */
  private[graft] def nationMoveDelta(t: Tables): DataFrame = {
    import t.spark.implicits._
    val nationOf = t.nation.select($"n_nationkey", $"n_name")
    t.customer.filter($"c_custkey" % 89 === 0)
      .select($"c_custkey".as("key"), $"c_nationkey",
        (($"c_nationkey" + 7) % 25).as("nk_new"))
      .join(broadcast(nationOf.select($"n_nationkey".as("c_nationkey"),
        $"n_name".as("g_old"))), Seq("c_nationkey"))
      .join(broadcast(nationOf.select($"n_nationkey".as("nk_new"),
        $"n_name".as("g_new"))), Seq("nk_new"))
      .select($"key", $"g_old", $"g_new")
  }

  def nationRevenueDimMove(t: Tables): DataFrame = {
    import t.spark.implicits._
    val aggTable = ensureCustAggIndex(t)
    mergeDimMove(nationBaseView(t, aggTable), aggTable, nationMoveDelta(t))
      .select($"g".as("n_name"), $"n".as("n_orders"),
        ($"s".cast("double") / 100.0).as("total_price"))
      .orderBy($"n_name")
  }

  // ── dimension moves with min/max (q201) ────────────────────────────
  // [[mergeDimMove]] maintains count/sum only, because min/max are not
  // transferable group elements: when a dim key LEAVES a group, the
  // departing key may have held the group's min, and no signed
  // arithmetic recovers the runner-up. But the TWO-LEVEL layout
  // already holds what a re-derivation needs: the per-dim-key
  // aggregate index carries each key's own (mn, mx), and a group's
  // min/max is exactly the min/max over its MEMBER KEYS' partials. So
  // a move re-aggregates min/max for ONLY the touched groups, over
  // |dim|-scale per-key partials — the fact table stays out of the
  // loop entirely (plan-asserted), which is the whole point: at
  // 100 TB, |dim| (customers) is millions where |fact| (orders) is
  // billions. count/sum still transfer by pure signed addition.

  /** Fold a dimension-move delta into a FULL group-level view
    * `(g, n, s, mn, mx)`. `mapping` is the POST-move (key, g)
    * assignment of every dim key (base dim with the delta applied —
    * the caller owns the dim and rolls it forward anyway); groups
    * touched by any move re-derive mn/mx over their member keys'
    * partials from the aggregate index, untouched groups pass
    * through. Same loud phantom-move contract as [[mergeDimMove]]. */
  def mergeDimMoveFull(view: DataFrame, aggTable: String,
      mapping: DataFrame, delta: DataFrame): DataFrame = {
    val spark = delta.sparkSession
    require(view.columns.sameElements(Seq("g", "n", "s", "mn", "mx")),
      s"view must be (g, n, s, mn, mx): ${view.columns.toSeq}")
    require(delta.columns.sameElements(Seq("key", "g_old", "g_new")),
      s"delta must be (key, g_old, g_new): ${delta.columns.toSeq}")
    require(mapping.columns.sameElements(Seq("key", "g")),
      s"mapping must be (key, g): ${mapping.columns.toSeq}")
    val perKey = spark.table(aggTable)
    require(perKey.columns.sameElements(Meta),
      s"$aggTable is not an Ivm aggregate table: ${perKey.columns.toSeq}")
    val contrib = perKey
      .join(broadcast(delta), Seq("key"))
      .select(explode(array(
        struct(col("g_old").as("g"), (-col("n")).as("dn"), (-col("s")).as("ds")),
        struct(col("g_new").as("g"), col("n").as("dn"), col("s").as("ds"))))
        .as("c"))
      .select(col("c.g"), col("c.dn"), col("c.ds"))
      .filter(col("g").isNotNull)
      .groupBy(col("g")).agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
    val touched = delta
      .select(explode(array(col("g_old"), col("g_new"))).as("g"))
      .filter(col("g").isNotNull).distinct()
    // min/max re-derivation for touched groups: per-key partials ⋈
    // post-move membership, restricted to touched groups BEFORE the
    // agg — |members-of-touched-groups| rows through the aggregation,
    // never a fact row anywhere in the plan
    val reagg = perKey
      .join(mapping, Seq("key"))
      .join(broadcast(touched), Seq("g"), "left_semi")
      .groupBy(col("g"))
      .agg(lit(true).as("__re"), min(col("mn")).as("rmn"),
        max(col("mx")).as("rmx"))
    val n2 = coalesce(col("v.n"), lit(0L)) + coalesce(col("dn"), lit(0L))
    view.as("v")
      .join(contrib.as("d"), Seq("g"), "full_outer")
      .join(reagg.as("r"), Seq("g"), "left")
      .select(col("g"),
        when(n2 >= 0, n2).otherwise(raise_error(concat(
          lit("Ivm.mergeDimMoveFull: negative count — move retracts more "
            + "than the group holds, g="), col("g").cast("string")))
          .cast("long")).as("n"),
        (coalesce(col("v.s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"),
        when(col("__re") <=> lit(true), col("rmn"))
          .otherwise(col("v.mn")).as("mn"),
        when(col("__re") <=> lit(true), col("rmx"))
          .otherwise(col("v.mx")).as("mx"))
      .filter(col("n") > 0)
  }

  /** The pre-move FULL per-nation view (g, n, s, mn, mx) off the
    * per-customer index — group min/max are the min/max over member
    * keys' partials. */
  private[graft] def nationBaseViewFull(t: Tables, aggTable: String): DataFrame = {
    import t.spark.implicits._
    t.spark.table(aggTable)
      .join(broadcast(t.customer.select($"c_custkey", $"c_nationkey")),
        $"key" === $"c_custkey")
      .join(broadcast(t.nation.select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("g"))
      .agg(sum($"n").as("n"), sum($"s").as("s"),
        min($"mn").as("mn"), max($"mx").as("mx"))
  }

  /** Post-move (key, g) membership derived FROM the move delta — the
    * base assignment left-joined with the delta, coalesce(g_new, g) —
    * so the move recipe lives in exactly one place
    * ([[nationMoveDelta]]); a recipe change cannot silently diverge
    * the mapping from the delta (they are the same frame). Shared by
    * q201 and the q212 multi-measure move. */
  private[graft] def postMoveMapping(t: Tables, moved: DataFrame): DataFrame = {
    import t.spark.implicits._
    t.customer.select($"c_custkey".as("key"), $"c_nationkey")
      .join(broadcast(t.nation.select($"n_nationkey".as("c_nationkey"),
        $"n_name".as("g"))), Seq("c_nationkey"))
      .join(broadcast(moved.select($"key", $"g_new")), Seq("key"), "left")
      .select($"key", coalesce($"g_new", $"g").as("g"))
  }

  /** q201: q195's customer-move maintenance carrying ALL FOUR
    * aggregates — count/sum transfer by signed addition, min/max
    * re-derive over the touched nations' member-customer partials
    * (IvmSpec plan-asserts the fact table is absent from the plan).
    * Must hash-equal the oracle's post-move scratch rollup including
    * min/max. */
  def nationRevenueDimMoveFull(t: Tables): DataFrame = {
    import t.spark.implicits._
    val aggTable = ensureCustAggIndex(t)
    val moved = nationMoveDelta(t)
    mergeDimMoveFull(nationBaseViewFull(t, aggTable), aggTable,
      postMoveMapping(t, moved), moved)
      .select($"g".as("n_name"), $"n".as("n_orders"),
        ($"s".cast("double") / 100.0).as("total_price"),
        ($"mn".cast("double") / 100.0).as("min_price"),
        ($"mx".cast("double") / 100.0).as("max_price"))
      .orderBy($"n_name")
  }

  /** q167 fixture instance: the per-customer order rollup (count,
    * exact cents total, min/max) maintained incrementally — the view
    * is built from pre-1997 orders once (memoized per fixture
    * fingerprint), the 1997+ delta folded in at query time. Must
    * hash-equal the oracle's from-scratch GROUP BY over ALL orders. */
  private val viewBuilt = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), String]()
  def incrementalOrderRollup(t: Tables): DataFrame = {
    import t.spark.implicits._
    val cents = floor($"o_totalprice" * 100 + 0.5).cast("long")
    val cut = lit("1997-01-01 00:00:00").cast("timestamp")
    val fp = Integer.toHexString(
      graft.Tables.parallelLayout(t.spark, t.dir, "orders").hashCode)
    val table = viewBuilt.computeIfAbsent((t.spark.sparkContext, fp), _ => {
      val name = s"graft_ivm_orders_$fp"
      buildAggIndex(t.orders.filter($"o_orderdate" < cut), $"o_custkey",
        cents, name)
      name
    })
    mergeDelta(t.orders.filter($"o_orderdate" >= cut), $"o_custkey",
      cents, table)
      .select($"key".as("o_custkey"), $"n".as("n_orders"),
        ($"s".cast("double") / 100.0).as("total_price"),
        ($"mn".cast("double") / 100.0).as("min_price"),
        ($"mx".cast("double") / 100.0).as("max_price"))
      .orderBy($"o_custkey")
  }

  /** Orders as an Ivm fact frame: fkey = o_orderkey, key = o_custkey,
    * q = cents. */
  private[graft] def orderFacts(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.orders.select($"o_orderkey".as("fkey"), $"o_custkey".as("key"),
      floor($"o_totalprice" * 100 + 0.5).cast("long").as("q"))
  }

  /** q180's deterministic fact-level change set, synthesized from the
    * orders table itself (the q173 replant recipe — the oracle replays
    * the identical arithmetic): per o_orderkey residue mod 97,
    *  0 → 'D' delete; 1 → 'U' reprice (+12345 cents, same group);
    *  2 → 'U' MOVE to o_custkey+1 (retraction in one group, insertion
    *  in another — the case insert-only IVM cannot express);
    *  3 → 'I' new fact at fkey+2³¹, same group, q+55. */
  def orderFactDelta(t: Tables): DataFrame = orderFactDeltaOf(orderFacts(t))

  /** Same change set over an arbitrary (fkey, key, q) fact frame — the
    * streaming replay (q187) derives its delta from the BOUNDED fact
    * slice so the stream and its oracle agree at any SF. */
  private[graft] def orderFactDeltaOf(f: DataFrame): DataFrame = {
    // ONE pass with a CASE projection, not four union branches — each
    // branch was its own scan of the fact frame, so materializing the
    // delta (or collecting a stream slice) paid the scan 4×; the row
    // multiset is identical and every consumer aggregates (order-blind)
    val nl = lit(null).cast("long")
    val m = col("fkey") % 97
    f.filter(m.isin(0, 1, 2, 3))
      .select(
        when(m === 3, col("fkey") + 2147483648L).otherwise(col("fkey"))
          .as("fkey"),
        when(m === 0, "D").when(m === 3, "I").otherwise("U").as("change"),
        when(m === 3, nl).otherwise(col("key")).as("key_old"),
        when(m === 3, nl).otherwise(col("q")).as("q_old"),
        when(m === 0, nl).when(m === 2, col("key") + 1L)
          .otherwise(col("key")).as("key_new"),
        when(m === 0, nl).when(m === 1, col("q") + 12345L)
          .when(m === 3, col("q") + 55L).otherwise(col("q")).as("q_new"))
  }

  /** q180: retraction-aware view maintenance — the per-customer order
    * rollup under a delta carrying deletes, updates (including a
    * group MOVE), and inserts. The base view and the bucketed fact
    * index are built over ALL orders once (memoized per fixture
    * fingerprint); the change set folds in at query time. Must
    * hash-equal the oracle's from-scratch GROUP BY over the SURVIVING
    * facts — the two halves of the round-9 mutation family (q158's
    * deletes, q167's view) finally composing. */
  private val retractBuilt = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), (String, String)]()
  def retractableOrderRollup(t: Tables): DataFrame = {
    import t.spark.implicits._
    val fp = Integer.toHexString(
      graft.Tables.parallelLayout(t.spark, t.dir, "orders").hashCode)
    val (viewTable, factsTable) =
      retractBuilt.computeIfAbsent((t.spark.sparkContext, fp), _ => {
        val vt = s"graft_ivmr_view_$fp"
        val ft = s"graft_ivmr_facts_$fp"
        buildAggIndex(t.orders, $"o_custkey",
          floor($"o_totalprice" * 100 + 0.5).cast("long"), vt)
        buildFactIndex(orderFacts(t), ft)
        (vt, ft)
      })
    mergeDeltaRetract(orderFactDelta(t), viewTable, factsTable)
      .select($"key".as("o_custkey"), $"n".as("n_orders"),
        ($"s".cast("double") / 100.0).as("total_price"),
        ($"mn".cast("double") / 100.0).as("min_price"),
        ($"mx".cast("double") / 100.0).as("max_price"))
      .orderBy($"o_custkey")
  }
}
