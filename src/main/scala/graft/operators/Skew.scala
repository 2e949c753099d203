package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-aware aggregation: two-phase salted groupBy.
  *
  * A plain `groupBy(k).agg(...)` hash-partitions on k; with few hot
  * keys (l_returnflag has 3 values) the whole table lands on ≤3 of
  * 1000 reducers. Salting splits each key into `buckets` subkeys for
  * the first (wide, well-distributed) aggregation, then merges the
  * per-salt partials in a second, tiny aggregation. Works for any
  * algebraic aggregate; here sum/count. AQE's skew handling covers
  * skewed JOINS, but skewed aggregation keys still need this pattern.
  *
  * The DECIMAL accumulation keeps the result bit-identical to the
  * unsalted plan — which is exactly what the oracle checks.
  */
object Skew {

  /** sum+count aggregation over one skewed key, salted into `buckets`
    * partial groups. */
  def saltedSumCount(
      df: DataFrame, key: String, valueExpr: Column, buckets: Int,
      sumName: String, cntName: String): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(key), col("_salt"))
      .agg(
        sum(valueExpr.cast(DecimalType(18, 4))).as("_psum"),
        count(lit(1)).as("_pcnt"))
    partial
      .groupBy(col(key))
      .agg(
        sum(col("_psum")).cast("double").as(sumName),
        sum(col("_pcnt")).as(cntName))
  }

  /** q125: the RUNTIME skew path, driver-visible — the complement of
    * q42's manual salting for when skew is data-dependent. A
    * hub-skewed probe side (90% of events collapse onto key 0) joins
    * a keyed aggregate under AQE's `OptimizeSkewedJoin` with
    * fixture-scaled thresholds: the hub's map-output partition
    * exceeds factor × median, gets split into parallel sub-joins, and
    * the matching build partition is duplicated — the mechanism a
    * 1000-executor job leans on instead of one 9×-median straggler.
    * SkewJoinSpec asserts `skew=true` fires in THIS query's executed
    * plan; the DuckDB oracle checks the split changed nothing.
    *
    * Two shape constraints, both learned by reading executed plans:
    *
    *  - The build side joins RAW on a unique key (event_id), not
    *    pre-aggregated: `OptimizeSkewedJoin` pattern-matches a join
    *    whose children are BARE shuffle reads (Sort over
    *    ShuffleQueryStage) — an aggregate fused between shuffle and
    *    join breaks the match and silently disables the split. The
    *    unique key keeps the ANSWER linear anyway (each probe row
    *    matches exactly one build row; 7 output rows after rollup).
    *  - The final rollup keys on k % 7, NOT the join key: an
    *    aggregate reusing the join's hash partitioning fuses into
    *    the join's stage, and a skew split inside a fused stage would
    *    break the aggregate's required distribution — AQE correctly
    *    refuses. Re-keying puts an exchange after the join, which is
    *    where a split join's output lands on a real pipeline anyway.
    *
    * Broadcasting is disabled because this is the fact-fact pattern.
    * All aggregates are exact integers (counts + int64 user-id sums),
    * so the oracle is a plain GROUP BY. A child session keeps the
    * scaled-down AQE knobs from leaking into the shared session. */
  def skewJoinAgg(t: Tables): DataFrame = {
    val s = t.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    val ev = Tables(s, t.dir).events
    val left = ev.select(
      when($"event_id" % 10 =!= 0, lit(0L)).otherwise($"event_id").as("k"),
      $"user_id".as("lu"))
    val right = ev.select($"event_id".as("k"), $"user_id".as("ru"))
    left.join(right, "k")
      .groupBy(($"k" % 7).as("kb"))
      .agg(count(lit(1)).as("n_rows"),
        sum($"lu").as("sum_lu"), sum($"ru").as("sum_ru"))
      .orderBy($"kb")
  }

  /** q42: revenue by returnflag — a genuinely skewed key (3 values
    * across the whole lineitem table) — via the salted two-phase plan.
    * Result must equal the direct GROUP BY (the oracle). */
  def saltedRevenue(t: Tables): DataFrame = {
    import t.spark.implicits._
    saltedSumCount(
      t.lineitem, "l_returnflag",
      $"l_extendedprice" * (lit(1) - $"l_discount"),
      buckets = 32, sumName = "revenue", cntName = "n_rows")
      .orderBy($"l_returnflag")
  }

  // ── q179: join-key skew profile ─────────────────────────────────────
  // The diagnostic that DECIDES between this file's mitigations (salt
  // q42-style, AQE-split q125-style) and a plain shuffle: before you
  // pay for a 100 TB repartition, profile the key. One
  // map-side-combined count per key, then a node-scale aggregate
  // folding it to FOUR numbers per column: distinct keys, the top
  // key's share (worst single-reducer fraction), and the normalized
  // Shannon entropy ("balance": 1 = uniform, → 0 = one key owns the
  // table — entropy is the right summary because it bounds how well
  // ANY hash partitioning can spread the rows).
  //
  // Engine-exact entropy despite a float sum: each key's term
  // p·ln(p) is quantized to an integer number of 2⁻⁴⁰ quanta (the q85
  // PageRank recipe — p is one exact division, ln is the bit-exact
  // glibc/DuckDB ln, floor(x·2⁴⁰ + 0.5) the same IEEE pair), so the
  // cross-key reduction is an exact integer sum: order-independent
  // under any partitioning, identical in any engine. |terms| ≤
  // n·ln(n)/e quanta bounds the int64 far from overflow at any SF.

  /** Skew profile of one key column:
    * (column_name, n_rows, n_keys, top1_cnt, top1_share, entropy,
    * balance). NULL keys count as a key (they hash to one reducer
    * like any other value). */
  def keySkewProfileOver(df: DataFrame, name: String,
      keyCol: Column): DataFrame = {
    val counts = df.groupBy(keyCol.as("__k")).agg(count(lit(1)).as("c"))
    val qTerm = floor(
      (col("c").cast("double") / col("n").cast("double")) *
        call_function("math_ln",
          col("c").cast("double") / col("n").cast("double")) *
        lit(1099511627776.0) + lit(0.5)).cast("long")
    counts
      .crossJoin(broadcast(counts.agg(sum(col("c")).as("n")))) // one row
      .agg(max(col("n")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("c")).as("top1_cnt"), sum(qTerm).as("__qe"))
      .select(lit(name).as("column_name"), col("n_rows"), col("n_keys"),
        col("top1_cnt"),
        (col("top1_cnt").cast("double") / col("n_rows").cast("double"))
          .as("top1_share"),
        (-(col("__qe").cast("double")) / lit(1099511627776.0)).as("entropy"),
        when(col("n_keys") > 1,
          (-(col("__qe").cast("double")) / lit(1099511627776.0)) /
            call_function("math_ln", col("n_keys").cast("double")))
          .as("balance"))
  }

  /** q179: the three join keys a fixture warehouse shuffles on most —
    * near-uniform fact keys (l_partkey, o_custkey) against the
    * 3-value l_returnflag whose salting q42 demonstrates. */
  def joinKeySkewProfile(t: Tables): DataFrame = {
    import t.spark.implicits._
    keySkewProfileOver(t.lineitem, "lineitem.l_partkey", $"l_partkey")
      .unionByName(keySkewProfileOver(t.orders, "orders.o_custkey", $"o_custkey"))
      .unionByName(keySkewProfileOver(t.lineitem, "lineitem.l_returnflag",
        $"l_returnflag"))
      .orderBy($"column_name")
  }

  // ── q185: skew-ADAPTIVE execution (closing q179's loop) ────────────
  // q179 produced the diagnostic; these operators CONSUME it: profile
  // the key (one map-side-combined count + a one-row driver read, the
  // k-means scalar pattern), then pick the plan this file's other
  // members demonstrate — q42's salted two-phase for low-cardinality
  // aggregation keys (every strategy bottlenecks on ≤ n_keys reducers,
  // so the fix is salting the partial agg), q125's AQE skew-split for
  // a hub-dominated join key, a plain shuffle when neither regime
  // holds (the common case — paying salting/splitting overhead on
  // uniform keys is pure loss). The decision rule is EXACT INTEGER
  // arithmetic over the profile's (n_keys, top1_cnt, n_rows) — no
  // doubles, no threshold-literal parsing — so the DuckDB oracle
  // replays the decision bit-for-bit alongside the results.

  /** The integer-exact strategy rule: ≤ `saltKeyCeiling` distinct keys
    * → "salted"; top key holding ≥ 30% of the rows (10·top1 ≥ 3·n) →
    * "aqe_split"; otherwise "plain". */
  def skewStrategy(nKeys: Long, top1Cnt: Long, nRows: Long,
      saltKeyCeiling: Long = 64): String =
    if (nKeys <= saltKeyCeiling) "salted"
    else if (10L * top1Cnt >= 3L * nRows) "aqe_split"
    else "plain"

  private def profileOf(df: DataFrame, keyCol: Column): (Long, Long, Long) = {
    val r = keySkewProfileOver(df, "k", keyCol)
      .select(col("n_keys"), col("top1_cnt"), col("n_rows")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Adaptive keyed sum/count aggregation: the profile decides between
    * [[saltedSumCount]] (q42's two-phase plan) and the plain groupBy.
    * Both branches accumulate in DECIMAL, so results are identical —
    * only the plan differs. Returns (result (key, n_rows, s1),
    * strategy-taken). */
  def adaptiveSumCount(df: DataFrame, key: String, valueExpr: Column,
      buckets: Int = 32, saltKeyCeiling: Long = 64): (DataFrame, String) = {
    val (nKeys, top1, nRows) = profileOf(df, col(key))
    val strategy = skewStrategy(nKeys, top1, nRows, saltKeyCeiling)
    val out =
      if (strategy == "salted")
        saltedSumCount(df, key, valueExpr, buckets, "s1", "n_rows")
      else
        df.groupBy(col(key)).agg(
          sum(valueExpr.cast(DecimalType(18, 4))).cast("double").as("s1"),
          count(lit(1)).as("n_rows"))
    (out.select(col(key), col("n_rows"), col("s1")), strategy)
  }

  /** Adaptive fact-fact join + rollup (the q125 shape — `sides` builds
    * (left(k, lu), right(k, ru)) in a given session): the PROBE side's
    * profile decides between a plain shuffle join and q125's AQE
    * skew-split (child session with the scaled runtime knobs, bare
    * shuffle-stage join inputs, rollup re-keyed off the join key so
    * the split stays legal). Returns ((kb = k%7, n_rows, sum_lu,
    * sum_ru), strategy-taken). */
  def adaptiveJoinAgg(spark: org.apache.spark.sql.SparkSession,
      sides: org.apache.spark.sql.SparkSession => (DataFrame, DataFrame),
      saltKeyCeiling: Long = 64): (DataFrame, String) = {
    val (l0, _) = sides(spark)
    val (nKeys, top1, nRows) = profileOf(l0, col("k"))
    val strategy = skewStrategy(nKeys, top1, nRows, saltKeyCeiling)
    val (l, r) = strategy match {
      case "aqe_split" =>
        val s = spark.newSession()
        s.conf.set("spark.sql.adaptive.enabled", "true")
        s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
        s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        sides(s)
      case _ => sides(spark)
    }
    val agg = l.join(r, "k")
      .groupBy((col("k") % 7).as("kb"))
      .agg(count(lit(1)).as("n_rows"), sum(col("lu")).as("sum_lu"),
        sum(col("ru")).as("sum_ru"))
    (agg, strategy)
  }

  /** The q125 hub-skew side builder (90% of probe rows on key 0) and
    * the uniform builder (unique event keys), shared by q185 and the
    * spec. */
  private[graft] def hubSides(dir: String)(
      s: org.apache.spark.sql.SparkSession): (DataFrame, DataFrame) = {
    val ev = Tables(s, dir).events
    (ev.select(when(col("event_id") % 10 =!= 0, lit(0L))
        .otherwise(col("event_id")).as("k"), col("user_id").as("lu")),
      ev.select(col("event_id").as("k"), col("user_id").as("ru")))
  }
  private[graft] def uniformSides(dir: String)(
      s: org.apache.spark.sql.SparkSession): (DataFrame, DataFrame) = {
    val ev = Tables(s, dir).events
    (ev.select(col("event_id").as("k"), col("user_id").as("lu")),
      ev.select(col("event_id").as("k"), col("user_id").as("ru")))
  }

  /** q185: the adaptive operators across all three regimes in one
    * driver-visible frame — a uniform-key join (→ plain), the
    * hub-skewed join (→ aqe_split, executed under the child-session
    * runtime knobs and re-homed by collect: the 7-row rollup), the
    * 3-value returnflag revenue (→ salted), and a high-cardinality
    * customer rollup (→ plain). Every branch's aggregates are exact
    * (DECIMAL / int64 < 2⁵³ before the double cast), and the strategy
    * column is integer-derived — the oracle replays decisions AND
    * results. */
  def adaptiveSkewSuite(t: Tables): DataFrame = {
    import t.spark.implicits._
    // the four regimes are INDEPENDENT and each one runs a blocking
    // profile action (plus the hub branch's re-homing collect) before
    // its result frame exists — sequential construction serialized
    // ~5 driver actions. Built concurrently (guide §2.6 overlap
    // independent jobs — the fitPq recipe), the profile scans overlap
    // and the suite's wall is the slowest branch, not the sum; each
    // branch is deterministic, so results are unchanged.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val ujF = Future(adaptiveJoinAgg(t.spark, uniformSides(t.dir)))
    val hjF = Future {
      val (hj, s) = adaptiveJoinAgg(t.spark, hubSides(t.dir))
      // the hub rollup runs in its child session (its AQE knobs live
      // there) and re-homes as 7 literal rows — the q172 recipe
      (t.spark.createDataFrame(
        java.util.Arrays.asList(hj.collect(): _*), hj.schema), s)
    }
    val lcF = Future(adaptiveSumCount(t.lineitem, "l_returnflag",
      $"l_extendedprice" * (lit(1) - $"l_discount")))
    val uaF = Future(adaptiveSumCount(t.orders, "o_custkey", $"o_totalprice"))
    val (uj, ujStrat) = Await.result(ujF, Duration.Inf)
    val (hjHome, hjStrat) = Await.result(hjF, Duration.Inf)
    val (lc, lcStrat) = Await.result(lcF, Duration.Inf)
    val (ua, uaStrat) = Await.result(uaF, Duration.Inf)
    def joinShape(df: DataFrame, regime: String, strat: String) =
      df.select(lit(regime).as("regime"), lit(strat).as("strategy"),
        col("kb").cast("string").as("k"), col("n_rows"),
        col("sum_lu").cast("double").as("s1"),
        col("sum_ru").cast("double").as("s2"))
    def aggShape(df: DataFrame, key: String, regime: String, strat: String) =
      df.select(lit(regime).as("regime"), lit(strat).as("strategy"),
        col(key).cast("string").as("k"), col("n_rows"),
        col("s1"), lit(null).cast("double").as("s2"))
    joinShape(uj, "uniform_join", ujStrat)
      .unionByName(joinShape(hjHome, "hub_join", hjStrat))
      .unionByName(aggShape(lc, "l_returnflag", "lowcard_agg", lcStrat))
      .unionByName(aggShape(ua, "o_custkey", "uniform_agg", uaStrat))
      .orderBy($"regime", $"k")
  }
}
