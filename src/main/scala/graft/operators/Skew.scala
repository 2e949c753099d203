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
}
