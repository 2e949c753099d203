package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark lacks natively,
  * composed from built-ins via the union+window technique rather than
  * an O(|L|·|R|) range join:
  *
  *   1. Tag both sides and union on (key, ts) — one dataset.
  *   2. Sort within key by (ts, tag) — a single shuffle on the key,
  *      then a partition-local sort (exactly a sort-merge join's cost).
  *   3. `last_value(right-payload) IGNORE NULLS` over rows unbounded
  *      preceding carries the most recent right row forward.
  *   4. Keep left rows; each now holds its as-of match.
  *
  * Scale: one shuffle of |L|+|R| rows on the join key; no pair
  * explosion, skew handled by AQE like any sort-merge join. Matches
  * DuckDB's native `ASOF JOIN` semantics (inclusive: a right row at
  * the same timestamp matches), which is the oracle for q40.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * rightTs <= leftTs within the same key. Output: left columns +
    * `asof_<rightValue>` + `asof_ts`. */
  def joinPrior(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      leftValue: String, rightValue: String): DataFrame = {
    // the right payload travels as ONE struct (null only on left
    // rows), so the carried (value, ts) pair always comes from the
    // SAME right row — two independent ignoreNulls carries could pair
    // an older non-null value with a newer null-valued row's
    // timestamp, diverging from ASOF semantics on nullable payloads
    val rStructType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", right.schema(rightValue).dataType),
      org.apache.spark.sql.types.StructField("t", right.schema(rightTs).dataType)))
    val l = left.select(
      col(key).as("k"), col(leftTs).as("ts"),
      col(leftValue).as("l_val"),
      lit(null).cast(rStructType).as("r"),
      lit(1).as("tag"))
    val r = right.select(
      col(key).as("k"), col(rightTs).as("ts"),
      lit(null).cast(left.schema(leftValue).dataType).as("l_val"),
      struct(col(rightValue).as("v"), col(rightTs).as("t")).as("r"),
      lit(0).as("tag"))
    // tag 0 (right) sorts before tag 1 (left) at equal ts → inclusive.
    val w = Window.partitionBy(col("k")).orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof", last(col("r"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("k").as(key), col("ts").as(leftTs),
        col("l_val").as(leftValue),
        col("asof.v").as("asof_val"), col("asof.t").as("asof_ts"))
  }

  /** Staleness-bounded as-of join — the feature-store variant of
    * [[joinPrior]]: a match older than `maxAgeUs` is DISCARDED (both
    * value and timestamp null), because a point-in-time feature
    * lookup must not serve arbitrarily stale state — the standard
    * "max staleness" contract of online feature serving. Same
    * union+window cost as joinPrior (one shuffle of |L|+|R| on the
    * key); the tolerance is one per-row integer-µs comparison after
    * the carry, so the bound adds NO plan weight. Matches DuckDB
    * `ASOF JOIN` + a CASE age guard (q174's oracle). */
  def joinPriorWithin(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      leftValue: String, rightValue: String, maxAgeUs: Long): DataFrame = {
    require(maxAgeUs >= 0, s"maxAgeUs must be >= 0: $maxAgeUs")
    import graft.functions.TimeFunctions.tsMicros
    val fresh = tsMicros(col(leftTs)) - tsMicros(col("asof_ts")) <= maxAgeUs
    joinPrior(left, right, key, leftTs, rightTs, leftValue, rightValue)
      .select(col(key), col(leftTs), col(leftValue),
        when(fresh, col("asof_val")).as("asof_val"),
        when(fresh, col("asof_ts")).as("asof_ts"))
  }

  /** q174: each error matched to the latest prior click by the same
    * user ONLY if that click is at most 6 hours old — errors whose
    * last click is staler surface unmatched (sentinel convention of
    * q40). */
  def errorsAfterFreshClicks(t: Tables, maxAgeHours: Int = 6): DataFrame = {
    import t.spark.implicits._
    val ev = t.events
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    joinPriorWithin(errors, clicks, "user_id", "ts", "ts",
        "event_id", "event_id", maxAgeHours.toLong * 3600L * 1000000L)
      .select($"user_id", $"event_id".as("error_id"),
        coalesce($"asof_val", lit(-1L)).as("click_id"),
        coalesce($"asof_ts", lit("1970-01-01 00:00:00").cast("timestamp")).as("click_ts"))
      .orderBy($"user_id", $"error_id")
  }

  /** q40: for each error event, the most recent prior-or-simultaneous
    * click by the same user (classic diagnostics query). */
  def errorsAfterClicks(t: Tables): DataFrame = {
    import t.spark.implicits._
    val ev = t.events
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    joinPrior(errors, clicks, "user_id", "ts", "ts", "event_id", "event_id")
      .select($"user_id", $"event_id".as("error_id"),
        coalesce($"asof_val", lit(-1L)).as("click_id"),
        coalesce($"asof_ts", lit("1970-01-01 00:00:00").cast("timestamp")).as("click_ts"))
      .orderBy($"user_id", $"error_id")
  }
}
