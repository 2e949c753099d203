package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond windows/as-of: funnel completion and
  * exponentially-weighted features — the per-user sequential semantics
  * a behavioral feature pipeline derives before training. Timestamps
  * are compared as exact microsecond longs; doubles only appear in the
  * EWMA fold, which both engines evaluate in the same order
  * (sorted-list fold ↔ `list_reduce(list(... ORDER BY ...))`).
  */
object EventOps {

  /** q69: three-step funnel per user — first signup, first click
    * AFTER that signup, first purchase AFTER that click. Three narrow
    * conditional aggregations joined on user_id (each shuffles one
    * long per user); -1 marks an uncompleted step, `steps` counts the
    * completed prefix. */
  def funnel(t: Tables): DataFrame = {
    import t.spark.implicits._
    val ev = t.events.select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
    val signup = ev.groupBy($"user_id")
      .agg(min(when($"event_type" === "signup", $"ts_us")).as("signup_us"))
    val click = ev.join(signup, "user_id")
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "click" && $"ts_us" > $"signup_us", $"ts_us"))
        .as("click_us"), min($"signup_us").as("signup_us"))
    val purchase = ev.join(click, "user_id")
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "purchase" && $"ts_us" > $"click_us", $"ts_us"))
        .as("purchase_us"),
        min($"signup_us").as("signup_us"), min($"click_us").as("click_us"))
    purchase.select($"user_id",
      coalesce($"signup_us", lit(-1L)).as("signup_us"),
      coalesce($"click_us", lit(-1L)).as("click_us"),
      coalesce($"purchase_us", lit(-1L)).as("purchase_us"),
      (when($"signup_us".isNotNull, 1).otherwise(0) +
        when($"click_us".isNotNull, 1).otherwise(0) +
        when($"purchase_us".isNotNull, 1).otherwise(0)).as("steps"))
      .orderBy($"user_id")
  }

  /** q70: exponentially-weighted moving average of `value` per user
    * (α = 0.5), folded in (ts, event_id) order. The sequential fold is
    * the oracle-parity formulation (sort_array(collect_list) ↔
    * `list(value ORDER BY ...)` + list_reduce — bit-identical
    * doubles); an unbounded stream would instead keep EWMA as
    * mapGroupsWithState (graft.streaming). */
  def ewmaPerUser(t: Tables, alpha: Double = 0.5): DataFrame = {
    import t.spark.implicits._
    val ordered = t.events
      .select($"user_id", struct(unix_micros($"ts").as("ts_us"), $"event_id",
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
}
