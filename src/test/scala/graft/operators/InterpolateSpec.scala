package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q169: linear-interpolation resampling — bracket selection,
  * exact-hit and boundary semantics, tie canonicalization, and the
  * one-exchange plan for both window directions. */
class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  private def run(obs: Seq[(Long, Long, Double, Long)],
      grid: Seq[(Long, Long)]) = {
    val o = obs.toDF("user_id", "us", "value", "event_id")
    val g = grid.toDF("key", "us")
    EventOps.interpolateResampleOver(o, $"user_id", $"us", $"value",
        $"event_id", g)
      .orderBy($"key", $"us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
  }

  test("hand computation: midpoint, exact hit, out-of-span NULLs") {
    // user 1 observes v=10 @ 100, v=30 @ 200
    val got = run(
      obs = Seq((1L, 100L, 10.0, 1L), (1L, 200L, 30.0, 2L)),
      grid = Seq((1L, 50L), (1L, 100L), (1L, 150L), (1L, 175L),
        (1L, 200L), (1L, 300L)))
    assert(got(0)._3.isNaN, "before first observation must be NULL")
    assert(got(1) === ((1L, 100L, 10.0)), "exact hit returns the observation")
    assert(got(2) === ((1L, 150L, 20.0)), "midpoint")
    assert(got(3) === ((1L, 175L, 25.0)), "3/4 point")
    assert(got(4) === ((1L, 200L, 30.0)),
      "grid on the LAST observation takes the t0 = t leg")
    assert(got(5)._3.isNaN, "after last observation must be NULL")
  }

  test("coincident observations canonicalize on min event_id") {
    // two observations at us=100 — event 1 (v=10) must win over
    // event 2 (v=99); single-observation user: only the exact hit is
    // non-NULL
    val got = run(
      obs = Seq((1L, 100L, 10.0, 1L), (1L, 100L, 99.0, 2L)),
      grid = Seq((1L, 100L), (1L, 101L)))
    assert(got(0) === ((1L, 100L, 10.0)))
    assert(got(1)._3.isNaN)
  }

  test("users interpolate independently") {
    val got = run(
      obs = Seq((1L, 0L, 0.0, 1L), (1L, 10L, 100.0, 2L),
        (2L, 0L, 50.0, 3L), (2L, 10L, 50.0, 4L)),
      grid = Seq((1L, 5L), (2L, 5L)))
    assert(got.toSeq === Seq((1L, 5L, 50.0), (2L, 5L, 50.0)))
  }

  test("fixture: interpolated values sit within their bracket envelope") {
    val r = EventOps.interpolateResample(sf001)
    assert(r.count() > 0)
    // linear interpolation never leaves [min, max] of the values
    val Array(mn, mx) = sf001.events.agg(min($"value"), max($"value"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(r.filter($"v_interp" < mn || $"v_interp" > mx).count() === 0)
    // and a grid point sitting exactly on an observation reproduces it
    // for at least the span endpoints is covered by the hand tests;
    // here check NULLs only appear outside each user's observed span
    val spans = sf001.events.groupBy($"user_id")
      .agg(min(graft.functions.TimeFunctions.tsMicros($"ts")).as("lo"),
        max(graft.functions.TimeFunctions.tsMicros($"ts")).as("hi"))
    val bad = r.join(spans, "user_id")
      .filter($"v_interp".isNull &&
        graft.functions.TimeFunctions.tsMicros($"grid_ts").between($"lo", $"hi"))
      .count()
    assert(bad === 0, "NULL inside an observed span")
  }

  test("plan: both bracket directions share one exchange + sort") {
    val o = Seq((1L, 100L, 10.0, 1L)).toDF("user_id", "us", "value", "event_id")
    val g = Seq((1L, 50L)).toDF("key", "us")
    val plan = EventOps.interpolateResampleOver(o, $"user_id", $"us",
        $"value", $"event_id", g)
      .queryExecution.executedPlan.toString
    // exchanges: the obs canonicalization agg + ONE for the window
    // pair (the union is partition-local)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"window directions must share the exchange:\n$plan")
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(sorts <= 2, s"expected at most two sorts (agg-side + window):\n$plan")
  }
}
