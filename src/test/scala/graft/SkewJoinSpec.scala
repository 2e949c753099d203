package graft

import org.apache.spark.sql.functions._

/** The runtime skew path: at 100× a hub-skewed fact-fact join must
  * not serialize on one reducer. q42 demonstrates MANUAL salting (the
  * strategy you reach for when the hub keys are known up front); this
  * spec pins the complementary RUNTIME path a 1000-executor job leans
  * on when skew is data-dependent — AQE's `OptimizeSkewedJoin`
  * observing the map-output statistics, declaring the hub partition
  * skewed (size > factor × median and > threshold), and splitting it
  * into parallel sub-joins with the matching build-side partition
  * duplicated.
  *
  * The thresholds are scaled down to fixture bytes (32 KiB where a
  * cluster default is 256 MiB) — what is being asserted is the
  * MECHANISM (detection + split + unchanged results), which is
  * size-ratio-driven and carries to any scale.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE detects and splits the hub partition of a skewed join") {
    // child session: AQE skew knobs must not leak into the shared spec
    // session (plan-audit suites pin exact plan shapes there)
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    // coalescing off so the skew decision reads raw partition sizes
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // force a sort-merge join: broadcasting the dim side would dodge
    // the skew entirely (and IS the right fix when one side is small —
    // this spec is about the fact-fact case where it isn't)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._

    // hub-skew over the events fixture: 90% of left rows collapse
    // onto key 0 — one reducer partition ~9× the median
    val ev = Tables(s, "/root/testdata/sf0.01").events
    val left = ev.select(
      when($"event_id" % 10 =!= 0, lit(0L)).otherwise($"event_id").as("k"),
      $"value")
    val right = ev.select(($"event_id" % 100).as("k"), $"user_id")
    val joined = left.join(right, "k")

    // execute THIS query execution so its AdaptiveSparkPlanExec
    // finalizes in place, then read the runtime plan back
    val qe = joined.queryExecution
    val got = qe.toRdd.count()
    val plan = qe.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"OptimizeSkewedJoin did not fire — no skew=true in the adaptive plan:\n$plan")

    // the split must not change results: row count == Σ_k |L_k|·|R_k|
    val want = left.groupBy("k").agg(count(lit(1)).as("ln"))
      .join(right.groupBy("k").agg(count(lit(1)).as("rn")), "k")
      .agg(sum($"ln" * $"rn")).head.getLong(0)
    assert(got == want, s"skew-split join changed the result: $got != $want")

    // the skewed side's runtime shuffle read must be marked, and the
    // hub must actually have been subdivided: with the hub split into
    // k sub-joins the executed join has (partitions - 1) + k tasks —
    // strictly more than the static reducer count. That extra task
    // count IS the task-time-spread fix (one ~9×-median task becomes
    // ~9 median-sized tasks running in parallel).
    assert(plan.contains("AQEShuffleRead skewed"),
      s"skewed shuffle read not marked:\n$plan")
    val tasks = qe.toRdd.getNumPartitions
    assert(tasks > 8,
      s"hub partition was not subdivided: $tasks tasks for 8 static reducers:\n$plan")
  }

  test("q125 (driver-visible skew join) fires the split in its own executed plan") {
    // the promoted query carries its AQE knobs in a child session —
    // assert the mechanism actually engages when the DRIVER runs it,
    // not only in this suite's hand-built workload
    val df = SparkEntry.queries("q125_skew_join")(spark, "/root/testdata/sf0.01")
    val qe = df.queryExecution
    qe.toRdd.count(): Unit
    val plan = qe.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"q125 executed without a skew split:\n$plan")
    assert(plan.contains("AQEShuffleRead skewed"),
      s"q125's skewed shuffle read not marked:\n$plan")
    // and the parent session's confs were not touched by the child
    assert(spark.conf.getOption(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      .forall(_ != "32k"))
  }
}
