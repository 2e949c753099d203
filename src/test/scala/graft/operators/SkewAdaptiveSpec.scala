package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q185: the skew-adaptive operators — each branch fires on its
  * regime (plan-asserted), and every branch's result is identical to
  * the plain formulation (the mitigation must change nothing). */
class SkewAdaptiveSpec extends SparkSpec {

  test("the strategy rule's integer boundaries") {
    assert(Skew.skewStrategy(64, 1, 1000) === "salted")
    assert(Skew.skewStrategy(65, 300, 1000) === "aqe_split") // exactly 30%
    assert(Skew.skewStrategy(65, 299, 1000) === "plain")
    assert(Skew.skewStrategy(3, 900, 1000) === "salted") // salt wins first
  }

  test("uniform join takes the plain branch — no skew split, no salt") {
    val (uj, strat) = Skew.adaptiveJoinAgg(spark, Skew.uniformSides(sf001.dir))
    assert(strat === "plain")
    uj.collect()
    val plan = uj.queryExecution.executedPlan.toString
    assert(!plan.contains("skew=true"), s"uniform regime must not split:\n$plan")
    assert(!plan.contains("_salt"), s"uniform regime must not salt:\n$plan")
  }

  test("hub-skewed join takes the AQE-split branch and the split fires") {
    // sf0.01: the child session's 32k skew threshold is scaled for it
    // (the q125 assert's fixture) — at sf0.001 the hub partition is
    // too small to mark, though the branch DECISION is identical
    val dir = "/root/testdata/sf0.01"
    val (hj, strat) = Skew.adaptiveJoinAgg(spark, Skew.hubSides(dir))
    assert(strat === "aqe_split")
    hj.collect()
    val plan = hj.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
    assert(plan.contains("skew=true"), s"no skew split in the hub regime:\n$plan")
    // the split changed nothing: equal to the plain-session rollup
    val (l, r) = Skew.uniformSides(dir)(spark)
    val hub = l.select(
      when(col("k") % 10 =!= 0, lit(0L)).otherwise(col("k")).as("k"), col("lu"))
    val plain = hub.join(r, "k")
      .groupBy((col("k") % 7).as("kb"))
      .agg(count(lit(1)).as("n_rows"), sum(col("lu")).as("sum_lu"),
        sum(col("ru")).as("sum_ru"))
    assert(hj.exceptAll(plain).isEmpty && plain.exceptAll(hj).isEmpty,
      "the AQE split changed the rollup")
  }

  test("low-cardinality key takes the salted branch, equal to plain groupBy") {
    import spark.implicits._
    val (lc, strat) = Skew.adaptiveSumCount(sf001.lineitem, "l_returnflag",
      $"l_extendedprice" * (lit(1) - $"l_discount"))
    assert(strat === "salted")
    lc.collect()
    val plan = lc.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"expected the salted two-phase plan:\n$plan")
    val plain = sf001.lineitem.groupBy($"l_returnflag").agg(
      count(lit(1)).as("n_rows"),
      sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
        .cast("double").as("s1"))
      .select($"l_returnflag", $"n_rows", $"s1")
    assert(lc.exceptAll(plain).isEmpty && plain.exceptAll(lc).isEmpty,
      "salting changed the aggregate")
  }

  test("high-cardinality key takes the plain branch") {
    import spark.implicits._
    val (ua, strat) = Skew.adaptiveSumCount(sf001.orders, "o_custkey",
      $"o_totalprice")
    assert(strat === "plain")
    ua.collect()
    assert(!ua.queryExecution.executedPlan.toString.contains("_salt"))
  }

  test("q185 fixture emits all four regimes with their strategies") {
    val r = Skew.adaptiveSkewSuite(sf001)
      .select(col("regime"), col("strategy")).distinct().collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r === Map("uniform_join" -> "plain", "hub_join" -> "aqe_split",
      "lowcard_agg" -> "salted", "uniform_agg" -> "plain"))
  }
}
