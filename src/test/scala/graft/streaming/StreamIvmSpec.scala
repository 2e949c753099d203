package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q177: streaming view maintenance — the foreachBatch fold must equal
  * the from-scratch aggregate regardless of micro-batch chunking. */
class StreamIvmSpec extends SparkSpec {

  test("streamed rollup equals the one-shot aggregation") {
    import spark.implicits._
    val streamed = StreamIvm.orderRollup(spark, sf001.dir)
    val truth = sf001.orders
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).cast("double")
          / 100.0).as("total_price"),
        (min(floor($"o_totalprice" * 100 + 0.5).cast("long")).cast("double")
          / 100.0).as("min_price"),
        (max(floor($"o_totalprice" * 100 + 0.5).cast("long")).cast("double")
          / 100.0).as("max_price"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(truth).isEmpty && truth.exceptAll(streamed).isEmpty,
      "streamed view fold diverges from one-shot aggregation")
  }

  // ── retractable streaming fold (q187) ──────────────────────────────

  test("streamed retractable fold equals one-shot batch retraction") {
    import graft.operators.Ivm
    val facts = Ivm.orderFacts(sf001)
      .filter(col("fkey") < StreamIvm.MaxStreamOrderKey)
    val delta = Ivm.orderFactDeltaOf(facts)
    val oneShot = Ivm.mergeDeltaRetractFrames(delta,
        Ivm.partials(facts, col("key"), col("q")), facts)
      .select(col("key").as("o_custkey"), col("n").as("n_orders"),
        (col("s").cast("double") / 100.0).as("total_price"),
        (col("mn").cast("double") / 100.0).as("min_price"),
        (col("mx").cast("double") / 100.0).as("max_price"))
    val streamed = StreamIvm.orderRollupRetract(spark, sf001.dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).isEmpty && oneShot.exceptAll(streamed).isEmpty,
      "micro-batched retractable fold diverges from the one-shot batch fold")
  }

  test("streamed retractable fold equals the scratch aggregate over survivors") {
    import spark.implicits._
    import graft.operators.Ivm
    val facts = Ivm.orderFacts(sf001)
      .filter(col("fkey") < StreamIvm.MaxStreamOrderKey)
    // replay the delta arithmetic: D drops, reprice-U +12345, move-U
    // key+1, I appends q+55 — the oracle's surviving-facts world
    val surv = facts.filter($"fkey" % 97 =!= 0)
      .select(
        when($"fkey" % 97 === 2, $"key" + 1).otherwise($"key").as("key"),
        when($"fkey" % 97 === 1, $"q" + 12345L).otherwise($"q").as("q"))
      .unionByName(facts.filter($"fkey" % 97 === 3)
        .select($"key", ($"q" + 55L).as("q")))
    val truth = surv.groupBy($"key".as("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        (sum($"q").cast("double") / 100.0).as("total_price"),
        (min($"q").cast("double") / 100.0).as("min_price"),
        (max($"q").cast("double") / 100.0).as("max_price"))
    val streamed = StreamIvm.orderRollupRetract(spark, sf001.dir)
    assert(streamed.exceptAll(truth).isEmpty && truth.exceptAll(streamed).isEmpty,
      "streamed retractable fold diverges from the surviving-facts aggregate")
  }

  // ── streaming dimension-move fold (q199) ───────────────────────────

  test("streamed dim-move fold equals the one-shot batch fold") {
    val oneShot = graft.operators.Ivm.nationRevenueDimMove(sf001)
    val streamed = StreamIvm.nationRevenueDimMoveStream(spark, sf001.dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "micro-batched dim-move fold diverges from the one-shot fold")
  }

  // ── streaming multi-measure fold (q207) ────────────────────────────

  test("streamed multi-measure fold equals the one-shot merge over the slice") {
    import spark.implicits._
    import graft.operators.MultiIvm
    val Ms = Seq("cents", "units")
    val Ds = Seq("prio")
    val facts = MultiIvm.orderMultiFacts(sf001)
      .filter(col("fkey") < StreamIvm.MaxStreamOrderKey)
    val view = MultiIvm.multiPartials(facts, Ms, Ds)
    val mult = facts.groupBy($"key", $"prio".as("v"))
      .agg(count(lit(1)).as("m"))
    val oneShotRaw = MultiIvm.mergeMultiDeltaFrames(
      MultiIvm.orderMultiDelta(facts), Ms, Ds, view, Map("prio" -> mult))
    val S = 1L << 30
    val nD = col("n").cast("double")
    val sD = col("s_cents").cast("double")
    val ssq = col("ssh_cents").cast("double") * lit(S.toDouble) +
      col("ssl_cents").cast("double")
    val oneShot = oneShotRaw.select($"key".as("o_custkey"),
      $"n".as("n_orders"), (sD / 100.0).as("total_price"),
      ((sD / 100.0) / nD).as("avg_price"),
      (((ssq - sD * sD / nD) / nD) / 10000.0).as("var_price"),
      $"s_units".as("sum_units"), $"cd_prio".as("n_priorities"))
    val streamed = StreamIvm.multiMeasureStream(spark, sf001.dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "micro-batched multi-measure fold diverges from the one-shot merge")
  }

  // ── streaming multi-measure dim-move fold (q211) ────────────────────

  test("streamed multi-measure dim-move fold equals the one-shot fold") {
    val oneShot = graft.operators.MultiIvm.multiMeasureDimMove(sf001)
    val streamed = StreamIvm.multiMeasureDimMoveStream(spark, sf001.dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "micro-batched multi-measure dim-move diverges from the one-shot fold")
  }

  // ── streaming FULL (min/max) dim-move fold (q214) ───────────────────

  test("streamed full dim-move fold equals the one-shot full fold") {
    val oneShot = graft.operators.MultiIvm.multiMeasureDimMoveFull(sf001)
    val streamed = StreamIvm.multiMeasureDimMoveFullStream(spark, sf001.dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "micro-batched full dim-move diverges from the one-shot fold")
  }
}
