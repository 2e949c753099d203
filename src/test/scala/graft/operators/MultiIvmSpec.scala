package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q200: multi-measure IVM — merge ≡ from-scratch over survivors,
  * multiplicity-index count-distinct transitions, chunked fold
  * associativity, phantom retraction raises, and the no-persisted-row-
  * crosses-an-exchange plan contract. */
class MultiIvmSpec extends SparkSpec {

  private val Ms = Seq("cents", "units")
  private val Ds = Seq("prio")

  private def facts = MultiIvm.orderMultiFacts(sf001)

  private def scratchOver(f: DataFrame) =
    MultiIvm.multiPartials(f, Ms, Ds)

  /** The post-delta surviving facts, derived independently of the
    * merge algebra (replays the residue recipe row-wise). */
  private def survivors: DataFrame = {
    val f = facts
    f.filter(col("fkey") % 97 =!= 0)
      .select(
        when(col("fkey") % 97 === 2, col("key") + 1).otherwise(col("key")).as("key"),
        (col("cents") + when(col("fkey") % 97 === 1, 12345L).otherwise(0L)).as("cents"),
        col("units"),
        when(col("fkey") % 97 === 1, "9-REPRICED").otherwise(col("prio")).as("prio"))
      .unionByName(f.filter(col("fkey") % 97 === 3)
        .select(col("key"), (col("cents") + 55L).as("cents"),
          (col("units") + 3L).as("units"), lit("0-NEW").as("prio")))
      .withColumn("fkey", lit(0L)).select("fkey", "key", "cents", "units", "prio")
  }

  test("merged multi-measure view equals the from-scratch aggregate over survivors") {
    MultiIvm.buildMultiView(facts, Ms, Ds, "graft_test_mivm")
    val merged = MultiIvm.mergeMultiDelta(
      MultiIvm.orderMultiDelta(facts), Ms, Ds, "graft_test_mivm")
    val scratch = scratchOver(survivors)
    assert(merged.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(merged).isEmpty,
      "multi-measure merge diverges from the scratch aggregate")
  }

  test("count-distinct transitions on a hand fixture: drop-to-zero, new value, move") {
    import spark.implicits._
    // group A holds values {x:2, y:1}; group B holds {x:1}
    val base = Seq(
      (1L, "A", 10L, 1L, "x"), (2L, "A", 20L, 2L, "x"),
      (3L, "A", 30L, 3L, "y"), (4L, "B", 40L, 4L, "x"))
      .toDF("fkey", "key", "cents", "units", "prio")
    val view = scratchOver(base)
    val mult = base.groupBy($"key", $"prio".as("v"))
      .agg(count(lit(1)).as("m"))
    val nl = lit(null).cast("long")
    val ns = lit(null).cast("string")
    // delete fkey 3 (A loses its last 'y' → cd 2→1), move fkey 4 to A
    // (B empties; A's 'x' multiplicity 2→3, cd unchanged), insert a
    // 'z' into A (cd 1→... after delete: {x}∪{z} = 2)
    val delta = Seq(3L, 4L, 5L).toDF("fkey")
      .withColumn("change",
        when($"fkey" === 3, "D").when($"fkey" === 4, "U").otherwise("I"))
      .withColumn("key_old",
        when($"fkey" === 3, "A").when($"fkey" === 4, "B").otherwise(ns))
      .withColumn("key_new", when($"fkey" === 3, ns).otherwise("A"))
      .withColumn("old_cents",
        when($"fkey" === 3, 30L).when($"fkey" === 4, 40L).otherwise(nl))
      .withColumn("new_cents",
        when($"fkey" === 4, 40L).when($"fkey" === 5, 50L).otherwise(nl))
      .withColumn("old_units",
        when($"fkey" === 3, 3L).when($"fkey" === 4, 4L).otherwise(nl))
      .withColumn("new_units",
        when($"fkey" === 4, 4L).when($"fkey" === 5, 5L).otherwise(nl))
      .withColumn("old_prio",
        when($"fkey" === 3, "y").when($"fkey" === 4, "x").otherwise(ns))
      .withColumn("new_prio", when($"fkey" === 3, ns).otherwise(
        when($"fkey" === 4, "x").otherwise("z")))
    val merged = MultiIvm.mergeMultiDeltaFrames(delta, Ms, Ds, view,
      Map("prio" -> mult))
    val got = merged.orderBy("key")
      .select("key", "n", "s_cents", "s_units", "cd_prio")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    // A: rows {10x, 20x, 40x(moved), 50z} → n=4, s=120, u=1+2+4+5=12, cd={x,z}=2
    assert(got === List(("A", 4L, 120L, 12L, 2L)), s"got $got")
  }

  test("chunked multiplicity fold equals one-shot (associativity)") {
    MultiIvm.buildMultiView(facts, Ms, Ds, "graft_test_mivm_assoc")
    val delta = MultiIvm.orderMultiDelta(facts)
    val mult = spark.table("graft_test_mivm_assoc_mult_prio")
    val oneShot = MultiIvm.updatedMultiplicities(delta, mult, "prio")
    // chunk by fkey parity; chunk 2 folds into chunk 1's rolled-forward
    // sidecar (untouched-by-1 keys' rows pass through via the union of
    // the untouched slice — the write-back a production roll does)
    val d1 = delta.filter(col("fkey") % 2 === 0)
    val d2 = delta.filter(col("fkey") % 2 === 1)
    val touched1 = d1.select(col("key_old").as("key"))
      .where(col("key_old").isNotNull)
      .unionByName(d1.select(col("key_new").as("key"))
        .where(col("key_new").isNotNull)).distinct()
    val rolled1 = mult.join(touched1, Seq("key"), "left_anti")
      .unionByName(MultiIvm.updatedMultiplicities(d1, mult, "prio"))
    val twoStep = MultiIvm.updatedMultiplicities(d2, rolled1, "prio")
    // compare on the union of both steps' touched keys (the one-shot
    // result only carries ITS touched keys)
    val touchedAll = delta.select(col("key_old").as("key"))
      .where(col("key_old").isNotNull)
      .unionByName(delta.select(col("key_new").as("key"))
        .where(col("key_new").isNotNull)).distinct()
    val touched2 = d2.select(col("key_old").as("key"))
      .where(col("key_old").isNotNull)
      .unionByName(d2.select(col("key_new").as("key"))
        .where(col("key_new").isNotNull)).distinct()
    // keys updated by step 1 and untouched by step 2 keep step 1's
    // rows; step-2-touched keys take step 2's
    val a = rolled1.join(touched2, Seq("key"), "left_anti")
      .unionByName(twoStep)
      .join(touchedAll, Seq("key"), "left_semi")
    val b = oneShot
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "two-chunk multiplicity fold diverges from one-shot")
  }

  test("phantom retractions fail loudly: count below zero, multiplicity below zero") {
    import spark.implicits._
    val base = Seq((1L, "A", 10L, 1L, "x"))
      .toDF("fkey", "key", "cents", "units", "prio")
    val view = scratchOver(base)
    val mult = base.groupBy($"key", $"prio".as("v"))
      .agg(count(lit(1)).as("m"))
    val nl = lit(null).cast("long")
    val ns = lit(null).cast("string")
    // deleting a value the group never held → multiplicity raise
    val badVal = Seq((9L, "D", "A", null: String))
      .toDF("fkey", "change", "key_old", "key_new")
      .withColumn("old_cents", lit(10L)).withColumn("new_cents", nl)
      .withColumn("old_units", lit(1L)).withColumn("new_units", nl)
      .withColumn("old_prio", lit("NOPE")).withColumn("new_prio", ns)
    val e1 = intercept[Exception] {
      MultiIvm.mergeMultiDeltaFrames(badVal, Ms, Ds, view,
        Map("prio" -> mult)).collect()
    }
    assert(e1.toString.contains("negative multiplicity") ||
      (e1.getCause != null &&
        e1.getCause.toString.contains("negative multiplicity")),
      s"expected the multiplicity raise, got: $e1")
    // deleting two facts from a one-fact group → count raise
    val badN = Seq((8L, "D", "B", null: String), (9L, "D", "B", null: String))
      .toDF("fkey", "change", "key_old", "key_new")
      .withColumn("old_cents", lit(10L)).withColumn("new_cents", nl)
      .withColumn("old_units", lit(1L)).withColumn("new_units", nl)
      .withColumn("old_prio", lit("x")).withColumn("new_prio", ns)
    val viewB = scratchOver(Seq((1L, "B", 10L, 1L, "x"))
      .toDF("fkey", "key", "cents", "units", "prio"))
    val e2 = intercept[Exception] {
      MultiIvm.mergeMultiDeltaFrames(badN, Ms, Ds, viewB,
        Map("prio" -> Seq(("B", "x", 1L)).toDF("key", "v", "m")))
        .collect()
    }
    assert(e2.toString.contains("negative") ||
      (e2.getCause != null && e2.getCause.toString.contains("negative")),
      s"expected a negative raise, got: $e2")
  }

  test("q206: dim-move merge equals the post-move scratch aggregate") {
    import spark.implicits._
    val got = MultiIvm.multiMeasureDimMove(sf001)
    val cents = floor($"o_totalprice" * 100 + 0.5).cast("long")
    val sq = cents * cents
    val moved = sf001.customer.select($"c_custkey",
      when($"c_custkey" % 89 === 0, ($"c_nationkey" + 7) % 25)
        .otherwise($"c_nationkey").as("nk"))
    val f = sf001.orders
      .join(moved, $"o_custkey" === $"c_custkey")
      .join(sf001.nation, $"nk" === $"n_nationkey")
      .select($"n_name", cents.as("q"), ($"o_orderkey" % 1000).as("u"),
        $"o_orderpriority".as("p"))
    val nD = count(lit(1)).cast("double")
    val sD = sum($"q").cast("double")
    val ssqD = (sum(shiftright($"q" * $"q", 30)).cast("double") *
      1073741824.0 + sum(($"q" * $"q").bitwiseAND(lit((1L << 30) - 1)))
        .cast("double"))
    val truth = f.groupBy($"n_name")
      .agg(count(lit(1)).as("n_orders"),
        (sD / 100.0).as("total_price"),
        ((sD / 100.0) / nD).as("avg_price"),
        (((ssqD - sD * sD / nD) / nD) / 10000.0).as("var_price"),
        sum($"u").as("sum_units"),
        count_distinct($"p").as("n_priorities"))
    assert(got.count() > 0)
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
      "multi-measure dim-move diverges from the post-move scratch rollup")
    // no fact scan: an orders read would surface its columns in the
    // plan (the output alias n_orders makes a bare "orders" grep
    // useless here)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("o_totalprice") && !plan.contains("o_orderkey"),
      s"the fact table must be out of the dim-move loop:\n$plan")
  }

  test("dim-move hand fixture: multiplicity vector transfer moves the distinct count") {
    import spark.implicits._
    // per-key state: key 1 (group A) holds {x:2}; key 2 (group A)
    // holds {y:1}; key 3 (group B) holds {x:1}
    val base = Seq(
      (10L, 1L, 10L, 1L, "x"), (11L, 1L, 20L, 2L, "x"),
      (12L, 2L, 30L, 3L, "y"), (13L, 3L, 40L, 4L, "x"))
      .toDF("fkey", "key", "cents", "units", "prio")
    MultiIvm.buildMultiView(base, Seq("cents", "units"), Seq("prio"),
      "graft_test_mivm_dm")
    val mapping = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("key", "g")
    val perKey = spark.table("graft_test_mivm_dm")
    val gmult = spark.table("graft_test_mivm_dm_mult_prio")
      .join(mapping, Seq("key")).groupBy($"g", $"v")
      .agg(sum($"m").as("m"))
    val view = perKey.join(mapping, Seq("key")).groupBy($"g")
      .agg(sum($"n").as("n"), sum($"s_cents").as("s_cents"),
        sum($"ssh_cents").as("ssh_cents"), sum($"ssl_cents").as("ssl_cents"),
        sum($"s_units").as("s_units"), sum($"ssh_units").as("ssh_units"),
        sum($"ssl_units").as("ssl_units"))
      .join(gmult.groupBy($"g").agg(count(lit(1)).as("cd_prio")), Seq("g"))
      .select("g", "n", "s_cents", "ssh_cents", "ssl_cents",
        "s_units", "ssh_units", "ssl_units", "cd_prio")
    // key 1 moves A → B: A loses both 'x' facts (cd 2→1, only 'y'
    // left), B gains them ('x' multiplicity 1→3, cd stays 1)
    val delta = Seq((1L, "A", "B")).toDF("key", "g_old", "g_new")
    val got = MultiIvm.mergeMultiDimMove(view, Map("prio" -> gmult),
      "graft_test_mivm_dm", delta, Seq("cents", "units"), Seq("prio"))
      .orderBy("g")
      .select("g", "n", "s_cents", "s_units", "cd_prio")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(got === List(("A", 1L, 30L, 3L, 1L), ("B", 3L, 70L, 7L, 1L)),
      s"got $got")
  }

  // ── q209/q212: the FULL algebra (min/max) ───────────────────────────

  test("q209: full merge equals the from-scratch aggregate incl. min/max") {
    MultiIvm.buildMultiViewFull(facts, Ms, Ds, "graft_test_mivmf")
    val merged = MultiIvm.mergeMultiDeltaFull(
      MultiIvm.orderMultiDelta(facts), Ms, Ds, "graft_test_mivmf")
    val scratch = MultiIvm.multiPartialsFull(survivors, Ms, Ds)
    assert(merged.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(merged).isEmpty,
      "full multi-measure merge diverges from the scratch aggregate")
  }

  test("full merge: two-chunk fold equals one-shot (min/max re-derivation composes)") {
    import spark.implicits._
    MultiIvm.buildMultiViewFull(facts, Ms, Ds, "graft_test_mivmf_assoc")
    val delta = MultiIvm.orderMultiDelta(facts)
    val view = spark.table("graft_test_mivmf_assoc")
    val mult = spark.table("graft_test_mivmf_assoc_mult_prio")
    val factIdx = spark.table("graft_test_mivmf_assoc_facts")
    val oneShot = MultiIvm.mergeMultiDeltaFullFrames(delta, Ms, Ds, view,
      Map("prio" -> mult), factIdx)
    // chunk by fkey parity and roll ALL THREE state pieces forward
    // between chunks (view := merge output; sidecar := write-back;
    // facts := anti-join retracted, append added) — the production
    // MERGE sequence
    val d1 = delta.filter(col("fkey") % 2 === 0)
    val d2 = delta.filter(col("fkey") % 2 === 1)
    def touchedOf(d: org.apache.spark.sql.DataFrame) =
      d.select(col("key_old").as("key")).where(col("key_old").isNotNull)
        .unionByName(d.select(col("key_new").as("key"))
          .where(col("key_new").isNotNull)).distinct()
    val v1 = MultiIvm.mergeMultiDeltaFullFrames(d1, Ms, Ds, view,
      Map("prio" -> mult), factIdx).localCheckpoint(true)
    val m1 = mult.join(touchedOf(d1), Seq("key"), "left_anti")
      .unionByName(MultiIvm.updatedMultiplicities(d1, mult, "prio"))
      .localCheckpoint(true)
    val f1 = factIdx
      .join(d1.filter(col("change").isin("D", "U")).select(col("fkey")),
        Seq("fkey"), "left_anti")
      .unionByName(d1.filter(col("change").isin("I", "U"))
        .select(col("fkey"), col("key_new").as("key"),
          col("new_cents").as("cents"), col("new_units").as("units"),
          col("new_prio").as("prio")))
      .localCheckpoint(true)
    val twoStep = MultiIvm.mergeMultiDeltaFullFrames(d2, Ms, Ds, v1,
      Map("prio" -> m1), f1)
    assert(twoStep.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(twoStep).isEmpty,
      "two-chunk full fold diverges from one-shot")
  }

  test("q212: full dim-move equals the post-move scratch incl. min/max; no fact scan") {
    import spark.implicits._
    val got = MultiIvm.multiMeasureDimMoveFull(sf001)
    got.collect()
    val cents = floor($"o_totalprice" * 100 + 0.5).cast("long")
    val units = ($"o_orderkey" % 1000).cast("long")
    val S = 1L << 30
    val nD = count(lit(1)).cast("double")
    val sD = sum(cents).cast("double")
    val ssq = sum(shiftright(cents * cents, 30)).cast("double") *
      lit(S.toDouble) +
      sum((cents * cents).bitwiseAND(lit(S - 1))).cast("double")
    val truth = sf001.orders
      .join(sf001.customer.select($"c_custkey",
        when($"c_custkey" % 89 === 0, ($"c_nationkey" + 7) % 25)
          .otherwise($"c_nationkey").as("nk")),
        $"o_custkey" === $"c_custkey")
      .join(sf001.nation, $"nk" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_orders"),
        (sD / 100.0).as("total_price"),
        ((sD / 100.0) / nD).as("avg_price"),
        (((ssq - sD * sD / nD) / nD) / 10000.0).as("var_price"),
        (min(cents).cast("double") / 100.0).as("min_price"),
        (max(cents).cast("double") / 100.0).as("max_price"),
        sum(units).as("sum_units"),
        max(units).as("max_units"),
        count_distinct($"o_orderpriority").as("n_priorities"))
    assert(got.count() > 0)
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
      "full multi-measure dim-move diverges from the post-move scratch")
    // the fact table must be out of the move loop: no scan LOCATION
    // may point at the orders parquet (output aliases like n_orders
    // would false-positive a bare substring check on the plan)
    val plan = got.queryExecution.executedPlan
    assert(!plan.toString.contains("/orders"),
      s"the fact table must be out of the move loop:\n$plan")
  }

  test("merge never shuffles the persisted view or sidecar rows") {
    import spark.implicits._
    MultiIvm.buildMultiView(facts, Ms, Ds, "graft_test_mivm_plan")
    // a genuinely delta-sized change set, collected up front
    val picked = facts.orderBy("fkey").limit(2).collect()
    val (f0, f1) = (picked(0), picked(1))
    val delta = Seq(
      (f0.getLong(0), "D", Some(f0.getLong(1)), Option.empty[Long],
        Some(f0.getLong(2)), Option.empty[Long], Some(f0.getLong(3)),
        Option.empty[Long], Some(f0.getString(4)), Option.empty[String]),
      (f1.getLong(0), "U", Some(f1.getLong(1)), Some(f1.getLong(1)),
        Some(f1.getLong(2)), Some(f1.getLong(2) + 1), Some(f1.getLong(3)),
        Some(f1.getLong(3)), Some(f1.getString(4)), Some("9-REPRICED")))
      .toDF("fkey", "change", "key_old", "key_new", "old_cents",
        "new_cents", "old_units", "new_units", "old_prio", "new_prio")
    val merged = MultiIvm.mergeMultiDelta(delta, Ms, Ds,
      "graft_test_mivm_plan")
    merged.collect()
    val plan = merged.queryExecution.executedPlan
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    val offenders = shuffles.filter(_.toString.contains("graft_test_mivm_plan"))
    assert(offenders.isEmpty,
      s"persisted view/sidecar rows crossed an exchange:\n${offenders.mkString("\n")}")
    assert(plan.toString.contains("SelectedBucketsCount") ||
      plan.toString.contains("Bucketed: true"),
      s"expected bucketed scans:\n$plan")
  }

  // ── q217/q219: the maintained top-k leaderboard ─────────────────────

  /** Survivors WITH their fact keys (the leaderboard identifies rows
    * by (v, fkey), so the q209 helper's fkey=0 collapse is unusable
    * here): the insert's fkey is the engine's fkey + 2³¹ image. */
  private def survivorsWithFkey: DataFrame = {
    val f = facts
    f.filter(col("fkey") % 97 =!= 0)
      .select(col("fkey"),
        when(col("fkey") % 97 === 2, col("key") + 1).otherwise(col("key")).as("key"),
        (col("cents") + when(col("fkey") % 97 === 1, 12345L).otherwise(0L)).as("cents"))
      .unionByName(f.filter(col("fkey") % 97 === 3)
        .select((col("fkey") + 2147483648L).as("fkey"), col("key"),
          (col("cents") + 55L).as("cents")))
  }

  private def topkTruthOf(f: DataFrame, part: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(part)).orderBy(col("cents").desc, col("fkey"))
    f.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col(part), col("rk"), col("fkey").as("o_orderkey"),
        (col("cents").cast("double") / 100.0).as("price"))
  }

  test("q217: maintained top-k equals the from-scratch windowed top-k over survivors") {
    val got = MultiIvm.topkRollup(sf001)
      .withColumnRenamed("o_custkey", "key")
    val truth = topkTruthOf(survivorsWithFkey, "key")
    assert(got.count() > 0)
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
      "maintained leaderboard diverges from the windowed top-k")
  }

  test("top-k: two-chunk fold equals one-shot (leaderboard re-derivation composes)") {
    import spark.implicits._
    val tks = MultiIvm.TopKs
    MultiIvm.buildMultiViewFull(facts, Ms, Ds, "graft_test_mivmf_tk",
      topks = tks)
    val delta = MultiIvm.orderMultiDelta(facts)
    val view = spark.table("graft_test_mivmf_tk")
    val mult = spark.table("graft_test_mivmf_tk_mult_prio")
    val factIdx = spark.table("graft_test_mivmf_tk_facts")
    val oneShot = MultiIvm.mergeMultiDeltaFullFrames(delta, Ms, Ds, view,
      Map("prio" -> mult), factIdx, tks)
    val d1 = delta.filter(col("fkey") % 2 === 0)
    val d2 = delta.filter(col("fkey") % 2 === 1)
    def touchedOf(d: DataFrame) =
      d.select(col("key_old").as("key")).where(col("key_old").isNotNull)
        .unionByName(d.select(col("key_new").as("key"))
          .where(col("key_new").isNotNull)).distinct()
    val v1 = MultiIvm.mergeMultiDeltaFullFrames(d1, Ms, Ds, view,
      Map("prio" -> mult), factIdx, tks).localCheckpoint(true)
    val m1 = mult.join(touchedOf(d1), Seq("key"), "left_anti")
      .unionByName(MultiIvm.updatedMultiplicities(d1, mult, "prio"))
      .localCheckpoint(true)
    val f1 = factIdx
      .join(d1.filter(col("change").isin("D", "U")).select(col("fkey")),
        Seq("fkey"), "left_anti")
      .unionByName(d1.filter(col("change").isin("I", "U"))
        .select(col("fkey"), col("key_new").as("key"),
          col("new_cents").as("cents"), col("new_units").as("units"),
          col("new_prio").as("prio")))
      .localCheckpoint(true)
    val twoStep = MultiIvm.mergeMultiDeltaFullFrames(d2, Ms, Ds, v1,
      Map("prio" -> m1), f1, tks)
    assert(twoStep.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(twoStep).isEmpty,
      "two-chunk leaderboard fold diverges from one-shot")
  }

  test("q219: top-k dim-move equals the post-move scratch top-k; no fact scan") {
    import spark.implicits._
    val got = MultiIvm.topkDimMove(sf001)
    got.collect()
    val postMove = sf001.orders
      .join(sf001.customer.select($"c_custkey",
        when($"c_custkey" % 89 === 0, ($"c_nationkey" + 7) % 25)
          .otherwise($"c_nationkey").as("nk")),
        $"o_custkey" === $"c_custkey")
      .join(sf001.nation, $"nk" === $"n_nationkey")
      .select($"n_name", $"o_orderkey".as("fkey"),
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
    val truth = topkTruthOf(postMove, "n_name")
    assert(got.count() > 0)
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
      "top-k dim-move diverges from the post-move scratch")
    // the move fold must stay fact-free: member keys' per-key arrays
    // re-merge, the orders parquet never enters the plan
    val plan = got.queryExecution.executedPlan
    assert(!plan.toString.contains("/orders"),
      s"the fact table must be out of the move loop:\n$plan")
  }

  // ── q218: HLL sketch as a maintained view measure ───────────────────

  test("q218: rebuilt sketch estimates equal a from-scratch sketch of the survivors") {
    import spark.implicits._
    val f = MultiIvm.orderHllFacts(sf001)
    MultiIvm.buildMultiViewFull(f, Seq("cents"), Seq("pval"),
      "graft_test_mivmh", hlls = Seq("pval"))
    val merged = MultiIvm.mergeMultiDeltaFull(MultiIvm.orderHllDelta(f),
      Seq("cents"), Seq("pval"), "graft_test_mivmh", hlls = Seq("pval"))
    // survivors replayed row-wise, sketched from scratch — the
    // maintained sketch's ESTIMATE must agree exactly (identical
    // register state; bytes may differ in coupon order)
    val surv = f.filter(col("fkey") % 97 =!= 0)
      .select(
        when(col("fkey") % 97 === 2, col("key") + 1).otherwise(col("key")).as("key"),
        when(col("fkey") % 97 === 1,
          ((col("cents") + 12345L) / 100).cast("long"))
          .otherwise(col("pval")).as("pval"))
      .unionByName(f.filter(col("fkey") % 97 === 3)
        .select(col("key"),
          ((col("cents") + 55L) / 100).cast("long").as("pval")))
    val scratch = surv.groupBy(col("key"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("pval"))).as("est"),
        count_distinct(col("pval")).as("cd"))
    val got = merged.select(col("key"),
      hll_sketch_estimate(col("hs_pval")).as("est"), col("cd_pval").as("cd"))
    assert(got.count() > 0)
    assert(got.exceptAll(scratch).isEmpty && scratch.exceptAll(got).isEmpty,
      "maintained sketch estimates diverge from from-scratch sketches")
  }

  test("hll under dim moves: group sketch = union of member sketches, fact-free") {
    import spark.implicits._
    // keys {1,2,3} with overlapping value sets; groups A={1,2}, B={3};
    // move key 2 into B — the union must absorb the overlap exactly
    val facts = Seq(
      (10L, 1L, 5L, 100L), (11L, 1L, 6L, 101L),
      (20L, 2L, 7L, 101L), (21L, 2L, 8L, 102L),
      (30L, 3L, 9L, 102L), (31L, 3L, 4L, 103L))
      .toDF("fkey", "key", "cents", "pval")
    MultiIvm.buildMultiViewFull(facts, Seq("cents"), Seq("pval"),
      "graft_test_mivmh_mv", hlls = Seq("pval"))
    val perKey = spark.table("graft_test_mivmh_mv")
    val mapping0 = Seq(1L -> "A", 2L -> "A", 3L -> "B").toDF("key", "g")
    val gmult = spark.table("graft_test_mivmh_mv_mult_pval")
      .join(mapping0, Seq("key")).groupBy($"g", $"v").agg(sum($"m").as("m"))
    // cd from the summed multiplicity vectors, hs from member unions
    val cd = gmult.groupBy($"g").agg(count(lit(1)).as("cd_pval"))
    val hs = perKey.join(mapping0, Seq("key")).groupBy($"g")
      .agg(hll_union_agg($"hs_pval").as("hs_pval"))
    val view = perKey.join(mapping0, Seq("key")).groupBy($"g")
      .agg(sum($"n").as("n"), sum($"s_cents").as("s_cents"),
        sum($"ssh_cents").as("ssh_cents"), sum($"ssl_cents").as("ssl_cents"),
        min($"mn_cents").as("mn_cents"), max($"mx_cents").as("mx_cents"))
      .join(cd, Seq("g")).join(hs, Seq("g"))
      .select($"g", $"n", $"s_cents", $"ssh_cents", $"ssl_cents",
        $"mn_cents", $"mx_cents", $"cd_pval", $"hs_pval")
    val delta = Seq((2L, "A", "B")).toDF("key", "g_old", "g_new")
    val mapping1 = Seq(1L -> "A", 2L -> "B", 3L -> "B").toDF("key", "g")
    val moved = MultiIvm.mergeMultiDimMoveFull(view,
      Map("pval" -> gmult), "graft_test_mivmh_mv", mapping1, delta,
      Seq("cents"), Seq("pval"), hlls = Seq("pval"))
    moved.collect()
    val got = moved.select($"g",
      hll_sketch_estimate($"hs_pval").cast("long").as("est"),
      $"cd_pval").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // post-move exact: A = {100, 101}, B = {101, 102, 103} — small
    // sets, so the sketch estimate is exact
    assert(got === Map("A" -> (2L, 2L), "B" -> (3L, 3L)), s"got $got")
    assert(!moved.queryExecution.executedPlan.toString.contains("/orders"))
  }
}
