package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q198: incremental entity resolution — condensation-exactness
  * (increment ≡ full recompute), the cluster-weld case, two-step
  * roll-forward, and untouched-block pass-through. */
class IncrementalErSpec extends SparkSpec {

  private def shaped(golden: DataFrame): DataFrame =
    golden.select("cluster_id", "golden_id", "golden_name", "n_members")

  test("increment equals the full recompute on the fixture corpus") {
    import spark.implicits._
    Relational.buildErIndex(sf001.part.filter($"p_partkey" % 10 =!= 4),
      $"p_partkey", $"p_brand", $"p_name", 2, "graft_test_er_full")
    val delta = sf001.part.filter($"p_partkey" % 10 === 4)
      .select($"p_partkey".as("id"), $"p_brand".as("block"),
        $"p_name".as("name"))
    val inc = shaped(
      Relational.goldenRecordsIncrement(delta, "graft_test_er_full", 2))
    val full = Relational.goldenRecordsOver(sf001.part,
      $"p_partkey", $"p_brand", $"p_name", 2)
    assert(inc.count() > 0)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental resolution diverges from the full recompute")
  }

  test("a new record welds two existing clusters") {
    import spark.implicits._
    // base: two singleton clusters 4 edits apart; the new record sits
    // 2 edits from each — the weld closes through it
    val base = Seq((10L, "B", "aaaa"), (20L, "B", "cccc"))
      .toDF("id", "block", "name")
    Relational.buildErIndex(base, $"id", $"block", $"name", 2,
      "graft_test_er_weld")
    val pre = spark.table("graft_test_er_weld_golden").count()
    assert(pre === 2L, "base must resolve to two singleton clusters")
    val delta = Seq((30L, "B", "aacc")).toDF("id", "block", "name")
    val got = shaped(
      Relational.goldenRecordsIncrement(delta, "graft_test_er_weld", 2))
      .collect()
    assert(got.length === 1, s"weld must merge everything: ${got.toSeq}")
    assert(got.head.getLong(0) === 10L)       // cluster = min member
    assert(got.head.getLong(3) === 3L)        // all three members
    assert(got.head.getLong(1) === 10L &&
      got.head.getString(2) === "aaaa")       // longest-name tie → min id
  }

  test("two-step roll-forward equals one-shot resolution") {
    import spark.implicits._
    val all = sf001.part.limit(600).select($"p_partkey".as("id"),
      $"p_brand".as("block"), $"p_name".as("name")).localCheckpoint(true)
    val s1 = all.filter($"id" % 3 === 0)
    val s2 = all.filter($"id" % 3 === 1)
    val s3 = all.filter($"id" % 3 === 2)
    Relational.buildErIndex(s1, $"id", $"block", $"name", 2,
      "graft_test_er_roll")
    Relational.updateErIndex(s2, "graft_test_er_roll", 2)
    val inc = shaped(
      Relational.goldenRecordsIncrement(s3, "graft_test_er_roll", 2))
    Relational.buildErIndex(all, $"id", $"block", $"name", 2,
      "graft_test_er_oneshot")
    val full = shaped(spark.table("graft_test_er_oneshot_golden"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "build + update + increment diverges from one-shot resolution")
  }

  test("untouched blocks pass through byte-identically") {
    import spark.implicits._
    val base = Seq((1L, "P", "xxxx"), (2L, "P", "xxxy"),
      (3L, "Q", "zzzz")).toDF("id", "block", "name")
    Relational.buildErIndex(base, $"id", $"block", $"name", 2,
      "graft_test_er_pass")
    val before = spark.table("graft_test_er_pass_golden")
      .filter($"block" === "P").collect().toSeq
    val delta = Seq((9L, "Q", "zzzy")).toDF("id", "block", "name")
    val after = Relational.goldenRecordsIncrement(delta,
        "graft_test_er_pass", 2)
      .filter($"block" === "P").collect().toSeq
    assert(before === after, "untouched block's golden rows changed")
  }
}
