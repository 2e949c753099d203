package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q216: delete-capable incremental ER — deleting the record that
  * bridged two real entities splits the welded cluster back apart
  * (the weld-inverse), untouched golden rows pass through
  * byte-identically with no state shuffle, phantom deletes raise, the
  * fixture equals a from-scratch resolution of the survivors, the
  * rolled-forward state equals a rebuild, and an insert-then-delete
  * round-trip (weld, then un-weld) lands back on the original state —
  * proving the insert path rolls the pair sidecar forward too. */
class ErRetractSpec extends SparkSpec {

  // Block B1 is a lev-2 chain where B bridges: lev(A,B)=2, lev(B,C)=2,
  // lev(A,C)=4 — {1,2,3} one cluster only through 2. Block B2 is an
  // untouched pair, B3 an untouched singleton. All names share a
  // length, so survivorship ties to the smallest id.
  private def handCorpus = {
    import spark.implicits._
    Seq(
      (1L, "B1", "xxxx aaaa"), (2L, "B1", "xxxx aabb"),
      (3L, "B1", "xxxx bbbb"),
      (10L, "B2", "yyyy"), (11L, "B2", "yyyz"),
      (20L, "B3", "zzzz")).toDF("id", "block", "name")
  }

  test("bridge deletion splits the chain; untouched golden rows byte-identical; no state shuffle") {
    import spark.implicits._
    Relational.buildErIndexFull(handCorpus, $"id", $"block", $"name", 2,
      "graft_test_err_hand")
    // pre-state sanity: {1,2,3} welded, {10,11}, {20}
    val pre = spark.table("graft_test_err_hand")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(pre === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L), s"pre-state: $pre")
    val got = Relational.erApplyDeletes(Seq(2L).toDF("id"),
      "graft_test_err_hand")
    val m = got.collect().map(r =>
      r.getLong(1) -> (r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(m === Map(
      1L -> (1L, "xxxx aaaa", 1L), 3L -> (3L, "xxxx bbbb", 1L),
      10L -> (10L, "yyyy", 2L), 20L -> (20L, "zzzz", 1L)),
      s"bridge delete must split {1,2,3} into {1}+{3} and leave " +
        s"B2/B3 golden rows untouched — got $m")
    val plan = got.queryExecution.executedPlan
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    val offenders = shuffles.filter(_.toString.contains("graft_test_err_hand"))
    assert(offenders.isEmpty,
      s"persisted ER state crossed an exchange:\n${offenders.mkString("\n")}")
  }

  test("non-bridge deletion keeps the cluster together") {
    import spark.implicits._
    Relational.buildErIndexFull(handCorpus, $"id", $"block", $"name", 2,
      "graft_test_err_nb")
    val got = Relational.erApplyDeletes(Seq(3L).toDF("id"),
      "graft_test_err_nb")
    val m = got.collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(m === Map(1L -> 2L, 10L -> 2L, 20L -> 1L), s"got $m")
  }

  test("phantom delete raises loudly") {
    import spark.implicits._
    Relational.buildErIndexFull(handCorpus, $"id", $"block", $"name", 2,
      "graft_test_err_ph")
    val e = intercept[IllegalArgumentException] {
      Relational.erApplyDeletes(Seq(999L).toDF("id"), "graft_test_err_ph")
    }
    assert(e.getMessage.contains("phantom"),
      s"expected the phantom-delete raise, got: $e")
  }

  test("q216 fixture equals the from-scratch resolution of the survivors") {
    import spark.implicits._
    val got = Relational.partGoldenRecordsDelete(sf001)
    val surv = sf001.part.filter($"p_partkey" % 17 =!= 3)
    val truth = Relational.goldenRecordsOver(surv, $"p_partkey", $"p_brand",
      $"p_name", 2)
    assert(got.count() === truth.count())
    val g = got.select($"cluster_id", $"golden_id", $"golden_name",
      $"n_members")
    val t = truth.select($"cluster_id", $"golden_id", $"golden_name",
      $"n_members")
    assert(g.exceptAll(t).isEmpty && t.exceptAll(g).isEmpty,
      "delete-capable resolution diverges from the survivors' resolution")
  }

  test("rolled-forward state equals a rebuild over the survivors") {
    import spark.implicits._
    Relational.buildErIndexFull(handCorpus, $"id", $"block", $"name", 2,
      "graft_test_err_roll")
    Relational.updateErIndexDeletes(Seq(2L).toDF("id"),
      "graft_test_err_roll")
    Relational.buildErIndexFull(handCorpus.filter($"id" =!= 2L),
      $"id", $"block", $"name", 2, "graft_test_err_scratch")
    Seq("", "_golden", "_pairs").foreach { s =>
      val a = spark.table(s"graft_test_err_roll$s")
      val b = spark.table(s"graft_test_err_scratch$s")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"table $s diverges between roll-forward and rebuild")
    }
  }

  test("weld then un-weld round-trips: insert rolls the pair sidecar forward") {
    import spark.implicits._
    val without = handCorpus.filter($"id" =!= 2L)
    Relational.buildErIndexFull(without, $"id", $"block", $"name", 2,
      "graft_test_err_rt")
    // insert the bridge: {1} and {3} weld into one cluster
    Relational.updateErIndex(
      Seq((2L, "B1", "xxxx aabb")).toDF("id", "block", "name"),
      "graft_test_err_rt", 2)
    val welded = spark.table("graft_test_err_rt")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(welded(1L) === welded(3L) && welded(1L) === welded(2L),
      s"insert must weld {1,2,3}: $welded")
    // delete it again: the split must come back — possible only if the
    // insert maintained the _pairs sidecar
    Relational.updateErIndexDeletes(Seq(2L).toDF("id"), "graft_test_err_rt")
    Relational.buildErIndexFull(without, $"id", $"block", $"name", 2,
      "graft_test_err_rt_scratch")
    Seq("", "_golden", "_pairs").foreach { s =>
      val a = spark.table(s"graft_test_err_rt$s")
      val b = spark.table(s"graft_test_err_rt_scratch$s")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"table $s diverges after the weld/un-weld round-trip")
    }
  }
}
