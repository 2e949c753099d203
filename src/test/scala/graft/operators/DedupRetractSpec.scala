package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q215: delete-capable incremental dedup — a bridge-document deletion
  * splits its cluster, untouched clusters pass through byte-identically
  * with no state shuffle, phantom deletes raise, the fixture equals
  * the from-scratch clustering of the survivors, and the rolled-forward
  * index equals a rebuild over the survivors (no phantom band keys). */
class DedupRetractSpec extends SparkSpec {

  // A–B–C chain at shingle-jaccard dist ≤ 0.4 where B bridges:
  // 58 words, B differs from A in the last 8 (pair dist 0.25), C from
  // B in the first 8 (0.25), A vs C differ in 16 shingles (dist 0.444
  // > 0.4 — NOT a pair). Plus an untouched near-dup pair {10, 11} and
  // an untouched singleton {20}.
  private def handCorpus = {
    import spark.implicits._
    val w = (1 to 58).map(i => s"w$i")
    val aTxt = w.mkString(" ")
    val bTxt = (w.take(50) ++ (51 to 58).map(i => s"x$i")).mkString(" ")
    val cTxt = ((1 to 8).map(i => s"y$i") ++ w.slice(8, 50) ++
      (51 to 58).map(i => s"x$i")).mkString(" ")
    val d = (101 to 158).map(i => s"d$i")
    val dTxt = d.mkString(" ")
    val eTxt = (d.take(57) :+ "e158").mkString(" ")
    val fTxt = (201 to 230).map(i => s"f$i").mkString(" ")
    Seq(1L -> aTxt, 2L -> bTxt, 3L -> cTxt,
      10L -> dTxt, 11L -> eTxt, 20L -> fTxt).toDF("doc_id", "text")
  }

  test("bridge deletion splits the chain; untouched clusters byte-identical; no state shuffle") {
    import spark.implicits._
    Dedup.buildDedupIndexFull(handCorpus, $"doc_id", $"text",
      "graft_test_ddr_hand")
    // pre-state sanity: {1,2,3} one cluster, {10,11}, {20}
    val pre = spark.table("graft_test_ddr_hand_clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pre === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L), s"pre-state: $pre")
    val got = Dedup.dedupApplyDeletes(Seq(2L).toDF("doc_id"),
      "graft_test_ddr_hand")
    val m = got.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(m === Map(
      1L -> (1L, true), 3L -> (3L, true), // the split fragments
      10L -> (10L, true), 11L -> (10L, false), 20L -> (20L, true)),
      s"bridge delete must split {1,2,3} into {1}+{3} and leave " +
        s"{10,11}/{20} untouched — got $m")
    val plan = got.queryExecution.executedPlan
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    val offenders = shuffles.filter(_.toString.contains("graft_test_ddr_hand"))
    assert(offenders.isEmpty,
      s"persisted dedup state crossed an exchange:\n${offenders.mkString("\n")}")
  }

  test("non-bridge deletion keeps the cluster together") {
    import spark.implicits._
    Dedup.buildDedupIndexFull(handCorpus, $"doc_id", $"text",
      "graft_test_ddr_nb")
    // deleting C (an endpoint, not the bridge) keeps {1, 2} clustered
    val got = Dedup.dedupApplyDeletes(Seq(3L).toDF("doc_id"),
      "graft_test_ddr_nb")
    val m = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L),
      s"got $m")
  }

  test("phantom delete raises loudly") {
    import spark.implicits._
    Dedup.buildDedupIndexFull(handCorpus, $"doc_id", $"text",
      "graft_test_ddr_ph")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupApplyDeletes(Seq(999L).toDF("doc_id"), "graft_test_ddr_ph")
    }
    assert(e.getMessage.contains("phantom"),
      s"expected the phantom-delete raise, got: $e")
  }

  test("q215 fixture equals the from-scratch clustering of the survivors") {
    import spark.implicits._
    val got = Dedup.dedupDeleteClusters(sf001)
    val surv = sf001.documents.filter($"doc_id" % 13 =!= 5)
    val pairs = Dedup.minhashPairsCore(surv, $"doc_id", $"text", 0.4, 16, 2)
      .select($"id_a", $"id_b")
    val truth = Dedup.connectedComponents(surv.select($"doc_id"), pairs,
        edgesWithinNodes = true)
      .select($"id".as("doc_id"), $"component".as("cluster_id"),
        ($"id" === $"component").as("is_keeper"))
    assert(got.count() === surv.count())
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
      "delete-capable clustering diverges from the survivors' closure")
  }

  test("rolled-forward index equals a rebuild over the survivors") {
    import spark.implicits._
    Dedup.buildDedupIndexFull(handCorpus, $"doc_id", $"text",
      "graft_test_ddr_roll")
    Dedup.updateDedupIndexDeletes(Seq(2L).toDF("doc_id"),
      "graft_test_ddr_roll", "graft_test_ddr_rolled")
    Dedup.buildDedupIndexFull(handCorpus.filter($"doc_id" =!= 2L),
      $"doc_id", $"text", "graft_test_ddr_scratch")
    Seq("_docs", "_bands", "_pairs", "_clusters").foreach { s =>
      val a = spark.table(s"graft_test_ddr_rolled$s")
      val b = spark.table(s"graft_test_ddr_scratch$s")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"table $s diverges between roll-forward and rebuild")
    }
    // and the rolled-forward index still serves the insert path: a new
    // doc near A must candidate against A (via A's band keys) and NOT
    // against the deleted B (its band keys are gone)
    val w = (1 to 58).map(i => s"w$i")
    val nTxt = (w.take(57) :+ "z58").mkString(" ")
    val next = Dedup.dedupIncrementalOver(
      Seq(100L -> nTxt).toDF("doc_id", "text"), $"doc_id", $"text",
      "graft_test_ddr_rolled")
    val nm = next.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nm(100L) === 1L && nm(1L) === 1L,
      s"new doc must join A's cluster through the rolled-forward index: $nm")
  }

  test("weld then un-weld round-trips on one full state: inserts and deletes compose") {
    import spark.implicits._
    // build without the bridge B, INSERT it (welds {1,3}), then
    // DELETE it — the state must land back on a rebuild of the
    // original corpus, table for table (q216's ER contract, dedup side)
    val without = handCorpus.filter($"doc_id" =!= 2L)
    val bridge = handCorpus.filter($"doc_id" === 2L)
    Dedup.buildDedupIndexFull(without, $"doc_id", $"text",
      "graft_test_ddr_rt")
    Dedup.updateDedupIndexInserts(bridge, $"doc_id", $"text",
      "graft_test_ddr_rt", "graft_test_ddr_rt2")
    val welded = spark.table("graft_test_ddr_rt2_clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(welded(1L) === welded(2L) && welded(1L) === welded(3L),
      s"insert must weld {1,2,3}: $welded")
    Dedup.updateDedupIndexDeletes(Seq(2L).toDF("doc_id"),
      "graft_test_ddr_rt2", "graft_test_ddr_rt3")
    Dedup.buildDedupIndexFull(without, $"doc_id", $"text",
      "graft_test_ddr_rt_scratch")
    Seq("_docs", "_bands", "_pairs", "_clusters").foreach { s =>
      val a = spark.table(s"graft_test_ddr_rt3$s")
      val b = spark.table(s"graft_test_ddr_rt_scratch$s")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"table $s diverges after the weld/un-weld round-trip")
    }
  }
}
