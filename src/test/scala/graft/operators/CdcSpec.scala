package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC apply / SCD2 semantics: merge associativity, change
  * suppression, delete-close, and the snapshot ≡ current-versions
  * identity that ties q158 and q159 together. */
class CdcSpec extends SparkSpec {

  // hand-built change log: upserts, a same-payload no-op, a delete,
  // a re-insert after delete, a leading delete (no-op), and a ts tie
  // broken by seq
  private def log: DataFrame = {
    import spark.implicits._
    Seq(
      // key 1: U(a) → U(a) suppressed → U(b) → D → U(c) re-insert
      (1L, 100L, 1L, "U", 1.0, "a"),
      (1L, 200L, 2L, "U", 1.0, "a"),
      (1L, 300L, 3L, "U", 2.0, "b"),
      (1L, 400L, 4L, "D", 0.0, "x"),
      (1L, 500L, 5L, "U", 3.0, "c"),
      // key 2: leading delete is a no-op, then one upsert
      (2L, 100L, 6L, "D", 0.0, "x"),
      (2L, 200L, 7L, "U", 9.0, "z"),
      // key 3: ts tie — seq 9 wins latest
      (3L, 100L, 8L, "U", 1.0, "p"),
      (3L, 100L, 9L, "U", 2.0, "q"),
      // key 4: deleted and never re-inserted
      (4L, 100L, 10L, "U", 5.0, "m"),
      (4L, 200L, 11L, "D", 0.0, "x"),
      // key 5: double delete — second is a no-op
      (5L, 100L, 12L, "U", 7.0, "n"),
      (5L, 200L, 13L, "D", 0.0, "x"),
      (5L, 300L, 14L, "D", 0.0, "x")
    ).toDF("key", "us", "seq", "op", "value", "etype")
  }

  test("mergeApply latest-wins snapshot semantics") {
    val snap = Cdc.mergeApply(None, log).orderBy("key")
      .select("key", "us", "seq", "value", "etype")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
    assert(snap.toSeq === Seq(
      (1L, 500L, 5L, 3.0, "c"),
      (2L, 200L, 7L, 9.0, "z"),
      (3L, 100L, 9L, 2.0, "q")))
  }

  test("mergeApply is associative across any log split") {
    val full = Cdc.mergeApply(None, log)
    for (cut <- Seq(150L, 250L, 450L)) {
      val base = Cdc.mergeApply(None, log.filter(col("us") < cut))
      val merged = Cdc.mergeApply(Some(base), log.filter(col("us") >= cut))
      assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
        s"split at $cut diverges from full-log apply")
    }
  }

  test("scd2Over: suppression, delete-close, re-insert, is_current") {
    val v = Cdc.scd2Over(log).orderBy("key", "valid_from_us")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5)))
    assert(v.toSeq === Seq(
      // key 1: version a [100,300) — the 200 no-op never splits it —
      // then b [300,400) closed by the delete, then c [500,∞)
      (1L, 1.0, "a", 100L, 300L, false),
      (1L, 2.0, "b", 300L, 400L, false),
      (1L, 3.0, "c", 500L, -1L, true),
      // key 2: the leading delete is a no-op
      (2L, 9.0, "z", 200L, -1L, true),
      // key 3: ts tie splits on seq
      (3L, 1.0, "p", 100L, 100L, false),
      (3L, 2.0, "q", 100L, -1L, true),
      // key 4: closed by its delete, nothing current
      (4L, 5.0, "m", 100L, 200L, false),
      // key 5: the second delete is a no-op (no phantom close)
      (5L, 7.0, "n", 100L, 200L, false)))
  }

  test("fixture identity: q158 snapshot equals q159 current versions") {
    val snap = Cdc.cdcMergeSnapshot(sf001)
      .select("user_id", "value", "etype")
    val cur = Cdc.scd2History(sf001).filter(col("is_current"))
      .select("user_id", "value", "etype")
    assert(snap.count() > 0)
    assert(snap.exceptAll(cur).isEmpty && cur.exceptAll(snap).isEmpty)
  }

  test("scd2 intervals per key are disjoint, ordered, and singly current") {
    val v = Cdc.scd2Over(Cdc.eventChangeLog(sf001))
    // at most one open interval per key
    val multiCurrent = v.filter(col("is_current"))
      .groupBy("key").count().filter(col("count") > 1).count()
    assert(multiCurrent === 0)
    // valid_from < valid_to, and consecutive versions never overlap
    assert(v.filter(col("valid_to_us").isNotNull &&
      col("valid_from_us") >= col("valid_to_us")).count() === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("valid_from_us"))
    val overlaps = v.withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        (col("valid_to_us").isNull || col("valid_to_us") > col("next_from")))
      .count()
    assert(overlaps === 0)
  }

  test("tableDiff classification on hand-built snapshots") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, 100L, 1L, 1.0, "a"),  // unchanged → absent from diff
      (2L, 100L, 2L, 2.0, "b"),  // payload changes → U
      (3L, 100L, 3L, 3.0, "c"),  // disappears → D
      (5L, 100L, 5L, 5.0, "e")   // only metadata changes → absent
    ).toDF("key", "us", "seq", "value", "etype")
    val newSnap = Seq(
      (1L, 100L, 1L, 1.0, "a"),
      (2L, 200L, 6L, 2.5, "b"),
      (4L, 200L, 7L, 4.0, "d"),  // appears → I
      (5L, 900L, 9L, 5.0, "e")
    ).toDF("key", "us", "seq", "value", "etype")
    val d = Cdc.tableDiff(oldSnap, newSnap).orderBy("key")
      .select("key", "change").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(d.toSeq === Seq((2L, "U"), (3L, "D"), (4L, "I")))
    // self-diff is empty (minimality)
    assert(Cdc.tableDiff(newSnap, newSnap).isEmpty)
  }

  test("round trip: mergeApply(old, diffToLog(tableDiff(old, new))) == new") {
    for (cutDay <- Seq("2024-01-08", "2024-01-15", "2024-01-22")) {
      val log = Cdc.eventChangeLog(sf001)
      val cutUs = java.time.Instant.parse(s"${cutDay}T00:00:00Z")
        .getEpochSecond * 1000000L
      val oldSnap = Cdc.mergeApply(None, log.filter(col("us") < cutUs))
      val newSnap = Cdc.mergeApply(None, log)
      val applied = Cdc.mergeApply(Some(oldSnap),
        Cdc.diffToLog(Cdc.tableDiff(oldSnap, newSnap)))
      // the diff is MINIMAL: payload-identical keys are suppressed, so
      // the round trip reproduces new exactly on (key, payload) while
      // change metadata (us, seq) may keep its old value there
      val a = applied.select("key", "value", "etype")
      val n = newSnap.select("key", "value", "etype")
      assert(a.exceptAll(n).isEmpty && n.exceptAll(a).isEmpty,
        s"diff round trip diverges at cut $cutDay")
    }
  }

  // ── incremental SCD2 maintenance (q193) ────────────────────────────

  test("scd2Increment(scd2(log<t), log>=t) equals scd2(log) at any cut") {
    val full = Cdc.scd2Over(log)
    for (cut <- Seq(150L, 250L, 350L, 450L)) {
      val dim = Cdc.scd2Over(log.filter(col("us") < cut))
      val merged = Cdc.scd2Increment(dim, log.filter(col("us") >= cut))
      assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
        s"increment at cut $cut diverges from the full-log assembly")
    }
  }

  test("scd2Increment touches nothing for keys absent from the slice") {
    import spark.implicits._
    val dim = Cdc.scd2Over(log)
    // a slice touching only key 1: key 2-5 rows must pass through
    // IDENTICALLY (history is immutable for untouched keys)
    val late = Seq((1L, 900L, 90L, "U", 9.0, "z"))
      .toDF("key", "us", "seq", "op", "value", "etype")
    val merged = Cdc.scd2Increment(dim, late)
    val others = dim.filter(col("key") =!= 1L)
    val mergedOthers = merged.filter(col("key") =!= 1L)
    assert(mergedOthers.exceptAll(others).isEmpty &&
      others.exceptAll(mergedOthers).isEmpty)
    // key 1's open version c ([500,∞)) is now closed at 900; z is open
    val k1 = merged.filter(col("key") === 1L)
      .orderBy("valid_from_us").collect()
      .map(r => (r.getString(2), r.isNullAt(4), r.getBoolean(5)))
    assert(k1.toSeq === Seq(("a", false, false), ("b", false, false),
      ("c", false, false), ("z", true, true)))
  }

  test("scd2Increment suppresses a late upsert equal to the live state") {
    import spark.implicits._
    val dim = Cdc.scd2Over(log)
    // key 2 is live at (9.0, "z") — a late identical upsert is a no-op
    val late = Seq((2L, 900L, 91L, "U", 9.0, "z"))
      .toDF("key", "us", "seq", "op", "value", "etype")
    val merged = Cdc.scd2Increment(dim, late)
    assert(merged.exceptAll(dim).isEmpty && dim.exceptAll(merged).isEmpty,
      "a live-state-equal late upsert must change nothing")
  }

  test("scd2Increment fails loudly when a late change predates the open version") {
    import spark.implicits._
    val dim = Cdc.scd2Over(log)
    // key 1's open version starts at us=500 — a "late" change at
    // us=400 violates the cut precondition and must raise, not weave
    // itself into immutable history
    val bad = Seq((1L, 400L, 95L, "U", 7.5, "bad"))
      .toDF("key", "us", "seq", "op", "value", "etype")
    val e = intercept[Exception] {
      Cdc.scd2Increment(dim, bad).collect()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("cut precondition"),
      s"expected the cut-precondition raise, got: ${e.getMessage}")
    // an equal-us late change (seq-ordered after) stays legal
    val ok = Seq((1L, 500L, 95L, "U", 7.5, "ok"))
      .toDF("key", "us", "seq", "op", "value", "etype")
    assert(Cdc.scd2Increment(dim, ok).count() > 0)
  }

  // ── point-in-time lookup (q186) ────────────────────────────────────

  test("pointInTimeLookup: strict-prior, gap, and tie semantics") {
    import spark.implicits._
    val dim = Cdc.scd2Over(log)
    def probe(key: Long, us: Long): DataFrame =
      Seq((key, us, 99L)).toDF("key", "us", "probe_id")
    def lookupAt(key: Long, us: Long): (Option[Double], Option[String]) = {
      val r = Cdc.pointInTimeLookup(probe(key, us), dim).collect()
      assert(r.length === 1)
      val row = r.head
      (if (row.isNullAt(row.fieldIndex("value"))) None
       else Some(row.getDouble(row.fieldIndex("value"))),
       if (row.isNullAt(row.fieldIndex("etype"))) None
       else Some(row.getString(row.fieldIndex("etype"))))
    }
    // key 1 versions: a [100,300), b [300,400) closed by D, c [500,∞)
    assert(lookupAt(1L, 100L) === (None, None))          // nothing strictly prior
    assert(lookupAt(1L, 101L) === (Some(1.0), Some("a")))
    assert(lookupAt(1L, 300L) === (Some(1.0), Some("a"))) // b opens AT 300 — excluded
    assert(lookupAt(1L, 301L) === (Some(2.0), Some("b")))
    assert(lookupAt(1L, 400L) === (Some(2.0), Some("b"))) // state at 399 is still b
    assert(lookupAt(1L, 450L) === (None, None))          // delete gap
    assert(lookupAt(1L, 500L) === (None, None))          // c opens AT 500 — still the gap
    assert(lookupAt(1L, 501L) === (Some(3.0), Some("c")))
    // key 3: p's interval is EMPTY ([100,100), same-us successor q) —
    // never live, and the lookup stays deterministic despite the tie
    assert(lookupAt(3L, 100L) === (None, None))
    assert(lookupAt(3L, 101L) === (Some(2.0), Some("q")))
    // key 4: deleted and never re-inserted
    assert(lookupAt(4L, 150L) === (Some(5.0), Some("m")))
    assert(lookupAt(4L, 250L) === (None, None))
    // unknown key: no history at all
    assert(lookupAt(42L, 100L) === (None, None))
  }

  test("pointInTimeLookup equals the literal interval range join") {
    import spark.implicits._
    import graft.functions.TimeFunctions.tsMicros
    val dim = Cdc.scd2Over(Cdc.eventChangeLog(sf001))
    val facts = sf001.events.filter($"event_type" === "purchase")
      .select($"user_id".as("key"), tsMicros($"ts").as("us"),
        $"event_id".as("purchase_id"))
    val got = Cdc.pointInTimeLookup(facts, dim)
      .select("key", "us", "purchase_id", "value", "etype", "valid_from_us")
    val expected = facts.as("f").join(dim.as("d"),
        col("f.key") === col("d.key") &&
          col("d.valid_from_us") < col("f.us") &&
          (col("d.valid_to_us").isNull || col("f.us") <= col("d.valid_to_us")),
        "left")
      .select(col("f.key"), col("f.us"), col("purchase_id"),
        col("d.value"), col("d.etype"), col("d.valid_from_us"))
    assert(got.count() === facts.count(), "lookup must keep every fact row")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "union+window carry diverges from the interval definition")
  }

  test("pointInTimeLookup plans one exchange over pre-shaped inputs") {
    import spark.implicits._
    import graft.functions.TimeFunctions.tsMicros
    val dim = Cdc.scd2Over(Cdc.eventChangeLog(sf001)).localCheckpoint(true)
    val facts = sf001.events.filter($"event_type" === "purchase")
      .select($"user_id".as("key"), tsMicros($"ts").as("us"),
        $"event_id".as("purchase_id")).localCheckpoint(true)
    val plan = Cdc.pointInTimeLookup(facts, dim)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"the lookup itself is one union+window shuffle, not a range join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"no pair explosion:\n$plan")
  }

  test("plans: mergeApply has no window sort; scd2 shuffles once") {
    val mergePlan = Cdc.mergeApply(None, Cdc.eventChangeLog(sf001))
      .queryExecution.executedPlan.toString
    assert(!mergePlan.contains("Window"),
      s"latest-wins must be an agg, not a window:\n$mergePlan")
    val scd2Plan = Cdc.scd2Over(Cdc.eventChangeLog(sf001))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(scd2Plan).length
    assert(exchanges === 1,
      s"both windows must share one exchange:\n$scd2Plan")
  }
}
