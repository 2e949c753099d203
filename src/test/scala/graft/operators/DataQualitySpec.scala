package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q173 (FK-integrity audit) and q174 (staleness-bounded as-of). */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("fkAuditEdge counts orphan rows and distinct orphan keys") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Relational.fkAuditEdge("t", child, $"fk", parent, $"pk").head()
    // null FK is not a violation (SQL FK semantics) and not counted
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((5L, 2L, 1L)))
  }

  test("q173: fixture edges are clean, the planted edge fires exactly") {
    val r = Relational.fkAudit(sf001).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    val clean = r.filterNot(_._1.startsWith("planted"))
    assert(clean.values.forall { case (_, orphanRows, orphanKeys) =>
      orphanRows == 0 && orphanKeys == 0 },
      s"driver fixtures should be referentially clean: $clean")
    val (nRows, orphanRows, orphanKeys) = r("planted.l_orderkey->orders")
    // every lineitem row whose order key divides by 1000 was re-pointed
    val expected = sf001.lineitem
      .filter($"l_orderkey" % 1000 === 0).count()
    val expectedKeys = sf001.lineitem
      .filter($"l_orderkey" % 1000 === 0)
      .select($"l_orderkey").distinct().count()
    assert(orphanRows === expected && orphanKeys === expectedKeys)
    assert(nRows === sf001.lineitem.count())
  }

  test("joinPriorWithin nulls matches older than the bound, keeps fresh ones") {
    val left = Seq((1L, 1000000L, 10L), (1L, 5000000L, 11L))
      .toDF("k", "ts", "lv")
      .select($"k", timestamp_micros($"ts").as("ts"), $"lv")
    val right = Seq((1L, 900000L, 77L))
      .toDF("k", "ts", "rv")
      .select($"k", timestamp_micros($"ts").as("ts"), $"rv")
    // bound 1 s: the 0.1 s-old match survives for ts=1e6, the 4.1 s-old
    // one is discarded for ts=5e6
    val got = AsOfJoin.joinPriorWithin(left, right, "k", "ts", "ts",
        "lv", "rv", maxAgeUs = 1000000L)
      .orderBy($"lv").collect()
    assert(got(0).getLong(3) === 77L)
    assert(got(1).isNullAt(3) && got(1).isNullAt(4),
      "stale match must clear both value and timestamp")
  }

  test("q174 is q40 with stale matches demoted to the sentinel") {
    val strict = AsOfJoin.errorsAfterFreshClicks(sf001)
    val loose = AsOfJoin.errorsAfterClicks(sf001)
    // same error universe; every fresh match agrees with q40, every
    // demotion corresponds to a q40 match older than the bound
    assert(strict.count() === loose.count())
    val j = strict.as("s").join(loose.as("l"),
      $"s.user_id" === $"l.user_id" && $"s.error_id" === $"l.error_id")
    val disagree = j.filter($"s.click_id" =!= $"l.click_id" &&
      $"s.click_id" =!= -1L).count()
    assert(disagree === 0, "a fresh match must equal the unbounded as-of")
    // demotions exist at fixture scale and each one is genuinely stale:
    // the q40 match it suppressed is > 6 h older than the error itself
    import graft.functions.TimeFunctions.tsMicros
    val demoted = j.filter($"s.click_id" === -1L && $"l.click_id" =!= -1L)
      .join(sf001.events.select($"event_id".as("__eid"),
        $"ts".as("error_ts")), $"s.error_id" === $"__eid")
    assert(demoted.count() > 0, "fixture should produce some stale matches")
    val wrongDemotion = demoted.filter(
      tsMicros($"error_ts") - tsMicros($"l.click_ts") <= 21600000000L).count()
    assert(wrongDemotion === 0, "a demoted match must actually be stale")
  }

  test("robustOutliers: hand-computed median/MAD, outliers counted, mean-blindness") {
    // group g: values 1..9 plus a wild 1000 — med = 5.5? no: type-1
    // median of 10 values = value at ceil(0.5*10)=5 → 5; devs
    // {4,3,2,1,0,1,2,3,4,995}, mad = value at ceil(0.5*10)=5 of
    // sorted devs {0,1,1,2,2,3,3,4,4,995} → 2
    // outlier: dev*0.6745 > 3.5*2=7 → dev > 10.38 → only 995
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _))
      .toDF("grp", "v")
    val r = Relational.robustOutliersOver(df, $"grp", $"v").head()
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 5.0, "type-1 median")
    assert(r.getDouble(3) === 2.0, "MAD")
    assert(r.getLong(4) === 1L, "exactly the wild point is an outlier")
    // a classical z-score with the same 3.5 bar misses it: the wild
    // point inflates stddev (~313) so |z| ≈ 3.02 < 3.5
    val (mean, std) = {
      val vs = ((1 to 9).map(_.toDouble) :+ 1000.0)
      val m = vs.sum / vs.length
      (m, math.sqrt(vs.map(x => (x - m) * (x - m)).sum / vs.length))
    }
    assert((1000.0 - mean) / std < 3.5, "sanity: the naive rule is blind here")
  }

  test("benford: digits partition the rows, frequencies sum to 1, Benford data fits") {
    import spark.implicits._
    // synthetic Benford-distributed sample: k uniform in log-space →
    // floor(10^u) leading digits follow the law closely
    val vals = (0 until 9000).map { i =>
      math.floor(math.pow(10.0, 2 + (i + 0.5) / 9000.0 * 3)).toLong
    }
    val r = Relational.benfordAuditOver(vals.toDF("v"), $"v")
      .orderBy($"digit").collect()
    assert(r.map(_.getInt(0)).toSeq == (1 to 9))
    assert(r.map(_.getLong(1)).sum === 9000L)
    assert(math.abs(r.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    // log-uniform data obeys Benford almost exactly
    assert(r.forall(_.getDouble(4) < 0.01),
      s"log-uniform sample should fit Benford: ${r.map(_.getDouble(4)).toSeq}")
    // non-positive values are excluded; ALL NINE digit rows emit even
    // when only {5} occurs — an absent digit surfaces at freq 0 with
    // abs_dev = expected (the strongest fabrication signal)
    val one = Relational.benfordAuditOver(
      Seq(-3L, 0L, 55L).toDF("v"), $"v").orderBy($"digit").collect()
    assert(one.length === 9 && one.map(_.getInt(0)).toSeq == (1 to 9))
    assert(one(4).getLong(1) === 1L && one(4).getDouble(2) === 1.0)
    assert(one.filter(_.getInt(0) != 5).forall(r =>
      r.getLong(1) === 0L && r.getDouble(2) === 0.0 &&
        r.getDouble(4) === r.getDouble(3)))
  }

  test("keySkewProfile: uniform keys balance ~1, constant key balances 0") {
    import spark.implicits._
    // 4 keys x 25 rows: perfectly uniform
    val uni = (0 until 100).map(i => i % 4).toDF("k")
    val u = Skew.keySkewProfileOver(uni, "u", $"k").head()
    assert(u.getLong(1) === 100L && u.getLong(2) === 4L &&
      u.getLong(3) === 25L && u.getDouble(4) === 0.25)
    assert(math.abs(u.getDouble(5) - math.log(4.0)) < 1e-9, "entropy = ln 4")
    assert(math.abs(u.getDouble(6) - 1.0) < 1e-9, "uniform balance = 1")
    // one key owns the table: entropy 0, balance NULL (single key)
    val one = Skew.keySkewProfileOver(Seq.fill(50)("x").toDF("k"), "o", $"k").head()
    assert(one.getDouble(4) === 1.0 && one.getDouble(5) === 0.0 && one.isNullAt(6))
    // 90/10 split ranks LESS balanced than 50/50
    val even = Skew.keySkewProfileOver(
      ((1 to 50).map(_ => "a") ++ (1 to 50).map(_ => "b")).toDF("k"), "e", $"k")
      .head().getDouble(6)
    val skewed = Skew.keySkewProfileOver(
      ((1 to 90).map(_ => "a") ++ (1 to 10).map(_ => "b")).toDF("k"), "s", $"k")
      .head().getDouble(6)
    assert(even > skewed && math.abs(even - 1.0) < 1e-9)
    // fixture sanity: l_returnflag (3 heavy values) is far less
    // balanced per-key-count than the near-uniform part key
    val prof = Skew.joinKeySkewProfile(sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(prof("lineitem.l_partkey") > prof("lineitem.l_returnflag") ||
      prof("lineitem.l_returnflag") > 0.9, // 3 near-equal flags are balanced too
      s"unexpected profile: $prof")
    assert(prof.values.forall(b => b >= 0.0 && b <= 1.0 + 1e-12))
  }

  test("twap: hand computation, tie segments, single-obs exclusion") {
    // key 1: v=100 cents held 10 µs, v=300 held 30 µs →
    //   twap = (100·10 + 300·30)/40/100 = (1000+9000)/40/100 = 2.5
    // key 2: single observation → no segments → absent
    val obs = Seq(
      (1L, 0L, 1.00, 1L), (1L, 10L, 3.00, 2L), (1L, 40L, 9.99, 3L),
      (2L, 0L, 5.0, 4L)).toDF("k", "us", "v", "tie")
    val got = EventOps.twapOver(obs, $"k", $"us",
        floor($"v" * 100 + 0.5).cast("long"), $"tie")
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L &&
      r.getLong(2) === 40L && r.getDouble(3) === 2.5)
  }

  // ── PSI drift (q197) ────────────────────────────────────────────────

  test("psi: identical distributions score exactly 0; shifts score > 0") {
    import spark.implicits._
    // group "same": A and B identically distributed over buckets 0/1
    // → every smoothed p_A = p_B → each term ln(1) = 0 → PSI = 0.0
    val same = Seq.tabulate(40)(i => ("same", i >= 20, i % 2))
    // group "shift": A all in bucket 0, B all in bucket 1 — maximal
    // movement; smoothing keeps every term finite
    val shift = Seq.tabulate(40)(i => ("shift", i >= 20, if (i >= 20) 1 else 0))
    // group "only_a": baseline only — must be DROPPED (no comparison)
    val onlyA = Seq.tabulate(5)(i => ("only_a", false, i % 2))
    val df = (same ++ shift ++ onlyA).toDF("g", "b", "k")
    val got = Relational.psiDriftOver(df, col("g"), col("b"), col("k"), 4)
      .orderBy("g").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("same", "shift"),
      "a group missing period B must produce no row")
    assert(got(0).getDouble(3) === 0.0, s"identical dists: ${got(0)}")
    assert(got(1).getDouble(3) > 1.0, s"total shift must score large: ${got(1)}")
    assert(got(0).getLong(1) === 20L && got(0).getLong(2) === 20L)
    // zero-count buckets (2, 3) existed in the grid on both sides and
    // produced finite terms — the smoothing contract
    assert(!got(1).getDouble(3).isInfinite && !got(1).getDouble(3).isNaN)
  }

  test("psi fails loudly on a bucket value outside [0, nBuckets)") {
    import spark.implicits._
    // an out-of-range bucket would inflate the period totals while
    // silently missing from the K-bucket grid — understated PSI with
    // no symptom; the operator must raise instead
    val df = (Seq.tabulate(20)(i => ("g", i >= 10, i % 3)) :+ ("g", true, -1))
      .toDF("g", "b", "k")
    val e = intercept[Exception] {
      Relational.psiDriftOver(df, col("g"), col("b"), col("k"), 4).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("outside [0, 4)"),
      s"expected the range raise, got: ${e.getMessage}")
  }

  test("psi matches a driver-side replay with the same smoothing and fold") {
    import spark.implicits._
    val got = Relational.eventValuePsi(sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val rows = sf001.events.select($"event_type", $"ts", $"value").collect()
      .map(r => (r.getString(0),
        !r.getTimestamp(1).before(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")),
        math.min(math.floor(r.getDouble(2) / 60.0), 9.0).toInt))
    for ((g, grp) <- rows.groupBy(_._1)) {
      val (bs, as_) = grp.partition(_._2)
      val na = as_.length.toLong
      val nb = bs.length.toLong
      val psi = (0 until 10).map { k =>
        val ca = as_.count(_._3 == k).toLong
        val cb = bs.count(_._3 == k).toLong
        val pa = (ca + 1).toDouble / (na + 10).toDouble
        val pb = (cb + 1).toDouble / (nb + 10).toDouble
        math.floor((pb - pa) * graft.expr.GlibcLog.log(pb / pa)
          * 1099511627776.0 + 0.5).toLong
      }.sum.toDouble / 1099511627776.0
      val (gna, gnb, gpsi) = got(g)
      assert(gna === na && gnb === nb)
      assert(gpsi === psi, s"$g: $gpsi vs $psi")
    }
  }
}
