package graft.expr

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Pins the two contracts the adaptive banding rewrite rides on:
  *
  *  1. bit-identity — [[BandKeys]]' one-pass keys equal the legacy
  *     per-plane column composition (`dot_product` against one array
  *     literal per plane, sign → Σ bit·2^i) for the same plane
  *     matrix, so the rewrite cannot move a vector between buckets;
  *  2. adaptive sizing — [[Dedup.adaptiveBandParams]] keeps expected
  *     bucket occupancy (and with it candidate volume) bounded as n
  *     grows, while the band count satisfies the recall bound.
  */
class BandKeysSpec extends SparkSpec {

  test("band_keys equals the legacy per-plane sign composition bit-for-bit") {
    import spark.implicits._
    val bands = 12; val r = 4; val dim = 64
    val planes = Dedup.bandPlanes(bands, r, dim, seed = 42L)
    val rnd = new scala.util.Random(7)
    val df = (0L until 500L)
      .map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
      .toDF("id", "emb")
    // legacy formulation, verbatim from the pre-rewrite operator
    def signBit(p: Array[Double]) =
      when(call_function("dot_product",
        array(p.map(lit).toIndexedSeq: _*), $"emb") >= 0,
        lit(1)).otherwise(lit(0))
    val legacy = array((0 until bands).map { b =>
      planes(b).zipWithIndex
        .map { case (p, i) => signBit(p) * lit(1 << i) }
        .reduce(_ + _).cast("long")
    }: _*)
    val planesFlat = planes.flatten.flatMap(_.toSeq).toArray
    val native = call_function("band_keys",
      $"emb", lit(planesFlat), lit(r), lit(dim))
    val diff = df.select($"id", legacy.as("l"), native.as("n"))
      .filter($"l" =!= $"n").count()
    assert(diff === 0L)
  }

  test("band_keys rejects non-array input and non-literal planes") {
    import spark.implicits._
    val df = Seq((1L, Array(0.1f, 0.2f))).toDF("id", "emb")
    intercept[Exception] {
      df.select(call_function("band_keys",
        $"id", lit(Array(1.0, 2.0)), lit(1), lit(2))).collect()
    }
    intercept[Exception] {
      df.select(call_function("band_keys",
        $"emb", $"emb", lit(1), lit(2))).collect()
    }
  }

  test("adaptive sizing bounds occupancy and meets the recall bound") {
    for (n <- Seq(10000L, 100000L, 1000000L, 10000000L)) {
      val (b, r) = Dedup.adaptiveBandParams(n, recallCos = 0.9)
      // occupancy n/2^r within [targetOcc/2, targetOcc] by the ceil
      val occ = n.toDouble / (1L << r)
      assert(occ <= 4.0 + 1e-9, s"n=$n r=$r occ=$occ")
      assert(occ > 1.9, s"n=$n r=$r occ=$occ — oversharded")
      // recall at cos 0.9 with the chosen (b, r) clears 1 - 1e-6
      val p = 1.0 - math.acos(0.9) / math.Pi
      val miss = math.pow(1.0 - math.pow(p, r), b)
      assert(miss <= 1e-6 * 1.01, s"n=$n b=$b r=$r miss=$miss")
    }
    // tiny n clamps to the plane floor (the operator never calls this
    // below AdaptiveAbove — sub-threshold corpora keep the caller's
    // fixed sizing verbatim); b still honors the recall bound
    val (bSmall, rSmall) = Dedup.adaptiveBandParams(64L, recallCos = 0.9)
    assert(rSmall === 4)
    assert(bSmall === 18) // ceil(ln 1e-6 / ln(1 - p^4)), p = 1 - acos(.9)/pi
    // round-8 ADVICE: at r = 24 (n ≳ 34M) the bound needs b ≈ 562 —
    // the old maxBands = 512 clamp silently degraded recall; now the
    // default admits it and an insufficient clamp refuses loudly
    val (bBig, rBig) = Dedup.adaptiveBandParams(40000000L, recallCos = 0.9)
    assert(rBig === 24)
    val pBig = 1.0 - math.acos(0.9) / math.Pi
    assert(math.pow(1.0 - math.pow(pBig, rBig), bBig) <= 1e-6 * 1.01,
      s"b=$bBig r=$rBig misses the bound")
    assert(bBig > 512, "the old clamp would have bitten here")
    intercept[IllegalArgumentException] {
      Dedup.adaptiveBandParams(40000000L, recallCos = 0.9, maxBands = 512)
    }
  }

  test("banded near-dup finds planted twins on an above-threshold corpus with adaptive sizing") {
    import spark.implicits._
    val dim = 64
    val rnd = new scala.util.Random(11)
    val n = 6000 // > AdaptiveAbove = 4096 → adaptive path
    val base = (0L until n.toLong).map(i =>
      i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
    val twins = (0L until 25L).map { i =>
      (100000L + i) -> base(i.toInt)._2.map(v => v + 0.012f * rnd.nextGaussian().toFloat)
    }
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupsBanded(
      df, $"vec_id", $"embedding", minCos = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 25L).map(i => (i, 100000L + i)).toSet
    // cos≈0.999 twins: per-pair miss under the adaptive (b, r) is
    // ≪ 1e-6 — the seeded run finds every planted pair, and random
    // 6k-vector noise contributes no pairs at 0.95
    assert(got === want)
    // round-8 ADVICE regression: minCos = 1.0 above AdaptiveAbove used
    // to feed recallCos = 1 into adaptiveBandParams' require and throw;
    // the 0.999 clamp makes exact-duplicate search work again (the
    // ≈0.999-cos twins are not exact, so a strict filter finds nothing)
    val exact = Dedup.embeddingNearDupsBanded(
      df, $"vec_id", $"embedding", minCos = 1.0)
      .collect()
    assert(exact.forall(_.getDouble(2) >= 1.0))
  }
}
