package graft.sources

import graft.SparkSpec
import graft.sources.Multimodal._
import org.apache.spark.sql.functions._

/** q183/q184: audio frame-sum fingerprint semantics, the planted
  * slice-sum-preserving twins and Hamming gadget quads, and
  * engine-vs-brute-force set equality at distinct-fingerprint
  * granularity. */
class AudioNearDupSpec extends SparkSpec {

  test("audioFingerprint matches hand-computed envelope-gradient signs") {
    // strictly rising envelope: slice sums increase → all 64 bits set
    val rising = Array.tabulate(520)(p => (32 + p / 8).toByte)
    assert(audioFingerprint(rising) === -1L)
    // constant clip: no strict increase anywhere → fingerprint 0
    val const = Array.fill(130)(42.toByte)
    assert(audioFingerprint(const) === 0L)
    // length contract is loud on both ends
    intercept[IllegalArgumentException](
      audioFingerprint(Array.fill(64)(1.toByte)))
    intercept[IllegalArgumentException](
      audioFingerprint(Array.fill(4097)(1.toByte)))
  }

  test("a same-slice +1/-1 perturbation provably preserves the fingerprint") {
    val rnd = new scala.util.Random(11L)
    for (_ <- 1 to 50) {
      val n = 66 + rnd.nextInt(500)
      val clip = Array.tabulate(n)(_ => (32 + rnd.nextInt(90)).toByte)
      val pert = clip.clone()
      // positions 0 and 1 share slice 0 whenever n >= 66 (65/n < 1)
      pert(0) = (pert(0) + 1).toByte
      pert(1) = (pert(1) - 1).toByte
      assert(audioFingerprint(pert) === audioFingerprint(clip),
        s"same-slice perturbation changed the fingerprint at n=$n")
      // a CROSS-slice +1 (last position, slice 64) may flip bit 63 —
      // just confirm samples genuinely differ in the preserved case
      assert(!pert.sameElements(clip))
    }
  }

  test("the synthetic gadget clip hits Hamming exactly j by construction") {
    def fp(j: Int): Long = {
      val (_, samples) = WavCodec.decode(syntheticClip(j))
      audioFingerprint(samples)
    }
    val base = fp(0)
    assert(base === -1L, "variant 0 is the all-rising envelope")
    for (j <- 1 to 3)
      assert(java.lang.Long.bitCount(base ^ fp(j)) === j, s"variant $j")
    // pairwise within the quad: |j - i| differing bits (nested flips)
    assert(java.lang.Long.bitCount(fp(1) ^ fp(3)) === 2)
    assert(java.lang.Long.bitCount(fp(2) ^ fp(3)) === 1)
  }

  test("every planted twin lands in its original's cohort") {
    val cohorts = audioDupCohorts(sf001).cache()
    val twins = sf001.documents
      .filter(col("doc_id") % 30 === 1 &&
        length(col("text")).between(65, 4096)).count()
    val gadgetMembers =
      4 * sf001.documents.filter(col("doc_id") % 60 === 1).count()
    val planted = cohorts.agg(sum(col("n_planted"))).head().getLong(0)
    assert(planted === twins + gadgetMembers,
      s"planted=$planted twins=$twins gadgets=$gadgetMembers")
    assert(cohorts.filter(col("n_members") < 2).count() === 0)
  }

  test("near-dup pairs equal brute force, gadget hammings 1..3 present") {
    import spark.implicits._
    val fps = audiosWithPlanted(sf001)
      .map { m =>
        val (_, samples) = WavCodec.decode(m.bytes)
        (m.media_id, audioFingerprint(samples))
      }.collect()
    val byFp = fps.groupBy(_._2).map { case (fp, xs) =>
      fp -> (xs.map(_._1).min, xs.length.toLong) }
    val brute = (for {
      (fa, (repA, nA)) <- byFp; (fb, (repB, nB)) <- byFp
      if fa < fb
      hd = java.lang.Long.bitCount(fa ^ fb)
      if hd >= 1 && hd <= 3
    } yield {
      if (repA < repB) (repA, repB, nA, nB, hd) else (repB, repA, nB, nA, hd)
    }).toSet
    val got = audioNearDups(sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(got === brute)
    assert(got.map(_._5).intersect(Set(1, 2, 3)) === Set(1, 2, 3),
      "the gadget quads must surface hamming 1, 2 AND 3")
  }
}
