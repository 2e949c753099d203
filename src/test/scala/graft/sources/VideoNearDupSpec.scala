package graft.sources

import graft.SparkSpec
import graft.sources.Multimodal._
import org.apache.spark.sql.functions._

/** q190/q191: temporal-majority video fingerprint semantics, the
  * planted unsampled-byte twins and Hamming gadget quads, majority
  * pooling, and engine-vs-brute-force set equality at
  * distinct-fingerprint granularity. */
class VideoNearDupSpec extends SparkSpec {

  test("videoFingerprint matches the single-frame dHash") {
    // one frame: the majority pool of one frame IS its dHash
    val ramp = gadgetRamp(0)
    val video = Y4mCodec.encode(ramp, 64, 8, 1)
    val (w, h, px) = (64, 8, ramp)
    assert(videoFingerprint(video) === dhash64(w, h, px))
    // constant frame: no gradient anywhere → fingerprint 0
    val const = Y4mCodec.encode(Array.fill(512)(42.toByte), 32, 16, 1)
    assert(videoFingerprint(const) === 0L)
  }

  test("majority pooling suppresses a single deviant frame") {
    // three frames at fps=1 (all sampled): two rising ramps agree on
    // every bit, one constant frame dissents — the majority wins and
    // the fingerprint equals the two-frame consensus
    val rising = gadgetRamp(0)
    val flat = Array.fill(512)(42.toByte)
    val agree2 = Y4mCodec.encode(rising ++ rising ++ flat, 64, 8, 1)
    val all3 = Y4mCodec.encode(rising ++ rising ++ rising, 64, 8, 1)
    assert(videoFingerprint(agree2) === videoFingerprint(all3),
      "one dissenting frame flipped a majority bit")
    // ties break to 0: one rising + one flat frame → 1 vote of 2 is
    // NOT a strict majority, every bit drops
    val tied = Y4mCodec.encode(rising ++ flat, 64, 8, 1)
    assert(videoFingerprint(tied) === 0L)
  }

  test("1-fps sampling: unsampled frames cannot influence the hash") {
    // fps=2 over 3 frames samples indices 0 and 2 — frame 1 is never
    // read, so corrupting it leaves the fingerprint untouched
    val rising = gadgetRamp(0)
    val flat = Array.fill(512)(99.toByte)
    val a = Y4mCodec.encode(rising ++ rising ++ rising, 64, 8, 2)
    val b = Y4mCodec.encode(rising ++ flat ++ rising, 64, 8, 2)
    assert(videoFingerprint(a) === videoFingerprint(b))
  }

  test("the frame contract is loud") {
    // 9 frames of 512 bytes exceed the oracle's 8-frame unroll
    intercept[IllegalArgumentException](
      videoFingerprint(Y4mCodec.encode(Array.fill(9 * 512)(1.toByte), 32, 16, 1)))
  }

  test("an unsampled-byte perturbation provably preserves the fingerprint") {
    val rnd = new scala.util.Random(13L)
    for (_ <- 1 to 50) {
      val id = rnd.nextInt(1 << 20).toLong
      val (w, h, fps) = (32 + (id % 8).toInt * 16, 16 + (id % 4).toInt * 16,
        1 + (id % 5).toInt)
      val n = 65 + rnd.nextInt(4000)
      val content = Array.tabulate(n)(_ => (32 + rnd.nextInt(90)).toByte)
      val pert = content.clone()
      pert(1) = (pert(1) + 1).toByte
      assert(videoFingerprint(Y4mCodec.encode(pert, w, h, fps)) ===
        videoFingerprint(Y4mCodec.encode(content, w, h, fps)),
        s"unsampled byte flipped the fingerprint at n=$n w=$w h=$h fps=$fps")
      assert(!pert.sameElements(content))
    }
  }

  test("the synthetic gadget clip hits Hamming exactly j by construction") {
    def fp(j: Int): Long = videoFingerprint(syntheticVideoClip(j))
    val base = fp(0)
    for (j <- 1 to 3)
      assert(java.lang.Long.bitCount(base ^ fp(j)) === j, s"variant $j")
    assert(java.lang.Long.bitCount(fp(1) ^ fp(3)) === 2)
    assert(java.lang.Long.bitCount(fp(2) ^ fp(3)) === 1)
  }

  test("every planted twin lands in its original's cohort") {
    val cohorts = videoDupCohorts(sf001).cache()
    val twins = sf001.documents
      .filter(col("doc_id") % 30 === 2 &&
        length(col("text")).between(65, 4096)).count()
    val gadgetMembers =
      4 * sf001.documents.filter(col("doc_id") % 60 === 2).count()
    val planted = cohorts.agg(sum(col("n_planted"))).head().getLong(0)
    assert(planted === twins + gadgetMembers,
      s"planted=$planted twins=$twins gadgets=$gadgetMembers")
    assert(cohorts.filter(col("n_members") < 2).count() === 0)
  }

  test("near-dup pairs equal brute force, gadget hammings 1..3 present") {
    import spark.implicits._
    val fps = videosWithPlanted(sf001)
      .map(m => (m.media_id, videoFingerprint(m.bytes))).collect()
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
    val got = videoNearDups(sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(got === brute)
    assert(got.map(_._5).intersect(Set(1, 2, 3)) === Set(1, 2, 3),
      "the gadget quads must surface hamming 1, 2 AND 3")
  }
}
