package graft.sources

import graft.SparkSpec
import graft.sources.Multimodal._
import org.apache.spark.sql.functions._

/** q164/q165: dHash semantics, pigeonhole-band completeness, the two
  * planted families (identical twins + Hamming gadgets), and
  * engine-vs-brute-force set equality at distinct-hash granularity. */
class ImageNearDupSpec extends SparkSpec {

  test("dhash64 matches the hand-computed gradient signs") {
    // 9x8 identity-resample grid: row r = [r, r+1, ..., r+8] —
    // strictly increasing, so every comparison is 'less' → all 64 bits
    val inc = Array.tabulate(8 * 9)(i => (i % 9 + i / 9).toByte)
    assert(dhash64(9, 8, inc) === -1L) // all 64 bits set
    // constant grid: no strict increase anywhere → hash 0
    val const = Array.fill(8 * 9)(7.toByte)
    assert(dhash64(9, 8, const) === 0L)
    // flip exactly one comparison: row 0, make g(0,1) > g(0,2) —
    // only bit 1 differs from the all-increasing grid
    val oneFlip = inc.clone()
    oneFlip(2) = 0.toByte // g(0,2) < g(0,1): bit1 off; g(0,2) < g(0,3) keeps bit2
    val d = dhash64(9, 8, oneFlip) ^ dhash64(9, 8, inc)
    assert(java.lang.Long.bitCount(d) === 1 && (d & 2L) === 2L)
  }

  test("the synthetic gadget hits Hamming exactly j by construction") {
    def h(j: Int): Long = {
      val (w, ht, px) = BmpCodec.decode(syntheticImage(j))
      dhash64(w, ht, px)
    }
    val base = h(0)
    for (j <- 1 to 3)
      assert(java.lang.Long.bitCount(base ^ h(j)) === j, s"variant $j")
    // pairwise within the quad: |j - i| differing bits
    assert(java.lang.Long.bitCount(h(1) ^ h(3)) === 2)
    assert(java.lang.Long.bitCount(h(2) ^ h(3)) === 1)
  }

  test("4x16-bit banding is pigeonhole-complete to Hamming 3") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong()
      val flips = 1 + rnd.nextInt(3)
      val bits = scala.util.Random.shuffle((0 until 64).toList).take(flips)
      val b = bits.foldLeft(a)((h, i) => h ^ (1L << i))
      val shared = (0 until 4).exists(k =>
        ((a >>> (k * 16)) & 0xFFFFL) === ((b >>> (k * 16)) & 0xFFFFL))
      assert(shared, s"pair at hamming $flips shares no band: $a $b")
    }
  }

  test("every planted identical twin lands in its original's cohort") {
    val cohorts = imageDupCohorts(sf001).cache()
    val twins = sf001.documents.filter(col("doc_id") % 30 === 0).count()
    // each twin contributes one planted member to some cohort; the
    // gadget quads (ids >= 2*PlantOffset) also count as planted
    val gadgetMembers =
      4 * sf001.documents.filter(col("doc_id") % 60 === 0).count()
    val planted = cohorts.agg(sum(col("n_planted"))).head().getLong(0)
    assert(planted === twins + gadgetMembers,
      s"planted=$planted twins=$twins gadgets=$gadgetMembers")
    assert(cohorts.filter(col("n_members") < 2).count() === 0)
  }

  test("near-dup pairs equal brute force over distinct hashes, gadget hammings present") {
    import spark.implicits._
    val hashes = imagesWithPlanted(sf001)
      .map { m =>
        val (w, h, px) = BmpCodec.decode(m.bytes)
        (m.media_id, dhash64(w, h, px))
      }.collect()
    val byHash = hashes.groupBy(_._2).map { case (dh, xs) =>
      dh -> (xs.map(_._1).min, xs.length.toLong) }
    val brute = (for {
      (ha, (repA, nA)) <- byHash; (hb, (repB, nB)) <- byHash
      if ha < hb
      hd = java.lang.Long.bitCount(ha ^ hb)
      if hd >= 1 && hd <= 3
    } yield {
      if (repA < repB) (repA, repB, nA, nB, hd) else (repB, repA, nB, nA, hd)
    }).toSet
    val got = imageNearDups(sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(got === brute)
    assert(got.map(_._5).intersect(Set(1, 2, 3)) === Set(1, 2, 3),
      "the gadget quads must surface hamming 1, 2 AND 3")
  }
}
