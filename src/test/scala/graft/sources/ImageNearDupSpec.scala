package graft.sources

import graft.SparkSpec
import graft.sources.Multimodal._
import org.apache.spark.sql.functions._

/** q164: dHash semantics, pigeonhole-band completeness, planted-twin
  * invariance, and engine-vs-brute-force pair-set equality. */
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

  test("planted twins hash identically (thumbnail-invisible edit) and are all recovered") {
    val pairs = imageNearDups(sf001).cache()
    val planted = pairs.filter(col("planted"))
    val expected = sf001.documents.filter(col("doc_id") % 30 === 0).count()
    assert(planted.count() === expected,
      s"every planted twin must pair with its original")
    assert(planted.filter(col("hamming") =!= 0).count() === 0,
      "the unsampled-byte edit must leave the dHash unchanged")
    // and the planted pair really is (id, id + offset)
    assert(planted.filter(col("id_b") =!= col("id_a") + PlantOffset).count() === 0)
  }

  test("banded pair set equals brute force over the decoded hashes") {
    import spark.implicits._
    val hashes = imagesWithPlanted(sf001)
      .map { m =>
        val (w, h, px) = BmpCodec.decode(m.bytes)
        (m.media_id, dhash64(w, h, px))
      }.collect()
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb))).toSet
    val got = imageNearDups(sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
  }
}
