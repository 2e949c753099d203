package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts for the corpus-statistics queries (q79/q80) and
  * the z-order layout (q81). Cross-engine value parity is the DuckDB
  * gate's job. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("unigramNll matches a driver-side reference on a tiny corpus") {
    val df = Seq((1L, "a a b"), (2L, "b c"), (3L, "a")).toDF("id", "txt")
    // corpus counts: a=3, b=2, c=1, T=6
    val got = TextOps.unigramNllOver(df, $"id", $"txt")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def nll(p: Double) = -math.log(p)
    val exp = Seq(
      (1L, 3L, (2 * nll(3.0 / 6) + nll(2.0 / 6)) / 3), // fold order: a then b
      (2L, 2L, (nll(2.0 / 6) + nll(1.0 / 6)) / 2),
      (3L, 1L, nll(3.0 / 6)))
    for (((gi, gn, gv), (ei, en, ev)) <- got.zip(exp)) {
      assert(gi === ei && gn === en)
      assert(math.abs(gv - ev) < 1e-12, s"doc $gi: $gv vs $ev")
    }
    // rare-token docs must score higher than common-token docs
    assert(got(1)._3 > got(2)._3)
  }

  test("bigramBackoffNll matches a driver-side reference and exercises all 3 backoff tiers") {
    // train half = even ids: docs 0 and 2. Counts: tokens "a a b" + "a c"
    // → cw: a=3, b=1, c=1, T=5; bigrams "a a","a b","a c" → cb=1 each,
    // cp(a)=3. Doc 1 "a b z" hits: seen bigram? "a b" cb=1 → tier 1;
    // "b z": prev b has no context → z OOV → tier 3.
    val df = Seq((0L, "a a b"), (1L, "a b z"), (2L, "a c")).toDF("id", "txt")
    val got = TextOps.bigramBackoffNllOver(df, $"id", $"txt")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def ln(x: Double) = math.log(x)
    val T = 5.0
    val exp = Seq(
      // doc 0: first "a" (3/5); "a a" 1/3; "a b" 1/3
      (0L, 3, (-ln(3 / T) + -ln(1.0 / 3) + -ln(1.0 / 3)) / 3),
      // doc 1: first "a" (3/5); "a b" 1/3 (seen); "b z": z OOV → 0.4·(1/T)
      (1L, 3, (-ln(3 / T) + -ln(1.0 / 3) + -ln(0.4 * (1.0 / T))) / 3),
      // doc 2: first "a" (3/5); "a c" 1/3
      (2L, 2, (-ln(3 / T) + -ln(1.0 / 3)) / 2))
    for (((gi, gn, gv), (ei, en, ev)) <- got.zip(exp)) {
      assert(gi === ei && gn === en, s"doc $gi")
      assert(math.abs(gv - ev) < 1e-12, s"doc $gi: $gv vs $ev")
    }
    // tier 2 (unseen bigram, known word): doc with "c b" — cb null,
    // cw(b)=1 → 0.4·(1/5); sanity that it scores between tier1 and tier3
    val df2 = Seq((0L, "a a b"), (2L, "a c"), (5L, "c b")).toDF("id", "txt")
    val g2 = TextOps.bigramBackoffNllOver(df2, $"id", $"txt")
      .filter($"doc_id" === 5).head().getDouble(2)
    val e2 = (-ln(1 / T) + -ln(0.4 * (1.0 / T))) / 2
    assert(math.abs(g2 - e2) < 1e-12, s"$g2 vs $e2")
  }

  test("pmiCollocations ranks always-adjacent pairs above independent ones") {
    // "x y" always adjacent (pmi high); "a b" co-occur at chance
    val rows = Seq.fill(10)("x y a") ++ Seq.fill(10)("b a x y") ++ Seq.fill(5)("a b")
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "txt")
    val got = TextOps.pmiCollocationsOver(df, $"txt", minCount = 5L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byBigram = got.map(g => g._1 -> g).toMap
    assert(byBigram.contains("x y"), s"expected 'x y' in top-k: ${got.toSeq}")
    // pmi("x y") = ln(c_ab*N/(c_a*c_b)) = ln(20*N/(20*20)) = ln(N)-ln(20)
    val totalBigrams = rows.map(r => r.split(" ").length - 1).sum
    val expXY = math.log(20.0 * totalBigrams / (20.0 * 20.0))
    assert(math.abs(byBigram("x y")._3 - expXY) < 1e-12)
    // ranks are 1..k contiguous and ordered by pmi desc
    val ranks = got.map(_._4).sorted
    assert(ranks.toSeq === (1 to ranks.length).toSeq)
    val sortedByRank = got.sortBy(_._4).map(_._3)
    assert(sortedByRank.zip(sortedByRank.tail).forall { case (a, b) => a >= b })
  }

  test("zvalue interleaves bits (reference check on small values)") {
    def zRef(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (65535L, 1L), (12345L, 54321L))
    val df = pairs.toDF("x", "y")
    val got = df.select(Bucketing.zvalue($"x", $"y", 16).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === pairs.map { case (x, y) => zRef(x, y, 16) })
    // canonical check: z(x=all ones, y=0) = 0b0101... pattern
    assert(zRef(0xFFFFL, 0L, 16) === 0x55555555L)
  }

  test("z-ordered layout confines a 2-dim range query to fewer files than a linear sort") {
    val li = sf001.lineitem.select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val files = 16
    Bucketing.writeZOrdered(li, s"$dir/z", "l_partkey", "l_suppkey", bits = 16, files = files)
    li.repartitionByRange(files, $"l_orderkey").sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/linear")
    def filesTouched(path: String): Long = {
      val (pLo, pHi) = (20L, 60L)
      val (sLo, sHi) = (2L, 5L)
      spark.read.parquet(path)
        .filter($"l_partkey".between(pLo, pHi) && $"l_suppkey".between(sLo, sHi))
        .select(input_file_name()).distinct().count()
    }
    val (zf, lf) = (filesTouched(s"$dir/z"), filesTouched(s"$dir/linear"))
    info(s"files with matches: z-ordered=$zf linear=$lf (of $files)")
    assert(zf > 0, "range filter should match something")
    assert(zf < lf, s"z-order should confine matches to fewer files: z=$zf linear=$lf")
  }
}
