package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount / distinctTokenCount / ttr on known text") {
    val df = Seq("a b c a", "x").toDF("text")
      .select(
        TextFunctions.tokenCount($"text").as("n"),
        TextFunctions.distinctTokenCount($"text").as("d"),
        TextFunctions.typeTokenRatio($"text").as("ttr"))
    val rows = df.collect()
    assert(rows(0).getInt(0) === 4 && rows(0).getInt(1) === 3)
    assert(rows(0).getDouble(2) === 0.75)
    assert(rows(1).getInt(0) === 1 && rows(1).getDouble(2) === 1.0)
  }

  test("stopwordRatio counts only stopwords") {
    val r = Seq("the cat and the hat").toDF("text")
      .select(TextFunctions.stopwordRatio($"text")).head().getDouble(0)
    assert(r === 3.0 / 5.0) // the, and, the
  }

  test("jaccard of identical sets is 1, disjoint sets is 0") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a", "b"), Seq("c", "d"))).toDF("x", "y")
      .select(TextFunctions.jaccard($"x", $"y").as("j"))
    val j = df.collect().map(_.getDouble(0))
    assert(j(0) === 1.0 && j(1) === 0.0)
  }

  test("shingles: k=3 over 5 tokens yields 3 shingles; short text yields none") {
    val rows = Seq("a b c d e", "a b").toDF("text")
      .select(TextFunctions.shingles($"text", 3).as("sh")).collect()
    assert(rows(0).getSeq[String](0) === Seq("a b c", "b c d", "c d e"))
    assert(rows(1).getSeq[String](0).isEmpty)
  }

  test("simhash is deterministic, 64-bit, and identical for identical text") {
    val rows = Seq("spark fast join", "spark fast join", "completely different words here")
      .toDF("text").select(TextFunctions.simhash($"text").as("h")).collect()
    assert(rows(0).getLong(0) === rows(1).getLong(0))
    assert(rows(0).getLong(0) !== rows(2).getLong(0))
  }

  test("hamming distance of a fingerprint with itself is 0") {
    val d = Seq(("x y z", "x y z")).toDF("a", "b")
      .select(TextFunctions.hamming(
        TextFunctions.simhash($"a"), TextFunctions.simhash($"b"))).head().getInt(0)
    assert(d === 0)
  }

  test("cosine: identical vectors → 1, orthogonal → 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("x", "y")
      .select(SimilarityFunctions.cosine($"x", $"y").as("c"))
    val c = df.collect().map(_.getDouble(0))
    assert(math.abs(c(0) - 1.0) < 1e-12 && c(1) === 0.0)
  }

  test("l2Distance on known vectors") {
    val d = Seq((Seq(0.0f, 3.0f), Seq(4.0f, 0.0f))).toDF("x", "y")
      .select(SimilarityFunctions.l2Distance($"x", $"y")).head().getDouble(0)
    assert(d === 5.0)
  }

  test("rollingKgrams matches the direct polynomial definition") {
    val text = "abcdefgh"
    val k = 3
    def direct(s: String): Seq[Long] =
      (0 to s.length - k).map { i =>
        s.substring(i, i + k).foldLeft(0L)((h, c) => (h * 257 + c.toInt) % 1000000007L)
      }
    val got = Seq(text).toDF("text")
      .select(TextFunctions.rollingKgrams($"text", k)).head().getSeq[Long](0)
    assert(got === direct(text))
    // shorter than k → empty
    val empty = Seq("ab").toDF("text")
      .select(TextFunctions.rollingKgrams($"text", k)).head().getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("winnowFingerprints: guarantee — docs sharing a substring of length k+w-1 share a fingerprint") {
    // k=8, w=4: any common substring of length ≥ 11 forces a shared
    // window-min (the winnowing guarantee).
    val common = "sharedrunabc"
    val rows = Seq(s"xxxx$common", s"${common}zzzzzz", "totally unrelated words")
      .toDF("text")
      .select(TextFunctions.winnowFingerprints($"text", 8, 4).as("fp")).collect()
    val a = rows(0).getSeq[Long](0).toSet
    val b = rows(1).getSeq[Long](0).toSet
    val c = rows(2).getSeq[Long](0).toSet
    assert(a.intersect(b).nonEmpty, "common substring must share a fingerprint")
    assert(a.intersect(c).isEmpty, "unrelated text should not collide")
    // sorted + distinct
    assert(rows(0).getSeq[Long](0) === rows(0).getSeq[Long](0).distinct.sorted)
  }

  test("bpeishTokens chunk long words and pass short ones through") {
    val toks = Seq("customer scan, 12345")
      .toDF("text").select(TextFunctions.bpeishTokens($"text")).head().getSeq[String](0)
    assert(toks === Seq("cust", "omer", "scan", ",", "123", "45"))
  }
}

/** Native Catalyst expressions must agree exactly with their HOF
  * reference formulations on real data. */
class NativeExprSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions.col

  test("SimHash64 expression equals HOF simhash on all fixture documents") {
    val docs = sf001.documents
    val both = docs.select(
      TextFunctions.simhash(col("text")).as("native"),
      TextFunctions.simhashHof(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("WinnowFps expression equals HOF winnowing on all fixture documents") {
    val both = sf001.documents.select(
      TextFunctions.winnowFingerprints(col("text"), 8, 4).as("native"),
      TextFunctions.winnowFingerprintsHof(col("text"), 8, 4).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("MinHashSigs expression equals the xxhash64 HOF formulation on fixture shingles") {
    import org.apache.spark.sql.functions._
    val docs = sf001.documents
      .select(TextFunctions.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val hof = array((0 until 12).map(i =>
      array_min(transform(col("sh"), s => xxhash64(s, lit(i))))): _*)
    val both = docs.select(
      call_function("minhash_sigs", col("sh"), lit(12)).as("native"), hof.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("SortedIntersectSize equals size(array_intersect) on sorted fixture word sets") {
    import org.apache.spark.sql.functions._
    val docs = sf001.documents.limit(50)
      .select(array_sort(array_distinct(TextFunctions.tokens(col("text")))).as("w"))
    val pairs = docs.select(col("w").as("a")).crossJoin(docs.select(col("w").as("b")))
    val both = pairs.select(
      call_function("sorted_intersect_size", col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("WordNgrams expression equals the guarded HOF formulation on fixture documents") {
    import org.apache.spark.sql.functions._
    for (k <- Seq(1, 2, 3, 5)) {
      val both = sf001.documents.select(
        TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), k).as("native"),
        TextFunctions.wordNgramsHof(TextFunctions.tokens(col("text")), k).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() === 0, s"k=$k")
    }
    // short-input guard: n < k yields empty, not a descending sequence
    import spark.implicits._
    val short = Seq("one two").toDF("text").select(
      TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), 3).as("ng"))
    assert(short.head().getSeq[String](0) === Seq.empty)
  }

  test("MaxMultiplicity equals the groupBy-count max on exploded fixture bigrams") {
    import org.apache.spark.sql.functions._
    val bi = sf001.documents.select(col("doc_id"),
      TextFunctions.wordNgrams(TextFunctions.tokens(col("text")), 2).as("bi"))
    val native = bi.select(col("doc_id"),
      TextFunctions.maxMultiplicity(col("bi")).as("m"))
    val viaAgg = bi.select(col("doc_id"), explode(col("bi")).as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(max("count").cast("int").as("m_agg"))
    val joined = native.join(viaAgg, "doc_id")
    assert(joined.filter(col("m") =!= col("m_agg")).count() === 0)
  }

  test("SortedIntersectSize null parity: matches array_intersect for trailing nulls") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // sorted distinct arrays: nulls sort last; cases where one walk
    // side exhausts its strings before reaching its null
    val cases = Seq(
      (Seq("b", null), Seq("a", null)),     // builtin: [null] → 1
      (Seq("b", null), Seq("a", "c")),      // no shared → 0
      (Seq[String](null), Seq[String](null)), // [null] → 1
      (Seq("a", "b"), Seq("a", null)),      // ["a"] → 1
      (Seq("a", null), Seq("a", null)))     // ["a", null] → 2
    val df = cases.toDF("a", "b")
    val both = df.select(
      call_function("sorted_intersect_size", $"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).as("builtin"))
    assert(both.filter($"native" =!= $"builtin").count() === 0,
      both.collect().mkString(", "))
  }

  test("factored cosine (hoisted norms) is bit-identical to CosineSim on embeddings") {
    val e = sf001.embeddings.limit(200)
      .select(col("vec_id"), col("embedding"),
        SimilarityFunctions.l2NormNative(col("embedding")).as("nrm"))
    val q = e.select(col("embedding").as("q_emb"), col("nrm").as("q_nrm")).limit(1)
    val both = e.crossJoin(q).select(
      SimilarityFunctions.factoredCosine(
        SimilarityFunctions.dotNative(col("q_emb"), col("embedding")),
        col("q_nrm"), col("nrm")).as("factored"),
      SimilarityFunctions.cosine(col("q_emb"), col("embedding")).as("fused"))
    assert(both.filter(col("factored") =!= col("fused")).count() === 0)
  }

  test("CosineSim expression is bit-identical to the HOF fold on embeddings") {
    val e = sf001.embeddings.limit(200)
    val q = e.select(col("embedding").as("q_emb")).limit(1)
    val both = e.crossJoin(q).select(
      SimilarityFunctions.cosine(col("q_emb"), col("embedding")).as("native"),
      SimilarityFunctions.cosineHof(col("q_emb"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }
}
