package graft

import graft.functions.{SimilarityFunctions, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.4): ScalaCheck generators
  * drawn at fixed seeds, evaluated through the real Catalyst
  * expressions. (The scalatestplus bridge isn't resolvable offline, so
  * generation is driven directly.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val sentence: Gen[String] =
    Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("token counts: distinct ≤ total, ttr ∈ (0,1], stopword ratio ∈ [0,1]") {
    val rows = samples(sentence, 60).toDF("text").select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.distinctTokenCount($"text").as("d"),
      TextFunctions.typeTokenRatio($"text").as("ttr"),
      TextFunctions.stopwordRatio($"text").as("sr")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) <= r.getInt(0))
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0)
    }
  }

  test("jaccard is symmetric, bounded, and 1 on self") {
    val wordList = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, word))
    val pairs = samples(Gen.zip(wordList, wordList), 40)
    val rows = pairs.toDF("a", "b").select(
      TextFunctions.jaccard(array_distinct($"a"), array_distinct($"b")).as("ab"),
      TextFunctions.jaccard(array_distinct($"b"), array_distinct($"a")).as("ba"),
      TextFunctions.jaccard(array_distinct($"a"), array_distinct($"a")).as("aa")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(2) === 1.0)
    }
  }

  test("simhash is a bag property: token permutation preserves the hash") {
    val lists = samples(Gen.choose(2, 20).flatMap(n => Gen.listOfN(n, word)), 30)
    val rnd = new scala.util.Random(7)
    val df = lists.map { ws =>
      (ws.mkString(" "), rnd.shuffle(ws).mkString(" "))
    }.toDF("a", "b").select(
      TextFunctions.simhash($"a").as("ha"),
      TextFunctions.simhash($"b").as("hb"))
    assert(df.filter($"ha" =!= $"hb").count() === 0)
  }

  test("cosine bounded in [-1,1]; exactly ~1 on self for nonzero vectors") {
    val vec = Gen.listOfN(8, Gen.choose(-10.0, 10.0)).map(_.map(_.toFloat))
      .retryUntil(v => v.exists(_ != 0f))
    val pairs = samples(Gen.zip(vec, vec), 40)
    val rows = pairs.toDF("a", "b").select(
      SimilarityFunctions.cosine($"a", $"b").as("ab"),
      SimilarityFunctions.cosine($"a", $"a").as("aa")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= -1.0000001 && r.getDouble(0) <= 1.0000001)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    }
  }

  test("month_day lands in [101, 1231] for arbitrary dates") {
    val rows = samples(Gen.choose(0L, 20000L), 100).toDF("d")
      .select(to_timestamp(date_add(lit("1970-01-01").cast("date"), $"d".cast("int"))).as("Date"))
      .select((month($"Date") * 100 + dayofmonth($"Date")).cast("int").as("md"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) >= 101 && r.getInt(0) <= 1231))
  }

  test("winnowing guarantee: random docs sharing a (k+w-1)-char substring share a fingerprint") {
    // plant a common 11-char run inside otherwise-random text (k=8, w=4)
    val chunk: Gen[String] =
      Gen.listOfN(11, Gen.alphaLowerChar).map(_.mkString)
    val filler: Gen[String] =
      Gen.choose(5, 40).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val cases = samples(Gen.zip(chunk, filler, filler), 30)
    val rows = cases.map { case (c, f1, f2) => (f1 + c, c + f2) }
      .toDF("a", "b").select(
        TextFunctions.winnowFingerprints($"a", 8, 4).as("fa"),
        TextFunctions.winnowFingerprints($"b", 8, 4).as("fb"))
      .select(size(array_intersect($"fa", $"fb")).as("shared")).collect()
    rows.foreach(r => assert(r.getInt(0) >= 1))
  }

  test("minhash signatures: sig(A ∪ B) = element-wise min(sig(A), sig(B))") {
    val wordList = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, word))
    val pairs = samples(Gen.zip(wordList, wordList), 30)
    val rows = pairs.toDF("a", "b").select(
      call_function("minhash_sigs", array_union($"a", $"b"), lit(8)).as("u"),
      zip_with(
        call_function("minhash_sigs", $"a", lit(8)),
        call_function("minhash_sigs", $"b", lit(8)),
        (x, y) => least(x, y)).as("m"))
    assert(rows.filter($"u" =!= $"m").count() === 0)
  }

  test("sorted intersect size equals builtin intersect on random sorted word sets") {
    val wordList = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, word))
    val pairs = samples(Gen.zip(wordList, wordList), 40)
    val rows = pairs.toDF("a", "b").select(
      call_function("sorted_intersect_size",
        array_sort(array_distinct($"a")), array_sort(array_distinct($"b"))).as("native"),
      size(array_intersect(array_distinct($"a"), array_distinct($"b"))).as("builtin"))
    assert(rows.filter($"native" =!= $"builtin").count() === 0)
  }

  test("word_ngrams: count, order, and reconstruction on random token lists") {
    val wordList = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, word))
    val lists = samples(wordList, 50)
    for (k <- Seq(2, 3)) {
      val rows = lists.map(ws => (ws, ws.length)).toDF("toks", "n").select(
        $"toks", $"n", TextFunctions.wordNgrams($"toks", k).as("ng")).collect()
      rows.foreach { r =>
        val toks = r.getSeq[String](0)
        val ng = r.getSeq[String](2)
        val expected = if (toks.length < k) Seq.empty
          else toks.sliding(k).map(_.mkString(" ")).toSeq
        assert(ng === expected, s"k=$k toks=$toks")
      }
    }
  }

  test("max_multiplicity equals the true histogram max on random lists with repeats") {
    val smallVocab = Gen.oneOf("a", "b", "c", "d")
    val lists = samples(Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, smallVocab)), 50)
    val rows = lists.toDF("l").select($"l",
      TextFunctions.maxMultiplicity($"l").as("m")).collect()
    rows.foreach { r =>
      val l = r.getSeq[String](0)
      val want = if (l.isEmpty) 0 else l.groupBy(identity).values.map(_.size).max
      assert(r.getInt(1) === want, s"list=$l")
    }
  }

  test("packing: start offsets are a prefix sum, windows cover each doc exactly") {
    val got = graft.operators.PipelineOps.packWindows(sf001, windowTokens = 64)
      .orderBy("doc_id").collect()
    var cum = 0L
    got.foreach { r =>
      val (n, start, ws, we) = (r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4))
      assert(start === cum, s"doc ${r.getLong(0)}: prefix sum broken")
      assert(ws === (start / 64).toInt && we === ((start + n - 1) / 64).toInt)
      assert(ws <= we)
      cum += n
    }
  }

  test("connected components agree with a union-find reference on random graphs") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = graft.operators.Dedup.connectedComponents(
          (0L until n.toLong).toDF("id"), edges.toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === want)
    }
  }

  test("connected components: materialized edge set is caller-plan-blind (round-14 checkpoint + broadcast path)") {
    // round 14 replaced the loop's cached edge frame with an observed
    // localCheckpoint plus a count-driven broadcast hint — this pins
    // that (a) a heavily DERIVED lazy edge plan (joins + distinct, the
    // ER-chain shape whose per-round re-analysis the change removes)
    // labels identically to the same edges given as a plain local
    // frame, and (b) the empty-edge-set path (observed count 0, empty
    // broadcast) still yields all-singleton components.
    val nodes = spark.range(12L).toDF("id")
    val raw = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 10L)).toDF("id_a", "id_b")
    // derived plan: the same pairs reached through a self-join +
    // union + distinct chain (duplicates and both orientations)
    val derived = raw.union(raw.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .join(nodes.select(col("id").as("id_a")), Seq("id_a"))
      .distinct()
    def labelsOf(e: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.connectedComponents(nodes, e)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labelsOf(derived) === labelsOf(raw))
    val empty = labelsOf(raw.filter(col("id_a") < 0))
    assert(empty === (0L until 12L).map(i => i -> i).toMap,
      "no edges => every node is its own component")
  }

  test("connected components converge on a 3000-diameter path via pointer jumping, and fail loudly under budget") {
    // a path graph 0-1-2-...-3000: pure one-hop propagation would need
    // ~3000 rounds (>> maxIters=100); the pointer-jumping escape makes
    // rounds O(log diameter), so the default budget converges easily
    val n = 3001L
    val nodes = spark.range(n).toDF("id")
    val edges = spark.range(n - 1).selectExpr("id AS id_a", "id + 1 AS id_b")
    val got = graft.operators.Dedup.connectedComponents(
        nodes, edges, edgesWithinNodes = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === n.toInt)
    assert(got.forall(_._2 === 0L), "all path nodes must join component 0")
    // when the budget genuinely is too small, the failure is LOUD —
    // never a silent cap that would return inconsistent labels
    val e = intercept[IllegalStateException] {
      graft.operators.Dedup.connectedComponents(
        nodes, edges, maxIters = 3, edgesWithinNodes = true).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  // Encoding-tolerant timestamp read: a TIMESTAMP column collects as
  // java.sql.Timestamp, a TIMESTAMP_NTZ one as LocalDateTime (seen
  // when a fixture regeneration flips the parquet encoding; Tables
  // normalizes, but the spec should not ClassCastException if it
  // ever reads an un-normalized frame — interpret NTZ as UTC, the
  // pinned session zone).
  private def tsAt(r: org.apache.spark.sql.Row, i: Int): java.sql.Timestamp =
    r.get(i) match {
      case t: java.sql.Timestamp => t
      case d: java.time.LocalDateTime =>
        java.sql.Timestamp.from(d.toInstant(java.time.ZoneOffset.UTC))
      case other => fail(s"not a timestamp at $i: $other")
    }

  test("PassJoin fuzzy pairs equal the brute-force blocked join under adversarial edits") {
    // the candidate generation's pigeonhole completeness is the risky
    // half of the round-7 q84 rewrite — exercise it with the edit
    // shapes that stress segment alignment: substitutions, char
    // ins/del, SPACE deletion (merges two words), SPACE insertion
    // (splits a word), edits at segment boundaries, and double edits
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "fox", "golf", "hotel", "india", "jul")
    def name(): String =
      (0 until 3 + rnd.nextInt(3)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def edit(s: String): String = {
      if (s.isEmpty) s
      else rnd.nextInt(5) match {
        case 0 => // substitute
          val i = rnd.nextInt(s.length)
          s.updated(i, ('a' + rnd.nextInt(26)).toChar)
        case 1 => // delete (spaces included — word merges)
          val i = rnd.nextInt(s.length)
          s.substring(0, i) + s.substring(i + 1)
        case 2 => // insert a letter
          val i = rnd.nextInt(s.length + 1)
          s.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + s.substring(i)
        case 3 => // insert a SPACE — splits a word
          val i = rnd.nextInt(s.length + 1)
          s.substring(0, i) + ' ' + s.substring(i)
        case _ => // boundary substitution (first/last char of a word)
          val ws = s.split(" ")
          val w = rnd.nextInt(ws.length)
          if (ws(w).isEmpty) s
          else {
            val c = ('a' + rnd.nextInt(26)).toChar
            ws(w) = if (rnd.nextBoolean()) c + ws(w).tail else ws(w).init + c
            ws.mkString(" ")
          }
      }
    }
    val rows = (0 until 120).flatMap { i =>
      val base = name()
      val once = edit(base)
      val twice = edit(once)
      Seq((i * 10L, s"B${i % 3}", base), (i * 10L + 1, s"B${i % 3}", once),
        (i * 10L + 2, s"B${i % 3}", twice))
    }
    val df = rows.toDF("id", "block", "nm")
    val got = graft.operators.Relational
      .fuzzyPairsOver(df, $"id", $"block", $"nm", maxDist = 2)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all same-block id pairs with lev ≤ 2
    val byBlock = rows.groupBy(_._2)
    val want = byBlock.values.flatMap { g =>
      for {
        a <- g; b <- g
        if a._1 < b._1
        ed = org.apache.commons.text.similarity.LevenshteinDistance
          .getDefaultInstance.apply(a._3, b._3)
        if ed <= 2
      } yield (a._1, b._1)
    }.toSet
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }

  test("fuzzy pairs: empty names, null names, and maxDist = 0 (round-8 ADVICE)") {
    // round-7 regression: probe lengths started at greatest(1, len−d),
    // so the l = 0 index entry was never probed and two ids sharing an
    // empty name lost their lev-0 pair; maxDist = 0 threw outright
    val rows: Seq[(Long, String, String)] = Seq(
      (1L, "B", ""), (2L, "B", ""),            // reflexive empty pair
      (3L, "B", "a"), (4L, "B", "ab"),         // short names near empty
      (5L, "B", "abc"), (6L, "B", "abd"),
      (7L, "B", "abc"),                        // exact dup of id 5
      (8L, "C", ""))                           // empty in another block
    val df = rows.toDF("id", "block", "nm")
      .union(Seq((9L, "B", null.asInstanceOf[String])).toDF("id", "block", "nm"))
    def pairs(d: Int): Set[(Long, Long)] = graft.operators.Relational
      .fuzzyPairsOver(df, $"id", $"block", $"nm", maxDist = d)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def brute(d: Int): Set[(Long, Long)] = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._2 == b._2
      ed = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(a._3, b._3)
      if ed <= d
    } yield (a._1, b._1)).toSet
    for (d <- 0 to 3)
      assert(pairs(d) === brute(d), s"maxDist=$d")
    assert(pairs(0) === Set((1L, 2L), (5L, 7L)))
    assert(pairs(1).contains((1L, 2L)) && pairs(1).contains((2L, 3L)))
    assertThrows[IllegalArgumentException] {
      graft.operators.Relational.fuzzyPairsOver(df, $"id", $"block", $"nm", -1)
    }
  }

  test("overlap join equals the brute-force range join for adversarial interval shapes") {
    // shapes that stress the bucket trick: intervals spanning many
    // buckets, nested, touching (end == start: NOT an overlap),
    // identical, sub-bucket, and straddling bucket boundaries
    val rnd = new scala.util.Random(23)
    val bucket = 100L
    def intervals(n: Int, tag: Long): Seq[(Long, Long, Long, Long)] =
      (0 until n).map { i =>
        val s = rnd.nextInt(2000).toLong
        val len = rnd.nextInt(3) match {
          case 0 => 1L + rnd.nextInt(30)        // sub-bucket
          case 1 => 100L + rnd.nextInt(150)     // straddles boundaries
          case _ => 400L + rnd.nextInt(500)     // many buckets
        }
        (tag * 1000 + i, (i % 4).toLong, s, s + len)
      }
    val ls = intervals(150, 1) ++ Seq((9001L, 0L, 100L, 200L))
    val rs = intervals(150, 2) ++ Seq(
      (9002L, 0L, 200L, 300L),  // touches 9001 exactly: no overlap
      (9003L, 0L, 100L, 200L))  // identical to 9001: full overlap
    val ldf = ls.toDF("id", "k", "s", "e")
    val rdf = rs.toDF("id", "k", "s", "e")
    val got = graft.operators.EventOps.overlapJoinOver(
      ldf, $"id", $"k", $"s", $"e", rdf, $"id", $"k", $"s", $"e", bucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val want = (for {
      (li, lk, lsv, le) <- ls
      (ri, rk, rsv, re) <- rs
      if lk == rk && lsv < re && rsv < le
    } yield (li, ri, math.min(le, re) - math.max(lsv, rsv))).toSet
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty && got.contains((9001L, 9003L, 100L)))
    assert(!got.exists(p => p._1 == 9001L && p._2 == 9002L), "touching pair leaked")
  }

  test("as-of join: every match is the max right-ts ≤ left-ts within the key") {
    val t = sf001
    val out = graft.operators.AsOfJoin.errorsAfterClicks(t).collect()
    val clicks = t.events.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), tsAt(r, 2)))
    val errors = t.events.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts").collect()
      .map(r => (r.getLong(0), (r.getLong(1), tsAt(r, 2)))).toMap
    out.foreach { r =>
      val (uid, eid, cid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (_, ets) = errors(eid)
      val candidates = clicks.filter(c => c._1 == uid && !c._3.after(ets))
      if (cid == -1L) assert(candidates.isEmpty)
      else {
        val best = candidates.maxBy(_._3.getTime)
        assert(best._3 === tsAt(r, 3), s"error $eid")
      }
    }
  }

  test("chunkDedup equals the sequential keep-first reference on random dup-heavy corpora") {
    // draw 4-token chunks from a 12-chunk pool so cross-doc and
    // within-doc duplication both occur, plus a ragged tail chunk
    val pool = samples(Gen.listOfN(4, word).map(_.mkString(" ")), 12)
    val doc: Gen[String] = for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf(pool))
      tailN <- Gen.choose(0, 3)
      tail <- Gen.listOfN(tailN, word)
    } yield (cs ++ (if (tail.isEmpty) Nil else List(tail.mkString(" ")))).mkString(" ")
    val docs = samples(doc, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // sequential reference: first occurrence of each chunk text wins,
    // scanning docs in id order, chunks in position order
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.map { case (id, t) =>
      val toks = t.split(" ")
      val chunks = toks.grouped(4).map(_.mkString(" ")).toSeq
      val kept = chunks.filter(c => seen.add(c))
      (id, chunks.length.toLong, kept.length.toLong,
        kept.map(_.split(" ").length.toLong).sum)
    }
    val got = graft.operators.PipelineOps
      .chunkDedupOver(docs.toDF("doc_id", "text"), $"doc_id", $"text", 4)
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_kept", "clean_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
  }
}
