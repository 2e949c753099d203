package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the training-data pipeline stages (q61–q67).
  * Cross-engine value parity is the DuckDB harness's job; these pin
  * the semantic contracts and the scale-shape of the plans. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("packWindows: distributed prefix sum equals the naive global window") {
    val t = sf001
    val got = PipelineOps.packWindows(t).orderBy("doc_id").collect()
    // naive reference: single global cumulative sum on the driver
    val sizes = t.documents
      .select($"doc_id", graft.functions.TextFunctions.tokenCount($"text").as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    var cum = 0L
    val expected = sizes.map { case (id, n) =>
      val start = cum; cum += n
      (id, n, start, (start / 512).toInt, ((start + n - 1) / 512).toInt)
    }
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4))).toSeq
      === expected.toSeq)
  }

  test("repetitionSignals plan: zero shuffles — a pure per-row projection") {
    val plan = PipelineOps.repetitionSignals(sf001).queryExecution.executedPlan.toString
    // the trailing orderBy is the query's own presentation sort; the
    // signal computation itself must add no exchange beyond it
    val body = PipelineOps.repetitionSignalsOver(
      sf001.documents, org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"))
      .queryExecution.executedPlan.toString
    assert(!body.contains("Exchange"), s"repetition signals should not shuffle:\n$body")
    assert(plan.nonEmpty)
  }

  test("contamination plan: benchmark shingle set broadcasts") {
    val plan = PipelineOps.contamination(sf001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("packWindows plan: no un-partitioned window over the corpus") {
    val plan = PipelineOps.packWindows(sf001).queryExecution.executedPlan.toString
    // the corpus-sized window must be partitioned (by pid); the only
    // allowed global windowspec is over the P subtotal rows
    assert(plan.contains("windowspecdefinition(pid"),
      s"expected the per-partition prefix-sum window:\n$plan")
  }

  test("chunking stays far below the oracle's 999-chunk cap") {
    val maxIdx = PipelineOps.chunkDocuments(sf001)
      .agg(max($"chunk_idx")).head().getInt(0)
    assert(maxIdx < 999, s"doc needs $maxIdx chunks — q63 oracle range(1,1000) too small")
  }

  test("chunking reassembles each document exactly") {
    val t = sf001
    val rebuilt = PipelineOps.chunkDocuments(t)
      .groupBy("doc_id")
      .agg(array_join(array_sort(collect_list(struct($"chunk_idx", $"chunk_text")))
        .getField("chunk_text").cast("array<string>"), " ").as("rebuilt"))
    val joined = t.documents.join(rebuilt, "doc_id")
      .filter($"text" =!= $"rebuilt")
    assert(joined.count() === 0)
    // chunk sizes: all full except possibly the last
    val bad = PipelineOps.chunkDocuments(t)
      .withColumn("max_idx", max($"chunk_idx").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      .filter($"chunk_idx" < $"max_idx" && $"chunk_tokens" =!= 32)
    assert(bad.count() === 0)
  }

  test("hashSplit: identical content always lands in the same split") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other words")).toDF("id", "text")
    val got = PipelineOps.hashSplitOver(df, $"id", $"text", 80, 10)
      .select("doc_id", "bucket", "split").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(got(1L) === got(2L))
    val buckets = PipelineOps.hashSplit(sf001).select("bucket")
      .collect().map(_.getInt(0))
    assert(buckets.forall(b => b >= 0 && b < 100))
  }

  test("sessionize: breaks exactly at silences above the gap") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val events = Seq(
      (1L, 10L, ts(0)), (1L, 11L, ts(100)), (1L, 12L, ts(2000)),  // 1900s gap → new session
      (1L, 13L, ts(2100)),
      (2L, 20L, ts(0)), (2L, 21L, ts(1800))                        // exactly 1800s → same session
    ).toDF("user_id", "event_id", "ts")
    val got = PipelineOps.sessionizeOver(events, $"user_id", $"event_id", $"ts", 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((1L, 10L)) === 1 && got((1L, 11L)) === 1)
    assert(got((1L, 12L)) === 2 && got((1L, 13L)) === 2)
    assert(got((2L, 20L)) === 1 && got((2L, 21L)) === 1)
  }

  test("contamination: benchmark source excluded, fractions in [0,1]") {
    val c = PipelineOps.contamination(sf001)
    val t = sf001
    val srcOf = t.documents.select("doc_id", "source")
    val leaked = c.join(srcOf, "doc_id").filter($"source" === "src0")
    assert(leaked.count() === 0)
    assert(c.filter($"contamination" < 0 || $"contamination" > 1).count() === 0)
    assert(c.filter($"n_hits" > $"n_shingles").count() === 0)
  }

  test("tfidfExact: tf totals reconcile and idf decreases with df") {
    val t = sf001
    val tfidf = PipelineOps.tfidfExact(t)
    val perDoc = tfidf.groupBy("doc_id").agg(sum("tf").as("total"))
    val expected = t.documents.select($"doc_id",
      graft.functions.TextFunctions.tokenCount($"text").cast("long").as("n"))
    assert(perDoc.join(expected, "doc_id").filter($"total" =!= $"n").count() === 0)
    // same tf, higher df → strictly smaller tfidf
    val pairs = tfidf.select("tf", "df", "tfidf").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for {
      (tf1, df1, s1) <- pairs.take(200)
      (tf2, df2, s2) <- pairs.take(200)
      if tf1 == tf2 && df1 < df2
    } assert(s1 > s2, s"idf not monotonic: df $df1→$s1 vs $df2→$s2")
  }

  test("bm25: hand-computed scores on a 3-doc corpus") {
    import spark.implicits._
    // docs: "a a b" (dl=3), "a c" (dl=2), "b b b c" (dl=4)
    // N=3, total=9, avgdl=3.0; df: a=2, b=2, c=2
    val df = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b c")).toDF("id", "txt")
    val got = PipelineOps.bm25Over(df, $"id", $"txt")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    def score(tf: Long, dfW: Long, dl: Long): Double = {
      // math_ln is GlibcLog, which by design departs from Math.log by
      // 1 ulp on glibc's misrounded inputs — expectations must use the
      // same log or a fixture-constant change could trip a 1-ulp diff
      val idf = graft.expr.GlibcLog.log(1.0 + (3L - dfW + 0.5) / (dfW + 0.5))
      idf * (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / (9.0 / 3L))))
    }
    assert(got.size === 6)
    assert(got((1L, "a")) === score(2, 2, 3))
    assert(got((1L, "b")) === score(1, 2, 3))
    assert(got((2L, "c")) === score(1, 2, 2))
    assert(got((3L, "b")) === score(3, 2, 4))
    // rarer term never scores below a commoner one at equal tf/dl
    assert(got((1L, "a")) > got((1L, "b"))) // tf 2 vs 1, same df/dl
  }

  test("bm25: tf saturation — score grows sublinearly and is bounded by idf·(k1+1)") {
    import spark.implicits._
    val df = Seq((1L, "x " * 99 + "y"), (2L, "x y")).toDF("id", "txt")
    val got = PipelineOps.bm25Over(df, $"id", $"txt", k1 = 1.2, b = 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    val idf = graft.expr.GlibcLog.log(1.0 + (2L - 2L + 0.5) / (2L + 0.5))
    // with b=0 length normalization is off: denominator → tf + k1
    assert(got((1L, "x")) < idf * 2.2) // saturates under the cap
    assert(got((1L, "x")) > got((2L, "x"))) // but tf=99 still beats tf=1
  }

  test("invertedIndex: postings are sorted doc ids, df/cf reconcile") {
    import spark.implicits._
    val df = Seq((2L, "b a b"), (10L, "a c"), (1L, "a a")).toDF("id", "txt")
    val got = PipelineOps.invertedIndexOver(df, $"id", $"txt")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // numeric sort: 1,2,10 — a lexical sort would give "1,10,2"
    assert(got("a") === ((3L, 4L, "1,2,10")))
    assert(got("b") === ((1L, 2L, "2")))
    assert(got("c") === ((1L, 1L, "10")))
    // fixture-level reconciliation: Σ cf = corpus token count
    val idx = PipelineOps.invertedIndex(sf001)
    val totalCf = idx.agg(sum("cf")).head().getLong(0)
    val totalTokens = sf001.documents
      .agg(sum(graft.functions.TextFunctions.tokenCount($"text").cast("long"))).head().getLong(0)
    assert(totalCf === totalTokens)
  }

  test("mixtureSample: kept iff content bucket under the source's rate") {
    val m = PipelineOps.mixtureSample(sf001)
    val idx = substring($"source", 4, 10).cast("int")
    val thresh = when(idx < 5, 1000).when(idx < 10, 500)
      .when(idx < 15, 250).otherwise(100)
    assert(m.filter($"kept" =!= ($"bucket" < thresh)).count() === 0)
    // full-rate sources keep everything
    assert(m.filter(idx < 5 && !$"kept").count() === 0)
  }

  test("funnel: steps counts the completed prefix on a synthetic stream") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    // user 1: full funnel; user 2: clicks before signup only; user 3: no signup
    val ev = Seq(
      (1L, "signup", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      (2L, "click", ts(0)), (2L, "signup", ts(10)), (2L, "purchase", ts(5)),
      (3L, "click", ts(0)), (3L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    // exercise the operator body against the synthetic frame via the
    // same column expressions (reuse through a local Tables stand-in
    // is not possible — events is fixture-bound — so validate the
    // fixture run plus the semantics on the synthetic frame inline)
    import org.apache.spark.sql.functions.{min => fmin}
    val evm = ev.select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
    val s = evm.groupBy($"user_id")
      .agg(fmin(when($"event_type" === "signup", $"ts_us")).as("signup_us"))
    val c = evm.join(s, "user_id").groupBy($"user_id")
      .agg(fmin(when($"event_type" === "click" && $"ts_us" > $"signup_us", $"ts_us")).as("click_us"))
    val got = s.join(c, "user_id").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L)._1.nonEmpty && got(1L)._2.nonEmpty)
    assert(got(2L)._1.nonEmpty && got(2L)._2.isEmpty) // click precedes signup
    assert(got(3L)._1.isEmpty)
    // fixture run: steps consistent with the -1 sentinels
    val f = EventOps.funnel(sf001)
    val bad = f.filter(
      ($"steps" >= 1) =!= ($"signup_us" > -1L) ||
      ($"steps" >= 2) =!= ($"click_us" > -1L) ||
      ($"steps" === 3) =!= ($"purchase_us" > -1L))
    assert(bad.count() === 0)
  }

  test("ewma: sequential fold matches a hand computation") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val t = sf001
    val got = EventOps.ewmaPerUser(t).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // recompute one user on the driver
    val (uid, n, e) = got.head
    val vals = t.events.filter($"user_id" === uid)
      .select(unix_micros($"ts").as("us"), $"event_id", $"value")
      .orderBy("us", "event_id").collect().map(_.getDouble(2))
    assert(vals.length === n)
    val expected = vals.tail.foldLeft(vals.head)((acc, v) => acc * 0.5 + v * 0.5)
    assert(expected === e)
  }

  test("repetitionSignals: a degenerate repeated document maxes both signals") {
    val df = Seq(
      (1L, Seq.fill(40)("spam").mkString(" ")),
      (2L, (1 to 40).map(i => s"w$i").mkString(" "))).toDF("id", "text")
    val got = PipelineOps.repetitionSignalsOver(df, $"id", $"text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === 1.0)                    // all bigrams identical
    assert(got(1L)._2 > 0.95)                     // trigrams all duplicates
    assert(got(2L)._1 < 0.1 && got(2L)._2 === 0.0) // all distinct
  }

  test("dupSpans: maximal spans merge overlaps, exclude within-doc-only repeats") {
    // docs 1 and 2 share tokens 0..9 ("s0..s9") — covered positions
    // 0,1,2 (k=8 grams fit up to start 2 in a 10-token shared prefix) —
    // then diverge; doc 3 repeats ITS OWN 8-gram twice but shares
    // nothing cross-doc; doc 4 shares a separate 8-token run with
    // doc 1's tail, giving doc 1 a SECOND disjoint span
    val shared = (0 until 10).map(i => s"s$i")
    val run = (0 until 8).map(i => s"r$i")
    val df = Seq(
      (1L, (shared ++ Seq("x1", "x2") ++ run).mkString(" ")),
      (2L, (shared ++ Seq("y1", "y2", "y3")).mkString(" ")),
      (3L, ((0 until 8).map(i => s"z$i") ++ (0 until 8).map(i => s"z$i")).mkString(" ")),
      (4L, (Seq("w1", "w2") ++ run).mkString(" "))).toDF("id", "text")
    val got = PipelineOps.dupSpansOver(df, $"id", $"text", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    // doc 1: span [0,10) from the shared prefix (starts 0,1,2 merged)
    // + span [12,20) from the shared run → 2 spans, 18 tokens, longest 10
    assert(got(1L) === ((2L, 18L, 10)))
    assert(got(2L) === ((1L, 10L, 10)))            // one maximal span
    assert(!got.contains(3L))                      // within-doc only
    assert(got(4L) === ((1L, 8L, 8)))
  }

  test("weighted sample: deterministic, duplicate texts race identically, weight dominates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 60 light docs (distinct texts, weight 5) + 1 heavy doc whose
    // weight dwarfs the race noise: -ln(u) ∈ (0, ~33) for 48-bit u,
    // so weight 1e6 puts its key below any weight-5 doc's possible key
    val light = (0L until 60L).map(i => (i, s"doc body $i x y z"))
    val heavy = Seq((999L, Seq.fill(6)("w").mkString(" "))) // any text
    val df = (light ++ heavy).toDF("id", "text")
    val w = when($"id" === 999L, 1000000).otherwise(5)
    def run() = PipelineOps
      .weightedSampleOver(df, $"id", $"text", w, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val a = run()
    assert(a === run(), "not deterministic")
    assert(a.length === 10)
    assert(a.head._1 === 999L, s"heavy doc must win the race: $a")
    // duplicate content + equal weight ⇒ identical race key (dedup-safe)
    val dup = Seq((1L, "same text here"), (2L, "same text here"))
      .toDF("id", "text")
    val keys = PipelineOps
      .weightedSampleOver(dup, $"id", $"text", lit(3), n = 2)
      .collect().map(_.getDouble(2))
    assert(keys(0) === keys(1))
    // zero/absent weights never sample
    val z = Seq((1L, "a", 0), (2L, "b", 4)).toDF("id", "text", "w")
    val kept = PipelineOps
      .weightedSampleOver(z, $"id", $"text", $"w", n = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(2L))
  }

  test("bpeMerges: hand-checked merge sequence, then equivalence with a local trainer") {
    import spark.implicits._
    // banana×2 + bandana: round 1 merges (a,n)→an with count 6; round
    // 2 ties (b,an)=3 vs (an,a)=3 and lexicographic order picks
    // (an,a)→ana; round 3 then takes (b,an)→ban
    val df = Seq("banana banana bandana").toDF("text")
    val got = PipelineOps.bpeMergesOver(df, $"text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1, "a", "n", "an", 6L),
      (2, "an", "a", "ana", 3L),
      (3, "b", "an", "ban", 3L)))
    // independent local reference: greedy distinct-pair BPE over the
    // word-frequency table, no shared code with the operator
    def localBpe(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
      var tbl = words.map { case (w, n) => (w.split("").toVector, n) }
      (1 to k).map { _ =>
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, n) <- tbl; i <- 0 until syms.length - 1
             if syms(i) != syms(i + 1))
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        tbl = tbl.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }
        (l, r, cnt)
      }
    }
    val corpus = Seq(
      "the theme of the thesis is the theory",
      "there is a theme in the theory of themes",
      "a thesis on theories and themes there")
    val wordFreq = corpus.flatMap(_.split(" ")).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = localBpe(wordFreq, 6)
    val got2 = PipelineOps.bpeMergesOver(corpus.toDF("text"), $"text", 6)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got2 === expect, s"got $got2 vs local $expect")
    // apply side: the banana corpus after 2 merges tokenizes to
    // banana→[b,an,ana]×2, bandana→[b,an,d,ana] — weighted counts
    // an:3, ana:3, b:3, d:1 (ties break token-ascending)
    val vocab = PipelineOps.bpeVocabOver(df, $"text", 2, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(vocab === Seq(("an", 3L), ("ana", 3L), ("b", 3L), ("d", 1L)))
  }

  test("targetEncode: hand computation, leakage-freedom, single-fold NULL") {
    import spark.implicits._
    // cat x: fold 0 targets {10, 20}, fold 1 targets {40}
    //   enc(x,0) = 40/1 = 40; enc(x,1) = 30/2 = 15
    // cat y: only fold 0 → no out-of-fold rows → NULL
    val df = Seq(("x", 0L, 10L), ("x", 0L, 20L), ("x", 1L, 40L),
      ("y", 0L, 7L)).toDF("cat", "fold", "t")
    val got = PipelineOps
      .targetEncodeOver(df, $"cat", $"fold", $"t", unitsPerTarget = 1L)
      .orderBy($"category", $"fold")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    assert(got(0) === (("x", 0L, 2L, 40.0)))
    assert(got(1) === (("x", 1L, 1L, 15.0)))
    assert(got(2)._4.isNaN, "single-fold category must encode NULL, not leak")
    // leakage-freedom on the fixture: enc(cat, fold) must equal the
    // mean computed over all OTHER folds' rows, for every row
    val enc = PipelineOps.orderTargetEncoding(sf001)
    val cents = floor($"o_totalprice" * 100 + 0.5).cast("long")
    val byHand = sf001.orders
      .select(concat($"o_orderpriority", lit("|"), $"o_orderstatus").as("category"),
        pmod($"o_orderkey", lit(5L)).as("f"), cents.as("c"))
    val cross = byHand.select($"category", $"f".as("fold"))
      .distinct()
      .join(byHand, Seq("category"))
      .filter($"f" =!= $"fold")
      .groupBy($"category", $"fold")
      .agg((sum($"c").cast("double") / count(lit(1)).cast("double") / 100.0)
        .as("enc_ref"))
    val joined = enc.join(cross, Seq("category", "fold"), "left")
    assert(joined.filter(abs($"enc" - $"enc_ref") > 1e-9).count() === 0,
      "encoding diverges from the out-of-fold mean")
  }
}
