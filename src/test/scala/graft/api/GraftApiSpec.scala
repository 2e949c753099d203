package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The facade must work on arbitrary DataFrames, not just fixtures. */
class GraftApiSpec extends SparkSpec {
  import spark.implicits._

  test("registerViews makes the engine reachable from spark.sql, native functions included") {
    Graft.registerViews(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT COUNT(*) FROM lineitem").head().getLong(0)
    assert(n > 0)
    val joined = spark.sql(
      """SELECT r_name, COUNT(*) AS c FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin).count()
    assert(joined === 5)
    val sh = spark.sql(
      "SELECT simhash64(split(text, ' ')) AS s FROM documents LIMIT 5").count()
    assert(sh === 5)
  }

  test("dedupAgainst drops exact and near duplicates of the reference set only") {
    Graft.install(spark)
    val reference = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight").toDF("text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),      // exact dup
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),       // near dup (7/9 shingle overlap region)
      (3L, "completely different words about sparks and rivers flowing")
    ).toDF("id", "text")
    val kept = Graft.dedupAgainst(corpus, $"id", $"text", reference, $"text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L), "exact duplicate survived")
    assert(kept.contains(3L), "unrelated document was evicted")
    // doc 2 shares 5 of its 6 3-shingles' prefix region — verify the
    // decision against the exact jaccard rather than hardcoding it
    val j = {
      val sh = (s: String) => s.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val a = sh("alpha beta gamma delta epsilon zeta eta iota")
      val b = sh("alpha beta gamma delta epsilon zeta eta theta")
      (a & b).size.toDouble / (a | b).size
    }
    assert(kept.contains(2L) === (j < 0.6), s"near-dup decision mismatch (j=$j)")
  }

  test("funnel generalizes to arbitrary step sequences") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val ev = Seq(
      (1L, "a", ts(0)), (1L, "b", ts(10)), (1L, "c", ts(20)), (1L, "d", ts(30)),
      (2L, "a", ts(0)), (2L, "c", ts(10)), (2L, "b", ts(20))  // c before b → stops at b
    ).toDF("u", "t", "ts")
    val f = Graft.funnel(ev, $"u", $"t", $"ts", Seq("a", "b", "c", "d"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(r.fieldIndex("a_us"))), Option(r.get(r.fieldIndex("b_us"))),
          Option(r.get(r.fieldIndex("c_us"))), Option(r.get(r.fieldIndex("d_us"))))).toMap
    assert(f(1L)._1.nonEmpty && f(1L)._2.nonEmpty && f(1L)._3.nonEmpty && f(1L)._4.nonEmpty)
    assert(f(2L)._1.nonEmpty && f(2L)._2.nonEmpty)
    assert(f(2L)._3.isEmpty && f(2L)._4.isEmpty, "step c before b must not count")
  }

  test("dedupExact keeps exactly one row per key, the one with min id") {
    Graft.install(spark)
    val df = Seq((1L, "aa"), (2L, "aa"), (3L, "bb"), (4L, "aa"))
      .toDF("id", "k")
    val out = Graft.dedupExact(df, $"k", $"id").orderBy($"id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }

  test("nearDupPairsSimhash finds identical texts and skips unrelated ones") {
    Graft.install(spark)
    val df = Seq(
      (1L, "spark query engine for large data"),
      (2L, "spark query engine for large data"),
      (3L, "completely unrelated words about cooking pasta")).toDF("id", "text")
    val pairs = Graft.nearDupPairsSimhash(df, $"id", $"text", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("knnCosine returns k ranked neighbours per probe") {
    Graft.install(spark)
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)), (3L, Seq(-1f, 0f)))
      .toDF("id", "v")
    val out = Graft.knnCosine(vecs, $"id", $"v",
      vecs.filter($"id" === 0), $"id", $"v", k = 2)
      .select("cand_id", "rank").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq === Seq((1L, 1), (2L, 2))) // most→least similar
  }

  test("textProfile adds the full analysis column set") {
    Graft.install(spark)
    val out = Graft.textProfile(Seq("the quick brown fox the end").toDF("text"), $"text")
    assert(Seq("n_tokens", "ttr", "stop_ratio", "fingerprint", "simhash64", "lang_guess")
      .forall(out.columns.contains))
    val r = out.head()
    assert(r.getAs[Int]("n_tokens") === 6)
  }

  test("nearDupPairsMinhash finds near-identical texts with exact jaccard distance") {
    Graft.install(spark)
    val base = "spark query engine for very large scale data processing pipelines"
    val df = Seq(
      (1L, base),
      (2L, base + " today"), // near-dup: one extra word
      (3L, "completely unrelated cooking recipe with pasta and tomato sauce here"))
      .toDF("id", "text")
    val pairs = Graft.nearDupPairsMinhash(df, $"id", $"text", maxDist = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
    assert(pairs.head._3 > 0.0 && pairs.head._3 <= 0.5)
  }

  test("winnowFingerprintTable links docs sharing a long substring") {
    Graft.install(spark)
    val common = "a long shared passage of text that appears verbatim in both documents"
    val df = Seq(
      (1L, "prefix one " + common),
      (2L, common + " suffix two"),
      (3L, "nothing in common with the others at all zzz qqq")).toDF("id", "text")
    val fps = Graft.winnowFingerprintTable(df, $"id", $"text")
    val byFp = fps.groupBy("fp").agg(collect_set("id").as("ids"))
      .filter(size($"ids") > 1)
      .select(explode($"ids").as("id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(byFp === Set(1L, 2L))
  }

  test("dedupCorpus removes exact and near duplicates, keeping min-id per cluster") {
    Graft.install(spark)
    val base = "spark query engine for very large scale data processing pipelines today"
    val df = Seq(
      (1L, base),
      (2L, base),                    // exact dup of 1
      (3L, base + " and tomorrow"),  // near-dup of 1
      (4L, "completely unrelated cooking recipe with pasta and tomato sauce here"))
      .toDF("id", "text")
    val kept = Graft.dedupCorpus(df, $"id", $"text", maxDist = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L))
  }

  test("connectedComponents labels chains and singletons with the component minimum") {
    // graph: 1-2, 2-3 (one chain), 5-6, plus isolated 9
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 2L), (6L, 5L)).toDF("id_a", "id_b")
    val got = Graft.connectedComponents(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("topKPerGroup returns at most k rows per group with rank column") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "x")
    val out = Graft.topKPerGroup(df, Seq($"g"), Seq($"x".desc), 2)
    assert(out.filter($"g" === "a").count() === 2)
    assert(out.filter($"g" === "a" && $"rank" === 1).head().getInt(1) === 3)
  }

  test("bigramBackoffNll scores rare-bigram docs above formulaic ones") {
    // even ids form the model half; doc 1 repeats the trained pattern,
    // doc 3 is unseen-bigram soup — backoff makes it strictly costlier
    val df = Seq(
      (0L, "the cat sat on the mat"), (2L, "the cat sat on the rug"),
      (1L, "the cat sat on the mat"), (3L, "mat the on sat cat zzz"))
      .toDF("id", "text")
    val got = Graft.bigramBackoffNll(df, $"id", $"text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(3L) > got(1L), s"backoff doc should score higher: $got")
  }

  test("streamIntervalJoin and streamSessions work through the facade") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // interval join: one error, two clicks inside the 10-min horizon
    val errIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val clkIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q1 = Graft.streamIntervalJoin(
      errIn.toDF().toDF("ts", "user_id", "event_id"),
      clkIn.toDF().toDF("ts", "user_id", "event_id"), "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("api_sj").start()
    try {
      clkIn.addData((ts("2024-01-01 00:00:00"), 1L, 100L),
        (ts("2024-01-01 00:20:00"), 1L, 101L))
      errIn.addData((ts("2024-01-01 00:21:00"), 1L, 500L))
      q1.processAllAvailable()
      val got = spark.table("api_sj").select("click_id")
        .collect().map(_.getLong(0)).toSet
      assert(got === Set(101L), s"horizon filter failed: $got")
    } finally q1.stop()
    // sessions: a 5-min pair, then an event past the gap closes it
    val evIn = MemoryStream[graft.streaming.UserEvent]
    val q2 = Graft.streamSessions(
      evIn.toDS().withWatermark("ts", "0 seconds"), gapMs = 10 * 60 * 1000)
      .writeStream.outputMode("append")
      .format("memory").queryName("api_sess").start()
    try {
      evIn.addData(
        graft.streaming.UserEvent(1, ts("2024-01-01 00:00:00"), 7, "a", 1.5),
        graft.streaming.UserEvent(2, ts("2024-01-01 00:05:00"), 7, "a", 2.5))
      q2.processAllAvailable()
      evIn.addData(graft.streaming.UserEvent(3, ts("2024-01-01 01:00:00"), 7, "a", 9.0))
      q2.processAllAvailable()
      evIn.addData(graft.streaming.UserEvent(4, ts("2024-01-01 03:00:00"), 8, "a", 0.0))
      q2.processAllAvailable()
      val s = spark.table("api_sess").as[graft.streaming.UserSession]
        .collect().filter(_.user_id == 7L)
      assert(s.exists(x => x.n_events == 2 && x.total_value == 4.0),
        s"first session wrong: ${s.toSeq}")
    } finally q2.stop()
  }

  test("streamAsOf and audioFeatures work through the facade") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val evIn = MemoryStream[graft.streaming.UserEvent]
    val q = Graft.streamAsOf(evIn.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode("append")
      .format("memory").queryName("api_asof").start()
    try {
      evIn.addData(
        graft.streaming.UserEvent(1, ts("2024-01-01 00:00:00"), 7, "click", 0),
        graft.streaming.UserEvent(2, ts("2024-01-01 00:05:00"), 7, "error", 0))
      q.processAllAvailable()
      evIn.addData(
        graft.streaming.UserEvent(3, ts("2024-01-01 01:00:00"), 8, "view", 0))
      q.processAllAvailable()
      val got = spark.table("api_asof").as[graft.streaming.AsOfRow].collect()
      assert(got.exists(r => r.error_id == 2 && r.click_id == 1),
        s"as-of match missing: ${got.toSeq}")
    } finally q.stop()
    // audio features: the facade decodes the container and the exact
    // integer features match a direct recompute
    val sig = Array.tabulate[Byte](100)(i => ((i * 37) % 200).toByte)
    val a = Graft.audioFeatures(
      graft.sources.Multimodal.WavCodec.encode(sig, 16000))
    assert(a.sampleRate === 16000 && a.nSamples === 100 && a.nFrames === 2)
    assert(a.totalEnergy > 0 && a.loudestFrame >= 0)
  }

  test("cmsFrequency estimates arbitrary probe items, unseen probes included") {
    val occ = (Seq.fill(7)("apple") ++ Seq.fill(3)("pear") ++ Seq("plum"))
      .toDF("w")
    val probes = Seq("apple", "pear", "plum", "never_seen").toDF("p")
    val got = Graft.cmsFrequency(occ, $"w", probes, $"p")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 4 items in a 5×2048 grid: collision-free, so est == exact and
    // the unseen probe reads its empty cells as 0
    assert(got === Map("apple" -> 7L, "pear" -> 3L, "plum" -> 1L,
      "never_seen" -> 0L))
  }

  test("streamCms windowed grid recovers per-window key counts (batch twin)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val ev = Seq(
      (ts(1), 7L), (ts(2), 7L), (ts(3), 8L),        // window 0
      (ts(70), 7L), (ts(71), 9L), (ts(72), 9L))     // window 1
      .toDF("ts", "user_id")
    val cells = Graft.streamCms(ev, "ts", $"user_id", "1 hour", "1 hour",
      width = 512, depth = 5)
    // estimate = min over the key's d cells within its window
    def est(winStartMin: Long, key: Long): Long = cells
      .filter($"window_start" === ts(winStartMin) &&
        $"c" === pmod(xxhash64(lit(key), $"r"), lit(512)))
      .agg(min($"cell")).head().getLong(0)
    assert(est(0, 7L) === 2L)
    assert(est(0, 8L) === 1L)
    assert(est(60, 7L) === 1L)
    assert(est(60, 9L) === 2L)
    // grid is bounded: ≤ depth·width cells per window regardless of keys
    assert(cells.count() <= 2L * 5 * 512)
  }

  test("weightedSample + quantizedKnn facades work on arbitrary frames") {
    // weighted race: heavy row always wins, n caps the sample
    val docs = (0L until 30L).map(i => (i, s"body $i", if (i == 7L) 100000 else 2))
      .toDF("id", "text", "w")
    val picked = Graft.weightedSample(docs, $"id", $"text", $"w", n = 5)
      .collect().map(_.getLong(0))
    assert(picked.length === 5 && picked.head === 7L)
    // quantized kNN: identical vectors rank first at qcos 1.0
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val vecs = Seq(
      (0L, base), (1L, base.map(_ * 2f)),                 // colinear with 0
      (2L, Array.tabulate(8)(i => (8 - i).toFloat)))      // different
      .toDF("vid", "emb")
    val knn = Graft.quantizedKnn(vecs, $"vid", $"emb", _ === 0L, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3), r.getDouble(2))).toList
      .sortBy(_._2)
    assert(knn.map(_._1) === List(1L, 2L), s"rank order wrong: $knn")
    // colinear vectors quantize to the SAME code → qcos = d/(√d·√d),
    // 1.0 up to one sqrt rounding
    assert(math.abs(knn.head._3 - 1.0) < 1e-12, s"qcos ${knn.head._3}")
  }

  test("annPq facade indexes an arbitrary frame and ranks cluster mates first") {
    val rnd = new scala.util.Random(5)
    // two well-separated direction clusters in 8 dims
    def near(sign: Float) =
      Array.tabulate(8)(i => sign * (1f + i) + rnd.nextGaussian().toFloat * 0.05f)
    val vecs = (0L until 10L).map(i => (i, near(1f))) ++
      (10L until 20L).map(i => (i, near(-1f)))
    val df = vecs.toDF("vid", "emb")
    val got = Graft.annPq(df, $"vid", $"emb", _ === 0L,
        m = 2, ks = 2, nList = 2, nProbe = 2, nAssign = 1, rerank = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.length === 10 && got.forall(_._1 === 0L))
    assert(got.map(_._4).toList === (1 to 10).toList)
    // the top neighbour is a same-cluster vector at cosine ≈ 1
    assert(got.head._2 < 10L && got.head._3 > 0.9, s"top: ${got.head}")
  }

  test("bm25Search ranks the term-matching docs and respects k") {
    val corpus = Seq(
      (1L, "spark runs distributed queries on clusters"),
      (2L, "spark spark spark everywhere spark"),
      (3L, "ducks swim on ponds"),
      (4L, "distributed systems need consensus")).toDF("id", "text")
    val queries = Seq((100L, "spark distributed")).toDF("qid", "qtext")
    val got = Graft.bm25Search(corpus, $"id", $"text", queries, $"qid", $"qtext", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(4))).toList.sortBy(_._2)
    // docs 1/2/4 match ≥1 term; k=2 keeps the two best; doc 3 never appears
    assert(got.length === 2)
    assert(!got.map(_._1).contains(3L))
    // doc 1 matches BOTH query terms — its two-term sum must outrank
    // the single-term matches
    assert(got.head._1 === 1L, s"two-term match must rank first: $got")
  }

  test("dupSpans merges overlapping shared k-grams into islands per doc") {
    // docs 1 and 2 share a 10-word run (3 overlapping 8-grams → ONE
    // span of 10 tokens); doc 3 is unrelated
    val shared = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, s"$shared alpha beta gamma"),
      (2L, s"x y $shared"),
      (3L, "totally different words that never repeat anywhere else here"))
      .toDF("id", "text")
    val got = Graft.dupSpans(docs, $"id", $"text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    // (doc, n_spans, dup_tokens): one merged 10-token island each side
    assert(got === List((1L, 1L, 10L), (2L, 1L, 10L)), s"got $got")
  }

  test("chunkDedup rewrites an arbitrary frame keeping globally-first chunks") {
    val docs = Seq(
      (7L, "a b c d e f"),
      (9L, "a b c z z z")).toDF("id", "body")
    val got = Graft.chunkDedup(docs, $"id", $"body", chunkTokens = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toList
    // doc 9's first chunk "a b c" loses to doc 7's
    assert(got === List((7L, 2L, 6L), (9L, 1L, 3L)), s"got $got")
  }

  test("jlProject emits k components with near-unit distortion") {
    val out = Graft.jlProject(sf001.embeddings, $"vec_id", $"embedding", dim = 64, k = 8)
    assert(out.columns.count(_.startsWith("y")) === 9) // y00..y07 + ynorm2
    val d = out.agg(avg($"distortion")).collect()(0).getDouble(0)
    assert(d > 0.7 && d < 1.3, s"mean distortion $d")
  }

  test("rollingAnomalies flags a spike after 5 priors, zero-variance windows flag any deviation") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: five constant 10.0s then a spike (σ=0 window ⇒ flag, z NULL);
    // user 2: 1..5 then 3.5 (|z| < 3 ⇒ silent) then 30.0 (flagged, z = 26.5)
    val ev = (1 to 5).map(i => (1L, i.toLong, ts(i), 10.0)) ++
      Seq((1L, 6L, ts(6), 100.0)) ++
      (1 to 5).map(i => (2L, 10L + i, ts(i), i.toDouble)) ++
      Seq((2L, 16L, ts(6), 3.5), (2L, 17L, ts(7), 30.0))
    val got = Graft.rollingAnomalies(
      ev.toDF("user_id", "event_id", "ts", "value"),
      $"user_id", $"ts", $"event_id", $"value")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got.keySet === Set(6L, 17L), s"got $got")
    assert(got(6L).isEmpty, "zero-variance window must report z = NULL")
    // window {2,3,4,5,3.5}: num = 132.5e6, den = 25e12 ⇒ z = 26.5
    assert(got(17L).exists(z => math.abs(z - 26.5) < 1e-9),
      s"z of the 30.0 spike: ${got(17L)}")
  }

  test("chiSquare: exactly proportional table scores 0, diagonal table scores n") {
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("r", "c")
    val i = Graft.chiSquare(indep, $"r", $"c").head()
    assert(i.getDouble(0) === 0.0 && i.getLong(1) === 1L && i.getLong(2) === 4L)
    // perfect association incl. two ABSENT cells entering at o = 0:
    // χ² = n for a 2×2 diagonal table
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("r", "c")
    val d = Graft.chiSquare(dep, $"r", $"c").head()
    assert(d.getDouble(0) === 4.0 && d.getLong(3) === 4L, s"got $d")
    // NULL categories are excluded, not NaN-poisoned
    val withNull = Seq[(String, String)](("a", "x"), ("a", "y"), ("b", "x"),
      ("b", "y"), (null, "x"), ("a", null)).toDF("r", "c")
    val n = Graft.chiSquare(withNull, $"r", $"c").head()
    assert(n.getDouble(0) === 0.0 && n.getLong(2) === 4L, s"got $n")
  }

  test("attribution splits one purchase's credit across in-horizon touches only") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 09:20:00"), "view"),   // 40 min before — outside
      (2L, 10L, ts("2024-01-01 09:50:00"), "click"),
      (3L, 10L, ts("2024-01-01 09:55:00"), "view"),
      (4L, 10L, ts("2024-01-01 10:00:00"), "purchase"),
      (5L, 20L, ts("2024-01-01 10:00:00"), "purchase") // no touches — dropped
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Graft.attribution(ev, $"event_id", $"user_id", $"ts",
      $"event_type", "purchase", Seq("click", "view"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toList.sortBy(_._2)
    assert(got === List((4L, "click", 1L, 2L, 0.5), (4L, "view", 1L, 2L, 0.5)),
      s"got $got")
  }

  test("dimStats computes per-dimension mean/std/min/max of float vectors") {
    val df = Seq((1L, Array(0.0f, 1.0f)), (2L, Array(2.0f, 2.5f)))
      .toDF("id", "v")
    val got = Graft.dimStats(df, $"v").orderBy("dim")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toList
    assert(got === List(
      (1, 2L, 1.0, math.sqrt(2.0), 0.0, 2.0),
      (2, 2L, 1.75, math.sqrt(1.125), 1.0, 2.5)), s"got $got")
  }

  test("dimStats fails LOUDLY (ANSI overflow) outside the documented |v| domain") {
    val big = Seq((1L, Array(100000.0f))).toDF("id", "v")
    // ANSI long overflow in q² — the point is LOUD, not silent
    intercept[ArithmeticException] { Graft.dimStats(big, $"v").collect() }
    // a smaller quantization scale re-admits the value; sample std of
    // a single observation is NULL, not a division error
    val ok = Graft.dimStats(big, $"v", scaleBits = 10).head()
    assert(ok.getDouble(2) === 100000.0 && ok.isNullAt(3))
  }

  test("exactQuantiles: distributed selection equals the naive sorted reference, ties and all-equal groups included") {
    val rnd = new scala.util.Random(7)
    // dup-heavy values force ties; group "flat" is the span=0 path
    val rows = (1 to 500).map(i => ("g" + (i % 3), (rnd.nextInt(40) * 5).toLong)) ++
      (1 to 7).map(_ => ("flat", 42L))
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95)
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      g -> (sorted.length.toLong, ps.map { case (_, p) =>
        sorted(math.ceil(p * sorted.length).toInt - 1) })
    }
    // buckets = 4: quantile targets genuinely span multiple buckets
    val got = Graft.exactQuantiles(rows.toDF("g", "v"), $"g", $"v", ps, buckets = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), ps.indices.map(i => r.getLong(2 + i)).toList)).toMap
    assert(got === want.view.mapValues { case (n, q) => (n, q.toList) }.toMap)
  }

  test("labelPropagation facade matches the operator on a bridge graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 10L)).toDF("src", "dst")
    val viaApi = Graft.labelPropagation(edges, $"src", $"dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = graft.operators.Graph.labelPropagationOver(edges, $"src", $"dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaApi === direct)
  }

  test("cdcMerge and scd2 facades agree on the current snapshot") {
    val log = Seq(
      (1L, 10L, 1L, "U", 5.0), (1L, 20L, 2L, "U", 7.0),
      (2L, 10L, 3L, "U", 1.0), (2L, 20L, 4L, "D", 0.0))
      .toDF("key", "us", "seq", "op", "value")
    val snap = Graft.cdcMerge(None, log)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(snap === Map(1L -> 7.0))
    val cur = Graft.scd2(log).filter($"is_current")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cur === snap)
  }

  test("rrfFuse scores both-list members above single-list members") {
    val a = Seq((1L, 5L, 1), (1L, 6L, 2)).toDF("q_id", "doc_id", "rank")
    val b = Seq((1L, 5L, 2)).toDF("q_id", "doc_id", "rank")
    val got = Graft.rrfFuse(Seq("a" -> a, "b" -> b))
      .orderBy("rank").collect().map(_.getLong(1)).toList
    assert(got === List(5L, 6L))
  }

  test("sssp facade relaxes a two-hop path below the direct edge") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 9L)).toDF("src", "dst", "w")
    val d = Graft.sssp(e, $"src", $"dst", $"w", _ === 1L, iters = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    val (dc, rounds) = Graft.ssspConverged(e, $"src", $"dst", $"w", _ === 1L)
    assert(rounds <= 4 && dc.collect().length === 3)
  }

  test("dedupIncremental facade round-trips a tiny planted corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // dup of 1
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    Graft.buildDedupIndex(docs.filter($"doc_id" < 3), $"doc_id", $"text",
      "graft_api_idx")
    val got = Graft.dedupIncremental(docs.filter($"doc_id" === 3),
      $"doc_id", $"text", "graft_api_idx")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("imageDupCohorts facade recovers every planted identical twin") {
    val cohorts = Graft.imageDupCohorts(sf001)
    val plantedTwins = sf001.documents.filter($"doc_id" % 30 === 0).count()
    val recovered = cohorts.agg(org.apache.spark.sql.functions.sum($"n_planted"))
      .head().getLong(0)
    // ≥: the synthetic gadget ids also count as planted members
    assert(recovered >= plantedTwins)
    // and the gadget quads give deterministic hamming-1..3 near pairs
    val h = Graft.imageNearDups(sf001).select($"hamming")
      .collect().map(_.getInt(0)).toSet
    assert(Set(1, 2, 3).subsetOf(h), s"gadget hammings missing: $h")
  }

  test("mixtureAlloc allocates the budget by the α=0.5 power of domain size") {
    val docs = Seq(
      ("big", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"),
      ("small", "x1")).toDF("src", "body")
    val got = Graft.mixtureAlloc(docs, $"src", $"body", budgetTokens = 100L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getAs[Double]("p"))).toList
    // √16 : √1 = 4 : 1 → p = 0.8 / 0.2
    assert(math.abs(got(0)._2 - 0.8) < 1e-12 && math.abs(got(1)._2 - 0.2) < 1e-12,
      s"got $got")
  }

  test("tableDiff + diffToLog close the loop through cdcMerge") {
    val oldSnap = Seq((1L, 10L, 1L, 5.0), (2L, 10L, 2L, 6.0))
      .toDF("key", "us", "seq", "value")
    val newSnap = Seq((1L, 20L, 3L, 9.0), (3L, 20L, 4L, 7.0))
      .toDF("key", "us", "seq", "value")
    val diff = Graft.tableDiff(oldSnap, newSnap)
    val changes = diff.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes === Map(1L -> "U", 2L -> "D", 3L -> "I"))
    val applied = Graft.cdcMerge(Some(oldSnap), Graft.diffToLog(diff))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(applied === Map(1L -> 9.0, 3L -> 7.0))
  }

  test("ivmMerge folds a delta into a persisted view exactly") {
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "m")
    val delta = Seq(("a", 30L), ("c", 1L)).toDF("k", "m")
    Graft.buildAggIndex(base, $"k", $"m", "graft_api_ivm", buckets = 2)
    val got = Graft.ivmMerge(delta, $"k", $"m", "graft_api_ivm")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(got === List(("a", 3L, 60L, 10L, 30L), ("b", 1L, 5L, 5L, 5L),
      ("c", 1L, 1L, 1L, 1L)))
  }

  test("targetEncode excludes the row's own fold from its encoding") {
    val df = Seq(("x", 0L, 10L), ("x", 1L, 30L)).toDF("cat", "fold", "t")
    val got = Graft.targetEncode(df, $"cat", $"fold", $"t", 1L)
      .orderBy("fold").collect().map(_.getDouble(3)).toList
    assert(got === List(30.0, 10.0))
  }

  test("interpolateResample hits the midpoint") {
    val obs = Seq((1L, 0L, 0.0, 1L), (1L, 10L, 10.0, 2L))
      .toDF("uid", "us", "v", "eid")
    val grid = Seq((1L, 4L)).toDF("key", "us")
    val got = Graft.interpolateResample(obs, $"uid", $"us", $"v", $"eid", grid)
      .head().getDouble(2)
    assert(got === 4.0)
  }

  test("kCore facade peels a pendant off a triangle") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val e = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val (core, _) = Graft.kCore(e, $"src", $"dst", k = 2)
    assert(core.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("damerauPairs prices an adjacent swap at 1 where lev says 2") {
    val df = Seq((1L, "blk", "golden"), (2L, "blk", "goldne"))
      .toDF("id", "b", "nm")
    val got = Graft.damerauPairs(df, $"id", $"b", $"nm", maxDl = 1)
      .head()
    assert(got.getAs[Int]("lev") === 2 && got.getAs[Int]("dl") === 1)
  }

  test("fkAudit facade flags the orphan, ignores the null FK") {
    val child = Seq(Some(1L), Some(7L), None).toDF("fk")
    val parent = Seq(1L).toDF("pk")
    val r = Graft.fkAudit("e", child, $"fk", parent, $"pk").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 1L, 1L)))
  }

  test("twap facade weights by holding time") {
    val obs = Seq((1L, 0L, 100L, 1L), (1L, 1L, 0L, 2L), (1L, 3L, 9L, 3L))
      .toDF("k", "us", "vc", "tie")
    // 100 cents held 1 µs, 0 held 2 µs → (100·1 + 0·2)/3/100
    val r = Graft.twap(obs, $"k", $"us", $"vc", $"tie").head()
    assert(r.getDouble(3) === 100.0 / 3.0 / 100.0)
  }

  test("robustOutliers facade returns med/mad for a clean group") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("grp", "v")
    val r = Graft.robustOutliers(df, $"grp", $"v").head()
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 1.0 &&
      r.getLong(4) === 0L)
  }

  test("asOfJoinWithin facade demotes a stale match") {
    val l = Seq((1L, 10000000L, 1L)).toDF("k", "ts", "lv")
      .select($"k", timestamp_micros($"ts").as("ts"), $"lv")
    val r = Seq((1L, 0L, 9L)).toDF("k", "ts", "rv")
      .select($"k", timestamp_micros($"ts").as("ts"), $"rv")
    val got = Graft.asOfJoinWithin(l, r, "k", "ts", "ts", "lv", "rv",
      maxAgeUs = 1000L).head()
    assert(got.isNullAt(3))
  }

  test("pointInTimeLookup facade reads strictly-prior state") {
    val log = Seq((1L, 100L, 1L, "U", 7.0), (1L, 200L, 2L, "U", 9.0))
      .toDF("key", "us", "seq", "op", "value")
    val dim = Graft.scd2(log)
    val facts = Seq((1L, 200L, 50L)).toDF("key", "us", "fact_id")
    val got = Graft.pointInTimeLookup(facts, dim).head()
    // the fact at us=200 sees the 7.0 version, not the one opening at 200
    assert(got.getDouble(got.fieldIndex("value")) === 7.0)
  }

  test("ivmMergeRetractFrames retracts a delete and re-derives min") {
    val facts = Seq((1L, "a", 10L), (2L, "a", 20L)).toDF("fkey", "key", "q")
    val view = facts.groupBy($"key").agg(count(lit(1)).as("n"),
      sum($"q").as("s"), min($"q").as("mn"), max($"q").as("mx"))
    val nl: Option[Long] = None
    val ns: Option[String] = None
    val delta = Seq((1L, "D", Some("a"), Some(10L), ns, nl))
      .toDF("fkey", "change", "key_old", "q_old", "key_new", "q_new")
    val got = Graft.ivmMergeRetractFrames(delta, view, facts).head()
    assert((got.getString(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) === ("a", 1L, 20L, 20L, 20L))
  }
}
