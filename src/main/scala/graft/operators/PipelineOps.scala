package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeFunctions.tsMicros
import org.apache.spark.sql.{Column, DataFrame}

/** Training-data pipeline operators beyond dedup/similarity: the
  * preprocessing stages a large-scale LLM data run needs between "raw
  * corpus" and "token stream" — exact TF-IDF, deterministic splits,
  * chunking, context-window packing, repetition/quality signals,
  * benchmark-contamination checks, sessionization.
  *
  * Every operator is exact integer/double arithmetic (no RNG, no
  * engine-specific hash), so each is DuckDB-oracle-checkable, and each
  * is expressed as shuffles on narrow keys — the text column never
  * moves unless it is the payload being emitted. Each has a generic
  * `*Over` form (arbitrary DataFrame/columns — the Graft facade
  * surface) plus a fixture-bound wrapper used by the declared queries.
  */
object PipelineOps {

  // ── q61: exact TF-IDF (no feature hashing) ──────────────────────────
  // tf = term count per (doc, word); df = docs containing word;
  // idf = ln((N+1)/(df+1)) — smoothed, engine-neutral via the native
  // math_ln expression (java.lang.Math.log = platform libm = DuckDB's
  // ln; Spark's builtin `log` is StrictMath/fdlibm, off by one ulp on
  // ~8% of inputs). The hashed-space variant stays in
  // TextOps.tfidfProfile; this is the exact-vocabulary path a corpus
  // profiler wants (shuffles (word, doc_id) pairs — linear in token
  // count, never a dense vector).
  def tfidfExactOver(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val words = df.select(idCol.as("doc_id"), explode(tokens(textCol)).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(docFreq, "word")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        (col("tf").cast("double") *
          call_function("math_ln",
            (col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))).as("tfidf"))
  }

  def tfidfExact(t: Tables): DataFrame = {
    import t.spark.implicits._
    tfidfExactOver(t.documents, $"doc_id", $"text").orderBy($"doc_id", $"word")
  }

  // ── q88: exact Okapi BM25 scoring matrix ────────────────────────────
  // bm25(d, w) = idf(w) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
  // idf = ln(1 + (N − df + 0.5)/(df + 0.5)) — the retrieval scoring
  // a corpus search/quality layer runs over the same (doc, word)
  // shuffle TF-IDF uses. All corpus constants (N, Σdl) ride one
  // broadcast one-row join; avgdl is derived inside the row expression
  // (exact integer sum ÷ count, one double division) so both engines
  // evaluate the identical IEEE tree. Shuffles are (doc_id, word) and
  // (word) — linear in token count, no dense vectors anywhere.
  def bm25Over(
      df: DataFrame, idCol: Column, textCol: Column,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = df.select(idCol.as("doc_id"), explode(tokens(textCol)).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    // dl off the TF rollup, not the raw token stream: Σ tf per doc is
    // exactly the doc's token count (integer arithmetic — bit-identical
    // dl), and it shuffles |distinct (doc, word)| rows instead of
    // |tokens| — on a natural-language corpus a 2–5× smaller exchange,
    // and the (doc_id, word) exchange feeding it is shared with the
    // scoring join (guide §2.3 aggregate-before-shuffle)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val docFreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val avgdl = col("total_dl").cast("double") / col("n_docs")
    val idf = call_function("math_ln",
      lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    tf.join(dl, "doc_id")
      .join(docFreq, "word")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("word"), col("tf"),
        (idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))))
          .as("bm25"))
  }

  def bm25Exact(t: Tables): DataFrame = {
    import t.spark.implicits._
    bm25Over(t.documents, $"doc_id", $"text").orderBy($"doc_id", $"word")
  }

  // ── q128: BM25 top-k retrieval ──────────────────────────────────────
  /** The query-side half of the q88 scoring matrix — what a user of a
    * corpus search layer actually runs: score(q, d) = Σ_{w ∈ q}
    * bm25(d, w) over the query's DISTINCT terms, top `k` docs per
    * query. The matrix join touches only postings of query terms
    * (queries broadcast — the |Q|-bounded side never shuffles the
    * corpus), and the per-(q, d) score folds its ≤|q| terms in word
    * order (sorted struct array ↔ `list(term ORDER BY word)`), the
    * q79 recipe that makes the order-dependent double sum
    * cross-engine exact. Top-k is one ranking window over ≤ |Q|·N
    * candidate rows, tie-broken on doc_id. */
  def bm25TopKOver(
      corpus: DataFrame, idCol: Column, textCol: Column,
      queries: DataFrame, qIdCol: Column, qTextCol: Column,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val m = bm25Over(corpus, idCol, textCol, k1, b)
    val qw = queries.select(qIdCol.as("q_id"),
      explode(array_distinct(tokens(qTextCol))).as("word"))
    val scored = m.join(broadcast(qw), Seq("word"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sort_array(collect_list(struct(col("word"), col("bm25")))).as("arr"))
      .select(col("q_id"), col("doc_id"), col("n_terms"),
        aggregate(col("arr"), lit(0.0), (a, x) => a + x.getField("bm25"))
          .as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Fixture retrieval: queries are the first 4 tokens of docs 0–4
    * (deterministic, reconstructible in the oracle). */
  def bm25TopK(t: Tables, k: Int = 10): DataFrame = {
    import t.spark.implicits._
    val queries = t.documents.filter($"doc_id" < 5)
      .select($"doc_id".as("qid"),
        array_join(slice(tokens($"text"), 1, 4), " ").as("qtext"))
    bm25TopKOver(t.documents, $"doc_id", $"text", queries, $"qid", $"qtext", k)
      .orderBy($"q_id", $"rank")
  }

  // ── q160/q161: hybrid retrieval — reciprocal-rank fusion ────────────
  /** RRF (Cormack, Clarke & Buettcher, SIGIR 2009): fuse N per-query
    * rankings into one, score(q, d) = Σ_lists 1/(c + rank_list(q, d)),
    * a doc absent from a list contributing 0 — the standard hybrid-
    * retrieval combiner (sparse BM25 + dense ANN) because it needs no
    * score calibration, only ranks. Engine-exact by construction:
    * ranks are exact integers, each term is ONE correctly-rounded
    * division of exactly-representable operands, and the terms add in
    * fixed list order (a left-associated chain, not a SUM agg — agg
    * order isn't deterministic); final ties break on doc_id.
    *
    * Each input ranking is already top-k per query, so fusion only
    * ever touches O(|Q|·k·lists) candidate rows — the corpus-scale
    * work lives in the upstream retrieval operators; this composition
    * adds one narrow agg and a |Q|-partitioned ranking window over a
    * tiny frame, whatever the corpus size. */
  def rrfFuseOver(rankings: Seq[(String, DataFrame)], k: Int = 10,
      c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(c >= 1, s"rrf constant must be >= 1: $c")
    val tagged = rankings.zipWithIndex.map { case ((_, df), i) =>
      df.select(col("q_id"), col("doc_id"),
        col("rank").cast("int").as("rank"), lit(i).as("src"))
    }.reduce(_ unionAll _)
    val rankCols = rankings.zipWithIndex.map { case ((name, _), i) =>
      max(when(col("src") === i, col("rank"))).as(s"rank_$name") }
    val g = tagged.groupBy(col("q_id"), col("doc_id"))
      .agg(rankCols.head, rankCols.tail: _*)
    val rrf = rankings.map { case (name, _) =>
      when(col(s"rank_$name").isNotNull,
        lit(1.0) / (lit(c) + col(s"rank_$name")).cast("double"))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    g.withColumn("rrf", rrf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** q160: RRF of the two oracle-exact retrieval halves — q128's BM25
    * top-k over `documents` and the brute-force exact-cosine top-k
    * over `embeddings` (the shared integer id space is the doc key;
    * at sf0.1 the embedding side covers only a prefix of the corpus,
    * which is the realistic partially-embedded-corpus case RRF
    * handles natively via the absent-list-0 term). Fully
    * hash-checked: the oracle replays both rankings AND the fusion. */
  def rrfHybrid(t: Tables, k: Int = 10): DataFrame = {
    import t.spark.implicits._
    val bm = bm25TopK(t, k).select($"q_id", $"doc_id", $"rank")
    val cos = Similarity.knnBruteForce(t)
      .select($"q_id", $"vec_id".as("doc_id"), $"rank")
    rrfFuseOver(Seq("bm25" -> bm, "cos" -> cos), k)
      .orderBy($"q_id", $"rank")
  }

  /** q161: the production fusion — same BM25 half, but the dense half
    * is the IVF-PQ ANN shortlist (q135's scale path) instead of the
    * brute-force scan — gated against the exact fusion: mean
    * overlap@k of the ANN-fused list vs the exact-fused list must
    * clear `floor` (the q101/q102/q135 contract shape; the oracle
    * asserts the gate, the engine recomputes both fusions). */
  def rrfAnnGate(t: Tables, k: Int = 10, floor: Double = 0.8): DataFrame = {
    import t.spark.implicits._
    // NOTE (r14): checkpointing bm/exact here was TRIED and reverted —
    // ReuseExchange already runs the duplicated subtrees once inside
    // the single gate job, whose independent branches schedule
    // concurrently; splitting them into sequential checkpoint jobs
    // measured 5.6→6.9 s solo (serialized previously-parallel stages)
    val bm = bm25TopK(t, k).select($"q_id", $"doc_id", $"rank")
    val exact = rrfFuseOver(Seq(
      "bm25" -> bm,
      "cos" -> Similarity.knnBruteForce(t)
        .select($"q_id", $"vec_id".as("doc_id"), $"rank")), k)
      .select($"q_id", $"doc_id")
    val fused = rrfFuseOver(Seq(
      "bm25" -> bm,
      "cos" -> Similarity.annPq(t)
        .select($"q_id", $"vec_id".as("doc_id"), $"rank")), k)
      .select($"q_id", $"doc_id")
    val hits = exact.join(fused, Seq("q_id", "doc_id"), "left_semi")
      .groupBy($"q_id").agg(count(lit(1)).as("n_hits"))
    val perQ = exact.select($"q_id").distinct()
      .join(hits, Seq("q_id"), "left")
      .select($"q_id", coalesce($"n_hits", lit(0L)).as("n_hits"))
    val gate = perQ
      .agg((sum($"n_hits").cast("double") /
        (count(lit(1)) * k.toDouble) >= floor).as("meets_floor"))
    perQ.select($"q_id").crossJoin(broadcast(gate)).orderBy($"q_id")
  }

  // ── q93: inverted index (posting lists) ─────────────────────────────
  // The retrieval-side dual of TF-IDF/BM25: per term, document
  // frequency, collection frequency, and the doc-id posting list in
  // ascending order. The list is emitted as a joined STRING —
  // deterministic bytes both engines can hash — after sorting the ids
  // NUMERICALLY (sort before cast; "10" < "2" lexically). Shuffle is
  // (word, doc_id) pairs then one agg per term; a term's posting list
  // lives on one reducer, which is exactly how a real index shard is
  // built (hot stopword terms are the known skew — at web scale the
  // df>=minDf band or a stopword cut bounds them).
  def invertedIndexOver(
      df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val words = df.select(idCol.as("doc_id"), explode(tokens(textCol)).as("word"))
    val tf = words.groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        array_join(sort_array(collect_list(col("doc_id"))).cast("array<string>"), ",")
          .as("postings"))
  }

  def invertedIndex(t: Tables): DataFrame = {
    import t.spark.implicits._
    invertedIndexOver(t.documents, $"doc_id", $"text").orderBy($"word")
  }

  // ── q62: context-window packing (concat-and-chunk) ──────────────────
  // The standard pretraining packing: documents are concatenated in
  // id order and the token stream is cut into fixed windows of
  // `windowTokens`. Per document: its start offset in the stream and
  // the window range it spans.
  //
  // The global prefix sum is computed the DISTRIBUTED way — a naive
  // `Window.orderBy(id)` with no partitionBy funnels the whole corpus
  // through ONE task and cannot scale. Instead: bucket ids into
  // contiguous ranges by a DETERMINISTIC monotone function of the id
  // (fixed-width slices of the observed [min, max] span — one narrow
  // agg job to find it, no sampling, no spark_partition_id, so every
  // plan branch computes identical buckets by construction), run the
  // prefix sum per bucket in parallel, and add each bucket's broadcast
  // starting offset (per-bucket totals are P rows — driver-trivial).
  // The RESULT is identical for any bucketing — a skewed id space only
  // degrades parallelism, never correctness.
  def packWindowsOver(
      df: DataFrame, idCol: Column, textCol: Column, windowTokens: Int): DataFrame = {
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism / 2, 4)
    // ids must define a numeric global order for the concat stream;
    // integral types cast losslessly (the facade contract — string ids
    // would need an explicit ordinal first)
    val sized0 = df.select(idCol.cast("long").as("doc_id"),
      tokenCount(textCol).as("n_tokens"))
    // bounds as a broadcast one-row join keeps the whole plan LAZY
    // (no job at construction) and always consistent with the data
    // actually scanned; integer DIV keeps the bucketing exact for the
    // full long range
    val bounds = sized0.agg(
      min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
    val sized = sized0
      .crossJoin(broadcast(bounds))
      .withColumn("pid",
        expr(s"CAST((doc_id - __mn) DIV (((__mx - __mn) DIV $parts) + 1) AS INT)"))
      .drop("__mn", "__mx")
    // P subtotal rows: the single-partition window here is over P rows,
    // not the corpus
    val offW = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sized.groupBy(col("pid")).agg(sum(col("n_tokens")).as("psum"))
      .withColumn("offset", coalesce(sum(col("psum")).over(offW), lit(0L)))
      .select(col("pid"), col("offset"))
    val localW = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized
      .join(broadcast(offsets), "pid")
      .withColumn("start_pos", col("offset") + sum(col("n_tokens")).over(localW) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start_pos"),
        floor(col("start_pos") / windowTokens).cast("int").as("window_start"),
        floor((col("start_pos") + col("n_tokens") - 1) / windowTokens).cast("int").as("window_end"))
  }

  def packWindows(t: Tables, windowTokens: Int = 512): DataFrame = {
    import t.spark.implicits._
    packWindowsOver(t.documents, $"doc_id", $"text", windowTokens).orderBy($"doc_id")
  }

  // ── q63: document chunking (fixed token windows per doc) ────────────
  // Split each document into ≤chunkTokens-token chunks — the unit of
  // embedding/indexing pipelines. One output row per chunk; per-row
  // array slicing only, embarrassingly parallel.
  def chunkOver(df: DataFrame, idCol: Column, textCol: Column, chunkTokens: Int): DataFrame = {
    val toks = tokens(textCol)
    val nChunks = ceil(size(toks) / lit(chunkTokens.toDouble)).cast("int")
    df
      .select(idCol.as("doc_id"), toks.as("toks"),
        explode(sequence(lit(1), nChunks)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(slice(col("toks"), (col("chunk_idx") - 1) * chunkTokens + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        size(slice(col("toks"), (col("chunk_idx") - 1) * chunkTokens + 1, lit(chunkTokens)))
          .as("chunk_tokens"))
  }

  def chunkDocuments(t: Tables, chunkTokens: Int = 32): DataFrame = {
    import t.spark.implicits._
    chunkOver(t.documents, $"doc_id", $"text", chunkTokens).orderBy($"doc_id", $"chunk_idx")
  }

  // ── q64: deterministic hash split (train/valid/test) ────────────────
  // Content-keyed, engine-neutral: bucket = first 48 bits of md5(content)
  // mod 100. Content-keyed (not id-keyed) so exact duplicates always
  // land in the same split — the leakage guard a training pipeline
  // actually needs. No RNG: re-running on any engine reproduces the
  // same split.
  def hashSplitOver(
      df: DataFrame, idCol: Column, contentCol: Column,
      trainPct: Int, validPct: Int): DataFrame = {
    val bucket = conv(substring(md5(contentCol), 1, 12), 16, 10).cast("bigint") % 100
    df.select(idCol.as("doc_id"), bucket.cast("int").as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + validPct, "valid")
          .otherwise("test"))
  }

  def hashSplit(t: Tables, trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    import t.spark.implicits._
    hashSplitOver(t.documents, $"doc_id", $"text", trainPct, validPct).orderBy($"doc_id")
  }

  // ── q65: repetition signals (Gopher-style quality filters) ──────────
  // top_bigram_frac: share of the most frequent bigram among all
  // bigram occurrences; dup_trigram_frac: share of repeated trigrams.
  // Entirely per-row native array arithmetic (word_ngrams +
  // max_multiplicity) — NO explode, NO shuffle, no join: the whole
  // query is one embarrassingly-parallel projection, the shape that
  // scales to any corpus. (The DuckDB oracle computes the same
  // multiplicities via explode + two aggregations — value-identical
  // exact rationals.) Docs too short for a signal get the -1.0
  // sentinel.
  def repetitionSignalsOver(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = tokens(textCol)
    val bi = wordNgrams(toks, 2)
    val tri = wordNgrams(toks, 3)
    df.select(idCol.as("doc_id"),
      coalesce(maxMultiplicity(bi).cast("double") / nullif(size(bi), lit(0)), lit(-1.0))
        .as("top_bigram_frac"),
      coalesce(lit(1.0) - size(array_distinct(tri)).cast("double") / nullif(size(tri), lit(0)),
        lit(-1.0)).as("dup_trigram_frac"))
  }

  def repetitionSignals(t: Tables): DataFrame = {
    import t.spark.implicits._
    repetitionSignalsOver(t.documents, $"doc_id", $"text").orderBy($"doc_id")
  }

  // ── q66: sessionization over the event stream ───────────────────────
  // A session break is a > `gapSeconds` silence per user; session ids
  // are the running count of breaks (lag + cumulative sum — the
  // canonical two-window formulation; partitions by user, so scales
  // with user cardinality, and both windows share one shuffle).
  def sessionizeOver(
      df: DataFrame, userCol: Column, idCol: Column, tsCol: Column,
      gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .select(userCol.as("user_id"), idCol.as("event_id"), tsMicros(tsCol).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(order))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapSeconds * 1000000L, 1).otherwise(0))
      .select(col("user_id"), col("event_id"),
        sum(col("is_new")).over(run).cast("int").as("session_id"))
  }

  def sessionize(t: Tables, gapSeconds: Long = 1800L): DataFrame = {
    import t.spark.implicits._
    sessionizeOver(t.events, $"user_id", $"event_id", $"ts", gapSeconds)
      .orderBy($"user_id", $"event_id")
  }

  // ── q68: deterministic mixture sampling ─────────────────────────────
  // Training-mixture construction: each source gets a sampling rate
  // (keep wiki-like sources, downsample web-like ones); a document
  // survives iff its content-hash bucket falls under the rate — no
  // RNG, so the mixture is reproducible on any engine and exact
  // duplicates sample identically. Rates here step down by source
  // index bucket (src0-4: 1.0, src5-9: 0.5, src10-14: 0.25, else 0.1).
  def mixtureSample(t: Tables): DataFrame = {
    import t.spark.implicits._
    val idx = substring($"source", 4, 10).cast("int")
    val weight = when(idx < 5, 1.0).when(idx < 10, 0.5)
      .when(idx < 15, 0.25).otherwise(0.1)
    val bucket = (conv(substring(md5($"text"), 1, 12), 16, 10).cast("bigint") % 1000)
      .cast("int")
    t.documents
      .select($"doc_id", $"source", bucket.as("bucket"),
        (bucket < (weight * 1000).cast("int")).as("kept"))
      .orderBy($"doc_id")
  }

  // ── q126: deterministic weighted sampling (Efraimidis–Spirakis) ─────
  /** Weight-proportional top-`n` sample WITHOUT RNG — the
    * data-budgeting primitive a mixture pipeline needs when sources
    * get token-weighted quotas rather than q68's per-source rates.
    * Efraimidis–Spirakis A-Res: each row draws key = −ln(u)/w and the
    * n SMALLEST keys win — inclusion probability proportional to `w`,
    * sampling without replacement, one distributed top-k
    * (TakeOrderedAndProject: per-partition heaps, k rows to the
    * driver — no shuffle of the corpus).
    *
    * Determinism/portability: u comes from the content hash, not an
    * RNG — h = first 48 bits of md5, u = (h+1)/(2⁴⁸+1) ∈ (0,1). Both
    * operands are exact in double, the division is one correctly-
    * rounded IEEE op, ln is the glibc-bit-exact `math_ln`, and the
    * negate/divide shapes match the oracle SQL literally — so the
    * race keys (and the sample) are bit-identical on any engine and
    * any partitioning, and exact duplicate texts always race
    * identically. */
  def weightedSampleOver(
      df: DataFrame, idCol: Column, contentCol: Column,
      weightCol: Column, n: Int): DataFrame = {
    require(n >= 1, s"sample size must be >= 1: $n")
    val h = conv(substring(md5(contentCol), 1, 12), 16, 10).cast("bigint")
    val u = (h + lit(1L)).cast("double") / lit(281474976710657.0) // 2^48+1
    val key = -call_function("math_ln", u) / weightCol.cast("double")
    df.filter(weightCol >= 1) // before the key: w = 0 must not divide
      .select(idCol.as("doc_id"), weightCol.cast("long").as("weight"),
        key.as("race_key"))
      .orderBy(col("race_key"), col("doc_id"))
      .limit(n)
  }

  def weightedSample(t: Tables, n: Int = 100): DataFrame = {
    import t.spark.implicits._
    weightedSampleOver(t.documents, $"doc_id", $"text",
      tokenCount($"text"), n)
  }

  // ── q67: benchmark contamination check ──────────────────────────────
  // What fraction of each corpus document's shingles appear in a
  // benchmark set? The benchmark's distinct shingle set is small →
  // broadcast; corpus shingles stream past it without shuffling text.
  // The n-gram-overlap decontamination every LLM training run performs
  // against its eval suites.
  def contaminationOver(
      corpus: DataFrame, idCol: Column, corpusText: Column,
      benchmark: DataFrame, benchText: Column, k: Int): DataFrame = {
    val corpusSh = corpus.select(idCol.as("doc_id"), explode(shingles(corpusText, k)).as("sh"))
    val benchSh = benchmark.select(explode(shingles(benchText, k)).as("sh")).distinct()
    corpusSh
      .join(broadcast(benchSh.withColumn("hit", lit(1))), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_shingles")).as("contamination"))
  }

  def contamination(t: Tables, benchmarkSource: String = "src0", k: Int = 3): DataFrame = {
    import t.spark.implicits._
    contaminationOver(
      t.documents.filter($"source" =!= benchmarkSource), $"doc_id", $"text",
      t.documents.filter($"source" === benchmarkSource), $"text", k)
      .orderBy($"doc_id")
  }

  // ── q122: cross-document duplicated spans (exact-substring dedup) ───
  // The token-level complement of the shingle-set dedup family: find
  // every MAXIMAL token span that some OTHER document also contains,
  // per document — the ExactSubstr pass of Lee et al. 2022
  // ("Deduplicating Training Data Makes Language Models Better",
  // arXiv:2107.06499), which removes repeated boilerplate even when
  // whole-document similarity is low. Their suffix array is a shared-
  // memory construction; the distributed re-expression is the
  // standard k-gram seeding: a position is covered iff its k-gram
  // occurs in ≥ 2 distinct documents, and runs of covered positions
  // merge into maximal spans (gaps-and-islands over a per-doc
  // window). Every stage is a narrow shuffle: (gram, doc) pairs for
  // the frequency pass, (doc, pos) ints for the span pass — the text
  // column never moves. Per-doc output is bounded by doc length, so
  // answer volume is linear in corpus size. The gram key here is the
  // literal string (engine-neutral, DuckDB-oracle-checkable); a
  // 100 TB run would key on xxhash64(gram) instead — 8-byte shuffle
  // rows, same plan shape, collision risk ~n²/2⁶⁴.
  def dupSpansOver(
      df: DataFrame, idCol: Column, textCol: Column, k: Int): DataFrame = {
    val grams = df.select(idCol.as("doc_id"),
      posexplode(wordNgrams(tokens(textCol), k)).as(Seq("pos", "gram")))
    // grams seen in ≥ 2 distinct docs; within-doc repetition alone
    // (q65's signal) does not make a span "duplicated elsewhere"
    val dup = grams.groupBy(col("gram"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("gram"))
    val hits = grams.join(dup, Seq("gram")).select(col("doc_id"), col("pos"))
    // islands: a new span starts where pos clears every prior
    // interval's end (running max over [start, prev] — exclusive of
    // self, so the first row's NULL marks the first island)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val islands = hits
      .withColumn("end", col("pos") + k)
      .withColumn("pme", max(col("end"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("span_id", sum(
        when(col("pme").isNull || col("pos") > col("pme"), 1).otherwise(0))
        .over(w))
    islands.groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("s"), max(col("end")).as("e"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).as("dup_tokens"),
        max(col("e") - col("s")).as("longest_span"))
  }

  def dupSpans(t: Tables, k: Int = 8): DataFrame = {
    import t.spark.implicits._
    dupSpansOver(t.documents, $"doc_id", $"text", k).orderBy($"doc_id")
  }

  // ── q133: BPE merge induction (tokenizer training) ──────────────────
  // Real byte-pair-encoding vocabulary learning, the way production
  // tokenizer trainers run it: ONE corpus-scale pass builds the
  // (word, frequency) table, then every merge round operates on the
  // DISTINCT-WORD table — orders of magnitude smaller than the corpus
  // — so k rounds cost k narrow pair-count shuffles over words, not k
  // corpus scans. Variant: only DISTINCT pairs (l ≠ r) are merge
  // candidates, which makes a merge position-local (an l≠r pattern
  // cannot overlap itself, so greedy left-to-right == simultaneous
  // replacement) — every round is a pure `transform`+`filter` over
  // the symbol array, codegen'd builtins end to end, no UDF, and the
  // identical CASE arithmetic replays in the oracle's chained CTEs.
  // Tie-break (count desc, then pair lexicographic) makes the merge
  // sequence engine-deterministic.
  /** Learn `k` BPE merges over a text column. Output: one row per
    * round — (merge_rank, l, r, merged, pair_count). The per-round
    * top-1 collect is a bounded driver scalar (one row per round,
    * k ≤ 64), the same declared shape as PageRank's per-iteration
    * node-count broadcast. */
  def bpeMergesOver(df: DataFrame, textCol: Column, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val (merges, _) = bpeTrain(df, textCol, k)
    merges.toSeq.toDF("merge_rank", "l", "r", "merged", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** The k training rounds behind [[bpeMergesOver]]/[[bpeVocabOver]]:
    * returns the merge sequence plus the final materialized
    * word-symbol table.
    *
    * Lineage is cut per round with an EAGER `localCheckpoint`, not
    * `persist`: Spark's CacheManager keys cached plans by
    * logical-plan equality, so two concurrent queries training over
    * the same corpus (q133 + q134 in the bench's throughput lane)
    * SHARE each round's cache entry — and whichever finishes first
    * unpersists it out from under the other. The survivor's next
    * round then recomputes through the collapsed k-round nested
    * `transform` chain, whose project-collapsed expression grows
    * ~5^k copies of the base plan (measured: 1.6 s solo → 430 s in
    * the 16-stream lane). A checkpoint truncates the plan itself, so
    * no cross-query cache race can ever re-expand it. */
  private def bpeTrain(df: DataFrame, textCol: Column, k: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    require(k >= 1 && k <= 64, s"merge rounds out of range: $k")
    val syms = col("syms")
    var state = df
      .select(explode(split(textCol, " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(filter(split(col("word"), ""), c => c =!= "").as("syms"), col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    for (round <- 1 to k) {
      // adjacent distinct pairs, weighted by word frequency
      val top = state
        .select(col("n"), explode(filter(transform(syms,
          (x, i) => when(x =!= get(syms, i + 1),
            struct(x.as("l"), get(syms, i + 1).as("r")))),
          p => p.isNotNull)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      require(top.nonEmpty, s"corpus exhausted after ${round - 1} merges")
      val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((round, l, r, l + r, cnt))
      val (lc, rc) = (lit(l), lit(r))
      // position-local merge: emit l||r where the pair starts, drop
      // the consumed right symbol, keep everything else (l ≠ r ⇒ the
      // two conditions can never both hold at one position)
      // eager checkpoint materializes the round AND truncates the
      // plan — see the lineage note on bpeTrain
      state = state.select(filter(transform(syms, (x, i) =>
        when(x === lc && get(syms, i + 1) === rc, concat(x, get(syms, i + 1)))
          .when(get(syms, i - 1) === lc && x === rc, lit(null).cast("string"))
          .otherwise(x)), x => x.isNotNull).as("syms"), col("n"))
        .localCheckpoint()
    }
    (merges.toSeq, state)
  }

  def bpeMerges(t: Tables, k: Int = 6): DataFrame = {
    import t.spark.implicits._
    bpeMergesOver(t.documents, $"text", k)
  }

  /** q134: APPLY the learned vocabulary — tokenize the corpus with
    * the k merges and emit the top subword tokens by total occurrence
    * count (count desc, token asc — deterministic). The tokenized
    * corpus is just the final word-symbol table re-weighted by word
    * frequency, so the apply step costs one explode+agg over the
    * distinct-word table — the corpus itself never reshuffles. */
  def bpeVocabOver(df: DataFrame, textCol: Column, k: Int,
      topN: Int): DataFrame = {
    val (_, state) = bpeTrain(df, textCol, k)
    // the trained table is checkpointed, so this topN reads the
    // materialized blocks — no round replays downstream
    state.select(explode(col("syms")).as("token"), col("n"))
      .groupBy(col("token")).agg(sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(topN)
  }

  def bpeVocab(t: Tables, k: Int = 6, topN: Int = 20): DataFrame = {
    import t.spark.implicits._
    bpeVocabOver(t.documents, $"text", k, topN)
  }

  // ── q136: global chunk-level dedup → cleaned corpus (C4-style) ──────
  /** The REMOVAL member of the dedup family: every other dedup query
    * detects (pairs, clusters, spans, survivors) — this one rewrites
    * the corpus. C4's famous preprocessing step deduplicates the web
    * at the LINE level, keeping only the first occurrence of each
    * line corpus-wide (Raffel et al. 2020, §2.2 "we discard all but
    * one of any three-sentence span occurring more than once").
    * The fixture corpus has no line breaks, so the unit is the q63
    * fixed-width token chunk; the semantics are identical: a chunk
    * survives iff its (doc_id, chunk_idx) is the global minimum over
    * all occurrences of that exact chunk text, and each document is
    * reassembled from its surviving chunks in order.
    *
    * Plan shape (the part that must survive 100 TB): chunk texts
    * shuffle ONCE, keyed by md5(chunk) — (1) a groupBy(md5) min-
    * (doc, idx) pass with map-side combine (hot chunks collapse to
    * one row per map task, so the keeper agg is skew-proof), (2) an
    * equi-join of the chunk stream against the keeper table on the
    * same 16-byte key (AQE splits a pathological hot-chunk partition;
    * the join output is pre-filtered to the keeper row), (3) a
    * (doc_id) agg to reassemble. Text never moves except as the
    * chunk payload itself, and the rewritten corpus is emitted as
    * per-doc token counts + md5 so the answer volume is O(docs),
    * not O(text). Collision risk of keying on md5 is n²/2¹²⁸.
    *
    * Output: (doc_id, n_chunks, n_kept, clean_tokens, clean_md5) —
    * clean_md5 is md5 of the surviving chunks joined in order (NULL
    * when the whole document was removed, e.g. an exact duplicate of
    * an earlier doc loses every chunk). */
  def chunkDedupOver(df: DataFrame, idCol: Column, textCol: Column,
      chunkTokens: Int): DataFrame = {
    val units = chunkOver(df, idCol, textCol, chunkTokens)
      .withColumn("ck", md5(col("chunk_text")))
    val keepers = units.groupBy(col("ck"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("keeper"))
    val kept = units.join(keepers, "ck")
      .filter(col("doc_id") === col("keeper.doc_id") &&
        col("chunk_idx") === col("keeper.chunk_idx"))
    val cleaned = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("chunk_tokens")).cast("bigint").as("clean_tokens"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          c => c.getField("chunk_text")), " ")).as("clean_md5"))
    units.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_tokens"), lit(0L)).as("clean_tokens"),
        col("clean_md5"))
  }

  def chunkDedup(t: Tables, chunkTokens: Int = 16): DataFrame = {
    import t.spark.implicits._
    chunkDedupOver(t.documents, $"doc_id", $"text", chunkTokens)
      .orderBy($"doc_id")
  }

  // ── q138: temperature-scaled domain mixture allocation ──────────────
  /** The budgeting layer ABOVE q68/q126: given per-source token
    * counts, α-temperature sampling (Lample & Conneau 2019 §3.1 —
    * the XLM/mBERT recipe) allocates a token budget B as
    * p_s ∝ c_s^α, so low-resource domains are upsampled relative to
    * their share (α < 1 flattens the distribution; α = 1 is
    * proportional, α = 0 uniform). Emits per source the sampling
    * probability, the allocated tokens, and the implied epoch count
    * alloc/c (how many passes over that domain the budget buys —
    * the number a curriculum planner actually reads).
    *
    * Exactness: c_s is an exact integer; c^0.5 = sqrt is correctly
    * rounded in IEEE, and Σ√c folds in source order (the q79 sorted-
    * fold recipe) so both engines build bit-identical doubles. The
    * per-source table is tiny — domain counts, not documents — so
    * the normalizer rides a one-row broadcast; the only corpus-sized
    * work is the (source) token-count agg, map-side combined. */
  def mixtureAllocOver(df: DataFrame, sourceCol: Column, textCol: Column,
      budgetTokens: Long): DataFrame = {
    val perSource = df
      .select(sourceCol.as("source"), tokenCount(textCol).cast("bigint").as("tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("c_tokens"))
      .withColumn("w", sqrt(col("c_tokens").cast("double")))
    val norm = perSource
      .agg(aggregate(
        sort_array(collect_list(struct(col("source"), col("w")))),
        lit(0.0), (a, x) => a + x.getField("w")).as("sum_w"))
    perSource.crossJoin(broadcast(norm))
      .select(col("source"), col("n_docs"), col("c_tokens"),
        (col("w") / col("sum_w")).as("p"),
        (lit(budgetTokens.toDouble) * (col("w") / col("sum_w"))).as("alloc_tokens"),
        (lit(budgetTokens.toDouble) * (col("w") / col("sum_w")) /
          col("c_tokens").cast("double")).as("epochs"))
  }

  def mixtureAlloc(t: Tables, budgetTokens: Long = 1000000L): DataFrame = {
    import t.spark.implicits._
    mixtureAllocOver(t.documents, $"source", $"text", budgetTokens)
      .orderBy($"source")
  }

  // ── q141: train/test split leakage audit (chunk granularity) ────────
  /** The integrity check a training pipeline runs AFTER splitting:
    * for each pair of splits, how many distinct 16-token chunks
    * appear in BOTH — the eval-contamination channel duplicated text
    * opens across a split boundary. Audits two schemes side by side:
    * `id` (bucket = doc_id mod 100, the naive key) and `content`
    * (q64's md5(text) bucketing). The content key provably closes the
    * EXACT-duplicate channel (identical docs share a bucket), but
    * this audit measures what it does NOT close: near-duplicate and
    * boilerplate chunks still straddle splits under ANY document-
    * level key — which is exactly why corpus-level dedup (q136/q122)
    * runs BEFORE splitting. All six (scheme, pair) rows are emitted,
    * zeros included — an absent row and a zero are different claims.
    *
    * Plan: per scheme, distinct (md5(chunk), split) pairs — one
    * 16-byte-key shuffle, chunk text never moves past its hash —
    * then a self-join on the hash restricted to split_a < split_b.
    * A chunk has ≤ 3 splits, so the join output is bounded by 3 rows
    * per distinct chunk. */
  def splitLeakageOver(df: DataFrame, idCol: Column, textCol: Column,
      trainPct: Int, validPct: Int, chunkTokens: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def splitOf(bucket: Column): Column =
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + validPct, "valid").otherwise("test")
    val toks = tokens(textCol)
    val nChunks = ceil(size(toks) / lit(chunkTokens.toDouble)).cast("int")
    val chunks = df
      .select(idCol.as("doc_id"),
        splitOf(pmod(idCol, lit(100))).as("id_split"),
        splitOf(conv(substring(md5(textCol), 1, 12), 16, 10).cast("bigint") % 100)
          .as("content_split"),
        toks.as("toks"), explode(sequence(lit(1), nChunks)).as("ci"))
      .select(col("id_split"), col("content_split"),
        array_join(slice(col("toks"), (col("ci") - 1) * chunkTokens + 1,
          lit(chunkTokens)), " ").as("chunk_text"))
    val membership = chunks
      .select(lit("id").as("scheme"), md5(col("chunk_text")).as("h"),
        col("id_split").as("split"))
      .union(chunks.select(lit("content").as("scheme"),
        md5(col("chunk_text")).as("h"), col("content_split").as("split")))
      .distinct()
    val leaks = membership.as("a")
      .join(membership.as("b"),
        col("a.scheme") === col("b.scheme") && col("a.h") === col("b.h") &&
          col("a.split") < col("b.split"))
      .groupBy(col("a.scheme").as("scheme"),
        col("a.split").as("split_a"), col("b.split").as("split_b"))
      .agg(count(lit(1)).as("n_shared"))
    val grid = Seq("id", "content").toDF("scheme")
      .crossJoin(Seq(("test", "train"), ("test", "valid"), ("train", "valid"))
        .toDF("split_a", "split_b"))
    grid.join(leaks, Seq("scheme", "split_a", "split_b"), "left")
      .select(col("scheme"), col("split_a"), col("split_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
  }

  def splitLeakage(t: Tables, trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    import t.spark.implicits._
    splitLeakageOver(t.documents, $"doc_id", $"text", trainPct, validPct)
      .orderBy($"scheme", $"split_a", $"split_b")
  }

  // ── q168: leakage-free K-fold target encoding ──────────────────────
  // The standard high-cardinality-categorical feature for tabular
  // models (the reference's GBT pipeline indexes its categoricals
  // verbatim, `assets/NFL_Predictions_Spark.json` StringIndexer
  // stages; target encoding is what replaces that when cardinality
  // explodes): encode each category by the target's mean — but
  // computed LEAVE-FOLD-OUT, so the encoding applied to a row never
  // saw that row's own fold and the feature carries no label leakage.
  //
  //   enc(cat, fold) = (Σ_target(cat) − Σ_target(cat, fold))
  //                  / (n(cat) − n(cat, fold))
  //
  // Exactness: the target rides as integer quantities (cents), so
  // both sums are order-independent exact integers and the one final
  // division is a single deterministic IEEE op — hash-identical to
  // any engine. A category entirely inside one fold has no
  // out-of-fold rows and encodes NULL (the caller backs off to the
  // global mean; emitting a value here would silently leak).
  //
  // Scale: ONE map-side-combinable agg over (category, fold) — k·|cats|
  // output rows no matter the fact-table size — then a groupBy of that
  // tiny frame for the per-category totals and a broadcast-sized join.
  // Applying the encoding to training rows is a broadcast hash join on
  // (category, fold); no shuffle of the fact table beyond the agg.

  /** Generic leave-fold-out target encoding over integer-quantized
    * targets. `targetQ` MUST be an exact integer quantity (quantize
    * floats before calling — cents, micros, whatever the domain's
    * unit is) so fold sums are order-independent. */
  def targetEncodeOver(df: DataFrame, catCol: Column, foldCol: Column,
      targetQ: Column, unitsPerTarget: Long): DataFrame = {
    require(unitsPerTarget > 0, s"unitsPerTarget must be positive: $unitsPerTarget")
    val perFold = df
      .groupBy(catCol.as("category"), foldCol.as("fold"))
      .agg(count(lit(1)).as("n_fold"), sum(targetQ).as("sum_fold"))
    val perCat = perFold
      .groupBy(col("category"))
      .agg(sum(col("n_fold")).as("n_cat"), sum(col("sum_fold")).as("sum_cat"))
    perFold.join(perCat, Seq("category"))
      .select(col("category"), col("fold"), col("n_fold"),
        when(col("n_cat") > col("n_fold"),
          (col("sum_cat") - col("sum_fold")).cast("double") /
            (col("n_cat") - col("n_fold")).cast("double") /
            lit(unitsPerTarget.toDouble))
          .as("enc"))
  }

  /** q168 fixture instance: orders encoded by (priority, status) with
    * o_totalprice (cents-quantized) as the target, 5 folds keyed on
    * the order key. */
  def orderTargetEncoding(t: Tables, folds: Int = 5): DataFrame = {
    import t.spark.implicits._
    targetEncodeOver(t.orders,
      concat($"o_orderpriority", lit("|"), $"o_orderstatus"),
      pmod($"o_orderkey", lit(folds.toLong)),
      floor($"o_totalprice" * 100 + 0.5).cast("long"),
      unitsPerTarget = 100L)
      .orderBy($"category", $"fold")
  }
}
