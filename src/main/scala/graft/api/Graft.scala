package graft.api

import graft.functions.{SimilarityFunctions, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** User-facing facade: the engine's operators over ARBITRARY
  * DataFrames (not bound to the fixture tables). A user of the
  * reference application — or of any training-data pipeline — imports
  * this one object.
  *
  * Every method returns a lazy DataFrame; nothing collects. Column
  * arguments are Spark `Column`s so expressions compose.
  */
object Graft {

  /** Register graft's native expressions (simhash64, cosine_sim) on a
    * session. Idempotent; required once per session for the functions
    * below. */
  def install(spark: SparkSession): Unit =
    graft.expr.GraftFunctions.register(spark)

  /** Register every fixture table of a data dir as a temp view (and
    * install the native functions), making the full engine surface
    * reachable from `spark.sql(...)` — including the custom
    * expressions: `SELECT simhash64(split(text, ' ')) FROM documents`. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    install(spark)
    val t = graft.Tables(spark, dir)
    Seq(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings
    ).foreach { case (n, df) => df.createOrReplaceTempView(n) }
  }

  // ── dedup ────────────────────────────────────────────────────────────

  /** Exact dedup: keep the row with the smallest `idCol` per distinct
    * `keyCol` value (shuffles a 128-bit fingerprint, not the payload). */
  def dedupExact(df: DataFrame, keyCol: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(md5(keyCol.cast("string"))).orderBy(idCol)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** SimHash near-dup candidate pairs over a text column: banded
    * 64-bit fingerprints (4×16-bit), Hamming ≤ maxHamming. Linear
    * shuffle volume (4 band rows per input row). */
  def nearDupPairsSimhash(
      df: DataFrame, idCol: Column, textCol: Column,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(idCol.as("id"), TextFunctions.simhash(textCol).as("sh"))
    val banded = fp.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
    val a = banded.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bk"))
    val b = banded.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bk"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextFunctions.hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** MinHash-banding near-dup pairs over a text column — the linear-
    * shuffle scale path: shingle → one-pass minhash signatures (native
    * expression) → band-key join carrying only (key, id) → exact
    * jaccard verification of candidates. Returns (id_a, id_b,
    * jaccard_dist ≤ maxDist). */
  def nearDupPairsMinhash(
      df: DataFrame, idCol: Column, textCol: Column,
      maxDist: Double = 0.4, bands: Int = 16, rowsPerBand: Int = 2): DataFrame =
    graft.operators.Dedup.minhashPairsOver(df, idCol, textCol, maxDist, bands, rowsPerBand)

  /** End-to-end corpus dedup — the full pipeline a training-data run
    * wants as one call: exact dedup by content fingerprint, then
    * near-dup clustering (MinHash banding pairs → connected
    * components), keeping one document per cluster (smallest id).
    * Returns the cleaned corpus with the original columns. */
  def dedupCorpus(
      df: DataFrame, idCol: Column, textCol: Column,
      maxDist: Double = 0.4): DataFrame = {
    // localCheckpoint, not cache: the exact-dedup result (a
    // full-corpus window shuffle) is consumed three times below —
    // shingling, clustering, final filter — but cache() would pin the
    // blocks in the CacheManager for the whole session; checkpoint
    // blocks are released by the context cleaner once the returned
    // plan is dropped by the caller
    val exact = dedupExact(df, textCol, idCol).localCheckpoint(true)
    val pairs = nearDupPairsMinhash(exact, idCol, textCol, maxDist)
      .select(col("id_a"), col("id_b"))
    // pairs are mined from `exact` itself → endpoint validation skipped
    val clusters = graft.operators.Dedup.connectedComponents(
      exact.select(idCol.as("id")), pairs, edgesWithinNodes = true)
    val keepers = clusters.filter(col("id") === col("component"))
      .select(col("id").as("__keeper_id"))
    exact.join(keepers, idCol === col("__keeper_id"), "left_semi")
  }

  /** Connected components over an undirected edge list by iterative
    * min-label propagation — the clustering step that turns near-dup
    * PAIRS into dedup groups (component id = min node id; keep that
    * node, drop the rest). Returns (id, component). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame =
    graft.operators.Dedup.connectedComponents(nodes, edges)

  /** Winnowing fingerprint table over a text column: (id, fp) rows of
    * rolling-hash k-gram window minima (MOSS). Any two rows sharing a
    * substring of ≥ k+w−1 chars share at least one fp — group by fp to
    * find substring-level duplication at corpus scale. */
  def winnowFingerprintTable(
      df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 8, w: Int = 4): DataFrame =
    df.select(idCol.as("id"),
      explode(TextFunctions.winnowFingerprints(textCol, k, w)).as("fp"))

  // ── similarity search ────────────────────────────────────────────────

  /** Brute-force top-k nearest neighbours by cosine: probes are
    * broadcast, candidates never shuffle, only ranked rows do. */
  def knnCosine(
      candidates: DataFrame, candId: Column, candVec: Column,
      probes: DataFrame, probeId: Column, probeVec: Column,
      k: Int): DataFrame = {
    val c = candidates.select(candId.as("cand_id"), candVec.as("cand_vec"))
    val p = probes.select(probeId.as("probe_id"), probeVec.as("probe_vec"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    c.join(broadcast(p), col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        SimilarityFunctions.cosine(col("probe_vec"), col("cand_vec")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-label mean embedding, production form: order-independent
    * fixed-point accumulation, no per-group arrays — group
    * cardinality unbounded (Similarity.centroidsOver). */
  def centroids(df: DataFrame, labelCol: Column, embCol: Column): DataFrame =
    graft.operators.Similarity.centroidsOver(df, labelCol, embCol)

  /** Sub-linear embedding near-dup pairs for the HIGH-similarity
    * regime (cos ≳ 0.8): hyperplane-band candidate generation + exact
    * cosine verification. At low thresholds banding cannot reach
    * recall 1 — use the exact block-replicated theta join
    * (Dedup.embeddingNearDups) there. */
  def nearDupPairsEmbeddingBanded(
      df: DataFrame, idCol: Column, embCol: Column, minCos: Double,
      bands: Int = 12, planesPerBand: Int = 4, dim: Int = 64): DataFrame =
    graft.operators.Dedup.embeddingNearDupsBanded(
      df, idCol, embCol, minCos, bands, planesPerBand, dim)

  /** SemDeDup-style semantic dedup: drop rows whose embeddings are
    * near-duplicates (cos ≥ minCos) of a lower-id row — banded
    * candidate mining, exact verify, connected components, min-id
    * keeper. Returns the surviving rows. */
  def semanticDedup(
      df: DataFrame, idCol: Column, embCol: Column, minCos: Double): DataFrame =
    graft.operators.Dedup.semanticDedupOver(df, idCol, embCol, minCos)

  /** Exact heavy hitters (all items with frequency > 1/k) in two
    * bounded-memory passes: a mergeable Misra–Gries sketch narrows to
    * ≤ k−1 candidates, then only those are exact-counted — nothing
    * vocabulary-sized ever shuffles. Returns (word, n). */
  def heavyHitters(df: DataFrame, itemCol: Column, k: Int): DataFrame =
    graft.operators.TextOps.heavyHittersOver(df, itemCol, k)

  // ── text analysis ────────────────────────────────────────────────────

  /** Standard per-document text profile: token counts, lexical
    * diversity, stopword ratio, quality blend, fingerprint, SimHash. */
  def textProfile(df: DataFrame, textCol: Column): DataFrame =
    df.withColumn("n_tokens", TextFunctions.tokenCount(textCol))
      .withColumn("n_distinct", TextFunctions.distinctTokenCount(textCol))
      .withColumn("ttr", TextFunctions.typeTokenRatio(textCol))
      .withColumn("stop_ratio", TextFunctions.stopwordRatio(textCol))
      .withColumn("fingerprint", TextFunctions.fingerprint(textCol))
      .withColumn("simhash64", TextFunctions.simhash(textCol))
      .withColumn("lang_guess", TextFunctions.langId(textCol).getField("lang"))

  // ── training-data pipeline stages ────────────────────────────────────

  /** Exact TF-IDF over a text column: (doc_id, word, tf, df, tfidf)
    * with smoothed idf = ln((N+1)/(df+1)). Shuffles narrow
    * (word, doc_id) pairs — no dense vectors, no feature hashing. */
  def tfidfExact(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    graft.operators.PipelineOps.tfidfExactOver(df, idCol, textCol)

  /** Concat-and-chunk context-window packing: each document's start
    * offset and window span in the concatenated token stream
    * (distributed prefix sum — no single-task global window). */
  def packWindows(df: DataFrame, idCol: Column, textCol: Column,
      windowTokens: Int = 2048): DataFrame =
    graft.operators.PipelineOps.packWindowsOver(df, idCol, textCol, windowTokens)

  /** Split each document into ≤ chunkTokens-token chunks (one row per
    * chunk) — the unit of embedding/indexing pipelines. */
  def chunkDocuments(df: DataFrame, idCol: Column, textCol: Column,
      chunkTokens: Int = 512): DataFrame =
    graft.operators.PipelineOps.chunkOver(df, idCol, textCol, chunkTokens)

  /** Deterministic content-keyed train/valid/test split (md5 bucket
    * mod 100) — exact duplicates always land in the same split. */
  def hashSplit(df: DataFrame, idCol: Column, contentCol: Column,
      trainPct: Int = 80, validPct: Int = 10): DataFrame =
    graft.operators.PipelineOps.hashSplitOver(df, idCol, contentCol, trainPct, validPct)

  /** Gopher-style repetition quality signals per document:
    * top-bigram share and duplicate-trigram share. */
  def repetitionSignals(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    graft.operators.PipelineOps.repetitionSignalsOver(df, idCol, textCol)

  /** Sessionize an event stream: running count of > gapSeconds
    * silences per user. */
  def sessionize(df: DataFrame, userCol: Column, idCol: Column, tsCol: Column,
      gapSeconds: Long = 1800L): DataFrame =
    graft.operators.PipelineOps.sessionizeOver(df, userCol, idCol, tsCol, gapSeconds)

  /** Cross-dataset dedup: drop every corpus document that exactly or
    * nearly duplicates a document in `reference` — the guard against
    * re-ingesting content already in a training set. LSH-banded,
    * exact-verified; returns surviving corpus rows. */
  def dedupAgainst(corpus: DataFrame, idCol: Column, textCol: Column,
      reference: DataFrame, refTextCol: Column,
      maxDist: Double = 0.4): DataFrame =
    graft.operators.Dedup.dedupAgainstOver(
      corpus, idCol, textCol, reference, refTextCol, maxDist)

  /** N-step funnel per user over arbitrary step sequences — emits the
    * first time of each step strictly after the previous one. */
  def funnel(df: DataFrame, userCol: Column, typeCol: Column, tsCol: Column,
      steps: Seq[String]): DataFrame =
    graft.operators.EventOps.funnelOver(df, userCol, typeCol, tsCol, steps)

  /** Per-document n-gram overlap against a benchmark corpus — the
    * decontamination check run against eval suites before training. */
  def contamination(corpus: DataFrame, idCol: Column, corpusText: Column,
      benchmark: DataFrame, benchText: Column, k: Int = 13): DataFrame =
    graft.operators.PipelineOps.contaminationOver(
      corpus, idCol, corpusText, benchmark, benchText, k)

  // ── relational helpers ───────────────────────────────────────────────

  /** As-of join (most recent right row at-or-before each left row). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      leftValue: String, rightValue: String): DataFrame =
    graft.operators.AsOfJoin.joinPrior(left, right, key, leftTs, rightTs, leftValue, rightValue)

  /** Skew-safe sum/count aggregation (two-phase salted group-by). */
  def saltedSumCount(df: DataFrame, key: String, valueExpr: Column,
      buckets: Int, sumName: String, cntName: String): DataFrame =
    graft.operators.Skew.saltedSumCount(df, key, valueExpr, buckets, sumName, cntName)

  /** Exact per-group sample covariance + Pearson correlation of two
    * fixed-point columns (`xDecimals`/`yDecimals` fractional digits):
    * floor-recovered integer moments in DECIMAL(38,0) — deterministic
    * under any partitioning, unlike native corr/covar_samp's
    * order-dependent Welford floats. */
  def exactCorrelation(df: DataFrame, keyCol: Column, xCol: Column, yCol: Column,
      xDecimals: Int = 0, yDecimals: Int = 0): DataFrame =
    graft.operators.Relational.exactCorrelationOver(
      df, keyCol, xCol, yCol, xDecimals, yDecimals)

  /** Per-group top-k with a deterministic tiebreaker. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
      orderCols: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= k)
      .withColumnRenamed("_rank", "rank")
  }

  /** Mask emails / NANP phones / IPv4 literals; per-class counts. */
  def redactPii(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    graft.operators.ScrubOps.redactPiiOver(df, idCol, textCol)

  /** Strip HTML tags + markdown emphasis/links (anchors kept). */
  def stripMarkup(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    graft.operators.ScrubOps.stripMarkupOver(df, idCol, textCol)

  /** Per-domain (url count, distinct doc count) profile. */
  def urlDomains(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    graft.operators.ScrubOps.urlDomainsOver(df, idCol, textCol)

  /** Deterministic fixed-n-per-stratum sample (exact two-phase top-k). */
  def stratifiedSample(df: DataFrame, strataCol: Column, idCol: Column,
      n: Int, saltParts: Int = 16): DataFrame =
    graft.operators.ScrubOps.stratifiedSampleOver(df, strataCol, idCol, n, saltParts)

  /** Perplexity-style corpus-unigram NLL quality signal. */
  def unigramNll(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    graft.operators.TextOps.unigramNllOver(df, idCol, textCol)

  /** Top-k word collocations by pointwise mutual information. */
  def pmiCollocations(df: DataFrame, textCol: Column,
      minCount: Long = 5L, k: Int = 50): DataFrame =
    graft.operators.TextOps.pmiCollocationsOver(df, textCol, minCount, k)

  /** Held-out bigram Stupid-Backoff NLL quality signal: the model is
    * counted on the doc_id %% 2 == 0 half and scores every document,
    * so unseen bigrams and OOV words exercise the backoff tiers. */
  def bigramBackoffNll(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    graft.operators.TextOps.bigramBackoffNllOver(df, idCol, textCol)

  // ── streaming ingest ─────────────────────────────────────────────────

  /** Streaming exact dedup by content fingerprint: first occurrence
    * passes, duplicates within the watermark horizon are dropped
    * (16-byte state per distinct fingerprint). */
  def streamDedupByContent(docs: DataFrame, tsCol: String, textCol: String,
      delay: String): DataFrame =
    graft.streaming.StreamDedup.dedupedByContent(docs, tsCol, textCol, delay)

  /** Streaming heavy hitters: per event-time window, a mergeable
    * Misra–Gries summary (O(k) state per window — every item with
    * in-window frequency > 1/k is guaranteed present, estimate ≥
    * true − N/k); windows finalize in append mode at the watermark. */
  def streamHeavyHitters(items: DataFrame, tsCol: String, itemCol: String,
      windowDur: String, delay: String, k: Int): DataFrame =
    graft.streaming.StreamHeavyHitters.windowedCandidates(
      items, tsCol, itemCol, windowDur, delay, k)

  /** Streaming windowed approximate quantiles: per event-time window,
    * Spark's mergeable GK-style sketch (rank error ≤ N/accuracy —
    * the contract the batch q107 gate verifies); O(sketch) state per
    * window, watermark-finalized append output. */
  def streamQuantiles(values: DataFrame, tsCol: String, valueCol: String,
      windowDur: String, delay: String,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      accuracy: Int = 1000): DataFrame =
    graft.streaming.StreamQuantiles.windowed(
      values, tsCol, valueCol, windowDur, delay, qs, accuracy)

  /** Streaming embedding near-dup detection: LSH buckets shared with
    * the batch banded path (identical planes), a bounded ring of
    * recent representatives per bucket as state, exact cosine verify
    * — emits verified (anchor_id, dup_id, cos) hits, at-least-once
    * across bands. */
  def streamNearDupEmbeddings(
      events: org.apache.spark.sql.Dataset[graft.streaming.EmbedEvent],
      minCos: Double, delayMs: Long, bands: Int = 12,
      planesPerBand: Int = 4, dim: Int = 64, maxAnchors: Int = 8)
      : org.apache.spark.sql.Dataset[graft.streaming.EmbedNearDup] =
    graft.streaming.StreamEmbedDedup.nearDups(
      events, minCos, delayMs, bands, planesPerBand, dim,
      maxAnchors = maxAnchors)

  /** Stream-stream interval join: each left row pairs with the same
    * key's right rows from the preceding `horizon`. Both sides are
    * watermarked and the join condition bounds event-time distance,
    * so buffered state is proportional to the horizon, not the stream
    * length; append-mode inner join emits each matched pair exactly
    * once (driver-checked under replay as q117). */
  def streamIntervalJoin(errors: DataFrame, clicks: DataFrame,
      horizon: String = "10 minutes"): DataFrame =
    graft.streaming.EventStream.errorsWithRecentClicks(errors, clicks, horizon)

  /** Streaming gap sessionization: flatMapGroupsWithState with
    * event-time timeout — O(1) state per user, sessions close on an
    * observed gap or when the watermark passes last + gap. Micros-
    * exact, deterministic (ts, event_id) fold order (driver-checked
    * under replay as q118; caller sets the input watermark). */
  def streamSessions(
      events: org.apache.spark.sql.Dataset[graft.streaming.UserEvent],
      gapMs: Long)
      : org.apache.spark.sql.Dataset[graft.streaming.UserSession] =
    graft.streaming.Sessionize.sessions(events, gapMs)

  /** Streaming as-of join: each error emits the latest same-user
    * click at-or-before it, finalized exactly once when the
    * watermark passes the error's event time — custom state, because
    * argmax-per-left-row is not expressible as a stream-stream join
    * predicate. State per user is bounded by the watermark horizon
    * (pending errors + one dominating carry click). Driver-checked
    * under replay as q132 against DuckDB's native ASOF LEFT JOIN;
    * caller sets the input watermark. */
  def streamAsOf(
      events: org.apache.spark.sql.Dataset[graft.streaming.UserEvent])
      : org.apache.spark.sql.Dataset[graft.streaming.AsOfRow] =
    graft.streaming.StreamAsOf.asOfMatches(events)

  /** Streaming per-user EWMA: O(1) state per user folded in
    * (ts, event_id) order — bit-identical to the batch fold — with
    * the final feature row emitted by event-time timeout once a user
    * is quiet for `quietMs` (driver-checked under replay as q119;
    * caller sets the input watermark). */
  def streamEwma(
      events: org.apache.spark.sql.Dataset[graft.streaming.UserEvent],
      alpha: Double = 0.5, quietMs: Long = 3600000L)
      : org.apache.spark.sql.Dataset[graft.streaming.UserEwma] =
    graft.streaming.StreamEwma.ewmaPerUser(events, alpha, quietMs)

  /** Streaming rolling z-score anomalies: O(lookback) state per user,
    * hits emitted in the carrying micro-batch (no watermark wait);
    * bit-identical to the batch [[rollingAnomalies]] — driver-checked
    * under replay as q150 (caller sets the input watermark). */
  def streamAnomalies(
      events: org.apache.spark.sql.Dataset[graft.streaming.UserEvent],
      lookback: Int = 5, zThresh: Int = 3, quietMs: Long = 3600000L)
      : org.apache.spark.sql.Dataset[graft.streaming.AnomalyHit] =
    graft.streaming.StreamAnomaly.anomaliesPerUser(events, lookback, zThresh, quietMs)

  /** Morton (z-order) key of two non-negative integer columns. */
  def zvalue(x: Column, y: Column, bits: Int): Column =
    graft.operators.Bucketing.zvalue(x, y, bits)

  /** One-time bucketed layout: future equi-joins on `bucketCol`
    * between tables bucketed with EQUAL counts plan shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    graft.operators.Bucketing.writeBucketed(df, table, bucketCol, buckets)

  /** Join two identically-bucketed tables on the bucket key — zero
    * exchanges at query time (q116's plan-asserted path). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    graft.operators.Bucketing.colocatedJoin(spark, leftTable, rightTable, key)

  /** Parse (width, height, pixel bytes) from a BMP payload column's
    * bytes — driver/executor-side byte-level decode (q33/q34 path). */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) =
    graft.sources.Multimodal.BmpCodec.decode(bytes)

  /** Parse (sampleRate, sample bytes) from a WAV payload. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Byte]) =
    graft.sources.Multimodal.WavCodec.decode(bytes)

  /** Decode a WAV payload and extract exact-integer signal features
    * (frame energies, mean-crossing rate, loudest frame) — see
    * [[graft.sources.Multimodal.audioFeatures]] for the arithmetic. */
  def audioFeatures(bytes: Array[Byte]): graft.sources.Multimodal.AudioFeatures =
    graft.sources.Multimodal.wavFeatures(bytes)

  /** Decode a BMP payload and nearest-neighbor-resample its pixels to
    * `tw`×`th` — returns (origW, origH, resized pixel bytes). */
  def resizeBmp(bytes: Array[Byte], tw: Int, th: Int): (Int, Int, Array[Byte]) = {
    val (w, h, px) = graft.sources.Multimodal.BmpCodec.decode(bytes)
    (w, h, graft.sources.Multimodal.resizeNearest(w, h, px, tw, th))
  }

  /** PageRank by power iteration over a directed edge list (every
    * node needs out-degree ≥ 1 — symmetrize undirected graphs). */
  def pageRank(edges: DataFrame, srcCol: Column, dstCol: Column,
      iters: Int = 3, damping: Double = 0.85): DataFrame =
    graft.operators.Graph.pageRankOver(edges, srcCol, dstCol, iters, damping)

  /** Blocked edit-distance pairs (entity-resolution primitive).
    * `maxDist` ∈ [0, 5]: 0 means exact-duplicate names within a
    * block; null names never pair. */
  def fuzzyPairs(df: DataFrame, idCol: Column, blockCol: Column,
      nameCol: Column, maxDist: Int = 2): DataFrame =
    graft.operators.Relational.fuzzyPairsOver(df, idCol, blockCol, nameCol, maxDist)

  /** Interval-OVERLAP join of two interval sets (same key): pairs
    * whose ranges intersect, with exact overlap length — bucketed
    * equi-join, each pair counted once in the bucket of
    * max(start_l, start_r). */
  def overlapJoin(left: DataFrame, lIdCol: Column, lKeyCol: Column,
      lStartUsCol: Column, lEndUsCol: Column,
      right: DataFrame, rIdCol: Column, rKeyCol: Column,
      rStartUsCol: Column, rEndUsCol: Column, bucketUs: Long): DataFrame =
    graft.operators.EventOps.overlapJoinOver(
      left, lIdCol, lKeyCol, lStartUsCol, lEndUsCol,
      right, rIdCol, rKeyCol, rStartUsCol, rEndUsCol, bucketUs)

  /** Interval-containment join via fixed-width bucket equi-join. */
  def intervalJoin(windows: DataFrame, winIdCol: Column, winKeyCol: Column,
      startUsCol: Column, endUsCol: Column,
      points: DataFrame, ptIdCol: Column, ptKeyCol: Column, ptUsCol: Column,
      bucketUs: Long): DataFrame =
    graft.operators.EventOps.intervalJoinOver(
      windows, winIdCol, winKeyCol, startUsCol, endUsCol,
      points, ptIdCol, ptKeyCol, ptUsCol, bucketUs)

  /** Count–Min point-frequency estimates: build the d×w grid from the
    * occurrence stream (shuffle ≤ tasks·d·w rows regardless of N) and
    * return `(item, n_est)` per distinct probe — one-sided, overshoot
    * ≤ εN at ε = e/width, min over `depth` rows (q123's contract). */
  def cmsFrequency(df: DataFrame, itemCol: Column,
      probes: DataFrame, probeCol: Column,
      width: Int = 2048, depth: Int = 5): DataFrame =
    graft.operators.TextOps.cmsFrequencyOver(
      df, itemCol, probes, probeCol, width, depth)

  /** Windowed Count–Min grid over an unbounded keyed stream:
    * finalized `(window_start, r, c, cell)` rows, O(depth·width)
    * state per window independent of key cardinality (q124's
    * production operator). Works on batch frames too (same plan). */
  def streamCms(events: DataFrame, tsCol: String, keyCol: Column,
      windowDur: String, watermarkDelay: String,
      width: Int = 1024, depth: Int = 5): DataFrame =
    graft.streaming.StreamCms.windowedCells(
      events, tsCol, keyCol, windowDur, watermarkDelay, width, depth)

  /** Cross-document duplicated spans (ExactSubstr-style): per doc,
    * merged islands of word `k`-grams that appear in ≥ 2 distinct
    * docs — `(doc_id, n_spans, dup_tokens, longest_span)`. */
  def dupSpans(df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 8): DataFrame =
    graft.operators.PipelineOps.dupSpansOver(df, idCol, textCol, k)

  /** Deterministic weight-proportional top-`n` sample without
    * replacement (Efraimidis–Spirakis race keyed on the content
    * hash, no RNG — bit-reproducible on any engine/partitioning). */
  def weightedSample(df: DataFrame, idCol: Column, contentCol: Column,
      weightCol: Column, n: Int): DataFrame =
    graft.operators.PipelineOps.weightedSampleOver(
      df, idCol, contentCol, weightCol, n)

  /** BM25 top-`k` retrieval: score each query's distinct terms
    * against the corpus scoring matrix (queries broadcast, word-
    * ordered exact double fold), rank per query. */
  def bm25Search(corpus: DataFrame, idCol: Column, textCol: Column,
      queries: DataFrame, qIdCol: Column, qTextCol: Column,
      k: Int = 10): DataFrame =
    graft.operators.PipelineOps.bm25TopKOver(
      corpus, idCol, textCol, queries, qIdCol, qTextCol, k)

  /** Int8 scalar-quantized top-`k` nearest neighbours by quantized
    * cosine — 4× less memory traffic than float32 scans; rows
    * `(q_id, vec_id, rk, qcos)` for ids matching `probePred` (q127
    * gates this path's recall against the exact scan). */
  def quantizedKnn(df: DataFrame, idCol: Column, embCol: Column,
      probePred: Column => Column, k: Int = 10): DataFrame =
    graft.operators.Similarity.quantizedTopKOver(df, idCol, embCol, probePred, k)

  /** IVF-PQ approximate nearest neighbours: coarse k-means inverted
    * lists + per-subspace product-quantization codes (m·log2(ks) bits
    * per vector — ~25× less scan memory at the defaults), asymmetric-
    * distance shortlist, exact-cosine re-rank of the top `rerank`.
    * Rows `(q_id, vec_id, cos_sim, rank)` for ids matching
    * `probePred` (q135 gates this path's recall against the exact
    * scan). */
  def annPq(df: DataFrame, idCol: Column, embCol: Column,
      probePred: Column => Column, m: Int = 16, ks: Int = 32,
      nList: Int = 16, nProbe: Int = 6, nAssign: Int = 3,
      rerank: Int = 200): DataFrame =
    graft.operators.Similarity.annPqOver(
      df, idCol, embCol, probePred, m, ks, nList, nProbe, nAssign, rerank)

  /** Learn `k` BPE merges over a text column (distinct-pair variant;
    * count-desc/lexicographic tie-break — engine-deterministic). One
    * corpus pass builds the word-frequency table; every merge round
    * runs on the distinct-word table. Output: (merge_rank, l, r,
    * merged, pair_count) per round. */
  def bpeMerges(df: DataFrame, textCol: Column, k: Int): DataFrame =
    graft.operators.PipelineOps.bpeMergesOver(df, textCol, k)

  /** Apply the learned BPE vocabulary: tokenize the corpus with `k`
    * merges and return the `topN` subword tokens by total occurrence
    * count (count desc, token asc). The apply step is one
    * explode+agg over the distinct-word table — the corpus itself
    * never reshuffles. */
  def bpeVocab(df: DataFrame, textCol: Column, k: Int, topN: Int): DataFrame =
    graft.operators.PipelineOps.bpeVocabOver(df, textCol, k, topN)

  /** C4-style global unit-level dedup that REWRITES the corpus: split
    * each document into `chunkTokens`-token chunks, keep only the
    * globally-first occurrence of each exact chunk, reassemble. Rows
    * `(doc_id, n_chunks, n_kept, clean_tokens, clean_md5)`;
    * `clean_md5` is NULL when every chunk of the doc was removed. */
  def chunkDedup(df: DataFrame, idCol: Column, textCol: Column,
      chunkTokens: Int = 16): DataFrame =
    graft.operators.PipelineOps.chunkDedupOver(df, idCol, textCol, chunkTokens)

  /** Johnson–Lindenstrauss ±1 random projection of a `dim`-dim
    * embedding column to `k` components (train-free compression;
    * sign matrix derived deterministically from md5 nibble parity).
    * Emits `y00..y{k-1}` plus `xnorm2`/`ynorm2`/`distortion`
    * (= ‖y‖²/(k·‖x‖²) ≈ 1, the per-point JL guarantee). */
  def jlProject(df: DataFrame, idCol: Column, embCol: Column,
      dim: Int, k: Int = 16): DataFrame =
    graft.operators.Similarity.jlProjectOver(df, idCol, embCol, dim, k)

  /** α-temperature domain mixture allocation: per `sourceCol` value,
    * sampling probability p ∝ (token count)^0.5, the token
    * allocation out of `budgetTokens`, and the implied epochs over
    * that domain — the XLM-style budgeting layer above per-source
    * sampling. */
  def mixtureAlloc(df: DataFrame, sourceCol: Column, textCol: Column,
      budgetTokens: Long): DataFrame =
    graft.operators.PipelineOps.mixtureAllocOver(df, sourceCol, textCol, budgetTokens)

  /** Distributed Lloyd k-means with exact integer centroid
    * accumulation (order-independent 2²⁰-quantized sums — bit-
    * reproducible on any cluster/partitioning); seeds are rows with
    * id 0..k−1; `iters` update rounds. Rows `(vec_id, cluster,
    * dist2)` under the final centroids. Fails loudly on an empty
    * cluster rather than re-seeding. */
  def kmeans(df: DataFrame, idCol: Column, embCol: Column,
      dim: Int, k: Int, iters: Int): DataFrame =
    graft.operators.Similarity.kmeansAssignOver(df, idCol, embCol, dim, k, iters)

  /** Contrastive-pair mining: per anchor (ids matching `anchorPred`),
    * the hardest negative (max cosine, other label) and hardest
    * positive (min cosine, same label), ties to the lowest id.
    * Anchors broadcast; the corpus never shuffles — the agg reduces
    * each task to ≤ |anchors| rows. */
  def contrastivePairs(df: DataFrame, idCol: Column, embCol: Column,
      labelCol: Column, anchorPred: Column => Column): DataFrame =
    graft.operators.Similarity.contrastivePairsOver(df, idCol, embCol, labelCol, anchorPred)

  /** Split-leakage audit at chunk granularity: for each split pair
    * under an id-keyed AND a content-keyed (q64) split, the number of
    * distinct `chunkTokens`-token chunks appearing on both sides —
    * the contamination channel a document-level split key cannot
    * close (run [[chunkDedup]] first). All six rows emitted, zeros
    * included. */
  def splitLeakage(df: DataFrame, idCol: Column, textCol: Column,
      trainPct: Int = 80, validPct: Int = 10, chunkTokens: Int = 16): DataFrame =
    graft.operators.PipelineOps.splitLeakageOver(
      df, idCol, textCol, trainPct, validPct, chunkTokens)

  /** Kaplan–Meier survival over per-key lifetimes (last − first event
    * per `userCol`): deaths vs right-censored by a span/`censorDiv`
    * quiet-horizon rule, lifetimes bucketed into `buckets` integer
    * bins, Ŝ = Π(1 − d/n) folded in bucket order. Rows `(bucket,
    * n_users, n_deaths, n_at_risk, s_hat)`. */
  def kaplanMeier(df: DataFrame, userCol: Column, tsCol: Column,
      buckets: Int = 64, censorDiv: Int = 5): DataFrame =
    graft.operators.EventOps.kaplanMeierOver(df, userCol, tsCol, buckets, censorDiv)

  /** Per-group 2-D skyline (Pareto frontier): rows where no other row
    * in the group has `costCol` ≤ and `gainCol` ≥ with one strict.
    * Windowed sorted-pass formulation — two narrow shuffles, never
    * the O(n²) dominance self-join. */
  def skyline(df: DataFrame, groupCol: Column, costCol: Column,
      gainCol: Column): DataFrame =
    graft.operators.Relational.skylineOver(df, groupCol, costCol, gainCol)

  /** Personalized (topic-sensitive) PageRank: restart mass flows only
    * to nodes matching `seedPred`, so ranks measure proximity to the
    * seed set. Same exact integer-quantized contributions and
    * one-new-shuffle-per-iteration plan as [[pageRank]]; with
    * `seedPred = _ => lit(true)` it reduces bit-identically to the
    * uniform variant. */
  def pageRankPersonalized(edges: DataFrame, srcCol: Column, dstCol: Column,
      seedPred: Column => Column, iters: Int, d: Double = 0.85): DataFrame =
    graft.operators.Graph.pageRankPersonalizedOver(edges, srcCol, dstCol, seedPred, iters, d)

  /** HITS hubs/authorities over a directed edge list — L1-normalized
    * rounds with 2⁻⁴⁰-quantized exact contribution sums, so scores
    * are engine-exact; `(id, kind ∈ {hub, auth}, score)`. */
  def hits(edges: DataFrame, srcCol: Column, dstCol: Column,
      iters: Int): DataFrame =
    graft.operators.Graph.hitsOver(edges, srcCol, dstCol, iters)

  /** Deterministic synchronous label-propagation communities:
    * plurality neighbor label per round, ties to the smallest label —
    * all-integer, so results are engine-exact. Two narrow agg
    * shuffles per round, nothing driver-side. */
  def labelPropagation(edges: DataFrame, srcCol: Column, dstCol: Column,
      iters: Int, symmetrize: Boolean = true): DataFrame =
    graft.operators.Graph.labelPropagationOver(edges, srcCol, dstCol, iters, symmetrize)

  /** Rolling z-score anomalies: each event scored against the exact
    * integer moments of its `lookback` preceding same-user events;
    * the flag clears denominators so it carries no float rounding. */
  def rollingAnomalies(df: DataFrame, userCol: Column, tsCol: Column,
      idCol: Column, valueCol: Column, lookback: Int = 5,
      zThresh: Int = 3): DataFrame =
    graft.operators.EventOps.rollingAnomaliesOver(
      df, userCol, tsCol, idCol, valueCol, lookback, zThresh)

  /** Pearson's χ² test of independence over a two-way contingency
    * table — absent cells enter at o = 0, the statistic folds in
    * (row, col) sorted order so it is engine-exact. */
  def chiSquare(df: DataFrame, rowCol: Column, colCol: Column): DataFrame =
    graft.operators.Relational.chiSquareOver(df, rowCol, colCol)

  /** Linear multi-touch attribution: each `purchaseType` event's unit
    * of credit splits evenly across its `touchTypes` events in the
    * preceding horizon (bucketed interval join — no per-user cross
    * product). */
  def attribution(events: DataFrame, idCol: Column, userCol: Column,
      tsCol: Column, typeCol: Column, purchaseType: String,
      touchTypes: Seq[String], horizonSeconds: Long = 1800L): DataFrame =
    graft.operators.EventOps.attributionOver(events, idCol, userCol, tsCol,
      typeCol, purchaseType, touchTypes, horizonSeconds)

  /** Gopher-rules composite quality filter (Rae et al. 2021 §A1.1):
    * per-doc word-count/mean-length/alpha-ratio/stopword/symbol gates
    * in one codegen'd map pass — zero shuffles. */
  def gopherRules(df: DataFrame, idCol: Column, textCol: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      stopWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minStopHits: Int = 2): DataFrame =
    graft.operators.TextOps.gopherRulesOver(
      df, idCol, textCol, minWords, maxWords, stopWords, minStopHits)

  /** Global event-type trigram counts + shares over per-user paths in
    * (ts, id) order — "most common 3-step paths". */
  def pathTrigrams(df: DataFrame, userCol: Column, tsCol: Column,
      idCol: Column, typeCol: Column): DataFrame =
    graft.operators.EventOps.pathTrigramsOver(df, userCol, tsCol, idCol, typeCol)

  /** Per-group rank normalization: percent_rank + cume_dist of a
    * value column — tie-deterministic (rank-based), engine-exact. */
  def rankNormalize(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame =
    graft.operators.Relational.rankNormalizeOver(df, groupCol, valueCol)

  /** End-to-end entity resolution: blocked fuzzy pairs → connected
    * components → golden record per cluster (longest name, ties to
    * smallest id) — one row per entity, singletons included. */
  def goldenRecords(df: DataFrame, idCol: Column, blockCol: Column,
      nameCol: Column, maxDist: Int = 2): DataFrame =
    graft.operators.Relational.goldenRecordsOver(df, idCol, blockCol, nameCol, maxDist)

  /** Column drift detector: profile the same columns on two frames
    * (one scan each) and flag relative-mean shifts / range changes —
    * the train-vs-serve skew check. */
  def columnDrift(a: DataFrame, b: DataFrame, cols: Seq[String],
      relThresh: Double = 0.05): DataFrame =
    graft.operators.Relational.columnDriftOver(a, b, cols, relThresh)

  /** Exact per-group type-1 quantiles (value at ⌈p·n⌉, no
    * interpolation) — the ground truth the approx-quantile sketch is
    * gated against. */
  def exactQuantiles(df: DataFrame, groupCol: Column, valueCol: Column,
      ps: Seq[(String, Double)] = Seq("p25" -> 0.25, "p50" -> 0.5,
        "p75" -> 0.75, "p95" -> 0.95),
      buckets: Int = 1024): DataFrame =
    graft.operators.Relational.rankQuantilesOver(df, groupCol, valueCol, ps, buckets)

  /** Per-dimension feature statistics (count/mean/std/min/max) for an
    * embedding column — the fit half of a z-score standardizer;
    * engine-exact via power-of-two quantization and split 128-bit
    * moments. */
  def dimStats(df: DataFrame, vecCol: Column, scaleBits: Int = 30): DataFrame =
    graft.operators.Similarity.dimStatsOver(df, vecCol, scaleBits)

  /** Latest-wins CDC apply: fold a canonical change log (key, us,
    * seq, op, payload...) onto an optional base snapshot — associative
    * across any log split, one map-side-combinable agg + keyed join. */
  def cdcMerge(base: Option[DataFrame], changes: DataFrame): DataFrame =
    graft.operators.Cdc.mergeApply(base, changes)

  /** SCD2 history assembly: change log → (key, payload...,
    * valid_from_us, valid_to_us, is_current) version rows, change
    * suppression included — two windows over one exchange. */
  def scd2(changes: DataFrame): DataFrame =
    graft.operators.Cdc.scd2Over(changes)

  /** Grouped simple linear regression (q192): per-key (slope,
    * intercept, R²) from five exact DECIMAL(38,0) moments of
    * floor-recovered fixed-point values + one fixed double chain per
    * statistic — order-independent, engine-exact, NULL (never
    * Inf/NaN) on zero-variance groups. One map-side-combined agg. */
  def groupedOls(df: DataFrame, keyCol: Column, xCol: Column, yCol: Column,
      xDecimals: Int = 0, yDecimals: Int = 0): DataFrame =
    graft.operators.Relational.groupedOlsOver(df, keyCol, xCol, yCol,
      xDecimals, yDecimals)

  /** Incremental entity resolution (q198): build/persist the canonical
    * cluster state once, match new batches against it — CC over
    * {cluster reps ∪ new ids} is EXACTLY the full recompute by graph
    * condensation (welds included); survivorship re-derived for
    * touched blocks only. Refresh O(new + members-of-touched-blocks). */
  def buildErIndex(df: DataFrame, idCol: Column, blockCol: Column,
      nameCol: Column, maxDist: Int, table: String): Unit =
    graft.operators.Relational.buildErIndex(df, idCol, blockCol, nameCol,
      maxDist, table)

  /** Match a new (id, block, name) batch against a persisted ER state;
    * returns the updated golden table (identical to full recompute). */
  def goldenRecordsIncrement(newDf: DataFrame, table: String,
      maxDist: Int): DataFrame =
    graft.operators.Relational.goldenRecordsIncrement(newDf, table, maxDist)

  /** Roll a persisted ER state forward with a new batch — two-step ≡
    * rebuild. */
  def updateErIndex(newDf: DataFrame, table: String, maxDist: Int): Unit =
    graft.operators.Relational.updateErIndex(newDf, table, maxDist)

  /** Population-stability-index drift (q197): per-group PSI between a
    * baseline and a comparison period of one bucketed measure —
    * Laplace-smoothed proportions (zero buckets finite by contract),
    * glibc-exact ln, per-term 2⁻⁴⁰ quantization + exact integer sum
    * (order-independent, engine-exact). Groups missing either period
    * are dropped. Two narrow aggs + a \|groups\|·K grid join. */
  def psiDrift(df: DataFrame, groupCol: Column, isB: Column,
      bucketCol: Column, nBuckets: Int): DataFrame =
    graft.operators.Relational.psiDriftOver(df, groupCol, isB, bucketCol,
      nBuckets)

  /** Per-key lag-k autocorrelation (q196): one window pass pairs each
    * value with its k-step lag, then exact split-moment Pearson —
    * engine-exact, order-independent, NULL (never NaN) on constant
    * series; keys with ≤ k observations produce no row. One exchange
    * + one map-side agg — never a shifted self-join. */
  def lagAutocorr(df: DataFrame, keyCol: Column, tsCol: Column,
      seqCol: Column, valCol: Column, k: Int = 1,
      decimals: Int = 6): DataFrame =
    graft.operators.Relational.lagAutocorrOver(df, keyCol, tsCol, seqCol,
      valCol, k, decimals)

  /** Point-in-time dimension lookup (q186): each fact row (key, us,
    * payload...) joined to the SCD2 version live STRICTLY BEFORE its
    * instant — the leakage-safe feature-store read. Union+window
    * carry, one shuffle of |facts|+|versions| on the key — never a
    * range join. Dim-side columns NULL in delete gaps. */
  def pointInTimeLookup(facts: DataFrame, dim: DataFrame): DataFrame =
    graft.operators.Cdc.pointInTimeLookup(facts, dim)

  /** Frame-level retractable view merge (q187's streaming core): fold
    * a (fkey, change, key_old, q_old, key_new, q_new) change set into
    * any (key, n, s, mn, mx) view frame given the PRE-delta (fkey,
    * key, q) fact frame — count/sum retract signed, min/max
    * re-aggregate from the touched groups' surviving facts. */
  def ivmMergeRetractFrames(delta: DataFrame, view: DataFrame,
      facts: DataFrame): DataFrame =
    graft.operators.Ivm.mergeDeltaRetractFrames(delta, view, facts)

  /** Incremental SCD2 maintenance (q193): merge a later change slice
    * into an existing scd2 dimension — closed versions immutable,
    * each touched key's open version re-enters as a synthetic leading
    * upsert so the suppression induction carries across the boundary;
    * scd2Increment(scd2(log<t), log≥t) ≡ scd2(log) for any
    * (us, seq)-ordered cut. O(dim-of-touched + |late|). */
  def scd2Increment(dim: DataFrame, late: DataFrame): DataFrame =
    graft.operators.Cdc.scd2Increment(dim, late)

  /** Reciprocal-rank fusion of named per-query rankings (each
    * `(q_id, doc_id, rank)`): score = Σ 1/(c + rank), absent lists
    * contribute 0 — the calibration-free hybrid-retrieval combiner;
    * engine-exact integer-rank arithmetic. */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k: Int = 10,
      c: Int = 60): DataFrame =
    graft.operators.PipelineOps.rrfFuseOver(rankings, k, c)

  /** Build and persist a MinHash dedup index (bucketed band + doc
    * tables, verified pair set) under `prefix` managed tables. */
  def buildDedupIndex(docs: DataFrame, idCol: Column, textCol: Column,
      prefix: String, maxDist: Double = 0.4, bands: Int = 16,
      rowsPerBand: Int = 2, shingleK: Int = 3, buckets: Int = 8): Unit =
    graft.operators.Dedup.buildDedupIndex(docs, idCol, textCol, prefix,
      maxDist, bands, rowsPerBand, shingleK, buckets)

  /** Dedup a delta corpus against a persisted index: cluster labels
    * over (index ∪ delta), equal to from-scratch clustering of the
    * union; the index is read bucket-locally, never re-banded. */
  def dedupIncremental(delta: DataFrame, idCol: Column, textCol: Column,
      prefix: String, maxDist: Double = 0.4, bands: Int = 16,
      rowsPerBand: Int = 2, shingleK: Int = 3): DataFrame =
    graft.operators.Dedup.dedupIncrementalOver(delta, idCol, textCol, prefix,
      maxDist, bands, rowsPerBand, shingleK)

  /** Write the updated index (docs/bands/pairs extended by the delta)
    * under `outPrefix` — tomorrow's delta dedups against the union. */
  def updateDedupIndex(delta: DataFrame, idCol: Column, textCol: Column,
      prefix: String, outPrefix: String, maxDist: Double = 0.4,
      bands: Int = 16, rowsPerBand: Int = 2, shingleK: Int = 3,
      buckets: Int = 8): Unit =
    graft.operators.Dedup.updateDedupIndex(delta, idCol, textCol, prefix,
      outPrefix, maxDist, bands, rowsPerBand, shingleK, buckets)

  /** Multi-source shortest paths, fixed relax rounds (all-integer
    * weights/distances; NULL dist = unreached within the rounds). */
  def sssp(edges: DataFrame, srcCol: Column, dstCol: Column, wCol: Column,
      sourcePred: Column => Column, iters: Int): DataFrame =
    graft.operators.Graph.ssspOver(edges, srcCol, dstCol, wCol,
      sourcePred, iters)

  /** Multi-source shortest paths run until convergence (exact
    * shortest distances); returns (distances, rounds-run). */
  def ssspConverged(edges: DataFrame, srcCol: Column, dstCol: Column,
      wCol: Column, sourcePred: Column => Column,
      maxIters: Int = 64): (DataFrame, Int) =
    graft.operators.Graph.ssspConverged(edges, srcCol, dstCol, wCol,
      sourcePred, maxIters)

  /** Exact-duplicate image cohorts: one row per dHash-equal group
    * (≥ 2 members) — the linear, answer-bound form of hamming-0 pair
    * emission. */
  def imageDupCohorts(t: graft.Tables): DataFrame =
    graft.sources.Multimodal.imageDupCohorts(t)

  /** Perceptual image near-dup pairs at DISTINCT-hash granularity:
    * BMP decode → 64-bit dHash → complete 4×16-bit pigeonhole bands →
    * exact Hamming verify (1 ≤ hamming ≤ maxHamming ≤ 3), cohort
    * sizes carried as multiplicities. */
  def imageNearDups(t: graft.Tables, maxHamming: Int = 3): DataFrame =
    graft.sources.Multimodal.imageNearDups(t, maxHamming)

  /** Exact-duplicate AUDIO cohorts over the 64-bit frame-sum
    * fingerprint (WAV decode → 65 time-slice sums → gradient-sign
    * bits) — the audio member of the perceptual-dedup family. */
  def audioDupCohorts(t: graft.Tables): DataFrame =
    graft.sources.Multimodal.audioDupCohorts(t)

  /** Perceptual audio near-dup pairs at distinct-fingerprint
    * granularity: banding + exact Hamming verify (1 ≤ hamming ≤
    * maxHamming ≤ 3), cohort sizes as multiplicities. */
  def audioNearDups(t: graft.Tables, maxHamming: Int = 3): DataFrame =
    graft.sources.Multimodal.audioNearDups(t, maxHamming)

  /** Exact-duplicate VIDEO cohorts over the temporal-majority dHash
    * (Y4M decode → 1-fps frame sample → per-frame dHash → strict-
    * majority bit pool) — the video member of the perceptual family. */
  def videoDupCohorts(t: graft.Tables): DataFrame =
    graft.sources.Multimodal.videoDupCohorts(t)

  /** Perceptual video near-dup pairs at distinct-fingerprint
    * granularity: banding + exact Hamming verify (1 ≤ hamming ≤
    * maxHamming ≤ 3), cohort sizes as multiplicities. */
  def videoNearDups(t: graft.Tables, maxHamming: Int = 3): DataFrame =
    graft.sources.Multimodal.videoNearDups(t, maxHamming)

  /** The raw 64-bit temporal-majority video fingerprint over a Y4M
    * container — exact integer arithmetic, engine-replayable. */
  def videoFingerprint(bytes: Array[Byte]): Long =
    graft.sources.Multimodal.videoFingerprint(bytes)

  /** The raw 64-bit perceptual audio fingerprint over decoded PCM
    * samples — exact integer arithmetic, engine-replayable. */
  def audioFingerprint(samples: Array[Byte]): Long =
    graft.sources.Multimodal.audioFingerprint(samples)

  /** Minimal snapshot diff: keys only in `newSnap` → I, only in
    * `oldSnap` → D, payload-changed → U; payload-identical keys emit
    * nothing. One keyed full-outer join, no window. */
  def tableDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame =
    graft.operators.Cdc.tableDiff(oldSnap, newSnap)

  /** Re-shape a [[tableDiff]] result as a [[cdcMerge]] change log —
    * `cdcMerge(Some(old), diffToLog(tableDiff(old, new)))` reproduces
    * `new` on every payload column. */
  def diffToLog(diff: DataFrame): DataFrame =
    graft.operators.Cdc.diffToLog(diff)

  /** Persist a per-group aggregate view (count/sum/min/max of an
    * integer-quantized measure) bucketed by group key. */
  def buildAggIndex(facts: DataFrame, keyCol: Column, measureQ: Column,
      table: String, buckets: Int = 8): Unit =
    graft.operators.Ivm.buildAggIndex(facts, keyCol, measureQ, table, buckets)

  /** Fold an insert-only delta into a persisted aggregate view —
    * O(delta + touched groups), the view side reads bucket-local. */
  def ivmMerge(delta: DataFrame, keyCol: Column, measureQ: Column,
      table: String): DataFrame =
    graft.operators.Ivm.mergeDelta(delta, keyCol, measureQ, table)

  /** Leave-fold-out target encoding over an integer-quantized target:
    * (category, fold) → out-of-fold mean; single-fold categories
    * encode NULL instead of leaking. */
  def targetEncode(df: DataFrame, catCol: Column, foldCol: Column,
      targetQ: Column, unitsPerTarget: Long): DataFrame =
    graft.operators.PipelineOps.targetEncodeOver(df, catCol, foldCol,
      targetQ, unitsPerTarget)

  /** Linear-interpolation resampling of per-key observations onto a
    * grid frame (key, us): strict interpolation, NULL outside the
    * observed span — one union + one window pass for both brackets. */
  def interpolateResample(obs: DataFrame, keyCol: Column, usCol: Column,
      valCol: Column, tieCol: Column, grid: DataFrame): DataFrame =
    graft.operators.EventOps.interpolateResampleOver(obs, keyCol, usCol,
      valCol, tieCol, grid)

  /** k-core peel to fixpoint over a both-directions edge list;
    * returns (core members with in-core degree, rounds run). */
  def kCore(edges: DataFrame, srcCol: Column, dstCol: Column, k: Long,
      maxIters: Int = 64): (DataFrame, Int) =
    graft.operators.Graph.kCoreOver(edges, srcCol, dstCol, k, maxIters)

  /** Blocked transposition-aware fuzzy pairs: PassJoin lev-(2d)
    * candidates refined by the codegen'd unrestricted
    * Damerau–Levenshtein at ≤ d (DL ≤ Lev ≤ 2·DL makes the reuse
    * lossless). */
  def damerauPairs(df: DataFrame, idCol: Column, blockCol: Column,
      nameCol: Column, maxDl: Int): DataFrame =
    graft.operators.Relational.damerauPairsOver(df, idCol, blockCol,
      nameCol, maxDl)

  /** Referential-integrity audit of one FK edge: (relation, n_rows,
    * n_orphan_rows, n_orphan_keys) — NULL FKs are not violations. */
  def fkAudit(relation: String, child: DataFrame, fkCol: Column,
      parent: DataFrame, pkCol: Column): DataFrame =
    graft.operators.Relational.fkAuditEdge(relation, child, fkCol,
      parent, pkCol)

  /** Staleness-bounded as-of join: latest prior match per key, but a
    * match older than `maxAgeUs` is discarded (feature-freshness
    * contract) — same one-shuffle union+window plan as the plain
    * as-of. */
  def asOfJoinWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, leftValue: String,
      rightValue: String, maxAgeUs: Long): DataFrame =
    graft.operators.AsOfJoin.joinPriorWithin(left, right, key, leftTs,
      rightTs, leftValue, rightValue, maxAgeUs)

  /** Robust per-group outlier stats (Iglewicz–Hoaglin modified z over
    * exact type-1 median/MAD selections): (group, n, med, mad,
    * n_outliers at |0.6745·dev| > 3.5·MAD). */
  def robustOutliers(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame =
    graft.operators.Relational.robustOutliersOver(df, groupCol, valueCol)

  /** Time-weighted average per key over LOCF segments; values must be
    * integer-quantized (e.g. cents) — sums accumulate exactly in
    * DECIMAL(38,0), one final double division. */
  def twap(obs: DataFrame, keyCol: Column, usCol: Column,
      valueCentsCol: Column, tieCol: Column): DataFrame =
    graft.operators.EventOps.twapOver(obs, keyCol, usCol,
      valueCentsCol, tieCol)

  /** Benford leading-digit audit of a positive integer-quantized
    * measure: (digit, n_rows, freq, expected, abs_dev) — 9 rows, one
    * narrow count shuffle. */
  def benfordAudit(df: DataFrame, measureQ: Column): DataFrame =
    graft.operators.Relational.benfordAuditOver(df, measureQ)

  /** Monoid merge of two (key, n, s, mn, mx) partial-aggregate frames
    * — the associative core of batch (ivmMerge) and streaming (q177)
    * view maintenance. */
  def mergePartials(a: DataFrame, b: DataFrame): DataFrame =
    graft.operators.Ivm.mergePartials(a, b)

  /** Persist a keyed fact frame (fkey, key, q) bucketed by the group
    * key — the layout [[ivmMergeRetract]] re-aggregates touched groups
    * from with zero exchanges. */
  def buildFactIndex(facts: DataFrame, table: String, buckets: Int = 8): Unit =
    graft.operators.Ivm.buildFactIndex(facts, table, buckets)

  /** Build + persist an IVF-PQ ANN index over (idCol, embCol) rows:
    * encoded corpus partitioned by coarse list (probes prune to the
    * probed lists' files), fitted quantizers in a `_meta` sidecar.
    * `trainOn` freezes training on a base corpus. */
  def buildAnnIndex(src: DataFrame, idCol: Column, embCol: Column,
      table: String, trainOn: Option[DataFrame] = None): Unit =
    graft.operators.Similarity.buildAnnIndex(src, idCol, embCol, table, trainOn)

  /** Append a delta corpus to a persisted ANN index against its FROZEN
    * quantizers — O(delta), no refit, two-step ≡ rebuild. */
  def updateAnnIndex(delta: DataFrame, idCol: Column, embCol: Column,
      table: String): Unit =
    graft.operators.Similarity.updateAnnIndex(delta, idCol, embCol, table)

  /** Top-10 neighbors per probe (q_id, q_emb) from a persisted ANN
    * index — model loaded from the sidecar (no fit at probe time),
    * ADC shortlist over the probed partitions only, exact re-rank
    * against `raw`. */
  def annIndexProbe(spark: org.apache.spark.sql.SparkSession, table: String,
      probes: DataFrame, raw: DataFrame): DataFrame =
    graft.operators.Similarity.annIndexProbe(spark, table, probes, raw)

  /** Filtered vector search (q188): probe a persisted ANN index under
    * a metadata predicate applied to the index SCAN (pre-filtering) —
    * the shortlist is all-eligible, so recall behaves like an
    * unfiltered probe over the eligible sub-corpus. */
  def annIndexProbeWhere(spark: org.apache.spark.sql.SparkSession,
      table: String, probes: DataFrame, raw: DataFrame, pred: Column,
      nProbe: Int = 6, rerank: Int = 200): DataFrame =
    graft.operators.Similarity.annIndexProbeWhere(spark, table, probes,
      raw, pred, nProbe, rerank)

  /** Tombstone-delete vector ids from a persisted ANN index — an
    * O(|ids|) sidecar append; probes exclude tombstones before the
    * ADC rank. Rewrite-free, idempotent. */
  def deleteFromAnnIndex(ids: DataFrame, table: String): Unit =
    graft.operators.Similarity.deleteFromAnnIndex(ids, table)

  /** Compact a tombstoned ANN index: rewrite surviving rows, clear
    * the sidecar — probe results identical before and after. */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    graft.operators.Similarity.compactAnnIndex(spark, table)

  /** Strongly connected components of a directed edge list — labels
    * every edge endpoint with its SCC's min member id; runs
    * forward-backward coloring phases until every node is resolved.
    * Returns (id, scc). */
  def scc(edges: DataFrame, srcCol: Column, dstCol: Column): DataFrame =
    graft.operators.Graph.sccConverged(edges, srcCol, dstCol)._1

  /** Retraction-aware view maintenance: fold a fact-level change set
    * (fkey, change 'I'|'D'|'U', key_old, q_old, key_new, q_new — the
    * tableDiff shape) into the persisted (key, n, s, mn, mx) view.
    * Count/sum retract arithmetically; min/max re-aggregate from the
    * surviving facts of ONLY the groups that lost a value. */
  def ivmMergeRetract(delta: DataFrame, viewTable: String,
      factsTable: String): DataFrame =
    graft.operators.Ivm.mergeDeltaRetract(delta, viewTable, factsTable)

  /** Dimension-move view maintenance (q195): fold a (key, g_old,
    * g_new) dim-update delta into a group-level (g, n, s) view by
    * transferring each moved key's ENTIRE partial between groups,
    * read off the per-key aggregate table — O(|dim delta|) refresh,
    * the fact table never in the loop. Count/sum only (min/max are
    * not move-transferable). */
  def ivmDimMove(view: DataFrame, aggTable: String,
      delta: DataFrame): DataFrame =
    graft.operators.Ivm.mergeDimMove(view, aggTable, delta)

  /** Join-key skew profile: (column_name, n_rows, n_keys, top1_cnt,
    * top1_share, entropy, balance) — the pre-shuffle diagnostic that
    * decides between a plain shuffle, salting, and AQE skew-split. */
  def keySkewProfile(df: DataFrame, name: String, keyCol: Column): DataFrame =
    graft.operators.Skew.keySkewProfileOver(df, name, keyCol)

  /** Skew-ADAPTIVE keyed sum/count: profiles the key and picks q42's
    * salted two-phase plan (≤ 64 distinct keys) or the plain groupBy;
    * both accumulate in DECIMAL so the results are identical. Returns
    * (result, strategy-taken). */
  def adaptiveSumCount(df: DataFrame, key: String,
      valueExpr: Column): (DataFrame, String) =
    graft.operators.Skew.adaptiveSumCount(df, key, valueExpr)

  /** Skew-ADAPTIVE fact-fact join + rollup: profiles the probe side's
    * key and picks a plain shuffle join or q125's AQE skew-split
    * (child session with the runtime knobs). `sides` builds
    * (left(k, lu), right(k, ru)) in the chosen session. Returns
    * (rollup, strategy-taken). */
  def adaptiveJoinAgg(spark: org.apache.spark.sql.SparkSession,
      sides: org.apache.spark.sql.SparkSession => (DataFrame, DataFrame)):
      (DataFrame, String) =
    graft.operators.Skew.adaptiveJoinAgg(spark, sides)

  // ── multi-measure IVM (q200/q206/q209/q212) ─────────────────────────

  /** Persist a multi-measure view (count + exact sums + split square
    * sums per measure, retractable count-distinct via per-(key, value)
    * multiplicity sidecars) bucketed by key. */
  def multiViewBuild(facts: DataFrame, measures: Seq[String],
      distincts: Seq[String], table: String, buckets: Int = 8): Unit =
    graft.operators.MultiIvm.buildMultiView(facts, measures, distincts,
      table, buckets)

  /** Fold an I/D/U+move fact change set into a persisted multi-measure
    * view — O(delta + touched keys' sidecar rows), phantom
    * retractions raise. */
  def multiViewMerge(delta: DataFrame, measures: Seq[String],
      distincts: Seq[String], table: String): DataFrame =
    graft.operators.MultiIvm.mergeMultiDelta(delta, measures, distincts,
      table)

  /** [[multiViewBuild]] with per-measure MIN/MAX (plus the bucketed
    * fact sidecar their retraction re-derivation reads). */
  def multiViewBuildFull(facts: DataFrame, measures: Seq[String],
      distincts: Seq[String], table: String, buckets: Int = 8): Unit =
    graft.operators.MultiIvm.buildMultiViewFull(facts, measures,
      distincts, table, buckets)

  /** [[multiViewMerge]] on the full (min/max-carrying) view. */
  def multiViewMergeFull(delta: DataFrame, measures: Seq[String],
      distincts: Seq[String], table: String): DataFrame =
    graft.operators.MultiIvm.mergeMultiDeltaFull(delta, measures,
      distincts, table)

  /** Dimension moves on a group-level multi-measure view: additive
    * partials transfer signed, each mover's multiplicity VECTOR
    * transfers wholesale, count-distinct re-derives for touched
    * groups — facts never in the loop. */
  def multiViewDimMove(view: DataFrame, groupMults: Map[String, DataFrame],
      perKeyTable: String, delta: DataFrame, measures: Seq[String],
      distincts: Seq[String]): DataFrame =
    graft.operators.MultiIvm.mergeMultiDimMove(view, groupMults,
      perKeyTable, delta, measures, distincts)

  /** [[multiViewDimMove]] on the full view: min/max re-derive for
    * touched groups over member keys' partials under the post-move
    * `mapping`. */
  def multiViewDimMoveFull(view: DataFrame,
      groupMults: Map[String, DataFrame], perKeyTable: String,
      mapping: DataFrame, delta: DataFrame, measures: Seq[String],
      distincts: Seq[String]): DataFrame =
    graft.operators.MultiIvm.mergeMultiDimMoveFull(view, groupMults,
      perKeyTable, mapping, delta, measures, distincts)

  // ── incremental graph maintenance (q202/q203/q208/q210) ─────────────

  /** Persist a CC labeling bucketed by component (insert-only
    * maintenance). */
  def ccBuildState(nodes: DataFrame, edges: DataFrame, table: String,
      buckets: Int = 8): Unit =
    graft.operators.Graph.buildCcState(nodes, edges, table, buckets)

  /** Fold a batch of new undirected edges into a persisted labeling —
    * condensation-exact, O(|delta| + members-of-merged-components). */
  def ccIncrement(newEdges: DataFrame, table: String): DataFrame =
    graft.operators.Graph.ccIncrement(newEdges, table)

  /** [[ccBuildState]] plus the component-bucketed edge sidecar that
    * makes DELETES maintainable. */
  def ccBuildStateFull(nodes: DataFrame, edges: DataFrame, table: String,
      buckets: Int = 8): Unit =
    graft.operators.Graph.buildCcStateFull(nodes, edges, table, buckets)

  /** Fold edge INSERTS and DELETES into a persisted labeling: touched
    * components re-solve over their surviving edges (bridge deletions
    * split exactly), inserts fold via condensation; phantom deletes
    * raise. */
  def ccApplyChanges(inserts: DataFrame, deletes: DataFrame,
      table: String): DataFrame =
    graft.operators.Graph.ccApplyChanges(inserts, deletes, table)

  /** PageRank seeded from prior ranks (nodes absent from `init` start
    * at 1/N) — the persisted-rank warm start that saves most of the
    * rounds after a small edge delta. */
  def pageRankWarmStart(edges: DataFrame, srcCol: Column, dstCol: Column,
      init: DataFrame, iters: Int, d: Double = 0.85): DataFrame =
    graft.operators.Graph.pageRankWarmStart(edges, srcCol, dstCol, init,
      iters, d)

  // ── ANN lifecycle: drift + retrain (q204) ───────────────────────────

  /** PSI of a delta's frozen-model coarse assignments against the
    * index's stored per-list distribution (count-sidecar-backed, no
    * index rescan) — ≥ 0.25 is the standard investigate line. */
  def annAssignmentPsi(spark: org.apache.spark.sql.SparkSession,
      table: String, delta: DataFrame, nAssign: Int = 3): DataFrame =
    graft.operators.Similarity.annAssignmentPsi(spark, table, delta, nAssign)

  /** Refit the quantizers on the current corpus, re-encode ONCE, and
    * swap blue/green under the live name — the index epoch bumps and
    * probes racing the swap raise rather than serving mixed-generation
    * distances. */
  def retrainAnnIndex(corpus: DataFrame, idCol: Column, embCol: Column,
      table: String): Unit =
    graft.operators.Similarity.retrainAnnIndex(corpus, idCol, embCol, table)
}
