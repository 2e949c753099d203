package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operator inventory over the `documents` table
  * (LLM-data-pipeline extensions; BASELINE.json north_star).
  *
  * Scale notes: every query here is embarrassingly parallel per-row
  * except the dedup joins, which are blocked — exact dedup groups on a
  * 128-bit fingerprint (shuffle on the hash, not the full text), and
  * near-dup joins are restricted to (lang, source) blocks plus a
  * doc_id-distance band so the pair count grows linearly, not
  * quadratically, with corpus size. The unblocked scale path is
  * MinHash LSH (Dedup.scala).
  */
object TextOps {

  // ── q21: content fingerprinting ──────────────────────────────────────
  def fingerprints(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents
      .select($"doc_id", fingerprint($"text").as("fp"), length($"text").as("n_chars"))
      .orderBy($"doc_id")
  }

  // ── q22: exact dedup — group identical content by fingerprint ────────
  // Shuffles 16-byte keys, not document bodies; at 100 TB the text
  // column never moves.
  def exactDedup(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents
      .groupBy(fingerprint($"text").as("fp"))
      .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy($"fp")
  }

  // ── q23: per-document token statistics ───────────────────────────────
  def tokenStats(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents
      .select($"doc_id",
        tokenCount($"text").as("n_tokens"),
        distinctTokenCount($"text").as("n_distinct"),
        typeTokenRatio($"text").as("ttr"))
      .orderBy($"doc_id")
  }

  // ── q24: corpus profile per language ─────────────────────────────────
  def langProfile(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        (sum(length($"text")).cast("double") / count(lit(1))).as("avg_chars"),
        (sum(tokenCount($"text")).cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy($"lang")
  }

  // ── q25: per-document quality score ──────────────────────────────────
  // Weighted blend of length saturation, lexical diversity, and
  // stopword balance — all exact-integer-derived doubles, identical
  // across engines.
  def qualityScores(t: Tables): DataFrame = {
    import t.spark.implicits._
    val q = qualityScore($"text")
    t.documents
      .select($"doc_id", $"lang",
        tokenCount($"text").as("n_tokens"),
        stopwordRatio($"text").as("stop_ratio"),
        q.as("quality"))
      .orderBy($"doc_id")
  }

  // ── q26: blocked n-gram Jaccard near-dup pairs ───────────────────────
  // Self-join restricted to (lang, source) blocks → pair count is
  // Σ_block |block|², quadratic only within a block, not the corpus.
  // Full-corpus near-dup at scale goes through MinHash LSH instead
  // (Dedup.scala), which needs no blocking key at all.
  def jaccardPairs(t: Tables): DataFrame =
    jaccardPairsUnsorted(t).orderBy(
      org.apache.spark.sql.functions.col("lang"),
      org.apache.spark.sql.functions.col("source"),
      org.apache.spark.sql.functions.col("id_a"),
      org.apache.spark.sql.functions.col("id_b"))

  /** Pair set without the presentation sort — what downstream
    * consumers (dedup clustering) use: the global range-exchange of a
    * trailing orderBy would sit on their critical path for no
    * semantic benefit. */
  def jaccardPairsUnsorted(t: Tables): DataFrame = {
    import t.spark.implicits._
    // sorted word sets → the per-pair intersect below is a native
    // merge walk (jaccardSorted), not a hash-set build per pair.
    val docs = t.documents
      .select($"doc_id", $"lang", $"source",
        array_sort(array_distinct(tokens($"text"))).as("words"))
    val a = docs.select($"doc_id".as("id_a"), $"lang", $"source", $"words".as("w_a"))
    val b = docs.select($"doc_id".as("id_b"), $"lang", $"source", $"words".as("w_b"))
    a.join(b, Seq("lang", "source"))
      .filter($"id_a" < $"id_b")
      // sound prune before the expensive intersect: jaccard(A,B) ≤
      // min(|A|,|B|)/max(|A|,|B|), so pairs failing the size-ratio
      // bound can never reach the 0.3 threshold — result unchanged.
      // (JaccardPrefilterRule applies the same bound automatically to
      // jaccard_at_least macro predicates; here it is explicit because
      // the similarity VALUE is also projected.)
      .filter(least(size($"w_a"), size($"w_b")).cast("double") /
        greatest(size($"w_a"), size($"w_b")) >= 0.3)
      .select($"lang", $"source", $"id_a", $"id_b",
        jaccardSorted($"w_a", $"w_b").as("jaccard_sim"))
      .filter($"jaccard_sim" >= 0.3)
  }

  // ── q89: directional containment pairs ──────────────────────────────
  // containment(a → b) = |A∩B| / |A| — the asymmetric cousin of
  // Jaccard that catches a short document SUBSUMED by a longer one
  // (quote inclusion, boilerplate wrapping), which symmetric Jaccard
  // misses because the union is dominated by the long side. Same
  // (lang, source) blocking as q26; the prune here is the containment
  // bound |A∩B| ≤ min(|A|,|B|): a pair with |B| < θ·|A| can never
  // reach θ, so the merge-walk intersect only runs on candidates.
  // Ordered pairs (a ≠ b): containment is directional by definition.
  def containmentPairsOver(
      df: DataFrame, idCol: org.apache.spark.sql.Column,
      blockCols: Seq[String], textCol: org.apache.spark.sql.Column,
      minContainment: Double = 0.8): DataFrame = {
    val docs = df.select(
      blockCols.map(col) :+ idCol.as("doc_id") :+
        array_sort(array_distinct(tokens(textCol))).as("words"): _*)
    val a = docs.select(
      blockCols.map(col) :+ col("doc_id").as("id_a") :+ col("words").as("w_a"): _*)
    val b = docs.select(
      blockCols.map(col) :+ col("doc_id").as("id_b") :+ col("words").as("w_b"): _*)
    a.join(b, blockCols)
      .filter(col("id_a") =!= col("id_b"))
      .filter(least(size(col("w_a")), size(col("w_b"))).cast("double") /
        size(col("w_a")) >= minContainment)
      .select(blockCols.map(col) :+ col("id_a") :+ col("id_b") :+
        (call_function("sorted_intersect_size", col("w_a"), col("w_b")).cast("double") /
          size(col("w_a"))).as("containment"): _*)
      .filter(col("containment") >= minContainment)
  }

  def containmentPairs(t: Tables): DataFrame = {
    import t.spark.implicits._
    containmentPairsOver(t.documents, $"doc_id", Seq("lang", "source"), $"text")
      .orderBy($"lang", $"source", $"id_a", $"id_b")
  }

  // ── q44: heuristic language ID over documents ────────────────────────
  def languageId(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents
      .select($"doc_id", $"lang".as("labeled_lang"),
        langId($"text").getField("lang").as("predicted_lang"),
        langId($"text").getField("score").as("confidence"))
      .orderBy($"doc_id")
  }

  // ── q38: corpus bigram counts (n-gram generation + explode + agg) ────
  def bigramCounts(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents
      .select(explode(wordNgrams(tokens($"text"), 2)).as("bigram"))
      .groupBy($"bigram")
      .agg(count(lit(1)).as("n"))
      .filter($"n" >= 10)
      .orderBy($"bigram")
  }

  // ── q41: TF-IDF via the ml.feature stack (Tokenizer →
  //         StopWordsRemover → HashingTF → IDF); rows-only — the
  //         hashed vector space is engine-specific ────────────────────
  def tfidfProfile(t: Tables): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, IDF, StopWordsRemover, Tokenizer}
    import t.spark.implicits._
    val docs = t.documents.select($"doc_id", $"text")
    val tok = new Tokenizer().setInputCol("text").setOutputCol("raw_tokens")
    val stop = new StopWordsRemover().setInputCol("raw_tokens").setOutputCol("tokens")
    // 2^12 buckets: IDF aggregates a dense array of this size per
    // partial, so the dimension drives fit cost — but going lower
    // makes hash collisions likely (~60-word vocabulary: expected
    // colliding pairs at 2^10 ≈ 1.7, silently merging words' stats)
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("tf")
      .setNumFeatures(1 << 12)
    // localCheckpoint (not cache): consumed by the IDF fit AND the
    // scoring transform; blocks are context-cleaned when unreferenced
    val tfDf = tf.transform(stop.transform(tok.transform(docs))).localCheckpoint(true)
    val idfModel = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tfDf)
    val scored = idfModel.transform(tfDf)
    val toNorm = org.apache.spark.sql.functions.udf(
      (v: org.apache.spark.ml.linalg.Vector) => math.sqrt(v.toArray.map(x => x * x).sum))
    val nnz = org.apache.spark.sql.functions.udf(
      (v: org.apache.spark.ml.linalg.Vector) => v.numNonzeros)
    scored.select($"doc_id", nnz($"tfidf").as("nnz"), toNorm($"tfidf").as("tfidf_norm"))
      .orderBy($"doc_id")
  }

  // ── q27: SimHash fingerprints (rows-only check; hash fn is
  //         Spark-specific so there is no cross-engine oracle) ──────────
  def simhashes(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents
      .select($"doc_id", simhash($"text").as("simhash64"))
      .orderBy($"doc_id")
  }

  // ── q53: winnowing fingerprints — rolling-hash k-grams, window-min
  //         selection (MOSS). Exploded to (doc_id, fp) rows; the
  //         modular integer hash is engine-independent, so the DuckDB
  //         oracle refolds the same definition and hash-matches. ──────
  def winnowedFingerprints(t: Tables): DataFrame = {
    import t.spark.implicits._
    // no trailing sort: a fingerprint table is an unordered set, and
    // ordering ~100 fps × every doc is the single largest avoidable
    // cost in the query (the correctness gate compares sorted rows on
    // both sides regardless, like every oracle here without ORDER BY).
    t.documents
      .select($"doc_id", explode(winnowFingerprints($"text", 8, 4)).as("fp"))
  }

  // ── q59: corpus vocabulary — top-k words by frequency ───────────────
  // orderBy+limit plans as TakeOrderedAndProject (per-partition
  // partial top-k, k rows to the driver) — a global row_number window
  // would instead funnel the ENTIRE vocabulary through one partition.
  // The ranking window then runs over just the k survivors.
  def topVocabulary(t: Tables, k: Int = 50): DataFrame = {
    import t.spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"n".desc, $"word")
    t.documents
      .select(explode(tokens($"text")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word")
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("int"))
      .orderBy($"rank")
  }

  // ── q106: exact heavy hitters via a two-pass Misra–Gries sketch ─────
  /** All words with exact count · k > N (i.e. frequency > 1/k), found
    * in two bounded-memory passes — the classic sketch-then-verify
    * exact heavy-hitters algorithm:
    *
    *  1. one pass builds a mergeable Misra–Gries summary of ≤ k−1
    *     entries ([[graft.functions.Aggregators.MisraGries]]) plus
    *     the total word count N in the SAME aggregation (map-side
    *     combined, O(k) task memory);
    *  2. the ≤ k−1 candidate words — a driver-side constant, like
    *     LSH planes — are exact-counted with a pushed-down `isin`
    *     filter and kept iff count·k > N.
    *
    * The MG guarantee (any word with count > N/k survives the sketch)
    * makes the OUTPUT EXACT, so the DuckDB oracle is a plain
    * `HAVING COUNT(*)·k > N` — no gate needed. Contrast with q59's
    * full vocabulary count: this never shuffles (word, count) pairs
    * for the whole vocabulary, only for ≤ k−1 candidates — the shape
    * that matters when the vocabulary itself is corpus-scale (URLs,
    * n-grams, IDs). The threshold comparison is integer (count·k > N):
    * no division, engine-neutral. */
  def heavyHittersExact(t: Tables, k: Int = 100): DataFrame = {
    import t.spark.implicits._
    heavyHittersOver(
      t.documents.select(explode(tokens($"text")).as("word")), col("word"), k)
  }

  /** The same two-pass algorithm over an ARBITRARY item column
    * (Graft facade entry): all items with frequency > 1/k, exact. */
  def heavyHittersOver(
      df: DataFrame, itemCol: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val items = df.select(itemCol.as("word"))
    val firstPass = items.agg(
      graft.functions.Aggregators.misraGries(col("word"), k).as("sketch"),
      count(lit(1)).as("n_total")).head()
    val candidates = firstPass.getMap[String, Long](0).keys.toSeq
    val nTotal = firstPass.getLong(1)
    items
      .filter(col("word").isin(candidates: _*))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * k > nTotal)
      .orderBy(col("word"))
  }

  // ── q79: corpus-unigram negative log-likelihood ─────────────────────
  /** Perplexity-style quality signal without a trained LM: score each
    * document by the average `-ln p(word)` under the corpus's own
    * unigram MLE distribution. Low = formulaic/repetitive text, high =
    * rare-token soup — the cheap first-pass filter a data pipeline
    * runs before any model-based scorer.
    *
    * Shuffles carry (doc_id, word, counts) only. Exact across
    * engines: p = c(w)/T is one double division of exact integers,
    * `math_ln` is platform libm on both sides, and the per-document
    * sum folds `tf·(-ln p)` in word order (sorted struct array ↔
    * `list(term ORDER BY word)` + `list_reduce`) so the
    * order-dependent double additions happen in the same sequence. */
  def unigramNllOver(
      df: DataFrame, idCol: org.apache.spark.sql.Column,
      textCol: org.apache.spark.sql.Column): DataFrame = {
    val words = df.select(idCol.as("doc_id"), explode(tokens(textCol)).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val cw = tf.groupBy(col("word")).agg(sum(col("tf")).as("cw"))
    val tot = cw.agg(sum(col("cw")).as("t"))
    val terms = tf.join(cw, "word").crossJoin(broadcast(tot))
      .select(col("doc_id"), col("word"), col("tf"),
        (col("tf").cast("double") *
          -call_function("math_ln",
            col("cw").cast("double") / col("t").cast("double"))).as("term"))
    terms
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sort_array(collect_list(struct(col("word"), col("term")))).as("arr"))
      .select(col("doc_id"), col("n_tokens"),
        (aggregate(col("arr"), lit(0.0), (a, x) => a + x.getField("term"))
          / col("n_tokens")).as("avg_nll"))
  }

  def unigramNll(t: Tables): DataFrame = {
    import t.spark.implicits._
    unigramNllOver(t.documents, $"doc_id", $"text").orderBy($"doc_id")
  }

  // ── q108: bigram Stupid-Backoff negative log-likelihood ─────────────
  /** Held-out language-model quality score — the step up from q79's
    * self-scored unigram NLL: a bigram model with Stupid Backoff
    * (Brants et al. 2007, "Large Language Models in Machine
    * Translation") is COUNTED on a deterministic half of the corpus
    * (doc_id % 2 == 0) and SCORES every document, so unseen bigrams
    * and OOV words actually occur and the backoff path is exercised:
    *
    *   S(w_i | w_{i-1}) = cb(w_{i-1} w_i) / cp(w_{i-1})   if cb > 0
    *                    = 0.4 · cw(w_i) / T                else if cw > 0
    *                    = 0.4 · 1 / T                      else (OOV)
    *
    * where cb = train bigram count, cp(w) = Σ_v cb(w v) (context
    * mass), cw = train unigram count, T = total train tokens. The
    * first token scores S(w_1) = cw(w_1)/T (or 1/T OOV) — no 0.4,
    * it backs off from nothing. avg_nll = Σ −ln S / n_tokens.
    *
    * Scale: counting is two narrow (bigram|word, count) shuffles over
    * the train half; scoring is linear shuffle joins on bigram / prev
    * / cur — no broadcast of the (web-scale) count tables, only the
    * single-row T. Exactness across engines: counts are exact ints,
    * each S is the identical IEEE expression shape on both sides
    * (one divide, then one 0.4·x multiply on the backoff paths),
    * `math_ln` ≡ DuckDB ln on all inputs, and the per-document sum
    * folds terms in sorted-bigram order seeded with the first-token
    * term, so the order-dependent double additions agree. */
  def bigramBackoffNllOver(
      df: DataFrame, idCol: org.apache.spark.sql.Column,
      textCol: org.apache.spark.sql.Column): DataFrame = {
    val toks = df.select(idCol.as("doc_id"), tokens(textCol).as("tk"))
    val train = toks.filter(col("doc_id") % 2 === 0)
    // train-side model counts
    val tb = train.select(explode(wordNgrams(col("tk"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
    val cp = tb
      .groupBy(split(col("bigram"), " ").getItem(0).as("prev"))
      .agg(sum(col("cb")).as("cp"))
    val cw = train.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val tot = cw.agg(sum(col("cw")).as("t"))
    // per-document bigram terms (tokens contain no spaces — the
    // space-joined bigram splits back unambiguously)
    val bt = toks.select(col("doc_id"), explode(wordNgrams(col("tk"), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("tf"))
      .withColumn("prev", split(col("bigram"), " ").getItem(0))
      .withColumn("cur", split(col("bigram"), " ").getItem(1))
    val scored = bt
      .join(tb, Seq("bigram"), "left")
      .join(cp, Seq("prev"), "left")
      .join(cw.withColumnRenamed("w", "cur"), Seq("cur"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("bigram"),
        (col("tf").cast("double") *
          -call_function("math_ln",
            when(col("cb").isNotNull,
              col("cb").cast("double") / col("cp").cast("double"))
            .when(col("cw").isNotNull,
              lit(0.4) * (col("cw").cast("double") / col("t").cast("double")))
            .otherwise(lit(0.4) * (lit(1.0) / col("t").cast("double")))))
          .as("term"))
    val terms = scored.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("bigram"), col("term")))).as("arr"))
    // first-token unigram term + doc length
    val first = toks
      .select(col("doc_id"), size(col("tk")).as("n_tokens"),
        element_at(col("tk"), 1).as("w1"))
      .join(cw.withColumnRenamed("w", "w1").withColumnRenamed("cw", "cw1"),
        Seq("w1"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_tokens"),
        (-call_function("math_ln",
          when(col("cw1").isNotNull,
            col("cw1").cast("double") / col("t").cast("double"))
          .otherwise(lit(1.0) / col("t").cast("double")))).as("term1"))
    first.join(terms, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (aggregate(
          coalesce(col("arr"),
            array().cast("array<struct<bigram:string,term:double>>")),
          col("term1"), (a, x) => a + x.getField("term"))
          / col("n_tokens")).as("avg_nll"))
  }

  def bigramBackoffNll(t: Tables): DataFrame = {
    import t.spark.implicits._
    bigramBackoffNllOver(t.documents, $"doc_id", $"text").orderBy($"doc_id")
  }

  // ── q80: PMI collocations ───────────────────────────────────────────
  /** Top-k word collocations by pointwise mutual information:
    * pmi(a,b) = ln(c(ab)·N / (c(a)·c(b))) over adjacent pairs, with a
    * minimum pair count so hapax noise can't dominate. Counting is
    * two narrow shuffles (bigram, word); the ratio multiplies in
    * DOUBLE before dividing so web-scale counts cannot overflow
    * int64, and both engines run the identical IEEE expression. */
  def pmiCollocationsOver(
      df: DataFrame, textCol: org.apache.spark.sql.Column,
      minCount: Long = 5L, k: Int = 50): DataFrame = {
    val toks = tokens(textCol)
    val bi = df.select(explode(wordNgrams(toks, 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = df.select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c_w"))
    val nBi = df.agg(sum(greatest(size(toks) - 1, lit(0))).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi").desc, col("bigram"))
    bi
      .withColumn("w1", element_at(split(col("bigram"), " "), 1))
      .withColumn("w2", element_at(split(col("bigram"), " "), 2))
      .join(uni.toDF("w1", "c_a"), "w1")
      .join(uni.toDF("w2", "c_b"), "w2")
      .crossJoin(broadcast(nBi))
      .select(col("bigram"), col("c_ab"),
        call_function("math_ln",
          (col("c_ab").cast("double") * col("n").cast("double")) /
            (col("c_a").cast("double") * col("c_b").cast("double"))).as("pmi"))
      // orderBy+limit first → TakeOrderedAndProject (distributed
      // top-k); the ranking window then sees only k rows
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("int"))
  }

  def pmiCollocations(t: Tables): DataFrame = {
    import t.spark.implicits._
    pmiCollocationsOver(t.documents, $"text").orderBy($"rank")
  }

  // ── q123: Count–Min sketch point-frequency gate ─────────────────────
  /** Count–Min sketch over the token stream, gated against exact
    * counts — the sketch family's point-FREQUENCY member, next to
    * q106's Misra–Gries (membership above N/k), q109's HLL
    * (cardinality) and q107's KLL quantiles. At 100 TB this is the
    * shape that answers "how often does this n-gram / URL / ID
    * occur" without a vocabulary-scale shuffle: the sketch is a
    * FIXED d×w counter grid — partial aggregation caps the shuffle at
    * tasks·d·w rows no matter the token count — and a point estimate
    * reads d cells.
    *
    * The sketch is built from the RAW token stream (one row per
    * occurrence, the production path), not from pre-aggregated
    * counts, so the gate genuinely exercises the map-side-combine
    * bound. Estimates for the exact top-`k` tokens (deterministic
    * tie-break: count desc, word) are hash-checked via the CMS
    * CONTRACT, q101/q104-style:
    *
    *  - `n_exact` is engine-neutral and hash-compared outright;
    *  - `meets_bound` = (est ≥ exact) ∧ ((est − exact)·w ≤ 3·N).
    *    The first conjunct is the structural CMS guarantee (a cell
    *    ≥ every count hashed into it — cannot fail). The second is
    *    the ε = 3/w overshoot bound, above the theoretical e/w
    *    Markov bound per row, taken to the min over `depth`
    *    independent rows (violation odds ≪ e^−depth per token);
    *    measured headroom on the fixtures: max overshoot ≈ 0.3·N/w,
    *    10× inside the gate. Integer arithmetic both sides —
    *    engine-neutral.
    *
    * All hashes are seeded xxhash64(word, row) — deterministic across
    * partitionings and engines, like the LSH planes. */
  /** Generic CMS point-frequency estimates (Graft facade entry):
    * build the d×w grid from the occurrence stream `df[itemCol]`
    * (one row per occurrence; groupBy combines map-side, so the
    * shuffle is ≤ tasks·d·w rows regardless of N) and return
    * `(item, n_est)` for each distinct probe item. The bounded grid
    * is broadcast into the probe join — at most d·w rows no matter
    * the corpus — and an absent cell counts 0, so unseen probes
    * estimate correctly (min over d cells, missing = 0). */
  def cmsFrequencyOver(df: DataFrame, itemCol: org.apache.spark.sql.Column,
      probes: DataFrame, probeCol: org.apache.spark.sql.Column,
      width: Int = 2048, depth: Int = 5): DataFrame = {
    require(width >= 2 && depth >= 1, s"bad CMS shape: w=$width d=$depth")
    val rows = array((0 until depth).map(lit): _*)
    val cms = df
      .select(itemCol.as("item"), explode(rows).as("r"))
      .select(col("r"), pmod(xxhash64(col("item"), col("r")), lit(width)).as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cell"))
    val pr = probes.select(probeCol.as("item")).distinct()
      .select(col("item"), explode(rows).as("r"))
      .withColumn("c", pmod(xxhash64(col("item"), col("r")), lit(width)))
    pr.join(broadcast(cms), Seq("r", "c"), "left")
      .groupBy(col("item")).agg(min(coalesce(col("cell"), lit(0L))).as("n_est"))
  }

  def cmsFrequencyGate(t: Tables, width: Int = 2048, depth: Int = 5,
      k: Int = 20, epsFactor: Long = 3L): DataFrame = {
    import t.spark.implicits._
    require(width >= 2 && depth >= 1 && k >= 1 && epsFactor >= 0,
      s"bad CMS shape: w=$width d=$depth k=$k eps=$epsFactor")
    val rows = array((0 until depth).map(lit): _*)
    val words = t.documents.select(explode(tokens($"text")).as("word"))
    // the d×w grid from the occurrence stream; groupBy combines
    // map-side, so the shuffle is ≤ tasks·d·w rows regardless of N
    val cms = words
      .select($"word", explode(rows).as("r"))
      .select($"r", pmod(xxhash64($"word", $"r"), lit(width)).as("c"))
      .groupBy($"r", $"c").agg(count(lit(1)).as("cell"))
    val exact = words.groupBy($"word").agg(count(lit(1)).as("n_exact"))
    val n = words.agg(count(lit(1)).as("n_total"))
    val tracked = exact.orderBy($"n_exact".desc, $"word").limit(k)
    val probes = tracked
      .select($"word", $"n_exact", explode(rows).as("r"))
      .select($"word", $"n_exact", $"r",
        pmod(xxhash64($"word", $"r"), lit(width)).as("c"))
    cms.join(broadcast(probes), Seq("r", "c"))
      .groupBy($"word", $"n_exact").agg(min($"cell").as("n_est"))
      .crossJoin(broadcast(n))
      .select($"word", $"n_exact",
        ($"n_est" >= $"n_exact" &&
          ($"n_est" - $"n_exact") * width <= lit(epsFactor) * $"n_total")
          .as("meets_bound"))
      .orderBy($"word")
  }

  // ── q54: BPE-ish regex tokenization vs whitespace tokenization ──────
  // ── q154: Gopher-rules quality filter ────────────────────────────────
  /** The published composite quality filter of Rae et al. 2021
    * (Gopher, §A1.1), the rule set large pretraining pipelines
    * actually run — restricted to the rules meaningful on one-line
    * fixture text: word-count bounds, mean-word-length ∈ [3, 10],
    * ≥ 80% alphabetic words, ≥ 2 distinct stop words from the 8-word
    * list, and < 10% symbol words (#/ellipsis). Every statistic is an
    * exact integer (or one double division of exact integers) from
    * per-row higher-order functions — no UDFs, engine-exact, and the
    * whole filter is a single codegen'd map pass: zero shuffles, the
    * 100 TB shape of any per-document gate. ASCII fixture text keeps
    * Spark `length` (chars) ↔ DuckDB `strlen` (bytes) aligned. */
  def gopherRulesOver(df: DataFrame, idCol: org.apache.spark.sql.Column,
      textCol: org.apache.spark.sql.Column,
      minWords: Int = 50, maxWords: Int = 100000,
      stopWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minStopHits: Int = 2): DataFrame = {
    require(stopWords.nonEmpty && minWords >= 1, "bad gopher params")
    val gopherStops = stopWords
    val toks = filter(split(textCol, " "), w => w =!= "")
    val n = size(toks)
    val nD = n.cast("double")
    val sumLen = aggregate(toks, lit(0L), (a, w) => a + length(w))
    val alpha = size(filter(toks, w => w.rlike("[a-z]")))
    val stopHits = size(array_intersect(
      array_distinct(toks), array(gopherStops.map(lit): _*)))
    val symbols = size(filter(toks,
      w => w.contains("#") || w.contains("...")))
    df.select(idCol.as("doc_id"), n.as("n_words"),
        (sumLen.cast("double") / nD).as("mean_word_len"),
        (alpha.cast("double") / nD).as("alpha_ratio"),
        stopHits.cast("long").as("stop_hits"),
        (symbols.cast("double") / nD).as("symbol_ratio"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("alpha_ratio") >= 0.8 && col("stop_hits") >= minStopHits &&
          col("symbol_ratio") < 0.1)
  }

  /** Fixture instance: the RULE SET is Gopher's; the thresholds and
    * stop list are re-parameterized to the synthetic corpus (its
    * vocabulary draws from a 6-stopword pool and docs run 10–100
    * words) so the gate PARTITIONS the corpus instead of rejecting
    * 100% of it — a filter that fails everything exercises nothing. */
  def gopherRules(t: Tables): DataFrame = {
    import t.spark.implicits._
    gopherRulesOver(t.documents, $"doc_id", $"text", minWords = 20,
      stopWords = Seq("the", "a", "of", "and", "to", "in"),
      minStopHits = 2)
      .orderBy($"doc_id")
  }

  def bpeishTokenStats(t: Tables): DataFrame = {
    import t.spark.implicits._
    // nullif-guard: engines disagree on double/0 (Spark → NULL,
    // DuckDB → inf); pin the all-whitespace-document case to NULL
    val nBpe = bpeishTokenCount($"text")
    t.documents
      .select($"doc_id",
        nBpe.as("n_bpe"),
        tokenCount($"text").as("n_ws"),
        (length($"text").cast("double") / nullif(nBpe, lit(0))).as("chars_per_bpe"))
      .orderBy($"doc_id")
  }
}
