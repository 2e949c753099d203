package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM-data-pipeline work, built from
  * codegen'd Catalyst built-ins and higher-order array functions — no
  * Scala UDFs, so every expression stays inside Tungsten evaluation and
  * scales linearly with input on a cluster.
  */
object TextFunctions {

  /** Stopword set used by quality metrics (domain-neutral subset of the
    * fixture vocabulary). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Whitespace tokenization: `documents.text` is single-space word
    * soup, so a plain split suffices (see FIXTURES.md §B). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Type-token ratio (lexical diversity): distinct / total tokens. */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text)

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column =
    size(filter(tokens(text), w => w.isin(Stopwords.map(x => x: Any): _*)))
      .cast("double") / tokenCount(text)

  /** The quality blend (length saturation 0.4, lexical diversity 0.3,
    * stopword balance 0.3) — THE definition; q25's oracle, the
    * pipeline main, and specs all reference this one expression so the
    * constants cannot drift apart. `satTokens` is the token count at
    * which the length term saturates. */
  def qualityScore(text: Column, satTokens: Int = 100): Column =
    least(tokenCount(text).cast("double") / satTokens.toDouble, lit(1.0)) * 0.4 +
      typeTokenRatio(text) * 0.3 + stopwordRatio(text) * 0.3

  /** Heuristic language ID: score each candidate language by the
    * fraction of its marker words present in the text, take the
    * argmax (ties → lexicographically LAST language: the max is over
    * struct(score, lang), so equal scores compare on lang — the q44
    * oracle mirrors with ORDER BY score DESC, lang DESC). Marker
    * profiles are tiny high-frequency function-word lists — the
    * classic n-gram/stopword-profile approach, pure Catalyst
    * expressions, no UDF. Returns struct(lang, score). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht", "das"),
    "en" -> Seq("the", "and", "is", "of", "to", "in"),
    "es" -> Seq("el", "la", "que", "de", "los", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val scored = LangProfiles.map { case (lang, markers) =>
      val hits = size(filter(toks, w => w.isin(markers.map(x => x: Any): _*)))
      struct((hits.cast("double") / markers.size).as("score"), lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): max score, then max lang —
    // invert lang ordering via greatest-first profile order is not
    // needed; ties resolve to the lexicographically LAST lang, so
    // order profiles to make that deterministic and documented.
    val best = array_max(array(scored: _*))
    struct(best.getField("lang").as("lang"), best.getField("score").as("score"))
  }

  /** Deterministic 128-bit content fingerprint (exact-dedup key).
    * md5 is available in both Spark and DuckDB, so fingerprints are
    * oracle-checkable; at scale an xxhash64 variant is cheaper. */
  def fingerprint(text: Column): Column = md5(text)

  /** 64-bit SimHash over whitespace tokens — native Catalyst
    * expression (graft.expr.SimHash64): xxhash64 per token, bit-vote,
    * one codegen'd loop per row. Requires GraftFunctions.register
    * (done by Tables). */
  def simhash(text: Column): Column =
    call_function("simhash64", tokens(text))

  /** HOF reference formulation of the same SimHash (64 interpreted
    * array passes) — kept for cross-checking the native expression. */
  def simhashHof(text: Column): Column = {
    val hashes = transform(tokens(text), w => xxhash64(w))
    val n = size(hashes)
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, i) => {
        val setVotes = size(filter(hashes, h =>
          call_function("shiftright", h, i.cast("int")).bitwiseAND(lit(1L)) === lit(1L)))
        acc.bitwiseOR(
          when(setVotes * 2 > n, call_function("shiftleft", lit(1L), i.cast("int")))
            .otherwise(lit(0L)))
      })
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 60-bit SimHash with ENGINE-NEUTRAL polynomial token hashes
    * (graft.expr.SimHashPoly) — same majority-vote construction as
    * [[simhash]] but refoldable in any engine (DuckDB oracle
    * hash-matches it bit for bit). */
  def simhashPortable(text: Column): Column =
    call_function("simhash_poly", tokens(text))

  /** All space-joined word k-grams in document order — native one-pass
    * expression (graft.expr.WordNgrams); the interpreted-HOF
    * formulation (transform + slice + concat_ws per position) is kept
    * as [[wordNgramsHof]] for cross-checking. */
  def wordNgrams(toks: Column, k: Int): Column =
    call_function("word_ngrams", toks, lit(k))

  /** HOF reference formulation of [[wordNgrams]] (cross-checked in
    * NativeExprSpec). */
  def wordNgramsHof(toks: Column, k: Int): Column =
    // sequence(1, n) with n < 1 would count DOWN (negative step); guard
    // short documents explicitly.
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** Word-shingle array of size `k` (for n-gram Jaccard dedup). */
  def shingles(text: Column, k: Int): Column =
    array_distinct(wordNgrams(tokens(text), k))

  /** Max multiplicity of any element (native expression) — the "top
    * n-gram count" of repetition filters; equals the max of a
    * groupBy-count over the exploded array. */
  def maxMultiplicity(arr: Column): Column =
    call_function("max_multiplicity", arr)

  /** Jaccard similarity of two pre-distinct string arrays: |∩| / |∪|.
    * Exact integer cardinalities → deterministic double ratio. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Jaccard over SORTED distinct arrays (string or bigint) via the
    * native merge-walk expression (graft.expr.SortedIntersectSize) —
    * same value as [[jaccard]] on the same sets, but O(|A|+|B|) with
    * zero per-pair allocation, the property that matters when this
    * runs once per candidate pair in a dedup join. The bigint form is
    * the scale path: verify joins carry 8-byte shingle hashes, not
    * shingle strings (collision bound documented at the call sites). */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = call_function("sorted_intersect_size", a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Predicate: jaccard of two SORTED distinct string arrays is at
    * least `t` (exclusive of the degenerate t <= 0). Under the
    * installed [[graft.expr.JaccardPrefilterRule]] the optimizer
    * expands this into a short-circuiting size-ratio bound followed by
    * the exact merge-walk compare — the manual prune of
    * TextOps.jaccardPairs, applied automatically to any query. */
  def jaccardAtLeast(a: Column, b: Column, t: Double): Column = {
    require(t > 0, s"jaccardAtLeast requires a positive threshold, got $t")
    call_function("jaccard_at_least", a, b, lit(t))
  }

  /** All k-gram rolling hashes of a string (Rabin–Karp, mod 1e9+7) —
    * native one-pass expression (graft.expr.RollingKgrams). */
  def rollingKgrams(text: Column, k: Int): Column =
    call_function("rolling_kgrams", text, lit(k))

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 / MOSS): the min k-gram rolling hash of every window of
    * `w` consecutive positions, deduplicated and sorted. Guarantees a
    * shared fingerprint for any common substring of length ≥ k+w−1,
    * while keeping only ~2/(w+1) of the hashes — the standard
    * scale-friendly document-fingerprint set. Pure integer arithmetic
    * → bit-exact cross-engine, oracle-checkable.
    *
    * Native expression (graft.expr.WinnowFps): one deque-min pass per
    * row; the HOF variant below slices a fresh window array per
    * position and is kept only as the cross-check reference. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    call_function("winnow_fps", text, lit(k), lit(w))

  /** HOF reference formulation of winnowFingerprints (cross-checked
    * against the native expression in NativeExprSpec). */
  def winnowFingerprintsHof(text: Column, k: Int = 8, w: Int = 4): Column = {
    val hs = rollingKgrams(text, k)
    val m = size(hs)
    // number of windows; a doc shorter than one full window still
    // yields one (clamped) window. sequence() counts DOWN for an empty
    // range, so the m == 0 case is guarded explicitly.
    val nWin = greatest(m - (w - 1), lit(1))
    val mins = transform(sequence(lit(1), nWin), i => array_min(slice(hs, i, lit(w))))
    when(m < 1, array().cast("array<bigint>"))
      .otherwise(array_sort(array_distinct(mins)))
  }

  /** BPE-ish tokenization: greedy regex chunking into ≤4-char letter
    * runs, ≤3-digit number runs, and single punctuation marks — the
    * shape of a byte-pair-encoded vocabulary without a learned merge
    * table. Regex alternation is greedy-left in both Java and RE2, so
    * the split is engine-reproducible. */
  val BpeishPattern = "[a-z]{1,4}|[A-Z]{1,4}|[0-9]{1,3}|[^a-zA-Z0-9\\s]"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))
}
