package graft.operators

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus scrubbing + curation operators: PII redaction, markup
  * stripping, URL/domain profiling, and deterministic fixed-size
  * stratified sampling — the cleaning stages between "crawled text"
  * and "training corpus" (reference scope: the engine's text tables;
  * the reference app itself holds only play-by-play CSV —
  * `assets/app_nfl.py:42-65` — so these are the training-data
  * extensions the builder contract asks for).
  *
  * All regexes use the portable RE2 ⊂ Java subset (char classes,
  * bounded repeats, `\b`, capture groups — no lookaround, no
  * backreferences) so the DuckDB oracle evaluates the identical
  * pattern; every per-row transform is a codegen'd native expression
  * chain with NO shuffle. The fixture corpus is plain words, so the
  * declared queries deterministically augment each document from its
  * own key columns (same construction in the oracle SQL) — the
  * operators then have real matches to find and the hash compare
  * checks the redaction/stripping byte-for-byte.
  */
object ScrubOps {

  // RE2-and-Java-compatible PII patterns. Email before phone/IP: the
  // email's local part may contain digits that the narrower patterns
  // must not see twice.
  private val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val PhoneRe = """\b\d{3}-\d{3}-\d{4}\b"""
  private val IpRe    = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** Per-document PII scrub: count and mask emails, NANP-style phone
    * numbers, and IPv4 literals. One embarrassingly-parallel
    * projection — masking is a chained `regexp_replace` (email →
    * phone → IP), and each class is COUNTED on the text left after
    * masking the previous classes, so every count equals the number
    * of masks of that class actually present in `clean_text` (an IP
    * embedded in an email's local part is an email, not an IP). */
  def redactPiiOver(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val afterEmail = regexp_replace(textCol, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    df.select(
      idCol.as("doc_id"),
      size(regexp_extract_all(textCol, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(PhoneRe), lit(0))).as("n_phones"),
      size(regexp_extract_all(afterPhone, lit(IpRe), lit(0))).as("n_ips"),
      regexp_replace(afterPhone, IpRe, "<IP>").as("clean_text"))
  }

  /** q74 fixture corpus: every document gains one synthetic email,
    * a phone for 2 of each 3 ids, and an IPv4 for even ids — all
    * derived from `doc_id`/`source` so the oracle rebuilds the exact
    * same bytes and the masked text hash-matches. */
  def piiAugmented(): Column = {
    val d = col("doc_id")
    concat(
      col("text"),
      lit(" contact user"), d.cast("string"), lit("@mail.example.com"),
      when(d % 3 =!= 0,
        concat(lit(" or 415-555-"), lpad((d % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(d % 2 === 0,
        concat(lit(" from 10."), (d % 250).cast("string"), lit(".0.1")))
        .otherwise(lit("")))
  }

  def redactPii(t: Tables): DataFrame = {
    import t.spark.implicits._
    redactPiiOver(t.documents.withColumn("text", piiAugmented()), $"doc_id", $"text")
      .orderBy($"doc_id")
  }

  /** Markup strip: markdown links keep their anchor text (`$1`),
    * `**` emphasis markers and HTML tags are removed. Per-row native
    * chain, no shuffle; `removed_chars` audits how much boilerplate
    * the scrub dropped. */
  def stripMarkupOver(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val clean =
      regexp_replace(
        regexp_replace(
          regexp_replace(textCol, """\[([^\]]*)\]\([^)]*\)""", "$1"),
          """\*\*""", ""),
        """<[^>]+>""", "")
    df.select(
      idCol.as("doc_id"),
      clean.as("clean_text"),
      (length(textCol) - length(clean)).as("removed_chars"))
  }

  /** q77 fixture corpus: heading tag + bold emphasis + one markdown
    * link + a void tag, all rebuilt identically by the oracle. */
  def markupAugmented(): Column =
    concat(
      lit("<h1>"), col("source"), lit("</h1> **"), col("text"),
      lit("** [more](https://ex.org/"), col("doc_id").cast("string"),
      lit(") <br/>"))

  def stripMarkup(t: Tables): DataFrame = {
    import t.spark.implicits._
    stripMarkupOver(t.documents.withColumn("text", markupAugmented()), $"doc_id", $"text")
      .orderBy($"doc_id")
  }

  /** Per-domain URL profile: extract every URL, reduce to its host,
    * aggregate (url count, distinct-document count) per host. The
    * only shuffle carries (domain, doc_id) pairs — never the text. */
  def urlDomainsOver(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val domains = regexp_extract_all(textCol, lit("""https?://([A-Za-z0-9.-]+)"""), lit(1))
    df.select(idCol.as("doc_id"), explode(domains).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("doc_id")).as("n_docs"))
  }

  /** q76 fixture corpus: one per-source docs URL each; even ids add a
    * shared CDN URL — 21 domains with different doc/url counts. */
  def urlAugmented(): Column = {
    val d = col("doc_id")
    concat(
      col("text"),
      lit(" see https://docs-"), col("source"), lit(".example.org/p/"),
      (d % 50).cast("string"),
      when(d % 4 === 0,
        concat(lit(" and http://cdn.example.net/a?id="), d.cast("string")))
        .otherwise(lit("")))
  }

  def urlDomains(t: Tables): DataFrame = {
    import t.spark.implicits._
    urlDomainsOver(t.documents.withColumn("text", urlAugmented()), $"doc_id", $"text")
      .orderBy($"domain")
  }

  /** Deterministic fixed-size stratified sample: exactly
    * min(n, |stratum|) rows per stratum, chosen as the n smallest
    * md5-ranks — a reproducible uniform-without-replacement draw (no
    * RNG; any engine reproduces the membership).
    *
    * Scale shape: a single `Window.partitionBy(stratum)` would funnel
    * each stratum through ONE task (5 language strata → parallelism
    * 5, unbounded per-task row count). Instead the classic exact
    * two-phase top-k: phase 1 takes the per-(stratum, salt) top-n
    * over `saltParts` deterministic salt buckets — parallelism
    * strata×salt, each window ≤ |stratum|/salt rows in expectation —
    * then phase 2 re-ranks the ≤ salt·n survivors per stratum. Any
    * row in the true top-n is in its salt bucket's top-n, so the
    * composition is EXACT for every salting, which only steers
    * parallelism. */
  def stratifiedSampleOver(
      df: DataFrame, strataCol: Column, idCol: Column,
      n: Int, saltParts: Int = 16): DataFrame = {
    val keyed = df.select(
      strataCol.as("stratum"), idCol.as("doc_id"),
      md5(concat(lit("smp:"), idCol.cast("string"))).as("rk"),
      pmod(xxhash64(idCol), lit(saltParts)).as("salt"))
    val local = Window.partitionBy(col("stratum"), col("salt"))
      .orderBy(col("rk"), col("doc_id"))
    val global = Window.partitionBy(col("stratum"))
      .orderBy(col("rk"), col("doc_id"))
    keyed
      .withColumn("rn", row_number().over(local)).filter(col("rn") <= n)
      .withColumn("rn", row_number().over(global)).filter(col("rn") <= n)
      .select(col("stratum"), col("doc_id"))
  }

  /** q75: 30 documents per language, reproducibly. */
  def stratifiedSample(t: Tables, n: Int = 30): DataFrame = {
    import t.spark.implicits._
    stratifiedSampleOver(t.documents, $"lang", $"doc_id", n)
      .withColumnRenamed("stratum", "lang")
      .orderBy($"lang", $"doc_id")
  }
}
