package graft

import org.apache.spark.sql.functions._

/** End-to-end pipeline invariants on the written shards (the main is
  * exercised by running its stages through the same facade calls). */
class PipelineMainSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline output: splits partition the chunks, no duplicate kept texts") {
    // run the same composition the main performs
    val t = sf001
    val raw = t.documents
    val quality = raw.filter(
      graft.functions.TextFunctions.qualityScore($"text") >= 0.3)
    val deduped = graft.api.Graft.dedupCorpus(quality, $"doc_id", $"text")
    // kept set has no exact duplicates at all
    assert(deduped.count() === deduped.select("text").distinct().count())
    // and no near-dup pair within it at the default threshold
    val residual = graft.api.Graft
      .nearDupPairsMinhash(deduped, $"doc_id", $"text")
    assert(residual.count() === 0, "dedupCorpus left near-duplicate pairs")

    val split = graft.operators.PipelineOps
      .hashSplitOver(deduped, $"doc_id", $"text", 80, 10)
    val chunks = graft.operators.PipelineOps
      .chunkOver(deduped, $"doc_id", $"text", chunkTokens = 64)
      .join(split.select($"doc_id", $"split"), "doc_id")
    val total = chunks.count()
    val bySplit = chunks.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum === total)
    assert(bySplit.keySet.subsetOf(Set("train", "valid", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))
    // chunk token totals reconcile with the kept documents
    val chunkTokens = chunks.agg(sum("chunk_tokens")).head().getLong(0)
    val docTokens = deduped.select(
      graft.functions.TextFunctions.tokenCount($"text").cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(chunkTokens === docTokens)
  }
}
