package graft.operators

import graft.Tables
import graft.functions.SimilarityFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>[64]`).
  *
  * Brute-force cosine is the correctness baseline: a broadcast of Q
  * query vectors against N candidates is an O(N·Q) scan with no
  * shuffle until the final top-k, which aggregates only k rows per
  * query. At cluster scale the same plan holds — the candidate side
  * stays partition-local, queries are broadcast, and the ranking
  * window sees Q·k rows. The sub-linear scale path is LSH bucketing
  * (Dedup.scala uses the same machinery for MinHash).
  */
object Similarity {

  private val QueryCount = 5

  /** All (query, candidate) cosine pairs for query vectors
    * vec_id < QueryCount. Exact double fold — oracle-checkable.
    * Norms are hoisted out of the Q×N pair loop (bit-identical, see
    * Dedup.embeddingNearDups). */
  def cosinePairs(t: Tables): DataFrame = {
    import t.spark.implicits._
    val withNorm = t.embeddings
      .select($"vec_id", $"embedding", l2NormNative($"embedding").as("nrm"))
    val q = withNorm.filter($"vec_id" < QueryCount)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
    withNorm
      .join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        factoredCosine(dotNative($"q_emb", $"embedding"), $"q_nrm", $"nrm").as("cos_sim"))
      .orderBy($"q_id", $"vec_id")
  }

  /** Brute-force top-10 nearest neighbours per query by cosine.
    * Ranking key is (exact cosine desc, vec_id) — fully deterministic. */
  def knnBruteForce(t: Tables): DataFrame = {
    import t.spark.implicits._
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
    cosinePairs(t)
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .orderBy($"q_id", $"rank")
  }

  /** Sub-linear scale path for nearest-neighbour search: random-
    * hyperplane LSH buckets. Vectors are bucketed by the sign pattern
    * of `nPlanes` seeded random projections (an nPlanes-bit code); the join
    * compares only same-bucket pairs — candidate count scales with
    * bucket occupancy, not corpus size. Probes are the same 5 query
    * vectors as the brute-force baseline so recall is measurable
    * (SimilaritySpec asserts ≥ 0.4 recall@10 vs exact).
    *
    * Fully deterministic (seeded planes) but the bucket space is
    * engine-specific → rows-only check.
    */
  def annLsh(t: Tables, nPlanes: Int = 4): DataFrame = {
    import t.spark.implicits._
    val dim = 64
    val rnd = new scala.util.Random(42)
    val planes: Array[Array[Double]] =
      Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    val planesCol = array(planes.map(p => array(p.map(lit): _*)): _*)
    def bucketOf(emb: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(planesCol, sequence(lit(0), lit(nPlanes - 1)), (p, i) =>
          when(aggregate(zip_with(p, emb, (w, x) => w * x.cast("double")),
            lit(0.0), (acc, v) => acc + v) >= 0,
            call_function("shiftleft", lit(1), i.cast("int"))).otherwise(lit(0))),
        lit(0), (acc, b) => acc.bitwiseOR(b))
    val bucketed = t.embeddings
      .select($"vec_id", $"embedding", bucketOf($"embedding").as("bucket"))
    // multi-probe: each query also searches every bucket at Hamming
    // distance 1 from its own (flip one plane's sign) — the standard
    // recall boost that costs nPlanes extra probe rows, not extra
    // candidate storage.
    val probeBuckets = explode(array(
      ($"bucket" +: (0 until nPlanes).map(b => $"bucket".bitwiseXOR(lit(1 << b)))): _*))
    val probes = bucketed.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
        probeBuckets.as("bucket"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
    bucketed.join(broadcast(probes), Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", cosine($"q_emb", $"embedding").as("cos_sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .orderBy($"q_id", $"rank")
  }

  /** IVF-style ANN: a seeded KMeans coarse quantizer partitions the
    * corpus into nList inverted lists; each query probes its nProbe
    * nearest centroids and ranks only those lists' vectors by exact
    * cosine. The centroid assignment is the index build (one pass);
    * queries touch ~nProbe/nList of the corpus — the classic IVF
    * trade. Rows-only check (cluster ids are engine-specific);
    * recall vs brute force is asserted in tests. */
  def annIvf(t: Tables, nList: Int = 16, nProbe: Int = 3): DataFrame = {
    import org.apache.spark.ml.feature.{VectorAssembler => _}
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import t.spark.implicits._
    // localCheckpoint (not cache): consumed by the KMeans fit and the
    // assignment transform; blocks are context-cleaned when the
    // returned plan is dropped, instead of pinned for the session
    val vecs = t.embeddings
      .select($"vec_id", $"embedding",
        array_to_vector(transform($"embedding", x => x.cast("double"))).as("features"))
      .localCheckpoint(true)
    // coarse quantizer: random init + few iterations — IVF needs
    // roughly-balanced lists, not converged clusters, and the fit is
    // the dominant index-build cost (k-means|| init alone is several
    // extra passes over the corpus)
    val km = new KMeans().setK(nList).setSeed(42L).setMaxIter(3)
      .setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("ivf_list")
    val model = km.fit(vecs)
    val assigned = model.transform(vecs).select($"vec_id", $"embedding", $"ivf_list")
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }.toSeq.toDF("ivf_list", "centroid")
    // probe lists = nProbe nearest centroids per query vector
    val probes = assigned.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val wProbe = Window.partitionBy($"q_id").orderBy($"c_sim".desc, $"ivf_list")
    val probeLists = probes.crossJoin(broadcast(centroids))
      .select($"q_id", $"q_emb", $"ivf_list",
        cosine($"q_emb", $"centroid").as("c_sim"))
      .withColumn("pr", row_number().over(wProbe))
      .filter($"pr" <= nProbe)
      .select($"q_id", $"q_emb", $"ivf_list")
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
    assigned.join(broadcast(probeLists), Seq("ivf_list"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", cosine($"q_emb", $"embedding").as("cos_sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .orderBy($"q_id", $"rank")
  }

  /** Per-label centroid similarity: average embedding per label, then
    * cosine of each label centroid against label 0's centroid.
    * Demonstrates vector aggregation (element-wise mean via posexplode
    * → groupBy position — shuffles (label, position, value) tuples,
    * i.e. 64 narrow rows per vector, not vectors).
    *
    * The per-dimension mean folds the values in vec_id order
    * (sort_array(collect_list) → sequential `aggregate`), which the
    * DuckDB oracle mirrors with `list(v ORDER BY vec_id)` →
    * `list_reduce` — bit-identical doubles, so the query is exact-
    * oracle-checkable. That sorted fold is the oracle-parity
    * formulation; an unbounded-cardinality production run would swap
    * it for an order-independent DECIMAL-accumulated sum (the same
    * trade documented in README — collect_list per (label, pos) group
    * holds that group's values, fine for bounded label cardinality,
    * wrong for billions per group). */
  def labelCentroids(t: Tables): DataFrame = {
    import t.spark.implicits._
    val centroids = t.embeddings
      .select($"label", $"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos")
      .agg(
        aggregate(
          sort_array(collect_list(struct($"vec_id", $"v".cast("double").as("v")))),
          lit(0.0), (acc, p) => acc + p.getField("v")).as("s"),
        count(lit(1)).as("cnt"))
      .withColumn("c", $"s" / $"cnt")
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pairs"))
      .select($"label", expr("transform(pairs, p -> p.c)").as("centroid"))
    val base = centroids.filter($"label" === 0)
      .select($"centroid".as("base_centroid"))
    centroids.crossJoin(broadcast(base))
      .select($"label", cosine($"centroid", $"base_centroid").as("cos_to_label0"))
      .orderBy($"label")
  }
}
