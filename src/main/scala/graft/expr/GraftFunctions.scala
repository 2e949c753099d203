package graft.expr

import org.apache.spark.sql.SparkSession

/** Registers graft's native Catalyst expressions as SQL functions on a
  * session (idempotent). On a cluster this would hang off
  * `SparkSessionExtensions.injectFunction`; registry registration
  * keeps the library usable on any already-built session.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      es => CosineSim(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_kgrams",
      es => RollingKgrams(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fps",
      es => WinnowFps(es.head, es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sigs",
      es => MinHashSigs(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_intersect_size",
      es => SortedIntersectSize(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("math_ln",
      es => MathLn(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("word_ngrams",
      es => WordNgrams(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("max_multiplicity",
      es => MaxMultiplicity(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_at_least",
      es => JaccardAtLeast(es.head, es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash_poly",
      es => SimHashPoly(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("ts_micros",
      es => TsMicros(es.head), "scala_udf")
    // band_keys(emb, planesFlat, planesPerBand, dim): the trailing
    // three arguments are constants folded out of their literals at
    // resolution time — the plane matrix rides in the expression as
    // ONE reference object, not thousands of literal nodes
    reg.createOrReplaceTempFunction("band_keys",
      es => {
        require(es.drop(1).forall(_.foldable),
          "band_keys: planes/planesPerBand/dim must be literals")
        val planes = es(1).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        BandKeys(es.head, planes,
          es(2).eval().asInstanceOf[Int], es(3).eval().asInstanceOf[Int])
      }, "scala_udf")
    reg.createOrReplaceTempFunction("damerau_levenshtein",
      es => DamerauLevenshtein(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("qdot8",
      es => QDot8(es(0), es(1)), "scala_udf")
    // pq_codes(emb, codebookFlat, ks, dsub): same literal-folding
    // shape as band_keys — the codebook rides as ONE reference object
    reg.createOrReplaceTempFunction("pq_codes",
      es => {
        require(es.drop(1).forall(_.foldable),
          "pq_codes: codebook/ks/dsub must be literals")
        val cb = es(1).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        PqCodes(es.head, cb,
          es(2).eval().asInstanceOf[Int], es(3).eval().asInstanceOf[Int])
      }, "scala_udf")
    // the prefilter rewrite is semantically neutral — install it
    // alongside the functions (idempotent: the rule is a singleton).
    // The read-modify-write is synchronized: concurrent register()
    // calls (e.g. parallel query streams in Bench) would otherwise
    // race the check and append the rule twice.
    GraftFunctions.synchronized {
      if (!spark.experimental.extraOptimizations.contains(JaccardPrefilterRule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ JaccardPrefilterRule
    }
  }
}
