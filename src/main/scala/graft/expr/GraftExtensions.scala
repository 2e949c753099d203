package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-grade installation of graft's native expressions:
  *
  *   spark-submit --conf spark.sql.extensions=graft.expr.GraftExtensions ...
  *
  * injects the functions at session build time on every node, before
  * any query runs — the right path when the session is created by the
  * platform rather than application code. `GraftFunctions.register`
  * remains the in-process equivalent for an already-built session
  * (what `Tables` uses); both routes register the same expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))

    inject("simhash64", es => SimHash64(es.head))
    inject("cosine_sim", es => CosineSim(es.head, es(1)))
    inject("dot_product", es => DotProduct(es.head, es(1)))
    inject("rolling_kgrams", es => RollingKgrams(es.head, es(1)))
    inject("winnow_fps", es => WinnowFps(es.head, es(1), es(2)))
    inject("minhash_sigs", es => MinHashSigs(es.head, es(1)))
    inject("sorted_intersect_size", es => SortedIntersectSize(es.head, es(1)))
    inject("math_ln", es => MathLn(es.head))
    inject("word_ngrams", es => WordNgrams(es.head, es(1)))
    inject("max_multiplicity", es => MaxMultiplicity(es.head))
    inject("jaccard_at_least", es => JaccardAtLeast(es.head, es(1), es(2)))
    inject("simhash_poly", es => SimHashPoly(es.head))
    // optimizer-level rewrite: expand jaccard_at_least into
    // size-ratio-bound AND exact-jaccard (see JaccardPrefilterRule)
    ext.injectOptimizerRule(_ => JaccardPrefilterRule)
    // the maintenance family's SQL entry point: CALL graft.<proc>(...)
    // resolves to the same lazy fold the Scala facade builds; every
    // other statement parses through the stock parser untouched
    ext.injectParser((session, delegate) =>
      new graft.sql.GraftSqlParser(session, delegate))
  }
}
