package graft.expr

import org.apache.spark.sql.{GraftExtensionsTestBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The `--conf spark.sql.extensions=graft.expr.GraftExtensions`
  * cluster-install path: applying the extensions class must inject
  * every native function, and the injected builders must produce
  * working expressions. (Verified through the extensions object
  * directly — the conf is static, so a shared-JVM suite cannot
  * observe it through a real session.) */
class GraftExtensionsSpec extends AnyFunSuite {

  private def applied(): SparkSessionExtensions = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    ext
  }

  test("GraftExtensions injects all native functions") {
    val names = GraftExtensionsTestBridge.registeredNames(applied()).toSet
    assert(names === Set("simhash64", "cosine_sim", "dot_product",
      "rolling_kgrams", "winnow_fps", "minhash_sigs", "sorted_intersect_size",
      "math_ln", "word_ngrams", "max_multiplicity", "jaccard_at_least",
      "simhash_poly"))
  }

  test("an injected builder produces a working expression") {
    val arr = Literal.create(Seq(1.0, 0.0), ArrayType(DoubleType))
    val cos = GraftExtensionsTestBridge
      .buildExpression(applied(), "cosine_sim", Seq(arr, arr))
    assert(math.abs(cos.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }
}
