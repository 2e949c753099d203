package graft.expr

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The jaccard_at_least macro + its optimizer expansion: installing
  * the rule changes the PLAN (cheap size-ratio bound prepended, macro
  * gone) but never the result. */
class JaccardRuleSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = {
    val docs = sf001.documents.limit(80)
      .select($"doc_id", array_sort(array_distinct(TextFunctions.tokens($"text"))).as("w"))
    docs.select($"doc_id".as("id_a"), $"w".as("w_a"))
      .crossJoin(docs.select($"doc_id".as("id_b"), $"w".as("w_b")))
      .filter($"id_a" < $"id_b")
  }

  test("optimizer expands the macro into size-bound AND exact compare") {
    // SparkSpec's session registers the rule via GraftFunctions
    val filtered = pairs.filter(TextFunctions.jaccardAtLeast($"w_a", $"w_b", 0.3))
    val optimized = filtered.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("jaccard_at_least"),
      s"macro survived optimization:\n$optimized")
    assert(optimized.contains("sorted_intersect_size"),
      s"exact compare missing:\n$optimized")
    assert(optimized.contains("least") && optimized.contains("greatest"),
      s"size-ratio bound missing:\n$optimized")
  }

  test("rule-expanded predicate selects exactly the plain-jaccard pairs") {
    val viaMacro = pairs
      .filter(TextFunctions.jaccardAtLeast($"w_a", $"w_b", 0.3))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = pairs
      .filter(TextFunctions.jaccardSorted($"w_a", $"w_b") >= 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaMacro === plain)
    assert(plain.nonEmpty, "fixture should produce at least one qualifying pair")
  }

  test("macro evaluates correctly standalone (no rule): direct codegen path") {
    // evaluate the expression directly, bypassing the session optimizer
    val expr = JaccardAtLeast(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a", "b", "c"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("b", "c", "d"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal(0.4))
    assert(expr.eval(null) === true)   // 2/4 = 0.5 >= 0.4
    val tight = expr.copy(third = org.apache.spark.sql.catalyst.expressions.Literal(0.6))
    assert(tight.eval(null) === false) // 0.5 < 0.6
  }

  test("rule expansion is total: empty arrays stay false, null inputs stay null") {
    // empty arrays: the macro's direct path returns false; the
    // expansion must not surface the 0/0 division as null
    val df = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a"), Seq.empty[String])).toDF("a", "b")
      .select(TextFunctions.jaccardAtLeast($"a", $"b", 0.5).as("p"))
    assert(df.collect().map(_.getBoolean(0)).toSeq === Seq(false, false))
    // null input arrays: projection result stays null under the rule
    val nullDf = Seq(Tuple1(Seq("a"))).toDF("a")
      .select(TextFunctions.jaccardAtLeast(
        org.apache.spark.sql.functions.lit(null).cast("array<string>"),
        $"a", 0.5).as("p"))
    assert(nullDf.collect().head.isNullAt(0))
  }

  test("extensions injection carries the optimizer rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.GraftExtensionsTestBridge
      .injectedOptimizerRules(ext, spark)
    assert(rules.contains(JaccardPrefilterRule),
      s"GraftExtensions did not inject JaccardPrefilterRule (got $rules)")
  }
}
