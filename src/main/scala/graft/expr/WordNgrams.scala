package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All space-joined word k-grams of a token array in ONE pass:
  * output(i) = tokens(i) + " " + ... + tokens(i+k-1), for
  * i ∈ [0, n-k]; empty array when n < k.
  *
  * Replaces the HOF formulation
  * `transform(sequence(1, n-k+1), i -> concat_ws(" ", slice(toks,i,k)))`,
  * which runs an interpreted lambda per position, allocates a slice
  * array per element, and needs an explicit `when` guard because
  * `sequence(1, 0)` counts DOWN. N-gram generation is the inner loop
  * of shingle dedup (q26/q51/q57/q67), bigram stats (q38/q65), and any
  * corpus n-gram profile — the per-row cost that multiplies by corpus
  * size at 100 TB. Value-identical to the guarded HOF (cross-checked
  * in NativeExprSpec); null tokens are treated as absent by concat_ws
  * semantics (skipped in the join).
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, foldable int)")
    }

  override def nullSafeEval(arr: Any, k: Any): Any =
    WordNgrams.compute(arr.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, k) => s"graft.expr.WordNgrams.compute($a, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}

object WordNgrams {

  private val Space = UTF8String.fromString(" ")

  /** One-pass n-gram join; called from generated code. concat_ws
    * parity: null elements are skipped (contribute nothing, no
    * separator). */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (k < 1 || n < k) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Maximum multiplicity of any element in a string array — the "top
  * n-gram share" numerator of repetition quality filters. Sort-based
  * run-length walk (binary UTF8 order), zero hashing, one small
  * allocation per row; codegen'd static call. Null elements count as
  * a group of their own (matching groupBy-count semantics where null
  * keys group together). Empty input → 0.
  */
case class MaxMultiplicity(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "max_multiplicity"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MaxMultiplicity.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MaxMultiplicity.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MaxMultiplicity =
    copy(child = newChild)
}

object MaxMultiplicity {

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val a = new Array[UTF8String](n)
    var i = 0
    var nulls = 0
    var m = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1
      else { a(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(a, 0, m,
      (x: UTF8String, y: UTF8String) => x.compareTo(y))
    var best = nulls
    var run = 0
    i = 0
    while (i < m) {
      if (i > 0 && a(i).equals(a(i - 1))) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    best
  }
}
