package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All k-gram Rabin–Karp rolling hashes of a string, one pass.
  *
  * For a string with code points c(0..n-1) and gram size k, returns
  * the array h(0..n-k), where
  *
  *   h(i) = ( Σ_{j<k} c(i+j) · B^(k-1-j) ) mod M,  B = 257, M = 1e9+7.
  *
  * Computed with the O(n) rolling update
  * `h(i+1) = (h(i) − c(i)·B^(k−1))·B + c(i+k) (mod M)` rather than
  * O(n·k) per-position refolds. The modulus keeps every intermediate
  * in exact int64 range, so the same definition is reproducible in any
  * engine (the DuckDB oracle refolds it with `list_reduce` over
  * `unicode()` code points and gets identical values).
  *
  * This is the primitive under winnowing document fingerprints
  * (TextFunctions.winnowFingerprints): the hash array is tiny next to
  * the document text, and everything downstream (window-min, distinct)
  * is array ops on it. Custom `Expression` for the same reason as
  * SimHash64 — a HOF refold walks the string O(n·k) through
  * interpreted lambdas; this is one tight codegen'd loop.
  */
case class RollingKgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_kgrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, foldable int), got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(text: Any, kv: Any): Any =
    RollingKgrams.compute(text.asInstanceOf[UTF8String], kv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, kk) => s"graft.expr.RollingKgrams.compute($t, $kk)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingKgrams =
    copy(left = newLeft, right = newRight)
}

object RollingKgrams {

  private val B = 257L
  private val M = 1000000007L

  /** Tight-loop rolling hash; shared by the expressions below. */
  def computeRaw(text: UTF8String, k: Int): Array[Long] = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    val m = n - k + 1
    if (k <= 0 || m <= 0) return Array.emptyLongArray
    // B^(k-1) mod M
    var bk = 1L
    var j = 1
    while (j < k) { bk = bk * B % M; j += 1 }
    val out = new Array[Long](m)
    var h = 0L
    j = 0
    while (j < k) { h = (h * B + cps(j)) % M; j += 1 }
    out(0) = h
    var i = 1
    while (i < m) {
      h = ((h + M - cps(i - 1) * bk % M) % M * B + cps(i + k - 1)) % M
      out(i) = h
      i += 1
    }
    out
  }

  /** Called from generated code. */
  def compute(text: UTF8String, k: Int): ArrayData =
    new GenericArrayData(computeRaw(text, k))

  /** Winnowing selection over the k-gram hashes: the min of every
    * window of `w` consecutive hashes (one clamped window if the doc
    * has fewer than `w` k-grams), deduplicated and sorted. Sliding-
    * window minimum via monotonic index deque — O(m) total, no
    * per-window allocation (the HOF formulation slices a fresh array
    * per window; that difference is ~20× on the fixture corpus).
    * Called from generated code. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val hs = computeRaw(text, k)
    val m = hs.length
    if (m <= 0 || w <= 0) return new GenericArrayData(Array.emptyLongArray)
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var mn = hs(0)
      var i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      sel.add(mn)
    } else {
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // [head, tail) holds indices with increasing hash value
      var i = 0
      while (i < m) {
        while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) sel.add(hs(deque(head)))
        i += 1
      }
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Winnowing fingerprints as a single native expression:
  * rolling k-gram hashes + sliding-window-min selection + distinct +
  * sort, one pass per row. Semantics identical to the HOF
  * formulation in TextFunctions.winnowFingerprintsHof (cross-checked
  * in NativeExprSpec) and to the DuckDB oracle refold. */
case class WinnowFps(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, foldable int, foldable int)")
    }

  override def nullSafeEval(text: Any, kv: Any, wv: Any): Any =
    RollingKgrams.winnow(text.asInstanceOf[UTF8String],
      kv.asInstanceOf[Int], wv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, kk, ww) => s"graft.expr.RollingKgrams.winnow($t, $kk, $ww)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowFps =
    copy(first = f, second = s, third = t)
}
