package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `n` MinHash signatures of a string set in ONE pass:
  * sig(i) = min over elements s of xxhash64(s, i) — exactly Spark's
  * built-in `xxhash64(s, lit(i))` chain (string hashed with seed 42,
  * then the literal i folded in as a long), so it is bit-equal to the
  * HOF formulation `array_min(transform(arr, s => xxhash64(s, lit(i))))`
  * (cross-checked in NativeExprSpec).
  *
  * One pass: each element's string bytes are hashed ONCE, then n cheap
  * long-hash folds update the n running minima — versus the HOF's n
  * full walks through interpreted lambdas, each rehashing every string
  * and materializing an intermediate array. MinHash signatures are the
  * per-row hot loop of LSH dedup, the O(corpus) cost that dominates at
  * 100 TB.
  */
case class MinHashSigs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, foldable int)")
    }

  override def nullSafeEval(arr: Any, nv: Any): Any =
    MinHashSigs.compute(arr.asInstanceOf[ArrayData], nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, n) => s"graft.expr.MinHashSigs.compute($a, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigs =
    copy(left = newLeft, right = newRight)
}

object MinHashSigs {

  /** Tight-loop signatures; called from generated code. Empty input
    * yields Long.MaxValue signatures (array_min of an empty transform
    * would be null; callers filter empty sets first). A null element
    * contributes hashInt(j, 42) — exactly what the builtin chain does
    * (`xxhash64(null, lit(j))` skips the null child, leaving seed 42,
    * then folds the literal), so HOF parity holds for any input. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val sigs = Array.fill(n)(Long.MaxValue)
    val len = arr.numElements()
    var i = 0
    while (i < len) {
      // xxhash64(s, lit(j)) = hashInt(j, seed = hashBytes(s, 42));
      // (lit(j) is IntegerType → Spark takes XXH64's 4-byte path);
      // a null string leaves the seed untouched, like the builtin
      val h0 =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var j = 0
      while (j < n) {
        val h = XXH64.hashInt(j, h0)
        if (h < sigs(j)) sigs(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }
}

/** |A ∩ B| of two SORTED string arrays by a single merge walk —
  * O(|A|+|B|), zero allocation. Spark's `array_intersect` builds a
  * hash set per call; in a candidate-verification join that is one
  * allocation per PAIR, the hot loop of near-dup dedup. Inputs must be
  * sorted ascending and distinct (binary UTF8 order — what
  * `array_sort(array_distinct(...))` produces); output is then
  * identical to `size(array_intersect(a, b))`.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  private def isLongs: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two sorted arrays of the same type " +
            "(array<string> or array<bigint>)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLongs)
      SortedIntersectSize.computeLongs(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedIntersectSize.compute(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLongs) "computeLongs" else "compute"
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.SortedIntersectSize.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {

  /** Merge walk; called from generated code. Null elements sort last
    * under `array_sort`; `array_intersect` matches null==null (one
    * null in the output if both sides contain one). Distinct sorted
    * inputs hold at most one null, necessarily in the LAST slot — so
    * the null contribution is decided by the last elements alone, not
    * by where the string walk stopped (a cursor-based check would
    * undercount when one side exhausts its strings early). */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb && !a.isNullAt(i) && !b.isNullAt(j)) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { n += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    if (na > 0 && nb > 0 && a.isNullAt(na - 1) && b.isNullAt(nb - 1)) n += 1
    n
  }

  /** Long-array merge walk (signed ascending order — what `array_sort`
    * over bigint produces); called from generated code. Inputs must be
    * sorted, distinct, and null-free (the shingle-hash arrays of the
    * dedup verify path are: `array_sort(array_distinct(transform(sh,
    * xxhash64)))` over null-free shingles). */
  def computeLongs(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}
