package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash over a token array using ENGINE-NEUTRAL polynomial
  * token hashes — the cross-engine-checkable sibling of [[SimHash64]]
  * (whose xxhash64 family no other engine reproduces).
  *
  * Per token (by Unicode code points, matching DuckDB `unicode()`):
  *   h1 = fold(a*257 + c) mod 1e9+7,  h2 = fold(a*131 + c) mod 998244353
  * Bit b of the token's 60-bit pattern is bit b of h1 for b < 30 and
  * bit b-30 of h2 for b ≥ 30. Per-document bit b is set iff more
  * tokens have it set than clear (strict majority). All arithmetic is
  * exact int64 — a DuckDB oracle refolds the identical definition with
  * `unicode()` + `list_reduce` and hash-matches bit for bit (same
  * trick as RollingKgrams/q53).
  *
  * 60 well-mixed-enough bits preserve the SimHash property (Hamming
  * distance tracks token-set difference); the xxhash64 variant remains
  * the recommendation when cross-engine parity is not required.
  */
case class SimHashPoly(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_poly"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashPoly.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHashPoly.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashPoly =
    copy(child = newChild)
}

object SimHashPoly {

  val Bits = 60
  private val M1 = 1000000007L
  private val M2 = 998244353L

  /** Tight-loop bit-vote; called from generated code. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i).toString
        var h1 = 0L
        var h2 = 0L
        var ci = 0
        while (ci < s.length) {
          val cp = s.codePointAt(ci)
          h1 = (h1 * 257 + cp) % M1
          h2 = (h2 * 131 + cp) % M2
          ci += Character.charCount(cp)
        }
        var b = 0
        while (b < 30) {
          if (((h1 >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          if (((h2 >>> b) & 1L) == 1L) votes(b + 30) += 1 else votes(b + 30) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
