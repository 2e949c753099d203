package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact int64 dot product of two int8 code vectors (array<tinyint>).
  *
  * The inner loop of quantized screening: 64-dim int8 codes fit a
  * candidate pair in 128 B where the float32 pair needs 512 B, and
  * the multiply-accumulate is exact integer arithmetic (max
  * |Σ| ≤ d·127² — overflow-free in int64 through d ≈ 5.7e14). Exists
  * as a native expression because the higher-order-function
  * formulation (`aggregate(zip_with(...))`) is CodegenFallback —
  * interpreted per pair — exactly on the hundreds-of-millions-of-
  * candidates screen it was built for.
  */
case class QDot8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot8"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<tinyint> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    QDot8.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.QDot8.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDot8 =
    copy(left = newLeft, right = newRight)
}

object QDot8 {

  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    dot
  }
}
