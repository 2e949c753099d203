package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Natural log via `java.lang.Math.log` (the platform/glibc
  * implementation), NOT `StrictMath.log` (fdlibm) which Spark's
  * built-in `log` delegates to. The two differ in the final ulp on
  * ~8% of inputs; DuckDB's `ln` is the platform libm, so cross-engine
  * hash-exact pipelines (exact TF-IDF) need this variant. Same
  * null/NaN behavior as the built-in otherwise; codegen'd static
  * call, stays inside whole-stage codegen.
  */
case class MathLn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "math_ln"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires double, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression): MathLn =
    copy(child = newChild)
}
