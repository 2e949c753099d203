package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Natural log bit-identical to glibc's `log` — and therefore to
  * DuckDB's `ln` — on EVERY input, via [[GlibcLog]] (a port of the
  * optimized-routines algorithm glibc 2.28+ ships). Neither JVM log
  * qualifies: HotSpot's `Math.log` intrinsic is correctly rounded
  * where glibc occasionally isn't (~3e-5 of inputs, 1 ulp), and
  * `StrictMath.log` (fdlibm, Spark's built-in `log`) differs far more
  * often. Cross-engine hash-exact pipelines (exact TF-IDF, BM25,
  * unigram NLL, PMI) need glibc's exact result, misroundings
  * included. Same null behavior as the built-in; codegen'd static
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
    GlibcLog.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GlibcLog.log($c)")

  override protected def withNewChildInternal(newChild: Expression): MathLn =
    copy(child = newChild)
}
