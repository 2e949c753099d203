package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, TernaryExpression}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Predicate `jaccard(left, right) >= threshold` over two SORTED
  * distinct string arrays (exact merge-walk intersect, like
  * [[SortedIntersectSize]]).
  *
  * Self-contained and codegen'd — but its real purpose is to be a
  * REWRITE TARGET: [[JaccardPrefilterRule]] (an injected
  * `Rule[LogicalPlan]`) prepends the sound size-ratio bound
  * `min(|A|,|B|)/max(|A|,|B|) >= t` wherever this predicate appears,
  * so the O(|A|+|B|) walk short-circuits for pairs that cannot
  * possibly reach the threshold — the optimizer-level form of the
  * manual prune in TextOps.jaccardPairs, applied automatically to any
  * user query. Results are identical with or without the rule (the
  * bound is implied by the predicate).
  */
case class JaccardAtLeast(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Predicate {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), DoubleType)
          if third.foldable =>
        // t must be strictly positive — enforced HERE (not just in the
        // Scala API) so the SQL registration path cannot construct the
        // one case (empty arrays, t <= 0) where the optimizer
        // expansion and the direct evaluation would disagree
        // (jaccard is never > 1, so t > 1 would be vacuously false —
        // reject it too rather than accept a predicate that can only
        // signal a caller bug)
        third.eval() match {
          case t: java.lang.Double if t > 0 && t <= 1 =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
          case t =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
              s"$prettyName requires a threshold in (0, 1], got $t")
        }
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, array<string>, foldable double)")
    }

  override def prettyName: String = "jaccard_at_least"

  override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    JaccardAtLeast.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], t.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, t) => s"graft.expr.JaccardAtLeast.compute($a, $b, $t)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): JaccardAtLeast =
    copy(first = f, second = s, third = t)
}

object JaccardAtLeast {
  /** |∩|/|∪| >= t on sorted distinct arrays; called from codegen. */
  def compute(a: ArrayData, b: ArrayData, t: Double): Boolean = {
    val inter = SortedIntersectSize.compute(a, b).toDouble
    val union = a.numElements() + b.numElements() - inter
    // empty ∪ empty: vacuous similarity 0 unless t <= 0
    if (union == 0) 0.0 >= t else inter / union >= t
  }
}

/** Optimizer rule: EXPANDS every [[JaccardAtLeast]] macro-predicate
  * into `size-ratio bound AND exact jaccard >= t`. The bound is sound
  * because jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|): an intersection
  * can never exceed the smaller set, and the union never shrinks below
  * the larger — so prepending it as a short-circuiting cheap test
  * filters pairs without ever running the O(|A|+|B|) merge walk,
  * automatically, for any user query that writes the predicate.
  *
  * Structurally idempotent (the macro is gone after one application),
  * so it is safe inside the optimizer's fixed-point batch. Injected
  * via `GraftExtensions` (`spark.sql.extensions`); without the rule
  * the macro still evaluates correctly through its own codegen —
  * installation only changes the PLAN, never the result (requires
  * threshold > 0, asserted by the API entry point).
  */
object JaccardPrefilterRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case j: JaccardAtLeast =>
      val sa = Cast(Size(j.first), DoubleType)
      val sb = Cast(Size(j.second), DoubleType)
      // coalesce-to-false keeps the expansion TOTAL on empty arrays:
      // Spark's Divide yields null on a zero divisor, which would turn
      // the macro's false into null in a projection — the predicate
      // must stay result-identical with and without the rule
      val bound = Coalesce(Seq(GreaterThanOrEqual(
        Divide(Least(Seq(sa, sb)), Greatest(Seq(sa, sb))), j.third), Literal(false)))
      val inter = Cast(SortedIntersectSize(j.first, j.second), DoubleType)
      val exact = Coalesce(Seq(GreaterThanOrEqual(
        Divide(inter, Subtract(Add(sa, sb), inter)), j.third), Literal(false)))
      // null INPUTS must stay null (the macro is null-intolerant like
      // any TernaryExpression); only the empty-array division is
      // pinned to false
      If(Or(Or(IsNull(j.first), IsNull(j.second)), IsNull(j.third)),
        Literal.create(null, BooleanType),
        And(bound, exact))
  }
}
