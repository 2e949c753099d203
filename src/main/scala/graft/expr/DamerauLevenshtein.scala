package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein edit distance (insert, delete,
  * substitute, transpose-adjacent — with edits allowed BETWEEN the
  * transposed pair), the Lowrance–Wagner 1975 algorithm. Spark ships
  * only plain `levenshtein`; transpositions are the single most
  * common human typo class, so entity-resolution verify steps want
  * this variant.
  *
  * Deliberately the UNRESTRICTED distance, not the simpler
  * optimal-string-alignment (OSA) restriction: DL("CA","ABC") = 2
  * (CA → A̲C̲A → ABC) where OSA gives 3 — and DuckDB's
  * `damerau_levenshtein` (q171's oracle) computes the unrestricted
  * form, so cross-engine hash parity pins the variant end-to-end
  * (DamerauLevenshteinSpec pins it in-unit against the canonical
  * distinguishing cases).
  *
  * True metric properties hold (triangle inequality included), and
  * DL ≤ Levenshtein ≤ 2·DL — the bound q171 uses to reuse the
  * PassJoin candidate generator losslessly: every DL ≤ d pair has
  * lev ≤ 2d, so lev-(2d) candidates cover the DL-d pair set.
  *
  * Cost is the classic O(|a|·|b|) DP over UTF-16 code units with the
  * per-character last-occurrence table; inputs are capped at 4096
  * units (a verify-join predicate runs on NAMES, not documents — a
  * loud bound beats a silent multi-MB matrix allocation per row).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.compute(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.DamerauLevenshtein.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  private val MaxLen = 4096

  /** Lowrance–Wagner DP. `d(i+1)(j+1)` = distance of prefixes
    * a[0,i) / b[0,j); row/col 0 hold the +∞ sentinel that makes the
    * transposition recurrence uniform. */
  def compute(au: UTF8String, bu: UTF8String): Int = {
    val a = au.toString
    val b = bu.toString
    val la = a.length
    val lb = b.length
    require(la <= MaxLen && lb <= MaxLen,
      s"damerau_levenshtein inputs capped at $MaxLen chars: got $la, $lb")
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // last row index (1-based) at which each char occurred in `a`
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0 // last column (1-based) in `b` matching a(i-1) so far
      j = 1
      while (j <= lb) {
        val k: Int = { val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trn = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trn))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}
