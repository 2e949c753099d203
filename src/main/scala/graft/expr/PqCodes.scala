package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `m` product-quantization codes of one embedding in a single
  * codegen'd pass: code(s) = argmin_j ‖sub_s − c_{s,j}‖², ranked by
  * the j-dependent part cSq(s,j) − 2·dot(c_{s,j}, sub_s) (the
  * subvector's own norm is constant across j), ties toward the
  * smallest j.
  *
  * Exists for the same reason as [[BandKeys]]: the column-composition
  * formulation of the encoder puts m·ks literal centroid arrays into
  * ONE projection (m=16, ks=32 → 512 `dot_product` nodes), which
  * Janino cannot keep inside a 64 KB method — codegen falls back to
  * interpreted eval exactly on the index-build scan. Here the whole
  * codebook is ONE flat constant reference and the per-row work is a
  * tight triple loop.
  *
  * Bit-identity contract (pinned in PqCodesSpec): the per-centroid
  * score uses the same sequential left-fold as [[DotProduct]] with
  * the centroid on the LEFT (double) and the subvector element
  * widened per element — `dot += cb(base+i) * (double) emb(off+i)` in
  * index order — and cSq is the same left-to-right Σx² the column
  * formulation folds, so the codes are identical to the literal
  * formulation on every input.
  *
  * `codebook` is flattened subspace-major: centroid (s, j) occupies
  * [ (s·ks + j)·dsub, +dsub ). Constructed via `GraftFunctions
  * .register`'s "pq_codes" entry, which folds the literal arguments
  * at resolution time.
  */
case class PqCodes(child: Expression, codebook: Array[Double],
    ks: Int, dsub: Int) extends UnaryExpression {

  require(ks >= 1, s"ks out of range: $ks")
  require(dsub >= 1 && codebook.length % (ks * dsub) == 0,
    s"codebook length ${codebook.length} not a multiple of ks*dsub")

  private val m: Int = codebook.length / (ks * dsub)

  // per-centroid squared norms, same fold order as the column
  // formulation's driver-side `c.map(x => x*x).sum`
  private lazy val cSq: Array[Double] = {
    val out = new Array[Double](m * ks)
    var c = 0
    while (c < m * ks) {
      var s = 0.0
      var i = 0
      while (i < dsub) { val x = codebook(c * dsub + i); s += x * x; i += 1 }
      out(c) = s
      c += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double> input, got ${t.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    PqCodes.compute(a.asInstanceOf[ArrayData], codebook, cSq, m, ks, dsub, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    val sqRef = ctx.addReferenceObj("pqCSq", cSq, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.PqCodes.compute($c, $cbRef, $sqRef, $m, $ks, $dsub, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {

  def compute(emb: ArrayData, cb: Array[Double], cSq: Array[Double],
      m: Int, ks: Int, dsub: Int, isFloat: Boolean): ArrayData = {
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var bestD = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < ks) {
        val base = (s * ks + j) * dsub
        var dot = 0.0
        var i = 0
        while (i < dsub) {
          val x =
            if (isFloat) emb.getFloat(off + i).toDouble
            else emb.getDouble(off + i)
          dot += cb(base + i) * x
          i += 1
        }
        val d = cSq(s * ks + j) - 2.0 * dot
        // strict < keeps the earliest j on ties — same as the column
        // formulation's array_min struct ordering
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    new GenericArrayData(out)
  }
}
