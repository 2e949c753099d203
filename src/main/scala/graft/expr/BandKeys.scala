package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `bands` random-hyperplane LSH band keys of one embedding in a
  * single codegen'd pass: key(b) = Σ_p sign(dot(plane(b,p), emb))·2^p.
  *
  * Exists because the adaptive sizing in
  * [[graft.operators.Dedup.embeddingNearDupsBanded]] scales the plane
  * count with corpus size — at sf10 that is hundreds of bands ×
  * ~16 planes, and the previous formulation (one `dot_product` column
  * per plane, each carrying its own 64-double array literal) would put
  * thousands of literal-array nodes into ONE projection: an expression
  * tree Janino cannot keep inside a 64 KB method, so codegen falls
  * back to interpreted eval exactly on the hot path. Here the whole
  * plane matrix is ONE flat constant and the per-row work is one tight
  * loop.
  *
  * Bit-identity contract (pinned in BandKeysSpec): the per-plane dot
  * is the same sequential left-fold as [[DotProduct]] with the plane
  * on the LEFT (double) and the embedding on the RIGHT (float widened
  * per element) — `dot += plane(i) * (double) emb(i)` in index order —
  * so the sign bits, and therefore the band keys and the candidate
  * set, are identical to the old column-composition formulation and to
  * the streaming path that shares the same
  * [[graft.operators.Dedup.bandPlanes]] matrix.
  *
  * `planes` is flattened band-major: plane (b, p) occupies
  * [ (b·planesPerBand + p)·dim, +dim ). Constructed via
  * `GraftFunctions.register`'s "band_keys" entry, which folds the
  * literal arguments at resolution time.
  */
case class BandKeys(child: Expression, planes: Array[Double],
    planesPerBand: Int, dim: Int) extends UnaryExpression {

  require(planesPerBand >= 1 && planesPerBand <= 63,
    s"planesPerBand out of range: $planesPerBand")
  require(dim >= 1 && planes.length % (planesPerBand * dim) == 0,
    s"planes length ${planes.length} not a multiple of planesPerBand*dim")

  private val bands: Int = planes.length / (planesPerBand * dim)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_keys"

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
    BandKeys.compute(a.asInstanceOf[ArrayData], planes, bands,
      planesPerBand, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("bandPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.BandKeys.compute($c, $planesRef, $bands, $planesPerBand, $dim, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

object BandKeys {

  def compute(emb: ArrayData, planes: Array[Double], bands: Int,
      planesPerBand: Int, dim: Int, isFloat: Boolean): ArrayData = {
    val n = math.min(dim, emb.numElements())
    val out = new Array[Long](bands)
    var base = 0
    var b = 0
    while (b < bands) {
      var key = 0L
      var p = 0
      while (p < planesPerBand) {
        var dot = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
          dot += planes(base + i) * x
          i += 1
        }
        if (dot >= 0) key |= 1L << p
        base += dim
        p += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }
}
