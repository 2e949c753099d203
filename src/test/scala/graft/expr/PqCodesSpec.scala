package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the contract the IVF-PQ encoder rides on: [[PqCodes]]' one-
  * pass codes equal the per-centroid-literal column composition
  * (argmin over `dot_product` scores, `array_min` struct tie order)
  * for the same codebook — so the native rewrite cannot move a vector
  * between codes — and ties resolve toward the smallest centroid id. */
class PqCodesSpec extends SparkSpec {

  private val m = 4; private val ks = 8; private val dsub = 4
  private val dim = m * dsub

  private def codebook(seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(m, ks, dsub)(rnd.nextGaussian())
  }

  test("pq_codes equals the legacy per-centroid argmin composition bit-for-bit") {
    import spark.implicits._
    val cb = codebook(42L)
    val rnd = new scala.util.Random(7)
    val df = (0L until 500L)
      .map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
      .toDF("id", "emb")
    // legacy formulation, verbatim from the pre-rewrite operator
    def subOf(i: Int) = slice($"emb", i * dsub + 1, dsub)
    def legacyCode(i: Int) =
      array_min(array((0 until ks).map { j =>
        val cSq = cb(i)(j).map(x => x * x).sum
        struct((lit(cSq) - lit(2.0) * call_function("dot_product",
          array(cb(i)(j).map(lit).toIndexedSeq: _*), subOf(i))).as("d"),
          lit(j).as("j"))
      }: _*)).getField("j")
    val legacy = array((0 until m).map(legacyCode): _*)
    val flat = cb.flatMap(_.flatMap(_.toSeq)).toIndexedSeq
    val native = call_function("pq_codes",
      $"emb", typedlit(flat), lit(ks), lit(dsub))
    val diff = df.select($"id", legacy.as("l"), native.as("n"))
      .filter(not($"l" <=> $"n")).count()
    assert(diff === 0L)
  }

  test("pq_codes ties resolve to the smallest centroid id") {
    import spark.implicits._
    // duplicate centroid 2 at id 5 in every subspace: any vector whose
    // argmin is centroid 2 must still code as 2, never 5
    val cb = codebook(9L)
    for (s <- 0 until m) cb(s)(5) = cb(s)(2).clone()
    val rnd = new scala.util.Random(11)
    val df = (0L until 200L)
      .map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
      .toDF("id", "emb")
    val flat = cb.flatMap(_.flatMap(_.toSeq)).toIndexedSeq
    val bad = df.select(explode(call_function("pq_codes",
        $"emb", typedlit(flat), lit(ks), lit(dsub))).as("c"))
      .filter($"c" === 5).count()
    assert(bad === 0L)
  }

  test("pq_codes interpreted eval matches codegen") {
    import spark.implicits._
    val cb = codebook(3L)
    val flat = cb.flatMap(_.flatMap(_.toSeq))
    val rnd = new scala.util.Random(13)
    val rows = (0 until 100).map(_ => Array.fill(dim)(rnd.nextGaussian().toFloat))
    val viaExpr = rows.toDF("emb")
      .select(call_function("pq_codes",
        $"emb", typedlit(flat.toIndexedSeq), lit(ks), lit(dsub)))
      .collect().map(_.getSeq[Int](0).toVector)
    val direct = rows.map { emb =>
      (0 until m).map { s =>
        (0 until ks).minBy { j =>
          // exact same arithmetic order as PqCodes.compute
          var dot = 0.0
          var cSq = 0.0
          for (i <- 0 until dsub) {
            val c = cb(s)(j)(i)
            dot += c * emb(s * dsub + i).toDouble
            cSq += c * c
          }
          cSq - 2.0 * dot
        }
      }.toVector
    }
    assert(viaExpr.toSeq === direct)
  }
}
