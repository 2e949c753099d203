package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-similarity primitives over `array<float>` columns.
  *
  * All arithmetic is a sequential left-fold in DOUBLE via the
  * `aggregate` higher-order function — bit-identical to any engine that
  * folds the same way (the DuckDB oracle uses `list_reduce`), and
  * deterministic regardless of Spark partitioning because the fold is
  * per-row. No UDFs: stays in Catalyst's evaluator, scales on a cluster.
  */
object SimilarityFunctions {

  /** dot(a, b) with per-element promotion to double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in [-1, 1] — native single-pass expression
    * (graft.expr.CosineSim), bit-identical to the HOF fold below.
    * Requires GraftFunctions.register (done by Tables). */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Native single-pass dot product (graft.expr.DotProduct) — same
    * fold as [[cosine]]'s dot accumulator, for hoisting per-vector
    * norms out of all-pairs loops. */
  def dotNative(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** Per-vector L2 norm via the native dot — compute once per vector,
    * then `factoredCosine` per pair is bit-identical to [[cosine]]. */
  def l2NormNative(a: Column): Column = sqrt(dotNative(a, a))

  def factoredCosine(dotAB: Column, nrmA: Column, nrmB: Column): Column =
    dotAB / (nrmA * nrmB)

  /** HOF reference formulation (three interpreted folds); kept for
    * cross-checking the native expression. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Euclidean distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x))
}
