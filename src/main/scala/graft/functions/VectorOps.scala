package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector algebra over `ArrayType(FloatType)` embedding columns in pure
  * Catalyst higher-order functions (SURVEY.md §2.10 L2) — no UDF, no
  * serialization boundary, evaluated row-at-a-time inside the generated
  * plan alongside codegen'd neighbors.
  *
  * Determinism: [[dot]] folds left in array order after widening each
  * element to double, so both engines of the correctness gate (Spark and
  * the DuckDB oracle over `CAST(v AS DOUBLE[])`) see the same operand
  * sequence; residual last-ulp differences are absorbed by the queries'
  * explicit ROUND.
  */
object VectorOps {

  /** Dot product of two float-array columns, accumulated in double.
    * Backed by the codegen'd [[graft.expressions.FloatDotProduct]] kernel;
    * bit-identical to [[dotHof]] (left-to-right double fold). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    ColumnGlue.column(graft.expressions.FloatDotProduct(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))
  }

  /** Declarative higher-order-function form of [[dot]] — the reference
    * implementation the native kernel is verified against, and the
    * fallback for non-float array types. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (s, v) => s + v)

  /** Exact integer dot product over two `array<long>` columns — the
    * quantized-vector kernel of the portable k-means trainer
    * ([[graft.operators.Similarity.kMeansCentroidsPortable]]): products
    * and the running sum stay in Long, so the result is EXACT and
    * engine-portable with no float-summation-order dependence (the q230
    * exact-integer-scatter discipline). Callers bound magnitudes so
    * Σ|aᵢ·bᵢ| < 2⁶³ (micro-quantized unit-scale vectors: ≤ dim·10¹⁴).
    * HOF form — the trainer runs on model-sized samples and centroid
    * frames, never on the corpus hot path. */
  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, v) => s + v)

  /** Exact integer dot product over two `array<tinyint>` SQ8 code
    * columns — the 1-byte/dim pair-screen kernel. Backed by the
    * codegen'd [[graft.expressions.TinyIntDotProduct]]; exact Long
    * arithmetic, bit-identical to the widened [[dotLong]] fold. */
  def dotTiny(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    ColumnGlue.column(graft.expressions.TinyIntDotProduct(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))
  }

  /** Euclidean norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; NaN when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** L2-normalized copy of the vector (double elements). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => x.cast("double") / n)
  }
}
