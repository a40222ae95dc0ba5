package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Codegen'd banded random-hyperplane LSH signature over an `array<float>`
  * embedding: returns `bands` bucket keys, key j = the sign-bit fold of
  * planes [j·planesPerBand, (j+1)·planesPerBand) (SURVEY.md §4.2 native
  * kernel policy — this is the q37 candidate-generation hot path).
  *
  * Bit-identical to the declarative
  * [[graft.operators.Similarity.hyperplaneBucketExpr]] at
  * offset = j·planesPerBand (unit-tested): plane p's component d is
  * (pmod(xxhash64(p, d), 2001) - 1000) / 1000.0 and the dot product folds
  * left in array order in double precision. The mechanical difference: the
  * plane weights depend only on (p, d), NOT on the row, so they are
  * computed once per (partition, dimension) and cached — the interpreted
  * lambda re-derives every weight for every row (bands × dim xxhash64
  * calls per row, measured ~1.5 s over 2 000 rows at 16 bands where this
  * kernel is ~free).
  */
case class HyperplaneBands(child: Expression, bands: Int, planesPerBand: Int)
    extends UnaryExpression {

  require(bands >= 1 && planesPerBand >= 1, "bands and planesPerBand must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hyperplane_bands"

  // weights for dimension `dim`: w[p][d], p = 0 until bands*planesPerBand
  @transient private var cachedDim: Int = -1
  @transient private var cachedW: Array[Array[Double]] = _

  private def weights(dim: Int): Array[Array[Double]] = {
    // null check, not just dim: Java deserialization on an executor
    // resets the transient fields to (0, null) without re-running
    // initializers, so a zero-length first row would otherwise match the
    // reset cachedDim and read a null cache
    if (cachedW == null || cachedDim != dim) {
      cachedW = Array.tabulate(bands * planesPerBand, dim)((p, d) =>
        HyperplaneBands.weight(p, d))
      cachedDim = dim
    }
    cachedW
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val w = weights(dim)
    val keys = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var key = 0L
      var q = 0
      while (q < planesPerBand) {
        val wp = w(j * planesPerBand + q)
        var s = 0.0
        var d = 0
        while (d < dim) {
          s += v.getFloat(d).toDouble * wp(d)
          d += 1
        }
        key = key * 2 + (if (s >= 0) 1L else 0L)
        q += 1
      }
      keys(j) = key
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[HyperplaneBands].getName
    val wField = ctx.addMutableState("double[][]", "hpWeights")
    val dimField = ctx.addMutableState("int", "hpDim", v => s"$v = -1;")
    nullSafeCodeGen(ctx, ev, x => {
      val dim = ctx.freshName("dim")
      val keys = ctx.freshName("keys")
      val j = ctx.freshName("j")
      val q = ctx.freshName("q")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val key = ctx.freshName("key")
      val wp = ctx.freshName("wp")
      s"""
         |int $dim = $x.numElements();
         |if ($dimField != $dim) {
         |  $wField = new double[${bands * planesPerBand}][$dim];
         |  for (int $j = 0; $j < ${bands * planesPerBand}; $j++) {
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $wField[$j][$d] = $cls.weight($j, $d);
         |    }
         |  }
         |  $dimField = $dim;
         |}
         |long[] $keys = new long[$bands];
         |for (int $j = 0; $j < $bands; $j++) {
         |  long $key = 0L;
         |  for (int $q = 0; $q < $planesPerBand; $q++) {
         |    double[] $wp = $wField[$j * $planesPerBand + $q];
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $s += (double) $x.getFloat($d) * $wp[$d];
         |    }
         |    $key = $key * 2 + ($s >= 0 ? 1L : 0L);
         |  }
         |  $keys[$j] = $key;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBands {
  /** Plane p's component d, exactly as the declarative expr derives it:
    * xxhash64(p, d) (int inputs, seed 42) → pmod 2001 → shift to [-1, 1]. */
  def weight(p: Int, d: Int): Double = {
    val h = XXH64.hashInt(d, XXH64.hashInt(p, 42L))
    val m = ((h % 2001L) + 2001L) % 2001L
    (m - 1000L) / 1000.0
  }
}
