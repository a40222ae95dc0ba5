package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Sample variance as a typed `Aggregator[Double, VarState, Double]` — the
  * §2.11 UDAF surface (SURVEY.md §2.5 A10), registered through
  * `functions.udaf`. Uses Welford's update per element and Chan's
  * parallel-merge formula across partition buffers, so the partial/final
  * split matches Spark's distributed aggregation model with O(1) state.
  *
  * Exists as the worked example of the custom-aggregate escape hatch; the
  * engine's declared queries use the codegen'd built-ins (var_samp etc.,
  * q45) — reach for an Aggregator only when no built-in expresses the
  * semantics.
  */
case class VarState(n: Long, mean: Double, m2: Double)

object WelfordVariance extends Aggregator[Double, VarState, Double] {

  override def zero: VarState = VarState(0L, 0.0, 0.0)

  override def reduce(s: VarState, x: Double): VarState = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    VarState(n, mean, s.m2 + d * (x - mean))
  }

  override def merge(a: VarState, b: VarState): VarState = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      val mean = a.mean + d * b.n / n
      val m2 = a.m2 + b.m2 + d * d * a.n * b.n / n
      VarState(n, mean, m2)
    }
  }

  override def finish(s: VarState): Double =
    if (s.n < 2) Double.NaN else s.m2 / (s.n - 1)

  override def bufferEncoder: Encoder[VarState] = Encoders.product[VarState]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
