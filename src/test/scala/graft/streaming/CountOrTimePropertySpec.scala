package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the W1 state machine (SURVEY.md §5.2.3), directly
  * generalizing the reference's lossless-delivery invariant
  * (WindowPublisherTest.java:46): drive [[CountOrTimeWindow.step]] with
  * arbitrary arrival sequences and check
  *   (a) concat(emitted) ++ buffered == input (lossless, no dup)
  *   (b) count-closed batches are exactly maxBatchSize; buffered tails
  *       land in [1, maxBatchSize)
  *   (c) arrival order preserved across emissions.
  * No Spark session needed — the transition is pure. */
class CountOrTimePropertySpec extends AnyFunSuite {

  private val arrivals: Gen[List[List[Int]]] =
    Gen.listOfN(20, Gen.listOf(Gen.chooseNum(0, 1000)))

  test("W1 invariants hold for arbitrary arrival sequences") {
    val prop = Prop.forAll(arrivals, Gen.chooseNum(1, 17)) {
      (waves: List[List[Int]], maxBatch: Int) =>
        var state: Option[(Seq[Int], Long)] = None
        var emitted = Vector.empty[Seq[Int]]
        var now = 0L
        var boundsOk = true
        waves.foreach { wave =>
          now += 7
          val (full, next) = CountOrTimeWindow.step(state, wave, maxBatch, now)
          emitted ++= full
          state = next
          boundsOk &&= full.forall(_.size == maxBatch)
          boundsOk &&= next.forall { case (tail, _) => tail.nonEmpty && tail.size < maxBatch }
        }
        val flushed = state.map(_._1).getOrElse(Seq.empty)
        boundsOk && (emitted.flatten ++ flushed) == waves.flatten.toVector
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  test("window-open time: carried for an un-emptied buffer, reset after emission") {
    // buffer opened at t=5 with 2 elements; more arrive at t=9 without
    // filling -> openedAt stays 5
    val (_, s1) = CountOrTimeWindow.step(None, Seq(1, 2), 10, 5L)
    val (_, s2) = CountOrTimeWindow.step(s1, Seq(3), 10, 9L)
    assert(s2.get._2 === 5L)
    // filling the batch emits and the leftover opens a NEW window at t=12
    val (full, s3) = CountOrTimeWindow.step(s2, (4 to 11) ++ Seq(12), 10, 12L)
    assert(full.map(_.size) === Seq(10))
    assert(s3.get._2 === 12L)
  }
}
