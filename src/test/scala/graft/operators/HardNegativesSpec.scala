package graft.operators

import graft.SparkSpecBase

/** Hard-negative mining contracts on literal neighbor frames (the
  * operator is pure frame algebra over any ANN tier's output): the
  * RocketQA margin guard, positive exclusion, absent-positive drop,
  * ranking, and the argument gates. */
class HardNegativesSpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  private val neighbors = Seq(
    // probe 1: positive 10 at 0.90; 11 above it (likely false negative),
    // 12 inside the margin band, 13/14/15 confident negatives
    (1L, 11L, 0.95), (1L, 10L, 0.90), (1L, 12L, 0.89),
    (1L, 13L, 0.80), (1L, 14L, 0.70), (1L, 15L, 0.60),
    // probe 2: positive 20 is its TOP neighbor; ties below it
    (2L, 20L, 0.99), (2L, 21L, 0.50), (2L, 22L, 0.50),
    // probe 3: its positive (30) is NOT in the neighbor list
    (3L, 31L, 0.40)).toDF("pid", "nid", "sim")
  private val positives =
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("pid", "pos_id")

  test("margin guard, positive exclusion, absent-positive drop, ranking") {
    val out = Retrieval.hardNegativesFromNeighbors(
        neighbors, positives, k = 2, margin = 0.05)
      .orderBy("pid", "rank").collect()
    // probe 1: 11 (above pos) and 12 (inside margin: 0.89 > 0.85) are
    // excluded; survivors ranked 13 (0.80), 14 (0.70); k=2 cuts 15
    // probe 2: 21/22 tie at 0.50 <= 0.94 -> tie-break on nid
    // probe 3: dropped entirely (positive absent from its list)
    assert(out.map(r => (r.getAs[Long]("pid"), r.getAs[Long]("rank"),
      r.getAs[Long]("nid"))).toSeq === Seq(
      (1L, 1L, 13L), (1L, 2L, 14L), (2L, 1L, 21L), (2L, 2L, 22L)))
    val p1 = out.filter(_.getAs[Long]("pid") == 1L)
    assert(p1.forall(_.getAs[Long]("pos_id") == 10L))
    assert(p1.forall(_.getAs[Double]("pos_sim") == 0.90))
  }

  test("zero margin keeps everything at or below the positive, never above") {
    val out = Retrieval.hardNegativesFromNeighbors(
        neighbors, positives, k = 10, margin = 0.0)
      .filter($"pid" === 1L).orderBy("rank").collect()
    // 0.89/0.80/0.70/0.60 all <= 0.90; 0.95 stays excluded
    assert(out.map(_.getAs[Long]("nid")).toSeq === Seq(12L, 13L, 14L, 15L))
  }

  test("argument gates fail loud") {
    val e = intercept[IllegalArgumentException] {
      Retrieval.hardNegativesFromNeighbors(neighbors, positives, k = 0)
    }
    assert(e.getMessage.contains("k 0"))
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.hardNegativesFromNeighbors(neighbors, positives, k = 1,
        margin = -0.1)
    }
    assert(e2.getMessage.contains("margin"))
  }
}
