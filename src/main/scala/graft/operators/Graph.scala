package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Graph analytics over operator-produced edge sets — centrality scoring
  * of the corpus kNN graph ([[Similarity.knnGraph]]) for data selection:
  * a document central in embedding space is representative of a dense
  * semantic region (keep for coverage, or downsample the region — the
  * selection policy is the caller's; this computes the signal).
  */
object Graph {

  /** Power-iteration PageRank over a directed edge list, run a FIXED
    * number of rounds (Brin & Page 1998; fixed rounds rather than a
    * convergence test keep the plan static and the result replayable).
    *
    * Semantics: r₀ = 1/N for the N distinct endpoint nodes;
    * rₜ₊₁(v) = (1-d)/N + d · Σ_{u→v} rₜ(u)/outdeg(u). Mass reaching
    * dangling nodes (no out-edges) leaks rather than redistributing —
    * the standard simplification when the output is a relative
    * CENTRALITY signal, not a probability distribution; document scores
    * only compare within one run.
    *
    * Engine-portable determinism: every per-edge contribution is cast to
    * DECIMAL(28,14) before the sum (exact, order-insensitive
    * accumulation — the [[graft.queries.H.msum]] rule applied to graph
    * mass), each round's rank is rounded to `roundTo` decimals, and the
    * teleport term is computed as `1.0 - damping` in DOUBLE on both
    * engines (never a decimal literal: `1 - 0.85` differs in the last
    * ulp between decimal and binary arithmetic). With rounded ranks in /
    * rounded ranks out, the whole iteration replays bit-identically in
    * ANSI SQL — q88 hash-gates 3 rounds over the q77 edge set.
    *
    * Scale shape: per round, ONE shuffle-hash join of the edge list with
    * the rank frame on `src` + ONE map-side-combining sum keyed by `dst`
    * — cost 2 exchanges over E = n·k edge rows per round, never n². The
    * edge+outdeg frame is computed once and persisted (DISK_ONLY, the
    * session cache-pressure rule); state is one double per node. Driver
    * traffic is a single COUNT. Rounds compose lazily on top; callers
    * running many rounds should checkpoint the rank frame periodically
    * (the [[BpeTrain]] cadence) — at the 3-5 rounds typical for a
    * centrality signal the linear plan growth is immaterial.
    */
  def pageRank(
      edges: DataFrame,
      rounds: Int = 3,
      damping: Double = 0.85,
      srcCol: String = "pid",
      dstCol: String = "nid",
      roundTo: Int = 10): DataFrame = {
    require(rounds >= 1, "pageRank needs at least one round")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    // cut the upstream pipeline ONCE: e is read by nodes (counted below,
    // materializing this cache), outdeg, and eDeg — without the persist
    // the possibly-expensive edge producer (a kNN graph in q88) would
    // re-run for each derivation
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(StorageLevel.DISK_ONLY)
    val outdeg = e.groupBy("src").agg(count(lit(1)).cast("long").as("outdeg"))
    // both sides scale with the corpus: shuffle join on src, no broadcast
    val eDeg = e.join(outdeg, "src").persist(StorageLevel.DISK_ONLY)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.DISK_ONLY)
    val n = nodes.count() // the one driver-side scalar
    require(n > 0, "pageRank over an empty edge set")
    val teleport = (1.0 - damping) / n
    val DEC = DecimalType(28, 14)
    var rank = nodes.withColumn("rank", round(lit(1.0 / n), roundTo))
    (1 to rounds).foreach { _ =>
      val contrib = eDeg
        .join(rank.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"),
          (col("rank") / col("outdeg")).cast(DEC).as("c"))
      val summed = contrib.groupBy("node").agg(sum("c").as("mass"))
      rank = nodes
        .join(summed, Seq("node"), "left_outer")
        .select(col("node"),
          round(
            lit(teleport) +
              lit(damping) * coalesce(col("mass").cast(DoubleType), lit(0.0)),
            roundTo).as("rank"))
    }
    rank
  }
}
