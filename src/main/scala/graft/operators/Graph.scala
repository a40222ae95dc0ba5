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

  /** Triangle census + global clustering coefficient over an undirected
    * edge list (Newman 2003's transitivity; the cohesion read on a
    * near-dup or kNN graph: triangle-dense regions are CLUSTERS —
    * template families, mirrored sites — where isolated edges are chance
    * similarity; the one-number summary a dedup-policy review starts
    * from).
    *
    * Algorithm: lexicographic orientation — edges normalize to a < b and
    * dedupe, each triangle a < b < c is found exactly once by joining
    * (a,b) ⋈ (b,c) and closing with (a,c). Wedge count Σ d(d−1)/2 comes
    * from one degree aggregation; transitivity = 3·triangles / wedges.
    * All exact integer arithmetic; the one ratio rounds to `roundTo`.
    *
    * Scale shape: two equi-joins over the EDGE list (never the node
    * cross product) — the standard distributed triangle join; its cost
    * is Σ wedges probes, the same quantity the output reports (a
    * self-pricing plan: read n_wedges BEFORE scaling up; the classic
    * refinement when degree skew bites is degree-ordered orientation,
    * documented here as the 100 TB upgrade path).
    *
    * Output (1 row): n_nodes, n_edges, n_wedges, n_triangles,
    * transitivity (NULL when the graph has no wedges). */
  def triangleStats(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      roundTo: Int = 6): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.DISK_ONLY)
    try {
      val deg = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val degStats = deg.agg(
        count(lit(1)).as("n_nodes"),
        sum(col("d") * (col("d") - 1) / 2).cast("long").as("n_wedges"))
      val ne = e.agg(count(lit(1)).as("n_edges"))
      val e2 = e.select(col("a").as("b2"), col("b").as("c2"))
      val e3 = e.select(col("a").as("a3"), col("b").as("c3"))
      val tri = e
        .join(e2, col("b") === col("b2"))
        .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
        .agg(count(lit(1)).as("n_triangles"))
      val out = degStats.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          when(col("n_wedges") > 0,
            round(lit(3.0) * col("n_triangles") / col("n_wedges"), roundTo))
            .as("transitivity"))
      // materialize before releasing the persisted edge frame
      val rows = out.collect()
      edges.sparkSession.createDataFrame(
        edges.sparkSession.sparkContext.parallelize(rows.toIndexedSeq, 1),
        out.schema)
    } finally e.unpersist()
  }
}
