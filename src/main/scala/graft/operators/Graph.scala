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
    * Algorithm: DEGREE-ORDERED orientation (Chiba & Nishizeki 1985; the
    * compact-forward join of Latapy 2008) — each undirected edge points
    * from its lower-(degree, id) endpoint to the higher, wedges join two
    * out-edges at their common tail, and the closing edge is looked up
    * under the same orientation, so each triangle is found exactly once
    * from its minimum-order vertex. Out-degree under this orientation is
    * O(√m), so per-vertex wedge work is bounded EVEN ON SKEWED GRAPHS: a
    * hot template vertex with degree d contributes d wedges to its
    * (many) low-degree neighbors' tails instead of d²/2 to its own —
    * the lexicographic orientation's failure mode. Wedge count
    * Σ d(d−1) div 2 comes from one degree aggregation; transitivity =
    * 3·triangles / wedges. All exact integer arithmetic ([[ZOrder.intDiv]]
    * keeps the wedge sum in int64 — Column `/` would widen to double and
    * can round wrong past 2⁵³); the one ratio rounds to `roundTo`.
    *
    * Scale shape: one degree aggregation, one broadcast-or-shuffle join
    * to attach order keys, then two equi-joins over the ORIENTED edge
    * list (never the node cross product); cost is Σ out-wedges probes
    * — ≤ the reported n_wedges, with the O(√m) out-degree cap making
    * the bound tight under skew.
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
        sum(ZOrder.intDiv(col("d") * (col("d") - 1), lit(2L))).as("n_wedges"))
      val ne = e.agg(count(lit(1)).as("n_edges"))
      // degree-ordered orientation: attach each endpoint's (degree, id)
      // order key, point the edge at the larger; carry BOTH endpoints'
      // keys so the wedge join can order its two heads without another
      // degree lookup
      val degA = deg.select(col("v").as("a"), col("d").as("da"))
      val degB = deg.select(col("v").as("b"), col("d").as("db"))
      val oriented = e.join(degA, "a").join(degB, "b")
        .select(
          when(col("da") < col("db") ||
              (col("da") === col("db") && col("a") < col("b")),
            struct(col("a").as("u"), col("b").as("w"),
              col("da").as("du"), col("db").as("dw")))
            .otherwise(struct(col("b").as("u"), col("a").as("w"),
              col("db").as("du"), col("da").as("dw"))).as("o"))
        .select(col("o.u").as("u"), col("o.w").as("w"),
          col("o.du").as("du"), col("o.dw").as("dw"))
      // wedge at the common tail u, heads ordered v < w under (deg, id);
      // closing edge (v, w) is oriented v -> w under the same order
      val o2 = oriented.select(col("u").as("u2"), col("w").as("w2"),
        col("dw").as("dw2"))
      val o3 = oriented.select(col("u").as("v3"), col("w").as("w3"))
      val tri = oriented
        .join(o2, col("u") === col("u2") &&
          (col("dw") < col("dw2") ||
            (col("dw") === col("dw2") && col("w") < col("w2"))))
        .join(o3, col("w") === col("v3") && col("w2") === col("w3"))
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

  /** Synchronous label propagation (Raghavan, Albert & Kumara 2007) over
    * an undirected pair graph, a FIXED number of rounds — community
    * detection at the resolution BETWEEN [[Dedup.connectedComponents]]
    * (everything reachable = one component) and [[triangleStats]] (one
    * global cohesion number): inside a big near-dup component, LPA
    * separates the distinct template families that chance edges chain
    * together.
    *
    * Semantics, pinned for cross-engine replay: label₀(v) = v; each
    * round, every node SIMULTANEOUSLY adopts the most frequent label
    * among its neighbors, ties broken by the SMALLEST label (the
    * deterministic variant of Raghavan's random tie-break; node ids
    * may be any orderable type — numeric OR string — and "smallest"
    * follows that type's native order, binary UTF-8 for strings in
    * both engines). Fixed
    * synchronous rounds make the result a pure function of the edge set
    * — including the known oscillation on bipartite structures, which a
    * fixed round count pins rather than hides (Raghavan's asynchronous
    * variant trades that for order-dependence, unacceptable under the
    * determinism contract). Every node in `pairs` has ≥ 1 neighbor by
    * construction, so the vote is never empty.
    *
    * Scale shape: per round, ONE shuffle-hash join of the directed edge
    * list with the label frame (on the neighbor end) + one map-side-
    * combining count keyed by (node, label) + one `max(struct)` argmax
    * keyed by node — NO per-node window, so a hot template vertex with
    * 10⁶ neighbors combines map-side instead of serializing through one
    * window task. Labels are checkpointed per round (the
    * [[Dedup.connectedComponents]] lineage discipline). */
  def labelPropagation(
      pairs: DataFrame,
      rounds: Int = 4,
      iaCol: String = "ia",
      ibCol: String = "ib"): DataFrame = {
    require(rounds >= 1, "labelPropagation needs at least one round")
    val e = pairs.select(col(iaCol).as("u"), col(ibCol).as("v"))
      .union(pairs.select(col(ibCol).as("u"), col(iaCol).as("v")))
      .persist(StorageLevel.DISK_ONLY)
    var labels = e.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true, StorageLevel.DISK_ONLY)
    try {
      (1 to rounds).foreach { _ =>
        val votes = e
          .join(labels.select(col("node").as("v"), col("label")), "v")
          .groupBy(col("u").as("node"), col("label"))
          .agg(count(lit(1)).as("cnt"))
        // argmax by (cnt DESC, label ASC) as min_by over (-cnt, label):
        // map-side combinable, no per-node window (hot-vertex rule).
        // Negating CNT (a count, never near Long.MinValue) instead of
        // the label keeps the id type arbitrary-orderable — string doc
        // ids work, and no overflow is reachable (r14, ADVICE)
        val next = votes
          .groupBy("node")
          .agg(min_by(col("label"),
            struct((-col("cnt")).as("nc"), col("label"))).as("label"))
          .localCheckpoint(true, StorageLevel.DISK_ONLY)
        val prior = labels
        labels = next
        org.apache.spark.sql.graftglue.PlanGlue.releaseLocalCheckpoint(prior)
      }
      labels.select(col("node").as("id"), col("label").as("comm"))
    } finally e.unpersist()
  }

  /** The DuckDB replay of [[labelPropagation]], generated from the same
    * round structure (the one-source-of-truth rule of kCenterSqlCtes /
    * mergesSqlCtes): `edgesSql` must be a self-contained CTE BODY
    * yielding unique undirected pairs (a, b); the generated chain
    * directs the edges, seeds labels, and unrolls one
    * (vote-count, per-node argmax) block per round. Output: (id, comm)
    * ordered by id. */
  def lpaSqlCtes(edgesSql: String, rounds: Int): String = {
    require(rounds >= 1 && rounds <= 64, s"rounds $rounds outside [1, 64]")
    val ctes = Seq.newBuilder[String]
    ctes += s"ep AS ($edgesSql)"
    ctes += "ed AS (SELECT a AS u, b AS v FROM ep UNION ALL SELECT b, a FROM ep)"
    ctes += "l0 AS (SELECT DISTINCT u AS node, u AS label FROM ed)"
    for (r <- 0 until rounds) {
      ctes += s"""g$r AS (SELECT ed.u AS node, l$r.label,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM ed JOIN l$r ON ed.v = l$r.node
        |  GROUP BY 1, 2)""".stripMargin
      ctes += s"""l${r + 1} AS (SELECT node, label FROM (
        |    SELECT node, label,
        |      ROW_NUMBER() OVER (PARTITION BY node
        |                         ORDER BY cnt DESC, label) AS rn
        |    FROM g$r) WHERE rn = 1)""".stripMargin
    }
    s"WITH ${ctes.result().mkString(",\n")}\n" +
      s"SELECT node AS id, label AS comm FROM l$rounds ORDER BY id"
  }

  /** Newman modularity of a node partition over an undirected pair graph
    * (Newman & Girvan 2004) — the quality score that tells a curation
    * review whether [[labelPropagation]]'s communities are REAL structure
    * or noise: Q = Σ_c [ e_c/m − (d_c/2m)² ], e_c = intra-community
    * edges, d_c = degree mass of community c, m = total edges. Q near 0
    * ⇒ no better than random; decently clustered graphs land ~0.3–0.7.
    *
    * `pairs` must be unique undirected pairs (one row per edge, any
    * orientation); `labels` is (id, comm) covering every endpoint — the
    * [[labelPropagation]] output shape. Callers composing the two over
    * an expensive pair producer should persist `pairs` themselves: this
    * operator joins it twice more (degree mass + intra-edge count).
    *
    * Determinism: each community's contribution is computed from the
    * EXACT integer numerator 4m·e_c − d_c² (DECIMAL(38,0) — d_c ≤ 2m can
    * square past int64 on web-scale graphs) divided by the exact 4m² as
    * one double division, rounded — the genuine-quotient rounding rule.
    * Output: one row per community (comm, n_nodes, d_sum, e_in,
    * contrib) ordered by comm; Σ contrib (driver-side or a downstream
    * agg) is the graph's Q. */
  def modularity(
      pairs: DataFrame,
      labels: DataFrame,
      iaCol: String = "ia",
      ibCol: String = "ib",
      roundTo: Int = 10): DataFrame = {
    val DEC = DecimalType(38, 0)
    // the edge frame is read three times (m, degree mass, intra-count):
    // persist so a possibly-expensive pair producer runs once, and
    // eagerly checkpoint the communities-sized output so the cache can
    // be released before returning (no lazy reader left behind)
    val e = pairs.select(col(iaCol).as("a"), col(ibCol).as("b"))
      .persist(StorageLevel.DISK_ONLY)
    try {
      val lab = labels.select(col("id"), col("comm"))
      val m = e.count()
      require(m > 0, "modularity over an empty edge set")
      val deg = e.select(col("a").as("id")).union(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val byComm = deg.join(lab, "id")
        .groupBy("comm")
        .agg(count(lit(1)).as("n_nodes"), sum("d").cast("long").as("d_sum"))
      val eIn = e
        .join(lab.select(col("id").as("a"), col("comm").as("ca")), "a")
        .join(lab.select(col("id").as("b"), col("comm").as("cb")), "b")
        .where(col("ca") === col("cb"))
        .groupBy(col("ca").as("comm"))
        .agg(count(lit(1)).as("e_in"))
      byComm.join(eIn, Seq("comm"), "left")
        .select(col("comm"), col("n_nodes"),
          col("d_sum"), coalesce(col("e_in"), lit(0L)).as("e_in"))
        .withColumn("contrib",
          round(
            (lit(4L * m).cast(DEC) * col("e_in").cast(DEC) -
              col("d_sum").cast(DEC) * col("d_sum").cast(DEC)).cast(DoubleType) /
              lit(4.0 * m.toDouble * m.toDouble),
            roundTo))
        .orderBy("comm")
        .localCheckpoint(true, StorageLevel.DISK_ONLY)
    } finally e.unpersist()
  }

  /** The DuckDB replay of [[labelPropagation]] + [[modularity]] over the
    * same edge CTE — generated from [[lpaSqlCtes]]'s chain with the
    * modularity aggregation on top (one source of truth for the whole
    * composition). */
  def lpaModularitySqlCtes(edgesSql: String, rounds: Int, roundTo: Int = 10): String = {
    val lpa = lpaSqlCtes(edgesSql, rounds)
    // splice: reuse the full CTE chain, swap the final SELECT for the
    // modularity block reading l<rounds> as the label relation
    val withIdx = lpa.lastIndexOf("\nSELECT node AS id")
    require(withIdx > 0, "lpaSqlCtes shape changed; update lpaModularitySqlCtes")
    val ctes = lpa.substring(0, withIdx)
    s"""$ctes,
       | lab AS (SELECT node AS id, label AS comm FROM l$rounds),
       | mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ep),
       | dg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS d
       |        FROM (SELECT a AS id FROM ep UNION ALL SELECT b FROM ep)
       |        GROUP BY 1),
       | bc AS (SELECT comm, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |          CAST(SUM(d) AS BIGINT) AS d_sum
       |        FROM dg JOIN lab USING (id) GROUP BY 1),
       | ei AS (SELECT la.comm, CAST(COUNT(*) AS BIGINT) AS e_in
       |        FROM ep JOIN lab la ON ep.a = la.id
       |                JOIN lab lb ON ep.b = lb.id
       |        WHERE la.comm = lb.comm GROUP BY 1)
       |SELECT bc.comm, bc.n_nodes, bc.d_sum,
       |  COALESCE(ei.e_in, CAST(0 AS BIGINT)) AS e_in,
       |  ROUND(CAST(CAST(4 AS HUGEINT) * mm.m * COALESCE(ei.e_in, 0)
       |             - CAST(bc.d_sum AS HUGEINT) * bc.d_sum AS DOUBLE)
       |        / (4.0 * mm.m * mm.m), $roundTo) AS contrib
       |FROM bc LEFT JOIN ei USING (comm) CROSS JOIN mm
       |ORDER BY comm""".stripMargin
  }
}
