package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns (SURVEY.md
  * §2.10 L2): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketed variant as the scale path.
  *
  * Scale design: brute force is probes × corpus — fine when probes are a
  * broadcastable batch (the plan is a BroadcastNestedLoopJoin streaming
  * the corpus once, no shuffle of the big side; ranking shuffles only
  * (pid, nid, sim) tuples). At 100 TB corpus you cap the streamed work by
  * bucketing both sides with [[hyperplaneBucketExpr]]: the join becomes a
  * hash equi-join on the bucket id, touching ~corpus/2^planes vectors per
  * probe, recall traded via `planes` (fewer planes = bigger buckets =
  * higher recall). Hyperplane weights derive from xxhash64, so bucketing
  * is deterministic across runs and engines — no RNG state to ship.
  *
  * PERF: each side's L2 norm is materialized once per row in its own
  * projection; per candidate pair only the dot product is evaluated.
  * Norms inside the pair-scoring expression would re-run the O(dim)
  * aggregate per pair (Catalyst does not CSE across a join).
  */
object Similarity {

  /** Materialize the row's L2 norm and DROP degenerate vectors — zero
    * norm (cosine undefined; under ANSI the division would throw
    * DIVIDE_BY_ZERO on the first such row) and NaN norm (a single NaN
    * component poisons the sum; Spark orders NaN GREATEST, so `NaN > 0`
    * passes a bare positivity filter and a NaN sim then wins every
    * max_by/rank downstream). Dropping (rather than NaN/NULL scores) is
    * the documented contract of every similarity entry point here. */
  private def withNorm(df: DataFrame, vecCol: String, normName: String): DataFrame =
    df.withColumn(normName, VectorOps.l2Norm(col(vecCol)))
      .filter(!isnan(col(normName)) && col(normName) > 0)

  private def pairSim(roundTo: Int) =
    round(VectorOps.dot(col("pvec"), col("nvec")) / (col("pnorm") * col("nnorm")), roundTo)

  /** Exact top-k cosine neighbors for each probe row.
    * Output: (pid, rank, nid, sim) with sim rounded to `roundTo` before
    * ranking so rank order is stable across float-summation orders. */
  def topKBruteForce(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4): DataFrame = {
    val v = withNorm(corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nvec", "nnorm")
    val p = withNorm(probes.select(col(idCol).as("pid"), col(vecCol).as("pvec")), "pvec", "pnorm")
    val scored = broadcast(p).crossJoin(v)
      .filter(col("pid") =!= col("nid"))
      .withColumn("sim", pairSim(roundTo))
    // ranking via the custom heap operator (graft.plans.TopKPerKey), not a
    // window: the partial phase trims each partition to k rows per probe
    // BEFORE the exchange, so the shuffle moves ~k·partitions rows per
    // probe instead of the whole scored corpus
    graft.plans.TopK.perKey(scored, Seq(col("pid")), Seq(col("sim").desc, col("nid")), k)
      .select("pid", "rank", "nid", "sim")
  }

  /** Deterministic random-hyperplane bucket id (LSH for cosine): bit p of
    * the id is the sign of ⟨vec, plane_{offset+p}⟩ where a plane's
    * component d is a pseudo-random weight in [-1, 1] derived from
    * xxhash64(planeIndex, d). `offset` selects an independent plane
    * family, so OR-amplified callers (bands) draw disjoint planes. */
  def hyperplaneBucketExpr(
      vecCol: String,
      planes: Int,
      offset: Int = 0): org.apache.spark.sql.Column =
    expr(s"""aggregate(sequence($offset, ${offset + planes - 1}), 0L, (acc, p) ->
      acc * 2 + IF(
        aggregate(
          zip_with($vecCol, sequence(0, size($vecCol) - 1),
            (x, d) -> cast(x as double) *
              ((pmod(xxhash64(p, d), 2001) - 1000) / 1000.0)),
          cast(0 as double), (s, v) -> s + v) >= 0, 1L, 0L))""")

  /** LSH-bucketed approximate top-k: candidates share the probe's bucket.
    * Recall < 1 by construction; validate against [[topKBruteForce]]. */
  def topKLsh(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      planes: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4): DataFrame = {
    val v = withNorm(
      corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
        hyperplaneBucketExpr(vecCol, planes).as("bucket")), "nvec", "nnorm")
    val p = withNorm(
      probes.select(col(idCol).as("pid"), col(vecCol).as("pvec"),
        hyperplaneBucketExpr(vecCol, planes).as("pbucket")), "pvec", "pnorm")
    val scored = p.join(v, col("pbucket") === col("bucket") && col("pid") =!= col("nid"))
      .withColumn("sim", pairSim(roundTo))
    graft.plans.TopK.perKey(scored, Seq(col("pid")), Seq(col("sim").desc, col("nid")), k)
      .select("pid", "rank", "nid", "sim")
  }

  /** Spherical k-means coarse quantizer for [[topKIvf]] (Lloyd's
    * iterations over cosine): deterministic init (first k vectors by id),
    * E-step = max-cosine cell assignment as a map-side max_by aggregation
    * (the [[topKIvf]] assign shape), M-step = per-cell elementwise mean
    * of the L2-normalized vectors via posexplode + (cell, dim) partial
    * aggregation. Per iteration only k×dim aggregated doubles reach the
    * driver — centroids are model state, the corpus never moves. Returns
    * (cid, cvec) with float vectors, ready to pass as `quantizer`.
    *
    * Training on normalized vectors makes the M-step the exact maximizer
    * of the within-cell cosine sum, so the 1−cos objective is
    * non-increasing across iterations (property-tested). */
  def kMeansCentroids(
      corpus: DataFrame,
      k: Int,
      iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 0)
    val spark = corpus.sparkSession
    val vn = corpus
      // zero-norm vectors have no direction: they cannot participate in
      // cosine clustering, and l2Normalize would throw DIVIDE_BY_ZERO
      // under ANSI — excluded from training, like every similarity path;
      // NaN norms (NaN component) order GREATEST so they too pass `> 0`
      .filter(!isnan(VectorOps.l2Norm(col(vecCol))) && VectorOps.l2Norm(col(vecCol)) > 0)
      .select(col(idCol).as("id"), VectorOps.l2Normalize(col(vecCol)).as("vn"))
      .withColumn("vnf", col("vn").cast("array<float>"))
      // read once per Lloyd iteration: materialize the normalization
      // instead of re-scanning and re-normalizing the corpus every round
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // zero-norm seeds would make csim = dot/0 = NaN below, and NaN
    // compares greatest in Spark orderings — every point would route to
    // the degenerate cell on the next iteration. Filter on the RAW vector
    // BEFORE normalizing: a zero vector normalizes to all-NaN, whose norm
    // is NaN, and `NaN > 0` is TRUE under Spark's NaN-greatest comparison
    // semantics — a post-normalization guard would wave it through.
    var cents = corpus
      .filter(!isnan(VectorOps.l2Norm(col(vecCol))) && VectorOps.l2Norm(col(vecCol)) > 0)
      .orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cid"),
        VectorOps.l2Normalize(col(vecCol)).cast("array<float>").as("cvec"))
    for (_ <- 0 until iters) {
      // vn is unit-norm, so dividing by |cvec| alone yields the cosine
      val scored = vn.join(broadcast(cents), lit(true))
        .withColumn("csim",
          VectorOps.dot(col("vnf"), col("cvec")) / VectorOps.l2Norm(col("cvec")))
      val assigned = scored.groupBy(col("id"))
        .agg(
          max_by(col("cid"), struct(col("csim"), negate(col("cid")))).as("cell"),
          any_value(col("vn")).as("vn"))
      val dims = assigned
        .select(col("cell"), posexplode(col("vn")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
      val byCell = dims.groupBy(_.getLong(0)).map { case (cell, rows) =>
        (cell, rows.sortBy(_.getInt(1)).map(r => r.getDouble(2).toFloat))
      }.filter(_._2.exists(_ != 0f)) // drop degenerate zero-mean cells (NaN guard)
      import spark.implicits._
      cents = byCell.toSeq.sortBy(_._1)
        .map { case (cid, v) => (cid, v.toSeq) }.toDF("cid", "cvec")
        .select(col("cid"), col("cvec").cast("array<float>").as("cvec"))
    }
    vn.unpersist()
    cents
  }

  /** IVF (inverted-file) approximate top-k — the data-dependent scale
    * path next to the random-hyperplane LSH: a coarse quantizer (the
    * first nCentroids vectors by id, or a trained [[kMeansCentroids]]
    * model via `quantizer`) partitions the corpus into cells; each probe
    * searches only its nProbe nearest cells. Corpus side does
    * n×nCentroids native-kernel dots once (a broadcast join), search cost
    * drops to ~corpus·nProbe/nCentroids per probe batch.
    * Exactness property (tested): nProbe == nCentroids degenerates to
    * brute force — cell routing never changes scores, only candidacy.
    *
    * With `quantizer` set, `nCentroids` is ignored for cell construction;
    * pass the model's ACTUAL cell count (k-means may return fewer than k
    * when cells empty out — `quantizer.count()`) as nCentroids/nProbe
    * when full-probe exactness is the goal. nProbe beyond the real cell
    * count is harmless: the per-probe keep is naturally capped by the
    * cells that exist. */
  def topKIvf(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      quantizer: Option[DataFrame] = None,
      routeRoundTo: Option[Int] = None,
      corpusSizedProbes: Boolean = false): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    val cents = quantizer.getOrElse(
        corpus.orderBy(col(idCol)).limit(nCentroids)
          .select(col(idCol).as("cid"), col(vecCol).as("cvec")))
      .withColumn("cnorm", VectorOps.l2Norm(col("cvec")))
      // a zero- or NaN-norm centroid scores csim = NaN against every
      // vector, and NaN wins max_by — it would swallow whole cells (NaN
      // orders GREATEST, so `> 0` alone waves a NaN norm through)
      .filter(!isnan(col("cnorm")) && col("cnorm") > 0)

    def assign(df: DataFrame, outId: String, outVec: String, keep: Int): DataFrame = {
      val side = withNorm(
        df.select(col(idCol).as(outId), col(vecCol).as(outVec)), outVec, s"${outVec}norm")
      val rawCsim =
        VectorOps.dot(col(outVec), col("cvec")) / (col(s"${outVec}norm") * col("cnorm"))
      val scored = side.join(broadcast(cents), lit(true))
        // routeRoundTo quantizes the ROUTING score (not the output score):
        // cell choice then depends on ~6 decimal digits instead of the
        // final ulp of a double, so another engine replaying the routing
        // with its own float-op order picks the same cells — what makes
        // the approximate path itself oracle-checkable (q77)
        .withColumn("csim",
          routeRoundTo.map(d => round(rawCsim, d)).getOrElse(rawCsim))
      if (keep == 1) {
        // corpus-side keep-1 as a max_by aggregation, NOT a row_number
        // window: partial aggregation collapses the n×nCentroids scored
        // rows map-side, so only ~n (id, vec, norm, cell) rows ride the
        // shuffle — a window would shuffle every scored row first. The
        // (csim, -cid) ordering struct reproduces the window's
        // (csim desc, cid asc) tie-break exactly.
        scored.groupBy(col(outId))
          .agg(
            max_by(col("cid"), struct(col("csim"), negate(col("cid")))).as("cell"),
            any_value(col(outVec)).as(outVec),
            any_value(col(s"${outVec}norm")).as(s"${outVec}norm"))
          .select(col(outId), col(outVec), col(s"${outVec}norm"), col("cell"))
      } else {
        val w = Window.partitionBy(outId).orderBy(col("csim").desc, col("cid"))
        scored.withColumn("crank", row_number().over(w))
          .filter(col("crank") <= keep)
          .select(col(outId), col(outVec), col(s"${outVec}norm"), col("cid").as("cell"))
      }
    }

    // the fast path substitutes `corpus` for BOTH sides — it is only
    // sound when the caller passed the same frame twice (knnGraph);
    // a corpus-SIZED but different probe set must fail loudly, not
    // silently search the wrong vectors
    require(!corpusSizedProbes || (probes eq corpus),
      "corpusSizedProbes requires probes eq corpus (the self-kNN-graph " +
        "shape); for a large distinct probe set call topKIvf without it")
    val (v, p) =
      if (corpusSizedProbes) {
        // corpus == probes (the kNN-graph shape): ONE normalized scan,
        // ONE quantizer dot pass, ONE narrow ranking — two assign() calls
        // would score the corpus against every centroid twice (the
        // dominant scan cost) and push vectors through the probe-side
        // window exchange. The ranking is (nid, cid, csim) only; vectors
        // rejoin from the persisted normalized frame afterwards. Both
        // persists back a LAZY result, so their blocks live until the
        // session cache clears — the documented jaccardPairs contract
        // (`spark.catalog.clearCache()` releases them).
        val side = withNorm(
            corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nvec", "nnorm")
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val rawCsim =
          VectorOps.dot(col("nvec"), col("cvec")) / (col("nnorm") * col("cnorm"))
        val csim = routeRoundTo.map(d => round(rawCsim, d)).getOrElse(rawCsim)
        val wRank = Window.partitionBy("nid").orderBy(col("csim").desc, col("cid"))
        val ranked = side.join(broadcast(cents), lit(true))
          .select(col("nid"), col("cid"), csim.as("csim"))
          .withColumn("crank", row_number().over(wRank))
          .filter(col("crank") <= nProbe)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        // crank == 1 reproduces the keep-1 max_by tie-break exactly:
        // max (csim, -cid) == first of (csim desc, cid asc)
        val vv = side.join(
          ranked.filter(col("crank") === 1).select(col("nid"), col("cid").as("cell")), "nid")
        val pp = side
          .select(col("nid").as("pid"), col("nvec").as("pvec"), col("nnorm").as("pnorm"))
          .join(ranked.select(col("nid").as("pid"), col("cid").as("pcell")), "pid")
        (vv, pp)
      } else {
        (assign(corpus, "nid", "nvec", keep = 1).withColumnRenamed("nvecnorm", "nnorm"),
          assign(probes, "pid", "pvec", keep = nProbe)
            .withColumnRenamed("pvecnorm", "pnorm").withColumnRenamed("cell", "pcell"))
      }
    // probe batches leave the planner free to broadcast the small side;
    // with corpus-sized probes (the kNN-graph shape) BOTH sides are
    // corpus-scale and an estimate-driven broadcast would ship the corpus
    // to every task — force the cell-keyed shuffle-hash join instead
    val (pj, vj) =
      if (corpusSizedProbes) (p.hint("shuffle_hash"), v.hint("shuffle_hash"))
      else (p, v)
    val scored = pj.join(vj, col("pcell") === col("cell") && col("pid") =!= col("nid"))
      .withColumn("sim", pairSim(roundTo))
    // each corpus vector lives in exactly one cell (keep = 1), so a
    // (pid, nid) pair occurs at most once across the probed cells
    graft.plans.TopK.perKey(scored, Seq(col("pid")), Seq(col("sim").desc, col("nid")), k)
      .select("pid", "rank", "nid", "sim")
  }

  /** Count-conditional probe-budget guard — the fixed-budget degrade
    * for PROPORTIONAL probe samples (the r18 verdict item 3 / r19 item
    * 2 closure, the `boundedBlockedPairs` / `maxBandDf` guard class
    * applied to eval probes): a recall/mining harness whose probe set
    * is a corpus FRACTION (e.g. `vec_id % 10 = 0`) is quadratic BY
    * HARNESS — probes × corpus both grow with n (q111 measured 324×
    * wall for 100× data, q255 266×). A production eval fixes the probe
    * BUDGET instead (q277/q278 measured 4.7×/7.5× at the same 100×).
    * This guard makes the registered proportional geometry degrade to
    * that shape automatically: at or below `maxProbes` probes the frame
    * is returned UNTOUCHED (gate scales: ≤ 200 probes at sf0.001–0.1,
    * so oracles replay the un-guarded geometry bit-exactly), above it
    * the eval runs on the first `budget` probes by `idCol` — a
    * deterministic fixed-budget sample, budget × corpus LINEAR.
    * The count is one job over the model-thin probe projection. */
  def boundedProbeBudget(
      probes: DataFrame,
      idCol: String = "vec_id",
      maxProbes: Long = 1024L,
      budget: Int = 128): DataFrame = {
    require(maxProbes >= 1L && budget >= 1 && budget <= maxProbes,
      s"boundedProbeBudget: need 1 <= budget ($budget) <= maxProbes ($maxProbes)")
    if (probes.select(col(idCol)).count() <= maxProbes) probes
    else probes.orderBy(col(idCol)).limit(budget)
  }

  /** Corpus kNN GRAPH — every vector's top-k neighbors, the workhorse of
    * semantic dedup / clustering / curriculum pipelines — via IVF cell
    * routing at PRODUCTION geometry (nProbe ≪ nCentroids), i.e. the
    * approximate path, not the full-probe degenerate case q50 gates.
    *
    * Shape at 100 TB: candidate volume is n·(n·nProbe/nCentroids) spread
    * over cell-keyed shuffle-hash joins — never all-pairs, never a
    * broadcast of either corpus-sized side ([[topKIvf]]'s
    * `corpusSizedProbes`). Routing scores are rounded (`routeRoundTo`) so
    * cell candidacy is engine-portable: with the default deterministic
    * quantizer (first-nCentroids vectors; pass a k-means model via
    * `quantizer` in production) the ENTIRE approximate pipeline — cell
    * assignment, probe routing, candidate generation, heap ranking — is
    * replayable in ANSI SQL, which is how q77 hash-gates it. Probes whose
    * cells hold no other vector emit no rows (the documented recall
    * trade; raise nProbe for coverage). */
  def knnGraph(
      corpus: DataFrame,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      routeRoundTo: Int = 6,
      quantizer: Option[DataFrame] = None): DataFrame =
    topKIvf(corpus, corpus, k, nCentroids, nProbe, idCol, vecCol, roundTo,
      quantizer, routeRoundTo = Some(routeRoundTo), corpusSizedProbes = true)

  /** [[knnGraph]] with `nCentroids` derived by [[scaledCentroids]] from a
    * cheap corpus count — the production entry point: a pinned cell
    * count makes per-probe candidate volume (nProbe·n/nCentroids) grow
    * LINEARLY with the corpus and the whole graph quadratically (the r15
    * study's q77 finding: pinned 16 cells measured 521× at 100× data;
    * derived cells bound candidates at ~nProbe·targetCell per probe).
    * The fixed-`nCentroids`
    * overload remains for callers pinning geometry or passing a trained
    * quantizer. */
  def knnGraphAuto(
      corpus: DataFrame,
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      routeRoundTo: Int = 6,
      minCentroids: Int = 16,
      targetCell: Int = 1024): DataFrame =
    knnGraph(corpus, k,
      scaledCentroids(corpus.count(), minCentroids, targetCell), nProbe,
      idCol, vecCol, roundTo, routeRoundTo)

  /** SEMANTIC ingest admission gate — the vector-space member of the
    * newContentOnly family (exact sha → [[graft.operators.Dedup.newContentOnly]],
    * fuzzy text → [[graft.operators.Dedup.newContentOnlyNear]], THIS →
    * embedding cosine): drop incoming vectors whose similarity to ANY
    * corpus vector within the probed IVF cells reaches `minCos` (the
    * SemDeDup-style duplicate definition). k = 1 suffices — the heap
    * keeps the MAX-similarity candidate, and max ≥ τ ⇔ some candidate
    * ≥ τ. Routing is rounded, so with a deterministic quantizer the
    * whole gate (assignment → routing → candidacy → threshold →
    * anti-join) replays in SQL (q84). nProbe bounds recall exactly as
    * in [[topKIvf]]: a near-dup hiding in an unprobed cell survives —
    * the documented approximate-gate trade; raise nProbe to tighten. */
  def semanticNewContentOnly(
      incoming: DataFrame,
      corpus: DataFrame,
      minCos: Double,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      routeRoundTo: Int = 6,
      quantizer: Option[DataFrame] = None): DataFrame = {
    require(minCos >= -1.0 && minCos <= 1.0, s"minCos $minCos outside [-1,1]")
    val hits = topKIvf(corpus, incoming, k = 1, nCentroids, nProbe, idCol,
        vecCol, roundTo = 4, quantizer, routeRoundTo = Some(routeRoundTo))
      .filter(col("sim") >= minCos)
    incoming.join(hits.select(col("pid").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
  }

  // ---- Product quantization (PQ / ADC) ----
  // Jégou, Douze, Schmid — "Product Quantization for Nearest Neighbor
  // Search" (TPAMI 2011): split the (L2-normalized) vector into m
  // subspaces, learn a ksub-entry codebook per subspace, store each
  // corpus vector as m small codes. A probe then scores a candidate in
  // O(m) table lookups (ADC — asymmetric distance computation) instead of
  // O(dim) multiplies, and the corpus rides the scan as n·m codes
  // instead of n·dim floats — at 100 TB that is the difference between
  // streaming the embedding matrix and streaming ~1/64 of it. On
  // normalized vectors, L2² = 2 − 2·cos, so ascending ADC distance is
  // descending approximate cosine; the final ranking is EXACT cosine over
  // the re-ranked candidate pool, so PQ (like IVF's cell routing) only
  // ever changes candidacy, never scores — with topC ≥ corpus the output
  // provably equals [[topKBruteForce]] (property-tested; q72 hash-gates
  // it against the brute-force oracle).

  /** Stage (outId, vn): L2-normalized double vector with the norm staged
    * as an attribute first — lambda bodies get no CSE, so dividing by an
    * inline `l2Norm` would re-run the O(dim) fold per element. */
  private def normalized(df: DataFrame, idCol: String, vecCol: String, outId: String): DataFrame =
    withNorm(df.select(col(idCol).as(outId), col(vecCol).as("v_")), "v_", "n_")
      .select(col(outId), transform(col("v_"), x => x.cast("double") / col("n_")).as("vn"))

  /** Squared L2 distance between two double-array columns. */
  private def l2dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, v) => s + v)

  /** (id, m, sub): the m contiguous dsub-wide subvectors of each row. */
  private def subRows(vn: DataFrame, idName: String, m: Int, dsub: Int): DataFrame =
    vn.select(col(idName), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          mi => slice(col("vn"), mi * lit(dsub) + 1, lit(dsub))))
      .as(Seq("m", "sub")))

  /** (id, m, c): nearest codebook entry per (row, subspace); min_by on
    * (distance, c) so ties break on the lower code deterministically.
    * The codebook is model state (m·ksub·dsub doubles) — broadcast; the
    * per-(id, m) argmin collapses map-side before its shuffle. */
  private def assignCodes(
      vn: DataFrame, books: DataFrame, m: Int, dsub: Int, idName: String): DataFrame =
    subRows(vn, idName, m, dsub)
      .join(broadcast(books), "m")
      .withColumn("d", l2dist2(col("sub"), col("cvec")))
      .groupBy(col(idName), col("m"))
      .agg(min_by(col("c"), struct(col("d"), col("c"))).as("c"),
        any_value(col("sub")).as("sub"))

  /** Per-subspace codebooks (m, c, cvec: array<double>) trained on the
    * L2-normalized corpus. Deterministic seed: the subvectors of the
    * first ksub valid vectors by id (the [[topKIvf]] default-quantizer
    * convention). `iters` Lloyd rounds refine with exact L2 means;
    * per round only m·ksub·dsub aggregated doubles reach the driver —
    * codebooks are model state, the corpus never moves (the
    * [[kMeansCentroids]] contract). Cells that empty out are dropped
    * (codes simply never reference them). */
  def pqCodebooks(
      corpus: DataFrame,
      m: Int = 4,
      ksub: Int = 16,
      iters: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    pqCodebooksFrom(normalized(corpus, idCol, vecCol, "id"), m, ksub, iters)

  /** The [[pqCodebooks]] Lloyd core over an already-derived (id, vn)
    * frame — shared with the RESIDUAL encoding path
    * ([[topKIvfPqResidual]]), whose training input is vn − ĉ(home cell)
    * rather than the normalized vector itself. */
  private def pqCodebooksFrom(
      vnF: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int): DataFrame = {
    require(m >= 1 && ksub >= 1 && iters >= 0)
    val spark = vnF.sparkSession
    import spark.implicits._
    // one read per Lloyd round (assign) plus the seed and dim probe:
    // materialize the normalization once instead of re-scanning and
    // re-normalizing the corpus every round (the kMeansCentroids barrier).
    // try/finally below: a failing dim check, empty-corpus head() or
    // failed Lloyd collect must not pin a corpus-sized cache entry for
    // the session lifetime (the connectedComponents release discipline)
    val vn = vnF.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
    val head = vn.select(size(col("vn"))).head()
    val dim = head.getInt(0)
    require(dim % m == 0, s"embedding dim $dim must be divisible by m=$m")
    val dsub = dim / m
    // Seed = first ksub vectors by id. TakeOrdered ships exactly ksub
    // rows (≤ 256·dim doubles — model state, the same driver-side budget
    // as a Lloyd round's means below); indexing them 0..ksub-1 here
    // avoids an unpartitioned row_number window, whose "moving all data
    // to a single partition" warning would mask real regressions in the
    // bench log even though this frame is bounded.
    var books = vn.orderBy(col("id")).limit(ksub)
      .select(col("vn")).collect()
      .iterator.zipWithIndex.flatMap { case (r, c) =>
        val v = r.getSeq[Double](0)
        (0 until m).map(mi =>
          (mi, c, v.slice(mi * dsub, (mi + 1) * dsub)))
      }.toSeq.toDF("m", "c", "cvec")
    for (_ <- 0 until iters) {
      val dims = assignCodes(vn, books, m, dsub, "id")
        .select(col("m"), col("c"), posexplode(col("sub")).as(Seq("pos", "x")))
        .groupBy("m", "c", "pos").agg(avg("x").as("mu"))
        .collect()
      books = dims.groupBy(r => (r.getInt(0), r.getInt(1))).toSeq
        .map { case ((mi, c), rows) =>
          (mi, c, rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq) }
        .sortBy(t => (t._1, t._2))
        .toDF("m", "c", "cvec")
    }
    books
    } finally {
      // trained codebooks are driver-built literal frames with no plan
      // reference to vn; the iters = 0 seed re-derives lazily (plain
      // persist — lineage intact, recompute is correct). Either way the
      // cache must not outlive the call, success or failure.
      vn.unpersist()
    }
  }

  /** Encode each corpus vector as its m-code array (id, codes) against a
    * trained codebook — the materialized compact index ([[topKPqAdc]]
    * builds it inline; persist the result to amortize across queries the
    * way [[Retrieval.buildIndex]] does for BM25 postings). */
  def pqEncode(
      corpus: DataFrame,
      books: DataFrame,
      m: Int,
      dsub: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    assignCodes(normalized(corpus, idCol, vecCol, "nid"), books, m, dsub, "nid")
      .groupBy("nid")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("c")))),
        s => s.getField("c")).as("codes"))

  /** PQ/ADC approximate top-k with exact re-rank: corpus travels as
    * codes, each probe carries its m·ksub distance table (keyed map —
    * robust to dropped cells), candidates are the topC best ADC rows per
    * probe (heap operator: partial trim before the exchange), and the
    * final top-k comes from the TRUE rounded cosine over the candidate
    * pool. ADC therefore only prunes; every emitted (rank, sim) is
    * exact. topC ≥ corpus degenerates to [[topKBruteForce]] — the
    * property the oracle gate pins; production callers trade recall for
    * the O(corpus·m/dim) scan via topC ≪ corpus. */
  def topKPqAdc(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      topC: Int,
      m: Int = 4,
      ksub: Int = 16,
      iters: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      codebooks: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && topC >= k)
    val books = codebooks.getOrElse(pqCodebooks(corpus, m, ksub, iters, idCol, vecCol))
    val dsub = books.select(size(col("cvec"))).head().getInt(0)
    val codes = pqEncode(corpus, books, m, dsub, idCol, vecCol)
    // per-probe ADC table as a (m·ksub + c) → d² map: one small row per
    // probe, broadcast against the streamed code list
    val pn = normalized(probes, idCol, vecCol, "pid")
    val tabs = subRows(pn, "pid", m, dsub)
      .join(broadcast(books), "m")
      .withColumn("d", l2dist2(col("sub"), col("cvec")))
      .groupBy("pid")
      .agg(map_from_entries(collect_list(
        struct((col("m") * lit(ksub) + col("c")).cast("int"), col("d")))).as("tab"))
    val scored = codes.crossJoin(broadcast(tabs))
      .filter(col("pid") =!= col("nid"))
      .withColumn("adc", aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, mi) => acc + element_at(col("tab"),
          (mi * lit(ksub) + element_at(col("codes"), mi + 1)).cast("int"))))
    val cand = graft.plans.TopK
      .perKey(scored, Seq(col("pid")), Seq(col("adc"), col("nid")), topC)
      .select("pid", "nid")
    // exact re-rank over the candidate pool (same scoring frame as the
    // brute-force baseline; probes are a small batch by contract)
    val v = withNorm(corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nvec", "nnorm")
    val p = withNorm(probes.select(col(idCol).as("pid"), col(vecCol).as("pvec")), "pvec", "pnorm")
    val exact = cand.join(v, "nid").join(broadcast(p), "pid")
      .withColumn("sim", pairSim(roundTo))
    graft.plans.TopK.perKey(exact, Seq(col("pid")), Seq(col("sim").desc, col("nid")), k)
      .select("pid", "rank", "nid", "sim")
  }

  /** Per-vector SQ8 screen state for the exact near-dup pair stage:
    * symmetric per-vector 1-byte quantization (qs = 127/max|x_i|, code_i
    * = round(x_i·qs) clamped to ±127) plus the three scalars the
    * conservative pair bound needs — qn = ‖x̂‖ (norm of the DEQUANTIZED
    * vector), en = ‖x − x̂‖ (the EXACT per-vector quantization error
    * norm, not the 0.5·√d/qs worst case — ~2× tighter in practice).
    * For any pair, Cauchy-Schwarz on dot(x,y) = dot(x̂+e_x, ŷ+e_y) gives
    *   |dot(x,y) − dot(x̂,ŷ)| ≤ qn_x·en_y + en_x·qn_y + en_x·en_y,
    * so approx + bound is a certified UPPER bound on the true dot — a
    * pair can be discarded without ever touching its float vectors.
    * All staging is linear, one pass, pure Catalyst transforms; codes
    * are `array<tinyint>` (64 B at dim 64 vs 256 B floats) scored by
    * the codegen'd [[graft.functions.VectorOps.dotTiny]] kernel. */
  private[graft] def sq8ScreenStaged(df: DataFrame, vecCol: String): DataFrame = df
    .withColumn("__mx", expr(
      s"aggregate($vecCol, CAST(0.0 AS DOUBLE), " +
        "(m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))"))
    .withColumn("__qs", lit(127.0) / col("__mx"))
    .withColumn("__cd", expr(
      s"transform($vecCol, x -> CAST(greatest(-127.0D, least(127.0D, " +
        "round(CAST(x AS DOUBLE) * __qs))) AS TINYINT))"))
    .withColumn("__qn",
      sqrt(graft.functions.VectorOps.dotTiny(col("__cd"), col("__cd"))
        .cast("double")) / col("__qs"))
    .withColumn("__en", sqrt(expr(
      s"aggregate(zip_with($vecCol, __cd, (x, c) -> " +
        "(CAST(x AS DOUBLE) - CAST(c AS DOUBLE) / __qs) * " +
        "(CAST(x AS DOUBLE) - CAST(c AS DOUBLE) / __qs)), " +
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)")))
    .drop("__mx")

  /** Within-group near-dup pairs (ia < ib, rounded cosine ≥ minSim) with
    * LSH-bucketed pair generation: candidates come from `bands`
    * independent hyperplane-bucket joins keyed on
    * (group, band, bucket) — never from an all-pairs join on the group
    * alone, whose key is low-cardinality (skewed shuffle) and whose pair
    * fan-out is O(n²/k) as group sizes grow with the corpus. Scoring is
    * exact: candidates rejoin their vectors by id and the true cosine is
    * computed per surviving pair, so every emitted pair is correct; only
    * candidacy is probabilistic.
    *
    * Recall = 1 - (1 - p^planesPerBand)^bands with p = 1 - θ/π per plane
    * (θ = acos(minSim)). Tune planesPerBand to the threshold: at a
    * production near-dup threshold (cosine ≥ 0.9, p ≈ 0.86), 8 planes per
    * band prune buckets to ~1/256 of the group while 16 bands hold the
    * miss rate at ~4e-6. At permissive thresholds (0.3, p ≈ 0.6) keep
    * planesPerBand = 1 and buy recall with bands — pruning is inherently
    * weak when "similar" is barely above random.
    *
    * `bands = 0` (the DEFAULT) is the exact all-pairs-per-group join: the
    * library default stays exact because LSH candidacy is probabilistic
    * and a caller must opt into a recall target knowingly; the scale path
    * (q37 passes bands = 12 explicitly, plan-guarded) is one argument
    * away when group sizes grow with the corpus.
    *
    * `saltFactor > 1` salts the exact bands = 0 pair join (the ia side
    * takes a deterministic id-hash bucket, the ib side replicates
    * saltFactor×, every ia < ib pair still meets exactly once) so a hot
    * group's n_c² pair generation fans across saltFactor tasks instead of
    * straggling in one — execution-only, results identical
    * (spec-asserted). Callers with a skew profile in hand
    * ([[adaptiveCellSalt]] / [[Skew.keySkewProfile]]) pass it through;
    * the LSH branch ignores it (band buckets already split hot groups). */
  def nearDupPairs(
      vectors: DataFrame,
      groupCol: String,
      minSim: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      bands: Int = 0,
      planesPerBand: Int = 1,
      saltFactor: Int = 1,
      codeScreen: Boolean = false): DataFrame = {
    require(saltFactor >= 1, s"nearDupPairs: saltFactor $saltFactor must be >= 1")
    val base = withNorm(
      vectors.select(col(groupCol).as("g"), col(idCol).as("id"), col(vecCol).as("vec")),
      "vec", "norm")
    val cand =
      if (bands == 0 && codeScreen) {
        // SQ8-screened exact pair generation (the r17 in-cell pair-work
        // remedy): the quadratic self-join carries 1-byte/dim CODES plus
        // four doubles — never the float vectors — and each pair is
        // screened by the certified upper bound approx + B ≥ threshold
        // ([[sq8ScreenStaged]]); only survivors (~the true-pass fraction
        // plus a thin margin band) reach the vector rejoin and the exact
        // cosine below, so the dominant in-cell cost scales with
        // SURVIVORS, not pairs. The screen threshold backs off by the
        // rounding half-step (+ absolute fp fuzz) so any pair whose
        // ROUNDED exact cosine could reach minSim provably survives —
        // results are bit-identical to the unscreened path
        // (SimilaritySpec equivalence + adversarial bound tests), and
        // the q234 training-replay oracle is untouched.
        val thr = minSim - 0.5 * math.pow(10.0, -roundTo) - 1e-9
        val staged = sq8ScreenStaged(base, "vec")
        val l = staged.select(col("g"), col("id").as("ia"),
          col("__cd").as("__ca"), col("__qs").as("__sa"),
          col("__qn").as("__qa"), col("__en").as("__ea"),
          col("norm").as("__na"),
          pmod(xxhash64(col("id")), lit(saltFactor.toLong)).as("__salt_a"))
        val r = staged.select(col("g").as("g2"), col("id").as("ib"),
          col("__cd").as("__cb"), col("__qs").as("__sb"),
          col("__qn").as("__qb"), col("__en").as("__eb"),
          col("norm").as("__nb"),
          explode(sequence(lit(0L), lit(saltFactor.toLong - 1))).as("__salt_b"))
        l.hint("shuffle_hash")
          .join(r, col("g") === col("g2") && col("__salt_a") === col("__salt_b") &&
            col("ia") < col("ib"))
          .filter(
            (graft.functions.VectorOps.dotTiny(col("__ca"), col("__cb"))
                .cast("double") / (col("__sa") * col("__sb")) +
              col("__qa") * col("__eb") + col("__ea") * col("__qb") +
              col("__ea") * col("__eb")) >=
              lit(thr) * col("__na") * col("__nb"))
          .select("g", "ia", "ib")
      } else if (bands == 0 && saltFactor > 1) {
        base.select(col("g"), col("id").as("ia"),
            pmod(xxhash64(col("id")), lit(saltFactor.toLong)).as("sa"))
          .hint("shuffle_hash")
          .join(base.select(col("g").as("g2"), col("id").as("ib"),
              explode(sequence(lit(0L), lit(saltFactor.toLong - 1))).as("sb")),
            col("g") === col("g2") && col("sa") === col("sb") &&
              col("ia") < col("ib"))
          .select("g", "ia", "ib")
      } else if (bands == 0) {
        base.select(col("g"), col("id").as("ia"))
          .join(base.select(col("g").as("g2"), col("id").as("ib")),
            col("g") === col("g2") && col("ia") < col("ib"))
          .select("g", "ia", "ib")
      } else {
        // bucket keys via the codegen'd kernel (weights cached per
        // partition; bit-identical to hyperplaneBucketExpr, unit-tested),
        // computed in this branch only; the rejoin sides below never
        // evaluate it
        import org.apache.spark.sql.graftglue.ColumnGlue
        val bandKeys = ColumnGlue.column(graft.expressions.HyperplaneBands(
          ColumnGlue.expression(col("vec")), bands, planesPerBand))
        val banded = base.select(col("g"), col("id"),
            posexplode(bandKeys).as(Seq("band", "bkey")))
          // same self-join discipline as Dedup: one exchange on the join
          // key below both renames (computed once, ReusedExchange on the
          // other side), shuffled join — both sides are corpus-sized
          .repartition(base.sparkSession.sparkContext.defaultParallelism,
            col("g"), col("band"), col("bkey"))
        val l = banded.select(col("g"), col("band"), col("bkey"), col("id").as("ia"))
        val r = banded.select(col("g").as("g2"), col("band").as("band2"),
          col("bkey").as("bkey2"), col("id").as("ib"))
        l.hint("shuffle_hash")
          .join(r, col("g") === col("g2") && col("band") === col("band2") &&
            col("bkey") === col("bkey2") && col("ia") < col("ib"))
          .select("g", "ia", "ib")
          // g is part of the dedup key: when groupCol is not a partition of
          // the rows (multi-bucket/exploded membership), an id pair can
          // legitimately co-occur in several groups, and the exact bands=0
          // path emits it once per group — the LSH path must match
          .dropDuplicates("g", "ia", "ib")
      }
    cand
      .join(base.select(col("id").as("ia"), col("vec").as("pvec"), col("norm").as("pnorm")), "ia")
      .join(base.select(col("id").as("ib"), col("vec").as("nvec"), col("norm").as("nnorm")), "ib")
      .withColumn("sim", pairSim(roundTo))
      .filter(col("sim") >= minSim)
      .select(col("g"), col("ia"), col("ib"), col("sim"))
  }

  /** End-to-end embedding near-dup clustering — the vector-space
    * counterpart of [[Dedup.dedupClusters]]: [[nearDupPairs]] edges →
    * connected components → (idCol, cluster_id, keep) for EVERY vector
    * (cluster_id = min id of the component, self for singletons; keep
    * marks the canonical representative). Same decision-output shape as
    * the text path, so downstream corpus filters are interchangeable.
    * The pair frame rides the same per-call persist + eager-release
    * discipline as dedupClusters: connectedComponents returns its labels
    * lineage-free, so the pair pipeline's cache is dropped before
    * returning. */
  def nearDupClusters(
      vectors: DataFrame,
      groupCol: String,
      minSim: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      bands: Int = 0,
      planesPerBand: Int = 1): DataFrame = {
    // exact path: same profile-gated protections dedupFromAssigned gets —
    // salt the group-keyed pair join when the group profile is skewed,
    // screen with SQ8 codes when the pair volume clears the measured
    // crossover (both execution-only: results bit-identical, oracles
    // untouched)
    val (sf, pairUnits) = if (bands != 0) (1, 0.0)
      else cellPairProfile(
        vectors.select(col(groupCol).as("g")).where(col("g").isNotNull), "g")
    val pairs = nearDupPairs(vectors, groupCol, minSim, idCol, vecCol,
        bands = bands, planesPerBand = planesPerBand,
        saltFactor = sf, codeScreen = pairUnits >= CodeScreenMinPairs)
      .select("ia", "ib")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // release even when connectedComponents throws (non-convergence,
    // cancelled jobs) — a failed clustering must not pin corpus-scale
    // pair blocks for the session lifetime
    val comp =
      try Dedup.connectedComponents(pairs, vectors.select(col(idCol).as("id")))
      finally pairs.unpersist()
    comp.select(col("id").as(idCol), col("comp").as("cluster_id"),
      (col("id") === col("comp")).as("keep"))
  }

  /** Per-vector cosine to its LABEL CENTROID — the embedding-space
    * outlier signal (CLIP-style filtering, mislabel pruning: a vector far
    * from its group's center is a curation candidate; thresholding /
    * percent-ranking the score is the caller's policy).
    *
    * Determinism contract: components are QUANTIZED to integers at
    * `quantDecimals` decimals (round-half-away-from-zero, the rule both
    * engines share), so every cross-row sum — centroid component sums,
    * per-vector dot and norm — is EXACT integer/decimal arithmetic with
    * no accumulation-order or decimal-tie sensitivity. Cosine is
    * invariant under positive scaling, so scoring against the
    * un-normalized quantized centroid SUM vector equals scoring against
    * the mean centroid exactly; the 1e-`quantDecimals` component
    * quantization is the operator's stated precision (q90 replays the
    * identical pipeline in SQL).
    *
    * Scale shape: posexplode is narrow (corpus × dim rows, colocated per
    * vector); the centroid aggregation exchanges only labels × dim
    * partial rows (map-side combined); the tiny centroid frame
    * broadcasts back; the per-vector aggregation collapses to one row
    * per vector map-side (a vector's components share a partition), so
    * its exchange moves n rows. Nothing corpus-sized shuffles wide. */
  def labelCentroidCos(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label",
      quantDecimals: Int = 6,
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val DEC = DecimalType(38, 0)
    val scale = math.pow(10.0, quantDecimals)
    val ex = df
      .select(col(idCol).as("id"), col(labelCol).as("lbl"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("id"), col("lbl"), col("pos"),
        round(col("v").cast(DoubleType) * scale).cast(LongType).as("vq"))
    val cent = ex.groupBy("lbl", "pos")
      .agg(sum(col("vq")).as("cq")) // exact integer centroid-sum component
    val cn = cent.groupBy("lbl")
      .agg(sum((col("cq").cast(DEC) * col("cq").cast(DEC))).as("nc2"))
    ex.join(broadcast(cent), Seq("lbl", "pos"))
      .groupBy("id", "lbl")
      .agg(
        sum(col("vq").cast(DEC) * col("cq").cast(DEC)).as("dot"),
        sum(col("vq") * col("vq")).as("nx2")) // ≤ dim·(scale·|v|)²: long-safe
      .join(broadcast(cn), "lbl")
      // withNorm's degenerate-vector drop rule, in quantized space: a
      // zero vector (or zero centroid sum) has no defined cosine — drop
      // rather than divide by zero (ANSI) or emit NaN
      .filter(col("nx2") > 0 && col("nc2") > 0)
      .select(col("id").as(idCol), col("lbl").as(labelCol),
        round(
          col("dot").cast(DoubleType) /
            (sqrt(col("nx2").cast(DoubleType)) * sqrt(col("nc2").cast(DoubleType))),
          roundTo).as("cos_centroid"))
  }

  /** Ranking recall — the standard ANN quality harness: per probe, the
    * fraction of the EXACT top-k an approximate ranking recovered
    * (recall@k = |approx ∩ exact| / |exact|). This is how an IVF/PQ/LSH
    * geometry gets tuned: sweep nProbe/topC/bands, read mean recall vs
    * the candidate volume each geometry pays. Generic over any two
    * (probe, item) rankings — retrieval eval (BM25 vs judged relevance)
    * uses the same shape. Probes absent from `approx` score 0, not NULL
    * (an empty result IS a recall failure).
    *
    * Scale shape: one (probe, item)-keyed join + two per-probe
    * map-side-combining counts — rankings are already k·probes-sized,
    * so nothing here touches the corpus. */
  def rankingRecall(
      approx: DataFrame,
      exact: DataFrame,
      probeCol: String = "pid",
      itemCol: String = "nid"): DataFrame = {
    val hits = approx.join(exact, Seq(probeCol, itemCol))
      .groupBy(probeCol).agg(count(lit(1)).as("hits"))
    exact.groupBy(probeCol).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq(probeCol), "left")
      .select(col(probeCol),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("n_exact"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / col("n_exact"), 4)
          .as("recall"))
  }

  /** Sparse-free random projection (Achlioptas, "Database-friendly random
    * projections", PODS 2001: a ±1 sign matrix satisfies the
    * Johnson–Lindenstrauss lemma — no Gaussians needed): project each
    * vector to `outDim` components proj_j = Σ_i v_i·s(i,j), s(i,j) ∈
    * {−1, +1}. The dimensionality-reduction front end for ANN at scale:
    * a 64-d corpus projected to 16-d quarters every downstream distance
    * computation while JL-preserving pairwise geometry in expectation.
    *
    * Deterministic and engine-portable end to end: components are
    * quantized to integers ([[labelCentroidCos]]'s rule — half-away-
    * from-zero on both engines), the sign matrix derives from the
    * engine-portable [[Sampling.bucket]] parity of "i:j"+salt (no RNG
    * state, any engine replays it), and the projection is then EXACT
    * integer arithmetic — q99 hash-gates the full pipeline. `salt`
    * rerolls the matrix per epoch ([[Sampling.shuffleShards]]'s reroll
    * contract).
    *
    * Scale shape: the sign matrix is dim×outDim rows (model-sized,
    * broadcast); the corpus streams once as (id, pos, component) and the
    * fan-out to outDim products collapses map-side in the (id, j) sum —
    * n·outDim rows cross the exchange, never n·dim·outDim.
    *
    * Output: (idCol, j, proj) — quantized projection components;
    * divide by the quantum (10^quantDecimals) to recover float space. */
  def randomProjection(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      outDim: Int = 16,
      salt: String = "",
      quantDecimals: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val spark = df.sparkSession
    val scale = math.pow(10.0, quantDecimals)
    val ex = df
      .select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col("id"), col("i"),
        round(col("v").cast(DoubleType) * scale).cast(LongType).as("vq"))
    // model-state-only driver traffic: one scalar (the input dimension).
    // max() over an empty frame is NULL — surface that as a clear
    // contract error instead of an opaque NPE from the primitive read.
    val dimRow = df.select(max(size(col(vecCol)))).head()
    require(!dimRow.isNullAt(0),
      s"randomProjection: input has no non-null '$vecCol' vectors (empty frame?)")
    val dim = dimRow.getInt(0)
    val signs = spark.range(dim).select(col("id").cast("int").as("i"))
      .crossJoin(spark.range(outDim).select(col("id").cast("int").as("j")))
      .select(col("i"), col("j"),
        when(Sampling.bucket(
            concat_ws(":", col("i"), col("j")), salt) % 2 === 0, lit(1L))
          .otherwise(lit(-1L)).as("s"))
    ex.join(broadcast(signs), "i")
      .groupBy("id", "j")
      .agg(sum(col("vq") * col("s")).as("proj"))
      .select(col("id").as(idCol), col("j"), col("proj"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication") — the published
    * embedding-space dedup recipe: coarse-cluster the corpus with
    * k-means, compute pairwise cosines ONLY within each cluster, connect
    * pairs above `minSim` into duplicate groups, and keep ONE member per
    * group — the member with the LOWEST cosine to its cluster centroid
    * (the paper's keep-the-most-atypical rule; dropping the prototypical
    * copies preserves diversity), ties broken by lowest id.
    *
    * This is the cluster-scoped member of the vector-dedup family:
    * [[nearDupPairs]] scopes candidacy by a GIVEN group column,
    * [[semanticDedup]] LEARNS the scoping from the geometry, which is
    * what makes the method corpus-global without an all-pairs join.
    *
    * `quantizer`: (cid, cvec) centroids — pass [[kMeansCentroids]]'s
    * trained model for production geometry. Default (null) uses the
    * first `nCentroids` valid vectors by id as raw seed centroids (the
    * [[topKIvf]] deterministic-init contract), which keeps the whole
    * operator exactly SQL-replayable (q149). Cosine is scale-invariant,
    * so raw seeds score identically to their normalized form.
    *
    * Scale shape: the corpus is scored against the broadcast model-sized
    * centroid frame once (n×k dots, collapsed to one row per vector by a
    * map-side max_by); the within-cell pair join is bounded by cell
    * geometry — with k grown ~n/⟨cell⟩ the candidate volume stays
    * n·⟨cell⟩, never n²; huge cells can additionally opt into the LSH
    * band path (`bands`). Components come from the size-gated union-find
    * / distributed-fixpoint hybrid; survivor selection is one
    * cluster-keyed min-struct aggregation with map-side combining. The
    * assigned frame persists DISK_ONLY because it feeds the pair
    * pipeline, the node list, and the output.
    *
    * Output: (idCol, cell, cluster_id, cent_sim, keep) for every valid
    * vector — cluster_id = min id of the duplicate component (self for
    * singletons), keep marks the survivor. Zero-/NaN-norm vectors are
    * dropped (the documented contract of every similarity entry point).
    */
  /** Shared k-means-cell assignment for the semantic family
    * ([[semanticDedup]], [[semanticExportOrder]]): every valid vector
    * scored once against the broadcast centroid frame (default =
    * deterministic first-k raw seeds, the [[topKIvf]] init contract; or
    * a trained [[kMeansCentroids]] model), collapsed map-side by the
    * (csim, −cid) argmax so the shuffle moves one row per vector.
    * Returns (id, cell, cent_sim, vec). */
  private def cellAssign(
      vectors: DataFrame,
      nCentroids: Int,
      quantizer: DataFrame,
      idCol: String,
      vecCol: String,
      roundTo: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val base = withNorm(
      vectors.select(col(idCol).as("id"), col(vecCol).as("vec")), "vec", "norm")
    val cents0 = Option(quantizer).getOrElse(
      base.orderBy(col("id")).limit(nCentroids)
        .select(col("id").cast(LongType).as("cid"), col("vec").as("cvec")))
    val cents = withNorm(cents0.select(col("cid"), col("cvec")), "cvec", "cnorm")
    base.join(broadcast(cents), lit(true))
      .withColumn("csim",
        round(VectorOps.dot(col("vec"), col("cvec")) / (col("norm") * col("cnorm")),
          roundTo))
      .groupBy("id")
      .agg(
        max(struct(col("csim").as("s"), negate(col("cid")).as("nc"))).as("m"),
        any_value(col("vec")).as("vec"))
      .select(col("id"), negate(col("m.nc")).cast(LongType).as("cell"),
        col("m.s").as("cent_sim"), col("vec"))
  }

  /** Semantic export ordering — the In-Context Pretraining layout (Shi
    * et al. 2023, "In-Context Pretraining: Language Modeling Beyond
    * Document Boundaries"): write the corpus so semantically-similar
    * documents are ADJACENT, giving long-context training windows
    * coherent neighbor documents instead of random ones. Order =
    * (cell, cent_sim desc, id): documents group by their k-means cell
    * and, within a cell, march from the most prototypical outward — a
    * deterministic, SQL-replayable approximation of the paper's
    * similarity-traveling-path that needs only the [[semanticDedup]]
    * assignment machinery plus ONE global contiguous numbering
    * ([[Packing.withGlobalOffset]]'s two-pass form — no single-task
    * window). Output: (idCol, cell, cent_sim, export_pos) with
    * export_pos a gap-free 0-based position; feed it to
    * [[Sampling.shuffleShards]]-style writers as the sort key.
    * Zero-/NaN-norm vectors are dropped (the similarity-family
    * contract) — filter them back in wherever the corpus policy puts
    * undirectioned documents. */
  def semanticExportOrder(
      vectors: DataFrame,
      nCentroids: Int,
      quantizer: DataFrame = null,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4): DataFrame = {
    require(nCentroids >= 1, "semanticExportOrder: nCentroids must be >= 1")
    val assigned = cellAssign(vectors, nCentroids, quantizer, idCol, vecCol, roundTo)
      .select(col("id"), col("cell"), col("cent_sim"),
        negate(col("cent_sim")).as("__negSim"), lit(1L).as("__one"))
    Packing.withGlobalOffset(assigned, Seq("cell", "__negSim", "id"), "__one", "export_pos")
      .select(col("id").as(idCol), col("cell"), col("cent_sim"), col("export_pos"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings" — the
    * CCMatrix/WikiMatrix miner): a candidate pair (x, y) scores by its
    * cosine RELATIVE to each side's neighborhood density,
    *   margin(x,y) = cos(x,y) / ((avgNNk(x) + avgNNk(y)) / 2),
    * which cancels the hubness that makes raw-cosine thresholds
    * incomparable across regions of embedding space. Pairs are kept when
    * they are MUTUAL best matches under the margin and clear
    * `minMargin` — the published mining criterion.
    *
    * Determinism: cosines round to `roundTo` before anything consumes
    * them; each side's k-NN denominator is an EXACT decimal sum of
    * those rounded values (no float-summation-order dependence); the
    * final margin is one double division of exact operands, rounded —
    * the whole pipeline replays in SQL (q170).
    *
    * Scale shape: this entry point is the BRUTE-FORCE mining geometry
    * (broadcast probes × streamed corpus, the q36/q50 documented
    * class) — right for eval sets and fixture gates; production mining
    * swaps the two k-NN calls for [[topKIvf]] over a trained quantizer
    * (the q50 path) and keeps everything downstream of the neighbor
    * frames unchanged. Output: (src_id, tgt_id, cos, margin), mutual
    * best only, margin ≥ minMargin. */
  def marginBitextPairs(
      src: DataFrame,
      tgt: DataFrame,
      k: Int,
      minMargin: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4): DataFrame = {
    require(k >= 1, s"marginBitextPairs: k $k must be >= 1")
    marginFromNeighbors(
      topKBruteForce(tgt, src, k, idCol, vecCol, roundTo),
      topKBruteForce(src, tgt, k, idCol, vecCol, roundTo),
      minMargin, roundTo)
  }

  /** [[marginBitextPairs]] from PRECOMPUTED neighbor frames — the
    * production entry point: hand it [[topKIvf]] output (or any frame
    * shaped (pid, nid, sim) with sims already rounded) for each
    * direction and the margin/mutual-best layers run unchanged. The
    * brute-force wrapper above is this function over [[topKBruteForce]]
    * frames. */
  def marginFromNeighbors(
      fwd: DataFrame,
      bwd: DataFrame,
      minMargin: Double,
      roundTo: Int = 4): DataFrame = {
    require(minMargin > 0, s"marginFromNeighbors: minMargin $minMargin must be > 0")
    import org.apache.spark.sql.types.DecimalType
    val simD = col("sim").cast(DecimalType(20, roundTo))
    // exact decimal neighborhood sums; count rides along because a side
    // with fewer than k neighbors (tiny corpora) must average over what
    // it has, not k
    val dx = fwd.groupBy(col("pid").as("sid"))
      .agg(sum(simD).as("sx"), count(lit(1)).as("nx"))
    val dy = bwd.groupBy(col("pid").as("tid"))
      .agg(sum(simD).as("sy"), count(lit(1)).as("ny"))
    val scored = fwd.select(col("pid").as("sid"), col("nid").as("tid"), col("sim"))
      .join(dx, "sid").join(dy, "tid")
      .withColumn("margin", round(
        col("sim") / ((col("sx").cast("double") / col("nx") +
          col("sy").cast("double") / col("ny")) / 2), roundTo))
    val bestFwd = graft.plans.TopK.perKey(
      scored, Seq(col("sid")), Seq(col("margin").desc, col("tid")), 1)
    val bestBwd = graft.plans.TopK.perKey(
      scored, Seq(col("tid")), Seq(col("margin").desc, col("sid")), 1)
    bestFwd.select(col("sid"), col("tid"), col("sim"), col("margin"))
      .join(bestBwd.select(col("sid"), col("tid")), Seq("sid", "tid"))
      .where(col("margin") >= minMargin)
      .select(col("sid").as("src_id"), col("tid").as("tgt_id"),
        col("sim").as("cos"), col("margin"))
  }

  /** The count-conditional centroid rule for [[semanticDedup]]:
    * `max(minCentroids, n / targetCell)` — the L85 "grow k ~ n/⟨cell⟩"
    * contract made executable, so within-cell pair volume stays
    * ~n·targetCell as the corpus grows instead of n²/k (the r15 study's
    * q149 finding: a pinned k=8 at 100× data spilled past the disk —
    * cells 100× bigger, pair volume 10,000×). A pure integer function
    * of the corpus count, so a SQL oracle replays it verbatim as
    * `GREATEST(minCentroids, COUNT(*) // targetCell)` (the
    * [[Sampling.scaledBuckets]] pattern). */
  def scaledCentroids(n: Long, minCentroids: Int = 8, targetCell: Int = 1024): Int = {
    require(n >= 0L && minCentroids >= 1 && targetCell >= 1,
      s"scaledCentroids(n=$n, minCentroids=$minCentroids, targetCell=$targetCell)")
    math.min(Int.MaxValue.toLong, math.max(minCentroids.toLong, n / targetCell)).toInt
  }

  /** [[semanticDedup]] with `nCentroids` derived by [[scaledCentroids]]
    * from a cheap corpus count (parquet row-count metadata — no full
    * scan): the production entry point; the fixed-`nCentroids` overload
    * remains for callers pinning geometry across snapshots of known
    * size or passing a trained quantizer. */
  def semanticDedupAuto(
      vectors: DataFrame,
      minSim: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      bands: Int = 0,
      planesPerBand: Int = 1,
      minCentroids: Int = 8,
      targetCell: Int = 1024): DataFrame =
    semanticDedup(vectors,
      scaledCentroids(vectors.count(), minCentroids, targetCell),
      minSim, quantizer = null, idCol = idCol, vecCol = vecCol,
      roundTo = roundTo, bands = bands, planesPerBand = planesPerBand)

  def semanticDedup(
      vectors: DataFrame,
      nCentroids: Int,
      minSim: Double,
      quantizer: DataFrame = null,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      bands: Int = 0,
      planesPerBand: Int = 1): DataFrame = {
    require(nCentroids >= 1, "semanticDedup: nCentroids must be >= 1")
    dedupFromAssigned(
      cellAssign(vectors, nCentroids, quantizer, idCol, vecCol, roundTo),
      minSim, idCol, roundTo, bands, planesPerBand)
  }

  /** The SemDeDup tail shared by [[semanticDedup]] (flat assignment) and
    * [[semanticDedupTrained]] (two-level trained assignment): within-cell
    * pair generation → threshold edges → connected components → keep the
    * least-prototypical member. `assigned0` is (id, cell, cent_sim, vec). */
  private def dedupFromAssigned(
      assigned0: DataFrame,
      minSim: Double,
      idCol: String,
      roundTo: Int,
      bands: Int,
      planesPerBand: Int): DataFrame = {
    val assigned = assigned0
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // BOTH per-call caches are released before return — on every exit
    // path (the nearDupClusters discipline): the output is eagerly
    // materialized lineage-free below, so nothing downstream references
    // the assignment or pair pipelines, and repeated semanticDedup calls
    // cannot accumulate corpus-scale session disk blocks. (The returned
    // frame's own checkpoint blocks are ContextCleaner-released when the
    // caller drops the reference — the connectedComponents label
    // contract.)
    try {
      // exact path only: salt the within-cell pair join when the cell
      // occupancy profile is skewed (natural clusters are — the r16 100×
      // adjudication's residual); the LSH branch splits hot cells by
      // band bucket already
      val (sf, pairUnits) = if (bands != 0) (1, 0.0)
        else cellPairProfile(assigned.select(col("cell")), "cell")
      val pairs = nearDupPairs(assigned.select(col("cell"), col("id"), col("vec")),
          groupCol = "cell", minSim = minSim, idCol = "id", vecCol = "vec",
          roundTo = roundTo, bands = bands, planesPerBand = planesPerBand,
          saltFactor = sf, codeScreen = pairUnits >= CodeScreenMinPairs)
        .select("ia", "ib")
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val comp =
        try Dedup.connectedComponents(pairs, assigned.select(col("id")))
        finally pairs.unpersist()
      val lab = assigned.join(comp, "id")
      val surv = lab.groupBy(col("comp"))
        .agg(min(struct(col("cent_sim"), col("id"))).as("sm"))
        .select(col("comp"), col("sm.id").as("surv_id"))
      lab.join(surv, "comp")
        .select(col("id").as(idCol), col("cell"), col("comp").as("cluster_id"),
          col("cent_sim"), (col("id") === col("surv_id")).as("keep"))
        .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    } finally assigned.unpersist()
  }

  /** Within-class semantic diversity WITHOUT pair enumeration — the
    * sum-vector identity: over unit vectors,
    *   Σ_{i≠j} v̂ᵢ·v̂ⱼ = ‖Σᵢ v̂ᵢ‖² − Σᵢ‖v̂ᵢ‖²,
    * so the mean pairwise cosine of a class needs only its per-dimension
    * component sums — O(n·dim) and ONE aggregation where the naive form
    * is O(n²·dim) pairs. The curation read: a class (cluster, source,
    * dedup bucket) with mean pairwise cosine near 1 is semantically
    * collapsed (near-dup mass, a SemDeDup candidate); near 0, diverse.
    *
    * Determinism (the q90 quantized-space discipline): vectors L2-
    * normalize in double (staged norm — the lambda-CSE rule), each unit
    * component quantizes to `round(v̂_d·10^q)` integers, and EVERY sum
    * thereafter is exact integer/decimal arithmetic — the metric is
    * DEFINED on the quantized unit vectors (error ≤ dim·10⁻ᑫ per pair),
    * one fixed-order double division at the end. Zero/NaN-norm vectors
    * drop ([[withNorm]]'s contract); singleton classes surface with NULL
    * cosine (no pair evidence), never a fabricated 0.
    *
    * Scale shape: one posexplode over staged unit vectors; the
    * (label, dim) sums and per-vector self-dots both collapse map-side;
    * downstream frames are labels×dim and labels-sized. No pair join
    * anywhere. */
  def classDiversity(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label",
      quantDecimals: Int = 6,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val DEC = DecimalType(38, 0)
    val scale = math.pow(10.0, quantDecimals)
    val staged = withNorm(
      df.select(col(idCol).as("id"), col(labelCol).as("lbl"),
        col(vecCol).as("v_")), "v_", "n_")
      .select(col("id"), col("lbl"),
        transform(col("v_"), x => x.cast(DoubleType) / col("n_")).as("vn"))
    val ex = staged
      .select(col("id"), col("lbl"), posexplode(col("vn")).as(Seq("pos", "v")))
      .select(col("id"), col("lbl"), col("pos"),
        round(col("v") * scale).cast(LongType).as("vq"))
    // per-vector self-dot: ≤ dim·10^2q — long-safe at any real dim/q
    val perVec = ex.groupBy("lbl", "id")
      .agg(sum(col("vq") * col("vq")).as("sq"))
    val sums = ex.groupBy("lbl", "pos").agg(sum(col("vq")).as("sd"))
    val s2 = sums.groupBy("lbl")
      .agg(sum(col("sd").cast(DEC) * col("sd").cast(DEC)).as("s2"))
    val pv = perVec.groupBy("lbl")
      .agg(count(lit(1)).as("n_vecs"), sum(col("sq").cast(DEC)).as("qsum"))
    pv.join(s2, "lbl")
      .select(col("lbl").as(labelCol), col("n_vecs"),
        when(col("n_vecs") > 1,
          round(
            (col("s2") - col("qsum")).cast(DoubleType) / lit(scale * scale) /
              (col("n_vecs") * (col("n_vecs") - 1)).cast(DoubleType),
            roundTo)).as("mean_pairwise_cos"))
  }

  /** Scalar int8 quantization audit (the faiss-SQ8 / llama.cpp-Q8 storage
    * decision priced BEFORE a 100 TB reindex commits to it): quantize each
    * vector to symmetric int8 codes (per-vector max-abs scale, the SQ
    * standard), and report per group how much geometry the 4× footprint
    * cut costs — mean/min cosine between original and dequantized vector
    * and mean/max relative L2 reconstruction error.
    *
    * Exactness (the q90 discipline, pushed one level further): components
    * quantize to integer units vq = round(x·10^q); the int8 code is
    * c = sign(vq)·⌊(254·|vq| + amax) / (2·amax)⌋ — integer round-half-
    * away-from-zero of |vq|·127/amax, exact in any engine (the numerator
    * is non-negative, so floor-div equals the truncating div Spark and
    * DuckDB share). The dequantization scale amax/127 CANCELS in the
    * cosine — cos(x, deq) = Σvq·c / (‖vq‖·‖c‖) — and factors out of the
    * L2 error — err_i = vq_i·127 − c_i·amax, rel = √Σerr²/(127·‖vq‖) —
    * so every sufficient statistic is an exact int64 sum and both engines
    * agree bit-for-bit before the one fixed-order double combination.
    *
    * Scale shape: all per-vector math runs as higher-order functions
    * INSIDE the row — no explode, no per-component shuffle; the only
    * exchange is the final group aggregation (exact-decimal means of
    * per-vector metrics rounded to `roundTo`). Zero vectors (amax = 0)
    * carry no geometry to preserve and are dropped, matching the
    * [[withNorm]] contract.
    *
    * Magnitude contract: dim·10^(2q) must fit int64 — generous at any
    * real dim for the default q = 6 (‖x‖∞ ≤ ~10³ at dim ≤ 10⁴).
    *
    * Output: (labelCol, n_vecs, avg_cos, min_cos, avg_rel_err,
    * max_rel_err), rounded to `roundTo`. */
  def sq8Audit(
      df: DataFrame,
      vecCol: String = "embedding",
      labelCol: String = "label",
      quantDecimals: Int = 6,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val scale = math.pow(10.0, quantDecimals)
    val vq = transform(col(vecCol),
      x => round(x.cast(DoubleType) * scale).cast(LongType))
    val staged = df
      .select(col(labelCol).as("lbl"), vq.as("vq"))
      .withColumn("amax",
        array_max(transform(col("vq"), x => abs(x))))
      .where(col("amax") > 0L)
      // ⌊N/D⌋ via double division + floor: N ≤ 255·amax and D = 2·amax
      // are exact in double, and the nearest representable quotient to
      // N/D sits 1/D ≥ 10⁻⁸ from the next integer — orders of magnitude
      // beyond a correctly-rounded division's half-ulp (~10⁻¹⁴ at 127),
      // so the floor cannot be bridged (the magnitude contract above)
      .withColumn("c", transform(col("vq"), x =>
        signum(x).cast(LongType) *
          floor((lit(254L) * abs(x) + col("amax")).cast(DoubleType) /
            (lit(2L) * col("amax")).cast(DoubleType)).cast(LongType)))
    val sums = staged.select(col("lbl"),
      aggregate(zip_with(col("vq"), col("c"), (a, b) => a * b),
        lit(0L), (s, v) => s + v).as("dot"),
      aggregate(col("vq"), lit(0L), (s, v) => s + v * v).as("nx2"),
      aggregate(col("c"), lit(0L), (s, v) => s + v * v).as("nc2"),
      aggregate(zip_with(col("vq"), col("c"),
          (a, b) => a * lit(127L) - b * col("amax")),
        lit(0L), (s, v) => s + v * v).as("sse"))
    val perVec = sums.select(col("lbl"),
      round(col("dot").cast(DoubleType) /
        (sqrt(col("nx2").cast(DoubleType)) * sqrt(col("nc2").cast(DoubleType))),
        roundTo).as("cosv"),
      round(sqrt(col("sse").cast(DoubleType)) /
        (lit(127.0) * sqrt(col("nx2").cast(DoubleType))), roundTo).as("relv"))
    val D = DecimalType(30, 6)
    perVec.groupBy("lbl").agg(
        count(lit(1)).as("n_vecs"),
        round(sum(col("cosv").cast(D)).cast(DoubleType) / count(lit(1)),
          roundTo).as("avg_cos"),
        min(col("cosv")).as("min_cos"),
        round(sum(col("relv").cast(D)).cast(DoubleType) / count(lit(1)),
          roundTo).as("avg_rel_err"),
        max(col("relv")).as("max_rel_err"))
      .withColumnRenamed("lbl", labelCol)
  }

  /** Greedy k-center selection (Gonzalez 1985; the 2-approximation to
    * the NP-hard k-center objective) — the coverage-maximizing diverse
    * subset: each round picks the point FARTHEST from everything chosen
    * so far. The data-selection counterpart of [[semanticDedup]]:
    * SemDeDup removes redundancy, k-center picks the spanning exemplars
    * (eval-set seeding, annotation budgets, coreset starts).
    *
    * Determinism & exactness: distances are exact int64 squared-L2 over
    * q90-quantized components; seed = MIN id; each round's argmax ties
    * break (dist DESC, id ASC). The picked_dist column is the COVERAGE
    * RADIUS sequence (non-increasing) — the stopping diagnostic.
    *
    * Scale shape: the BPE/L24 loop discipline — k rounds, each ONE
    * corpus-frame pass against the current pick's vector (a dim-sized
    * literal, closure-shipped), one TakeOrdered(1) argmax, one 1-row
    * collect; the running min-distance frame is (id, long) — persisted
    * and lineage-truncated per round. Driver state = k vectors.
    *
    * [[kCenterSqlCtes]] GENERATES the DuckDB replay from the same loop
    * structure — one source of truth, the two engines cannot drift.
    *
    * Output: (rank, vec_id, picked_dist) — picked_dist NULL for the
    * seed, else the exact quantized squared distance at pick time. */
  def kCenterSelect(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      quantDecimals: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    require(k >= 2 && k <= 64, s"k $k outside [2, 64]")
    val spark = df.sparkSession
    val scale = math.pow(10.0, quantDecimals)
    val staged = df
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast(LongType).as("id"),
        transform(col(vecCol), x =>
          round(x.cast(DoubleType) * scale).cast(LongType)).as("vq"))
      .persist()
    try {
      val seedId = staged.agg(min(col("id"))).collect().head.getLong(0)
      def vecOf(id: Long): Seq[Long] = staged.where(col("id") === id)
        .select(col("vq")).collect().head.getSeq[Long](0)
      var picks = Vector((seedId, Option.empty[Long]))
      var md: DataFrame = null
      for (_ <- 2 to k) {
        val c = vecOf(picks.last._1)
        val dist = aggregate(
          zip_with(col("vq"), typedLit(c), (a, b) => (a - b) * (a - b)),
          lit(0L), (s, v) => s + v)
        val next = (if (md == null) staged.select(col("id"), dist.as("md"))
          else md.join(staged, "id")
            .select(col("id"), least(col("md"), dist).as("md")))
          .persist()
        if (md != null) md.unpersist()
        md = next
        val top = md.where(col("md") > 0)
          .orderBy(col("md").desc, col("id")).limit(1).collect()
        if (top.isEmpty)
          throw new IllegalStateException(
            "k-center: every remaining point duplicates a chosen center")
        picks :+= ((top.head.getLong(0), Some(top.head.getLong(1))))
      }
      if (md != null) md.unpersist()
      import spark.implicits._
      picks.zipWithIndex
        .map { case ((id, d), i) => (i + 1L, id, d) }
        .toDF("rank", "vec_id", "picked_dist")
    } finally staged.unpersist()
  }

  /** The DuckDB replay of [[kCenterSelect]], generated from the same
    * round structure (the hilbertSqlCtes one-source-of-truth rule).
    * `table` must expose (vec_id, embedding). */
  def kCenterSqlCtes(table: String, k: Int, quantDecimals: Int = 6): String = {
    require(k >= 2 && k <= 64, s"k $k outside [2, 64]")
    val scale = "1" + ("0" * quantDecimals)
    val rounds = (2 to k).map { r =>
      val prevPick = s"s${r - 1}"
      val prevMin = if (r == 2) "" else s"m${r - 2}"
      val dCte =
        s"""c${r - 1} AS (SELECT pos, vq FROM ex
           |  WHERE vec_id = (SELECT id FROM $prevPick)),
           |d${r - 1} AS (SELECT ex.vec_id,
           |    CAST(SUM((ex.vq - c${r - 1}.vq) * (ex.vq - c${r - 1}.vq))
           |      AS BIGINT) AS dist
           |  FROM ex JOIN c${r - 1} USING (pos) GROUP BY 1)""".stripMargin
      val mCte = if (r == 2)
        s"m1 AS (SELECT vec_id, dist AS md FROM d1)"
      else
        s"""m${r - 1} AS (SELECT $prevMin.vec_id,
           |    LEAST($prevMin.md, d${r - 1}.dist) AS md
           |  FROM $prevMin JOIN d${r - 1} USING (vec_id))""".stripMargin
      val sCte =
        s"""s$r AS (SELECT vec_id AS id, md FROM m${r - 1}
           |  WHERE md > 0 ORDER BY md DESC, vec_id LIMIT 1)""".stripMargin
      s"$dCte,\n$mCte,\n$sCte"
    }
    val finalRows = (2 to k).map(r =>
      s"UNION ALL SELECT ${r}, id, md FROM s$r").mkString("\n")
    s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |    FROM $table
       |    WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
       |  ex AS (SELECT vec_id, i AS pos,
       |      CAST(ROUND(e[i] * $scale) AS BIGINT) AS vq
       |    FROM (SELECT vec_id, e,
       |      unnest(generate_series(1, len(e))) AS i FROM v0)),
       |  s1 AS (SELECT MIN(vec_id) AS id FROM ex),
       |  ${rounds.mkString(",\n")}
       |SELECT CAST(1 AS BIGINT) AS rank, (SELECT id FROM s1) AS vec_id,
       |  CAST(NULL AS BIGINT) AS picked_dist
       |$finalRows
       |ORDER BY rank""".stripMargin
  }

  // ───────────────────────────────────────────────────────────────────
  // Trained-quantizer IVF (the r15 scale residual): portable k-means
  // training + two-level (coarse→fine) assignment. The flat auto path
  // (knnGraphAuto / semanticDedupAuto) derives k ~ n/1024 to bound cell
  // sizes, which leaves an n·k = n²/1024 assignment term; the trained
  // path trains Lloyd's on a model-sized sample (train ONCE, persist as
  // parquet model state, reuse) and routes vectors coarse-first —
  // assignment drops to n·(√k + k/√k) = 2n√k, the IMI-style two-level
  // structure (Babenko & Lempitsky 2012), while cells stay ~targetCell
  // so candidate volume is still linear.
  // ───────────────────────────────────────────────────────────────────

  /** PORTABLE spherical k-means trainer — [[kMeansCentroids]] re-derived
    * under the exact-integer discipline (the q230 PCA scatter rule) so a
    * SQL oracle replays TRAINING itself, not just assignment:
    *
    *  - vectors quantize to a 10⁻⁶ grid (`xq = round(x·10⁶)`, exact in
    *    both engines — each float widens exactly, one correctly-rounded
    *    multiply, one round);
    *  - every dot/norm in the E-step is an EXACT integer (Σxq·cq and
    *    Σxq² stay < 2⁵³, so even a double-typed engine sums them
    *    exactly in any order — zero fold-order dependence); the routing
    *    cosine is integer/(√int·√int) rounded to `routeRoundTo`;
    *  - the M-step mean runs on 10⁻⁹-grid unit components
    *    (`uq = round(x/√n2·10⁹)`): integer sums, one double division
    *    chain, re-quantized to the 10⁻⁶ centroid grid.
    *
    * Training runs on a deterministic model-sized sample (first
    * `k·sampleFactor` valid vectors by id — ORDER BY id LIMIT, the
    * portable sample rule), so train cost is ~k²·sampleFactor·iters
    * dots, independent of corpus size: the train-ONCE piece of the
    * trained-quantizer contract. Returns (cid, cq, c2): integer
    * micro-scale centroid vectors (array<long>) + exact squared norms —
    * cosine is scale-invariant, so micro-scale centroids score
    * identically to unit ones. Cells that collapse to the zero vector
    * drop (the [[kMeansCentroids]] degeneracy rule). Persist with
    * `df.write.parquet(path)` as model state; [[knnGraphTrained]] /
    * [[semanticDedupTrained]] accept the reloaded frame. */
  def kMeansCentroidsPortable(
      corpus: DataFrame,
      k: Int,
      iters: Int = 2,
      sampleFactor: Int = 32,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      routeRoundTo: Int = 6): DataFrame = {
    require(k >= 1 && iters >= 0 && sampleFactor >= 1,
      s"kMeansCentroidsPortable(k=$k, iters=$iters, sampleFactor=$sampleFactor)")
    // raw validity first (the NaN-greatest trap — see kMeansCentroids),
    // then quantized validity: a tiny-but-nonzero vector that rounds to
    // the zero grid point has no quantized direction and drops too
    val raw = corpus
      .filter(!isnan(VectorOps.l2Norm(col(vecCol))) && VectorOps.l2Norm(col(vecCol)) > 0)
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol),
          x => round(x.cast("double") * lit(1000000.0)).cast("long")).as("xq"))
      .withColumn("n2", VectorOps.dotLong(col("xq"), col("xq")))
      .filter(col("n2") > 0L)
    val samp = raw.orderBy("id").limit(k * sampleFactor)
      // read once per Lloyd iteration (the kMeansCentroids persist rule)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // seed = first k valid vectors by id — a PREFIX of the persisted
    // sample (k ≤ k·sampleFactor), so derive it from `samp` instead of
    // re-scanning and re-sorting the raw corpus (r19 optimization round:
    // one fewer corpus scan+sort per training, identical rows)
    var cents = samp.orderBy("id").limit(k)
      .select(col("id").as("cid"), col("xq").as("cq"), col("n2").as("c2"))
    for (_ <- 0 until iters) {
      // E-step: integer-exact cosine, rounded for portable ties; the
      // (csim, −cid) max reproduces ROW_NUMBER (csim DESC, cid) exactly
      val scored = samp.join(broadcast(cents), lit(true))
        .withColumn("csim", round(
          VectorOps.dotLong(col("xq"), col("cq")).cast("double") /
            (sqrt(col("n2").cast("double")) * sqrt(col("c2").cast("double"))),
          routeRoundTo))
      val asg = scored.groupBy("id")
        .agg(
          max(struct(col("csim").as("s"), negate(col("cid")).as("nc"))).as("m"),
          any_value(col("xq")).as("xq"), any_value(col("n2")).as("n2"))
        .select(col("id"), negate(col("m.nc")).as("cell"), col("xq"), col("n2"))
      // M-step on the 10⁻⁹ unit grid: integer sums (exact, ≤ n·10⁹ ≪ 2⁵³
      // even as HUGEINT/double in a replaying engine), one double
      // division chain, re-quantized to the 10⁻⁶ centroid grid
      val dims = asg
        .select(col("cell"), col("n2"), posexplode(col("xq")).as(Seq("pos", "x")))
        .withColumn("uq", round(
          col("x").cast("double") / sqrt(col("n2").cast("double")) * lit(1.0e9))
          .cast("long"))
        .groupBy("cell", "pos")
        .agg(sum(col("uq")).as("su"), count(lit(1)).as("cnt"))
        .withColumn("m", round(
          col("su").cast("double") / col("cnt") / lit(1000.0)).cast("long"))
      cents = dims.groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cid"),
          transform(col("pm"), s => s.getField("m")).as("cq"))
        .withColumn("c2", VectorOps.dotLong(col("cq"), col("cq")))
        .filter(col("c2") > 0L)
    }
    // eager model-sized materialization so the sample cache can release
    // on every path (the semanticDedup localCheckpoint discipline)
    val out = cents.localCheckpoint(true)
    samp.unpersist()
    out
  }

  /** Two-level (coarse→fine) cell routing shared by [[knnGraphTrained]]
    * and [[semanticDedupTrained]]: coarse anchors = first ⌈√k⌉ trained
    * centroids by cid; each centroid maps to its nearest coarse anchor
    * (integer-exact rounded cosine); each vector routes to its coarse
    * group (n·√k dots), then ranks ONLY that group's centroids
    * (n·k/√k dots avg) — assignment 2n·√k instead of the flat n·k.
    * The recall trade vs flat assignment: a vector whose true nearest
    * centroid lives in another coarse group routes to its within-group
    * best instead — the documented IMI approximation (raise nProbe, or
    * fall back to flat [[topKIvf]], where that matters).
    * Returns (side: nid/nvec/nnorm persisted, ranked: nid/cid/csim/crank
    * ≤ max(nProbe,1) persisted) — both released by the session cache
    * clear (the jaccardPairs contract). */
  private def twoLevelRanked(
      corpus: DataFrame,
      quantizer: DataFrame,
      nProbe: Int,
      idCol: String,
      vecCol: String,
      routeRoundTo: Int): (DataFrame, DataFrame) = {
    val kq = quantizer.count()
    require(kq >= 1, "twoLevelRanked: empty quantizer")
    val g = math.ceil(math.sqrt(kq.toDouble)).toInt
    val cents = quantizer.select(
      col("cid").cast("long").as("cid"), col("cq"), col("c2"))
    val coarse = cents.orderBy("cid").limit(g)
      .select(col("cid").as("gid"), col("cq").as("gq"), col("c2").as("g2"))
    // centroid → coarse group: model×model, integer-exact rounded cosine
    val centGrp = cents.join(broadcast(coarse), lit(true))
      .withColumn("gsim", round(
        VectorOps.dotLong(col("cq"), col("gq")).cast("double") /
          (sqrt(col("c2").cast("double")) * sqrt(col("g2").cast("double"))),
        routeRoundTo))
      .groupBy("cid")
      .agg(
        max(struct(col("gsim").as("s"), negate(col("gid")).as("ng"))).as("m"),
        any_value(col("cq")).as("cq"), any_value(col("c2")).as("c2"))
      .select(col("cid"), negate(col("m.ng")).as("cgrp"),
        // micro-scale integer centroids cast to float EXACTLY (|cq| ≤
        // ~10⁷ < 2²⁴), so the float-dot kernel sees the same operands a
        // DOUBLE[] replay does
        col("cq").cast("array<float>").as("cqf"), col("c2"))
    val side = withNorm(
        corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nvec", "nnorm")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val coarseF = coarse
      .withColumn("gqf", col("gq").cast("array<float>"))
      .select(col("gid"), col("gqf"), col("g2"))
    // vector → coarse group (n·√k dots, map-side argmax)
    val vGrp = side.join(broadcast(coarseF), lit(true))
      .withColumn("gsim", round(
        VectorOps.dot(col("nvec"), col("gqf")) /
          (col("nnorm") * sqrt(col("g2").cast("double"))), routeRoundTo))
      .groupBy("nid")
      .agg(max(struct(col("gsim").as("s"), negate(col("gid")).as("ng"))).as("m"))
      .select(col("nid"), negate(col("m.ng")).as("grp"))
    // vector → fine rank within its coarse group: the grp-keyed
    // broadcast-hash join fans each vector out to ~k/√k centroids, not k
    val wR = Window.partitionBy("nid").orderBy(col("csim").desc, col("cid"))
    val ranked = side.join(vGrp, "nid")
      .join(broadcast(centGrp), col("grp") === col("cgrp"))
      .withColumn("csim", round(
        VectorOps.dot(col("nvec"), col("cqf")) /
          (col("nnorm") * sqrt(col("c2").cast("double"))), routeRoundTo))
      .select(col("nid"), col("cid"), col("csim"))
      .withColumn("crank", row_number().over(wR))
      .filter(col("crank") <= math.max(nProbe, 1))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    (side, ranked)
  }

  /** Adaptive salt factor for a cell-keyed SELF-join over TRAINED cells
    * (natural clusters are uneven, so the hottest cell's n_c² pair task
    * dominates the wall — the r16 100× adjudication's named residual).
    * A self-join's per-cell work is QUADRATIC in occupancy, so this is
    * [[Skew.keySkewProfile]]'s leveling rule transposed to pair units:
    * salt = ⌈max(occ²)·targetTasks / Σocc²⌉ — the smallest fan-out that
    * caps the hottest cell's pair block at one fair share of the total
    * pair work (the row-share rule under-salts here: a cell with 6.5×
    * the average rows carries 42× the average pairs). Capped at 16
    * because the salted join replicates the vector-carrying side
    * saltFactor× through the exchange. Execution-only: any salt yields
    * identical results (SkewSpec / SimilaritySpec equivalence tests), so
    * NOTHING here needs an oracle replay. The profile is one map-side
    * combined aggregation over the model-thin (cell) projection and the
    * collect is its single summary row — driver state is 1 row by
    * construction. occ² sums in double: this sizes task fan-out, it is
    * not a result. */
  private def adaptiveCellSalt(cells: DataFrame, cellCol: String): Int =
    cellPairProfile(cells, cellCol)._1

  /** [[adaptiveCellSalt]] plus the TOTAL pair-unit volume Σocc² the salt
    * rule already aggregates — the second consumer is the count-
    * conditional SQ8 screen gate ([[nearDupPairs]] `codeScreen`): below
    * [[CodeScreenMinPairs]] pair units the screen's staging + byte-dot
    * overhead buys nothing, above it the quadratic stage should carry
    * codes, not vectors. One profile, one collect, two decisions. */
  private def cellPairProfile(
      cells: DataFrame, cellCol: String): (Int, Double) = {
    val t = cells.sparkSession.sparkContext.defaultParallelism
    // Small-input short-circuit (ADVICE r18): with n < √CodeScreenMinPairs
    // rows TOTAL, even the worst skew (all rows in one cell) yields
    // n² < CodeScreenMinPairs pair units — the screen gate cannot fire,
    // and the whole pair stage is one sub-millisecond task where salting
    // is noise (results are salt-invariant, spec-pinned). A LocalLimit
    // count reads ≤ n+1 rows with no shuffle, replacing the
    // groupBy+collect profile job on the paths small inputs hit.
    val probe = math.sqrt(CodeScreenMinPairs).toLong
    if (cells.limit((probe + 1).toInt).count() <= probe - 1) return (1, 0.0)
    val rows = cells.groupBy(col(cellCol)).agg(count(lit(1)).as("f"))
      .agg(
        sum(col("f").cast("double") * col("f").cast("double")).as("s2"),
        max(col("f").cast("double") * col("f").cast("double")).as("mx"))
      .collect()
    if (rows.isEmpty || rows(0).isNullAt(0) || rows(0).getDouble(0) <= 0.0)
      (1, 0.0)
    else {
      val s2 = rows(0).getDouble(0)
      val mx = rows(0).getDouble(1)
      (math.max(1, math.min(16.0, math.ceil(mx * t / s2)).toInt), s2)
    }
  }

  /** Pair-unit volume (Σocc² over cells) above which the exact pair
    * stage screens with SQ8 codes. The screen carries a fixed staging
    * cost (per-vector quantization + error norms) and a wider self-join
    * payload (codes + 4 doubles vs bare ids), so below ~10⁶ pair units
    * it LOSES to the plain path (measured: q149/q234 at sf0.1, ~500k
    * pair units, paid ~+1 s each at the old 2·10⁴ gate; at 25M pair
    * units the screen wins 2.3×, at 466M it wins 4×). Oracle-equivalence
    * of the screened path does not depend on this gate: q279 FORCES
    * codeScreen=true at sf0.01 scale, so the driver's DuckDB gate
    * replays the screened pipeline every round regardless. */
  private[graft] val CodeScreenMinPairs = 1e6

  /** [[knnGraph]] over a TRAINED persisted quantizer with two-level
    * routing — the production kNN-graph entry point at 100 TB geometry:
    * train [[kMeansCentroidsPortable]] ONCE (model-sized sample, cost
    * independent of corpus size), persist the (cid, cq, c2) frame as
    * parquet model state, and reuse it here — assignment is 2n·√k dots
    * (coarse-then-fine) instead of the flat path's n·k = n²/targetCell,
    * while trained cells stay ~targetCell so candidate volume per probe
    * is still bounded. The candidate join SALTS adaptively
    * ([[adaptiveCellSalt]]): trained cells inherit the corpus's natural
    * cluster skew, and an unsalted cell-keyed shuffle-hash join puts the
    * hottest cell's entire |probe_c|×|corpus_c| pair block in one task —
    * salting fans it across `salt` tasks at the price of replicating the
    * corpus side salt×, with bit-identical results. The whole pipeline —
    * training included — replays in SQL ([[trainedKnnSql]], q233):
    * integer-exact training, rounded routing, rounded pair sims. Output
    * (pid, rank, nid, sim), the [[knnGraph]] contract. */
  def knnGraphTrained(
      corpus: DataFrame,
      quantizer: DataFrame,
      k: Int,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      routeRoundTo: Int = 6,
      saltOverride: Int = 0,
      probeIds: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && nProbe >= 1, s"knnGraphTrained(k=$k, nProbe=$nProbe)")
    require(saltOverride >= 0,
      s"knnGraphTrained: saltOverride $saltOverride must be >= 0 (0 = adaptive)")
    val (side, rk) = twoLevelRanked(
      corpus, quantizer, nProbe, idCol, vecCol, routeRoundTo)
    val vv = side.join(
      rk.filter(col("crank") === 1).select(col("nid"), col("cid").as("cell")), "nid")
    // probeIds (one column `pid`): restrict the PROBE side to these ids
    // BEFORE the candidate join — an eval harness reading only a probe
    // subset must not pay the full corpus-squared-over-cells pair
    // volume and filter afterwards (the custom TopK node has no filter
    // pushdown). Per-probe rows are independent through the join and
    // the per-pid heap, so this equals filtering the full graph's
    // output to the same ids bit-exactly (spec-pinned).
    val pp0 = side
      .select(col("nid").as("pid"), col("nvec").as("pvec"), col("nnorm").as("pnorm"))
      .join(rk.select(col("nid").as("pid"), col("cid").as("pcell")), "pid")
    val pp = probeIds.fold(pp0)(ids =>
      pp0.join(ids.select(col("pid")), Seq("pid"), "left_semi"))
    // both sides corpus-scale → force the cell-keyed shuffle-hash join
    // (the topKIvf corpusSizedProbes rule), salted when the trained-cell
    // occupancy profile says the hottest cell would straggle
    // probeIds present means the probe side is BUDGET-bounded (the
    // boundedProbeBudget eval geometry): per-cell pair volume is at most
    // |probes in cell| x occupancy, so the hot-cell straggler the salt
    // levels cannot occur — skip BOTH the full-corpus occupancy profile
    // job and the saltFactor x replication of the corpus-sized vv side
    // (results are salt-invariant, spec-pinned).
    val sf = if (saltOverride > 0) saltOverride
      else if (probeIds.isDefined) 1
      else adaptiveCellSalt(
        rk.filter(col("crank") === 1).select(col("cid").as("cell")), "cell")
    val joined =
      if (sf <= 1)
        pp.hint("shuffle_hash").join(vv.hint("shuffle_hash"),
          col("pcell") === col("cell") && col("pid") =!= col("nid"))
      else
        pp.withColumn("psalt", pmod(xxhash64(col("pid")), lit(sf.toLong)))
          .hint("shuffle_hash")
          .join(
            vv.withColumn("nsalt",
              explode(sequence(lit(0L), lit(sf.toLong - 1)))).hint("shuffle_hash"),
            col("pcell") === col("cell") && col("psalt") === col("nsalt") &&
              col("pid") =!= col("nid"))
          .drop("psalt", "nsalt")
    val scored = joined.withColumn("sim", pairSim(roundTo))
    graft.plans.TopK.perKey(
        scored, Seq(col("pid")), Seq(col("sim").desc, col("nid")), k)
      .select("pid", "rank", "nid", "sim")
  }

  /** [[semanticDedup]] over a TRAINED persisted quantizer with two-level
    * routing — the q149 remedy: same SemDeDup tail (within-cell pairs →
    * components → keep-least-prototypical), assignment 2n·√k instead of
    * n·k. cent_sim is the fine routing cosine (rounded `routeRoundTo`).
    * Fully SQL-replayable ([[trainedDedupSql]], q234). */
  def semanticDedupTrained(
      vectors: DataFrame,
      quantizer: DataFrame,
      minSim: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      routeRoundTo: Int = 6,
      bands: Int = 0,
      planesPerBand: Int = 1): DataFrame = {
    val (side, rk) = twoLevelRanked(
      vectors, quantizer, nProbe = 1, idCol, vecCol, routeRoundTo)
    val assigned = side
      .join(rk.filter(col("crank") === 1)
        .select(col("nid"), col("cid").as("cell"), col("csim").as("cent_sim")), "nid")
      .select(col("nid").as("id"), col("cell"), col("cent_sim"),
        col("nvec").as("vec"))
    dedupFromAssigned(assigned, minSim, idCol, roundTo, bands, planesPerBand)
  }

  /** Per-trained-cell occupancy profile — the PLANNING probe for every
    * trained-quantizer consumer ([[knnGraphTrained]] /
    * [[semanticDedupTrained]] / [[topKIvfPq]]): trained cells inherit
    * the corpus's natural cluster imbalance, so before committing a
    * cell-keyed join layout at 100 TB you measure how uneven the cells
    * actually are (the [[Skew.keySkewProfile]] argument, specialized to
    * the trained-IVF assignment). Routes every vector through the same
    * two-level (coarse→fine) path the consumers use and counts crank = 1
    * assignments per cell. Output: (cell, occ) — one row per non-empty
    * cell, model-sized (≤ k rows). Fully SQL-replayable, training
    * included ([[trainedOccupancySql]], q250): the adaptive salt the
    * consumers derive from this profile needs no replay (salt is
    * execution-only), but the PROFILE itself is an output a pipeline
    * planner acts on, so it carries its own oracle. */
  def cellOccupancyTrained(
      corpus: DataFrame,
      quantizer: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      routeRoundTo: Int = 6): DataFrame = {
    val (side, rk) = twoLevelRanked(
      corpus, quantizer, nProbe = 1, idCol, vecCol, routeRoundTo)
    // model-sized output → eager lineage-free materialization so BOTH
    // per-call caches release before return (the dedupFromAssigned rule)
    val out = rk.filter(col("crank") === 1)
      .groupBy(col("cid").as("cell"))
      .agg(count(lit(1)).as("occ"))
      .select(col("cell"), col("occ"))
      .localCheckpoint(true)
    side.unpersist()
    rk.unpersist()
    out
  }

  /** IVF-PQ approximate top-k — the composed billion-scale ANN layout
    * (Jégou et al. 2011's IVFADC geometry, non-residual variant): the
    * TRAINED coarse quantizer ([[kMeansCentroidsPortable]]) scopes
    * candidacy to nProbe cells per probe via the two-level router, and
    * within probed cells the corpus travels as PQ CODES scored by ADC
    * distance tables — the scan is O(matched-cells · m/dim width)
    * instead of full vectors over the whole corpus. Candidates re-rank
    * by the TRUE rounded cosine (the [[topKPqAdc]] contract: ADC and
    * cell routing only PRUNE; every emitted (rank, sim) is exact).
    * Residual encoding (codes on x − centroid) is the FAISS refinement
    * this variant trades away — with the exact re-rank the loss is
    * recall only, bought back with nProbe/topC.
    *
    * Degeneracy gate (property-tested + oracle q241): nProbe ≥ the cell
    * count AND topC ≥ corpus ⇒ complete candidacy ⇒ equals
    * [[topKBruteForce]] exactly — the q50/q72 pattern.
    *
    * Scale shape: cell routing 2n·√k dots ([[twoLevelRanked]]); the
    * candidate join is CELL-KEYED (probe cells meet corpus codes inside
    * shared cells, shuffle-hash, never all-pairs); ADC tables are
    * model-sized per probe and broadcast; codebooks/quantizer are
    * persisted model state trained once. */
  def topKIvfPq(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      quantizer: DataFrame,
      nProbe: Int,
      topC: Int,
      m: Int = 4,
      ksub: Int = 16,
      iters: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      routeRoundTo: Int = 6,
      codebooks: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && topC >= k && nProbe >= 1,
      s"topKIvfPq(k=$k, topC=$topC, nProbe=$nProbe)")
    val books = codebooks.getOrElse(pqCodebooks(corpus, m, ksub, iters, idCol, vecCol))
    val dsub = books.select(size(col("cvec"))).head().getInt(0)
    val codes = pqEncode(corpus, books, m, dsub, idCol, vecCol)
    // corpus home cells via the two-level router (the 2n·√k path — the
    // corpus is the big side); probes rank against ALL centroids FLAT
    // (probe batches are small by contract, and flat probe routing is
    // what makes nProbe ≥ cells provably complete — a two-level probe
    // would be confined to its home coarse group)
    val (cSide, cRank) = twoLevelRanked(
      corpus, quantizer, nProbe = 1, idCol, vecCol, routeRoundTo)
    val corpusCells = cRank.filter(col("crank") === 1)
      .select(col("nid"), col("cid").as("cell"))
    val cents = quantizer
      .select(col("cid").cast("long").as("cid"),
        col("cq").cast("array<float>").as("cqf"), col("c2"))
    val pSide = withNorm(
      probes.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nvec", "nnorm")
    val wP = Window.partitionBy("pid").orderBy(col("csim").desc, col("cid"))
    val probeCells = pSide.select(col("nid").as("pid"),
        col("nvec").as("pv"), col("nnorm").as("pn"))
      .join(broadcast(cents), lit(true))
      .withColumn("csim", round(
        VectorOps.dot(col("pv"), col("cqf")) /
          (col("pn") * sqrt(col("c2").cast("double"))), routeRoundTo))
      .withColumn("prank", row_number().over(wP))
      .filter(col("prank") <= nProbe)
      .select(col("pid"), col("cid").as("pcell"))
    // per-probe ADC table (the topKPqAdc construction)
    val pn = normalized(probes, idCol, vecCol, "pid")
    val tabs = subRows(pn, "pid", m, dsub)
      .join(broadcast(books), "m")
      .withColumn("d", l2dist2(col("sub"), col("cvec")))
      .groupBy("pid")
      .agg(map_from_entries(collect_list(
        struct((col("m") * lit(ksub) + col("c")).cast("int"), col("d")))).as("tab"))
    val scored = codes.join(corpusCells, "nid")
      .hint("shuffle_hash")
      .join(probeCells.hint("shuffle_hash"), col("cell") === col("pcell"))
      .filter(col("pid") =!= col("nid"))
      .join(broadcast(tabs), "pid")
      .withColumn("adc", aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, mi) => acc + element_at(col("tab"),
          (mi * lit(ksub) + element_at(col("codes"), mi + 1)).cast("int"))))
    val cand = graft.plans.TopK
      .perKey(scored, Seq(col("pid")), Seq(col("adc"), col("nid")), topC)
      .select("pid", "nid")
    // exact re-rank from the already-staged normalized sides
    val exact = cand
      .join(cSide, "nid")
      .join(broadcast(pSide.select(col("nid").as("pid"),
        col("nvec").as("pvec"), col("nnorm").as("pnorm"))), "pid")
      .withColumn("sim", pairSim(roundTo))
    graft.plans.TopK.perKey(exact, Seq(col("pid")), Seq(col("sim").desc, col("nid")), k)
      .select("pid", "rank", "nid", "sim")
  }

  /** IVF-PQ with RESIDUAL encoding — the full IVFADC of Jégou et al.
    * 2011 (§III.C) and the FAISS `IVFx,PQy` default that [[topKIvfPq]]
    * documents as its traded refinement: PQ codes quantize the RESIDUAL
    * x̂ − ĉ(home cell) instead of x̂ itself. Within a cell the residuals
    * span a far tighter ball than the raw vectors (the coarse quantizer
    * has already explained the between-cell variance), so the same
    * m·log₂(ksub)-bit code budget buys a finer in-cell resolution —
    * better ADC ordering, hence better recall at equal topC. The price:
    * the per-probe ADC table becomes per-(probe, PROBED CELL) — the
    * probe's residual is w.r.t. each probed cell's centroid — i.e.
    * nProbe tables per probe instead of one; still model-sized and
    * broadcast (the published IVFADC bookkeeping, not a scale term).
    *
    * Geometry: vectors and centroids both live on the unit sphere (ĉ =
    * cq/√c2), so ADC sums approximate ‖p̂ − x̂‖² = 2 − 2·cos and the ADC
    * ordering tracks cosine; the exact rounded-cosine re-rank is
    * unchanged ([[topKPqAdc]] contract — ADC and routing only PRUNE).
    *
    * Degeneracy gate (the q241 pattern): nProbe ≥ cells AND topC ≥
    * corpus ⇒ complete candidacy ⇒ equals [[topKBruteForce]] exactly —
    * residual coding cannot change a complete candidate set.
    *
    * Scale shape: identical to [[topKIvfPq]] (two-level corpus routing,
    * cell-keyed shuffle-hash candidate join, heap trims) plus one
    * broadcast-joined residual derivation per corpus row; codebooks
    * train on a residual frame through the same Lloyd core. */
  def topKIvfPqResidual(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      quantizer: DataFrame,
      nProbe: Int,
      topC: Int,
      m: Int = 4,
      ksub: Int = 16,
      iters: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      routeRoundTo: Int = 6,
      codebooks: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && topC >= k && nProbe >= 1,
      s"topKIvfPqResidual(k=$k, topC=$topC, nProbe=$nProbe)")
    val (cSide, cRank) = twoLevelRanked(
      corpus, quantizer, nProbe = 1, idCol, vecCol, routeRoundTo)
    val corpusCells = cRank.filter(col("crank") === 1)
      .select(col("nid"), col("cid").as("cell"))
    // unit-sphere centroids: residuals live in the same normalized space
    val centsN = quantizer.select(
      col("cid").cast("long").as("cid"),
      transform(col("cq"), x =>
        x.cast("double") / sqrt(col("c2").cast("double"))).as("cn"),
      col("cq").cast("array<float>").as("cqf"), col("c2"))
    val rvn = normalized(corpus, idCol, vecCol, "id")
      .join(corpusCells.select(col("nid").as("id"), col("cell")), "id")
      .join(broadcast(centsN.select(col("cid").as("cell"), col("cn"))), "cell")
      .select(col("id"), zip_with(col("vn"), col("cn"), (a, b) => a - b).as("vn"))
    val books = codebooks.getOrElse(pqCodebooksFrom(rvn, m, ksub, iters))
    val dsub = books.select(size(col("cvec"))).head().getInt(0)
    val codes = assignCodes(
        rvn.select(col("id").as("nid"), col("vn")), books, m, dsub, "nid")
      .groupBy("nid")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("c")))),
        s => s.getField("c")).as("codes"))
    // probes rank ALL centroids flat (the topKIvfPq completeness rule)
    val pSide = withNorm(
      probes.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nvec", "nnorm")
    val wP = Window.partitionBy("pid").orderBy(col("csim").desc, col("cid"))
    val probeCells = pSide.select(col("nid").as("pid"),
        col("nvec").as("pv"), col("nnorm").as("pn"))
      .join(broadcast(centsN), lit(true))
      .withColumn("csim", round(
        VectorOps.dot(col("pv"), col("cqf")) /
          (col("pn") * sqrt(col("c2").cast("double"))), routeRoundTo))
      .withColumn("prank", row_number().over(wP))
      .filter(col("prank") <= nProbe)
      .select(col("pid"), col("cid").as("pcell"))
    // per-(probe, probed cell) residual ADC tables — nProbe·probes rows,
    // model-sized, broadcast
    val pres = normalized(probes, idCol, vecCol, "pid")
      .join(probeCells, "pid")
      .join(broadcast(centsN.select(col("cid").as("pcell"), col("cn"))), "pcell")
      .select(struct(col("pid").as("p"), col("pcell").as("cc")).as("pk"),
        zip_with(col("vn"), col("cn"), (a, b) => a - b).as("vn"))
    val tabs = subRows(pres, "pk", m, dsub)
      .join(broadcast(books), "m")
      .withColumn("d", l2dist2(col("sub"), col("cvec")))
      .groupBy("pk")
      .agg(map_from_entries(collect_list(
        struct((col("m") * lit(ksub) + col("c")).cast("int"), col("d")))).as("tab"))
      .select(col("pk.p").as("tpid"), col("pk.cc").as("tcell"), col("tab"))
    val scored = codes.join(corpusCells, "nid")
      .hint("shuffle_hash")
      .join(probeCells.hint("shuffle_hash"), col("cell") === col("pcell"))
      .filter(col("pid") =!= col("nid"))
      .join(broadcast(tabs),
        col("pid") === col("tpid") && col("cell") === col("tcell"))
      .withColumn("adc", aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, mi) => acc + element_at(col("tab"),
          (mi * lit(ksub) + element_at(col("codes"), mi + 1)).cast("int"))))
    val cand = graft.plans.TopK
      .perKey(scored, Seq(col("pid")), Seq(col("adc"), col("nid")), topC)
      .select("pid", "nid")
    // exact re-rank from the already-staged normalized sides
    val exact = cand
      .join(cSide, "nid")
      .join(broadcast(pSide.select(col("nid").as("pid"),
        col("nvec").as("pvec"), col("nnorm").as("pnorm"))), "pid")
      .withColumn("sim", pairSim(roundTo))
    graft.plans.TopK.perKey(exact, Seq(col("pid")), Seq(col("sim").desc, col("nid")), k)
      .select("pid", "rank", "nid", "sim")
  }

  /** GENERATES the DuckDB replay of the trained-quantizer pipeline
    * prefix — raw staging, micro-quantization, the unrolled Lloyd
    * iterations ([[kMeansCentroidsPortable]]'s exact arithmetic,
    * verbatim), and the two-level routing of [[twoLevelRanked]] — ending
    * at CTE `rkq` (id, cid, csim, crank). Shared by [[trainedKnnSql]]
    * and [[trainedDedupSql]] (the kCenterSqlCtes one-source-of-truth
    * rule). */
  def trainedIvfSqlCtes(
      table: String,
      minCentroids: Int,
      targetCell: Int = 1024,
      iters: Int = 2,
      sampleFactor: Int = 32,
      nProbe: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      routeRoundTo: Int = 6): String = {
    require(iters >= 1 && iters <= 16, s"iters $iters outside [1,16]")
    val rounds = (1 to iters).map { t =>
      s"""s$t AS (SELECT samp.id, p.cid,
         |    ROUND(list_inner_product(CAST(samp.xq AS DOUBLE[]), CAST(p.cq AS DOUBLE[]))
         |      / (sqrt(CAST(samp.n2 AS DOUBLE)) * sqrt(CAST(p.c2 AS DOUBLE))),
         |      $routeRoundTo) AS csim
         |  FROM samp CROSS JOIN c${t - 1} p),
         |a$t AS (SELECT id, cid AS cell FROM
         |   (SELECT id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
         |    FROM s$t) WHERE rn = 1),
         |u$t AS (SELECT cell, i - 1 AS pos,
         |    CAST(round(xq[i] / sqrt(CAST(n2 AS DOUBLE)) * 1000000000.0) AS BIGINT) AS uq
         |  FROM (SELECT a.cell, s.xq, s.n2,
         |          unnest(generate_series(1, len(s.xq))) AS i
         |        FROM a$t a JOIN samp s USING (id))),
         |m$t AS (SELECT cell, pos,
         |    CAST(round(CAST(SUM(uq) AS DOUBLE) / COUNT(*) / 1000.0) AS BIGINT) AS m
         |  FROM u$t GROUP BY cell, pos),
         |c$t AS MATERIALIZED (SELECT cid, cq,
         |    CAST(list_inner_product(CAST(cq AS DOUBLE[]), CAST(cq AS DOUBLE[])) AS BIGINT) AS c2
         |  FROM (SELECT cell AS cid, list(m ORDER BY pos) AS cq FROM m$t GROUP BY cell)
         |  WHERE list_inner_product(CAST(cq AS DOUBLE[]), CAST(cq AS DOUBLE[])) > 0)""".stripMargin
    }
    s"""vraw AS MATERIALIZED (
       |  SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS ev
       |  FROM $table
       |  WHERE NOT isnan(list_inner_product(CAST($vecCol AS DOUBLE[]),
       |                                     CAST($vecCol AS DOUBLE[])))
       |    AND list_inner_product(CAST($vecCol AS DOUBLE[]),
       |                           CAST($vecCol AS DOUBLE[])) > 0),
       |vq AS MATERIALIZED (
       |  SELECT id, xq,
       |    CAST(list_inner_product(CAST(xq AS DOUBLE[]), CAST(xq AS DOUBLE[])) AS BIGINT) AS n2
       |  FROM (SELECT id,
       |          list_transform(ev, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS xq
       |        FROM vraw)
       |  WHERE list_inner_product(CAST(xq AS DOUBLE[]), CAST(xq AS DOUBLE[])) > 0),
       |samp AS MATERIALIZED (SELECT id, xq, n2 FROM vq ORDER BY id
       |  LIMIT (SELECT $sampleFactor * GREATEST($minCentroids, COUNT(*) // $targetCell)
       |         FROM $table)),
       |c0 AS MATERIALIZED (SELECT id AS cid, xq AS cq, n2 AS c2 FROM vq ORDER BY id
       |  LIMIT (SELECT GREATEST($minCentroids, COUNT(*) // $targetCell) FROM $table)),
       |${rounds.mkString(",\n")},
       |gg AS MATERIALIZED (SELECT cid AS gid, cq AS gq, c2 AS g2 FROM c$iters
       |  ORDER BY cid LIMIT (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) FROM c$iters)),
       |cg AS MATERIALIZED (SELECT cid, grp, cq, c2 FROM
       |   (SELECT c.cid, g.gid AS grp, c.cq, c.c2,
       |      ROW_NUMBER() OVER (PARTITION BY c.cid ORDER BY
       |        ROUND(list_inner_product(CAST(c.cq AS DOUBLE[]), CAST(g.gq AS DOUBLE[]))
       |          / (sqrt(CAST(c.c2 AS DOUBLE)) * sqrt(CAST(g.g2 AS DOUBLE))),
       |          $routeRoundTo) DESC, g.gid) AS rn
       |    FROM c$iters c CROSS JOIN gg g) WHERE rn = 1),
       |vg AS MATERIALIZED (SELECT id, grp FROM
       |   (SELECT v.id, g.gid AS grp,
       |      ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY
       |        ROUND(list_inner_product(v.ev, CAST(g.gq AS DOUBLE[]))
       |          / (sqrt(list_inner_product(v.ev, v.ev)) * sqrt(CAST(g.g2 AS DOUBLE))),
       |          $routeRoundTo) DESC, g.gid) AS rn
       |    FROM vraw v CROSS JOIN gg g) WHERE rn = 1),
       |rkq AS MATERIALIZED (SELECT id, cid, csim, rn AS crank FROM
       |   (SELECT v.id, c.cid,
       |      ROUND(list_inner_product(v.ev, CAST(c.cq AS DOUBLE[]))
       |        / (sqrt(list_inner_product(v.ev, v.ev)) * sqrt(CAST(c.c2 AS DOUBLE))),
       |        $routeRoundTo) AS csim,
       |      ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY
       |        ROUND(list_inner_product(v.ev, CAST(c.cq AS DOUBLE[]))
       |          / (sqrt(list_inner_product(v.ev, v.ev)) * sqrt(CAST(c.c2 AS DOUBLE))),
       |          $routeRoundTo) DESC, c.cid) AS rn
       |    FROM vraw v JOIN vg ON vg.id = v.id JOIN cg c ON c.grp = vg.grp)
       |   WHERE rn <= ${math.max(nProbe, 1)})""".stripMargin
  }

  /** Full DuckDB replay of [[knnGraphTrained]] (training included) —
    * the q233 oracle. */
  def trainedKnnSql(
      table: String,
      k: Int,
      nProbe: Int,
      minCentroids: Int,
      targetCell: Int = 1024,
      iters: Int = 2,
      sampleFactor: Int = 32,
      roundTo: Int = 4,
      routeRoundTo: Int = 6): String = {
    val ctes = trainedIvfSqlCtes(table, minCentroids, targetCell, iters,
      sampleFactor, nProbe, routeRoundTo = routeRoundTo)
    s"""WITH $ctes,
       |cand AS (SELECT p.id AS pid, h.id AS nid FROM rkq p
       |  JOIN (SELECT id, cid FROM rkq WHERE crank = 1) h
       |    ON p.cid = h.cid AND p.id <> h.id
       |  WHERE p.crank <= $nProbe),
       |sc AS (SELECT cand.pid, cand.nid,
       |    ROUND(list_cosine_similarity(a.ev, b.ev), $roundTo) AS sim
       |  FROM cand JOIN vraw a ON a.id = cand.pid JOIN vraw b ON b.id = cand.nid),
       |r AS (SELECT pid, nid, sim,
       |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY sim DESC, nid) AS rank
       |  FROM sc)
       |SELECT pid, CAST(rank AS BIGINT) AS rank, nid, sim
       |FROM r WHERE rank <= $k ORDER BY pid, rank""".stripMargin
  }

  /** Full DuckDB replay of [[semanticDedupTrained]] (training included,
    * recursive component closure) — the q234 oracle. */
  def trainedDedupSql(
      table: String,
      minSim: Double,
      minCentroids: Int,
      targetCell: Int = 1024,
      iters: Int = 2,
      sampleFactor: Int = 32,
      roundTo: Int = 4,
      routeRoundTo: Int = 6): String = {
    val ctes = trainedIvfSqlCtes(table, minCentroids, targetCell, iters,
      sampleFactor, nProbe = 1, routeRoundTo = routeRoundTo)
    s"""WITH RECURSIVE $ctes,
       |asg AS MATERIALIZED (SELECT id, cid AS cell, csim AS cent_sim
       |  FROM rkq WHERE crank = 1),
       |pr AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
       |  JOIN vraw va ON va.id = a.id JOIN vraw vb ON vb.id = b.id
       |  WHERE ROUND(list_cosine_similarity(va.ev, vb.ev), $roundTo) >= $minSim),
       |ed AS (SELECT ia AS u, ib AS w FROM pr UNION ALL SELECT ib, ia FROM pr),
       |reach(src, dst) AS (
       |  SELECT id, id FROM asg
       |  UNION
       |  SELECT reach.src, ed.w FROM reach JOIN ed ON reach.dst = ed.u),
       |cl AS (SELECT src AS id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
       |j AS (SELECT asg.id, asg.cell, cl.cluster_id, asg.cent_sim
       |  FROM asg JOIN cl USING (id)),
       |sv AS (SELECT cluster_id, id AS surv_id FROM
       |  (SELECT cluster_id, id, ROW_NUMBER() OVER (
       |     PARTITION BY cluster_id ORDER BY cent_sim, id) AS rn
       |   FROM j) WHERE rn = 1)
       |SELECT j.id AS vec_id, j.cell, j.cluster_id, j.cent_sim,
       |       j.id = sv.surv_id AS keep
       |FROM j JOIN sv USING (cluster_id) ORDER BY vec_id""".stripMargin
  }

  /** Full DuckDB replay of the two-level-vs-flat recall harness — the
    * q251 oracle (training included): the SAME trained centroids are
    * routed BOTH ways (flat n·k assignment = [[topKIvf]] with the
    * quantizer override; two-level 2n·√k = [[twoLevelRanked]]), each at
    * nProbe ∈ {1, nProbeMax}, each graph's probe sample scored against
    * the exact brute-force top-k — recall = Σhits/Σn_exact, ONE double
    * division of exact counts (no per-probe double averaging, so the
    * mean is summation-order-free). */
  def twoLevelRecallSql(
      table: String,
      k: Int,
      minCentroids: Int,
      nProbeMax: Int = 2,
      probeMod: Int = 10,
      targetCell: Int = 1024,
      iters: Int = 2,
      sampleFactor: Int = 32,
      roundTo: Int = 4,
      routeRoundTo: Int = 6): String = {
    require(nProbeMax >= 2, s"twoLevelRecallSql: nProbeMax $nProbeMax needs >= 2 points")
    val ctes = trainedIvfSqlCtes(table, minCentroids, targetCell, iters,
      sampleFactor, nProbe = nProbeMax, routeRoundTo = routeRoundTo)
    def approx(src: String, cells: String, np: Int, nm: String) =
      s"""$nm AS (SELECT pid, nid FROM (
         |  SELECT p.id AS pid, h.id AS nid,
         |    ROW_NUMBER() OVER (PARTITION BY p.id ORDER BY
         |      ROUND(list_cosine_similarity(pv.ev, hv.ev), $roundTo) DESC, h.id) AS rank
         |  FROM $src p JOIN $cells h ON p.cid = h.cid AND p.id <> h.id
         |  JOIN vraw pv ON pv.id = p.id JOIN vraw hv ON hv.id = h.id
         |  WHERE p.crank <= $np AND p.id % $probeMod = 0) WHERE rank <= $k),
         |h$nm AS (SELECT COUNT(*) AS hits FROM $nm a
         |  JOIN exact e ON a.pid = e.pid AND a.nid = e.nid)""".stripMargin
    def outRow(path: String, np: Int, nm: String) =
      s"""SELECT '$path' AS path, CAST($np AS BIGINT) AS n_probe, probes, hits,
         |  n_exact, ROUND(CAST(hits AS DOUBLE) / n_exact, 6) AS recall
         |FROM h$nm, exn""".stripMargin
    s"""WITH $ctes,
       |cellsT AS MATERIALIZED (SELECT id, cid FROM rkq WHERE crank = 1),
       |fr AS MATERIALIZED (SELECT id, cid, rn AS crank FROM
       |  (SELECT v.id, c.cid,
       |     ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY
       |       ROUND(list_inner_product(v.ev, CAST(c.cq AS DOUBLE[]))
       |         / (sqrt(list_inner_product(v.ev, v.ev)) * sqrt(CAST(c.c2 AS DOUBLE))),
       |         $routeRoundTo) DESC, c.cid) AS rn
       |   FROM vraw v CROSS JOIN c$iters c) WHERE rn <= $nProbeMax),
       |cellsF AS MATERIALIZED (SELECT id, cid FROM fr WHERE crank = 1),
       |exact AS MATERIALIZED (SELECT pid, nid FROM (
       |  SELECT a.id AS pid, b.id AS nid,
       |    ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY
       |      ROUND(list_cosine_similarity(a.ev, b.ev), $roundTo) DESC, b.id) AS rank
       |  FROM vraw a CROSS JOIN vraw b
       |  WHERE a.id <> b.id AND a.id % $probeMod = 0) WHERE rank <= $k),
       |exn AS (SELECT COUNT(*) AS n_exact, COUNT(DISTINCT pid) AS probes FROM exact),
       |${approx("fr", "cellsF", 1, "apF1")},
       |${approx("fr", "cellsF", nProbeMax, "apF2")},
       |${approx("rkq", "cellsT", 1, "apT1")},
       |${approx("rkq", "cellsT", nProbeMax, "apT2")}
       |SELECT * FROM (
       |${outRow("flat", 1, "apF1")}
       |UNION ALL
       |${outRow("flat", nProbeMax, "apF2")}
       |UNION ALL
       |${outRow("two_level", 1, "apT1")}
       |UNION ALL
       |${outRow("two_level", nProbeMax, "apT2")})
       |ORDER BY path, n_probe""".stripMargin
  }

  /** Full DuckDB replay of PRODUCTION bitext mining — the q252 oracle:
    * [[marginFromNeighbors]] over [[topKIvf]] neighbor frames built with
    * the TRAINED quantizer (training included via [[trainedIvfSqlCtes]]),
    * replacing the brute-force probes×corpus passes the registered q170
    * gate keeps. Both direction's candidates come from shared trained
    * cells (probe crank ≤ nProbe, corpus crank = 1), per-direction top-k
    * by the rounded cosine, then the q170 margin/mutual-best tail
    * verbatim. */
  def trainedBitextSql(
      table: String,
      k: Int,
      nProbe: Int,
      minCentroids: Int,
      minMargin: Double,
      targetCell: Int = 1024,
      iters: Int = 2,
      sampleFactor: Int = 32,
      roundTo: Int = 4,
      routeRoundTo: Int = 6): String = {
    val ctes = trainedIvfSqlCtes(table, minCentroids, targetCell, iters,
      sampleFactor, nProbe = 1, routeRoundTo = routeRoundTo)
    s"""WITH $ctes,
       |fr AS MATERIALIZED (SELECT id, cid, rn AS crank FROM
       |  (SELECT v.id, c.cid,
       |     ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY
       |       ROUND(list_inner_product(v.ev, CAST(c.cq AS DOUBLE[]))
       |         / (sqrt(list_inner_product(v.ev, v.ev)) * sqrt(CAST(c.c2 AS DOUBLE))),
       |         $routeRoundTo) DESC, c.cid) AS rn
       |   FROM vraw v CROSS JOIN c$iters c) WHERE rn <= $nProbe),
       |fa AS (SELECT p.id AS sid, h.id AS tid,
       |    ROUND(list_cosine_similarity(pv.ev, hv.ev), $roundTo) AS sim
       |  FROM fr p
       |  JOIN (SELECT id, cid FROM fr WHERE crank = 1 AND id % 2 <> 0) h
       |    ON p.cid = h.cid
       |  JOIN vraw pv ON pv.id = p.id JOIN vraw hv ON hv.id = h.id
       |  WHERE p.id % 2 = 0),
       |fwd AS (SELECT sid, tid, sim FROM (
       |    SELECT sid, tid, sim, ROW_NUMBER() OVER (
       |      PARTITION BY sid ORDER BY sim DESC, tid) AS rk FROM fa)
       |  WHERE rk <= $k),
       |ba AS (SELECT h.id AS sid, p.id AS tid,
       |    ROUND(list_cosine_similarity(pv.ev, hv.ev), $roundTo) AS sim
       |  FROM fr p
       |  JOIN (SELECT id, cid FROM fr WHERE crank = 1 AND id % 2 = 0) h
       |    ON p.cid = h.cid
       |  JOIN vraw pv ON pv.id = p.id JOIN vraw hv ON hv.id = h.id
       |  WHERE p.id % 2 <> 0),
       |bwd AS (SELECT sid, tid, sim FROM (
       |    SELECT sid, tid, sim, ROW_NUMBER() OVER (
       |      PARTITION BY tid ORDER BY sim DESC, sid) AS rk FROM ba)
       |  WHERE rk <= $k),
       |dx AS (SELECT sid, SUM(CAST(sim AS DECIMAL(20,$roundTo))) AS sx,
       |    COUNT(*) AS nx FROM fwd GROUP BY sid),
       |dy AS (SELECT tid, SUM(CAST(sim AS DECIMAL(20,$roundTo))) AS sy,
       |    COUNT(*) AS ny FROM bwd GROUP BY tid),
       |sc AS (SELECT f.sid, f.tid, f.sim,
       |    ROUND(f.sim / ((CAST(dx.sx AS DOUBLE) / dx.nx +
       |      CAST(dy.sy AS DOUBLE) / dy.ny) / 2), $roundTo) AS margin
       |  FROM fwd f JOIN dx USING (sid) JOIN dy USING (tid)),
       |bf AS (SELECT sid, tid, sim, margin FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY sid ORDER BY margin DESC, tid) AS rk FROM sc)
       |  WHERE rk = 1),
       |bb AS (SELECT sid, tid FROM (
       |    SELECT sid, tid, ROW_NUMBER() OVER (
       |      PARTITION BY tid ORDER BY margin DESC, sid) AS rk FROM sc)
       |  WHERE rk = 1)
       |SELECT bf.sid AS src_id, bf.tid AS tgt_id, bf.sim AS cos, bf.margin
       |FROM bf JOIN bb ON bf.sid = bb.sid AND bf.tid = bb.tid
       |WHERE bf.margin >= $minMargin
       |ORDER BY src_id, tgt_id""".stripMargin
  }

  /** 8-bit UNIFORM scalar-quantized ANN (the FAISS `SQ8`/QT_8bit_uniform
    * family, Jegou et al.'s scalar-quantizer baseline) — the
    * COMPRESSION-tier member between raw brute force and PQ (L165/
    * L177): one global symmetric scale maps every L2-normalized
    * component into [−127, 127], so the stored index is 1 byte/dim
    * (4× less scan/shuffle than float32), the candidate score is a
    * PURE int64 dot of codes (exact, portable, SIMD-friendly — no ADC
    * tables, no trained codebooks), and an exact re-rank of the topC
    * restores true cosine order. Versus PQ: 8× more bytes/dim but NO
    * training beyond one max-abs pass, no codebook drift, and a far
    * tighter approximation per dim — the standard first step down the
    * compression ladder.
    *
    * Exact-arithmetic discipline (the q90 quantized-space rule, so the
    * WHOLE pipeline SQL-replays with zero float-order sensitivity):
    * components quantize to vq = ROUND(x·10⁶) exact ints per row (no
    * cross-component float sums anywhere); row norm² = Σvq² exact
    * int64; the trained scale S = 127/max_corpus(max_d|vq_d|/√norm²)
    * derives per row through one fixed-order chain (one IEEE sqrt) and
    * reduces by MAX (order-free on doubles); codes = ⌊vq/√norm²·S +
    * 0.5⌋ (the q205 floor convention); candidate score Σ c_p·c_n exact
    * int64; the final re-rank is the q90 integer-cosine chain rounded
    * `roundTo`. Zero-norm and NaN-bearing vectors drop (the [[withNorm]]
    * contract, applied to the exact vq norm).
    *
    * Approximation contract: ranking by code dot prunes — recall < 1
    * by construction (topC trades recall for candidate cost; topC ≥
    * corpus degenerates to the exact quantized-cosine ranking,
    * spec-asserted). Measure on YOUR corpus with the q111 harness —
    * the registered fixture point is in the spec.
    *
    * Scale shape: the candidate stage broadcasts PROBE codes and
    * streams corpus CODES only (1 byte/dim semantics — ids + two code
    * arrays cross the scan, never raw vectors); the heap operator trims
    * to topC per probe BEFORE the exchange; the re-rank joins the
    * ≤topC·probes candidate frame back to the two vq frames by id —
    * the corpus is never re-scanned. Output: (pid, rank, nid, sim,
    * approx). */
  def topKSq8(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      topC: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(topC >= k, s"topC $topC must be >= k $k")
    import org.apache.spark.sql.types.LongType
    def staged(df: DataFrame, id: String, pfx: String): DataFrame = df
      // NaN/NULL-bearing vectors drop BEFORE the quantizing cast (ANSI
      // raises on NaN→BIGINT; the withNorm drop contract, exact form)
      .where(col(vecCol).isNotNull && !expr(
        s"exists(CAST($vecCol AS ARRAY<DOUBLE>), x -> x IS NULL OR isnan(x))"))
      .select(col(idCol).as(id),
        expr(s"transform(CAST($vecCol AS ARRAY<DOUBLE>), " +
          "x -> CAST(ROUND(x * 1000000) AS BIGINT))").as(s"${pfx}q"))
      .withColumn(s"${pfx}n2",
        expr(s"aggregate(${pfx}q, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
      .where(col(s"${pfx}n2") > 0L)
    val v = staged(corpus, "nid", "n")
    val p = staged(probes, "pid", "p")
    // trained scale: one max-abs pass over the corpus (model state)
    val mx = v.select(
      (expr("aggregate(nq, CAST(0 AS BIGINT), (acc, x) -> " +
        "greatest(acc, abs(x)))").cast("double") /
        sqrt(col("nn2").cast("double"))).as("ratio"))
      .agg(max(col("ratio")).as("mxabs"))
      .select((lit(127.0) / col("mxabs")).as("qs"))
    def coded(df: DataFrame, pfx: String): DataFrame = df
      .crossJoin(broadcast(mx))
      .withColumn(s"${pfx}c",
        expr(s"transform(${pfx}q, x -> CAST(floor(CAST(x AS DOUBLE) / " +
          s"sqrt(CAST(${pfx}n2 AS DOUBLE)) * qs + 0.5d) AS BIGINT))"))
      .drop("qs")
    val vc = coded(v, "n").select(col("nid"), col("nc"))
    val pc = coded(p, "p").select(col("pid"), col("pc"))
    // candidate stage: codes only cross the scan — the 1 byte/dim point
    val cand = broadcast(pc).crossJoin(vc)
      .filter(col("pid") =!= col("nid"))
      .withColumn("approx", graft.functions.VectorOps.dotLong(
        col("pc"), col("nc")))
    val trimmed = graft.plans.TopK.perKey(cand,
        Seq(col("pid")), Seq(col("approx").desc, col("nid")), topC)
      .select("pid", "nid", "approx")
    // exact re-rank: the q90 integer-cosine chain over the vq frames
    val rescored = trimmed
      .join(p.select(col("pid"), col("pq"), col("pn2")), "pid")
      .join(v.select(col("nid"), col("nq"), col("nn2")), "nid")
      .withColumn("sim", round(
        graft.functions.VectorOps.dotLong(col("pq"), col("nq"))
          .cast("double") /
          (sqrt(col("pn2").cast("double")) * sqrt(col("nn2").cast("double"))),
        roundTo))
    graft.plans.TopK.perKey(rescored,
        Seq(col("pid")), Seq(col("sim").desc, col("nid")), k)
      .select("pid", "rank", "nid", "sim", "approx")
  }

  /** IVF-routed SQ8 ANN — the ROUTED tier of the scalar-quantization
    * ladder, completing [[topKSq8]] the way [[topKIvf]] completes brute
    * force: cell routing prunes the candidate set to the probed cells
    * (candidate volume n·nProbe/nCentroids per probe instead of n), the
    * in-cell scan reads 1-byte-per-dim CODES with a pure int64 dot
    * (the [[topKSq8]] point), and an exact integer-cosine re-rank of
    * the topC restores true order — the FAISS `IVFx,SQ8` composition.
    * Versus IVF-PQ ([[topKIvfPq]]): no codebook training, 8× more
    * bytes/dim, tighter per-dim approximation — the same trade as the
    * flat tier, now routed.
    *
    * Determinism: routing scores are ROUNDED cosines (`routeRoundTo`,
    * the q77/q233 contract — cell candidacy is engine-portable);
    * corpus keep-1 assignment is the map-side max_by with the
    * (csim, −cid) tie-break ([[topKIvf]]'s shape — no corpus-row
    * window); codes and the re-rank follow [[topKSq8]]'s q90
    * quantized-space chains verbatim. Only vectors that survive code
    * staging route (one id-join — both engines drop the same rows).
    *
    * Approximation contract: recall < 1 twice over (routing misses +
    * code-order pruning) — measure with the q111 harness; nProbe ≥
    * nCentroids AND topC ≥ corpus degenerates to [[topKSq8]]'s
    * complete ranking (spec-asserted).
    *
    * Scale shape: ONE corpus scan stages codes + one quantizer dot
    * pass for routing (n×nCentroids collapsed map-side by the max_by);
    * the candidate join is cell-keyed (broadcast for eval-batch
    * probes, shuffle-hash for corpus-sized callers); candidate rows
    * carry ids + code arrays only; the re-rank joins ≤topC·probes rows
    * back to the vq frames. Output: (pid, rank, nid, sim, approx). */
  def topKSq8Ivf(
      corpus: DataFrame,
      probes: DataFrame,
      k: Int,
      topC: Int = 64,
      nCentroids: Int = 16,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundTo: Int = 4,
      quantizer: Option[DataFrame] = None,
      routeRoundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(topC >= k, s"topC $topC must be >= k $k")
    require(nProbe >= 1, s"nProbe $nProbe must be >= 1")
    def staged(df: DataFrame, id: String, pfx: String): DataFrame = df
      .where(col(vecCol).isNotNull && !expr(
        s"exists(CAST($vecCol AS ARRAY<DOUBLE>), x -> x IS NULL OR isnan(x))"))
      .select(col(idCol).as(id), col(vecCol).as(s"${pfx}vec"),
        expr(s"transform(CAST($vecCol AS ARRAY<DOUBLE>), " +
          "x -> CAST(ROUND(x * 1000000) AS BIGINT))").as(s"${pfx}q"))
      .withColumn(s"${pfx}n2",
        expr(s"aggregate(${pfx}q, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
      .where(col(s"${pfx}n2") > 0L)
      .withColumn(s"${pfx}norm", sqrt(col(s"${pfx}n2").cast("double")))
    val v = staged(corpus, "nid", "n")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val p = staged(probes, "pid", "p")
    val mx = v.select(
      (expr("aggregate(nq, CAST(0 AS BIGINT), (acc, x) -> " +
        "greatest(acc, abs(x)))").cast("double") / col("nnorm")).as("ratio"))
      .agg(max(col("ratio")).as("mxabs"))
      .select((lit(127.0) / col("mxabs")).as("qs"))
    def coded(df: DataFrame, pfx: String): DataFrame = df
      .crossJoin(broadcast(mx))
      .withColumn(s"${pfx}c",
        expr(s"transform(${pfx}q, x -> CAST(floor(CAST(x AS DOUBLE) / " +
          s"${pfx}norm * qs + 0.5d) AS BIGINT))"))
      .drop("qs")
    val vc = coded(v, "n")
    val pc = coded(p, "p")
    val cents = quantizer.getOrElse(
        corpus.orderBy(col(idCol)).limit(nCentroids)
          .select(col(idCol).as("cid"), col(vecCol).as("cvec")))
      .withColumn("cnorm", VectorOps.l2Norm(col("cvec")))
      .filter(!isnan(col("cnorm")) && col("cnorm") > 0)
    // routing over the staged survivors: rounded cosine, q77 contract.
    // NOTE the vector-side norm here is the EXACT-integer sqrt(n2)/1e6
    // staged norm, not a float-sum L2 — one less float-order surface
    def csimOf(vecC: String, normC: String) = round(
      VectorOps.dot(col(vecC), col("cvec")) /
        ((col(normC) / lit(1000000.0)) * col("cnorm")), routeRoundTo)
    val vcell = vc.select(col("nid"), col("nvec"), col("nnorm"))
      .join(broadcast(cents), lit(true))
      .withColumn("csim", csimOf("nvec", "nnorm"))
      .groupBy(col("nid"))
      .agg(max_by(col("cid"), struct(col("csim"), negate(col("cid"))))
        .as("cell"))
    val wP = Window.partitionBy("pid").orderBy(col("csim").desc, col("cid"))
    val pcell = pc.select(col("pid"), col("pvec"), col("pnorm"))
      .join(broadcast(cents), lit(true))
      .withColumn("csim", csimOf("pvec", "pnorm"))
      .withColumn("crank", row_number().over(wP))
      .filter(col("crank") <= nProbe)
      .select(col("pid"), col("cid").as("cell"))
    // candidate stage: ids + code arrays only, cell-keyed
    val cand = pc.select(col("pid"), col("pc")).join(pcell, "pid")
      .join(vc.select(col("nid"), col("nc")).join(vcell, "nid"), Seq("cell"))
      .filter(col("pid") =!= col("nid"))
      .withColumn("approx", graft.functions.VectorOps.dotLong(
        col("pc"), col("nc")))
      // a probe may reach the same neighbor through ONE cell only
      // (corpus keep-1), so no distinct needed — the topKIvf argument
    val trimmed = graft.plans.TopK.perKey(cand,
        Seq(col("pid")), Seq(col("approx").desc, col("nid")), topC)
      .select("pid", "nid", "approx")
    val rescored = trimmed
      .join(p.select(col("pid"), col("pq"), col("pn2")), "pid")
      .join(v.select(col("nid"), col("nq"), col("nn2")), "nid")
      .withColumn("sim", round(
        graft.functions.VectorOps.dotLong(col("pq"), col("nq"))
          .cast("double") /
          (sqrt(col("pn2").cast("double")) * sqrt(col("nn2").cast("double"))),
        roundTo))
    // top-k output (probe×k rows, narrow): eagerly materialize
    // lineage-free so the staged-corpus cache releases before return
    // (the dedupFromAssigned discipline) — repeated ANN calls in a long
    // session must not accumulate corpus-scale disk blocks
    val out = graft.plans.TopK.perKey(rescored,
        Seq(col("pid")), Seq(col("sim").desc, col("nid")), k)
      .select("pid", "rank", "nid", "sim", "approx")
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    v.unpersist()
    out
  }

  /** Full DuckDB replay of [[cellOccupancyTrained]] (training included) —
    * the q250 oracle. */
  def trainedOccupancySql(
      table: String,
      minCentroids: Int,
      targetCell: Int = 1024,
      iters: Int = 2,
      sampleFactor: Int = 32,
      routeRoundTo: Int = 6): String = {
    val ctes = trainedIvfSqlCtes(table, minCentroids, targetCell, iters,
      sampleFactor, nProbe = 1, routeRoundTo = routeRoundTo)
    s"""WITH $ctes
       |SELECT cid AS cell, COUNT(*) AS occ
       |FROM rkq WHERE crank = 1 GROUP BY cid ORDER BY cell""".stripMargin
  }
}
