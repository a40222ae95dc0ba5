package graft.operators

import graft.SparkSpecBase
import graft.core.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {

  test("VectorOps cosine: orthogonal -> 0, parallel -> 1, known angle") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(1f, 0f), Array(0f, 1f)),
      (2L, Array(1f, 2f), Array(2f, 4f)),
      (3L, Array(1f, 0f), Array(1f, 1f))).toDF("id", "a", "b")
    val out = df.select(col("id"), VectorOps.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L)) < 1e-12)
    assert(math.abs(out(2L) - 1.0) < 1e-12)
    assert(math.abs(out(3L) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("native FloatDotProduct kernel is bit-identical to the HOF fold") {
    val v = Tables.load(spark, sfDir, "embeddings").limit(100)
      .select(col("vec_id"), col("embedding").as("a"), reverse(col("embedding")).as("b"))
    val out = v.select(
        VectorOps.dot(col("a"), col("b")).as("native"),
        VectorOps.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("float_dot is SQL-callable via GraftExtensions") {
    val r = spark.sql(
      "SELECT float_dot(cast(array(1.0, 2.0) as array<float>), " +
        "cast(array(3.0, 4.0) as array<float>))").collect().head.getDouble(0)
    assert(r === 11.0)
  }

  test("topKBruteForce: k rows per probe, descending sims, no self-pairs") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val out = Similarity.topKBruteForce(v, v.filter(col("vec_id") < 5), k = 3)
      .collect()
    assert(out.length === 15)
    out.groupBy(_.getLong(0)).foreach { case (pid, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
      assert(byRank.forall(_.getLong(2) != pid), "no self-neighbor")
      val sims = byRank.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "descending")
    }
  }

  test("topKLsh: structure holds and sims agree with brute force on shared pairs") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val probes = v.filter(col("vec_id") < 5)
    val brute = Similarity.topKBruteForce(v, probes, k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = Similarity.topKLsh(v, probes, k = 3, planes = 4).collect()
    assert(lsh.nonEmpty, "probe buckets must not be empty at 4 planes / 500 vecs")
    lsh.foreach { r =>
      assert(r.getLong(1) <= 3)
      assert(r.getLong(2) !== r.getLong(0))
      assert(math.abs(brute((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-9,
        "bucketed scoring must equal brute-force scoring for the same pair")
    }
  }

  test("topKIvf: full-probe search degenerates to exact brute force") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val probes = v.filter(col("vec_id") < 5)
    val brute = Similarity.topKBruteForce(v, probes, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ivfAll = Similarity.topKIvf(v, probes, k = 5, nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ivfAll === brute, "probing every cell must equal brute force")
  }

  test("topKIvf: partial probe returns a subset with exact scores") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val probes = v.filter(col("vec_id") < 5)
    val brute = Similarity.topKBruteForce(v, probes, k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = Similarity.topKIvf(v, probes, k = 5, nCentroids = 8, nProbe = 2).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      assert(r.getLong(1) <= 5 && r.getLong(2) != r.getLong(0))
      assert(math.abs(brute((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-9,
        "cell routing must never change pair scores")
    }
  }

  test("knnGraph: full probe equals brute-force self-kNN; rounded routing changes nothing there") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val brute = Similarity.topKBruteForce(v, v, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val graph = Similarity.knnGraph(v, k = 3, nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(graph === brute, "full-probe kNN graph must equal brute force")
  }

  test("knnGraph: production geometry keeps exact scores; candidate join never broadcasts") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val brute = Similarity.topKBruteForce(v, v, k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val g = Similarity.knnGraph(v, k = 3, nCentroids = 8, nProbe = 2)
    val rows = g.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getLong(2) != r.getLong(0))
      assert(math.abs(brute((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-9,
        "cell routing must never change pair scores")
    }
    // both sides corpus-sized: the cell-keyed candidate join must be a
    // shuffled hash join, never an estimate-driven broadcast
    val p = g.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"candidate join must shuffle-hash, plan: ${p.linesIterator.filter(_.contains("Join")).mkString(" | ")}")
  }

  test("knnGraph with a trained k-means quantizer: exact scores; full probe exact; misuse fails fast") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val trained = Similarity.kMeansCentroids(v, k = 8, iters = 2)
    val nCells = trained.count().toInt
    val brute = Similarity.topKBruteForce(v, v, k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // production geometry through the single-pass fast path
    val g = Similarity.knnGraph(v, k = 3, nCentroids = nCells,
        nProbe = math.max(1, nCells / 4), quantizer = Some(trained))
      .collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(math.abs(brute((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-9,
        "trained cell routing must never change pair scores")
    }
    // full probe over the trained quantizer degenerates to brute force
    val bruteTop = Similarity.topKBruteForce(v, v, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val full = Similarity.knnGraph(v, k = 3, nCentroids = nCells,
        nProbe = nCells, quantizer = Some(trained))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(full === bruteTop)
    // the fast path substitutes corpus for both sides: a DIFFERENT
    // corpus-sized probe frame must be rejected, not silently ignored
    intercept[IllegalArgumentException] {
      Similarity.topKIvf(v, v.filter(col("vec_id") >= 0), k = 3,
        nCentroids = 8, nProbe = 2, corpusSizedProbes = true)
    }
  }

  test("semanticNewContentOnly: full probe equals the brute-force gate; partial probe only spares, never over-drops") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val incoming = v.filter(col("vec_id") % 10 === 0)
    val corpus = v.filter(col("vec_id") % 10 =!= 0)
    val tau = 0.35
    // brute-force expectation: survivors have NO corpus neighbor >= tau
    val maxSim = Similarity.topKBruteForce(corpus, incoming, k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val allIn = incoming.select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = allIn.filter(id => maxSim.get(id).forall(_ < tau))
    val full = Similarity.semanticNewContentOnly(incoming, corpus, tau,
        nCentroids = 8, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full === expected, "full probe must equal the exact gate")
    assert(expected.size < allIn.size, "fixture must drop someone at this tau")
    // approximate geometry can only MISS dups (more survivors), never
    // drop clean content
    val part = Similarity.semanticNewContentOnly(incoming, corpus, tau,
        nCentroids = 8, nProbe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(expected.subsetOf(part), "partial probe must never over-drop")
  }

  test("randomProjection: brute-force integer equality; JL cosine preservation on fixture pairs") {
    val s = spark
    import s.implicits._
    val v = Tables.load(spark, sfDir, "embeddings").filter(col("vec_id") < 40)
    val got = Similarity.randomProjection(v, outDim = 16, salt = "v1").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    // brute force: same quantization, same bucket-parity sign matrix
    val P = 1000000007L
    def polyhash(str: String): Long =
      str.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % P)
    def sign(i: Int, j: Int): Long = {
      val h = polyhash(s"$i:${j}v1")
      if (((h + 479001599L) * (h + 987654323L)) % P % 10000L % 2L == 0L) 1L else -1L
    }
    val vecs = v.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6)).toArray)
    vecs.foreach { case (id, vq) =>
      val expect = (0 until 16).map(j =>
        vq.indices.map(i => vq(i) * sign(i, j)).sum)
      assert(got(id) === expect, s"vec $id")
    }
    // JL, loosely: projected cosine tracks original cosine (fixed salt —
    // deterministic, so the tolerance cannot flake)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val full = vecs.toMap.view.mapValues(_.map(_.toDouble)).toMap
    val proj = got.view.mapValues(_.map(_.toDouble).toArray).toMap
    val ids = full.keys.toSeq.sorted
    val errs = for (a <- ids; b <- ids if a < b)
      yield math.abs(cos(full(a), full(b)) - cos(proj(a), proj(b)))
    // expected |error| for a ±1 JL projection is Θ(1/√k) ≈ 0.2 at k=16
    // (measured 0.192 on this fixture); 0.25 bounds it without demanding
    // more accuracy than the lemma provides
    assert(errs.sum / errs.size < 0.25,
      f"mean cosine distortion ${errs.sum / errs.size}%.3f too large for JL at 16 dims")
  }

  test("rankingRecall: identical rankings score 1; disjoint score 0; missing probes score 0 not NULL") {
    val s = spark
    import s.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("pid", "nid")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L))
      .toDF("pid", "nid") // probe 3 entirely missing
    val got = Similarity.rankingRecall(approx, exact).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((2L, 2L, 1.0)))
    assert(got(2L) === ((1L, 2L, 0.5)))
    assert(got(3L) === ((0L, 1L, 0.0)), "missing probe is a recall failure, not a NULL")
    // full-probe IVF ≡ brute force ⇒ recall exactly 1 everywhere
    val v = Tables.load(spark, sfDir, "embeddings").filter(col("vec_id") < 60)
    val full = Similarity.knnGraph(v, k = 3, nCentroids = 8, nProbe = 8)
      .select(col("pid"), col("nid"))
    val bf = Similarity.topKBruteForce(v, v, k = 3).select(col("pid"), col("nid"))
    val rec = Similarity.rankingRecall(full, bf).collect().map(_.getDouble(3))
    assert(rec.nonEmpty && rec.forall(_ === 1.0),
      "full-probe IVF must recover the exact top-k everywhere")
  }

  test("topKPqAdc: complete candidacy (topC = corpus) equals brute force") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val probes = v.filter(col("vec_id") < 5)
    val n = v.count().toInt
    val brute = Similarity.topKBruteForce(v, probes, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    for (iters <- Seq(0, 2)) {
      val pq = Similarity.topKPqAdc(v, probes, k = 5, topC = n, iters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(pq === brute, s"iters=$iters: full candidacy must equal brute force")
    }
  }

  test("topKPqAdc: pruned candidacy keeps exact scores and sane recall") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val probes = v.filter(col("vec_id") < 5)
    val brute = Similarity.topKBruteForce(v, probes, k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val bruteTop = Similarity.topKBruteForce(v, probes, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Similarity.topKPqAdc(v, probes, k = 5, topC = 20, iters = 2).collect()
    assert(pq.nonEmpty)
    pq.foreach { r =>
      assert(r.getLong(1) <= 5 && r.getLong(2) != r.getLong(0))
      assert(math.abs(brute((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-9,
        "ADC pruning must never change emitted pair scores")
    }
    val hits = pq.map(r => (r.getLong(0), r.getLong(2))).count(bruteTop)
    assert(hits >= bruteTop.size / 2,
      s"recall@5 with topC=20: $hits/${bruteTop.size} — below the sanity floor")
  }

  test("pqCodebooks: shape contract and non-increasing quantization error") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val seed = Similarity.pqCodebooks(v, m = 4, ksub = 8, iters = 0)
    val rows = seed.collect()
    assert(rows.length === 4 * 8)
    assert(rows.forall(_.getSeq[Double](2).length === 16), "64 dims / m=4 -> dsub=16")
    // Lloyd on the subspaces: mean squared quantization error must not
    // increase with training (same monotonicity contract as the spherical
    // k-means used by IVF)
    def mse(books: org.apache.spark.sql.DataFrame): Double = {
      val bc = books.collect().map(r =>
        (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
      val byM = bc.keys.groupBy(_._1)
      val vecs = v.limit(200).collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
      val errs = for (vec <- vecs; norm = math.sqrt(vec.map(x => x * x).sum); if norm > 0;
                      mi <- 0 until 4) yield {
        val sub = vec.slice(mi * 16, mi * 16 + 16).map(_ / norm)
        byM(mi).map { key =>
          val c = bc(key); sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        }.min
      }
      errs.sum / errs.length
    }
    val trained = Similarity.pqCodebooks(v, m = 4, ksub = 8, iters = 3)
    assert(mse(trained) <= mse(seed) + 1e-12,
      "training must not increase quantization error")
  }

  test("kMeansCentroids: 1-cos objective non-increasing; IVF full-probe stays exact") {
    val v = Tables.load(spark, sfDir, "embeddings")
    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      v.select(col("vec_id").as("id"),
          VectorOps.l2Normalize(col("embedding")).cast("array<float>").as("vnf"))
        .join(broadcast(cents), lit(true))
        .withColumn("csim",
          VectorOps.dot(col("vnf"), col("cvec")) / VectorOps.l2Norm(col("cvec")))
        .groupBy("id").agg(max(col("csim")).as("best"))
        .agg(sum(lit(1.0) - col("best"))).collect().head.getDouble(0)

    val objs = (0 to 3).map(i =>
      objective(Similarity.kMeansCentroids(v, k = 8, iters = i)))
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"objective must not increase: $objs")
    }
    assert(objs.last < objs.head, "training must actually improve the quantizer")

    val trained = Similarity.kMeansCentroids(v, k = 8, iters = 3)
    val nCells = trained.count().toInt
    val probes = v.filter(col("vec_id") < 5)
    val brute = Similarity.topKBruteForce(v, probes, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ivf = Similarity.topKIvf(v, probes, k = 5, nCentroids = nCells, nProbe = nCells,
        quantizer = Some(trained))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ivf === brute, "probing every trained cell must equal brute force")
  }

  test("kMeansCentroids: zero-norm vectors never become (NaN) seeds") {
    val s = spark
    import s.implicits._
    // a zero vector among the first k would normalize to all-NaN, and NaN
    // compares greatest — the raw-norm pre-filter must drop it from seeding
    val rows = Seq(
      (1L, Seq(0f, 0f, 0f, 0f)),
      (2L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f, 0f)),
      (4L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0.9f, 0.1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val cents = Similarity.kMeansCentroids(rows, k = 3, iters = 2).collect()
    assert(cents.nonEmpty)
    cents.foreach { r =>
      val vec = r.getSeq[Float](1)
      assert(vec.forall(x => !x.isNaN), s"NaN centroid: $vec")
    }
  }

  test("kMeansCentroidsPortable: deterministic, ≤k cells, exact integer norms") {
    val v = Tables.load(spark, sfDir, "embeddings")
    def run() = Similarity.kMeansCentroidsPortable(v, k = 8, iters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector, r.getLong(2)))
      .sortBy(_._1)
    val a = run()
    val b = run()
    // bit-for-bit deterministic across runs (integer-exact arithmetic,
    // no float-summation-order dependence)
    assert(a.toSeq === b.toSeq)
    assert(a.length >= 1 && a.length <= 8)
    a.foreach { case (_, cq, c2) =>
      assert(c2 === cq.map(x => x * x).sum, "c2 must be the exact Σcq²")
      assert(c2 > 0L, "degenerate zero cells must drop")
      // micro-scale unit components: |cq| ≤ 10⁶ after the first M-step
      assert(cq.forall(x => math.abs(x) <= 1000000L))
    }
  }

  test("knnGraphTrained: single-cell quantizer degenerates to brute-force self-kNN") {
    val s = spark
    import s.implicits._
    val v = Tables.load(spark, sfDir, "embeddings").limit(200)
    // one centroid ⇒ one coarse anchor ⇒ one cell holding everything ⇒
    // the candidate join is all-pairs and the trained path must equal
    // the exact self-kNN (same rounding), cell routing never changes
    // scores — the topKIvf exactness property on the two-level path
    val q1 = Similarity.kMeansCentroidsPortable(v, k = 1, iters = 1)
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2), r.getDouble(3))
    val trained = Similarity.knnGraphTrained(v, q1, k = 3, nProbe = 1)
      .collect().map(norm).sortBy(t => (t._1, t._2))
    val brute = Similarity.topKBruteForce(v, v, k = 3)
      .filter(col("pid") =!= col("nid"))
      .collect().map(norm).sortBy(t => (t._1, t._2))
    assert(trained.toSeq === brute.toSeq)
  }

  test("knnGraphTrained: production two-level geometry keeps exact pair scores") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val q = Similarity.kMeansCentroidsPortable(v, k = 8, iters = 2)
    val out = Similarity.knnGraphTrained(v, q, k = 3, nProbe = 2).collect()
    assert(out.nonEmpty)
    val exact = Similarity.topKBruteForce(v, v, k = 2000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(r.getLong(0) !== r.getLong(2), "no self-pairs")
      assert(exact(key) === r.getDouble(3),
        "routing bounds candidacy, never alters scores")
    }
  }

  test("knnGraphTrained: salted candidate join is bit-identical at every salt " +
    "(adaptive included)") {
    val s = spark
    import s.implicits._
    // a dominant natural cluster: 160 of 200 vectors point the same way,
    // so one trained cell swallows them and the occupancy profile is
    // skewed enough that the adaptive path actually salts
    val rows = (0 until 200).map { i =>
      val base = if (i < 160) Seq(1f, 0.001f * i, 0f, 0f)
      else if (i < 180) Seq(0f, 1f, 0.001f * i, 0f)
      else Seq(0f, 0f, 1f, 0.001f * i)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val q = Similarity.kMeansCentroidsPortable(rows, k = 4, iters = 2)
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2), r.getDouble(3))
    def run(saltOverride: Int) =
      Similarity.knnGraphTrained(rows, q, k = 3, nProbe = 2,
        saltOverride = saltOverride).collect().map(norm).sortBy(t => (t._1, t._2))
    val unsalted = run(1)
    assert(unsalted.toSeq === run(5).toSeq,
      "salting spreads execution only — results must be bit-identical")
    assert(unsalted.toSeq === run(0).toSeq,
      "the adaptive profile-derived salt must not change results either")
  }

  test("nearDupPairs: saltFactor fans the exact pair join without changing " +
    "its result") {
    val v = Tables.load(spark, sfDir, "embeddings")
      .withColumn("g", pmod(col("vec_id"), lit(3L)))
    def run(saltFactor: Int) =
      Similarity.nearDupPairs(v, groupCol = "g", minSim = 0.2,
          saltFactor = saltFactor)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2, t._3))
    assert(run(1).toSeq === run(4).toSeq)
    intercept[IllegalArgumentException](
      Similarity.nearDupPairs(v, groupCol = "g", minSim = 0.2, saltFactor = 0))
  }

  test("cellOccupancyTrained: matches the trained assignment cell-for-cell " +
    "and sums to the routed-vector count") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val q = Similarity.kMeansCentroidsPortable(v, k = 8, iters = 2)
    val occ = Similarity.cellOccupancyTrained(v, q)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // semanticDedupTrained exposes the SAME crank=1 assignment as its
    // `cell` column (nProbe=1 two-level routing) — the profiles must agree
    val viaDedup = Similarity.semanticDedupTrained(v, q, minSim = 2.0)
      .groupBy("cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(occ === viaDedup)
    assert(occ.values.sum === viaDedup.values.sum)
    assert(occ.values.forall(_ > 0L), "only non-empty cells surface")
  }

  test("topKIvfPq: complete candidacy (full probe, topC = corpus) equals brute force") {
    val v = Tables.load(spark, sfDir, "embeddings").limit(200)
    val q = Similarity.kMeansCentroidsPortable(v, k = 4, iters = 1)
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2), r.getDouble(3))
    val got = Similarity.topKIvfPq(v, v.filter(col("vec_id") < 5), k = 3,
        quantizer = q, nProbe = Int.MaxValue, topC = 200, iters = 1)
      .collect().map(norm).sortBy(t => (t._1, t._2))
    val brute = Similarity.topKBruteForce(v, v.filter(col("vec_id") < 5), k = 3)
      .collect().map(norm).sortBy(t => (t._1, t._2))
    assert(got.toSeq === brute.toSeq)
  }

  test("topKIvfPq: production geometry returns a subset with exact scores") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val q = Similarity.kMeansCentroidsPortable(v, k = 8, iters = 2)
    val out = Similarity.topKIvfPq(v, v.filter(col("vec_id") < 5), k = 3,
      quantizer = q, nProbe = 2, topC = 64, iters = 1).collect()
    assert(out.nonEmpty)
    val exact = Similarity.topKBruteForce(v, v.filter(col("vec_id") < 5), k = 2000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    out.foreach { r =>
      assert(r.getLong(0) !== r.getLong(2), "no self-pairs")
      assert(exact((r.getLong(0), r.getLong(2))) === r.getDouble(3),
        "cell routing and ADC only prune — never alter scores")
    }
  }

  test("topKIvfPqResidual: complete candidacy (full probe, topC = corpus) equals brute force") {
    val v = Tables.load(spark, sfDir, "embeddings").limit(200)
    val q = Similarity.kMeansCentroidsPortable(v, k = 4, iters = 1)
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2), r.getDouble(3))
    val got = Similarity.topKIvfPqResidual(v, v.filter(col("vec_id") < 5), k = 3,
        quantizer = q, nProbe = Int.MaxValue, topC = 200, iters = 1)
      .collect().map(norm).sortBy(t => (t._1, t._2))
    val brute = Similarity.topKBruteForce(v, v.filter(col("vec_id") < 5), k = 3)
      .collect().map(norm).sortBy(t => (t._1, t._2))
    assert(got.toSeq === brute.toSeq,
      "residual coding cannot change a complete candidate set")
  }

  test("topKIvfPqResidual: production geometry is a subset with exact scores") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val q = Similarity.kMeansCentroidsPortable(v, k = 8, iters = 2)
    val probes = v.filter(col("vec_id") < 5)
    val out = Similarity.topKIvfPqResidual(v, probes, k = 3,
      quantizer = q, nProbe = 2, topC = 64, iters = 1).collect()
    assert(out.nonEmpty)
    val exactTop = Similarity.topKBruteForce(v, probes, k = 2000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    out.foreach { r =>
      assert(r.getLong(0) !== r.getLong(2), "no self-pairs")
      assert(exactTop((r.getLong(0), r.getLong(2))) === r.getDouble(3),
        "residual routing and ADC only prune — never alter scores")
    }
  }

  test("topKIvfPqResidual: residual codes win where residuals are STRUCTURED " +
    "(the published IVFADC motivation, planted)") {
    // Two cells whose centers live in dims {0,1} and {4,5} of each
    // subspace half; within-cell variation = 4 discrete patterns per
    // subspace in dims the centers leave at ZERO (orthogonal, equal
    // norm — normalization is a uniform scale and preserves geometry).
    // Residual coding with ksub = 4 can represent the 4 patterns per
    // subspace EXACTLY; plain coding must spend the same 4 codewords
    // on 2 cells × 4 patterns = 8 distinct subvectors and must collide.
    // A Latin-square id→(pattern₁, pattern₂) map makes the first-4-ids
    // Lloyd seed cover all 4 patterns in BOTH subspaces.
    val s = spark
    import s.implicits._
    // id layout serves BOTH first-by-id seeds: ids 0..1 span the two
    // cells (the kMeansCentroidsPortable k-seed must see one of each, or
    // Lloyd splits along the pattern dims instead) and ids 0..3 cover
    // all 4 patterns in both subspaces (the pqCodebooksFrom ksub-seed)
    val head = Seq((0, 0), (1, 1), (0, 2), (1, 3))
    val order = head ++ (for { cell <- 0 to 1; i <- 0 until 16 }
      yield (cell, i)).filterNot(head.contains)
    val rows = order.zipWithIndex.map { case ((cell, i), id) =>
      val s1 = i % 4
      val s2 = (i / 4 + i) % 4
      val sign = if (cell == 0) 100.0f else -100.0f
      def pat(p: Int) = {
        val a = Array.fill(4)(0.0f)
        a(2 + p % 2) = if (p < 2) 5.0f else -5.0f
        a
      }
      // dims 0..3: (100, ±100, pattern₁ in dims 2..3)
      // dims 4..7: (100, ±100, pattern₂ in dims 6..7)
      val v1 = Array(100.0f, sign) ++ pat(s1).drop(2)
      val v2 = Array(100.0f, sign) ++ pat(s2).drop(2)
      (id.toLong, (v1 ++ v2).toSeq, cell.toLong)
    }.toDF("vec_id", "embedding", "label")
    val q = Similarity.kMeansCentroidsPortable(rows, k = 2, iters = 2)
    val probes = rows.filter(col("vec_id") % 7 === 0)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val exact = Similarity.topKBruteForce(rows, probes, k = 3)
        .select(col("pid"), col("nid"))
      val r = Similarity.rankingRecall(df.select(col("pid"), col("nid")), exact)
        .agg(org.apache.spark.sql.functions.sum(col("hits")).as("h"),
          org.apache.spark.sql.functions.sum(col("n_exact")).as("e"))
        .collect().head
      r.getLong(0).toDouble / r.getLong(1)
    }
    val rRes = recallOf(Similarity.topKIvfPqResidual(rows, probes, k = 3,
      quantizer = q, nProbe = 1, topC = 6, m = 2, ksub = 4, iters = 2))
    val rPlain = recallOf(Similarity.topKIvfPq(rows, probes, k = 3,
      quantizer = q, nProbe = 1, topC = 6, m = 2, ksub = 4, iters = 2))
    info(f"planted-structure recall@3 at (m=2, ksub=4, nProbe=1, topC=6): " +
      f"residual $rRes%.4f vs plain $rPlain%.4f")
    assert(rRes > rPlain,
      f"residual codes must beat plain on planted-structure residuals " +
        f"(residual $rRes%.4f, plain $rPlain%.4f)")
    assert(rRes >= 0.9,
      f"residual coding represents the planted patterns near-exactly ($rRes%.4f)")
  }

  test("semanticDedupTrained: impossible threshold ⇒ all singletons keep; " +
    "survivor is the least-prototypical member") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val q = Similarity.kMeansCentroidsPortable(v, k = 4, iters = 1)
    val all = Similarity.semanticDedupTrained(v, q, minSim = 2.0).collect()
    assert(all.nonEmpty && all.forall(_.getBoolean(4)),
      "minSim > 1 admits no edges — every vector is its own surviving cluster")
    val deduped = Similarity.semanticDedupTrained(v, q, minSim = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    deduped.groupBy(_._2).foreach { case (_, members) =>
      val survivors = members.filter(_._4)
      assert(survivors.length === 1, "exactly one survivor per cluster")
      val expect = members.minBy(m => (m._3, m._1))
      assert(survivors.head._1 === expect._1,
        "survivor = lowest (cent_sim, id) — the keep-least-prototypical rule")
    }
  }

  test("nearDupPairs: threshold and ordering discipline") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val out = Similarity.nearDupPairs(v, groupCol = "label", minSim = 0.3).collect()
    assert(out.forall(_.getDouble(3) >= 0.3))
    assert(out.forall(r => r.getLong(1) < r.getLong(2)), "ia < ib canonical order")
  }

  test("HyperplaneBands kernel is bit-identical to the declarative bucket expr") {
    import org.apache.spark.sql.graftglue.ColumnGlue
    val bands = 6
    val planes = 2
    val v = Tables.load(spark, sfDir, "embeddings").limit(200)
    val kernel = ColumnGlue.column(graft.expressions.HyperplaneBands(
      ColumnGlue.expression(col("embedding")), bands, planes))
    val declarative = array((0 until bands).map(j =>
      Similarity.hyperplaneBucketExpr("embedding", planes, offset = j * planes)): _*)
    val out = v.select(kernel.as("k"), declarative.as("d")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("nearDupPairs: LSH-bucketed candidacy equals exact all-pairs on the fixture") {
    val v = Tables.load(spark, sfDir, "embeddings")
    def pairs(bands: Int) =
      Similarity.nearDupPairs(v, groupCol = "label", minSim = 0.3, bands = bands)
        .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val exact = pairs(bands = 0)
    val lsh = pairs(bands = 12)
    assert(lsh.keySet.subsetOf(exact.keySet), "bucketed path must never invent pairs")
    assert(exact.keySet === lsh.keySet,
      s"missed pairs at 12×1 planes: ${(exact.keySet -- lsh.keySet).take(5)}")
    lsh.foreach { case (k, sim) =>
      assert(sim === exact(k), "bucketing must never change pair scores")
    }
  }

  test("nearDupClusters: every vector labeled, min-id canonical, banded ≡ exact") {
    val v = Tables.load(spark, sfDir, "embeddings")
    def clusters(bands: Int) =
      Similarity.nearDupClusters(v, groupCol = "label", minSim = 0.3, bands = bands)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val exact = clusters(bands = 0)
    assert(exact.size === v.count(), "every vector gets a cluster row")
    exact.foreach { case (id, (cid, keep)) =>
      assert(cid <= id, "cluster id is the component minimum")
      assert(keep === (cid == id), "keep marks exactly the canonical member")
    }
    // components must be consistent: the canonical member of any cluster
    // maps to itself
    exact.values.map(_._1).toSet.foreach { cid: Long =>
      assert(exact(cid)._1 === cid, s"canonical $cid must be its own cluster")
    }
    assert(clusters(bands = 12) === exact,
      "banded candidacy reproduces the exact clustering on the fixture")
  }

  test("labelCentroidCos: hand-computed centroids, outlier ranks lowest, degenerates drop") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // label 0: two identical vectors + one orthogonal outlier
      (1L, Seq(1.0f, 0.0f), 0L),
      (2L, Seq(1.0f, 0.0f), 0L),
      (3L, Seq(0.0f, 1.0f), 0L),
      // label 1: single vector — centroid is itself, cos = 1
      (4L, Seq(0.5f, 0.5f), 1L),
      // label 2: zero vector — no defined cosine, must drop
      (5L, Seq(0.0f, 0.0f), 2L)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidCos(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // label-0 centroid sum = (2e6, 1e6): cos(v1) = 2/sqrt(5), cos(v3) = 1/sqrt(5)
    assert(out(1L) === math.rint(2.0 / math.sqrt(5) * 1e4) / 1e4)
    assert(out(2L) === out(1L))
    assert(out(3L) === math.rint(1.0 / math.sqrt(5) * 1e4) / 1e4)
    assert(out(3L) < out(1L), "the outlier must score below the cluster core")
    assert(out(4L) === 1.0)
    assert(!out.contains(5L), "zero vectors have no defined cosine and must drop")
  }

  test("labelCentroidCos: fixture scores are in [-1,1] and every non-degenerate vector scored") {
    val v = Tables.load(spark, sfDir, "embeddings")
      .withColumn("label", org.apache.spark.sql.functions.col("label").cast("long"))
    val rows = Similarity.labelCentroidCos(v).collect()
    assert(rows.length === v.count(), "fixture has no degenerate vectors")
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0001 && c <= 1.0001, s"cosine out of range: $c")
    }
  }

  test("marginBitextPairs: mutual best only, threshold bites, short-side denominators") {
    val s = spark
    import s.implicits._
    val src = Seq((0L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Seq(1.0f, 0.05f)),   // s0's clear match; t1's best src is s0
      (3L, Seq(0.05f, 1.0f)),   // s2's clear match
      (5L, Seq(0.7f, 0.7f)))    // equidistant hub: never anyone's mutual best
      .toDF("vec_id", "embedding")
    // k=5 > |tgt|: denominators must average over the neighbors that
    // exist, not divide by k
    val out = Similarity.marginBitextPairs(src, tgt, k = 5, minMargin = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.map(t => (t._1, t._2)).toSet === Set((0L, 1L), (2L, 3L)),
      "exactly the two mutual-best pairs; the hub mines nothing")
    assert(out.forall(_._3 > 1.0),
      "a clear match scores above its neighborhood average")
    val none = Similarity.marginBitextPairs(src, tgt, k = 5, minMargin = 10.0)
    assert(none.count() === 0L, "an unreachable threshold mines nothing")
  }

  test("classDiversity equals the brute-force mean pairwise cosine; degenerate classes behave") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.fill(8)(rnd.nextFloat() * 2 - 1)
    val varied = Seq.fill(12)(vec())
    val collapsed = Seq.fill(5)(Seq.fill(8)(0.5f)) // identical: cos = 1
    val rows =
      varied.zipWithIndex.map { case (v, i) => (i.toLong, v, 1L) } ++
        collapsed.zipWithIndex.map { case (v, i) => (100L + i, v, 2L) } ++
        Seq((200L, vec(), 3L),                       // singleton
          (201L, Seq.fill(8)(0.0f), 4L),             // zero vector drops
          (202L, vec(), 4L))
    val got = Similarity.classDiversity(rows.toDF("vec_id", "embedding", "label"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    def unit(v: Seq[Float]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      v.map(_.toDouble / n)
    }
    val us = varied.map(unit)
    val pairs = for (i <- us.indices; j <- us.indices if i != j)
      yield us(i).zip(us(j)).map { case (a, b) => a * b }.sum
    val brute = pairs.sum / pairs.size
    assert(math.abs(got(1L)._2.get - brute) < 1e-4,
      s"sum-vector identity vs brute force: ${got(1L)._2.get} vs $brute")
    assert(got(2L)._1 === 5L && math.abs(got(2L)._2.get - 1.0) < 1e-5,
      "a collapsed class reads mean cosine ~1")
    assert(got(3L) === ((1L, None)), "singleton class: NULL, not a fabricated 0")
    assert(got(4L)._1 === 1L && got(4L)._2 === None,
      "zero vector drops; the class degrades to a singleton")
  }

  test("sq8Audit: hand-built vectors — exact codes, cosine, error") {
    val s = spark
    import s.implicits._
    // v1 = (0.5, 0.25, -0.125): vq = (500000, 250000, -125000), amax=500000
    //   c = (127, round(63.5)=64, -round(31.75)=-32)
    val df = Seq(
      (1L, Seq(0.5f, 0.25f, -0.125f), 0),
      (2L, Seq(0.1f, 0.1f, 0.1f), 1),   // all equal -> perfect codes (127)
      (3L, Seq(0.0f, 0.0f, 0.0f), 2))   // zero vector -> dropped
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.sq8Audit(df).orderBy("label").collect()
    assert(out.length === 2, "zero vector dropped")
    val vq = Seq(500000L, 250000L, -125000L)
    val c = Seq(127L, 64L, -32L)
    val dot = vq.zip(c).map { case (a, b) => a * b }.sum.toDouble
    val nx2 = vq.map(x => x * x).sum.toDouble
    val nc2 = c.map(x => x * x).sum.toDouble
    val cos = BigDecimal(dot / (math.sqrt(nx2) * math.sqrt(nc2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sse = vq.zip(c).map { case (a, b) => val e = a * 127 - b * 500000L; e * e }.sum.toDouble
    val rel = BigDecimal(math.sqrt(sse) / (127.0 * math.sqrt(nx2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Double]("avg_cos") === cos)
    assert(out(0).getAs[Double]("max_rel_err") === rel)
    // uniform vector: codes all 127 -> exact reconstruction
    assert(out(1).getAs[Double]("avg_cos") === 1.0)
    assert(out(1).getAs[Double]("max_rel_err") === 0.0)
  }

  test("sq8Audit: codes bounded to [-127, 127]; error within half a step") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 50).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1), i % 3))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.sq8Audit(df).collect()
    // rel error of symmetric SQ8 is <= (1/254)*sqrt(dim)/  (||x||/amax) --
    // loose sanity: always well under 5% for dim 16, and cosine > 0.999
    out.foreach { r =>
      assert(r.getAs[Double]("max_rel_err") < 0.05)
      assert(r.getAs[Double]("min_cos") > 0.999)
    }
  }

  test("sq8Audit: partition-order-insensitive (exact integer sums)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 200).map(i =>
      (i.toLong, Seq.fill(24)(rnd.nextFloat() - 0.5f), i % 4))
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.sq8Audit(d).orderBy("label").collect().map(_.toString).mkString("|")
    assert(run(rows.toDF("vec_id", "embedding", "label").repartition(1)) ===
      run(rows.reverse.toDF("vec_id", "embedding", "label").repartition(32)))
  }

  test("kCenterSelect equals a sequential greedy reference; radii non-increasing") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(17)
    val vecs = (1 to 40).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val df = vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.kCenterSelect(df, k = 6).orderBy("rank").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    // sequential reference with the same quantization and tie-breaks
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e6)) }.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var chosen = Vector((vecs.map(_._1).min, -1L))
    val md = scala.collection.mutable.Map(
      q.keys.map(id => id -> d2(q(id), q(chosen.head._1))).toSeq: _*)
    for (_ <- 2 to 6) {
      val (pid, pd) = md.filter(_._2 > 0).toSeq
        .sortBy { case (id, dd) => (-dd, id) }.head
      chosen :+= ((pid, pd))
      q.keys.foreach(id => md(id) = math.min(md(id), d2(q(id), q(pid))))
    }
    assert(got.toSeq === chosen.map { case (id, dd) => (id, dd) })
    val radii = got.drop(1).map(_._2)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b },
      "coverage radius must be non-increasing")
  }

  test("kCenterSelect: duplicate-only residue fails loud; bounds enforced") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    intercept[IllegalStateException](Similarity.kCenterSelect(df, k = 2))
    intercept[IllegalArgumentException](Similarity.kCenterSelect(df, k = 1))
  }

  test("topKSq8: full sequential reference, code saturation, degeneracy, drops, invariance") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(83)
    val n = 40; val dim = 8
    val vecs = (0L until n.toLong).map(i =>
      (i, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    def r0(x: Double) = BigDecimal.valueOf(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def r4(x: Double) = BigDecimal.valueOf(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // sequential reference sharing every chain step
    val vq = vecs.map { case (id, e) => id -> e.map(x => r0(x.toDouble * 1000000)) }.toMap
    val n2 = vq.map { case (id, q) => id -> q.map(x => x * x).sum }
    val ratio = vq.map { case (id, q) =>
      id -> (q.map(math.abs).max.toDouble / math.sqrt(n2(id).toDouble)) }
    val qs = 127.0 / ratio.values.max
    val codes = vq.map { case (id, q) =>
      id -> q.map(x => math.floor(x.toDouble / math.sqrt(n2(id).toDouble) * qs + 0.5).toLong) }
    assert(codes.values.flatten.forall(c => math.abs(c) <= 127L),
      "8-bit range")
    assert(codes.values.flatten.map(math.abs).max === 127L,
      "the max-abs component saturates the grid")
    def refTopK(k: Int, topC: Int): Map[(Long, Long), (Long, Double, Long)] = {
      (0L until 10L).flatMap { pid =>
        val cand = (0L until n.toLong).filter(_ != pid).map { nid =>
          (nid, codes(pid).zip(codes(nid)).map { case (a, b) => a * b }.sum)
        }.sortBy { case (nid, ap) => (-ap, nid) }.take(topC)
        val scored = cand.map { case (nid, ap) =>
          val dot = vq(pid).zip(vq(nid)).map { case (a, b) => a * b }.sum
          (nid, ap, r4(dot.toDouble /
            (math.sqrt(n2(pid).toDouble) * math.sqrt(n2(nid).toDouble))))
        }.sortBy { case (nid, _, sim) => (-sim, nid) }.take(k)
        scored.zipWithIndex.map { case ((nid, ap, sim), r) =>
          (pid, r.toLong + 1L) -> ((nid, sim, ap)) }
      }.toMap
    }
    def run(topC: Int, d: org.apache.spark.sql.DataFrame = df) =
      Similarity.topKSq8(d, d.filter(col("vec_id") < 10), k = 4, topC = topC)
        .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("rank")) ->
          ((r.getAs[Long]("nid"), r.getAs[Double]("sim"),
            r.getAs[Long]("approx")))).toMap
    val got = run(topC = 12)
    assert(got === refTopK(4, 12), "production-geometry sequential equality")
    // degeneracy: topC >= corpus == exact quantized-cosine ranking
    assert(run(topC = n) === refTopK(4, n), "complete candidacy degeneracy")
    // fixture recall@4 of the pruned geometry vs the exact ranking
    val exactSets = refTopK(4, n).toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2._1).toSet).toMap
    val gotSets = got.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2._1).toSet).toMap
    val hits = exactSets.map { case (p, ex) =>
      (gotSets.getOrElse(p, Set.empty) & ex).size }.sum
    val total = exactSets.values.map(_.size).sum
    assert(hits >= (total * 9) / 10,
      s"fixture recall@4 at topC=12: $hits/$total")
    // NaN and zero vectors drop; partition invariance
    val dirty = (vecs :+ ((98L, Array.fill(dim)(0f))) :+
      ((99L, Array.fill(dim)(Float.NaN)))).toDF("vec_id", "embedding")
    assert(run(12, dirty.repartition(7)) === got,
      "drop contract + partition invariance")
    intercept[IllegalArgumentException](
      Similarity.topKSq8(df, df, k = 5, topC = 2))
  }

  test("topKSq8Ivf: routed sequential reference, degeneracy to flat SQ8, recall, invariance") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(89)
    val n = 60; val dim = 8
    // clustered fixture: 4 planted directions + noise, so routing means something
    val dirs = Array.fill(4)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val vecs = (0L until n.toLong).map { i =>
      val d = dirs((i % 4).toInt)
      (i, d.map(x => (x + (rnd.nextDouble() - 0.5) * 0.4).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    def r0(x: Double) = BigDecimal.valueOf(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def rd(x: Double, sc: Int) = BigDecimal.valueOf(x)
      .setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vq = vecs.map { case (id, e) => id -> e.map(x => r0(x.toDouble * 1000000)) }.toMap
    val n2 = vq.map { case (id, q) => id -> q.map(x => x * x).sum }
    val qs = 127.0 / vq.map { case (id, q) =>
      q.map(math.abs).max.toDouble / math.sqrt(n2(id).toDouble) }.max
    val codes = vq.map { case (id, q) =>
      id -> q.map(x => math.floor(x.toDouble / math.sqrt(n2(id).toDouble) * qs + 0.5).toLong) }
    // routing reference: centroids = first 8 by id; csim = rounded
    // float-fold dot / (stagedNorm/1e6 * centroid float L2)
    val nc = 8
    def ffold(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val cents = (0 until nc).map(c => c.toLong -> vecs(c)._2).toMap
    def csim(id: Long, c: Long): Double = rd(
      ffold(vecs(id.toInt)._2, cents(c)) /
        ((math.sqrt(n2(id).toDouble) / 1000000.0) *
          math.sqrt(ffold(cents(c), cents(c)))), 6)
    def cellsOf(id: Long, keep: Int): Seq[Long] =
      (0L until nc.toLong).map(c => (c, csim(id, c)))
        .sortBy { case (c, sc) => (-sc, c) }.take(keep).map(_._1)
    val vcell = (0L until n.toLong).map(id => id -> cellsOf(id, 1).head).toMap
    def refRouted(k: Int, topC: Int, nProbe: Int): Map[(Long, Long), (Long, Double)] = {
      (0L until 10L).flatMap { pid =>
        val probed = cellsOf(pid, nProbe).toSet
        val cand = (0L until n.toLong)
          .filter(nid => nid != pid && probed.contains(vcell(nid)))
          .map { nid => (nid, codes(pid).zip(codes(nid)).map { case (a, b) => a * b }.sum) }
          .sortBy { case (nid, ap) => (-ap, nid) }.take(topC)
        cand.map { case (nid, ap) =>
          val dot = vq(pid).zip(vq(nid)).map { case (a, b) => a * b }.sum
          (nid, ap, rd(dot.toDouble /
            (math.sqrt(n2(pid).toDouble) * math.sqrt(n2(nid).toDouble)), 4))
        }.sortBy { case (nid, _, sim) => (-sim, nid) }.take(k)
          .zipWithIndex.map { case ((nid, ap, sim), r) =>
            (pid, r.toLong + 1L) -> ((nid, sim)) }
      }.toMap
    }
    def run(topC: Int, nProbe: Int, d: org.apache.spark.sql.DataFrame = df) =
      Similarity.topKSq8Ivf(d, d.filter(col("vec_id") < 10), k = 4,
          topC = topC, nCentroids = nc, nProbe = nProbe)
        .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("rank")) ->
          ((r.getAs[Long]("nid"), r.getAs[Double]("sim")))).toMap
    val got = run(topC = 10, nProbe = 2)
    assert(got === refRouted(4, 10, 2), "production-geometry routed equality")
    // degeneracy: all cells probed + complete topC == flat SQ8 complete ranking
    val flat = Similarity.topKSq8(df, df.filter(col("vec_id") < 10), k = 4,
        topC = n).collect()
      .map(r => (r.getAs[Long]("pid"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("nid"), r.getAs[Double]("sim")))).toMap
    assert(run(topC = n, nProbe = nc) === flat,
      "nProbe=all + topC=corpus degenerates to the flat complete ranking")
    // recall at production geometry vs the complete ranking (clustered
    // fixture: routing should lose little)
    val exact = flat.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._1).toSet).toMap
    val gotSets = got.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._1).toSet).toMap
    val hits = exact.map { case (p, ex) =>
      (gotSets.getOrElse(p, Set.empty) & ex).size }.sum
    assert(hits >= (exact.values.map(_.size).sum * 3) / 4,
      s"routed recall@4: $hits/${exact.values.map(_.size).sum}")
    // partition invariance + dirty-row drops
    val dirty = (vecs :+ ((98L, Array.fill(dim)(0f))) :+
      ((99L, Array.fill(dim)(Float.NaN)))).toDF("vec_id", "embedding")
    assert(run(10, 2, dirty.repartition(7)) === got)
    intercept[IllegalArgumentException](
      Similarity.topKSq8Ivf(df, df, k = 5, topC = 2))
  }

  test("TinyIntDotProduct kernel is bit-identical to the widened integer fold") {
    import org.apache.spark.sql.graftglue.ColumnGlue
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Seq[Byte](127, -127, 0, 1), Seq[Byte](-127, 127, 5, 1)),
      (Seq[Byte](0, 0, 0, 0), Seq[Byte](127, 127, 127, 127)),
      (Seq[Byte](-128, -128, -128, -128), Seq[Byte](-128, -128, -128, -128)),
      (Seq[Byte](3, -7, 11, -13), Seq[Byte](-2, 5, 9, 8)))
      .toDF("a", "b")
    val kernel = ColumnGlue.column(graft.expressions.TinyIntDotProduct(
      ColumnGlue.expression(col("a")), ColumnGlue.expression(col("b"))))
    val widened = expr(
      "aggregate(zip_with(CAST(a AS ARRAY<BIGINT>), CAST(b AS ARRAY<BIGINT>), " +
        "(x, y) -> x * y), CAST(0 AS BIGINT), (s, v) -> s + v)")
    val out = rows.select(kernel.as("k"), widened.as("w")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(out.head.getLong(0) === 127L * -127 + -127L * 127 + 1)
  }

  test("SQ8 screen bound certifies every pair: |approx - exact| <= B, " +
    "including magnitude-skewed corner vectors") {
    // corpus rows + hand-built adversaries: one dominant component with a
    // tiny tail (worst relative quantization error) and a near-parallel
    // twin (the boundary case a screen must never cut)
    val s = spark
    import s.implicits._
    val corner = Seq(
      (100001L, Array(100f, 0.001f, -0.0007f, 0f, 0f, 0f, 0f, 0f)),
      (100002L, Array(100f, -0.001f, 0.0007f, 0f, 0f, 0f, 0f, 0f)),
      (100003L, Array(1e-4f, 1e-4f, 1e-4f, 1e-4f, 1e-4f, 1e-4f, 1e-4f, 1e-4f)),
      (100004L, Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)))
      .toDF("vec_id", "embedding")
    val emb = Tables.load(spark, sfDir, "embeddings").limit(100)
      .select(col("vec_id"),
        expr("slice(embedding, 1, 8)").cast("array<float>").as("embedding"))
      .unionByName(corner)
    val staged = Similarity.sq8ScreenStaged(
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")), "vec")
    val a = staged.select(col("id").as("ia"), col("vec").as("va"),
      col("__cd").as("ca"), col("__qs").as("sa"),
      col("__qn").as("qa"), col("__en").as("ea"))
    val b = staged.select(col("id").as("ib"), col("vec").as("vb"),
      col("__cd").as("cb"), col("__qs").as("sb"),
      col("__qn").as("qb"), col("__en").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
      .select(
        (graft.functions.VectorOps.dotTiny(col("ca"), col("cb"))
          .cast("double") / (col("sa") * col("sb"))).as("approx"),
        graft.functions.VectorOps.dot(col("va"), col("vb")).as("exact"),
        (col("qa") * col("eb") + col("ea") * col("qb") +
          col("ea") * col("eb")).as("bound"))
      .collect()
    assert(pairs.length > 4000)
    pairs.foreach { r =>
      val (approx, exact, bound) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(approx - exact) <= bound * (1 + 1e-9) + 1e-12,
        s"certified bound violated: approx=$approx exact=$exact bound=$bound")
    }
  }

  test("nearDupPairs: SQ8 code screen is exact - screened == unscreened " +
    "across thresholds and salt factors") {
    val v = Tables.load(spark, sfDir, "embeddings")
      .withColumn("g", pmod(col("vec_id"), lit(3L)))
    def run(minSim: Double, salt: Int, screen: Boolean) =
      Similarity.nearDupPairs(v, groupCol = "g", minSim = minSim,
          saltFactor = salt, codeScreen = screen)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2, t._3))
    for (minSim <- Seq(0.0, 0.2, 0.35); salt <- Seq(1, 4)) {
      val screened = run(minSim, salt, screen = true)
      val plain = run(minSim, salt, screen = false)
      assert(screened.toSeq === plain.toSeq,
        s"screen must be invisible at minSim=$minSim salt=$salt")
      assert(plain.nonEmpty || minSim > 0.3,
        s"fixture must exercise the screen at minSim=$minSim")
    }
  }

  test("boundedProbeBudget: no-op at or below maxProbes, fixed first-by-id " +
    "budget above it (the q111/q255 registered-geometry guard)") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val small = v.filter(col("vec_id") % 10 === 0) // 50 probes at sf0.001
    // below the threshold the SAME frame comes back - the gate-scale
    // plan (and the sf0.01 oracle replay) is untouched by construction
    assert(Similarity.boundedProbeBudget(small) eq small)
    // above the threshold: exactly `budget` probes, the first by id
    val capped = Similarity.boundedProbeBudget(v, maxProbes = 100, budget = 7)
    val ids = capped.select("vec_id").collect().map(_.getLong(0)).sorted
    val expect = v.select("vec_id").collect().map(_.getLong(0)).sorted.take(7)
    assert(ids.toSeq === expect.toSeq)
    intercept[IllegalArgumentException] {
      Similarity.boundedProbeBudget(v, maxProbes = 10, budget = 11)
    }
  }

  test("q111 probe-restricted topKIvf == knnGraph filtered to the probe ids " +
    "(the guard rewrite preserves the registered geometry bit-exactly)") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val probes = v.filter(col("vec_id") % 10 === 0)
    val direct = Similarity.topKIvf(v, probes, k = 3, nCentroids = 16,
        nProbe = 2, routeRoundTo = Some(6))
      .select("pid", "rank", "nid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val graph = Similarity.knnGraph(v, k = 3, nCentroids = 16, nProbe = 2)
      .filter(col("pid") % 10 === 0)
      .select("pid", "rank", "nid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(direct.nonEmpty)
    assert(direct.toSeq === graph.toSeq)
  }

  test("knnGraphTrained probeIds == full graph filtered to the same ids " +
    "(the q251 guard rewrite preserves the registered geometry bit-exactly)") {
    val s = spark
    import s.implicits._
    val v = Tables.load(spark, sfDir, "embeddings")
    val q = Similarity.kMeansCentroidsPortable(v, k = 8, iters = 2)
    val ids = v.filter(col("vec_id") % 10 === 0).select(col("vec_id").as("pid"))
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2), r.getDouble(3))
    val restricted = Similarity.knnGraphTrained(v, q, k = 3, nProbe = 2,
        probeIds = Some(ids))
      .collect().map(norm).sortBy(t => (t._1, t._2))
    val filtered = Similarity.knnGraphTrained(v, q, k = 3, nProbe = 2)
      .filter(col("pid") % 10 === 0)
      .collect().map(norm).sortBy(t => (t._1, t._2))
    assert(restricted.nonEmpty)
    assert(restricted.toSeq === filtered.toSeq)
  }
}
