package graft.operators

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

/** [[Similarity.semanticDedup]] — the SemDeDup decision rules on a
  * hand-computable 2-D fixture: cell assignment (incl. the rounded-tie →
  * lower-cid rule), within-cell-only candidacy, the least-centroid-similar
  * survivor rule with id tie-break, singleton self-clusters, and the
  * zero-/NaN-norm drop contract. */
class SemanticDedupSpec extends SparkSpecBase {

  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array(1f, 0f)),        // seed c1
      (2L, Array(0f, 1f)),        // seed c2
      (3L, Array(1f, 0.1f)),      // near-dup of 1: cos = 0.9950
      (4L, Array(0.5f, 0f)),      // scaled copy of 1: cos = 1.0
      (5L, Array(0f, 5f)),        // scaled copy of 2: cos = 1.0
      (6L, Array(1f, 1f)),        // equidistant: 0.7071 to both -> tie -> c1
      (7L, Array(-1f, 0f)),       // cell c2 (cos 0 beats cos -1), singleton
      (8L, Array(0f, 0f)),        // zero norm: dropped
      (9L, Array(Float.NaN, 1f))) // NaN norm: dropped
      .toDF("vec_id", "embedding")
  }

  test("semanticDedup: cells, clusters, survivor rule, drop contract (hand-computed)") {
    val out = Similarity.semanticDedup(fixture, nCentroids = 2, minSim = 0.99)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L), "zero/NaN norms dropped")
    // cell assignment (argmax cosine, rounded tie -> lower cid)
    assert(out(1L)._1 === 1L && out(3L)._1 === 1L && out(4L)._1 === 1L)
    assert(out(2L)._1 === 2L && out(5L)._1 === 2L && out(7L)._1 === 2L)
    assert(out(6L)._1 === 1L, "0.7071 tie to both centroids resolves to lower cid")
    // components within cells at minSim 0.99: {1,3,4}, {2,5}, singletons 6,7
    assert(Seq(1L, 3L, 4L).map(out(_)._2).distinct === Seq(1L))
    assert(Seq(2L, 5L).map(out(_)._2).distinct === Seq(2L))
    assert(out(6L)._2 === 6L && out(7L)._2 === 7L)
    // cent_sim values
    assert(out(1L)._3 === 1.0 && out(4L)._3 === 1.0)
    assert(out(3L)._3 === 0.995)
    assert(out(6L)._3 === 0.7071)
    assert(out(7L)._3 === 0.0)
    // survivor = least centroid-similar (id 3 in cluster 1), id tie-break
    // (id 2 in cluster 2); singletons keep themselves
    assert(Set(3L, 2L, 6L, 7L) === out.filter(_._2._4).keySet)
  }

  test("semanticDedup: exactly one survivor per cluster; cluster_id = min member id") {
    val out = Similarity.semanticDedup(
        Tables.load(spark, sfDir, "embeddings"), nCentroids = 8, minSim = 0.3)
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(2)).foreach { case (cid, rows) =>
      assert(rows.count(_.getBoolean(4)) === 1, s"cluster $cid survivor count")
      assert(rows.map(_.getLong(0)).min === cid, s"cluster $cid labeled by min id")
    }
  }

  test("semanticDedup: nCentroids=1 degenerates to all-pairs clustering (nearDupClusters)") {
    // one cell = no candidacy restriction: component labels must equal
    // the exact all-pairs path's; only the survivor RULE differs
    val v = Tables.load(spark, sfDir, "embeddings").withColumn("g", lit(1))
    val sem = Similarity.semanticDedup(v, nCentroids = 1, minSim = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ndc = Similarity.nearDupClusters(v, groupCol = "g", minSim = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sem === ndc, "single-cell SemDeDup must reproduce exact all-pairs components")
  }

  test("semanticExportOrder: gap-free positions in (cell, cent_sim desc, id) order") {
    val out = Similarity.semanticExportOrder(fixture, nCentroids = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._4).sorted.toSeq === out.indices.map(_.toLong), "gap-free 0-based")
    val byPos = out.sortBy(_._4)
    assert(byPos.map(t => (t._2, -t._3, t._1)).toSeq ===
      byPos.map(t => (t._2, -t._3, t._1)).sorted.toSeq,
      "positions follow (cell, cent_sim desc, id)")
  }

  test("semanticExportOrder: adjacent documents are more similar than under id order") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val vecs = v.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    def meanAdj(ids: Seq[Long]): Double =
      ids.sliding(2).map { case Seq(x, y) => cos(vecs(x), vecs(y)) }.toSeq.sum / (ids.size - 1)
    val semantic = Similarity.semanticExportOrder(v, nCentroids = 16)
      .orderBy("export_pos").collect().map(_.getLong(0)).toSeq
    val byId = semantic.sorted
    assert(meanAdj(semantic) > meanAdj(byId),
      "the In-Context-Pretraining layout must beat id order on adjacent similarity")
  }

  test("semanticDedup: trained kMeansCentroids quantizer plugs in as the scale path") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val q = Similarity.kMeansCentroids(v, k = 4, iters = 1)
    val out = Similarity.semanticDedup(v, nCentroids = 4, minSim = 0.3, quantizer = q)
    val n = v.filter(!isnan(graft.functions.VectorOps.l2Norm(col("embedding"))) &&
      graft.functions.VectorOps.l2Norm(col("embedding")) > 0).count()
    assert(out.count() === n, "every valid vector is labeled under a trained quantizer")
  }

  test("scaledCentroids: the count-conditional rule — floor 8, then n/1024, capped") {
    assert(Similarity.scaledCentroids(0L) === 8)
    assert(Similarity.scaledCentroids(8000L) === 8, "n/1024 below the floor keeps the floor")
    assert(Similarity.scaledCentroids(8192L) === 8)
    assert(Similarity.scaledCentroids(10240L) === 10, "above the floor, exactly n/1024")
    assert(Similarity.scaledCentroids(819200L) === 800)
    assert(Similarity.scaledCentroids(Long.MaxValue) === Int.MaxValue, "Int overflow capped")
    assert(Similarity.scaledCentroids(100L, minCentroids = 2, targetCell = 10) === 10)
  }

  test("knnGraphAuto: equals knnGraph at the derived centroid count") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val k = Similarity.scaledCentroids(v.count(), minCentroids = 16)
    val auto = Similarity.knnGraphAuto(v, k = 3, nProbe = 2)
      .collect().map(_.toSeq).toSet
    val pinned = Similarity.knnGraph(v, k = 3, nCentroids = k, nProbe = 2)
      .collect().map(_.toSeq).toSet
    assert(auto === pinned,
      "auto must be exactly the pinned operator at the derived count")
  }

  test("semanticDedupAuto: equals semanticDedup at the derived centroid count") {
    val v = Tables.load(spark, sfDir, "embeddings")
    val k = Similarity.scaledCentroids(v.count())
    val auto = Similarity.semanticDedupAuto(v, minSim = 0.3)
      .collect().map(_.toSeq).toSet
    val pinned = Similarity.semanticDedup(v, nCentroids = k, minSim = 0.3)
      .collect().map(_.toSeq).toSet
    assert(auto === pinned,
      "auto must be exactly the pinned operator at the derived count")
  }
}
