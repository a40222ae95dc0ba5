package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  test("featurize: typed partition-wise features are deterministic and normalized") {
    val ds = Multimodal.fromDocuments(spark, sfDir)
    val feats = Multimodal.featurize(ds).collect()
    assert(feats.length === ds.count())
    feats.foreach { f =>
      assert(f.histogram.length === 16)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9, "L1-normalized histogram")
      assert(f.n_bytes > 0)
    }
    // deterministic across runs
    val again = Multimodal.featurize(ds).collect()
      .map(f => f.media_id -> f.histogram.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) === f.histogram.toSeq))
  }

  test("featurizeRelational is bin-identical to the typed mapPartitions path") {
    val ds = Multimodal.fromDocuments(spark, sfDir)
    val typed = Multimodal.featurize(ds).collect()
      .map(f => f.media_id -> ((f.kind, f.n_bytes, f.histogram.toSeq))).toMap
    val rel = Multimodal.featurizeRelational(ds.toDF()).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getSeq[Double](3)))).toMap
    assert(rel.keySet === typed.keySet)
    rel.foreach { case (id, (kind, nb, hist)) =>
      val (tKind, tNb, tHist) = typed(id)
      assert(kind === tKind && nb === tNb)
      assert(hist === tHist, s"histogram mismatch for media_id=$id")
    }
  }

  test("histNearDupPairs: exact copy and scaled copy found at cos 1; disjoint and cross-kind never pair") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "image", "aaabbbcccddd"),
      (2L, "image", "aaabbbcccddd"),               // exact copy of 1
      (3L, "image", "aaabbbcccddd" * 2),           // scaled: same ratios, cos 1
      (4L, "image", "%%%%&&&&''''"),               // nibble 2 only: orthogonal to a-d (nibble 6)
      (5L, "audio", "aaabbbcccddd")                // same bytes, other kind
    ).map { case (i, k, t) => (i, k, t.getBytes("UTF-8")) }
      .toDF("media_id", "kind", "payload")
    val pairs = Multimodal.histNearDupPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"got ${pairs.keySet}")
    assert(pairs.values.forall(_ === 1.0), "identical ratios verify at cosine 1")
  }

  test("signatureDedup: doubled payload collapses with the original; sha2-style dedup would not") {
    val s = spark
    import s.implicits._
    val base = "aaabbbcccddd"
    val df = Seq(
      (1L, "image", base),
      (2L, "image", base * 2),        // same ratios: one signature group
      (3L, "image", "zzzzyyyy"),      // different distribution
      (4L, "audio", base)             // other kind: never merged
    ).map { case (i, k, t) => (i, k, t.getBytes("UTF-8")) }
      .toDF("media_id", "kind", "payload")
    val groups = Multimodal.signatureDedup(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
    val image = groups.filter(_._1._1 == "image").map(_._2).toSet
    assert(image === Set((1L, 2L), (3L, 1L)),
      s"doubled payload must share doc 1's group: $image")
    assert(groups.count(_._1._1 == "audio") === 1)
    // the sha2 digests differ even though the signature matches
    val shas = df.filter(col("media_id").isin(1L, 2L))
      .select(sha2(col("payload"), 256)).collect().map(_.getString(0)).toSet
    assert(shas.size === 2, "raw-byte digests distinguish what the signature unifies")
  }

  test("resize: payload rescaled to target pixel count, metadata rewritten") {
    val ds = Multimodal.fromDocuments(spark, sfDir)
    val out = Multimodal.resize(ds, 8, 6).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.payload.length === 48)
      assert(r.width === 8 && r.height === 6)
    }
    // deterministic
    val again = Multimodal.resize(ds, 8, 6).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    out.foreach(r => assert(again(r.media_id) === r.payload.toSeq))
  }

  test("frameSample: n binary frames of the requested size") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "abcdefghijkl")).toDF("id", "text")
      .select(col("id"), col("text").cast("binary").as("payload"))
    val frames = df.select(Multimodal.frameSample(col("payload"), n = 3, frameBytes = 4).as("f"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.map(new String(_)) === Seq("abcd", "efgh", "ijkl"))
  }
}
