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
