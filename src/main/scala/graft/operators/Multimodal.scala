package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.10 L4): media payloads are
  * opaque `BinaryType` columns travelling next to typed metadata; decode /
  * feature-extraction runs partition-wise through the typed Dataset API.
  *
  * The DECODE STEP IS A STUB: real image/audio codecs are not available in
  * this build environment, so [[featurize]] substitutes a deterministic
  * byte-histogram "feature" and [[frameSample]] slices raw bytes as fake
  * frames. The Spark-side plumbing — schemas, encoders, partition-wise
  * batch shape, binary functions on the relational path — is real and is
  * what the tests exercise; swap `decodeStub` for a codec call in a real
  * deployment.
  */
object Multimodal {

  /** A media row: payload + typed metadata (parquet-friendly). */
  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  /** Extracted features: fixed-width vector + provenance. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      histogram: Array[Double]) // 16-bin byte histogram, L1-normalized

  /** STUB decode: 16-bin histogram of the high nibble of each payload
    * byte, L1-normalized — a deterministic stand-in for decode+embed. */
  private[operators] def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    payload.foreach(b => hist((b & 0xff) >> 4) += 1.0)
    val n = math.max(payload.length, 1)
    hist.map(_ / n)
  }

  /** Partition-wise feature extraction through the typed API: one
    * iterator pass per partition, no driver collect, encoder-backed
    * (Tungsten) row conversion on both edges. */
  def featurize(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, decodeStub(r.payload))
    })
  }

  /** The byte-histogram featurization computed RELATIONALLY — the same
    * 16-bin high-nibble histogram as [[featurize]]'s stub, via the fused
    * [[graft.expressions.NibbleHistogram]] byte-loop kernel: each payload
    * byte is read exactly ONCE per row (the round-3 declarative form let
    * CollapseProject inline the single-referenced nibble array into the
    * 16-bin lambda — 16 re-evaluations per row, the slowest query in
    * BENCH_r03). The count→ratio division stays declarative, so the
    * DuckDB oracle still hash-gates the full pipeline (q41), and the
    * typed [[featurize]] path is asserted bin-identical in ScalaTest.
    *
    * Bins are computed on the RAW bytes ((b & 0xFF) >> 4), matching
    * [[decodeStub]] on any payload; the oracle's `ord(char)` form agrees
    * on the ASCII corpus contract. No fan-out repartition: the kernel is
    * one linear pass, so plain scan-split parallelism suffices — the
    * round-3 shuffle existed only to spread the interpreted lambdas. */
  def featurizeRelational(
      df: DataFrame,
      idCol: String = "media_id",
      kindCol: String = "kind",
      payloadCol: String = "payload"): DataFrame = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    val counts = ColumnGlue.column(graft.expressions.NibbleHistogram(
      ColumnGlue.expression(col(payloadCol).cast("binary"))))
    df.select(col(idCol), col(kindCol),
        octet_length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
        counts.as("cnt_"))
      // cnt_ is the transform's INPUT (evaluated once), not a lambda-body
      // reference — safe against the CollapseProject single-ref inline
      .select(col(idCol), col(kindCol), col("n_bytes"),
        transform(col("cnt_"),
          c => c / greatest(col("n_bytes"), lit(1L)).cast("double")).as("histogram"))
  }

  /** STUB resize: deterministic stride resampling of the payload bytes to
    * the target pixel count with metadata updated — the plumbing shape of
    * a real image scaler (payload transform + width/height rewrite) with
    * the codec swapped for arithmetic. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    require(w > 0 && h > 0)
    ds.mapPartitions(_.map { r =>
      val target = w * h
      val src = r.payload
      val out = new Array[Byte](target)
      if (src.nonEmpty) {
        var i = 0
        while (i < target) {
          out(i) = src(((i.toLong * src.length) / target).toInt % src.length)
          i += 1
        }
      }
      r.copy(payload = out, width = w, height = h)
    })
  }

  /** Fake frame sampling on the relational path: n equal binary slices of
    * the payload column (substring works on BinaryType), as an array
    * column — the batch shape a real video pipeline would produce. */
  def frameSample(payload: org.apache.spark.sql.Column, n: Int, frameBytes: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => payload.substr(i * frameBytes + 1, lit(frameBytes)))

  /** Fabricate a deterministic media Dataset from the documents table
    * (text bytes as payload) — the fixture generator for tests/bench. */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate"))
      .as[MediaRecord]
  }
}
