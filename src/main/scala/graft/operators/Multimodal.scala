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
    * 16-bin high-nibble histogram as [[featurize]]'s stub, but in pure
    * Catalyst expressions, so the pipeline is ANSI-expressible and the
    * DuckDB oracle hash-gates it (q41). Cross-checked bin-for-bin against
    * the typed path in ScalaTest.
    *
    * ASCII contract (same as [[graft.expressions.AsciiPolyHash]]): byte
    * values are read as `ascii(substr(payload-as-text, i, 1))`, which
    * equals the raw byte only for single-byte code points — the
    * oracle-facing semantics are defined over ASCII payloads; binary
    * media stays on the typed path. */
  def featurizeRelational(
      df: DataFrame,
      idCol: String = "media_id",
      kindCol: String = "kind",
      payloadCol: String = "payload"): DataFrame = {
    // staged projections (Catalyst does not CSE into lambda bodies): the
    // payload→string cast and the nibble array each materialize as an
    // attribute before the next lambda references them
    df.select(col(idCol), col(kindCol),
        octet_length(col(payloadCol)).cast("long").as("n_bytes"),
        col(payloadCol).cast("string").as("txt_"))
      // fan-out barrier before the CPU-heavy histogram lambdas: a compact
      // single-split media table would otherwise run them in one task
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .withColumn("nibs_",
        when(length(col("txt_")) === 0, expr("cast(array() as array<int>)"))
          // split(txt, ''), NOT sequence+substr: substr(txt, i, 1) seeks
          // from the string head — O(len²) per doc — and sequence(1, 0)
          // on an empty string is DESCENDING [1, 0], not empty. The char
          // split is one linear pass, so even when CollapseProject
          // inlines this single-referenced array into the 16-bin
          // histogram lambda (16 re-evaluations), the cost stays
          // O(16·len), not O(16·len²)
          .otherwise(expr("transform(split(txt_, ''), c -> ascii(c) div 16)")))
      .select(col(idCol), col(kindCol), col("n_bytes"),
        expr("""transform(sequence(0, 15),
                 k -> size(filter(nibs_, v -> v = k))
                      / cast(greatest(n_bytes, 1) as double))""").as("histogram"))
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
