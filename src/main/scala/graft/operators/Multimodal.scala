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

  /** Media NEAR-dup candidate pairs over the byte-histogram signature —
    * multimodal dedup with the decode stub in place of a real
    * perceptual feature (the plumbing — banding, candidate join, exact
    * verify — is the production shape; swap the histogram for pHash/
    * CLIP features when codecs exist). Same-kind payloads whose
    * nibble-count cosine reaches `minCos`, found by LSH over the
    * histogram: 16 bins → 4 bands of 4, band key = the band's ratios
    * quantized to 1/16 — candidates must share ≥1 full band key
    * (recall caveat: a pair straddling a quantization boundary in every
    * band is missed — the standard LSH trade, tunable via band count).
    *
    * Scale shape: one fused-kernel featurize pass (integer counts, no
    * normalization — cosine is scale-invariant, so RAW counts verify
    * exactly with no float histogram anywhere); band keys narrow; one
    * (kind, band, key)-keyed self-join; exact verify only on candidates.
    * Dot/norms are exact int64 (≤ 16·n_bytes² per pair), the final
    * cosine is the only float — q106 replays the whole pipeline. */
  def histNearDupPairs(
      df: DataFrame,
      idCol: String = "media_id",
      kindCol: String = "kind",
      payloadCol: String = "payload",
      minCos: Double = 0.995): DataFrame = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    val cnt = ColumnGlue.column(graft.expressions.NibbleHistogram(
      ColumnGlue.expression(col(payloadCol).cast("binary"))))
    val feat = df.select(col(idCol).as("id"), col(kindCol).as("kind"),
        octet_length(col(payloadCol).cast("binary")).cast("long").as("nb"),
        cnt.as("cnt"))
      .where(col("nb") > 0)
    def bandKey(b: Int) = concat_ws("_",
      (0 until 4).map(k =>
        floor(element_at(col("cnt"), b * 4 + k + 1) * 16 / col("nb"))): _*)
    val banded = feat.select(col("id"), col("kind"),
      posexplode(array((0 until 4).map(bandKey): _*)).as(Seq("band", "bkey")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.kind") === col("b.kind") && col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib")).distinct()
    val dotOf = (x: String, y: String) =>
      expr(s"aggregate(zip_with($x, $y, (p, q) -> p * q), 0L, (acc, v) -> acc + v)")
    cand
      .join(feat.select(col("id").as("ia"), col("cnt").as("ca")), Seq("ia"))
      .join(feat.select(col("id").as("ib"), col("cnt").as("cb")), Seq("ib"))
      .select(col("ia"), col("ib"),
        dotOf("ca", "cb").as("dot"),
        dotOf("ca", "ca").as("na2"),
        dotOf("cb", "cb").as("nb2"))
      .where(col("na2") > 0 && col("nb2") > 0)
      .select(col("ia"), col("ib"),
        round(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))),
          4).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Signature-exact media dedup — [[graft.operators.Dedup.exact]] in
    * FEATURE space: group same-kind payloads by their exact feature
    * signature (here the L1 ratio pair (count vector reduced by its
    * gcd)) instead of the raw-byte digest. Robust to what byte digests
    * are not: the same decoded content re-encoded or concatenated with
    * itself (any payload whose nibble counts are an integer multiple)
    * lands in one group, while sha2 sees distinct blobs. With a real
    * perceptual feature in place of the stub this is pHash-bucket
    * dedup; the grouping/keep/count plumbing is identical.
    *
    * Scale shape: one fused-kernel featurize pass, gcd reduction narrow
    * per row, ONE (kind, signature) aggregation — linear at any corpus
    * size (the near-dup PAIR search, [[histNearDupPairs]], is the
    * quadratic-output audit for bounded probe sets). Output: (kind,
    * signature string, keep_id = min member, n_copies). */
  def signatureDedup(
      df: DataFrame,
      idCol: String = "media_id",
      kindCol: String = "kind",
      payloadCol: String = "payload"): DataFrame = {
    import org.apache.spark.sql.graftglue.ColumnGlue
    val cnt = ColumnGlue.column(graft.expressions.NibbleHistogram(
      ColumnGlue.expression(col(payloadCol).cast("binary"))))
    // gcd of the 16 counts: fold Euclid over the array — 63 bounded mod
    // steps per pair covers any int64 input (Fibonacci worst case);
    // Spark has no gcd builtin, the oracle's DuckDB side uses its own
    val gcdFold =
      """aggregate(cnt, 0L, (g, x) ->
        |  CASE WHEN x = 0 THEN g WHEN g = 0 THEN x ELSE
        |    aggregate(sequence(1, 63),
        |      named_struct('a', greatest(g, x), 'b', least(g, x)),
        |      (st, i) -> IF(st.b = 0L, st, named_struct('a', st.b, 'b', st.a % st.b)),
        |      st -> st.a)
        |  END)""".stripMargin
    df.select(col(idCol).as("id"), col(kindCol).as("kind"), cnt.as("cnt"))
      .where(octet_length(col(payloadCol).cast("binary")) > 0)
      // canonical ratio signature: the count vector divided by its gcd —
      // exact integer arithmetic (no float ratios anywhere), so doubled
      // payloads collapse to the same signature deterministically
      .select(col("id"), col("kind"), col("cnt"), expr(gcdFold).as("g"))
      .select(col("id"), col("kind"),
        expr("array_join(transform(cnt, c -> c div g), '_')").as("signature"))
      .groupBy("kind", "signature")
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_copies"))
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
