package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.10 L4): media payloads are
  * opaque `BinaryType` columns travelling next to typed metadata; decode /
  * feature-extraction runs partition-wise through the typed Dataset API.
  *
  * IMAGE DECODE IS REAL: [[featurize]] and [[imageAHash]] run the JDK's
  * `javax.imageio` codecs (PNG/JPEG/GIF/BMP — no external libraries), and
  * [[renderGrayPng]] produces genuine PNG payloads, so the encode → decode
  * → feature path is a production codec roundtrip. VIDEO FRAMES ARE REAL
  * too, within the one multi-frame container the JDK ships a codec for:
  * [[renderAnimatedGif]] writes genuine animated GIFs and [[gifFramePngs]]
  * extracts their frames through the multi-frame reader (r14 — this
  * closed the former "frame extraction is byte slicing" stub for q138's
  * pipeline; [[frameSample]] remains as the declared byte-slice fallback
  * for container formats without a JDK codec, e.g. MP4). Payloads that no
  * JDK reader recognizes (and audio codecs beyond WAV/AIFF/AU) fall back
  * to [[decodeStub]]'s deterministic byte histogram — the honest
  * remaining stub, clearly scoped.
  */
object Multimodal {

  /** Default band-bucket occupancy cap for the aHash LSH family
    * ([[aHashNearDupPairs]] / [[videoNearDupPairs]] /
    * [[videoNearDupPairsGif]]). Low-entropy media collapse onto few
    * 16-bit band keys and the candidate self-join saturates
    * quadratically (measured r14 at sf1: 174k near-uniform frames →
    * ~2.7k distinct keys → 211M candidate rows); buckets above this cap
    * are dropped before the self-join. 256 is from the r14 cap sweep
    * (64/256/1024 → 4.0/4.3/14.8 s on the sf1 codec family): the
    * largest cap still inside the flat part of the cost curve, bounding
    * per-bucket candidates at 256² ≈ 65k while keeping every bucket a
    * plausible same-content cohort could realistically fill. */
  val DefaultMaxBandDf = 256

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
    * byte, L1-normalized — the deterministic stand-in for decode+embed on
    * media the JDK cannot decode (audio/video; undecodable blobs). */
  private[operators] def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    val p = if (payload == null) Array.emptyByteArray else payload
    p.foreach(b => hist((b & 0xff) >> 4) += 1.0)
    val n = math.max(p.length, 1)
    hist.map(_ / n)
  }

  /** REAL decode: run the JDK image codecs over the payload; Some(gray
    * samples, w, h) when a reader recognizes it, None otherwise. Color
    * images are reduced to 8-bit luminance by redrawing onto a gray
    * raster (ColorConvertOp under the hood — deterministic for a given
    * JDK); gray images keep their samples bit-exact. */
  private[operators] def tryDecodeGray(
      payload: Array[Byte]): Option[(Array[Int], Int, Int)] = {
    if (payload == null || payload.length < 8) return None
    try {
      // stream cache off: ImageIO's default spools every read through a
      // temp FILE — the dominant small-image decode cost (JVM-global
      // flag, idempotent; see renderGrayPng)
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      val gray =
        if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
        else {
          val g = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val gg = g.createGraphics()
          try gg.drawImage(img, 0, 0, null) finally gg.dispose()
          g
        }
      val out = new Array[Int](w * h)
      // TYPE_BYTE_GRAY normally backs onto one byte/px row-major:
      // bulk-read the buffer instead of per-pixel getSample dispatch —
      // but only when the sample model really is the packed layout
      // (a padded scanline stride would silently scramble pixels)
      val raster = gray.getRaster
      val packed = raster.getSampleModel match {
        case csm: java.awt.image.ComponentSampleModel =>
          csm.getScanlineStride == w && csm.getPixelStride == 1 &&
            raster.getDataBuffer.getOffset == 0 &&
            raster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte]
        case _ => false
      }
      if (packed) {
        val data = raster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        var i = 0
        while (i < w * h) { out(i) = data(i) & 0xff; i += 1 }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
      }
      Some((out, w, h))
    } catch { case _: Exception => None }
  }

  /** Partition-wise feature extraction through the typed API: one
    * iterator pass per partition, no driver collect, encoder-backed
    * (Tungsten) row conversion on both edges. Image payloads the JDK can
    * decode get a REAL feature — the 16-bin histogram of decoded
    * luminance (high nibble of each 8-bit sample), L1-normalized over
    * the pixel count; everything else falls back to the byte-histogram
    * stub, so the schema/batch shape is uniform across media kinds. */
  def featurize(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val decoded =
        if (r.kind == "image") tryDecodeGray(r.payload) else None
      val hist = decoded match {
        case Some((px, _, _)) =>
          val hh = new Array[Double](16)
          px.foreach(v => hh(v >> 4) += 1.0)
          hh.map(_ / math.max(px.length, 1))
        case None => decodeStub(r.payload)
      }
      MediaFeatures(r.media_id, r.kind,
        (if (r.payload == null) 0 else r.payload.length).toLong, hist)
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

  /** A real PNG payload: media id + encoded image bytes. */
  case class PngImage(media_id: Long, png: Array[Byte])

  /** 64-bit average-hash signature of a decoded image, packed as 4×16-bit
    * bands (the LSH join keys — the [[Dedup.portableSimHashSignatures]]
    * band convention, little-endian bit order within a band). `total` is
    * the exact luminance sum — the global-mean side of every bit
    * decision, emitted so the oracle can replay the thresholding. */
  case class ImageSignature(
      media_id: Long,
      width: Int,
      height: Int,
      total: Long,
      band0: Long,
      band1: Long,
      band2: Long,
      band3: Long)

  /** Render each payload as a REAL w×h grayscale PNG via the JDK encoder:
    * pixel(y·w+x) = payload byte cycled ((i mod len) — deterministic and
    * SQL-replayable), empty payloads render black. This is the fixture
    * half of the codec roundtrip: PNG is lossless, so whatever
    * [[imageAHash]] decodes downstream is exactly this pattern — which is
    * what lets a cross-engine oracle hash-gate a pipeline that genuinely
    * runs `javax.imageio` on every row.
    *
    * Scale shape: narrow per-row work (render + encode, no shuffle);
    * payload bytes read once. */
  def renderGrayPng(
      df: DataFrame,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      w: Int = 32,
      h: Int = 32): Dataset[PngImage] = {
    require(w > 0 && h > 0, s"target $w x $h must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      // explicit fan-out: a compact media table arrives in few input
      // splits and the per-row JDK codec work below would otherwise run
      // on ONE task (measured: the whole sf0.1 video pipeline serialized
      // on a single core). Round-robin — no key, nothing to co-locate.
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ImageIO's default stream cache is a TEMP FILE per call — the
        // dominant cost of small-image encode (measured ~7 ms/roundtrip
        // with it, ~1 ms without). Off per partition (JVM-global flag,
        // idempotent). Writer reused across rows: ImageIO.write's
        // per-call registry scan + writer allocation is the next cost.
        javax.imageio.ImageIO.setUseCache(false)
        val writer =
          javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        it.map { case (id, payload) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          // direct backing-array fill: TYPE_BYTE_GRAY is one byte/px in
          // row-major order — same pixels as per-sample writes, no
          // per-pixel bounds/band dispatch
          val data = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData
          val p = if (payload == null) Array.emptyByteArray else payload
          var i = 0
          while (i < w * h) {
            data(i) = if (p.isEmpty) 0 else p(i % p.length)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          try {
            writer.setOutput(ios)
            writer.write(img)
          } finally ios.close()
          PngImage(id, bos.toByteArray)
        }
      }
  }

  /** REAL-decode aHash: `javax.imageio` decodes each payload, the 8×8
    * block-mean average hash comes off the decoded luminance — integer-
    * exact throughout (bit b = blockSum·64 > totalSum avoids every
    * division), so the signature is bit-reproducible anywhere the pixels
    * are known. Images whose dimensions don't split into 8×8 blocks, and
    * payloads no JDK reader recognizes, are dropped (flatMap — the decode
    * gate is part of the operator's contract).
    *
    * Scale shape: narrow per-row decode, no shuffle; signatures are 4×8
    * bytes/row — the only thing that travels downstream. */
  def imageAHash(pngs: Dataset[PngImage]): Dataset[ImageSignature] = {
    import pngs.sparkSession.implicits._
    pngs.mapPartitions(_.flatMap { r =>
      tryDecodeGray(r.png).flatMap { case (px, w, h) =>
        if (w % 8 != 0 || h % 8 != 0) None
        else {
          val bw = w / 8
          val bh = h / 8
          val sums = new Array[Long](64)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              sums((y / bh) * 8 + x / bw) += px(y * w + x)
              x += 1
            }
            y += 1
          }
          val total = sums.sum
          def band(k: Int): Long = {
            var acc = 0L
            var j = 0
            while (j < 16) {
              if (sums(k * 16 + j) * 64 > total) acc |= 1L << j
              j += 1
            }
            acc
          }
          Some(ImageSignature(r.media_id, w, h, total,
            band(0), band(1), band(2), band(3)))
        }
      }
    })
  }

  /** Perceptual near-dup pairs over [[imageAHash]] signatures: LSH on the
    * 4 16-bit bands (candidates share ≥ 1 exact band — misses a pair
    * only when all four bands differ, impossible at hamming ≤ 3 and the
    * standard banding trade above), verified by exact 64-bit hamming
    * distance. Output (ia, ib, hamming) for pairs at ≤ maxHamming.
    *
    * Scale shape: the only join is keyed on (band, 16-bit key) — never
    * all-pairs; currency is 4 longs/row; band collisions among genuinely
    * distinct images thin out as 2^-16 per band — WHEN the signature
    * population has entropy. Low-entropy media (near-uniform frames:
    * blank pages, template chrome, silence) collapse onto few band keys
    * and the self-join saturates quadratically — measured r14 at sf1:
    * 174k text-slice frames landed on ~2.7k distinct keys per band and
    * the candidate join produced 211M rows. `maxBandDf` is the q108-
    * class count-conditional guard: band buckets with occupancy above
    * the cap are DROPPED before the self-join (a pure function of the
    * input, SQL-replayable; pairs whose EVERY shared band is that hot
    * are lost — the documented recall trade, hit exactly by media a
    * near-dup decision cannot distinguish anyway). The guard is ON BY
    * DEFAULT at [[DefaultMaxBandDf]] as of r15 (the r14 verdict's one
    * named scale-killer): per-bucket candidate volume is bounded at
    * cap², so the join is O(corpus · cap) worst-case instead of
    * birthday-quadratic. Pass `None` only for exact-recall audits at
    * known-small scale. */
  def aHashNearDupPairs(
      sigs: DataFrame,
      maxHamming: Int = 6,
      idCol: String = "media_id",
      maxBandDf: Option[Int] = Some(DefaultMaxBandDf)): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, s"maxHamming $maxHamming")
    require(maxBandDf.forall(_ >= 2), s"maxBandDf $maxBandDf must be >= 2")
    // the signature frame feeds the band fan-out (self-joined) AND both
    // verify joins — 4 plan references; without a barrier each one
    // re-runs the upstream CODEC pipeline (PNG/WAV encode + decode per
    // row). Persist the narrow (id, 4×long) frame: codec once, ~40 B/row
    // cached (the q64-class persist discipline; measured 3.2→1.2 s on
    // q106 at sf0.1 and it is what keeps q140's three-modality
    // composition at one codec pass per modality)
    val s = sigs.select(col(idCol).as("id"),
        col("band0"), col("band1"), col("band2"), col("band3"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val banded0 = s.select(col("id"), posexplode(
        array(col("band0"), col("band1"), col("band2"), col("band3")))
      .as(Seq("band", "bkey")))
    val banded = maxBandDf match {
      case None => banded0
      case Some(cap) =>
        val calm = banded0.groupBy("band", "bkey")
          .agg(count(lit(1)).as("__df")).where(col("__df") <= cap)
          .select("band", "bkey")
        banded0.join(calm, Seq("band", "bkey"), "left_semi")
    }
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib")).distinct()
    cand
      .join(s.toDF("ia", "a0", "a1", "a2", "a3"), Seq("ia"))
      .join(s.toDF("ib", "b0", "b1", "b2", "b3"), Seq("ib"))
      .select(col("ia"), col("ib"),
        (expr("bit_count(a0 ^ b0)") + expr("bit_count(a1 ^ b1)") +
          expr("bit_count(a2 ^ b2)") + expr("bit_count(a3 ^ b3)"))
          .cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** VIDEO near-dup via per-frame perceptual hashes — the standard
    * frame-vote shape of video dedup at corpus scale: sample n aligned
    * frames per video, hash each through the REAL codec path
    * ([[renderGrayPng]] → `javax.imageio` decode → [[imageAHash]]),
    * LSH on (frame, band, 16-bit key) so candidates share an aligned
    * frame band, then verify by counting aligned frames within
    * `maxHamming` — a pair is a near-dup when ≥ `minMatchedFrames`
    * frames agree. Frame EXTRACTION here is [[frameSample]]'s byte
    * slicing — the declared fallback for container formats the JDK has
    * no codec for (MP4 etc.); [[videoNearDupPairsGif]] is the same
    * operator with REAL multi-frame extraction for animated GIFs.
    * Everything downstream of the slice is the production pipeline and
    * runs real PNG encode/decode per frame.
    *
    * Truncated videos contribute only their non-empty frames; a video
    * with fewer than `minMatchedFrames` frames can never pair
    * (documented conservatism — absent evidence is not a match).
    *
    * Scale shape: codec work is narrow per (video, frame) row; the only
    * joins are the (fidx, band, key)-keyed candidate join and the
    * (pair, fidx)-aligned verify join — currency 4 longs per frame,
    * payloads never travel past the hash. */
  def videoNearDupPairs(
      df: DataFrame,
      nFrames: Int = 4,
      frameBytes: Int = 256,
      maxHamming: Int = 6,
      minMatchedFrames: Int = 3,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      maxBandDf: Option[Int] = Some(DefaultMaxBandDf)): DataFrame = {
    require(nFrames >= 1 && frameBytes >= 1)
    require(minMatchedFrames >= 1 && minMatchedFrames <= nFrames,
      s"minMatchedFrames $minMatchedFrames must be in [1, $nFrames]")
    val frames = df.select(col(idCol).cast("long").as("vid"),
        posexplode(frameSample(col(payloadCol).cast("binary"), nFrames, frameBytes))
          .as(Seq("fidx", "fpay")))
      .where(octet_length(col("fpay")) > 0)
    frameHashVote(renderGrayPng(
        frames.select((col("vid") * nFrames + col("fidx")).as("media_id"),
          col("fpay").as("payload"))),
      nFrames, maxHamming, minMatchedFrames, maxBandDf)
  }

  /** The shared frame-vote tail of [[videoNearDupPairs]] /
    * [[videoNearDupPairsGif]]: per-frame aHash over encoded frame PNGs
    * keyed `media_id = vid·nFrames + fidx`, LSH on (frame, band, key),
    * aligned-frame hamming verify, ≥ minMatchedFrames vote. */
  private def frameHashVote(
      framePngs: Dataset[PngImage],
      nFrames: Int,
      maxHamming: Int,
      minMatchedFrames: Int,
      maxBandDf: Option[Int] = None): DataFrame = {
    val sigs = imageAHash(framePngs).toDF()
      .select(expr(s"media_id div $nFrames").as("vid"),
        pmod(col("media_id"), lit(nFrames)).cast("int").as("fidx"),
        col("band0"), col("band1"), col("band2"), col("band3"))
      // 4 plan references below (band self-join + two verify joins):
      // persist the narrow per-frame signature so the per-frame PNG
      // encode→decode→hash runs ONCE (measured 14.7→~4 s at sf0.1)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val banded0 = sigs.select(col("vid"), col("fidx"), posexplode(
        array(col("band0"), col("band1"), col("band2"), col("band3")))
      .as(Seq("band", "bkey")))
    // maxBandDf: the aHashNearDupPairs low-entropy guard, keyed on the
    // FRAME-ALIGNED bucket (fidx, band, bkey) this operator joins on
    val banded = maxBandDf match {
      case None => banded0
      case Some(cap) =>
        val calm = banded0.groupBy("fidx", "band", "bkey")
          .agg(count(lit(1)).as("__df")).where(col("__df") <= cap)
          .select("fidx", "band", "bkey")
        banded0.join(calm, Seq("fidx", "band", "bkey"), "left_semi")
    }
    val cand = banded.as("a").join(banded.as("b"),
        col("a.fidx") === col("b.fidx") && col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("ia"), col("b.vid").as("ib")).distinct()
    cand
      .join(sigs.toDF("ia", "fidx", "a0", "a1", "a2", "a3"), Seq("ia"))
      .join(sigs.toDF("ib", "fidx", "b0", "b1", "b2", "b3"), Seq("ib", "fidx"))
      .select(col("ia"), col("ib"),
        ((expr("bit_count(a0 ^ b0)") + expr("bit_count(a1 ^ b1)") +
          expr("bit_count(a2 ^ b2)") + expr("bit_count(a3 ^ b3)"))
          <= maxHamming).as("m"))
      .groupBy("ia", "ib")
      .agg(count(when(col("m"), lit(1))).as("matched_frames"))
      .where(col("matched_frames") >= minMatchedFrames)
      .select(col("ia"), col("ib"), col("matched_frames").cast("long")
        .as("matched_frames"))
  }

  /** A real multi-frame media payload: media id + encoded ANIMATED GIF. */
  case class GifVideo(media_id: Long, gif: Array[Byte])

  /** Render each payload as a REAL animated GIF via the JDK's multi-frame
    * `javax.imageio` GIF writer (`writeToSequence`): frame f is a w×h
    * image over an explicit 256-entry GRAY palette (index v → (v,v,v)),
    * pixel(i) = byte i-mod-cycled from the f-th `frameBytes` slice of the
    * payload — the same pattern [[renderGrayPng]] pins, now inside a
    * genuine multi-frame container. GIF's LZW is lossless over palette
    * indices, so [[gifFramePngs]] decodes back the exact pattern and the
    * whole frame pipeline stays SQL-replayable. Slices are contiguous, so
    * only TAIL slices can be empty — skipped frames never perturb the
    * frame indices of the ones that exist. Payloads with no non-empty
    * slice produce no row (flatMap — a zero-frame GIF is not a GIF). */
  def renderAnimatedGif(
      df: DataFrame,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      nFrames: Int = 4,
      frameBytes: Int = 256,
      w: Int = 32,
      h: Int = 32): Dataset[GifVideo] = {
    require(nFrames >= 1 && frameBytes >= 1 && w > 0 && h > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      // explicit fan-out before the per-row JDK encoder (see
      // renderGrayPng — same single-split serialization hazard)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val writer =
          javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        // identity gray palette: index v decodes to rgb (v, v, v)
        val ramp = Array.tabulate(256)(_.toByte)
        val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
        it.flatMap { case (id, payload) =>
          val p = if (payload == null) Array.emptyByteArray else payload
          val slices = (0 until nFrames).iterator
            .map(f => p.slice(f * frameBytes, math.min((f + 1) * frameBytes, p.length)))
            .takeWhile(_.nonEmpty)
            .toSeq
          if (slices.isEmpty) None
          else {
            val bos = new java.io.ByteArrayOutputStream()
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            try {
              writer.setOutput(ios)
              writer.prepareWriteSequence(null)
              slices.foreach { s =>
                val img = new java.awt.image.BufferedImage(
                  w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
                val data = img.getRaster.getDataBuffer
                  .asInstanceOf[java.awt.image.DataBufferByte].getData
                var i = 0
                while (i < w * h) { data(i) = s(i % s.length); i += 1 }
                writer.writeToSequence(
                  new javax.imageio.IIOImage(img, null, null), null)
              }
              writer.endWriteSequence()
            } finally ios.close()
            Some(GifVideo(id, bos.toByteArray))
          }
        }
      }
  }

  /** Decode every frame of an animated GIF through the JDK reader and
    * re-encode each as a grayscale PNG for [[imageAHash]] — the REAL
    * multi-frame decode path (`reader.getNumImages(true)` + per-index
    * `read`). Gray extraction reads the palette's red channel
    * (index v → (v,v,v) ⇒ red = v, an identity by construction) rather
    * than `drawImage` into TYPE_BYTE_GRAY, whose colorspace conversion
    * is NOT value-identity for indexed sources. Rows whose payload the
    * reader rejects contribute no frames (the decode-gate contract). */
  def gifFramePngs(
      gifs: Dataset[GifVideo],
      nFrames: Int): Dataset[PngImage] = {
    import gifs.sparkSession.implicits._
    gifs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val pngWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      it.flatMap { gv =>
        try {
          val reader =
            javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(gv.gif))
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            (0 until math.min(n, nFrames)).map { f =>
              val img = reader.read(f)
              val w = img.getWidth
              val h = img.getHeight
              val gray = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val out = gray.getRaster.getDataBuffer
                .asInstanceOf[java.awt.image.DataBufferByte].getData
              var y = 0
              var i = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  out(i) = ((img.getRGB(x, y) >> 16) & 0xff).toByte
                  i += 1
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
              try {
                pngWriter.setOutput(ios)
                pngWriter.write(gray)
              } finally ios.close()
              PngImage(gv.media_id * nFrames + f, bos.toByteArray)
            }
          } finally { iis.close(); reader.dispose() }
        } catch { case _: Exception => Seq.empty }
      }
    }
  }

  /** [[videoNearDupPairs]] over REAL multi-frame media: the input is an
    * encoded ANIMATED GIF per video ([[renderAnimatedGif]]'s output or
    * any genuine GIF whose frames are 8×8-block-divisible), frames come
    * out of the container through the JDK's multi-frame decoder
    * ([[gifFramePngs]]) instead of [[frameSample]]'s byte slicing, and
    * the vote machinery is shared verbatim ([[frameHashVote]]). This
    * closes the L4 "video frame extraction is a stub" boundary for the
    * one multi-frame container the JDK genuinely ships a codec for. */
  def videoNearDupPairsGif(
      gifs: Dataset[GifVideo],
      nFrames: Int = 4,
      maxHamming: Int = 6,
      minMatchedFrames: Int = 3,
      maxBandDf: Option[Int] = Some(DefaultMaxBandDf)): DataFrame = {
    require(nFrames >= 1)
    require(minMatchedFrames >= 1 && minMatchedFrames <= nFrames,
      s"minMatchedFrames $minMatchedFrames must be in [1, $nFrames]")
    frameHashVote(gifFramePngs(gifs, nFrames), nFrames, maxHamming,
      minMatchedFrames, maxBandDf)
  }

  /** A real WAV payload: media id + encoded audio bytes. */
  case class WavAudio(media_id: Long, wav: Array[Byte])

  /** 64-window energy average-hash of decoded audio — [[ImageSignature]]'s
    * 1-D sibling, same 4×16-bit band packing so [[aHashNearDupPairs]]
    * consumes either modality unchanged. */
  case class AudioSignature(
      media_id: Long,
      n_samples: Int,
      total: Long,
      band0: Long,
      band1: Long,
      band2: Long,
      band3: Long)

  /** Render each payload as a REAL 8-bit PCM mono WAV via the JDK's
    * `javax.sound.sampled` encoder: sample(i) = payload byte cycled —
    * the audio twin of [[renderGrayPng]]. PCM WAV is lossless, so the
    * decoded samples equal this pattern and the downstream features
    * replay in SQL while `AudioSystem` genuinely runs on every row.
    * The JDK ships no MP3/AAC codec — WAV/AIFF/AU is the honest real
    * boundary for audio, exactly as PNG/JPEG is for images. */
  def renderPcmWav(
      df: DataFrame,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      nSamples: Int = 1024,
      sampleRate: Int = 8000): Dataset[WavAudio] = {
    require(nSamples >= 1 && sampleRate >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      // explicit fan-out before the per-row JDK encoder (see
      // renderGrayPng — same single-split serialization hazard)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val p = if (payload == null) Array.emptyByteArray else payload
        val samples = Array.tabulate[Byte](nSamples)(i =>
          if (p.isEmpty) 0 else p(i % p.length))
        val fmt = new javax.sound.sampled.AudioFormat(
          sampleRate.toFloat, 8, 1, false, false) // 8-bit unsigned mono PCM
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(samples), fmt, nSamples.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        WavAudio(id, bos.toByteArray)
      })
  }

  /** REAL-decode audio aHash: `AudioSystem` parses the container and
    * hands back the PCM samples; 64 equal windows of unsigned sample
    * sums threshold against the global mean (bit = windowSum·64 >
    * total — integer-exact, division-free, the [[imageAHash]] rule in
    * one dimension). Non-8-bit/mono streams and sample counts that
    * don't split into 64 windows are dropped (flatMap — the decode
    * gate is the contract). */
  def audioAHash(wavs: Dataset[WavAudio]): Dataset[AudioSignature] = {
    import wavs.sparkSession.implicits._
    wavs.mapPartitions(_.flatMap { r =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.wav))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 8 || fmt.getChannels != 1) None
        else {
          val buf = ais.readAllBytes()
          val n = buf.length
          if (n == 0 || n % 64 != 0) None
          else {
            val win = n / 64
            val sums = new Array[Long](64)
            var i = 0
            while (i < n) { sums(i / win) += buf(i) & 0xff; i += 1 }
            val total = sums.sum
            def band(k: Int): Long = {
              var acc = 0L
              var j = 0
              while (j < 16) {
                if (sums(k * 16 + j) * 64 > total) acc |= 1L << j
                j += 1
              }
              acc
            }
            Some(AudioSignature(r.media_id, n, total,
              band(0), band(1), band(2), band(3)))
          }
        }
      } catch { case _: Exception => None }
    })
  }

  /** Resize. Image payloads the JDK can decode take the REAL path:
    * decode → bilinear `Graphics2D` rescale to w×h → PNG re-encode (the
    * payload stays a valid image; [[imageAHash]]/[[featurize]] consume it
    * downstream unchanged). Opaque payloads (audio/video; undecodable
    * blobs) keep the deterministic stride resample to w·h bytes — the
    * plumbing-shape stub, clearly scoped to media without a JDK codec. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    require(w > 0 && h > 0)
    ds.mapPartitions(_.map { r =>
      val real =
        if (r.kind == "image") tryResizeImage(r.payload, w, h) else None
      real match {
        case Some(png) => r.copy(payload = png, width = w, height = h)
        case None =>
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
      }
    })
  }

  /** Decode, bilinearly rescale, re-encode as gray PNG; None when no JDK
    * reader recognizes the payload. Deterministic for a given JDK (fixed
    * interpolation hints, lossless target format). */
  private[operators] def tryResizeImage(
      payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    if (payload == null || payload.length < 8) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    } catch { case _: Exception => None }
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
