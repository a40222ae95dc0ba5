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

  test("resize: a decodable image payload is REALLY rescaled through the codec") {
    val s = spark
    import s.implicits._
    val payload = "gradient material for a resize test 0123456789".getBytes("UTF-8")
    val png32 = Multimodal.renderGrayPng(
      Seq((1L, payload)).toDF("media_id", "payload")).collect().head.png
    val rec = Multimodal.MediaRecord(1L, "image", png32, 32, 32, 0)
    val out = Multimodal.resize(Seq(rec).toDS(), 16, 16).collect().head
    assert(out.width === 16 && out.height === 16)
    // the resized payload is a genuine PNG of the target size, not a
    // stride-resampled byte blob …
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert(img != null, "resized payload must decode")
    assert(img.getWidth === 16 && img.getHeight === 16)
    // … and deterministic
    val again = Multimodal.resize(Seq(rec).toDS(), 16, 16).collect().head
    assert(again.payload.toSeq === out.payload.toSeq)
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

  test("renderGrayPng -> imageAHash: real codec roundtrip reproduces the byte pattern exactly") {
    val s = spark
    import s.implicits._
    val payload = "the quick brown fox jumps over the lazy dog 0123456789"
      .getBytes("UTF-8")
    val df = Seq((7L, payload)).toDF("media_id", "payload")
    val png = Multimodal.renderGrayPng(df).collect().head
    assert(png.png.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      "payload must be a genuine PNG (magic bytes)")
    val sig = Multimodal.imageAHash(Seq(png).toDS()).collect().head
    // recompute block sums / bands straight from the byte pattern: any
    // lossy step in encode -> javax.imageio decode would break this
    val sums = new Array[Long](64)
    for (i <- 0 until 1024)
      sums(((i / 32) / 4) * 8 + (i % 32) / 4) += payload(i % payload.length) & 0xff
    val total = sums.sum
    def band(k: Int): Long = (0 until 16).foldLeft(0L)((acc, j) =>
      if (sums(k * 16 + j) * 64 > total) acc | (1L << j) else acc)
    assert(sig.width === 32 && sig.height === 32)
    assert(sig.total === total)
    assert(Seq(sig.band0, sig.band1, sig.band2, sig.band3) ===
      Seq(band(0), band(1), band(2), band(3)))
  }

  test("featurize: a decodable image payload is REALLY decoded — features come from pixels, not container bytes") {
    val s = spark
    import s.implicits._
    // 16x16 gray image, every pixel 0x42 (high nibble 4)
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16) img.getRaster.setSample(x, y, 0, 0x42)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val ds = Seq(
      Multimodal.MediaRecord(1L, "image", png, 16, 16, 0),
      Multimodal.MediaRecord(2L, "audio", png, 16, 16, 0)).toDS()
    val feats = Multimodal.featurize(ds).collect()
      .map(f => f.media_id -> f.histogram.toSeq).toMap
    // image kind: decoded-pixel histogram — all mass in the 0x4 nibble
    assert(feats(1L)(4) === 1.0 && feats(1L).sum === 1.0,
      s"decoded histogram expected all-bin-4, got ${feats(1L)}")
    // audio kind (no JDK codec): same bytes stay on the container-byte
    // stub, which spreads across bins (PNG header + deflate stream)
    assert(feats(2L)(4) < 1.0, "stub histogram must differ from decoded")
  }

  test("aHashNearDupPairs: banded candidacy is COMPLETE at hamming <= 3 — equals brute force") {
    // pigeonhole: 4 bands, at most 3 differing bits => at least one band
    // is untouched, so every true pair at maxHamming <= 3 shares a band
    // key and candidacy loses nothing (at 4..16·3 it is best-effort LSH).
    val s = spark
    import s.implicits._
    val base = Seq(0xABCDL, 0x1234L, 0x5678L, 0x0F0FL)
    // 24 signatures: base plus 1-, 2- and 3-bit perturbations scattered
    // across bands, plus unrelated far signatures
    val sigs = (0 until 24).map { i =>
      val bands = base.toArray
      if (i > 0 && i < 16) {
        (0 until (i % 3) + 1).foreach { j =>
          val bit = (i * 7 + j * 13) % 64
          bands(bit / 16) ^= 1L << (bit % 16)
        }
      } else if (i >= 16) {
        (0 until 4).foreach(b => bands(b) = (i * 2654435761L + b * 40503L) & 0xFFFFL)
      }
      (i.toLong, bands(0), bands(1), bands(2), bands(3))
    }
    val df = sigs.toDF("media_id", "band0", "band1", "band2", "band3")
    val got = Multimodal.aHashNearDupPairs(df, maxHamming = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val brute = (for {
      a <- sigs; b <- sigs if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3) +
        java.lang.Long.bitCount(a._4 ^ b._4) + java.lang.Long.bitCount(a._5 ^ b._5)
      if d <= 3
    } yield (a._1, b._1) -> d.toLong).toMap
    assert(brute.nonEmpty, "fixture must generate true near pairs")
    assert(got === brute,
      s"banded candidacy must equal brute force at hamming <= 3")
  }

  test("videoNearDupPairs: frame-vote pairs identical videos; short videos stay conservative") {
    val s = spark
    import s.implicits._
    val base = ("frame material with realistic byte variation " * 8).getBytes("UTF-8") // ~352 bytes
    val other = Array.tabulate[Byte](352)(i => ((i * 37 + 11) % 96 + 32).toByte)
    val short = base.take(80) // one 64-byte frame + a sliver: can never reach 3 votes
    val df = Seq((1L, base), (2L, base), (3L, other), (4L, short))
      .toDF("media_id", "payload")
    val pairs = Multimodal.videoNearDupPairs(df, frameBytes = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)), s"got ${pairs.keySet}")
    assert(pairs((1L, 2L)) === 4L, "all aligned frames of identical videos vote match")
  }

  test("renderPcmWav -> audioAHash: real WAV codec roundtrip reproduces the byte pattern") {
    val s = spark
    import s.implicits._
    val payload = "pulse code modulated material 0123456789".getBytes("UTF-8")
    val df = Seq((9L, payload)).toDF("media_id", "payload")
    val wav = Multimodal.renderPcmWav(df).collect().head
    assert(new String(wav.wav.take(4), "US-ASCII") === "RIFF",
      "payload must be a genuine WAV container")
    val sig = Multimodal.audioAHash(Seq(wav).toDS()).collect().head
    // recompute window sums straight from the cycled byte pattern — a
    // lossy or misaligned AudioSystem decode would break this
    val sums = new Array[Long](64)
    for (i <- 0 until 1024) sums(i / 16) += payload(i % payload.length) & 0xff
    val total = sums.sum
    def band(k: Int): Long = (0 until 16).foldLeft(0L)((acc, j) =>
      if (sums(k * 16 + j) * 64 > total) acc | (1L << j) else acc)
    assert(sig.n_samples === 1024 && sig.total === total)
    assert(Seq(sig.band0, sig.band1, sig.band2, sig.band3) ===
      Seq(band(0), band(1), band(2), band(3)))
  }

  test("aHashNearDupPairs consumes audio signatures unchanged (cross-modality reuse)") {
    val s = spark
    import s.implicits._
    val a = ("distinctive audio content with loud and quiet stretches " * 4).getBytes("UTF-8")
    val b = Array.tabulate[Byte](300)(i => ((i * 53 + 7) % 96 + 32).toByte)
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("media_id", "payload")
    val sigs = Multimodal.audioAHash(Multimodal.renderPcmWav(df)).toDF()
    val pairs = Multimodal.aHashNearDupPairs(sigs, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)), s"got ${pairs.keySet}")
    assert(pairs((1L, 2L)) === 0L)
  }

  test("aHashNearDupPairs: identical images pair at hamming 0; structurally different do not") {
    val s = spark
    import s.implicits._
    val text = ("some natural looking text with plenty of variation " * 4)
      .getBytes("UTF-8")
    // stripes: alternate dark/light 64-byte runs — block structure far
    // from the near-uniform text pattern
    val stripes = Array.tabulate[Byte](512)(i =>
      if ((i / 64) % 2 == 0) 0x00.toByte else 0x7e.toByte)
    val df = Seq((1L, text), (2L, text), (3L, stripes))
      .toDF("media_id", "payload")
    val sigs = Multimodal.imageAHash(Multimodal.renderGrayPng(df)).toDF()
    val pairs = Multimodal.aHashNearDupPairs(sigs, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)), s"got ${pairs.keySet}")
    assert(pairs((1L, 2L)) === 0L, "identical images verify at hamming 0")
  }

  test("renderAnimatedGif -> gifFramePngs: real multi-frame codec roundtrip is pixel-exact") {
    val s = spark
    import s.implicits._
    // 2.5 frames worth of payload: frames 0-1 full slices, frame 2
    // partial, frame 3 empty (skipped — tail-only by construction)
    val payload = Array.tabulate[Byte](160)(i => ((i * 37 + 11) % 251).toByte)
    val df = Seq((7L, payload)).toDF("media_id", "payload")
    val gifs = Multimodal.renderAnimatedGif(df, nFrames = 4, frameBytes = 64)
    val pngs = Multimodal.gifFramePngs(gifs, nFrames = 4).collect()
      .sortBy(_.media_id)
    assert(pngs.map(_.media_id).toSeq === Seq(28L, 29L, 30L),
      "3 non-empty slices -> frames 0,1,2 of video 7 (empty tail skipped)")
    // decoded pixels must equal the slice-cycled pattern EXACTLY —
    // GIF's LZW is lossless over the identity gray palette
    pngs.zipWithIndex.foreach { case (png, f) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png.png))
      val slice = payload.slice(f * 64, math.min((f + 1) * 64, payload.length))
      var i = 0
      while (i < 32 * 32) {
        val got = img.getRaster.getSample(i % 32, i / 32, 0)
        val want = slice(i % slice.length) & 0xff
        assert(got === want, s"frame $f pixel $i")
        i += 1
      }
    }
  }

  test("maxBandDf: hot band buckets drop before the self-join; calm pairs survive") {
    val s = spark
    import s.implicits._
    // 30 identical low-entropy payloads (one hot bucket per band) + one
    // calm near-dup pair with distinctive content
    val hot = (1L to 30L).map(i => (i, Array.fill[Byte](256)(0x41)))
    val calmPay = ("distinct content with real variation across bytes " * 6)
      .getBytes("UTF-8")
    val rows = hot ++ Seq((100L, calmPay), (101L, calmPay))
    val df = rows.toDF("media_id", "payload")
    val uncapped = Multimodal.videoNearDupPairs(df, frameBytes = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)))
    assert(uncapped.size > 100, "30 identical videos pair quadratically uncapped")
    val capped = Multimodal.videoNearDupPairs(df, frameBytes = 64,
        maxBandDf = Some(16))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L)),
      "the hot bucket (30 > cap) drops; the calm pair is untouched")
    // the image-signature variant applies the same guard
    val sigs = Multimodal.imageAHash(Multimodal.renderGrayPng(df)).toDF()
    val cappedImg = Multimodal.aHashNearDupPairs(sigs, maxHamming = 6,
        maxBandDf = Some(16))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedImg === Set((100L, 101L)))
  }

  test("maxBandDf defaults ON at DefaultMaxBandDf: oversized buckets drop without opting in") {
    val s = spark
    import s.implicits._
    // one band bucket holding DefaultMaxBandDf+4 identical signatures
    // (over the cap) + a calm distinctive pair under it
    val hotN = Multimodal.DefaultMaxBandDf + 4
    val hot = (1L to hotN.toLong).map(i =>
      (i, 0x1111L, 0x2222L, 0x3333L, 0x4444L))
    val calm = Seq(
      (9001L, 0xAAAAL, 0xBBB1L, 0xCCCCL, 0xDDDDL),
      (9002L, 0xAAAAL, 0xBBB3L, 0xCCCCL, 0xDDDDL))
    val df = (hot ++ calm).toDF("media_id", "band0", "band1", "band2", "band3")
    // default args: the hot cohort must be suppressed, the calm pair kept
    val defaultPairs = Multimodal.aHashNearDupPairs(df, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(defaultPairs === Set((9001L, 9002L)),
      s"default guard must drop the ${hotN}-member bucket, got ${defaultPairs.size} pairs")
    // explicit None restores exact recall (the audit escape hatch)
    val uncapped = Multimodal.aHashNearDupPairs(df, maxHamming = 6,
        maxBandDf = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size === hotN * (hotN - 1) / 2 + 1,
      "maxBandDf=None must keep the quadratic hot cohort")
  }

  test("videoNearDupPairsGif equals videoNearDupPairs on the same fixture") {
    val s = spark
    import s.implicits._
    // same pixels either way (byte slicing vs GIF frames), so the two
    // extraction paths must emit the SAME pair set with the same votes
    val mk = (seed: Int) => Array.tabulate[Byte](256)(i =>
      ((i * seed + 13) % 240).toByte)
    val df = Seq((1L, mk(3)), (2L, mk(3)), (3L, mk(91)), (4L, mk(3)))
      .toDF("media_id", "payload")
    val direct = Multimodal.videoNearDupPairs(df, frameBytes = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaGif = Multimodal.videoNearDupPairsGif(
        Multimodal.renderAnimatedGif(df, nFrames = 4, frameBytes = 64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaGif === direct)
    assert(viaGif.map(t => (t._1, t._2)) === Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }
}
