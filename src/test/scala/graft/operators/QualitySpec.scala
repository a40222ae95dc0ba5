package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.Row

/** Repetition-metric contracts, checked against brute-force Scala
  * computations over the same texts (the metrics are exact set/count
  * arithmetic — the only engine-side approximation is the 64-bit gram
  * hash currency, whose collision odds are ~2⁻⁶⁴ per doc). */
class QualitySpec extends SparkSpecBase {
  private val s_ = spark
  import s_.implicits._

  private def brute(text: String): (Long, Double, Double, Double, Double) = {
    val toks = text.split("\\s+").toSeq
    def grams(k: Int): Seq[String] =
      if (toks.size < k) Seq.empty else toks.sliding(k).map(_.mkString(" ")).toSeq
    def dup(g: Seq[String]): Double =
      if (g.isEmpty) 0.0
      else BigDecimal(1.0 - g.distinct.size.toDouble / g.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val g2 = grams(2)
    val top2 =
      if (g2.isEmpty) 0.0
      else BigDecimal(g2.groupBy(identity).values.map(_.size).max.toDouble / g2.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ttr = BigDecimal(toks.distinct.size.toDouble / toks.size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (toks.size.toLong, ttr, dup(g2), dup(grams(3)), top2)
  }

  test("metrics match a brute-force computation on varied texts") {
    val texts = Seq(
      "a a a a",                                    // maximal repetition
      "the quick brown fox jumps over the lazy dog",
      "spam spam spam spam spam ham spam spam",
      "one two three one two three one two three",  // phrase loop
      "solo",                                       // 1 token: no grams
      "x y")                                        // 2 tokens: g2 only
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Quality.repetitionMetrics(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === brute(t), s"doc $i: '$t'")
    }
  }

  test("repetitionFilter keeps varied text and drops degenerate text") {
    val df = Seq(
      (0L, "the quick brown fox jumps over a lazy dog while birds sing"),
      (1L, "buy now buy now buy now buy now buy now buy now")
    ).toDF("doc_id", "text")
    val verdicts = Quality.repetitionFilter(df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(verdicts(0L), "varied text should pass")
    assert(!verdicts(1L), "looped text should fail")
  }

  test("unigramSurprisal matches brute force and orders rarity correctly") {
    val texts = Seq(
      (0L, "common common common common"),       // all high-freq tokens
      (1L, "common common rareword oddity"),     // half rare
      (2L, "zyx qwv plk mnb"))                   // all singletons
    val df = texts.toDF("doc_id", "text")
    val toks = texts.flatMap(_._2.split("\\s+"))
    val total = toks.size.toDouble
    val freq = toks.groupBy(identity).view.mapValues(_.size).toMap
    def brute(t: String): Double = {
      val ts = t.split("\\s+")
      BigDecimal(ts.map(w => -math.log(freq(w) / total)).sum / ts.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Quality.unigramSurprisal(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    texts.foreach { case (id, t) =>
      assert(math.abs(got(id) - brute(t)) <= 0.0001, s"doc $id") }
    assert(got(0L) < got(1L) && got(1L) < got(2L),
      "rarer vocabulary must score more surprising")
  }

  test("bigramSurprisal matches brute force; garbled transitions outscore natural ones") {
    val texts = Seq(
      (0L, "a b"), (1L, "a b"), (2L, "a c"),     // hand-checkable tiny LM
      (3L, "the cat sat the cat sat the cat sat"),
      (4L, "sat the cat cat sat the sat cat the"), // same words, shuffled
      (5L, "solo"))                               // <2 tokens: absent
    val df = texts.toDF("doc_id", "text")
    val bigrams = texts.flatMap(_._2.split("\\s+").sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq)
    val bf = bigrams.groupBy(identity).view.mapValues(_.size).toMap
    val cu = bigrams.groupBy(_._1).view.mapValues(_.size).toMap
    val v = bigrams.flatMap(p => Seq(p._1, p._2)).distinct.size
    def brute(t: String): Double = {
      val bs = t.split("\\s+").sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq
      val s = bs.map(b => BigDecimal(-math.log((bf(b) + 1.0) / (cu(b._1) + v)))
        .setScale(14, BigDecimal.RoundingMode.HALF_UP)).sum
      (s / bs.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Quality.bigramSurprisal(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 0: one bigram (a,b): cb=2, cu(a)=3, V=6 (whole-corpus vocab)
    // -> -ln((2+1)/(3+6)) = ln 3
    assert(got(0L)._1 === 1L)
    assert(math.abs(got(0L)._2 - math.log(3.0)) <= 0.0001)
    texts.filter(_._2.split("\\s+").length >= 2).foreach { case (id, t) =>
      assert(math.abs(got(id)._2 - brute(t)) <= 0.0001, s"doc $id") }
    assert(!got.contains(5L), "single-token doc has no transitions")
    assert(got(4L)._2 > got(3L)._2,
      "shuffled word order must score more surprising than the natural loop")
  }

  test("knTrigramSurprisal matches a sequential Kneser-Ney reference; shuffled text spikes") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      (0L, "the cat sat on the mat and the cat sat on the rug"),
      (1L, "the cat sat on the mat and the dog sat on the rug"),
      (2L, "rug the on sat cat mat the on the and sat cat the"), // shuffled 0
      (3L, "a b"),                                               // <3 tokens: absent
      (4L, "the cat sat"))
    val df = texts.toDF("doc_id", "text")
    // sequential interpolated-KN reference, D = 0.75, continuation counts
    val tris = texts.flatMap(_._2.split("\\s+").sliding(3)
      .filter(_.size == 3).map(a => (a(0), a(1), a(2))))
    val c3 = tris.groupBy(identity).view.mapValues(_.size).toMap
    val types = c3.keys.toSeq
    val cden = types.groupBy(t => (t._1, t._2)).view
      .mapValues(ts => ts.map(c3).sum).toMap
    val t3c = types.groupBy(t => (t._1, t._2)).view.mapValues(_.size).toMap
    val bcTypes = types.map(t => (t._2, t._3)).distinct
    val cb = types.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    val den2 = bcTypes.groupBy(_._1).view.mapValues(ts => ts.map(cb).sum).toMap
    val t2c = bcTypes.groupBy(_._1).view.mapValues(_.size).toMap
    val nw3 = bcTypes.groupBy(_._2).view.mapValues(_.size).toMap
    val nbi = bcTypes.size
    def p(tr: (String, String, String)): Double = {
      val p1 = nw3(tr._3).toDouble / nbi
      val p2 = (math.max(cb((tr._2, tr._3)) - 0.75, 0.0) +
        (0.75 * t2c(tr._2)) * p1) / den2(tr._2)
      (math.max(c3(tr) - 0.75, 0.0) + (0.75 * t3c((tr._1, tr._2))) * p2) /
        cden((tr._1, tr._2))
    }
    def brute(t: String): Double = {
      val ts = t.split("\\s+").sliding(3).filter(_.size == 3)
        .map(a => (a(0), a(1), a(2))).toSeq
      val sm = ts.map(tr => BigDecimal(-math.log(p(tr)))
        .setScale(14, BigDecimal.RoundingMode.HALF_UP)).sum
      (sm / ts.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def run(d: org.apache.spark.sql.DataFrame) =
      Quality.knTrigramSurprisal(d).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = run(df)
    texts.filter(_._2.split("\\s+").length >= 3).foreach { case (id, t) =>
      assert(got(id)._1 === t.split("\\s+").length - 2L, s"doc $id count")
      assert(math.abs(got(id)._2 - brute(t)) <= 0.0001, s"doc $id") }
    assert(!got.contains(3L), "two-token doc has no trigrams")
    assert(got.values.forall(_._2 > 0.0), "every probability < 1 so -ln P > 0")
    assert(got(2L)._2 > got(0L)._2,
      "shuffled word order must score more surprising than the natural text")
    assert(got(1L)._2 > got(0L)._2,
      "the one-word substitution breaks two repeated trigrams and must cost")
    assert(run(df.repartition(7)) === got, "partition invariance")
  }

  test("tokenEntropy: uniform doc hits ln(n); constant doc hits zero; brute force matches") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      (0L, "a b c d"),          // all distinct: entropy = ln 4, norm = 1
      (1L, "x x x x x"),        // constant: entropy = 0
      (2L, "a a b b b c"),      // mixed, hand-checkable
      (3L, "solo"))             // 1 token: entropy 0, norm 0 by convention
    val got = Quality.tokenEntropy(texts.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def brute(t: String): Double = {
      val ts = t.split("\\s+").toSeq
      val n = ts.size.toDouble
      val e = ts.groupBy(identity).values
        .map(g => BigDecimal(-(g.size / n) * math.log(g.size / n))
          .setScale(14, BigDecimal.RoundingMode.HALF_UP)).sum
      e.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    texts.foreach { case (id, t) =>
      assert(math.abs(got(id)._2 - brute(t)) <= 0.0001, s"doc $id") }
    assert(math.abs(got(0L)._2 - math.log(4.0)) <= 0.0001)
    assert(got(0L)._3 === 1.0, "all-distinct doc: normalized entropy 1")
    assert(got(1L)._2 === 0.0 && got(1L)._3 === 0.0)
    assert(got(3L) === ((1L, 0.0, 0.0)))
    assert(got(2L)._2 > got(1L)._2 && got(2L)._2 < got(0L)._2 + 0.5)
  }

  test("compressionRatio: kernel equals driver-side Deflater; repetition compresses below prose") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      (0L, "a" * 400),                                       // degenerate loop
      (1L, "the quick brown fox jumps over the lazy dog " * 8),
      (2L, (1 to 60).map(i => s"unique$i word$i").mkString(" ")), // varied
      (3L, ""))                                              // empty: NULL ratio
    def brute(t: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(t.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](8192); var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        n
      } finally d.end()
    }
    val got = Quality.compressionRatio(texts.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, t) =>
      assert(got(id).getLong(2) === brute(t), s"doc $id") }
    assert(got(3L).isNullAt(3), "empty payload has no defined ratio")
    val ratio = (id: Long) => got(id).getDouble(3)
    assert(ratio(0L) < ratio(1L) && ratio(1L) < ratio(2L),
      "more redundancy must compress further")
    assert(ratio(0L) < 0.1 && ratio(2L) > 0.2)
    // SQL-registered kernel reaches pure-SQL users
    val viaSql = s.sql("SELECT deflate_size('aaaaaaaaaa')").head().getLong(0)
    assert(viaSql === brute("aaaaaaaaaa"))
  }

  test("importanceWeights: target == corpus is exactly zero everywhere") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "alpha beta gamma"), (1L, "delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    // identical LMs (tf == cf, nt == nc) make every token's log-ratio
    // exactly 0.0 — not approximately: both ln() calls see the same double
    val out = Quality.importanceWeights(df, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === 2)
    out.foreach { case (_, _, w) => assert(w === 0.0) }
  }

  test("importanceWeights: in-domain documents outrank out-of-domain") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (0L, "physics quantum field theory lattice"),
      (1L, "recipe butter sugar flour oven"),
      (2L, "quantum lattice physics papers")
    ).toDF("doc_id", "text")
    val target = Seq((100L, "quantum physics lattice field"))
      .toDF("doc_id", "text")
    val w = Quality.importanceWeights(corpus, target).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(0L) > w(1L) && w(2L) > w(1L),
      s"physics docs must outscore the recipe: $w")
  }

  test("boilerplateNgrams: planted banner tops the audit with exact document frequency") {
    val s = spark
    import s.implicits._
    val banner = "subscribe to our newsletter"
    // body tokens all embed the doc id, so every gram crossing the
    // banner/body boundary is unique to its doc — only the banner's own
    // 4-gram repeats across docs
    val docs = (0L until 10L).map { i =>
      val body = s"u$i v$i w$i x$i y$i"
      i -> (if (i < 7) s"$banner $body" else body)
    }.toDF("doc_id", "text")
    val top = Quality.boilerplateNgrams(docs, n = 4, k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // the banner's single 4-gram appears in 7 docs; everything else is unique (df=1)
    assert(top.head === (banner -> 7L))
    assert(top.tail.forall(_._2 === 1L))
    // per-doc DISTINCT: repeating the banner twice in one doc must not inflate df
    val rep = Seq((0L, s"$banner x $banner"), (1L, banner)).toDF("doc_id", "text")
    val df = Quality.boilerplateNgrams(rep, n = 4, k = 1).collect().head.getLong(1)
    assert(df === 2L)
  }

  test("boilerplateNgrams: top-k plans as TakeOrdered, not a global sort exchange") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val p = Quality.boilerplateNgrams(docs).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must use per-partition heaps: ${p.linesIterator.take(5).mkString(" | ")}")
  }

  test("distributionDrift: corpus-identical slices score exactly zero") {
    val s = spark
    import s.implicits._
    // every slice has the same distribution, so slice = corpus token-wise:
    // p = q ⇒ every contribution is p·ln(1) = 0 exactly (no float residue)
    val docs = Seq(
      (1L, "x x y", "a"), (2L, "x x y", "b"), (3L, "x x y", "c")
    ).toDF("doc_id", "text", "source")
    val drift = Quality.distributionDrift(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(drift === Map("a" -> 0.0, "b" -> 0.0, "c" -> 0.0))
  }

  test("distributionDrift: symmetric slices score identically; skew scores positive") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x x y", "a"), (2L, "x x y", "b"),
      (3L, "z z z", "c"), (4L, "x y z", "c")
    ).toDF("doc_id", "text", "source")
    val drift = Quality.distributionDrift(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(drift("a") === drift("b"), "interchangeable slices must score identically")
    assert(drift("c") > 0.0, "a skewed slice must show positive drift")
    // Gibbs: KL(p‖q) ≥ 0 up to the output rounding
    drift.values.foreach(v => assert(v >= -1e-6, s"negative KL: $v"))
  }

  test("distributionDrift: fixture drift is non-negative with one row per source") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val n = docs.select("source").distinct().count()
    val rows = Quality.distributionDrift(docs).collect()
    assert(rows.length === n)
    rows.foreach(r => assert(r.getDouble(1) >= -1e-6))
  }

  test("fixture metrics land in [0,1] and every doc gets a row") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val rows = Quality.repetitionFilter(docs).collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      Seq(2, 3, 4, 5).foreach { c =>
        val v = r.getDouble(c)
        assert(v >= 0.0 && v <= 1.0, s"metric col $c out of range: $v")
      }
    }
  }

  test("zipfSlope: two-point spectrum fits exactly (hand-computed slope, r2=1)") {
    val s2 = spark; import s2.implicits._
    // two types: aa count 6 (rank 1), bb count 2 (rank 2) — OLS through
    // two points is exact: slope = (ln2 − ln6)/(ln2 − ln1) = ln(1/3)/ln2
    val df = Seq.fill(6)(("s1", "aa")) ++ Seq.fill(2)(("s1", "bb"))
    val rows = Quality.zipfSlope(df.toDF("source", "text")).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(1) === 2L)
    val want = math.log(2.0 / 6.0) / math.log(2.0)
    assert(math.abs(r.getDouble(2) - want) < 5e-4, s"slope ${r.getDouble(2)} vs $want")
    assert(r.getDouble(3) === 1.0, "two points fit exactly")
  }

  test("zipfSlope: single-type slice yields null slope, not NaN") {
    val s2 = spark; import s2.implicits._
    val rows = Quality.zipfSlope(
      Seq(("s1", "aa aa aa")).toDF("source", "text")).collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(2) && rows.head.isNullAt(3))
  }

  test("pmiCollocations: hand-computed lift on a planted collocation") {
    val s2 = spark; import s2.implicits._
    // "x y" always adjacent (5 times), filler "a" everywhere: x y beat
    // independent expectation; a-pairs don't
    val df = Seq(
      (1L, "x y a a x y a a"),
      (2L, "x y a a x y a a"),
      (3L, "x y a a a a a a"))
      .toDF("doc_id", "text")
    val rows = Quality.pmiCollocations(df, k = 3, minCount = 5L).collect()
    // bigram counts: per doc1/2: [x y, y a, a a, a x, x y, y a, a a] ...
    // c(x y)=5, toks: nt=24, cu(x)=5, cu(y)=5; np = 3*7=21
    // pmi(x,y) = ln((5/21)/((5/24)*(5/24))) = ln(5*24*24/(21*5*5))
    val expected = math.log(5.0 / 21.0 / ((5.0 / 24.0) * (5.0 / 24.0)))
    val xy = rows.find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    assert(xy.getLong(2) === 5L)
    assert(math.abs(xy.getDouble(3) - expected) < 5e-5)
    // planted collocation must outrank the filler pairs
    assert((rows.head.getString(0), rows.head.getString(1)) === (("x", "y")))
  }

  test("pmiCollocations: minCount floors hapax pairs out") {
    val s2 = spark; import s2.implicits._
    val df = Seq((1L, "p q r s t u v w")).toDF("doc_id", "text")
    // every bigram occurs once -> nothing survives minCount=2
    assert(Quality.pmiCollocations(df, k = 10, minCount = 2L).count() === 0)
  }

  test("vocabCoverage: hand-computed slices, frequency-then-token tie-break") {
    val s2 = spark; import s2.implicits._
    // corpus counts: b=5 (3+2), a=4 (3+1), c=2, d=1 -> top-2 vocab {b, a}
    // (a beats c on count; b beats a on count)
    val df = Seq(
      ("s1", "a a a b b b"),          // 6 toks, all in vocab
      ("s2", "a b b c c d"))          // 6 toks, in-vocab 3 (a,b,b), oov types {c,d}
      .toDF("src", "text")
    val rows = Quality.vocabCoverage(df, sliceCol = "src", vocabSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows === Array(("s1", 6L, 6L, 1.0, 0L), ("s2", 6L, 3L, 0.5, 2L)))
  }

  test("decimal-accumulation determinism: means identical across shuffle-partition counts") {
    // The q73 regression class: a raw-double avg's partial sums merge in
    // partition order, so a mean within a half-ulp of the 4th-decimal
    // rounding boundary flips between parallelism configurations. The
    // DECIMAL(28,14) contribution discipline makes the statistic exact —
    // prove it by running the same queries under two different shuffle
    // geometries and demanding bit-identical output.
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    def run(): (Seq[Row], Seq[Row]) = (
      Quality.importanceWeights(docs, docs.where(col("lang") === "en"))
        .orderBy("doc_id").collect().toSeq,
      Quality.unigramSurprisal(docs).orderBy("doc_id").collect().toSeq)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val (imp3, sur3) = run()
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val (imp17, sur17) = run()
      assert(imp3 === imp17, "importanceWeights must be shuffle-geometry invariant")
      assert(sur3 === sur17, "unigramSurprisal must be shuffle-geometry invariant")
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("dropBoilerplateUnits: cross-doc chrome cut everywhere, order kept, empty doc survives") {
    import org.apache.spark.sql.functions.{col, split}
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "cookie-banner|real prose one|footer"),
      (2L, "cookie-banner|real prose two|footer"),
      (3L, "cookie-banner|unique thought|footer"),
      (4L, "cookie-banner|footer")) // loses everything
      .toDF("doc_id", "raw")
      .union(Seq(Tuple1(5L)).toDF("doc_id")
        .withColumn("raw", org.apache.spark.sql.functions.lit(null)
          .cast("string"))) // null text: 0 units, not -1/null
    val out = Quality.dropBoilerplateUnits(docs, split(col("raw"), "\\|"), maxDf = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // cookie-banner and footer sit in 4 and 4 docs (> 2) -> cut; the
    // per-doc prose (df 1) survives in position order
    assert(out === Array(
      (1L, 3L, 1L, "real prose one"),
      (2L, 3L, 1L, "real prose two"),
      (3L, 3L, 1L, "unique thought"),
      (4L, 2L, 0L, ""),
      (5L, 0L, 0L, "")))

    // null ELEMENTS inside a units array drop up front and are excluded
    // from n_units (they can never match the frequency join, so keeping
    // them counted would misreport the only-over-maxDf contract)
    import org.apache.spark.sql.functions.{array, lit => flit}
    val withNulls = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "x")
    val out2 = Quality.dropBoilerplateUnits(withNulls,
        array(flit(null).cast("string"), col("x")), maxDf = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out2 === Array((1L, 1L, 1L, "a"), (2L, 1L, 1L, "b")))
  }

  test("dropBoilerplateUnits equals a driver-side reference on randomized corpora") {
    import org.apache.spark.sql.functions.{col, split}
    val s = spark
    import s.implicits._
    def reference(docs: Seq[(Long, Seq[String])], maxDf: Int)
        : Map[Long, (Long, Long, String)] = {
      val df = docs.flatMap { case (id, us) => us.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).distinct.size }
      docs.map { case (id, us) =>
        val kept = us.filter(u => df(u) <= maxDf)
        id -> ((us.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
    }
    for (seed <- Seq(5, 41)) {
      val rnd = new scala.util.Random(seed)
      // small unit vocabulary so cross-doc repetition actually occurs
      val vocab = Vector("u0", "u1", "u2", "u3", "u4", "u5", "u6", "u7")
      val docs = (1L to 60L).map(id =>
        id -> Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))))
      val want = reference(docs, maxDf = 20)
      val got = Quality.dropBoilerplateUnits(
          docs.map { case (id, us) => (id, us.mkString("|")) }.toDF("doc_id", "raw"),
          split(col("raw"), "\\|"), maxDf = 20)
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("vocabCoverage: full-size vocab covers everything; coverage bounded") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val full = Quality.vocabCoverage(docs, vocabSize = 100000).collect()
    full.foreach { r =>
      assert(r.getDouble(3) === 1.0, s"full vocab must cover slice ${r.getString(0)}")
      assert(r.getLong(4) === 0L)
    }
    val cut = Quality.vocabCoverage(docs, vocabSize = 12).collect()
    cut.foreach { r =>
      val cov = r.getDouble(3)
      assert(cov > 0.0 && cov < 1.0, s"12-of-31 vocab should partially cover: $cov")
      assert(r.getLong(4) > 0L)
    }
  }

  test("hashedLinearScore: feature count = unigrams + adjacent bigrams") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "A b c"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val w = Seq((0L, 0.5)).toDF("bucket", "weight")
    val out = Quality.hashedLinearScore(docs, w, dim = 64)
      .select("doc_id", "n_features").as[(Long, Long)].collect().toMap
    // "A b c" → 3 unigrams + 2 bigrams; "solo" → 1; "" splits to [""] → 1
    assert(out === Map(1L -> 5L, 2L -> 1L, 3L -> 1L))
  }

  test("hashedLinearScore: missing buckets score zero; model buckets add") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "x x")).toDF("doc_id", "text")
    // features: "x","x","x x" — find their actual buckets, then weight them
    val empty = Seq.empty[(Long, Double)].toDF("bucket", "weight")
    val zero = Quality.hashedLinearScore(docs, empty, dim = 8)
      .select("score").as[Double].head()
    assert(zero === 0.0)
    val all = (0L until 8L).map(b => (b, 1.0)).toDF("bucket", "weight")
    val one = Quality.hashedLinearScore(docs, all, dim = 8)
      .select("score").as[Double].head()
    assert(one === 1.0, "total model with weight 1 everywhere ⇒ mean 1")
  }

  test("hashedLinearScore: duplicate bucket rows sum (sparse-COO model deltas add)") {
    val docs = Seq((1L, "x x")).toDF("doc_id", "text")
    val base = (0L until 8L).map(b => (b, 0.25)).toDF("bucket", "weight")
    val delta = (0L until 8L).map(b => (b, 0.75)).toDF("bucket", "weight")
    val merged = Quality.hashedLinearScore(docs, base.union(delta), dim = 8)
      .select("doc_id", "n_features", "score")
      .as[(Long, Long, Double)].head()
    // every bucket weighs 0.25+0.75 = 1.0; features must NOT double-count
    assert(merged === ((1L, 3L, 1.0)),
      s"union-of-deltas must sum weights without join fan-out: $merged")
  }

  test("hashedLinearScore: case-insensitive, deterministic across runs") {
    val docs = Seq((1L, "Foo BAR baz"), (2L, "foo bar BAZ")).toDF("doc_id", "text")
    val w = (0L until 32L).map(b => (b, (b.toDouble - 16) / 16)).toDF("bucket", "weight")
    val out = Quality.hashedLinearScore(docs, w, dim = 32)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(out(1L) === out(2L), "lowercasing must fold case before hashing")
  }

  test("hashedLinearScore plan: weight join broadcasts, one shuffle aggregation") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val w = (0L until 16L).map(b => (b, 0.1)).toDF("bucket", "weight")
    val plan = Quality.hashedLinearScore(docs, w, dim = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model join must broadcast, not shuffle:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus-side features must never shuffle for the model join:\n$plan")
  }

  test("gopherRules: hand-computed metrics and verdicts per rule") {
    // 62 words (31 × 2), stop-word rich, clean prose — passes everything
    val good = (("the quick brown fox jumps over and over to the side of " +
      "that lazy dog with a very long tail and then it does it again " +
      "because repetition is fine here ") * 2).trim
    val docs = Seq(
      (1L, good),
      (2L, "short doc"),                       // fails word count + stop words
      (3L, "• one\n• two\n• three"),           // bullet-only: fails bullets
      (4L, good + " ### ## # " + "# " * 10),   // symbol-heavy tail
      (5L, good + "\nwait...\nmore...\nend..."), // 3 ellipsis lines of 4
      (6L, "")                                 // degenerate
    ).toDF("doc_id", "text")
    val m = Quality.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    val g = m(1L)
    assert(g.getAs[Long]("n_words") === 62L)
    assert(g.getAs[Boolean]("pass"), s"good doc must pass: $g")

    val s2 = m(2L)
    assert(!s2.getAs[Boolean]("r_word_count") && !s2.getAs[Boolean]("r_stop_words")
      && s2.getAs[Boolean]("r_mean_word_len") && !s2.getAs[Boolean]("pass"))

    val b = m(3L)
    assert(b.getAs[Double]("bullet_line_frac") === 1.0)
    assert(!b.getAs[Boolean]("r_bullet_lines"))
    // '•' words carry no alphabetic char: 3 of 6 words alpha
    assert(b.getAs[Double]("alpha_word_frac") === 0.5)
    assert(!b.getAs[Boolean]("r_alpha_words"))

    val sym = m(4L)
    // 62 good words + 13 symbol words = 75; '#' occurrences = 3+2+1+10 = 16
    assert(sym.getAs[Double]("symbol_ratio") ===
      BigDecimal(16.0 / 75).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!sym.getAs[Boolean]("r_symbol_ratio"))
    assert(sym.getAs[Boolean]("r_alpha_words"), "62/75 alpha = 0.8267 >= 0.8")

    val e = m(5L)
    assert(e.getAs[Double]("ellipsis_line_frac") === 0.75)
    assert(!e.getAs[Boolean]("r_ellipsis_lines"))
    // the '...' substrings also count as symbols: 3 / 65 words < 0.1
    assert(e.getAs[Boolean]("r_symbol_ratio"))

    val z = m(6L)
    assert(z.getAs[Long]("n_words") === 0L)
    assert(z.getAs[Double]("mean_word_len") === 0.0)
    assert(!z.getAs[Boolean]("pass") && !z.getAs[Boolean]("r_word_count"))
  }

  test("c4Filter: line rules, page rules, published precedence") {
    val docs = Seq(
      (1L, "First clean sentence has five good words here.\n" +
        "Second clean sentence also has enough words inside.\n" +
        "Third one wraps the page with a final stop."),       // survives
      (2L, "no terminal punctuation on this line at all"),    // all dropped
      (3L, "Enable javascript to view the comment section now."),
      (4L, "Too short."),                                     // < 5 words
      (5L, "Real sentence with lorem ipsum inside it today."), // page drop
      (6L, "Object literal { compiles fine. More words follow it here."),
      (7L, "Quoted line has at least five words \"")          // quote terminal
    ).toDF("doc_id", "text")
    val got = Quality.c4Filter(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[String]("drop_reason") == null)
    assert(got(1L).getAs[Long]("n_kept_lines") === 3L)
    assert(got(1L).getAs[Long]("n_sentences") === 3L)
    Seq(2L, 3L, 4L).foreach { id =>
      assert(got(id).getAs[Long]("n_kept_lines") === 0L, s"doc $id")
      assert(got(id).getAs[String]("drop_reason") === "too_few_sentences",
        "empty kept text is an explicit drop, never a silent survivor")
    }
    assert(got(5L).getAs[String]("drop_reason") === "lorem_ipsum",
      "page rules fire on RAW text before line accounting")
    assert(got(6L).getAs[String]("drop_reason") === "brace")
    // quote-terminated line is kept, but one line of one sentence < 3
    assert(got(7L).getAs[Long]("n_kept_lines") === 1L)
    assert(got(7L).getAs[String]("drop_reason") === "too_few_sentences")
  }

  test("confusionMatrix: hand-computed cells, shares, diagonal flags, NULL exclusion") {
    val df = Seq(
      ("en", "en"), ("en", "en"), ("en", "de"),
      ("de", "de"), ("de", "en"),
      (null.asInstanceOf[String], "en"), ("fr", null.asInstanceOf[String])
    ).toDF("label", "pred")
    val got = Quality.confusionMatrix(df, "label", "pred").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got(("en", "en")) === ((2L, round4s(2.0 / 3), round4s(2.0 / 3), true)))
    assert(got(("en", "de")) === ((1L, round4s(1.0 / 3), 0.5, false)))
    assert(got(("de", "de")) === ((1L, 0.5, 0.5, true)))
    assert(got(("de", "en")) === ((1L, 0.5, round4s(1.0 / 3), false)))
    assert(got.size === 4, "NULL labels/preds are excluded, absent cells emit nothing")
  }

  private def round4s(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("trendingTerms: planted burst tops; first-ever and zero-variance terms excluded") {
    val s = spark; import s.implicits._
    // 4 days; 'burst' at 1,2,1 then 50 (variance in the baseline);
    // 'fresh' only on the last day; 'flat' identical on all prior days
    def doc(day: Int, words: String) = (day, words)
    val rows = Seq(
      doc(0, "steady steady burst flat"),
      doc(1, "steady steady burst burst flat"),
      doc(2, "steady steady burst flat"),
      doc(3, "steady steady flat fresh " + Seq.fill(50)("burst").mkString(" ")))
      .toDF("day", "text")
    val got = Quality.trendingTerms(rows, $"day").collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got.contains("burst") && got("burst") > 50.0,
      s"the planted burst must dominate: $got")
    assert(!got.contains("fresh"), "first-ever terms have no baseline")
    assert(!got.contains("flat") && !got.contains("steady"),
      "zero prior variance cannot be z-scored")
  }

  test("cohensKappa: textbook 2x2 case, degenerate single-class NULL") {
    val s = spark; import s.implicits._
    // classic: 20 a/a, 5 a/b, 10 b/a, 15 b/b -> po=0.7,
    // pe = (25*30 + 25*20)/2500 = 0.5, kappa = 0.4
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = Quality.cohensKappa(rows.toDF("label", "pred"), "label", "pred")
      .collect().head
    assert(r.getLong(0) === 50L)
    assert(r.getDouble(1) === 0.7 && r.getDouble(2) === 0.5)
    assert(math.abs(r.getDouble(3) - 0.4) < 1e-9)
    // single class on both sides: pe = 1 -> kappa undefined, NULL
    val one = Quality.cohensKappa(
      Seq(("x", "x"), ("x", "x")).toDF("label", "pred"), "label", "pred")
      .collect().head
    assert(one.getDouble(1) === 1.0 && one.isNullAt(3))
  }

  test("wilson interval: brackets the rate, stays in [0,1] at the edges, n=0 NULL") {
    val s = spark; import s.implicits._
    val rows = Seq((50L, 100L), (0L, 20L), (20L, 20L), (0L, 0L)).toDF("k", "n")
    val got = rows.select($"k", $"n",
        Quality.wilsonLo($"k", $"n").as("lo"),
        Quality.wilsonHi($"k", $"n").as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    val (lo, hi) = (got((50L, 100L))._1.get, got((50L, 100L))._2.get)
    assert(lo < 0.5 && hi > 0.5 && hi - lo < 0.2, s"[$lo, $hi]")
    val (lo0, hi0) = (got((0L, 20L))._1.get, got((0L, 20L))._2.get)
    assert(lo0 === 0.0 && hi0 > 0.05 && hi0 < 0.3,
      "k=0: lower bound 0 but the UPPER bound stays honest (normal CI collapses)")
    val (lon, hin) = (got((20L, 20L))._1.get, got((20L, 20L))._2.get)
    // analytically exactly 1 at k=n; FP leaves it an ulp shy — the clamp
    // guards overshoot, not undershoot
    assert(hin > 1.0 - 1e-12 && hin <= 1.0 && lon < 1.0 && lon > 0.7)
    assert(got((0L, 0L)) === ((None, None)), "n=0: undefined, NULL")
  }

  test("gopherRules plan: narrow projection chain, no shuffle beyond the spread") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Quality.gopherRules(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
      s"gopherRules must stay a per-row projection:\n$plan")
  }

  test("chiSquaredTerms: hand-computed 2x2; every-doc terms dropped") {
    val sp = spark
    import sp.implicits._
    // source A: x in 2 of 3 docs; source B: x in 1 of 3 docs
    // for (A, x): a=2 b=1 c=1 d=2, N=6 -> chi2 = 6*(4-1)^2/(3*3*3*3) = 2/3
    // 'all' appears in every doc -> (b+d)=0 -> dropped
    val docs = Seq(
      (1L, "A", "x all"), (2L, "A", "x all"), (3L, "A", "y all"),
      (4L, "B", "x all"), (5L, "B", "z all"), (6L, "B", "z all"))
      .toDF("doc_id", "source", "text")
    val out = Quality.chiSquaredTerms(docs, minDf = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("df_in"), r.getAs[Double]("chi2"),
          r.getAs[String]("direction")))).toMap
    assert(!out.keys.exists(_._2 == "all"), "universal terms carry no signal")
    val ax = out(("A", "x"))
    assert(ax._1 === 2L)
    assert(math.abs(ax._2 - BigDecimal(2.0 / 3).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(ax._3 === "over")
    assert(out(("B", "x"))._3 === "under", "B underuses x symmetric chi2")
    // symmetric table: same chi2 magnitude both directions
    assert(out(("B", "x"))._2 === ax._2)
  }

  test("chiSquaredTerms: presence not frequency; minDf cut; rank order") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "A", "x x x x rare"), (2L, "A", "y"),
      (3L, "B", "y x"), (4L, "B", "y"))
      .toDF("doc_id", "source", "text")
    val out = Quality.chiSquaredTerms(docs, minDf = 2, topK = 10)
      .collect()
    // 'rare' has t_total=1 < minDf -> absent
    assert(!out.exists(_.getString(1) == "rare"))
    // x appears 4 times in one doc but df_in = 1 (presence)
    val ax = out.find(r => r.getString(0) == "A" && r.getString(1) == "x")
    assert(ax.exists(_.getAs[Long]("df_in") === 1L))
    // ranks are 1..k per slice in (chi2 desc, term) order
    val ranksA = out.filter(_.getString(0) == "A")
      .sortBy(_.getAs[Long]("rank"))
    assert(ranksA.map(_.getAs[Long]("rank")).toSeq ===
      (1L to ranksA.length).toSeq)
  }

  test("rocAuc: hand-computed mid-rank case, perfect separation, single-class NULL") {
    val sp = spark; import sp.implicits._
    // pos scores {3,3,2}, neg {1,2,3}: U = 2*(1+1+0.5) + (1+0.5+0) = 6.5
    // -> 2U = 13, auc = 13/18 = 0.722222
    val rows = Seq((3L, true), (3L, true), (2L, true),
      (1L, false), (2L, false), (3L, false))
    val r = Quality.rocAuc(rows.toDF("score", "y"), "score", "y")
      .collect().head
    assert(r.getLong(0) === 6L && r.getLong(1) === 3L && r.getLong(2) === 3L)
    assert(r.getDecimal(3).longValueExact() === 13L, "2U must be exact")
    assert(r.getDouble(4) === 0.722222)
    // perfect separation -> 1.0; total inversion -> 0.0
    val perfect = Quality.rocAuc(
      Seq((10L, true), (9L, true), (1L, false)).toDF("score", "y"),
      "score", "y").collect().head
    assert(perfect.getDouble(4) === 1.0)
    val inverted = Quality.rocAuc(
      Seq((1L, true), (9L, false)).toDF("score", "y"), "score", "y")
      .collect().head
    assert(inverted.getDouble(4) === 0.0)
    // one class empty: AUC undefined -> NULL, never a fabricated 0.5
    val oneClass = Quality.rocAuc(
      Seq((1L, true), (2L, true)).toDF("score", "y"), "score", "y")
      .collect().head
    assert(oneClass.isNullAt(4))
    // fractional score column: fail loud (tie structure not portable)
    intercept[IllegalArgumentException] {
      Quality.rocAuc(Seq((0.5, true)).toDF("score", "y"), "score", "y")
    }
  }

  test("rocAuc: invariant under duplication-free repartitioning; ties count half") {
    val sp = spark; import sp.implicits._
    val rows = (1L to 200L).map(i => (i % 7, i % 3 == 0))
    val a = Quality.rocAuc(rows.toDF("score", "y"), "score", "y").collect()
    val b = Quality.rocAuc(rows.toDF("score", "y").repartition(13),
      "score", "y").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // all-ties degenerate: every pair counts half -> auc exactly 0.5
    val flat = Quality.rocAuc(
      Seq((5L, true), (5L, true), (5L, false)).toDF("score", "y"),
      "score", "y").collect().head
    assert(flat.getDouble(4) === 0.5)
  }

  test("spearmanRho: hand-computed midrank case, monotone ±1, constant-side NULL") {
    val sp = spark; import sp.implicits._
    // x = (1,2,2,3), y = (10,20,30,30): midranks x = (1, 2.5, 2.5, 4),
    // y = (1, 2, 3.5, 3.5) -> rho = 15/18 = 0.833333 (tied case)
    val rows = Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 30L))
    val r = Quality.spearmanRho(rows.toDF("x", "y"), "x", "y")
      .collect().head
    assert(r.getLong(0) === 4L && r.getDouble(1) === 0.833333)
    // strictly monotone -> exactly 1; reversed -> exactly -1
    val mono = (1L to 50L).map(i => (i, i * 7 + 3))
    assert(Quality.spearmanRho(mono.toDF("x", "y"), "x", "y")
      .collect().head.getDouble(1) === 1.0)
    val anti = (1L to 50L).map(i => (i, 1000L - i))
    assert(Quality.spearmanRho(anti.toDF("x", "y"), "x", "y")
      .collect().head.getDouble(1) === -1.0)
    // a rank-constant side has zero variance: undefined, NULL, never NaN
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 5L))
    assert(Quality.spearmanRho(flat.toDF("x", "y"), "x", "y")
      .collect().head.isNullAt(1))
    intercept[IllegalArgumentException] {
      Quality.spearmanRho(Seq((0.5, 1L)).toDF("x", "y"), "x", "y")
    }
  }

  test("spearmanRho: partition-invariant; agrees with a sequential midrank reference") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(9).toLong))
    val a = Quality.spearmanRho(rows.toDF("x", "y"), "x", "y").collect().head
    val b = Quality.spearmanRho(rows.toDF("x", "y").repartition(17), "x", "y")
      .collect().head
    assert(a.toSeq === b.toSeq)
    // sequential reference: midranks + Pearson in BigDecimal-free doubles
    def midranks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexOf(v) + 1; val hi = sorted.lastIndexOf(v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    val mx = midranks(rows.map(_._1)); val my = midranks(rows.map(_._2))
    val xs = rows.map(r => mx(r._1)); val ys = rows.map(r => my(r._2))
    val n = rows.size.toDouble
    val num = n * xs.zip(ys).map { case (u, v) => u * v }.sum - xs.sum * ys.sum
    val den = math.sqrt(n * xs.map(u => u * u).sum - xs.sum * xs.sum) *
      math.sqrt(n * ys.map(v => v * v).sum - ys.sum * ys.sum)
    // the operator rounds to 6 decimals; the reference does not
    assert(math.abs(a.getDouble(1) - num / den) < 6e-7)
  }

  test("prCurve: hand-computed thresholds, tie blocks, exact AP; perfect=1; no-pos NULL") {
    val sp = spark; import sp.implicits._
    // desc blocks: s=3 (1 pos, 1 neg) -> tp=1 cumn=2 P=.5 R=.5 term=.5
    //              s=2 (1 pos)        -> tp=2 cumn=3 P=2/3 R=1  term=2/3
    //              s=1 (1 neg)        -> tp=2 cumn=4 P=.5 R=1  term=0
    // ap = (0.5 + 0.666666667)/2 = 0.583333
    val rows = Seq((3L, true), (3L, false), (2L, true), (1L, false))
    val out = Quality.prCurve(rows.toDF("score", "y"), "score", "y")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(3L) === ((2L, 1L, 1L, 1L, 0.5, 0.5, 0.583333)))
    assert(out(2L) === ((1L, 1L, 2L, 1L, 0.666667, 1.0, 0.583333)))
    assert(out(1L) === ((1L, 0L, 2L, 2L, 0.5, 1.0, 0.583333)))
    // perfect separation: every positive above every negative -> AP = 1
    val perfect = Quality.prCurve(
      Seq((9L, true), (8L, true), (1L, false)).toDF("score", "y"), "score", "y")
      .select("ap").distinct().collect()
    assert(perfect.length === 1 && perfect.head.getDouble(0) === 1.0)
    // no positives: AP/recall NULL, never 0
    val nopos = Quality.prCurve(
      Seq((5L, false)).toDF("score", "y"), "score", "y").collect().head
    assert(nopos.isNullAt(6) && nopos.isNullAt(7))
    intercept[IllegalArgumentException] {
      Quality.prCurve(Seq((0.5, true)).toDF("score", "y"), "score", "y")
    }
  }

  /** Sequential pool-adjacent-violators reference: merge adjacent blocks
    * while the left block's pooled rate strictly exceeds the right's
    * (exact integer cross-multiplication — no float comparisons). */
  private def pavReference(cells: Seq[(Long, Long, Long)]): Map[Long, Double] = {
    val st = scala.collection.mutable.ArrayBuffer[(Long, Long, List[Long])]()
    cells.sortBy(_._1).foreach { case (s, n, p) =>
      st += ((n, p, List(s)))
      var merged = false
      do {
        merged = false
        if (st.length >= 2) {
          val (n2, p2, s2) = st(st.length - 1)
          val (n1, p1, s1) = st(st.length - 2)
          if (p1 * n2 > p2 * n1) { // rate1 > rate2: violation
            st.remove(st.length - 1); st.remove(st.length - 1)
            st += ((n1 + n2, p1 + p2, s1 ++ s2))
            merged = true
          }
        }
      } while (merged)
    }
    st.flatMap { case (n, p, ss) =>
      ss.map(_ -> p.toDouble / n)
    }.toMap
  }

  test("isotonicCalibration: equals the sequential PAV reference; monotone; mass-preserving") {
    val sp = spark; import sp.implicits._
    // hand case: raw rates (1, 0, .5, 1) -> PAV pools {1,2,3} at .5
    val hand = Seq((1L, true), (2L, false), (3L, true), (3L, false), (4L, true))
    val out = Quality.isotonicCalibration(hand.toDF("s", "y"), "s", "y")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out === Map(1L -> 0.5, 2L -> 0.5, 3L -> 0.5, 4L -> 1.0))
    // randomized equality with the sequential reference
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map { _ =>
      val s = rnd.nextInt(12).toLong
      (s, rnd.nextInt(12) < s + 2) // noisy monotone signal
    }
    val cells = rows.groupBy(_._1).map { case (s, g) =>
      (s, g.size.toLong, g.count(_._2).toLong)
    }.toSeq
    val ref = pavReference(cells)
    val got = Quality.isotonicCalibration(rows.toDF("s", "y"), "s", "y")
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    got.foreach { case (s, f) =>
      assert(math.abs(f - ref(s)) < 6e-7, s"score $s: $f vs PAV ${ref(s)}")
    }
    // monotone non-decreasing in score
    val sorted = got.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    // mass preservation: sum fitted*n == total positives (PAV property)
    val byS = cells.map(c => c._1 -> c._2).toMap
    val mass = got.map { case (s, f) => f * byS(s) }.sum
    assert(math.abs(mass - rows.count(_._2)) < 1e-3)
    intercept[IllegalArgumentException] {
      Quality.isotonicCalibration(Seq((0.5, true)).toDF("s", "y"), "s", "y")
    }
  }

  test("kendallTau: monotone ±1, tie-balanced 0, hand-computed tau-b, constant-side NULL") {
    val sp = spark; import sp.implicits._
    val mono = Quality.kendallTau(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(mono.getLong(0) === 3L && mono.getLong(1) === 3L &&
      mono.getLong(2) === 0L && mono.getDouble(3) === 1.0)
    val rev = Quality.kendallTau(
      Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(rev.getDouble(3) === -1.0)
    // 2x2 tie grid: C = D = 1 -> tau 0 with the tau-b denominator live
    val grid = Quality.kendallTau(
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(grid.getLong(1) === 1L && grid.getLong(2) === 1L &&
      grid.getDouble(3) === 0.0)
    // hand-computed tau-b with ties: x=(1,1,2), y=(1,2,2):
    // pairs: (1,1)-(2,2) conc; (1,2)-(2,2) y-tie; within-x pair x-tie
    // C=1 D=0 n0=3 Tx=1 Ty=1 -> tau = 1/sqrt(2*2) = 0.5
    val tied = Quality.kendallTau(
      Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(tied.getLong(1) === 1L && tied.getLong(2) === 0L &&
      tied.getDouble(3) === 0.5)
    val const = Quality.kendallTau(
      Seq((1L, 1L), (1L, 2L)).toDF("x", "y"), "x", "y").collect().head
    assert(const.isNullAt(3), "constant x has no pair variance — NULL")
    intercept[IllegalArgumentException] {
      Quality.kendallTau(Seq((0.5, 1L)).toDF("x", "y"), "x", "y")
    }
  }

  test("rocAucBy: per-segment AUC equals the global operator per slice; single-class NULL") {
    val sp = spark; import sp.implicits._
    val rows = Seq(
      ("a", 9L, true), ("a", 8L, true), ("a", 1L, false),  // perfect
      ("b", 1L, true), ("b", 9L, false), ("b", 8L, false), // inverted
      ("c", 5L, true), ("c", 6L, true))                    // single-class
    val out = Quality.rocAucBy(rows.toDF("g", "score", "y"), "g", "score", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(out("a") === ((3L, Some(1.0))) && out("b") === ((3L, Some(0.0))))
    assert(out("c") === ((2L, None)), "single-class segment: NULL, never 0.5")
    // per-segment row == the global operator run on that slice
    rows.map(_._1).distinct.foreach { g =>
      val slice = rows.filter(_._1 == g).map(t => (t._2, t._3))
      val glob = Quality.rocAuc(slice.toDF("score", "y"), "score", "y")
        .collect().head
      val seg = Quality.rocAucBy(rows.toDF("g", "score", "y"), "g", "score", "y")
        .where(org.apache.spark.sql.functions.col("g") === g).collect().head
      assert(seg.getLong(1) === glob.getLong(0) &&
        seg.getLong(4) === glob.getDecimal(3).longValueExact())
    }
  }

  test("ksTest: exact integer sup-distance; separated=1, identical=0, empty-side NULL") {
    val sp = spark; import sp.implicits._
    // fully separated supports: D = 1 exactly (d_num = n1*n2)
    val sep = Quality.ksTest(
      Seq((1L, true), (2L, true), (3L, false), (4L, false)).toDF("v", "g"),
      "v", "g").collect().head
    assert(sep.getLong(0) === 2L && sep.getLong(1) === 2L)
    assert(sep.getLong(2) === 4L && sep.getDouble(3) === 1.0)
    // at n=2+2 the 0.05 critical value (1.358) exceeds even D=1
    assert(sep.getDouble(4) === 1.358 && !sep.getBoolean(5))
    // identical distributions: D = 0
    val same = Quality.ksTest(
      Seq((1L, true), (2L, true), (1L, false), (2L, false)).toDF("v", "g"),
      "v", "g").collect().head
    assert(same.getLong(2) === 0L && same.getDouble(3) === 0.0 &&
      !same.getBoolean(5))
    // hand case: F1 steps at {1,3}, F2 at {2,3}: max gap at v=1 is
    // |1*2 - 0*2| = 2 -> D = 0.5
    val hand = Quality.ksTest(
      Seq((1L, true), (3L, true), (2L, false), (3L, false)).toDF("v", "g"),
      "v", "g").collect().head
    assert(hand.getLong(2) === 2L && hand.getDouble(3) === 0.5)
    // one empty side: undefined, never 0
    val empty = Quality.ksTest(
      Seq((1L, true), (2L, true)).toDF("v", "g"), "v", "g").collect().head
    assert(empty.isNullAt(3) && empty.isNullAt(4) && empty.isNullAt(5))
    intercept[IllegalArgumentException] {
      Quality.ksTest(Seq((0.5, true)).toDF("v", "g"), "v", "g")
    }
  }

  test("ksTestBy: per-segment equality with the global operator; p_micro chain; NULLs") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 600).map { i =>
      val seg = s"s${i % 4}"
      val side = (i / 4) % 2 == 0
      // segment s3 planted drift: the true side shifts by +6
      val v = (rnd.nextInt(12) + (if (seg == "s3" && side) 6 else 0)).toLong
      (seg, v, side)
    } :+ (("s4", 5L, true)) // single-sided segment
    val df = rows.toDF("seg", "v", "side")
    val got = Quality.ksTestBy(df, "seg", "v", "side").collect()
      .map(r => r.getString(0) -> r).toMap
    // per-segment equality with the global operator run on each slice
    rows.map(_._1).distinct.foreach { seg =>
      val slice = Quality.ksTest(
        df.where(org.apache.spark.sql.functions.col("seg") === seg), "v", "side")
        .collect().head
      val g = got(seg)
      assert(g.getLong(1) === slice.getLong(0) &&
        g.getLong(2) === slice.getLong(1) &&
        g.getLong(3) === slice.getLong(2), s"$seg exact witnesses")
      if (slice.isNullAt(3)) assert(g.isNullAt(4) && g.isNullAt(7), s"$seg NULL")
      else {
        assert(g.getDouble(4) === slice.getDouble(3), s"$seg d")
        assert(g.getBoolean(6) === slice.getBoolean(5), s"$seg drifted")
        // p_micro replays the fixed-order Smirnov chain on the witnesses
        val (dn, n1, n2) = (g.getLong(3).toDouble, g.getLong(1).toDouble,
          g.getLong(2).toDouble)
        val p = 2.0 * math.exp(-2.0 * ((dn * dn) / (n1 * n2 * (n1 + n2))))
        val pm = math.min(1000000L,
          BigDecimal.valueOf(p * 1000000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        assert(g.getLong(7) === pm, s"$seg p_micro")
      }
    }
    assert(got("s3").getBoolean(6), "planted drift must flag")
    assert(got("s3").getLong(7) < got("s0").getLong(7),
      "the drifted segment's tail probability must be smaller")
    assert(got("s4").isNullAt(4) && got("s4").isNullAt(7),
      "single-sided segment emits NULLs, never a fabricated 0")
    intercept[IllegalArgumentException] {
      Quality.ksTestBy(Seq(("a", 0.5, true)).toDF("seg", "v", "side"),
        "seg", "v", "side")
    }
  }

  test("bhFdr: textbook step-up incl. the rank-below-cutoff rescue; guards fail loud") {
    val sp = spark; import sp.implicits._
    // q=1/20: thresholds i/m*q = (0.01, 0.02, 0.03, 0.04, 0.05);
    // p = (0.010, 0.020, 0.030, 0.040, 0.900) -> all of 1..4 satisfy, k*=4
    val a = Quality.bhFdr(
      Seq(("a", 10000L), ("b", 20000L), ("c", 30000L), ("d", 40000L),
        ("e", 900000L)).toDF("k", "p"), "k", "p").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(a("a") === ((1L, 5L, true)) && a("d") === ((4L, 5L, true)))
    assert(a("e") === ((5L, 5L, false)))
    // THE step-up property: rank 2 fails its own condition
    // (0.049 > 2/3*0.05) but rank 3 satisfies (0.05 <= 0.05), so rank 2
    // rejects anyway
    val b = Quality.bhFdr(
      Seq(("x", 1000L), ("y", 49000L), ("z", 50000L)).toDF("k", "p"),
      "k", "p").collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(b === Map("x" -> true, "y" -> true, "z" -> true),
      "step-up rescues ranks below the max satisfying rank")
    // nothing satisfies: no rejections
    val c = Quality.bhFdr(
      Seq(("x", 500000L), ("y", 900000L)).toDF("k", "p"), "k", "p")
      .collect().map(_.getBoolean(4))
    assert(c.forall(!_))
    // NULL p rows drop from m
    val d = Quality.bhFdr(
      Seq(("x", Some(10000L)), ("y", None)).toDF("k", "p"), "k", "p")
      .collect()
    assert(d.length === 1 && d.head.getLong(3) === 1L)
    intercept[IllegalArgumentException](Quality.bhFdr(
      Seq(("x", 0.5)).toDF("k", "p"), "k", "p"))
    intercept[IllegalArgumentException](Quality.bhFdr(
      Seq(("x", 1L)).toDF("k", "p"), "k", "p", qNum = 3, qDen = 2))
    val oob = intercept[Exception](Quality.bhFdr(
      Seq(("x", 2000000L)).toDF("k", "p"), "k", "p").collect())
    assert(oob.getMessage.contains("micro-probability range") ||
      Option(oob.getCause).exists(_.getMessage.contains("micro-probability range")))
  }

  test("theilSenBy: outlier-proof exact slope; sequential reference; contracts fail loud") {
    val sp = spark; import sp.implicits._
    // y = 3t + 1 with one wild outlier: the median slope stays EXACTLY 3
    // and the residual-median intercept stays EXACTLY 1 (the robustness
    // OLS does not have)
    val line = (0 to 9).map(t => ("a", t.toLong, if (t == 5) 1000L else 3L * t + 1L))
    val got = Quality.theilSenBy(line.toDF("seg", "t", "y"), "seg", "t", "y")
      .collect().head
    assert(got.getLong(1) === 10L && got.getLong(2) === 45L)
    assert(got.getDouble(5) === 3.0 && got.getDouble(6) === 1.0)
    assert(got.getLong(3) === 3L * got.getLong(4),
      "the rational witness reduces to 3")
    // sequential reference on irregular data, two segments
    val rnd = new scala.util.Random(11)
    val rows = for (seg <- Seq("p", "q"); t <- 1 to 25) yield
      (seg, t.toLong * 7L, (rnd.nextInt(200) - 100).toLong)
    def ref(pts: Seq[(Long, Long)]): (Long, Long, Long, Long, Double, Double) = {
      val prs = for {
        (ta, ya) <- pts; (tb, yb) <- pts if ta < tb
      } yield (ta, tb, yb - ya, tb - ta, (yb - ya).toDouble / (tb - ta))
      val srt = prs.sortBy { case (ta, tb, _, _, sl) => (sl, ta, tb) }
      val m = srt((srt.size + 1) / 2 - 1)
      def r6(x: Double) = BigDecimal.valueOf(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val slope = r6(m._5)
      val res = pts.map { case (t, y) => (y.toDouble - slope * t.toDouble, t) }
        .sortBy(identity)
      (pts.size.toLong, srt.size.toLong, m._3, m._4, slope,
        r6(res((pts.size + 1) / 2 - 1)._1))
    }
    def run(d: org.apache.spark.sql.DataFrame) =
      Quality.theilSenBy(d, "seg", "t", "y").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    val g2 = run(rows.toDF("seg", "t", "y"))
    Seq("p", "q").foreach { seg =>
      val want = ref(rows.filter(_._1 == seg).map(r => (r._2, r._3)))
      assert(g2(seg) === want, s"segment $seg sequential-reference equality")
    }
    assert(run(rows.reverse.toDF("seg", "t", "y").repartition(9)) === g2,
      "partition invariance")
    // single-point segment absent; duplicate t raises; bad types raise
    val single = run((rows :+ (("solo", 1L, 5L))).toDF("seg", "t", "y"))
    assert(!single.contains("solo"))
    val dup = intercept[Exception] {
      Quality.theilSenBy(
        Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 3L)).toDF("seg", "t", "y"),
        "seg", "t", "y").collect()
    }
    assert(dup.getMessage.contains("points contract") ||
      Option(dup.getCause).exists(_.getMessage.contains("points contract")))
    intercept[Exception] {
      Quality.theilSenBy(line.toDF("seg", "t", "y"), "seg", "t", "y",
        maxPoints = 5).collect()
    }
    intercept[IllegalArgumentException] {
      Quality.theilSenBy(Seq(("a", 1.0, 1L)).toDF("seg", "t", "y"),
        "seg", "t", "y")
    }
  }

  test("mannKendallBy: hand case, sequential reference with ties, all-tied NULL, contracts") {
    val sp = spark; import sp.implicits._
    // strictly increasing n=5: S = C(5,2) = 10, no ties -> var18 = 5*4*15
    // = 300, z = (10-1)/sqrt(300/18) = 9/sqrt(16.666..), trending
    val up = (0 to 4).map(t => ("a", t.toLong, t.toLong * 2L))
    val got = Quality.mannKendallBy(up.toDF("seg", "t", "y"), "seg", "t", "y")
      .collect().head
    assert(got.getLong(1) === 5L && got.getLong(2) === 10L &&
      got.getLong(3) === 300L)
    val zWant = 9.0 / math.sqrt(300.0 / 18.0)
    assert(math.abs(got.getDouble(4) - zWant) < 1e-6)
    assert(got.getBoolean(5) === (math.abs(zWant) > 1.959963984540054))
    assert(got.getString(6) === "up")
    // sequential reference on random tied data, two segments
    val rnd = new scala.util.Random(23)
    val rows = for (seg <- Seq("p", "q"); t <- 1 to 30) yield
      (seg, t.toLong * 3L, rnd.nextInt(8).toLong) // heavy y ties
    def ref(pts: Seq[(Long, Long)]): (Long, Long, Long, Option[Double]) = {
      val srt = pts.sortBy(_._1)
      val s = (for { i <- srt.indices; j <- srt.indices if i < j }
        yield java.lang.Long.signum(srt(j)._2 - srt(i)._2).toLong).sum
      val n = pts.size.toLong
      val tie18 = pts.groupBy(_._2).values.map(_.size.toLong)
        .map(m => m * (m - 1) * (2 * m + 5)).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie18
      val z = if (var18 > 0) Some {
        val v = math.sqrt(var18.toDouble / 18.0)
        val raw = if (s > 0) (s - 1).toDouble / v
          else if (s < 0) (s + 1).toDouble / v else 0.0
        BigDecimal.valueOf(raw)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      } else None
      (n, s, var18, z)
    }
    def run(d: org.apache.spark.sql.DataFrame) =
      Quality.mannKendallBy(d, "seg", "t", "y").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val g2 = run(rows.toDF("seg", "t", "y"))
    Seq("p", "q").foreach { seg =>
      val want = ref(rows.filter(_._1 == seg).map(r => (r._2, r._3)))
      assert(g2(seg) === want, s"segment $seg sequential-reference equality")
    }
    assert(run(rows.reverse.toDF("seg", "t", "y").repartition(7)) === g2,
      "partition invariance")
    // all y tied: S = 0, var18 = 0 -> z/trending NULL, direction flat
    val flat = Quality.mannKendallBy(
      (1 to 6).map(t => ("f", t.toLong, 9L)).toDF("seg", "t", "y"),
      "seg", "t", "y").collect().head
    assert(flat.getLong(2) === 0L && flat.getLong(3) === 0L &&
      flat.isNullAt(4) && flat.isNullAt(5) && flat.getString(6) === "flat")
    // duplicate t raises; non-integral raises; single point absent
    val dup = intercept[Exception] {
      Quality.mannKendallBy(
        Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 3L)).toDF("seg", "t", "y"),
        "seg", "t", "y").collect()
    }
    assert(dup.getMessage.contains("points contract") ||
      Option(dup.getCause).exists(_.getMessage.contains("points contract")))
    intercept[IllegalArgumentException] {
      Quality.mannKendallBy(Seq(("a", 1L, 1.0)).toDF("seg", "t", "y"),
        "seg", "t", "y")
    }
    assert(!run((rows :+ (("solo", 1L, 5L))).toDF("seg", "t", "y"))
      .contains("solo"))
  }

  test("mutualInfoCategorical: bijection NMI 1, exact independence 0, brute reference, guards") {
    val sp = spark; import sp.implicits._
    // bijection: MI = H(A) = H(B), NMI = 1 exactly
    val bij = Seq.fill(3)(("x", "u")) ++ Seq.fill(5)(("y", "v")) ++
      Seq.fill(2)(("z", "w"))
    val gb = Quality.mutualInfoCategorical(bij.toDF("a", "b"), "a", "b")
      .collect().head
    assert(gb.getAs[Long]("n") === 10L && gb.getAs[Long]("n_cells") === 3L)
    assert(gb.getAs[Double]("mi") === gb.getAs[Double]("h_a"))
    assert(gb.getAs[Double]("h_a") === gb.getAs[Double]("h_b"))
    assert(math.abs(gb.getAs[Double]("nmi") - 1.0) < 1e-9)
    // exact product table: every cell term is ln(1) = 0 -> MI = 0
    val ind = for { (a, ra) <- Seq(("x", 2), ("y", 3));
                    (b, cb) <- Seq(("u", 1), ("v", 4)) }
      yield Seq.fill(ra * cb)((a, b))
    val gi = Quality.mutualInfoCategorical(
      ind.flatten.toDF("a", "b"), "a", "b").collect().head
    assert(gi.getAs[Double]("mi") === 0.0 && gi.getAs[Double]("nmi") === 0.0)
    // brute sequential reference on an irregular table
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400)((s"a${rnd.nextInt(5)}", s"b${rnd.nextInt(3)}"))
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = rows.size.toDouble
    val cells = rows.groupBy(identity).view.mapValues(_.size.toDouble)
    val raM = rows.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val cbM = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    def dec12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val miRef = cells.map { case ((a, b), c) =>
      dec12((c / n) * math.log(n * c / (raM(a) * cbM(b)))) }.sum.toDouble
    val haRef = raM.values.map(m => dec12((m / n) * math.log(n / m))).sum.toDouble
    val hbRef = cbM.values.map(m => dec12((m / n) * math.log(n / m))).sum.toDouble
    val gr = Quality.mutualInfoCategorical(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(gr.getAs[Double]("mi") === r6(miRef))
    assert(gr.getAs[Double]("h_a") === r6(haRef))
    assert(gr.getAs[Double]("nmi") === r6(miRef / math.sqrt(haRef * hbRef)))
    // partition invariance (decimal accumulation)
    val gp = Quality.mutualInfoCategorical(
      rows.reverse.toDF("a", "b").repartition(11), "a", "b").collect().head
    assert(gp.getAs[Double]("mi") === gr.getAs[Double]("mi") &&
      gp.getAs[Double]("nmi") === gr.getAs[Double]("nmi"))
    // constant column: H(B) = 0 -> NMI NULL, MI 0; nulls filtered
    val const = Quality.mutualInfoCategorical(
      Seq(("x", "k"), ("y", "k"), (null, "k"), ("x", null)).toDF("a", "b"),
      "a", "b").collect().head
    assert(const.getAs[Long]("n") === 2L)
    assert(const.getAs[Double]("h_b") === 0.0 &&
      const.getAs[Double]("mi") === 0.0 &&
      const.isNullAt(const.fieldIndex("nmi")))
  }

  test("winsorizedMeanBy: hand case with outlier, sequential reference, tie cells, guards") {
    val sp = spark; import sp.implicits._
    // 1..19 plus an outlier 10000, k = 20 DIV 20 = 1: caps [2, 19];
    // winsorized replaces 1->2 and 10000->19; trimmed drops both
    val vals = (1L to 19L) :+ 10000L
    val got = Quality.winsorizedMeanBy(
      vals.map(("s", _)).toDF("seg", "v"), "seg", "v").collect().head
    assert(got.getAs[Long]("n") === 20L && got.getAs[Long]("k_winsor") === 1L)
    assert(got.getAs[Long]("lo_cap") === 2L && got.getAs[Long]("hi_cap") === 19L)
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("mean_raw") === r6((vals.sum).toDouble / 20))
    val winsSum = vals.map(v => math.max(2L, math.min(19L, v))).sum
    assert(got.getAs[Double]("mean_winsor") === r6(winsSum.toDouble / 20))
    assert(got.getAs[Double]("mean_trimmed") === r6((2L to 19L).sum.toDouble / 18))
    // sequential reference with heavy ties (partial-cell trim split)
    val rnd = new scala.util.Random(29)
    val rows = for (seg <- Seq("p", "q"); _ <- 1 to 83)
      yield (seg, rnd.nextInt(5).toLong * 10L)
    def ref(data: Seq[Long], num: Int, den: Int): (Long, Long, Long, Double, Double) = {
      val sorted = data.sorted
      val n = sorted.size; val k = n * num / den
      val lo = sorted(k); val hi = sorted(n - k - 1)
      val wins = sorted.map(v => math.max(lo, math.min(hi, v))).sum
      val trim = sorted.slice(k, n - k).sum
      (k.toLong, lo, hi, r6(wins.toDouble / n), r6(trim.toDouble / (n - 2 * k)))
    }
    val g2 = Quality.winsorizedMeanBy(rows.toDF("seg", "v"), "seg", "v",
      pctNum = 1, pctDen = 10).collect()
      .map(r => r.getString(0) -> r).toMap
    Seq("p", "q").foreach { seg =>
      val (k, lo, hi, wm, tm) = ref(rows.filter(_._1 == seg).map(_._2), 1, 10)
      val r = g2(seg)
      assert(r.getAs[Long]("k_winsor") === k && r.getAs[Long]("lo_cap") === lo &&
        r.getAs[Long]("hi_cap") === hi, s"$seg caps")
      assert(r.getAs[Double]("mean_winsor") === wm, s"$seg winsorized")
      assert(r.getAs[Double]("mean_trimmed") === tm, s"$seg trimmed")
    }
    // partition invariance
    val g3 = Quality.winsorizedMeanBy(
      rows.reverse.toDF("seg", "v").repartition(9), "seg", "v",
      pctNum = 1, pctDen = 10).collect().map(r => r.getString(0) -> r).toMap
    assert(g3("p").getAs[Double]("mean_winsor") ===
      g2("p").getAs[Double]("mean_winsor"))
    // k = 0 (tiny segment): winsorized = raw exactly, trimmed = raw
    val tiny = Quality.winsorizedMeanBy(
      Seq(("t", 5L), ("t", 9L)).toDF("seg", "v"), "seg", "v").collect().head
    assert(tiny.getAs[Long]("k_winsor") === 0L)
    assert(tiny.getAs[Double]("mean_winsor") === tiny.getAs[Double]("mean_raw"))
    assert(tiny.getAs[Double]("mean_trimmed") === tiny.getAs[Double]("mean_raw"))
    // contracts
    intercept[IllegalArgumentException](Quality.winsorizedMeanBy(
      Seq(("a", 1.0)).toDF("seg", "v"), "seg", "v"))
    intercept[IllegalArgumentException](Quality.winsorizedMeanBy(
      Seq(("a", 1L)).toDF("seg", "v"), "seg", "v", pctNum = 1, pctDen = 2))
  }

  test("mcnemar: textbook discordant split; direction; zero-discordant NULL; invariance") {
    val sp = spark; import sp.implicits._
    // classic: b01 = 15 (B corrects A), b10 = 5 -> chi2 = 100/20 = 5 >
    // 3.84 significant; continuity-corrected (10-1)^2/20 = 4.05
    val rows =
      Seq.fill(15)((true, false, true)) ++ Seq.fill(5)((true, true, false)) ++
      Seq.fill(30)((true, true, true)) ++ Seq.fill(10)((false, false, false))
    val df = rows.toDF("truth", "a", "b")
    val r = Quality.mcnemar(df, "truth", "a", "b").collect().head
    assert(r.getLong(0) === 60L && r.getLong(1) === 15L && r.getLong(2) === 5L)
    assert(r.getDouble(3) === 5.0 && r.getDouble(4) === 4.05)
    assert(r.getBoolean(5) && r.getBoolean(6),
      "B corrects 3x what it breaks: better and significant")
    // swapping the classifiers flips the direction, same statistic
    val sw = Quality.mcnemar(df, "truth", "b", "a").collect().head
    assert(sw.getDouble(3) === 5.0 && !sw.getBoolean(5))
    // no discordant pairs: undefined, never a fabricated 0
    val same = Quality.mcnemar(
      Seq((true, true, true), (false, true, true)).toDF("truth", "a", "b"),
      "truth", "a", "b").collect().head
    assert(same.isNullAt(3) && same.isNullAt(5) && same.isNullAt(6))
    // borderline NOT significant: b01=7, b10=1 -> 36/8 = 4.5 > 3.84 sig;
    // b01=6, b10=1 -> 25/7 = 3.571 < 3.84 not
    val ns = Quality.mcnemar(
      (Seq.fill(6)((true, false, true)) :+ ((true, true, false)))
        .toDF("truth", "a", "b"), "truth", "a", "b").collect().head
    assert(ns.getBoolean(5) && !ns.getBoolean(6),
      "better but not significant at 6-vs-1 discordants")
    assert(Quality.mcnemar(df.repartition(13), "truth", "a", "b")
      .collect().head.toSeq === r.toSeq, "partition invariance")
  }

  test("rocAucCi: Hanley-McNeil SE hand-checked; degenerate A=1 collapses; NULL propagates") {
    val sp = spark; import sp.implicits._
    // A = 0.5 with n_pos = n_neg = 1: SE^2 = A(1-A)/1 = 0.25 -> se 0.5,
    // Wald interval clamps to [0, 1]
    val tied = Quality.rocAucCi(
      Seq((5L, true), (5L, false)).toDF("score", "y"), "score", "y")
      .collect().head
    assert(tied.getDouble(3) === 0.5 && tied.getDouble(4) === 0.5)
    assert(tied.getDouble(5) === 0.0 && tied.getDouble(6) === 1.0)
    // perfect separation: A = 1, Q1 - A^2 = Q2 - A^2 = 0 -> se 0, CI [1,1]
    val perfect = Quality.rocAucCi(
      Seq((9L, true), (8L, true), (1L, false)).toDF("score", "y"),
      "score", "y").collect().head
    assert(perfect.getDouble(3) === 1.0 && perfect.getDouble(4) === 0.0)
    assert(perfect.getDouble(5) === 1.0 && perfect.getDouble(6) === 1.0)
    // single-class: AUC undefined -> the whole interval is NULL
    val one = Quality.rocAucCi(
      Seq((1L, true), (2L, true)).toDF("score", "y"), "score", "y")
      .collect().head
    assert(one.isNullAt(3) && one.isNullAt(4) && one.isNullAt(5) && one.isNullAt(6))
  }

  test("brierScore: hand-computed, perfect=0, inverted=1, skill vs the base-rate floor") {
    val sp = spark; import sp.implicits._
    // p=(0.8 y=1), (0.3 y=0): brier = (0.04 + 0.09)/2 = 0.065;
    // uncertainty = 0.25; skill = 1 - 0.065/0.25 = 0.74
    val rows = Seq((800000L, true), (300000L, false))
    val r = Quality.brierScore(rows.toDF("p", "y"), "p", "y").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 1L)
    assert(r.getDouble(2) === 0.065 && r.getDouble(3) === 0.25 &&
      r.getDouble(4) === 0.74)
    // perfect predictions: brier 0, skill 1
    val perfect = Quality.brierScore(
      Seq((1000000L, true), (0L, false)).toDF("p", "y"), "p", "y")
      .collect().head
    assert(perfect.getDouble(2) === 0.0 && perfect.getDouble(4) === 1.0)
    // inverted predictions: brier 1 (maximal), skill deeply negative
    val inv = Quality.brierScore(
      Seq((0L, true), (1000000L, false)).toDF("p", "y"), "p", "y")
      .collect().head
    assert(inv.getDouble(2) === 1.0 && inv.getDouble(4) === -3.0)
    // single-class corpus: no floor to beat — skill NULL, never ±Inf
    val one = Quality.brierScore(
      Seq((900000L, true), (800000L, true)).toDF("p", "y"), "p", "y")
      .collect().head
    assert(one.isNullAt(4) && one.getDouble(3) === 0.0)
    intercept[IllegalArgumentException] {
      Quality.brierScore(Seq((0.5, true)).toDF("p", "y"), "p", "y")
    }
    // range is fail-loud too: an out-of-range micro-score would silently
    // yield brier > 1 — it must raise, not flow through
    val oob = intercept[Exception] {
      Quality.brierScore(Seq((1000001L, true)).toDF("p", "y"), "p", "y")
        .collect()
    }
    assert(oob.getMessage.contains("micro-probability range") ||
      Option(oob.getCause).exists(_.getMessage.contains("micro-probability range")))
    intercept[Exception] {
      Quality.brierScore(Seq((-1L, false)).toDF("p", "y"), "p", "y")
        .collect()
    }
  }

  test("calibrationCurve: hand-computed bins, top-edge clamp, exact ECE") {
    val sp = spark; import sp.implicits._
    // micro-scores: two in bin 2 (conf .25, acc .5), two in bin 9 —
    // including the 10^6 top edge, which must clamp to bin 9, not 10
    val rows = Seq((250000L, true), (250000L, false),
      (950000L, true), (1000000L, true))
    val out = Quality.calibrationCurve(rows.toDF("p", "y"), "p", "y",
        bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(out.keySet === Set(2L, 9L), "empty bins must emit nothing")
    val (n2, p2, conf2, acc2, gap2, ece2) = out(2L)
    assert(n2 === 2L && p2 === 1L && conf2 === 0.25 && acc2 === 0.5 &&
      gap2 === 0.25)
    val (n9, p9, conf9, acc9, gap9, _) = out(9L)
    assert(n9 === 2L && p9 === 2L && conf9 === 0.975 && acc9 === 1.0 &&
      gap9 === 0.025)
    // ECE = (|1e6-5e5| + |2e6-195e4|) / (4e6) = 0.1375, same on every row
    assert(ece2 === 0.1375 && out(9L)._6 === 0.1375)
    intercept[IllegalArgumentException] {
      Quality.calibrationCurve(Seq((0.5, true)).toDF("p", "y"), "p", "y")
    }
    intercept[Exception] {
      Quality.calibrationCurve(Seq((1000001L, true)).toDF("p", "y"),
        "p", "y").collect()
    }
  }
}
