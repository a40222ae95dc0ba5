package graft.operators

import graft.SparkSpecBase
import graft.core.Tables

class RetrievalSpec extends SparkSpecBase {

  private def round(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25 matches a driver-side brute-force computation on the fixture") {
    val terms = Seq("key", "table", "hash")
    val (k1, b) = (1.2, 0.75)
    val docs = Tables.load(spark, sfDir, "documents")
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap

    val n = raw.size.toLong
    val avgdl = raw.values.map(_.size.toLong).sum.toDouble / n
    val df = terms.map(t => t -> raw.values.count(_.contains(t)).toLong).toMap
    val scores = raw.flatMap { case (id, toks) =>
      val contribs = terms.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0L) None
        else {
          val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          val c = idf * (tf * (k1 + 1.0)) /
            (tf + k1 * (1.0 - b + b * toks.size / avgdl))
          Some(BigDecimal(round(c, 6)))
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> round(contribs.sum.toDouble, 4))
    }
    val expected = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)

    val got = Retrieval.bm25(docs, terms, topK = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got === expected)
    assert(got.size === 10, "fixture corpus must fill the top-10")
  }

  test("bm25: rarer terms out-score common ones at equal tf") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "rare common filler1 filler2"),
      (2L, "common filler3 filler4 filler5"),
      (3L, "common filler6 filler7 filler8")).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, Seq("rare", "common"), topK = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) > out(2L), "doc with the rare term must rank first")
    assert(out(2L) === out(3L), "identical docs w.r.t. the query tie exactly")
  }

  test("bm25FromIndex over a round-tripped parquet index equals direct bm25") {
    val terms = Seq("key", "table", "hash")
    val docs = Tables.load(spark, sfDir, "documents")
    val direct = Retrieval.bm25(docs, terms, topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // materialize the index the way a real deployment would — parquet out,
    // read back — so the equality also covers the write/read round-trip
    val ix = Retrieval.buildIndex(docs)
    val dir = java.nio.file.Files.createTempDirectory("bm25ix").toString
    ix.postings.write.mode("overwrite").parquet(s"$dir/postings")
    ix.dictionary.write.mode("overwrite").parquet(s"$dir/dictionary")
    ix.stats.write.mode("overwrite").parquet(s"$dir/stats")
    val reloaded = Retrieval.Bm25Index(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/dictionary"),
      spark.read.parquet(s"$dir/stats"))
    val indexed = Retrieval.bm25FromIndex(reloaded, terms, topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed === direct)
  }

  test("bm25BatchFromIndex: each query's ranking equals the single-query path") {
    val s = spark
    import s.implicits._
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val index = Retrieval.buildIndex(docs)
    val workload = Map(
      1L -> Seq("key", "table", "hash"),
      2L -> Seq("window", "batch", "spark"))
    val qtab = workload.toSeq
      .flatMap { case (qid, ts) => ts.map(qid -> _) }.toDF("query_id", "term")
    val batch = Retrieval.bm25BatchFromIndex(index, qtab, topK = 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getLong(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq }
    workload.foreach { case (qid, terms) =>
      val single = Retrieval.bm25FromIndex(index, terms, topK = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) === single, s"query $qid diverged from the single path")
    }
  }

  test("bm25BatchFromIndex: contract checks") {
    val s = spark
    import s.implicits._
    val index = Retrieval.buildIndex(Seq((1L, "a b c")).toDF("doc_id", "text"))
    val empty = Seq.empty[(Long, String)].toDF("query_id", "term")
    intercept[IllegalArgumentException](Retrieval.bm25BatchFromIndex(index, empty))
    intercept[IllegalArgumentException](
      Retrieval.bm25BatchFromIndex(index,
        Seq((1L, "a")).toDF("query_id", "term"), topK = 0))
  }

  test("bm25: contract checks") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Retrieval.bm25(docs, Seq.empty))
    intercept[IllegalArgumentException](Retrieval.bm25(docs, Seq("a"), topK = 0))
  }

  test("rankingMetrics: hand-computed RR/DCG/nDCG; missed query zero; unjudged query absent") {
    val s = spark
    import s.implicits._
    val ranked = Seq(
      (1L, "b", 1L), (1L, "x", 2L), (1L, "a", 3L),
      (2L, "y", 1L), (2L, "z", 2L),
      (3L, "w", 1L)) // q3 has no judgments at all
      .toDF("query_id", "doc_id", "rank")
    val rels = Seq((1L, "a", 2L), (1L, "b", 1L), (2L, "c", 1L))
      .toDF("query_id", "doc_id", "grade")
    val got = Retrieval.rankingMetrics(ranked, rels, depth = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === Set(1L, 2L), "unjudged query has no defined metric")
    // q1: b@1 (g1), a@3 (g2): dcg = 1/log2(2) + 2/log2(4) = 2.0
    //     idcg = 2/log2(2) + 1/log2(3) = 2.630930
    val (rr1, dcg1, ndcg1) = got(1L)
    assert(rr1 === 1.0 && dcg1 === 2.0)
    assert(math.abs(ndcg1 - 2.0 / (2.0 + 1.0 / (math.log(3) / math.log(2)))) < 1e-5)
    assert(got(2L) === ((0.0, 0.0, 0.0)), "judged query the ranking missed scores zero")
  }

  test("rrfFuse: hand-computed fusion, overlap counted, contract checks") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val b = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // mirror the operator's determinism discipline: addends round to 9,
    // exact decimal sum, final round to 6
    def rr(rank: Long) =
      BigDecimal(1.0 / (60 + rank)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 2 appears in both lists and must lead
    assert(got.toSeq === Seq(
      (2L, r6(rr(2) + rr(1)), 2L),
      (1L, r6(rr(1)), 1L),
      (3L, r6(rr(2)), 1L)))
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq.empty))
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq(a), k0 = 0))
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq(a), topK = 0))
  }

  test("averagePrecision: textbook example, no-hit query scores 0, depth caps the denominator") {
    val s = spark; import s.implicits._
    // q1: relevant docs {a, c, e}; run = a, b, c, d, e
    //   AP = (1/1 + 2/3 + 3/5) / 3 = 34/45
    val ranked = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L), (1L, "d", 4L), (1L, "e", 5L),
      (2L, "x", 1L), (2L, "y", 2L))
      .toDF("query_id", "doc_id", "rank")
    val rels = Seq((1L, "a", 1L), (1L, "c", 2L), (1L, "e", 1L),
      (2L, "zz", 1L), (3L, "a", 1L))
      .toDF("query_id", "doc_id", "grade")
    val got = Retrieval.averagePrecision(ranked, rels, depth = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((3L, 3L, r6(34.0 / 45))))
    assert(got(2L) === ((1L, 0L, 0.0)), "relevant but never retrieved: AP 0, present")
    assert(got(3L) === ((1L, 0L, 0.0)), "query absent from the run: AP 0, present")
    // depth caps the denominator: 6 relevant, top-2 both hits -> AP@2 = 1
    val r2 = Seq((9L, "a", 1L), (9L, "b", 2L)).toDF("query_id", "doc_id", "rank")
    val g6 = (1 to 6).map(i => (9L, ('a' + i - 1).toChar.toString, 1L))
      .toDF("query_id", "doc_id", "grade")
    val ap2 = Retrieval.averagePrecision(r2, g6, depth = 2).collect().head
    assert(ap2.getDouble(3) === 1.0, "perfect top-2 run is AP@2 = 1 even with 6 qrels")
  }

  test("salientTerms: hand-computed tf-idf, smoothed idf floor, term tie-break") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common common Common")      // case folds; all-stopword doc
    ).toDF("doc_id", "text")
    val got = Retrieval.salientTerms(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    def idf(df: Long): Double = math.log(4.0 / (df + 1)) + 1
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc1: apple tf=2 df=1 -> 2*(ln2+1); banana tf=1 df=2
    assert(got((1L, 1L)) === (("apple", 2L, r6(2 * idf(1)))))
    assert(got((1L, 2L)) === (("banana", 1L, r6(idf(2)))))
    // doc3: 'common' df=3 -> idf = ln(4/4)+1 = 1 exactly; tf=3 after fold
    assert(got((3L, 1L)) === (("common", 3L, 3.0)),
      "smoothed idf floors at 1; an all-stopword doc still gets keywords")
    // doc2: banana and cherry — cherry (df=1) outscores banana (df=2)
    assert(got((2L, 1L))._1 === "cherry" && got((2L, 2L))._1 === "banana")
  }

  test("mmrSelect equals a sequential greedy reference at any partitioning") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(23)
    val vecs = (1 to 30).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f), rnd.nextInt(1000000).toLong))
    def run(df: org.apache.spark.sql.DataFrame) =
      Retrieval.mmrSelect(df, k = 6).orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).toSeq
    val got = run(vecs.toDF("vec_id", "embedding", "rel").repartition(1))
    // sequential reference with identical quantization, round, tie-breaks
    def rl(d: Double): Long =
      BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val q = vecs.map { case (id, v, _) =>
      id -> v.map(x => rl(x.toDouble * 1e6)) }.toMap
    val rel = vecs.map { case (id, _, r) => id -> r }.toMap
    def n2(a: Seq[Long]): Long = a.map(x => x * x).sum
    def simq(a: Long, b: Long): Long = rl(
      q(a).zip(q(b)).map { case (x, y) => x * y }.sum.toDouble /
        (math.sqrt(n2(q(a)).toDouble) * math.sqrt(n2(q(b)).toDouble)) * 1e6)
    val ids = vecs.map(_._1)
    val first = ids.map(id => (id, rel(id))).sortBy { case (id, r) => (-r, id) }.head
    var picks = Vector((first._1, rel(first._1), -1L, 7L * rel(first._1)))
    val ms = scala.collection.mutable.Map(ids.map(id => id -> Long.MinValue): _*)
    for (_ <- 2 to 6) {
      ids.foreach(id => ms(id) = math.max(ms(id), simq(id, picks.last._1)))
      val chosen = picks.map(_._1).toSet
      val (pid, pms, psc) = ids.filterNot(chosen)
        .map(id => (id, ms(id), 7L * rel(id) - 3L * ms(id)))
        .sortBy { case (id, _, sc) => (-sc, id) }.head
      picks :+= ((pid, rel(pid), pms, psc))
    }
    assert(got === picks.zipWithIndex.map { case ((id, r, m, sc), i) =>
      (i + 1L, id, r, m, sc) })
    assert(run(vecs.reverse.toDF("vec_id", "embedding", "rel").repartition(32)) === got,
      "selection must be a pure function of the pool at any partitioning")
  }

  test("mmrSelect: lambda=1 is pure relevance order; contracts fail loud") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 12).map(i =>
      (i.toLong, Seq.fill(4)(rnd.nextFloat() - 0.5f), rnd.nextInt(100).toLong))
    val df = vecs.toDF("vec_id", "embedding", "rel")
    val got = Retrieval.mmrSelect(df, k = 5, lambdaNum = 10, lambdaDen = 10)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val want = vecs.map { case (id, _, r) => (id, r) }
      .sortBy { case (id, r) => (-r, id) }.take(5).map(_._1)
    assert(got === want, "lambda = 1 must degenerate to (rel DESC, id) order")
    // zero-norm vectors drop before selection
    val withZero = vecs :+ (99L, Seq(0f, 0f, 0f, 0f), 1000000L)
    val g2 = Retrieval.mmrSelect(withZero.toDF("vec_id", "embedding", "rel"),
      k = 5, lambdaNum = 10, lambdaDen = 10).collect().map(_.getLong(1))
    assert(!g2.contains(99L), "zero-norm pool vector must drop")
    intercept[IllegalArgumentException](Retrieval.mmrSelect(df, k = 0))
    intercept[IllegalArgumentException](Retrieval.mmrSelect(df, k = 65))
    intercept[IllegalArgumentException](
      Retrieval.mmrSelect(df, k = 3, lambdaNum = 0))
    intercept[IllegalArgumentException](
      Retrieval.mmrSelect(df, k = 3, lambdaNum = 11, lambdaDen = 10))
    intercept[IllegalArgumentException](Retrieval.mmrSelect(
      vecs.map { case (id, v, r) => (id, v, r.toDouble) }
        .toDF("vec_id", "embedding", "rel"), k = 3))
  }
}
