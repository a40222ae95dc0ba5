package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Lexical retrieval over the document corpus — the search-side
  * counterpart of the curation operators (ref behavior: none; EXT per
  * SURVEY §2.10): score documents against a bag-of-words query with
  * Okapi BM25 and return the top-k.
  *
  * Scale design: the query term set is tiny by contract (a user query),
  * so the per-token stream is filtered to query terms IMMEDIATELY after
  * tokenization — the corpus-wide explode never shuffles (tf aggregation
  * shuffles only rows whose token is a query term, ≤ |terms| rows per
  * doc). Document frequencies are |terms| rows (broadcast join), corpus
  * N/avgdl is one scalar aggregate (broadcast), and the final top-k is a
  * distributed TakeOrdered — no global sort materializes.
  *
  * Determinism: each term's contribution is rounded to 6 decimals and
  * summed as DECIMAL(30,6) (order-independent — Spark's aggregation
  * order is not deterministic and double addition is not associative),
  * then the doc score is rounded to 4; ordering ties break on doc id.
  */
object Retrieval {

  /** The Okapi BM25 per-(doc, term) contribution — expects tf, df, dl,
    * n_docs, avgdl in scope, emits the 6-decimal-rounded term score. The
    * ONE definition every entry point shares: the spec-asserted identity
    * between the direct, indexed, and batched paths rests on there being
    * no second copy to drift. */
  private def bm25Contribution(k1: Double, b: Double): org.apache.spark.sql.Column =
    round(
      log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
        (col("tf") * (lit(k1) + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))),
      6).as("c")

  /** Order-independent doc score: decimal-accumulated sum of the `c`
    * contributions, rounded to 4 (aggregation order must not perturb
    * the ranking). */
  private def bm25Score: org.apache.spark.sql.Column =
    round(sum(col("c").cast(DecimalType(30, 6))).cast(DoubleType), 4).as("score")

  /** A materialized lexical index: `postings` (tok, id, tf, dl) — one row
    * per (document, distinct token); `dictionary` (tok, df) — corpus
    * document frequency per token; `stats` — a single (n_docs, avgdl)
    * row. Write the three with [[graft.sources.ParquetSink]] (postings
    * bucketed by `tok`) and every later query reads back only the
    * postings of its terms — an `isin` filter on the bucket/sort column
    * that reaches the parquet scan as a pushed-down predicate. */
  final case class Bm25Index(postings: DataFrame, dictionary: DataFrame, stats: DataFrame)

  /** Build the [[Bm25Index]] once — the amortization path for repeated
    * queries: [[bm25]] re-derives tokenization, document frequencies and
    * corpus stats per call (right for one-off queries), while an index
    * pays that corpus pass once. `dl` is denormalized onto each posting
    * (8 bytes/row) so query time joins no per-doc side table. */
  def buildIndex(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): Bm25Index = {
    val postings = docs
      .select(col(idCol).as("id"), col(textCol).as("text_"))
      // single-split guard (same reasoning as the dedup family): a
      // compact doc table would otherwise tokenize the whole corpus on
      // one task
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"),
        graft.functions.TextOps.nonEmptyTokenCount(col("text_")).as("dl"),
        explode_outer(split(col("text_"), "\\s+")).as("tok"))
      // empty tokens (split's artifact on leading whitespace) never enter
      // postings or dictionary — dl above counts the same filtered stream,
      // so Σ tf per doc = dl holds (the index invariant)
      .where(col("tok").isNotNull && col("tok") =!= "")
      .groupBy("id", "dl", "tok").agg(count(lit(1)).as("tf"))
    val dictionary = postings.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs
      .select(graft.functions.TextOps.nonEmptyTokenCount(col(textCol)).as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    Bm25Index(postings, dictionary, stats)
  }

  /** Score a query against a prebuilt [[Bm25Index]] — identical output
    * to [[bm25]] over the indexed corpus (spec-asserted). Only the query
    * terms' postings and dictionary rows enter the plan; over a bucketed
    * parquet index the term filter prunes at the scan. */
  def bm25FromIndex(
      index: Bm25Index,
      queryTerms: Seq[String],
      idCol: String = "doc_id",
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val terms = queryTerms.distinct
    val contrib = index.postings.where(col("tok").isin(terms: _*))
      .join(index.dictionary.where(col("tok").isin(terms: _*)), Seq("tok"))
      .crossJoin(broadcast(index.stats))
      .select(col("id"), bm25Contribution(k1, b))
    contrib.groupBy("id")
      .agg(bm25Score)
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
      .select(col("id").as(idCol), col("score"))
  }

  /** Batched retrieval: score MANY queries in ONE pass over the index —
    * the production shape of retrieval mining (building RAG / contrastive
    * training pairs runs thousands of queries, and re-scanning postings
    * per query is the difference between one job and thousands).
    *
    * `queries` is a (queryIdCol, termCol) table, small by contract (it is
    * the query workload, not the corpus) — it broadcasts into the
    * postings join, so the postings stream is read once and only rows
    * whose token appears in SOME query survive; the per-(query, doc)
    * score aggregation then shuffles only those hits, and the final
    * top-k per query runs on the heap operator (map-side partial trim —
    * no global sort, no per-query job). The collected term list is also
    * applied as an `isin` prefilter so a bucketed parquet index still
    * prunes at the scan (a join alone would not push down).
    *
    * Per-query output is IDENTICAL to [[bm25FromIndex]] with that
    * query's terms (spec-asserted): document frequencies come from the
    * corpus-wide dictionary either way. Output: (queryIdCol, idCol,
    * score, rank), rank 1-based per query. */
  def bm25BatchFromIndex(
      index: Bm25Index,
      queries: DataFrame,
      queryIdCol: String = "query_id",
      termCol: String = "term",
      idCol: String = "doc_id",
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val q = queries.select(col(queryIdCol).as("qid"), col(termCol).as("tok")).distinct()
    // the workload's distinct terms, driver-side: the query table is
    // small by contract and the list exists to reach the parquet scan
    // as a pushed-down predicate on a bucketed index
    val termList = q.select("tok").distinct().collect().map(_.getString(0)).toSeq
    require(termList.nonEmpty, "queries must carry at least one term")
    val termDf = index.dictionary.where(col("tok").isin(termList: _*))
    val contrib = index.postings.where(col("tok").isin(termList: _*))
      .join(broadcast(q), Seq("tok"))
      .join(broadcast(termDf), Seq("tok"))
      .crossJoin(broadcast(index.stats))
      .select(col("qid"), col("id"), bm25Contribution(k1, b))
    val scored = contrib.groupBy("qid", "id").agg(bm25Score)
    graft.plans.TopK
      .perKey(scored, Seq(col("qid")), Seq(col("score").desc, col("id")), topK, "rank")
      .select(col("qid").as(queryIdCol), col("id").as(idCol), col("score"), col("rank"))
  }

  def bm25(
      docs: DataFrame,
      queryTerms: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val terms = queryTerms.distinct
    // (id, len) once per doc — the non-empty count, same units as tf
    val lens = docs.select(col(idCol).as("id"),
      graft.functions.TextOps.nonEmptyTokenCount(col(textCol)).as("dl"))
    // corpus scalars: one row, broadcast by the join planner
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // per-(doc, term) tf: the isin filter runs inside the exploded
    // stream, so only query-term hits reach the aggregation shuffle;
    // single-split fan-out guard as everywhere tokenization fans out
    val tf = docs
      .select(col(idCol).as("id"), col(textCol).as("text_"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"),
        explode_outer(split(col("text_"), "\\s+")).as("tok"))
      .where(col("tok").isNotNull && col("tok").isin(terms: _*))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(dfreq, Seq("tok"))
      .join(lens, Seq("id"))
      .crossJoin(broadcast(stats))
      .select(col("id"), bm25Contribution(k1, b))
    contrib.groupBy("id")
      .agg(bm25Score)
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
      .select(col("id").as(idCol), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke, Büttcher — SIGIR 2009):
    * combine N ranked lists into one, score(d) = Σ over lists of
    * 1/(k0 + rank_d). Rank-based, so a lexical BM25 list and a dense
    * cosine list fuse without any score calibration — the standard
    * hybrid-retrieval combiner. Inputs are already top-k sized (each a
    * retrieval output), so fusion is a narrow union + one tiny
    * aggregation; nothing here scales with the corpus. Determinism is
    * the [[bm25Score]] discipline: each addend rounds to 9 (identical
    * IEEE arithmetic in any engine), the sum accumulates as exact
    * DECIMAL — aggregation order cannot perturb a fused ranking even
    * with many lists (a raw double sum is non-associative; two addends
    * happen to be safe, N are not) — and the final score rounds to 6.
    *
    * Output: (idCol, rrf, n_lists) — n_lists makes "found by both
    * retrievers" visible, the usual confidence signal. */
  def rrfFuse(
      lists: Seq[DataFrame],
      idCol: String = "doc_id",
      rankCol: String = "rank",
      k0: Int = 60,
      topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    lists
      .map(_.select(col(idCol).as("id"),
        round(lit(1.0) / (lit(k0) + col(rankCol)), 9).as("rr")))
      .reduce(_.union(_))
      .groupBy("id")
      .agg(round(sum(col("rr").cast(DecimalType(30, 9))).cast(DoubleType), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(topK)
      .select(col("id").as(idCol), col("rrf"), col("n_lists"))
  }

  /** Per-query ranking-quality metrics against graded relevance — the
    * retrieval EVAL side ([[Similarity.rankingRecall]] is the unranked
    * overlap form): reciprocal rank of the first relevant hit, DCG over
    * the ranked list (grade / log₂(rank+1)), ideal DCG over the query's
    * relevance set at the same depth, and nDCG = DCG/IDCG. One metrics
    * row per query WITH relevance judgments (a query with no judged
    * docs has no defined metric — absent, not zero; a judged query the
    * ranking missed entirely scores rr = dcg = ndcg = 0).
    *
    * Scale shape: the join currency is (query, doc) over already
    * k·queries-sized rankings and qrel-sized judgments — never the
    * corpus; DCG contributions round into DECIMAL(28,14) before the
    * per-query sum (the drift accumulation rule), IDCG ranks the
    * relevance set with one qrel-sized window. */
  def rankingMetrics(
      ranked: DataFrame,
      rels: DataFrame,
      queryIdCol: String = "query_id",
      idCol: String = "doc_id",
      rankCol: String = "rank",
      gradeCol: String = "grade",
      depth: Int = 10): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    import org.apache.spark.sql.expressions.Window
    val r = ranked.select(col(queryIdCol).as("qid"), col(idCol).as("did"),
        col(rankCol).cast(LongType).as("rk"))
      .filter(col("rk") <= depth)
    val g = rels.select(col(queryIdCol).as("qid"), col(idCol).as("did"),
        col(gradeCol).cast(LongType).as("grade"))
      .filter(col("grade") > 0)
    val hits = r.join(g, Seq("qid", "did"))
    val rr = hits.groupBy("qid")
      .agg(round(lit(1.0) / min(col("rk")), 6).as("rr"))
    val dcg = hits
      .select(col("qid"),
        (col("grade") / log(2.0, col("rk") + 1))
          .cast(DecimalType(28, 14)).as("c"))
      .groupBy("qid").agg(sum("c").as("dcg_"))
    val ideal = g
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("grade").desc, col("did"))))
      .filter(col("pos") <= depth)
      .select(col("qid"),
        (col("grade") / log(2.0, col("pos") + 1))
          .cast(DecimalType(28, 14)).as("c"))
      .groupBy("qid").agg(sum("c").as("idcg_"))
    ideal
      .join(rr, Seq("qid"), "left")
      .join(dcg, Seq("qid"), "left")
      .select(col("qid").as(queryIdCol),
        coalesce(col("rr"), lit(0.0)).as("rr"),
        round(coalesce(col("dcg_"), lit(0)).cast(DoubleType), 6).as("dcg"),
        round((coalesce(col("dcg_"), lit(0)) / col("idcg_")).cast(DoubleType), 6)
          .as("ndcg"))
  }

  /** Average precision at `depth` — the order-sensitive completion of
    * [[rankingMetrics]] (RR sees only the FIRST hit, nDCG discounts but
    * forgives; AP is the area under precision-recall and punishes every
    * relevant doc left below a non-relevant one):
    * `AP = Σ_{hits h} precision@rank(h) / min(|relevant|, depth)`.
    * Binary relevance (`grade > 0` is relevant — the standard MAP
    * convention; graded lists should read nDCG instead). Mean over
    * queries (MAP) is one downstream `avg`.
    *
    * Determinism: hit indices order by rank (unique per query);
    * precision contributions enter DECIMAL(28,14) before the sum.
    * Queries with relevant docs but no retrieved hits score 0 — present
    * in the output, not silently absent (the [[rankingMetrics]] rule).
    *
    * Scale shape: one equi-join of the depth-trimmed run against the
    * qrels, one bounded per-query window (≤ depth rows), two grouped
    * aggregations — eval-sized throughout. */
  def averagePrecision(
      ranked: DataFrame,
      rels: DataFrame,
      queryIdCol: String = "query_id",
      idCol: String = "doc_id",
      rankCol: String = "rank",
      gradeCol: String = "grade",
      depth: Int = 10,
      roundTo: Int = 6): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    import org.apache.spark.sql.expressions.Window
    val r = ranked.select(col(queryIdCol).as("qid"), col(idCol).as("did"),
        col(rankCol).cast(LongType).as("rk"))
      .filter(col("rk") <= depth)
    val g = rels.where(col(gradeCol).cast(LongType) > 0)
      .select(col(queryIdCol).as("qid"), col(idCol).as("did"))
    val nrel = g.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val hits = r.join(g, Seq("qid", "did"))
      .withColumn("idx", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rk"))))
    val aps = hits
      .select(col("qid"),
        (col("idx") * lit(1.0) / col("rk")).cast(DecimalType(28, 14)).as("p"))
      .groupBy("qid")
      .agg(sum("p").as("psum"), count(lit(1)).as("n_hits"))
    nrel.join(aps, Seq("qid"), "left")
      .select(col("qid").as(queryIdCol), col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("psum"), lit(0)).cast(DoubleType) /
          least(col("n_rel"), lit(depth.toLong)).cast(DoubleType), roundTo)
          .as("ap"))
  }

  /** TF-IDF salient terms — the classic per-document keyword extraction
    * (the summarization/labeling primitive next to BM25's RANKING use of
    * the same statistics): per doc, the top-k terms by
    * `tf · (ln((N+1)/(df+1)) + 1)` (the standard smoothed idf — never
    * log-of-zero, corpus-wide terms score the floor 1·tf, not 0, so a
    * doc that is ALL stopwords still gets keywords).
    *
    * Determinism: the score ROUNDS to `roundTo` before ranking and ties
    * break on the term string (the q36 rounded-then-ranked rule), so
    * rank order survives float-summation and engine differences; `ln` is
    * the q91/q172-precedent libm call, absorbed by the rounding.
    *
    * Scale shape: one (doc, term) aggregation with map-side combining
    * (term hashes would halve the currency but the OUTPUT is the term
    * string — strings shuffle once, already aggregated), one vocabulary-
    * sized df join (AQE broadcasts when it fits), a 1-row N broadcast,
    * then the [[graft.plans.TopK]] heap trim — each partition trims to
    * ≤ k rows per doc BEFORE the exchange. */
  def salientTerms(
      df: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"salientTerms: k $k must be >= 1")
    val par = df.sparkSession.sparkContext.defaultParallelism
    val toks = df
      .select(col(idCol).as("id"), split(lower(col(textCol)), "\\s+").as("toks"))
      .repartition(par)
      .select(col("id"), explode_outer(col("toks")).as("term"))
      .where(col("term").isNotNull && col("term") =!= "")
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"),
        round(col("tf") *
          (log((col("n_docs") + 1).cast(DoubleType) / (col("dfreq") + 1))
            + 1), roundTo).as("tfidf"))
    graft.plans.TopK.perKey(scored, Seq(col("id")),
        Seq(col("tfidf").desc, col("term")), k, rankName = "rank")
      .select(col("id").as(idCol), col("rank").cast(LongType).as("rank"),
        col("term"), col("tf"), col("tfidf"))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein, SIGIR
    * 1998) — the diversity re-ranker every retrieval/eval-set curation
    * pipeline ends with: greedily pick k items maximizing
    * λ·relevance − (1−λ)·max-sim-to-already-selected, so the result
    * covers the relevant space instead of returning k near-copies
    * (L141's k-center selects pure coverage; MMR trades coverage
    * against a relevance column).
    *
    * Determinism/exactness (the kCenterSelect discipline): λ enters as
    * the RATIONAL lambdaNum/lambdaDen, relevance is an integral micro
    * score (fail-loud require), pairwise similarity quantizes to a
    * micro-int simq = round(cos·10⁶) where cos = intdot/(√int·√int) over
    * 10⁻⁶-grid quantized vectors — identical doubles in any IEEE engine,
    * identical round — so the per-round argmax compares EXACT integers
    * lambdaNum·relq − (lambdaDen−lambdaNum)·maxsimq with (score DESC,
    * id) ties: the selection is a pure function of the pool at any
    * parallelism, and a SQL oracle replays every round ([[mmrSqlCtes]]).
    *
    * Scale shape: the pool is a RE-RANK candidate set by contract
    * (≤ 65536, fail-loud) — i.e. MODEL-SIZED: the engine stages and
    * validity-filters the pool distributed, collects it ONCE, and the
    * greedy chain runs driver-side over exact integers (r19 optimization
    * round; the previous shape ran ~3 Spark jobs per round — a rowOf
    * collect, a persisted running-max frame, a TakeOrdered(1) — all over
    * a ≤65536-row frame, pure job-latency; one collect replaces ~3k+2
    * jobs with IDENTICAL arithmetic: the micro-int cosine mirrors the
    * column chain op-for-op — exact long dot, the same left-to-right
    * IEEE double chain, scala BigDecimal HALF_UP = Catalyst Round — and
    * the argmax comparator mirrors (score DESC NULLS LAST, id) with
    * greatest()'s null-skipping max; spec-pinned against the previous
    * engine-side shape by RetrievalSpec's sequential-reference test and
    * hash-gated by q242's generated-SQL oracle). Zero-/NaN-norm pool
    * vectors drop (the similarity-family contract). Output:
    * (rank, id, relq, max_simq, mmr_q) — max_simq NULL at rank 1, where
    * mmr_q = lambdaNum·relq. */
  def mmrSelect(
      pool: DataFrame,
      k: Int,
      lambdaNum: Int = 7,
      lambdaDen: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      relCol: String = "rel",
      quantDecimals: Int = 6): DataFrame = {
    require(k >= 1 && k <= 64, s"k $k outside [1, 64]")
    require(lambdaNum >= 1 && lambdaNum <= lambdaDen,
      s"lambda $lambdaNum/$lambdaDen outside (0, 1]")
    pool.schema(relCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType
         | _: org.apache.spark.sql.types.ShortType
         | _: org.apache.spark.sql.types.IntegerType
         | _: LongType => ()
      case dt => throw new IllegalArgumentException(
        s"Retrieval.mmrSelect: relevance column '$relCol' must be an " +
          s"integral micro score (got $dt) — quantize as round(rel*1e6)")
    }
    val spark = pool.sparkSession
    val scale = math.pow(10.0, quantDecimals)
    val staged = pool
      .where(col(idCol).isNotNull && col(vecCol).isNotNull &&
        !isnan(graft.functions.VectorOps.l2Norm(col(vecCol))))
      .select(col(idCol).cast(LongType).as("id"),
        col(relCol).cast(LongType).as("relq"),
        transform(col(vecCol), x =>
          round(x.cast(DoubleType) * scale).cast(LongType)).as("vq"))
      .withColumn("n2", graft.functions.VectorOps.dotLong(col("vq"), col("vq")))
      .where(col("n2") > 0L)
    // ONE job: collect the (contractually ≤65536-row) pool; limit+1 keeps
    // the size guard fail-loud without a separate count pass
    val collected = staged.limit(65537).collect()
    require(collected.nonEmpty, "mmrSelect: empty pool after the validity filter")
    require(collected.length <= 65536,
      s"mmrSelect: pool exceeds 65536 rows — this is a RE-RANK operator " +
        "(bound the pool with a first-stage retriever, e.g. topKIvfPq)")
    final case class P(id: Long, relq: Long, vq: Array[Long], n2: Long)
    val rows = collected.map { r =>
      P(r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray, r.getLong(3))
    }
    // the micro-int cosine, mirroring the previous column chain
    // op-for-op: exact long dot (zip_with pads a length mismatch with
    // nulls ⇒ NULL sim — mirrored as None), the same left-to-right IEEE
    // double chain dot/(√n2·√cn2)·scale, and scala BigDecimal HALF_UP =
    // Catalyst Round-on-double (both go through valueOf/toString)
    def simqOf(p: P, cv: Array[Long], cn2: Long): Option[Long] =
      if (p.vq.length != cv.length) None
      else {
        var i = 0; var dot = 0L
        while (i < cv.length) { dot += p.vq(i) * cv(i); i += 1 }
        val x = dot.toDouble /
          (math.sqrt(p.n2.toDouble) * math.sqrt(cn2.toDouble)) * scale
        Some(BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    // greatest() semantics: max of the non-null values, null iff both null
    def gmax(a: Option[Long], b: Option[Long]): Option[Long] = (a, b) match {
      case (Some(x), Some(y)) => Some(math.max(x, y))
      case (x, None) => x
      case (None, y) => y
    }
    val byId = rows.map(p => p.id -> p).toMap
    val first = rows.minBy(p => (-p.relq, p.id))
    var picks = Vector((first.id, first.relq,
      Option.empty[Long], lambdaNum.toLong * first.relq))
    val mu = lambdaNum.toLong
    val nu = (lambdaDen - lambdaNum).toLong
    val ms = scala.collection.mutable.HashMap.empty[Long, Option[Long]]
    var chosen = Set(first.id)
    for (_ <- 2 to math.min(k, rows.length)) {
      val c = byId(picks.last._1)
      rows.foreach { p =>
        val s = simqOf(p, c.vq, c.n2)
        ms(p.id) = if (ms.contains(p.id)) gmax(ms(p.id), s) else s
      }
      // argmax by (score DESC NULLS LAST, id ASC) — the previous
      // TakeOrdered(1) ordering verbatim
      val cand = rows.iterator.filterNot(p => chosen.contains(p.id))
      if (!cand.hasNext) throw new IllegalStateException("mmrSelect: pool exhausted")
      val best = cand.map { p =>
        (p, ms(p.id).map(m => mu * p.relq - nu * m))
      }.reduce[(P, Option[Long])] { case (a, b) =>
        ((a._2, b._2) match {
          case (Some(x), Some(y)) =>
            if (x > y || (x == y && a._1.id < b._1.id)) a else b
          case (Some(_), None) => a
          case (None, Some(_)) => b
          case (None, None) => if (a._1.id < b._1.id) a else b
        })
      }
      val (p, score) = best
      // a null ms/score read back 0 through the previous Row.getLong —
      // degenerate (mismatched-dim) pools only; mirrored exactly
      picks :+= ((p.id, p.relq, Some(ms(p.id).getOrElse(0L)),
        score.getOrElse(0L)))
      chosen += p.id
    }
    import spark.implicits._
    picks.zipWithIndex
      .map { case ((id, relq, msq, sc), i) => (i + 1L, id, relq, msq, sc) }
      .toDF("rank", idCol, "relq", "max_simq", "mmr_q")
  }

  /** The DuckDB replay of [[mmrSelect]], generated from the same round
    * structure (the kCenterSqlCtes one-source-of-truth rule). `poolCte`
    * must be a CTE name exposing (id BIGINT, relq BIGINT, vq BIGINT[],
    * n2 BIGINT) — quantized vectors with exact integer norms, validity
    * already applied. */
  def mmrSqlCtes(
      poolCte: String,
      k: Int,
      lambdaNum: Int = 7,
      lambdaDen: Int = 10,
      quantDecimals: Int = 6): String = {
    require(k >= 2 && k <= 64, s"k $k outside [2, 64]")
    val scale = "1" + ("0" * quantDecimals)
    val mu = lambdaNum
    val nu = lambdaDen - lambdaNum
    val rounds = (2 to k).map { r =>
      val prevSel = if (r == 2) "(SELECT id FROM p1)"
        else s"(SELECT id FROM sel${r - 1})"
      val selCte = if (r == 2) "sel2 AS (SELECT id FROM p1 UNION ALL SELECT id FROM p2)"
        else s"sel$r AS (SELECT id FROM sel${r - 1} UNION ALL SELECT id FROM p$r)"
      val cPick = if (r == 2) "p1" else s"p${r - 1}"
      val simExpr =
        s"""CAST(round(list_inner_product(CAST(pp.vq AS DOUBLE[]), CAST(cc.vq AS DOUBLE[]))
           |      / (SQRT(CAST(pp.n2 AS DOUBLE)) * SQRT(CAST(cc.n2 AS DOUBLE)))
           |      * $scale.0) AS BIGINT)""".stripMargin
      val mCte = if (r == 2)
        s"""m1 AS (SELECT pp.id, pp.relq, $simExpr AS ms
           |  FROM $poolCte pp CROSS JOIN
           |    (SELECT vq, n2 FROM $poolCte WHERE id = (SELECT id FROM p1)) cc)""".stripMargin
      else
        s"""m${r - 1} AS (SELECT pm.id, pm.relq, GREATEST(pm.ms, $simExpr) AS ms
           |  FROM m${r - 2} pm JOIN $poolCte pp USING (id) CROSS JOIN
           |    (SELECT vq, n2 FROM $poolCte
           |     WHERE id = (SELECT id FROM p${r - 1})) cc)""".stripMargin
      val pCte =
        s"""p$r AS (SELECT id, relq, ms, $mu * relq - $nu * ms AS score
           |  FROM m${r - 1} WHERE id NOT IN $prevSel
           |  ORDER BY score DESC, id LIMIT 1)""".stripMargin
      s"$mCte,\n$pCte,\n$selCte"
    }
    val finalRows = (2 to k).map(r =>
      s"UNION ALL SELECT $r, id, relq, ms, score FROM p$r").mkString("\n")
    s"""p1 AS (SELECT id, relq FROM $poolCte ORDER BY relq DESC, id LIMIT 1),
       |${rounds.mkString(",\n")},
       |mmr_out AS (
       |SELECT CAST(1 AS BIGINT) AS rank, id, relq,
       |  CAST(NULL AS BIGINT) AS max_simq, $mu * relq AS mmr_q
       |FROM p1
       |$finalRows)""".stripMargin
  }

  /** Hard-negative mining for retrieval / embedding training (Karpukhin
    * et al. 2020's DPR pairs BM25 negatives with in-batch ones; Xiong et
    * al. 2021's ANCE mines them from the ANN index itself; Qu et al.
    * 2021's RocketQA adds the FALSE-NEGATIVE guard this implements):
    * given labeled (probe → positive) pairs and a precomputed neighbor
    * frame from ANY ANN tier — [[graft.operators.Similarity.topKBruteForce]]
    * for eval batches, `topKIvf`/`topKIvfPq` in production (the
    * `marginFromNeighbors` entry-point pattern) — emit per probe the
    * top-k most-similar candidates that are NOT the labeled positive
    * and score AT OR BELOW pos_sim − margin: the hardest negatives that
    * are still confidently negative. A candidate scoring above the
    * labeled positive is more likely an unlabeled positive than a
    * negative (the RocketQA denoising observation) and training on it
    * poisons the contrastive objective — the margin is that guard, in
    * the same rounded-cosine currency as the neighbor frame.
    *
    * Contract: `neighbors` = (pid, nid, sim) with sim ROUNDED (the
    * topK* output currency — both engines derive identical doubles);
    * `positives` = (pid, pos_id), one row per probe. pos_sim is read
    * from the probe's OWN neighbor frame row (nid = pos_id); probes
    * whose positive is absent from their neighbor list are dropped —
    * mine from lists deep enough to contain the positive (the brute
    * tier always does; production callers size k accordingly). Output
    * (pid, rank, nid, sim, pos_id, pos_sim), rank by (sim DESC, nid)
    * via the heap operator.
    *
    * Scale shape: two equi-joins on probe id + one TopK heap trim —
    * neighbor frames are k·probes-sized by construction, the corpus is
    * never touched (candidate generation already paid by the ANN tier). */
  def hardNegativesFromNeighbors(
      neighbors: DataFrame,
      positives: DataFrame,
      k: Int,
      margin: Double = 0.0): DataFrame = {
    require(k >= 1, s"hardNegativesFromNeighbors: k $k must be >= 1")
    require(margin >= 0.0,
      s"hardNegativesFromNeighbors: margin $margin must be >= 0")
    // pos derives FROM neighbors, so the candidate join below is a
    // lineage self-join — qualify both sides explicitly
    val nb = neighbors.select(col("pid"), col("nid"), col("sim"))
    val pos = nb.as("n")
      .join(positives.as("q"), col("n.pid") === col("q.pid") &&
        col("n.nid") === col("q.pos_id"))
      .select(col("n.pid").as("pid"), col("q.pos_id").as("pos_id"),
        col("n.sim").as("pos_sim"))
    val cands = nb.as("m").join(pos.as("p"), col("m.pid") === col("p.pid"))
      .where(col("m.nid") =!= col("p.pos_id") &&
        col("m.sim") <= col("p.pos_sim") - lit(margin))
      .select(col("m.pid").as("pid"), col("m.nid").as("nid"),
        col("m.sim").as("sim"), col("p.pos_id").as("pos_id"),
        col("p.pos_sim").as("pos_sim"))
    graft.plans.TopK.perKey(
        cands, Seq(col("pid")), Seq(col("sim").desc, col("nid")), k)
      .select("pid", "rank", "nid", "sim", "pos_id", "pos_sim")
  }
}
