package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.LongType

/** Train/eval decontamination — the n-gram-collision check every serious
  * pretraining pipeline runs before shipping a corpus: an eval document
  * whose n-grams appear in the training set is contaminated (the model
  * will be graded on text it memorized), and the published recipes
  * (GPT-3's 13-gram dedup, the LLaMA/PaLM eval-overlap audits) all reduce
  * to exactly this join: distinct training n-grams ⋈ eval n-grams.
  *
  * Scale shape mirrors [[Dedup.jaccardPairs]]: n-grams travel as 64-bit
  * xxhash64 values from the one-pass [[graft.expressions.ShingleHashesKernel]]
  * (8 bytes per gram, no token or shingle strings ever materialize or
  * shuffle), the train side is distinct-ed BEFORE the join (its volume is
  * its vocabulary, not its corpus size), both sides repartition on the
  * hash below the join with a `shuffle_hash` hint (both scale with the
  * corpus — broadcasting either would collect a corpus-sized stream to
  * the driver, and the aggregate-derived train side's size ESTIMATE could
  * otherwise tempt the planner into exactly that), and the per-doc
  * overlap count comes from a map-side-combining aggregation.
  */
object Decontaminate {

  /** Distinct n-gram hash set per doc (empty array for docs shorter than
    * n tokens), exploded to (id, h) rows. Unlike Dedup's cached variant
    * this is referenced once per side — no persist barrier needed. */
  private def gramRows(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val hashes = ColumnGlue.column(graft.expressions.ShingleHashesKernel(
      ColumnGlue.expression(col("text_")), n))
    df.select(col(idCol).as("id"), col(textCol).as("text_"))
      // single-split guard (same reasoning as the dedup family): pin the
      // kernel fan-out before the per-doc byte loop runs
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      // explode_OUTER + null-filter: a non-outer Generate triggers
      // InferFiltersFromGenerate, whose inferred size(...)>0 filter
      // re-runs the signature kernel a second time per row inside the
      // scan filter. The rule skips outer generates; the isNotNull on
      // the OUTPUT attribute restores plain-explode semantics (docs
      // shorter than n grams contribute no row).
      .select(col("id"), explode_outer(hashes).as("h"))
      .where(col("h").isNotNull)
  }

  /** Flag eval/test documents sharing at least `minShared` distinct
    * n-grams with the training corpus.
    *
    * Returns one row per `test` document:
    * (idCol, shared_ngrams, contaminated) — `shared_ngrams` counts the
    * test doc's DISTINCT n-grams that occur anywhere in train (not
    * occurrence pairs), so a hot train n-gram can't inflate the score.
    *
    * @param maxTrainDf optionally drop training n-grams occurring in more
    *   than this many training docs before the join — the boilerplate
    *   guard: a ubiquitous phrase ("all rights reserved") is not evidence
    *   of contamination, and at corpus scale it is also the skewed join
    *   key. None = keep all (exact).
    */
  def overlap(
      train: DataFrame,
      test: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 13,
      minShared: Long = 1L,
      maxTrainDf: Option[Int] = None): DataFrame = {
    require(n >= 1, s"n-gram order $n must be >= 1")
    require(minShared >= 1, s"minShared $minShared must be >= 1")
    // kernel emits per-doc DISTINCT hashes, so counting rows per hash here
    // is document frequency — the maxTrainDf guard reads it directly
    val trainDf = gramRows(train, idCol, textCol, n)
      .groupBy("h").agg(count(lit(1)).as("tdf"))
    overlapTail(trainDf, gramRows(test, idCol, textCol, n),
      test, idCol, minShared, maxTrainDf)
  }

  /** Shared join tail of [[overlap]]/[[overlapBloomPruned]]: df-guard the
    * per-gram train frequencies, shuffle-hash join the two gram streams on
    * the 64-bit hash, count per test doc, mark back onto every test row. */
  private def overlapTail(
      trainDf: DataFrame,
      testGrams: DataFrame,
      test: DataFrame,
      idCol: String,
      minShared: Long,
      maxTrainDf: Option[Int]): DataFrame = {
    val par = test.sparkSession.sparkContext.defaultParallelism
    val trainGrams = (maxTrainDf match {
      case Some(m) => trainDf.filter(col("tdf") <= m)
      case None    => trainDf
    }).select("h")
    val shared = testGrams
      .repartition(par, col("h"))
      .hint("shuffle_hash")
      .join(trainGrams.repartition(par, col("h")), "h")
      .groupBy("id").agg(count(lit(1)).as("shared_"))
    test.select(col(idCol).as("id"))
      .join(shared, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("shared_"), lit(0L)).cast(LongType).as("shared_ngrams"),
        (coalesce(col("shared_"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** [[overlap]] with the TRAIN-side gram stream pruned map-side by a
    * Bloom filter over the eval set's n-gram vocabulary — the 100 TB
    * shape of this check. The exact join is asymmetric in the worst way:
    * the train side's distinct-gram aggregation shuffles the corpus
    * VOCABULARY (hundreds of billions of 8-byte hashes at pretraining
    * scale) even though only the tiny fraction colliding with the eval
    * set can ever match. A Bloom filter of the eval vocabulary (benchmark
    * sets are thousands of documents — a few million grams, a handful of
    * MB at the default 3% false-positive rate: bits = n·ln(1/p)/ln²2 ≈
    * 7.3 bits/gram) rides into every train-side scan task as a constant
    * and discards non-colliding grams BEFORE the distinct aggregation and
    * the join, shrinking both from corpus-vocabulary to ~eval-vocabulary
    * volume.
    *
    * False positives only let extra train grams through to the exact
    * join, where they match nothing — the output is bit-identical to
    * [[overlap]] for every fpp (equivalence property-tested in
    * DecontaminateSpec; the driver gate runs it against the same exact
    * SQL oracle). The bloom itself is driver-held model state of the
    * same kind as [[Similarity.kMeansCentroids]]' centroid matrix — its
    * size is set by the EVAL set, which benchmark suites keep small, not
    * by the corpus.
    *
    * Built on Spark's own sketch machinery (`BloomFilterAggregate` /
    * `BloomFilterMightContain`, the expression pair behind AQE runtime
    * filters) so both the distributed build and the codegen'd probe are
    * stock Tungsten paths; the aggregate's input is the same 64-bit
    * [[graft.expressions.ShingleHashesKernel]] hash the join shuffles.
    */
  def overlapBloomPruned(
      train: DataFrame,
      test: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 13,
      minShared: Long = 1L,
      maxTrainDf: Option[Int] = None,
      bloomFpp: Double = 0.03): DataFrame = {
    require(n >= 1, s"n-gram order $n must be >= 1")
    require(minShared >= 1, s"minShared $minShared must be >= 1")
    require(bloomFpp > 0 && bloomFpp < 1, s"bloomFpp $bloomFpp must be in (0,1)")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType

    // the eval side is read three times (vocabulary count — the bloom's
    // size parameter must be a literal before the aggregate runs — then
    // the bloom build, then the join side later); every pass is over the
    // benchmark-sized set, and a persist barrier would have to outlive
    // this call's laziness, so the repeated read is the honest cost and
    // it is bounded by the eval set's size, not the corpus's
    val evalVocab = gramRows(test, idCol, textCol, n).select("h").distinct()
    val nGrams = evalVocab.count()
    if (nGrams == 0L)
      // every eval doc is shorter than n tokens: nothing can collide
      return test.select(
        col(idCol),
        lit(0L).cast(LongType).as("shared_ngrams"),
        lit(false).as("contaminated"))
    val numBits = math.ceil(
      nGrams * math.log(1.0 / bloomFpp) / (math.log(2) * math.log(2))).toLong
    val bloom = evalVocab.select(ColumnGlue.column(
        new BloomFilterAggregate(ColumnGlue.expression(col("h")),
          Literal(nGrams), Literal(numBits)).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val mightCollide = ColumnGlue.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnGlue.expression(col("h"))))
    // prune BEFORE the distinct aggregation: surviving grams keep their
    // full per-gram df count (the filter is on the gram itself, never on
    // its occurrences), so the maxTrainDf guard semantics are unchanged
    val trainDf = gramRows(train, idCol, textCol, n)
      .where(mightCollide)
      .groupBy("h").agg(count(lit(1)).as("tdf"))
    overlapTail(trainDf, gramRows(test, idCol, textCol, n),
      test, idCol, minShared, maxTrainDf)
  }

  /** The complementary decontamination ACTION: cut every training span
    * whose n-token window occurs anywhere in the eval/benchmark set —
    * the "remove any overlapping n-gram from train" recipe (GPT-3 cut
    * 13-gram collisions out of TRAIN, the inverse direction of
    * [[overlap]]'s eval flagging). One benchmark occurrence is already
    * contamination, so the window set carries NO occurrence threshold
    * ([[Dedup.windowHashes]], distinct windows of eval); the cut itself
    * is [[Dedup.removeSpansMatching]] — merged intervals, surviving text
    * per train doc. The eval set is benchmark-sized (≪ corpus), so the
    * unhinted mark-back join lets Catalyst broadcast it. */
  def cutEvalSpans(
      train: DataFrame,
      eval: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 13): DataFrame =
    Dedup.removeSpansMatching(train,
      Dedup.windowHashes(eval, idCol, textCol, n), idCol, textCol, n)
}
