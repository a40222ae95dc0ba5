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
    val par = train.sparkSession.sparkContext.defaultParallelism
    // kernel emits per-doc DISTINCT hashes, so counting rows per hash here
    // is document frequency — the maxTrainDf guard reads it directly
    val trainDf = gramRows(train, idCol, textCol, n)
      .groupBy("h").agg(count(lit(1)).as("tdf"))
    val trainGrams = (maxTrainDf match {
      case Some(m) => trainDf.filter(col("tdf") <= m)
      case None    => trainDf
    }).select("h")
    val testGrams = gramRows(test, idCol, textCol, n)
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
