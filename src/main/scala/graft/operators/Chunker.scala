package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Token-window document chunking — the last hop of a pretraining
  * pipeline before tokenization: long documents become overlapping
  * fixed-size windows (context-length packing prep), short documents
  * pass through as a single chunk.
  *
  * Windowing contract for `size` tokens / `stride` step (stride ≤ size ⇒
  * overlap = size − stride):
  *  - chunk i covers tokens [i·stride, i·stride + size);
  *  - a document of n ≤ size tokens yields exactly 1 chunk;
  *  - otherwise ⌈(n − size) / stride⌉ + 1 chunks — the last window is the
  *    FIRST one reaching the end of the document, so every token appears
  *    in ≥ 1 chunk and no fully-redundant trailing window is emitted;
  *    the final chunk may be shorter than `size` (it is never padded).
  *
  * Scale shape: pure narrow — one staged token split, one `transform`
  * over the chunk-start sequence, one `posexplode`. No shuffle, no state;
  * output order inside a partition follows input order, and the fan-out
  * factor is n/stride (bounded by the document length cap upstream
  * pipelines enforce). The explicit repartition pins parallelism for the
  * few-split compact-table case, like every other fan-out in the engine.
  */
object Chunker {

  /** Explode documents into (idCol, chunk_idx, n_chunk_tokens,
    * chunk_text) windows over whitespace tokens. */
  def tokenChunks(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      size: Int = 512,
      stride: Int = 384): DataFrame = {
    require(size >= 1, s"chunk size $size must be >= 1")
    require(stride >= 1 && stride <= size,
      s"stride $stride must be in [1, size=$size] (stride > size would drop tokens)")
    val par = df.sparkSession.sparkContext.defaultParallelism
    val chunks = transform(
      sequence(lit(0), col("nc") - 1),
      i => struct(
        least(lit(size), col("n") - i * stride).cast(LongType).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("toks"), i * stride + lit(1), lit(size))).as("chunk_text")))
    df.select(col(idCol).as("id"), split(col(textCol), "\\s+").as("toks"))
      .repartition(par, col("id"))
      .select(col("id"), col("toks"), size_(col("toks")).as("n"))
      .select(col("id"), col("toks"), col("n"),
        when(col("n") <= size, lit(1L))
          .otherwise(ceil((col("n") - size).cast("double") / stride) + 1)
          .cast(LongType).as("nc"))
      // posexplode_OUTER, not posexplode: a non-outer Generate triggers
      // InferFiltersFromGenerate, whose inferred size(...)>0 filter
      // re-inlines the whole chunk transform (slices, concat, and the
      // token split re-run per element) into the scan filter — the
      // O(tokens²) re-evaluation trap. The rule skips outer generates;
      // `chunks` is never empty (nc ≥ 1), so outer adds rows only for a
      // null text, which the isNotNull on the output position drops.
      .select(col("id"), posexplode_outer(chunks))
      .where(col("pos").isNotNull)
      .select(
        col("id").as(idCol),
        col("pos").cast(LongType).as("chunk_idx"),
        col("col.n_chunk_tokens"),
        col("col.chunk_text"))
  }

  // `size` the function vs `size` the parameter — alias the former
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
