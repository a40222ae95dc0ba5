package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Shared MemoryStream drive for the drained-replay oracles (q280/q281
  * — the q279 witness pattern applied to streaming surfaces): feed the
  * caller's rows as ONE micro-batch (the first batch's watermark is
  * −inf, so nothing can drop late), then each sentinel in its own
  * batch — the watermark a batch closes against is the PREVIOUS
  * batch's maximum, so the first far-future sentinel only arms it and
  * the second makes it the processed one — then block until the sink
  * drains and return the accumulated memory table. The caller filters
  * its sentinel key out and owns ordering. */
private[streaming] object DrainFeed {

  def run[T, R: Encoder](
      spark: SparkSession,
      fed: IndexedSeq[T],
      sentinels: Seq[T],
      build: Dataset[T] => Dataset[R],
      sinkPrefix: String)(implicit enc: Encoder[T]): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[T](spark)
    val sink = sinkPrefix + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = build(ms.toDS()).writeStream.outputMode("append")
      .format("memory").queryName(sink).start()
    try {
      if (fed.nonEmpty) { ms.addData(fed: _*); q.processAllAvailable() }
      sentinels.foreach { s => ms.addData(s); q.processAllAvailable() }
    } finally q.stop()
    // Materialize the drained frame (model-sized: one row per finalized
    // (key, window) emission — it already lives in driver memory inside
    // the memory sink) and DROP the sink view: without this every replay
    // leaks a UUID-named temp view holding its full result for the
    // session lifetime — catalog.clearCache() between bench queries does
    // not remove temp views, so a dev loop accumulates them.
    val drained = spark.table(sink)
    val rows = drained.collectAsList()
    val schema = drained.schema
    spark.catalog.dropTempView(sink)
    spark.createDataFrame(rows, schema)
  }
}
