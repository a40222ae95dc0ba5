package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Shared MemoryStream drive for the drained-replay oracles (q280/q281
  * — the q279 witness pattern applied to streaming surfaces): feed the
  * caller's rows PLUS the first (arming) sentinel as ONE micro-batch —
  * the first batch's watermark is −inf, so nothing can drop late, and
  * the arming sentinel only raises the NEXT batch's watermark (the
  * watermark a batch closes against is the PREVIOUS batch's maximum) —
  * then each remaining sentinel in its own batch: the second far-future
  * sentinel's batch closes against watermark = the arming sentinel's
  * timestamp, finalizing every real (key, slot) window at once (state
  * timeouts fire even for keys with no new rows). Blocks until the sink
  * drains and returns the accumulated memory table.
  *
  * r19 optimization round: this was previously a 3-batch drive (fed,
  * arm, apply). Folding the arming sentinel into the fed batch removes
  * one full micro-batch (plan + state-store open/commit on every state
  * partition + offset/commit log writes) with a BIT-IDENTICAL drained
  * frame: the per-key tick multiset per batch is unchanged for every
  * real key (the sentinel rides its own key), and the drained output of
  * both replay surfaces is a pure function of that multiset — emission
  * merely moves one batch earlier. Second lever: `distinctKeys` sizes
  * the streaming aggregation's state partitions to the DRIVEN key count
  * (+1 sentinel) instead of the session default — with K keys at most K
  * state partitions ever hold rows, and every extra partition pays
  * store-open/commit/delta-file I/O per batch for nothing. This is
  * data-derived (the caller counts keys in the fed rows), not a
  * local-mode constant: a production drive with thousands of keys keeps
  * the session's partitioning. The session conf is restored right after
  * `start()` — a streaming query clones the session state at start, so
  * the scoped setting cannot leak to the caller. */
private[streaming] object DrainFeed {

  def run[T, R: Encoder](
      spark: SparkSession,
      fed: IndexedSeq[T],
      sentinels: Seq[T],
      build: Dataset[T] => Dataset[R],
      sinkPrefix: String,
      distinctKeys: Int = Int.MaxValue)(implicit enc: Encoder[T]): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[T](spark)
    val sink = sinkPrefix + java.util.UUID.randomUUID().toString.replace("-", "")
    val confKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(confKey)
    val scopedParts =
      math.max(1, math.min(prevParts.toInt, math.max(distinctKeys, 1)))
    spark.conf.set(confKey, scopedParts.toString)
    val q =
      try build(ms.toDS()).writeStream.outputMode("append")
        .format("memory").queryName(sink).start()
      finally spark.conf.set(confKey, prevParts)
    try {
      // batch 1: fed rows + the arming sentinel (watermark −inf, nothing
      // closes, nothing drops); batches 2..: the applying sentinel(s),
      // each closing against the previous batch's maximum event time
      val (arm, rest) =
        if (fed.nonEmpty && sentinels.nonEmpty) (Seq(sentinels.head), sentinels.tail)
        else (Seq.empty[T], sentinels)
      if (fed.nonEmpty || arm.nonEmpty) {
        ms.addData(fed ++ arm: _*); q.processAllAvailable()
      }
      rest.foreach { s => ms.addData(s); q.processAllAvailable() }
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
