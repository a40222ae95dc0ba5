package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Sequence packing — the concat-and-split step between chunking and
  * tokenization: lay every chunk's tokens on one global tape (in a total
  * deterministic order) and cut the tape every `windowTokens` tokens.
  * Each chunk learns its global token offset, its pack (context window)
  * id, its position inside the pack, and whether it straddles a cut.
  *
  * The primitive underneath is a GLOBAL running sum, and the obvious
  * Spark spelling — `sum(w).over(Window.orderBy(...))` with no partition
  * key — collapses the whole dataset into ONE task (Spark warns and then
  * does exactly that), the textbook scale cliff. [[withGlobalOffset]]
  * instead uses the classic two-pass prefix shape:
  *
  *   1. range-repartition + sort within partitions on the order key
  *      (a real distributed sort — every partition holds a contiguous
  *      key range);
  *   2. one pass computing each partition's weight sum — numPartitions
  *      SCALARS to the driver (bounded, not data-sized);
  *   3. one pass adding each partition's exclusive prefix to a running
  *      local sum.
  *
  * The offsets depend only on the total order, not on where partition
  * boundaries happen to fall, so the result is deterministic even though
  * range partitioning samples its boundaries. This is one of the rare
  * genuinely per-partition-imperative operators (SURVEY §2.11's
  * "mapPartitions as a last resort" case): the running sum needs
  * row-order state no declarative expression provides at scale.
  */
object Packing {

  /** Add `outputCol` = sum of `weightCol` over all rows strictly before
    * this one in `orderCols` order (an exclusive prefix sum). `orderCols`
    * must be a total order (unique keys) for the offsets to be
    * well-defined; `weightCol` must be integral (int/long). */
  def withGlobalOffset(
      df: DataFrame,
      orderCols: Seq[String],
      weightCol: String,
      outputCol: String = "offset"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(par, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema
    val wIdx = schema.fieldIndex(weightCol)
    val getW: Row => Long = schema.fields(wIdx).dataType match {
      case LongType    => r => r.getLong(wIdx)
      case IntegerType => r => r.getInt(wIdx).toLong
      case other => throw new IllegalArgumentException(
        s"weight column '$weightCol' must be integral, got $other")
    }
    // ONE RDD instance traversed twice (partition sums, then the offset
    // pass): the range boundaries are baked into this single physical
    // plan's exchange, and the second traversal re-reads the exchange's
    // already-written shuffle files (redoing only the cheap in-partition
    // sort) — so no persist is needed for either correctness (boundaries
    // cannot re-sample between passes) or the scan (the corpus is not
    // re-read). Deliberately NOT persisted: an operator-internal persist
    // here would pin a sorted corpus copy with no release path (catalog
    // .clearCache() does not reach raw RDD persists), the exact storage
    // leak the dedup loops go out of their way to avoid.
    val rdd = sorted.rdd
    val partSums = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(r => s += getW(r)); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val prefix = partSums.scanLeft(0L)(_ + _) // exclusive; length = nParts+1
    val out = rdd.mapPartitionsWithIndex({ case (i, it) =>
      var run = prefix(i)
      it.map { r =>
        val o = run
        run += getW(r)
        Row.fromSeq(r.toSeq :+ o)
      }
    }, preservesPartitioning = true)
    spark.createDataFrame(out, schema.add(outputCol, LongType, nullable = false))
  }

  /** Per-GROUP exclusive prefix sum — [[withGlobalOffset]] generalized
    * to independent running totals per `groupCols` key, with the same
    * two-pass shape and the same reason: the window idiom
    * (`Window.partitionBy(group).orderBy(...)`) puts each group's ENTIRE
    * row set through one task — a 20-source corpus at 100 TB means 5 TB
    * sorts on single tasks. Here the range exchange spreads (group,
    * order) globally, so a big group spans MANY partitions; pass 1
    * collects one (partition, group) subtotal per span (groups are
    * contiguous under the range sort, so this frame is
    * ≈ partitions + groups rows — driver-safe), pass 2 seeds each
    * partition's per-group running totals from the collected exclusive
    * prefixes. `orderCols` must totally order rows WITHIN each group
    * (tie-break on a unique id) for offsets to be well-defined. */
  def withGroupedOffset(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      weightCol: String,
      outputCol: String = "offset"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val rangeCols = groupCols.map(col) ++ orderCols
    val sorted = df.repartitionByRange(par, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
    val schema = sorted.schema
    val wIdx = schema.fieldIndex(weightCol)
    val gIdx = groupCols.map(schema.fieldIndex)
    val getW: Row => Long = schema.fields(wIdx).dataType match {
      case LongType    => r => r.getLong(wIdx)
      case IntegerType => r => r.getInt(wIdx).toLong
      case other => throw new IllegalArgumentException(
        s"weight column '$weightCol' must be integral, got $other")
    }
    def gKey(r: Row): Seq[Any] = gIdx.map(r.get)
    // single RDD instance traversed twice — the not-persisted rationale
    // of withGlobalOffset applies verbatim (range boundaries baked into
    // one exchange; second pass re-reads its shuffle files)
    val rdd = sorted.rdd
    val partGroupSums = rdd.mapPartitionsWithIndex { case (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
      it.foreach { r =>
        val k = gKey(r)
        m.update(k, m.getOrElse(k, 0L) + getW(r))
      }
      m.toList.map { case (k, s) => (i, k, s) }.iterator
    }.collect()
    val offsets: Map[(Int, Seq[Any]), Long] =
      partGroupSums.groupBy(_._2).flatMap { case (k, arr) =>
        var run = 0L
        arr.sortBy(_._1).map { case (i, _, s) =>
          val entry = ((i, k), run); run += s; entry
        }
      }
    val out = rdd.mapPartitionsWithIndex({ case (i, it) =>
      val run = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
      it.map { r =>
        val k = gKey(r)
        val o = run.getOrElse(k, offsets.getOrElse((i, k), 0L))
        run.update(k, o + getW(r))
        Row.fromSeq(r.toSeq :+ o)
      }
    }, preservesPartitioning = true)
    spark.createDataFrame(out, schema.add(outputCol, LongType, nullable = false))
  }

  /** Concat-and-split packing over [[withGlobalOffset]]: adds
    *  - `offset`   — global token offset of the chunk's first token;
    *  - `pack_id`  — which `windowTokens`-sized context window that
    *    first token lands in (integer division, exact on int64);
    *  - `pack_pos` — position inside that window;
    *  - `crosses_pack` — true when the chunk's tokens straddle a cut
    *    (the caller splits or discards those per its padding policy —
    *    this operator reports the geometry, it does not edit text).
    */
  def packSequences(
      chunks: DataFrame,
      orderCols: Seq[String],
      weightCol: String,
      windowTokens: Long): DataFrame = {
    require(windowTokens >= 1L, s"windowTokens $windowTokens must be >= 1")
    // weightCol rides inside a SQL string for DIV (no Column operator for
    // integer division) — backtick-quote it, doubling embedded backticks,
    // so names that aren't bare identifiers ("n-chunk-tokens") resolve as
    // one column instead of parsing as arithmetic or throwing
    val w = "`" + weightCol.replace("`", "``") + "`"
    withGlobalOffset(chunks, orderCols, weightCol, "offset")
      .withColumn("pack_id", expr(s"offset DIV ${windowTokens}L"))
      .withColumn("pack_pos", pmod(col("offset"), lit(windowTokens)))
      .withColumn("crosses_pack",
        expr(s"(offset + $w - 1L) DIV ${windowTokens}L") > col("pack_id"))
  }

  /** Per-pack segment manifest — the artifact an attention-mask builder
    * consumes: for each pack, the ordered list of (in-pack position,
    * source id, token length) segments, rendered as a sorted string
    * (the cross-engine collection rule). Intra-document attention must
    * not cross segment boundaries in packed training; this is exactly
    * the boundary table that mask construction, provenance tracking,
    * and loss-masking per source need, derived from [[packSequences]]'
    * geometry with ONE pack-keyed aggregation (map-side combined;
    * per-pack state bounded by window/min-chunk segments). A chunk
    * straddling into the next pack is listed — and its tokens counted —
    * at the pack where it STARTS (`crosses_pack` marks it upstream).
    * Output: (pack_id, n_segs, pack_tokens, segments = "pos:id:len,…"
    * in position order). */
  def packBoundaries(
      packed: DataFrame,
      idCol: String,
      weightCol: String): DataFrame =
    packed.groupBy("pack_id")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(col(weightCol)).as("pack_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(
              col("pack_pos").as("p"),
              col(idCol).cast("string").as("d"),
              col(weightCol).cast("long").as("w")))),
            s => concat_ws(":", s.getField("p"), s.getField("d"), s.getField("w"))),
          ",").as("segments"))

  /** Padding-waste audit — the quantified case FOR [[packSequences]]:
    * per slice, the token cost of batching at `contextLen` under (a)
    * pad-per-document (each doc occupies ⌈nt/L⌉ padded sequences — the
    * naive loader) versus (b) concat-and-split packing (one tape per
    * slice, ⌈Σnt/L⌉ sequences). `pad_waste` is the fraction of paid
    * tokens that are padding; `pack_waste` is the same under packing
    * (≤ one partial final sequence per slice — asymptotically 0). The
    * number a context-length/packing decision is justified with.
    *
    * Output: (sliceCol, n_docs, total_toks, padded_cost, pad_waste,
    * packed_cost, pack_waste), waste fractions rounded (genuine
    * quotients), ordered by slice.
    *
    * Scale shape: a pure narrow map (token count + integer ceiling
    * arithmetic — `DIV`, never float ceil: exact at any magnitude and
    * engine-portable) into ONE slice aggregation. */
  def paddingWaste(
      df: DataFrame,
      contextLen: Long,
      sliceCol: String = "source",
      textCol: String = "text",
      roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.LongType
    require(contextLen >= 1L, s"contextLen $contextLen must be >= 1")
    val L = contextLen
    df.select(col(sliceCol).as("slice"),
        graft.functions.TextOps.tokenCount(col(textCol)).as("nt"))
      .select(col("slice"), col("nt"),
        (expr(s"(nt + ${L - 1}L) DIV ${L}L") * L).as("pad_cost"))
      .groupBy("slice")
      .agg(count(lit(1)).as("n_docs"),
        sum("nt").cast(LongType).as("total_toks"),
        sum("pad_cost").cast(LongType).as("padded_cost"))
      .withColumn("packed_cost",
        expr(s"((total_toks + ${L - 1}L) DIV ${L}L) * ${L}L"))
      .select(col("slice").as(sliceCol), col("n_docs"), col("total_toks"),
        col("padded_cost"),
        round((col("padded_cost") - col("total_toks")) * lit(1.0) / col("padded_cost"),
          roundTo).as("pad_waste"),
        col("packed_cost"),
        round((col("packed_cost") - col("total_toks")) * lit(1.0) / col("packed_cost"),
          roundTo).as("pack_waste"))
      .orderBy(sliceCol)
  }
}
