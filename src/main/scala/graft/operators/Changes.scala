package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Change-point suppression — ReactiveX `distinctUntilChanged` for tables
  * and streams (the reference claims the Flux vocabulary via
  * `sinks.asFlux()`, README.md:45,107). Unlike `distinct`, only
  * CONSECUTIVE repeats are dropped: a value may recur later and is kept
  * again. Also a real pipeline primitive — collapsing status/state event
  * streams to their transitions before sessionization or storage.
  *
  * A distributed table has no arrival order, so "consecutive" is defined
  * by an explicit per-key total order, exactly like [[Zip.seqByOrder]]
  * derives zip's pairing index from a sort order.
  */
object Changes {

  /** Keep the first row of every run of equal `valueCols` within each
    * `keyCols` group ordered by `orderCols`; drop the rest of the run.
    *
    * `orderCols` must totally order rows within a key (include a unique
    * tiebreaker) — with ties, which row of a run survives would depend
    * on partitioning. Comparison is null-safe (`<=>`): a run of NULLs is
    * one run, and NULL→value / value→NULL are both transitions.
    *
    * Scale shape: the canonical window plan — ONE hash exchange on the
    * key + per-partition sort; `lag(1)` is O(1) state per row, no
    * buffering of the run. Survives 100× because nothing here depends on
    * group cardinality (no collect_list, no self-join). */
  def distinctUntilChanged(
      df: DataFrame,
      keyCols: Seq[Column],
      orderCols: Seq[Column],
      valueCols: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "distinctUntilChanged needs at least one key column")
    require(orderCols.nonEmpty, "distinctUntilChanged needs at least one order column")
    require(valueCols.nonEmpty, "distinctUntilChanged needs at least one value column")
    val prevCol = "_duc_prev"
    require(!df.columns.contains(prevCol), s"column '$prevCol' already exists")
    val cur = struct(valueCols: _*)
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    df.withColumn(prevCol, lag(cur, 1).over(w))
      // null-safe: first row has prev = NULL struct, <=> is false ⇒ kept
      .filter(!(col(prevCol) <=> cur))
      .drop(prevCol)
  }

  /** Recrawl/snapshot delta — classify every id across two corpus
    * snapshots as `added` / `removed` / `changed` / `unchanged`. The
    * incremental-ingest planner's first step: a recrawl only needs to
    * re-process the `added`+`changed` slice (which then flows into
    * [[Dedup.newContentOnly]]'s admission gates), and `removed` drives
    * tombstoning in the landed corpus.
    *
    * `contentCols` define document identity-of-content; each side is
    * reduced MAP-SIDE to `(id, sha256 digest)` before the join, so the
    * full-outer exchange moves ~40 bytes/row — never the text. At 100 TB
    * that is two scans plus one id-keyed shuffle of digests; neither side
    * is broadcast (both are corpus-sized). `concat_ws("\u0000", …)` is the
    * cross-column currency: NULL columns are skipped (a NULL and an empty
    * string hash alike — acceptable for content columns, document if your
    * schema distinguishes them).
    */
  def snapshotDelta(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String = "doc_id",
      contentCols: Seq[String] = Seq("text")): DataFrame = {
    require(contentCols.nonEmpty, "snapshotDelta needs at least one content column")
    def digest(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol),
        sha2(concat_ws("\u0000", contentCols.map(col): _*), 256).as(out))
    digest(oldSnap, "old_sha")
      .join(digest(newSnap, "new_sha"), Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("old_sha").isNull, "added")
          .when(col("new_sha").isNull, "removed")
          .when(col("old_sha") =!= col("new_sha"), "changed")
          .otherwise("unchanged"))
  }

  /** Type-2 slowly-changing-dimension history — turn a change log of
    * `(key, order, attributes)` observations into versioned dimension
    * rows with `[effective_from, effective_to)` validity intervals and an
    * `is_current` flag. The warehouse-side complement of
    * [[snapshotDelta]]: delta classifies two snapshots, SCD2 accumulates
    * the WHOLE observation history into the queryable "what did this row
    * look like at time t" shape that joins back to facts with a range
    * predicate (the [[graft.queries.JoinQueries]] J5 idiom).
    *
    * Consecutive observations with unchanged `valueCols` collapse into
    * one interval (reusing [[distinctUntilChanged]]'s run semantics —
    * null-safe, so NULL→value and value→NULL both open a new version);
    * `effective_to` is the NEXT version's `effective_from` (half-open
    * intervals — no gap/overlap by construction), NULL on the current
    * version. `version` is a 1-based per-key counter.
    *
    * `orderCols` must totally order observations within a key (include a
    * unique tiebreaker — same contract as [[distinctUntilChanged]]);
    * `effectiveFrom` is the business-time column stamped onto the
    * interval bounds (usually the leading order column — kept separate
    * so a `(ts, event_id)` order can still emit plain-`ts` intervals;
    * with tied `ts` the earlier-by-tiebreaker version gets a zero-length
    * interval, the standard SCD2 convention).
    *
    * Scale shape: TWO window passes over the SAME (key × order)
    * partitioning — Catalyst plans one hash exchange + one sort and
    * chains both windows over it (asserted in ChangesSpec); `lag`/`lead`
    * are O(1) state per row. Nothing depends on per-key history length,
    * so 100× data means 100× rows through the same two-operator
    * pipeline, no driver state, no buffering. */
  def scd2History(
      df: DataFrame,
      keyCols: Seq[Column],
      orderCols: Seq[Column],
      effectiveFrom: Column,
      valueCols: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "scd2History needs at least one key column")
    require(orderCols.nonEmpty, "scd2History needs at least one order column")
    require(valueCols.nonEmpty, "scd2History needs at least one value column")
    Seq("effective_from", "effective_to", "version", "is_current").foreach(c =>
      require(!df.columns.contains(c), s"column '$c' already exists"))
    val opened = distinctUntilChanged(df, keyCols, orderCols, valueCols)
      .withColumn("effective_from", effectiveFrom)
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    opened
      .withColumn("effective_to", lead(col("effective_from"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Point-in-time lookup against a [[scd2History]] frame: the dimension
    * row version valid at `asOf` for each key — `effective_from <= asOf <
    * effective_to` (current versions have NULL `effective_to` = open
    * interval). A plain filter, not a join: at 100 TB the history scan
    * prunes on the two interval columns (parquet min/max page skipping)
    * before anything touches attributes. */
  def scd2AsOf(history: DataFrame, asOf: Column): DataFrame =
    history.filter(col("effective_from") <= asOf &&
      (col("effective_to").isNull || col("effective_to") > asOf))

  /** Point-in-time FACT enrichment against a [[scd2History]] frame — the
    * per-row complement of [[scd2AsOf]]'s constant-instant filter: each
    * fact joins the dimension version valid AT ITS OWN timestamp
    * (`effective_from <= fact.ts < effective_to`, open current
    * interval). The half-open convention means a fact at a transition
    * instant sees the NEW version, and the no-gap/no-overlap chaining
    * [[scd2History]] guarantees makes the match unique — at most one
    * version per fact, exactly one once the fact is at or after the
    * key's first version (spec-asserted); earlier facts keep their row
    * with NULL dimension columns (left join — facts are never dropped).
    *
    * Scale shape: the equi key carries the join (one hash exchange per
    * side, the J5 range idiom — the interval predicate evaluates inside
    * the per-key join); dimension histories are versions-per-key-sized,
    * facts stream through. The history's non-key columns must not
    * collide with fact columns (fail-fast checked). */
  def scd2Enrich(
      facts: DataFrame,
      history: DataFrame,
      keyCols: Seq[String],
      factTsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2Enrich needs at least one key column")
    val dimCols = history.columns.filterNot(keyCols.contains)
    dimCols.foreach(c => require(!facts.columns.contains(c),
      s"fact column '$c' collides with a history column — rename one side"))
    val f = facts.alias("f")
    val h = history.alias("h")
    val keyCond = keyCols.map(k => col(s"f.$k") === col(s"h.$k")).reduce(_ && _)
    val ts = col(s"f.$factTsCol")
    val cond = keyCond && col("h.effective_from") <= ts &&
      (col("h.effective_to").isNull || col("h.effective_to") > ts)
    f.join(h, cond, "left")
      .select(col("f.*") +: dimCols.map(c => col(s"h.$c")): _*)
  }

  /** Streaming `distinctUntilChanged`: per-key last-emitted value carried
    * across micro-batches in keyed state, so a run spanning batch
    * boundaries is still one run. Rows inside a batch are ordered by
    * `order` before comparison; ACROSS batches the contract is the
    * reference's processing-time one — batches arrive in stream order
    * (same as `WindowPublisher`'s arrival-ordered windows). For full
    * event-time ordering with late data, sort + dedup in batch after
    * ingestion instead.
    *
    * Scale shape: `flatMapGroupsWithState` — one hash exchange on the
    * key per micro-batch, state is ONE value per key (not a buffer), so
    * state size is bounded by key cardinality, not stream length. */
  def distinctUntilChangedStream[R, K: Encoder, V: Encoder](
      ds: Dataset[R])(
      key: R => K,
      order: R => Long,
      value: R => V)(implicit rEnc: Encoder[R]): Dataset[R] =
    ds.groupByKey(key)
      .flatMapGroupsWithState[V, R](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[R], state: GroupState[V]) =>
          val sorted = rows.toSeq.sortBy(order)
          val out = Seq.newBuilder[R]
          var last = state.getOption
          sorted.foreach { r =>
            val v = value(r)
            if (!last.contains(v)) { out += r; last = Some(v) }
          }
          last.foreach(state.update)
          out.result().iterator
      }

  /** Incremental JOIN-view maintenance (counting IVM — the delta-rule
    * algebra behind every materialized-view engine): given base
    * snapshots A, B and signed deltas ΔA, ΔB (a multiplicity column,
    * +1 insert / −1 retract, arbitrary magnitudes compose), the delta
    * of the inner equi-join view is EXACTLY
    *   Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
    * with multiplicities multiplying — so a 100 TB view refreshes by
    * joining the DELTAS (tiny) against the bases, never re-joining the
    * bases against each other. That base×base join never appearing is
    * the whole point; the output is the signed row stream a view sink
    * folds in (rows with equal payload may appear with both signs —
    * summing `m` per distinct payload is the sink's fold, deliberately
    * not forced here).
    *
    * Requirements: `keys` name the equi-join columns; the two payloads
    * are otherwise column-disjoint (standard join hygiene); base rows
    * carry implicit multiplicity 1 (duplicates allowed — they count).
    *
    * Scale shape: three equi-joins all keyed on `keys` — the two
    * delta×base joins broadcast their delta side when small (AQE), and
    * the delta×delta join is tiny×tiny. Property-tested:
    * view(A+ΔA, B+ΔB) ≡ view(A,B) ⊎ delta, multiset equality with
    * retractions (ChangesIvmSpec). */
  def joinViewDelta(
      aBase: DataFrame,
      aDelta: DataFrame,
      bBase: DataFrame,
      bDelta: DataFrame,
      keys: Seq[String],
      mCol: String = "m"): DataFrame = {
    require(keys.nonEmpty, "joinViewDelta: at least one join key")
    require(aDelta.columns.contains(mCol) && bDelta.columns.contains(mCol),
      s"joinViewDelta: deltas must carry the multiplicity column '$mCol'")
    val aB = aBase.withColumn("__ma", lit(1L))
    val aD = aDelta.withColumn("__ma", col(mCol).cast("long")).drop(mCol)
    val bB = bBase.withColumn("__mb", lit(1L))
    val bD = bDelta.withColumn("__mb", col(mCol).cast("long")).drop(mCol)
    aD.join(bB, keys)
      .unionByName(aB.join(bD, keys))
      .unionByName(aD.join(bD, keys))
      .withColumn(mCol, col("__ma") * col("__mb"))
      .drop("__ma", "__mb")
  }
}
