package graft.queries

import graft.SparkSpecBase

/** Physical-plan regression guards: the properties that make these plans
  * survive a 100× scale-up (SURVEY.md §4.2) are asserted, not assumed —
  * pushdown reaching the parquet scan, column pruning, broadcast only for
  * fixed-size dims, no broadcast of corpus-sized self-join sides, native
  * kernel in the ANN path. */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(name: String): String =
    Registry.all.find(_.name == name).get.builder(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q01: shipdate range predicate is pushed into the parquet scan") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      "filter must reach the scan")
  }

  test("q01: scan is column-pruned to the referenced columns") {
    val p = plan("q01_scan_filter_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"scan reads more than needed: $readSchema")
  }

  test("q03: fixed-size dims broadcast; no forced broadcast on SF-scaling tables") {
    val p = plan("q03_join_star_revenue")
    assert(p.contains("BroadcastHashJoin"), "dim joins should broadcast at this SF")
    // the plan text records join strategy hints only for forced sides; the
    // logical plan must not carry hints for customer/orders
    val logical = Registry.all.find(_.name == "q03_join_star_revenue").get
      .builder(spark, sfDir).queryExecution.optimizedPlan.toString
    assert(!logical.contains("UnresolvedHint"), "hints must resolve")
  }

  test("q35: corpus-sized self-join must not broadcast either side") {
    val p = plan("q35_neardup_jaccard_3gram")
    val joinLines = p.linesIterator.filter(_.contains("Join")).toSeq
    val pairJoin = joinLines.find(_.contains("ShuffledHashJoin"))
    assert(pairJoin.isDefined,
      s"shingle pair join must be a shuffled join, got: ${joinLines.mkString(" | ")}")
  }

  test("q115: prefix candidate join is shuffled; verify runs the sorted-merge kernel") {
    val p = plan("q115_neardup_prefix_filter")
    assert(p.contains("ShuffledHashJoin"),
      "prefix self-join must be a shuffled join (corpus-sized both sides)")
    assert(p.contains("sorted_long_intersect"),
      "verify must use the codegen'd sorted-merge kernel, not array_intersect")
    assert(!p.contains("array_intersect"),
      "boxed-hash array_intersect must not appear in the verify path")
  }

  test("q52: generator UDTF prunes the scan to the text column") {
    val p = plan("q52_udtf_shingle_explode")
    assert(p.contains("Generate"), "UDTF must plan through GenerateExec")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("struct<text:string>"),
      s"scan must read only text: $readSchema")
  }

  test("simHashPairs: band self-join is shuffled on both sides, never broadcast") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val p = graft.operators.Dedup.simHashPairs(docs)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      "band join must be a shuffled hash join")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
      "neither corpus-scale signature side may broadcast via the driver")
  }

  test("q37: pair generation is keyed on the LSH bucket, not the label alone") {
    val p = plan("q37_neardup_cosine_label")
    val pairJoin = p.linesIterator
      .find(l => l.contains("Join") && l.contains("ia") && l.contains("ib"))
    assert(pairJoin.isDefined, "candidate pair join not found in plan")
    assert(pairJoin.get.contains("bkey"),
      s"pair join key must include the hyperplane bucket: ${pairJoin.get}")
  }

  test("q36: ANN scoring uses the native float_dot kernel, probes broadcast") {
    val p = plan("q36_ann_cosine_topk")
    assert(p.contains("float_dot"), "native kernel must be in the plan")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "small probe side should broadcast, streaming the corpus once")
  }

  test("q36: ranking runs on the custom heap operator (partial + final), not a window sort") {
    val p = plan("q36_ann_cosine_topk")
    assert(p.linesIterator.count(_.contains("TopKPerKey")) === 2,
      "partial + final heap phases must replace the window rank")
    assert(!p.contains("Window"), "no window operator in the ANN ranking path")
  }

  test("q39/q48: SimHash signatures are a pure kernel map — no explode, no aggregation") {
    val p39 = plan("q39_text_simhash")
    assert(p39.contains("simhash64"), "native kernel must be in the q39 plan")
    assert(!p39.contains("Generate"), "no token explode in the signature path")
    assert(!p39.contains("HashAggregate"), "no vote aggregation in the signature path")
    val p48 = plan("q48_text_simhash_portable")
    assert(p48.contains("portable_simhash_bands"), "native kernel must be in the q48 plan")
    assert(!p48.contains("Generate") && !p48.contains("HashAggregate"),
      "portable signature path must be a pure map")
  }

  test("q38: MinHash signatures come from the kernel; pair join stays shuffled") {
    val p = plan("q38_dedup_minhash_lsh")
    assert(p.contains("minhash_sig"), "native kernel must be in the q38 plan")
    assert(p.linesIterator.exists(_.contains("ShuffledHashJoin")),
      "band self-join must be a shuffled join (corpus-sized sides)")
  }

  test("q50: IVF candidate generation is an equi-join on the quantizer cell") {
    val p = plan("q50_ann_ivf_full_probe")
    val cellJoin = p.linesIterator
      .find(l => l.contains("Join") && l.contains("pcell") && l.contains("cell"))
    assert(cellJoin.isDefined,
      s"probe-cell/corpus-cell equi-join not found in: $p")
    assert(p.linesIterator.count(_.contains("TopKPerKey")) === 2,
      "ranking must run on the heap operator (partial + final)")
  }

  test("q51: salted join carries the salt in the join keys") {
    val p = plan("q51_join_salted_skew")
    val saltJoin = p.linesIterator.find(l => l.contains("Join") && l.contains("__salt"))
    assert(saltJoin.isDefined, s"salt must be part of the join keys: $p")
  }

  test("q26: tumbling window is a single partial+final aggregation (one shuffle)") {
    val p = plan("q26_window_tumbling_1h")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    // one shuffle for the group-by, one singlePartition for the final sort
    assert(exchanges <= 3, s"unexpected shuffle count: $exchanges")
  }

  test("q68: quota capping runs on the heap operator, never a window sort") {
    val p = plan("q68_source_quota_topk")
    assert(p.linesIterator.count(_.contains("TopKPerKey")) === 2,
      "partial + final heap phases expected")
    val beforeFinalSort = p.linesIterator.dropWhile(!_.contains("TopKPerKey")).mkString("\n")
    assert(!beforeFinalSort.contains("WindowExec") && !beforeFinalSort.contains("Sort ["),
      s"no sort may feed the heap phases:\n$beforeFinalSort")
  }

  test("q70: the bloom probe prunes the train gram stream BELOW its exchange") {
    val p = plan("q70_decontaminate_bloom")
    val lines = p.linesIterator.toSeq
    val probeIdx = lines.indexWhere(_.contains("might_contain"))
    assert(probeIdx >= 0, s"bloom probe missing from the plan:\n$p")
    // the filter must sit on the scan side of every GRAM-keyed shuffle:
    // below the probe only the deliberate single-split fan-out repartition
    // (keyed on the doc id) may appear — an h-keyed exchange under the
    // probe would mean the full corpus vocabulary shipped before pruning
    val below = lines.drop(probeIdx + 1).takeWhile(!_.contains("FileScan"))
    assert(!below.exists(l => l.contains("Exchange") && l.contains("(h#")),
      s"bloom probe must run before any gram-hash shuffle:\n${below.mkString("\n")}")
    assert(p.contains("ShuffledHashJoin"), "gram join must stay shuffled")
  }

  test("q72: PQ scoring streams codes against broadcast probe tables; re-rank exact") {
    val p = plan("q72_ann_pq_adc_rerank")
    assert(p.contains("float_dot"),
      "exact re-rank must use the native dot kernel")
    assert(p.linesIterator.count(_.contains("TopKPerKey")) === 4,
      "candidate trim + final rank, each partial+final, on the heap operator")
  }

  test("shuffleShards: exactly ONE exchange (shard hash), no global range sort") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val p = graft.operators.Sampling.shuffleShards(docs, "doc_id", nShards = 8)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange")) === 1,
      s"one shard exchange expected:\n$p")
    assert(!p.contains("rangepartitioning"),
      "the export layout must never globally range-sort the corpus")
  }

  test("q82: the manifest barrier holds — layout reads the cache, not a re-inlined filter") {
    val p = plan("q82_curation_export_layout")
    assert(p.contains("InMemoryTableScan"),
      "final_keep must filter the MATERIALIZED manifest: pushing it below " +
        "q60's projections re-inlines the token pipeline ~30× " +
        "(Filter-below-Project substitution has no lambda CSE)")
    spark.catalog.clearCache()
  }

  test("q81: cross-corpus band join is shuffled on both sides, never broadcast") {
    val p = plan("q81_neardup_ingest_gate")
    val joins = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.exists(_.contains("ShuffledHashJoin")),
      s"band join must shuffle-hash: ${joins.mkString(" | ")}")
    assert(p.contains("minhash_sig"),
      "both sides must band through the fused portable signature kernel")
  }

  test("q86: snapshot delta joins digests, never broadcast (full outer ⇒ shuffled)") {
    val p = plan("q86_snapshot_delta")
    val joins = p.linesIterator.filter(_.contains("Join")).toSeq
    // Spark plans equi full-outer only as SMJ / shuffled-hash — both sides
    // are corpus-sized, so a broadcast here would be a planner regression
    assert(joins.exists(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")),
      s"delta join must be a shuffled join: ${joins.mkString(" | ")}")
    assert(!joins.exists(_.contains("Broadcast")),
      s"corpus-sized snapshot sides must not broadcast: ${joins.mkString(" | ")}")
  }

  test("q87: containment rides the shared pair core — shuffled self-join, no broadcast") {
    val p = plan("q87_neardup_containment")
    val joinLines = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.exists(_.contains("ShuffledHashJoin")),
      s"shingle pair join must be a shuffled join: ${joinLines.mkString(" | ")}")
  }

  test("q88: centrality rounds reuse the persisted edge frame; no cartesian anywhere") {
    val p = plan("q88_knn_centrality")
    assert(p.contains("InMemoryTableScan"),
      "edge+outdeg frame must be persisted and reread per round, not recomputed")
    assert(!p.contains("CartesianProduct"),
      "PageRank must never plan an all-pairs product")
  }

  test("q11: no unbounded percentile buffer, no Expand from mixed distinct aggs") {
    val p = plan("q11_agg_distinct_approx_percentile")
    // Exact quantiles must ride the sort-based two-pass (distinct counts +
    // running-count window), never the O(rows/group)-state `percentile`
    // TypedImperativeAggregate. `percentile_approx(` (bounded sketch state,
    // ~accuracy entries/group) is the one permitted object aggregate.
    assert(!p.contains("percentile("),
      "exact percentile aggregate (unbounded per-group state) must not appear")
    assert(!p.contains("Expand"),
      "mixed distinct aggregates must be split into separate aggregations")
    // the split distinct aggs must still broadcast only group-count-sized
    // frames into the final assembly joins
    assert(!p.contains("CartesianProduct"), "assembly joins must be keyed")
  }
}
