package graft.queries

import graft.SparkSpecBase

/** Registry-wide physical-plan lint — the standing guard against
  * scale-cliff join shapes sneaking into ANY registered query. Every
  * query must plan successfully (a registry-wide smoke at plan level),
  * contain no CartesianProduct anywhere, and use a
  * BroadcastNestedLoopJoin only where one is the deliberate, documented
  * choice:
  *
  *  - q08: the theta (non-equi) region×nation join — 5×25 rows by
  *    contract, BNLJ over a broadcast 5-row side IS the right plan;
  *  - q54/q61/q66/q67: `crossJoin` attaching a 1-row corpus-stats frame
  *    (total / N+avgdl) to every row — a broadcast of exactly one row;
  *  - q36/q50: the ANN brute-force baseline — broadcast PROBES × the
  *    streamed corpus; probes are a small query batch by the operator's
  *    contract (Similarity's documented broadcast-probe path), and the
  *    corpus side streams once, never collects.
  *
  * Growing this allowlist is a reviewable act: a new entry means a new
  * query deliberately chose a nested-loop join and must justify its
  * bounded build side the way these four do. */
class PlanLintSpec extends SparkSpecBase {

  private val bnljAllowed = Set(
    "q08_join_theta_region_nation", "q54_tfidf_keywords",
    "q61_quality_unigram_surprisal", "q66_retrieval_bm25",
    "q67_retrieval_bm25_indexed", "q75_retrieval_bm25_batch",
    // q73: the 1-row LM-constants frame (corpus/target totals + vocab
    // size) attached to the vocabulary frame — same class as q61's total
    "q73_dsir_importance",
    "q36_ann_cosine_topk", "q50_ann_ivf_full_probe",
    // q170: bitext margin mining's two k-NN calls are q36's documented
    // broadcast-probe brute force (fixture/eval geometry; production
    // mining swaps in topKIvf per the operator doc) — the margin /
    // mutual-best layers are equi-joins and heap top-1
    "q170_bitext_margin_mining",
    // q72: PQ/ADC — the per-probe distance-table frame (one small row
    // per probe) broadcast against the streamed corpus code list, plus
    // the codebook seed/rerank joins; same bounded-build-side class as
    // the q36/q50 broadcast-probe paths
    "q72_ann_pq_adc_rerank",
    // q77: kNN graph — the nCentroids-row quantizer frame broadcast
    // against the streamed corpus for cell assignment (model state, like
    // q50/q72's centroid joins); the corpus×corpus CANDIDATE join is
    // shuffle-hash, asserted in SimilaritySpec
    "q77_knn_graph_ivf",
    // q83: hybrid fusion composes q66's BM25 (1-row corpus-stats
    // crossJoin) and q36's broadcast-probe brute-force baseline — both
    // BNLJs documented above; the fusion itself is a narrow union + agg
    "q83_retrieval_hybrid_rrf",
    // q84: the semantic ingest gate rides topKIvf — the nCentroids-row
    // quantizer broadcast for cell assignment (q50/q77's class); the
    // candidate join is the cell equi-join
    "q84_semantic_ingest_gate",
    // q88: centrality runs ON the q77 kNN graph, so its plan contains
    // q77's quantizer-broadcast BNLJ verbatim; pageRank's own joins are
    // shuffled/broadcast-hash (asserted in PlanShapeSpec)
    "q88_knn_centrality",
    // q227: calibrationCurve's ECE scalar — a 1-row aggregate frame
    // crossJoin-broadcast onto the ≤bins-row curve (q61/q73/q91's
    // 1-row stat-attach class)
    "q227_calibration_ece",
    // q228: the 1-row exact-F2 witness crossJoin-broadcast onto the
    // 1-row AMS estimate — both sides single-row by construction
    "q228_ams_f2_sketch",
    // q91: the 1-row corpus-total frame crossJoined onto the vocabulary
    // frame — q61's documented one-row-broadcast class
    "q91_source_distribution_drift",
    // q243: the 1-row bigram-type total (the KN continuation-unigram
    // denominator) crossJoined onto the trigram-type LM frame — q61's
    // documented one-row-broadcast class
    "q243_kn_trigram_surprisal",
    // q244: the bootstrap's final single-row assembly — four 1-row
    // frames (base stats, replicate moments, lo/hi order statistics)
    // crossJoin-broadcast together; everything is ≤1 row by construction
    "q244_poisson_bootstrap_ci",
    // q118: the two 1-row totals frames (nt, np) crossJoined onto the
    // minCount-trimmed collocation frame — q61's documented
    // one-row-broadcast class
    "q118_pmi_collocations",
    // q127: the 1-row stage-1 count crossJoined onto the 3-row funnel
    // union for rates — q61's documented one-row-broadcast class
    "q127_event_funnel",
    // q135: the 1-row integer-moments stats frame crossJoined onto the
    // buckets frame for z-scoring — q61's documented one-row class
    "q135_rate_anomalies",
    // q93: same class — the 1-row reference-LM stats frame (nt, vsz)
    "q93_drift_against_reference",
    // q96: the 1-row vocabulary-size frame crossJoined onto the bigram
    // occurrence stream — q61's documented one-row-broadcast class
    "q96_quality_bigram_surprisal",
    // q99: range(dim)×range(outDim) BUILDING the sign matrix — a
    // dim·outDim model-state frame (64×16 here), both sides literal
    // ranges; the corpus itself joins the result by equi-key
    "q99_random_projection",
    // q102/q103: the 1-row share-normalization frame (sum of strata pow
    // weights) crossJoined onto the strata-sized plan — q61's documented
    // one-row-broadcast class; q103 inherits q102's plan subtree
    "q102_mixture_epoch_plan",
    "q103_materialize_epochs",
    // q110 composes q102's plan (same 1-row normalization crossJoin)
    // into materialize + shard — the downstream joins are equi/broadcast
    "q110_training_prep_e2e",
    // q111: the recall harness's EXACT side is q36's broadcast-probe
    // brute force over the full (eval-sample-sized) probe set — an eval
    // tool run on samples by contract, never a production corpus scan
    "q111_ann_recall_eval",
    // q112 rides q75's batched-BM25 machinery (1-row corpus-stats
    // crossJoin); the metrics joins themselves are equi
    "q112_retrieval_ranking_metrics",
    // q149: SemDeDup's corpus×centroid scoring — the broadcast side is
    // the MODEL-sized centroid frame (nCentroids rows, the kMeans/
    // topKIvf assignment shape), collapsed map-side to one row per
    // vector before any exchange; the within-cell pair join is equi
    "q149_semantic_dedup",
    // q233/q234: the trained-quantizer pipeline's BNLJ sites are all
    // MODEL-sized broadcasts — the Lloyd E-step (sample × k-centroid
    // frame), centroid→coarse mapping (k × √k), and vector→coarse
    // routing (corpus × √k anchors, collapsed map-side to one row per
    // vector); the fine ranking is a grp-keyed broadcast-HASH join and
    // the candidate join is cell-keyed shuffle-hash — never all-pairs
    "q233_knn_graph_trained_quantizer",
    "q234_semantic_dedup_trained",
    // q235: the 1-row AP/total frame broadcast-crossJoined onto the
    // model-sized curve rows — q227's ECE-attach class
    "q235_pr_curve_ap",
    // q236: the pair census is a θ-join (a.x < b.x) over the JOINT
    // CELLS frame — cells² is bounded by the caller's integer
    // quantization at ANY corpus size (the documented distinct-cells
    // contract), plus two 1-row tie-census attaches
    "q236_kendall_tau",
    // q238: the isotonic minimax lattice is a θ-join (si ≤ sj) over the
    // distinct-score CELLS frame — cells² bounded by the caller's
    // quantization at any corpus size (the q236 contract)
    "q238_isotonic_calibration",
    // q241: IVF-PQ — the q233 trainer/coarse-router broadcasts plus
    // q72's per-probe ADC-table and codebook broadcasts (all
    // model-sized); the candidate join itself is cell-keyed shuffle-hash
    "q241_ivf_pq_ann",
    // q251/q252: both ride the q233 trainer (same Lloyd E-step / routing
    // broadcasts) plus topKIvf's probe×centroid flat ranking — the
    // broadcast side is the 16-row trained-centroid frame; every
    // corpus-sized join downstream (candidates, margin attach) is equi
    "q251_two_level_recall_trade",
    "q252_bitext_margin_ivf",
    // q253: DeLong's two 1-row moment frames (positive-side, negative-
    // side) crossJoined for the final projection — q61's one-row class
    "q253_delong_auc_compare",
    // q254: the 1-row τ frame broadcast onto the held-out counting pass
    // plus the 1-row stats assembly crossJoins — q61's one-row class
    "q254_conformal_gate_threshold",
    // q255: the neighbor frame is q36's broadcast-probe brute force over
    // the mod-10 probe SAMPLE (the q111 eval-batch contract; production
    // callers pass topKIvf/topKIvfPq frames and plan no BNLJ)
    "q255_hard_negative_mining",
    // q256: residual IVF-PQ — the q241 trainer/coarse-router/ADC
    // broadcasts plus the residual-derivation centroid broadcasts (all
    // model-sized); the candidate join is cell-keyed shuffle-hash
    "q256_ivf_pq_residual_ann",
    // q257: the 1-row totals frame broadcast onto the category-bounded
    // cells + the 1-row final assembly — q61's one-row class
    "q257_chi_squared_drift",
    // q261: the same chiSquared cells shape — the 1-row totals frame
    // broadcast onto the category-bounded cells, then the 1-row global
    // (tsum) frame broadcast back for the per-category shares — q61's
    // one-row class, twice
    "q261_chi_squared_residuals",
    // q262: MI — the 1-row (n, n_cells) totals frame broadcast onto the
    // category-bounded joint cells and both marginal frames, plus the
    // 1-row final assembly of the four aggregates — q61's one-row class
    "q262_mutual_information",
    // q263: JSD — the 1-row (n1, n2) totals broadcast onto the
    // category-bounded cells — q61's one-row class
    "q263_jensen_shannon_drift",
    // q266: permutation test — the 1-row observed-delta frame broadcast
    // onto the ≤B replicate frame, then the 1-row tail census onto the
    // 1-row base — q61's one-row class; the corpus-touching stage is the
    // bootstrap's map-side-collapsing fan-out, no BNLJ there
    "q266_permutation_test",
    // q267: SQ8 — the 1-row trained-scale frame broadcast onto both
    // code-staging frames (model state, the q241 trainer class), plus
    // q36's documented broadcast-probe candidate stage over CODE arrays.
    // SQ8's REGISTERED contract is the linear code scan (4× cheaper
    // bytes than float brute force — the honest baseline tier of the
    // compression ladder); the ROUTED path at scale is IVF-PQ
    // (q241/q256), which exists and is measured — no unshipped promise
    "q267_sq8_ann_topk",
    // q276: bootstrap uplift CI — the ≤B replicate frame with the 1-row
    // moments/lo/hi crossJoins (the q244 bootstrap assembly, verbatim)
    "q276_bootstrap_uplift_ci",
    // q274: mSPRT — the 1-row final frame left-joined with the 1-row
    // (or empty) decision frame and the day-cells at-decision row —
    // q61's one-row class
    "q274_msprt_always_valid",
    // q275: RMST — the 1-row max-follow-up guard frame (the r17 advisor
    // fix: rmst NULL when tau exceeds observed follow-up) broadcast
    // onto the 1-row step-area aggregate — q61's one-row class
    "q275_rmst",
    // q277/q278: fixed-budget production geometry — the nCentroids-row
    // TRAINED quantizer frame broadcast against both staging scans for
    // routing (the q50/q77/q252 IVF class); the candidate join itself
    // is cell-keyed equi — no BNLJ there
    "q277_recall_fixed_budget",
    "q278_hard_negative_fixed_budget",
    // q273: routed SQ8 — the nCentroids-row quantizer frame broadcast
    // against both staging scans for routing (the q50/q77 IVF class)
    // plus the 1-row trained-scale broadcast; the CANDIDATE join itself
    // is cell-keyed equi — no BNLJ there
    "q273_sq8_ivf_ann",
    // q268: the 1-row normalizer (n_total, z) broadcast onto the
    // source-bounded cells — q61's one-row class
    "q268_temperature_mix_weights",
    // q269: Hodges-Lehmann — the 1-row rank-targets frame broadcast onto
    // the quantization-bounded difference cells, then the 1-row picks
    // onto the 1-row counts — q61's one-row class; the pair frame is
    // cellsT×cellsC by the documented kendallTau quantization contract
    "q269_hodges_lehmann_shift",
    // q157: the 1-row join-size estimate crossJoined onto the 1-row
    // exact count for the one-sided flag — q61's one-row class
    "q157_cms_join_size",
    // q158: per-layout 1-row health frame crossJoined onto the 1-row
    // compaction-plan rollup — q61's one-row class, twice (union). The
    // interval-overlap count itself is the O(n log n) event sweep
    // (Layout.clusteringHealth) — the round-11 O(n²) theta self-join is
    // gone; the only BNLJs left here are the 1-row attaches
    "q158_layout_health_compaction",
    // q162: funnelCounts' 1-row top-of-funnel count crossJoined onto the
    // stages-sized count union, once per arm — q127's documented class
    "q162_funnel_ab_significance",
    // q167: the 1-row corpus-total frame crossJoined onto the
    // class-size histogram for row shares — q61's one-row class
    "q167_k_anonymity_profile",
    // q169: the 1-row doc-count frame crossJoined onto the chunk-hash
    // aggregate for the relative share threshold — q61's one-row class
    "q169_cdc_duplicate_chunks",
    // q176: Neyman allocation's 1-row total-weight frame crossJoined
    // onto the strata-sized weights frame — q61's one-row class
    "q176_neyman_allocation",
    // q178: the representative-query frame (3 literal rows) broadcast
    // against the model-sized manifest — the documented manifest×query
    // product (Layout.pruningEstimate), bounded by module contract
    "q178_zonemap_pruning_estimate",
    // q182: salientTerms' 1-row corpus-count frame crossJoined onto the
    // (doc, term) tf frame for the idf — q61's one-row class
    "q182_tfidf_salient_terms",
    // q183: benfordAudit's digit-domain left join (9 literal rows) and
    // 1-row N attach — both bounded model frames, q61's one-row class
    "q183_benford_first_digit",
    // q185: concentration's two 1-row stat attaches (totals onto the
    // groups frame, then the top-decile row back) — q61's one-row class
    "q185_source_concentration_gini",
    // q188: jsonKeyLifecycle's 1-row corpus day-span frame crossJoined
    // onto the schema-sized key ledger — q61's one-row class
    "q188_json_schema_drift",
    // q189: AP rides q75's batched-BM25 machinery (the 1-row
    // corpus-stats crossJoin) — q112's documented class
    "q189_retrieval_average_precision",
    // q195: associationRules' 1-row session-count frame crossJoined
    // onto the vocabulary-sized pair frame — q61's one-row class
    "q195_session_association_rules",
    // q196: cohensKappa's 1-row marginal-product frame crossJoined onto
    // the 1-row agreement frame — q61's one-row class
    "q196_langid_cohens_kappa",
    // q198: referentialIntegrity's 1-row orphan frame crossJoined onto
    // the 1-row child-stats frame, once per relation — q61's class
    "q198_referential_integrity",
    // q199: trendingTerms' 1-row calendar frame (day count + max day)
    // crossJoined onto the (day, term) counts — q61's one-row class
    "q199_trending_terms",
    // q208: chiSquaredTerms' 1-row corpus-doc-count frame (n_total)
    // crossJoined onto the (slice, term) presence counts
    "q208_chi2_term_source",
    // q212: triangleStats' three 1-row census frames (edge count,
    // triangle count) crossJoined into the single summary row
    "q212_neardup_graph_triangles",
    // q213: kaplanMeier's 1-row corpus-frontier (max day) broadcast onto
    // the users-sized lifetime frame
    "q213_kaplan_meier_retention",
    // q200: the scorecard's 1-row token-total frame crossJoined onto
    // the sources-sized aggregate — q61's one-row class
    "q200_source_scorecard",
    // q221: CUPED's 1-row pooled-theta frame (Experiment.scala) crossJoined
    // onto the variant-sized readout — q61's one-row-broadcast class
    "q221_cuped_experiment_readout")

  /** Queries allowed to contain a GLOBAL window (Window.orderBy with no
    * partitionBy — a single-task sort at execution). Correct ONLY while
    * the window's input is model-/types-sized, never corpus-sized; a
    * corpus frame reaching one of these is a scale cliff (one task sorts
    * everything). Each entry names its bounded input. */
  private val globalWindowAllowed = Set.empty[String]
  // (q83's lexical rank — the last allowlisted site — now keys its
  // 10-row window on a literal partition, so the registry plans ZERO
  // global windows and any future "No Partition Defined" warning in a
  // bench log is a real regression.)
  // The OTHER deliberate no-partition windows (PQ codebook numbering at
  // Similarity.buildCodebook, q112's qrel windows, q117/q119 vocabulary
  // ranks) execute EAGERLY inside builders against model-/types-sized
  // frames and never appear in a registered query's returned plan — the
  // lint below still guards the real hazard: a corpus-sized frame
  // flowing into a global window of the PLAN a user executes.

  test("every registered query plans; no cartesian; BNLJ + global windows only where documented") {
    // ONE planning pass per query serves both checks (Catalyst planning
    // of the full registry is this spec's dominant cost): the physical
    // plan feeds the cartesian/BNLJ lints, and its logical counterpart
    // feeds the global-window lint (r9 verdict item 5 — the deliberate
    // Window.orderBy-no-partition sites are correct only while their
    // inputs stay bounded; a corpus-sized frame reaching a global
    // window must fail the suite, not ship a one-task sort).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val plan = qe.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct in the physical plan"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
          failures += s"$name: undocumented BroadcastNestedLoopJoin"
        val global = qe.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (global.nonEmpty && !globalWindowAllowed(name))
          failures += s"$name: ${global.size} global window(s) not in the " +
            "model-sized allowlist"
        if (global.isEmpty && globalWindowAllowed(name))
          failures += s"$name: allowlisted but plans no global window — " +
            "stale entry, remove it"
      } catch {
        case e: Throwable => failures += s"$name: failed to plan — ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    spark.catalog.clearCache() // some builders persist; leave the suite clean
  }
}
