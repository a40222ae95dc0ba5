package graft.queries

import graft.functions.TextOps
import graft.operators.{BpeTrain, Chunker, Decontaminate, Dedup, Multimodal, Packing, Quality, Sampling, Similarity, WordPieceTrain}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** L1–L5 — the LLM-data-pipeline surface (SURVEY.md §2.10): dedup families,
  * similarity search, text analysis, multimodal binary plumbing. Queries
  * delegate to the reusable operators in graft.operators / graft.functions
  * so the oracle gate exercises the same code paths a library user calls.
  *
  * q38/q39/q41 have no DuckDB oracle (xxhash64-based signatures and typed
  * mapPartitions are not expressible there) — the driver records the
  * weaker rows-only check; their semantics are unit-tested against exact
  * Jaccard / brute-force baselines in ScalaTest instead.
  */
object LlmQueries extends QueryGroup {
  import H._

  private val ORACLE_SHINGLES =
    """SELECT doc_id AS id,
      |       list_distinct([array_to_string(t[i:i+2], ' ')
      |                      for i in generate_series(1, len(t) - 2)]) AS sh
      |FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)
      |WHERE len(t) >= 3""".stripMargin

  val q30 = QueryDef(
    "q30_dedup_exact_sha2",
    "exact dedup: canonical doc per sha2-256 content hash + copy count " +
      "(single hash-groupBy; only (hash,id) shuffles, never text)",
    (s, dir) => Dedup.exact(t(s, dir, "documents")).orderBy("text_sha"),
    Some("""SELECT sha256(text) AS text_sha, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
            FROM documents GROUP BY sha256(text) ORDER BY text_sha"""))

  val q31 = QueryDef(
    "q31_text_token_stats",
    "token statistics per language: docs, tokens, avg tokens, distinct sources",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text"))).as("n_tokens"),
          round(avg(TextOps.tokenCount(col("text"))), 4).as("avg_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens,
              ROUND(AVG(len(string_split_regex(text, '\s+'))), 4) AS avg_tokens,
              COUNT(DISTINCT source) AS n_sources
            FROM documents GROUP BY lang ORDER BY lang"""))

  val q32 = QueryDef(
    "q32_text_quality_score",
    "per-doc quality signals: token count, stopword ratio, avg token length, " +
      "composite score — the cheap pretraining-corpus pre-filter",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val nTok = TextOps.tokenCount(col("text"))
      val hits = TextOps.hitCount(col("text"), TextOps.stopwords("en"))
      d.select(
          col("doc_id"),
          nTok.as("n_tokens"),
          hits.as("stop_hits"),
          round(hits.cast("double") / nTok, 4).as("stop_ratio"),
          round((length(col("text")) - (nTok - 1)).cast("double") / nTok, 4).as("avg_tok_len"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },
    Some("""WITH x AS (
              SELECT doc_id, text,
                CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nt,
                CAST(len(list_filter(string_split_regex(text, '\s+'),
                  t -> list_contains(['the','a','an','and','of','to','in','is','on','for'], t)))
                  AS BIGINT) AS hits
              FROM documents)
            SELECT doc_id, nt AS n_tokens, hits AS stop_hits,
              ROUND(hits * 1.0 / nt, 4) AS stop_ratio,
              ROUND((length(text) - (nt - 1)) * 1.0 / nt, 4) AS avg_tok_len,
              CAST(ROUND(CAST(LEAST(nt / 50.0, 1.0) * 0.5
                    + (1.0 - ABS(hits * 1.0 / nt - 0.4)) * 0.3
                    + LEAST(((length(text) - (nt - 1)) * 1.0 / nt) / 8.0, 1.0) * 0.2
                    AS DECIMAL(28,14)), 4) AS DOUBLE) AS quality
            FROM x ORDER BY doc_id"""))

  val q33 = QueryDef(
    "q33_text_langid",
    "language-ID heuristic (stopword-hit argmax) tabulated against the labeled lang",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("lang"), TextOps.languageId(col("text")).as("guess"))
        .groupBy("lang", "guess")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "guess")
    },
    Some("""WITH h AS (
              SELECT lang,
                len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['the','a','an','and','of','to','in','is','on','for'], t))) AS en,
                len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['el','la','los','de','que','y','en','un','una','por'], t))) AS es,
                len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['der','die','das','und','ein','eine','zu','mit','von','ist'], t))) AS de,
                len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['le','la','les','et','un','une','des','du','est','dans'], t))) AS fr
              FROM documents),
            g AS (
              SELECT lang,
                CASE WHEN en > 0 AND en >= GREATEST(en, es, de, fr) THEN 'en'
                     WHEN es > 0 AND es >= GREATEST(en, es, de, fr) THEN 'es'
                     WHEN de > 0 AND de >= GREATEST(en, es, de, fr) THEN 'de'
                     WHEN fr > 0 AND fr >= GREATEST(en, es, de, fr) THEN 'fr'
                     ELSE 'und' END AS guess
              FROM h)
            SELECT lang, guess, COUNT(*) AS n FROM g
            GROUP BY lang, guess ORDER BY lang, guess"""))

  val q34 = QueryDef(
    "q34_text_fingerprint",
    "order-sensitive rolling-hash document fingerprint (mod 1e9+7) + boundary tokens",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val toks = TextOps.tokenize(col("text"))
      d.select(
          col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"),
          element_at(toks, 1).as("first_tok"),
          element_at(toks, -1).as("last_tok"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split_regex(text, '\s+'),
                    t -> CAST(ascii(t) * 31 + length(t) AS BIGINT))),
                (h, v) -> (h * 131 + v) % 1000000007) AS fp,
              string_split_regex(text, '\s+')[1] AS first_tok,
              string_split_regex(text, '\s+')[-1] AS last_tok
            FROM documents ORDER BY doc_id"""))

  val q35 = QueryDef(
    "q35_neardup_jaccard_3gram",
    "exact 3-gram Jaccard near-dup pairs (candidates share ≥1 shingle) ≥ 0.4",
    (s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), minJaccard = 0.4)
        .select(col("ia"), col("ib"), col("shared"), col("na"), col("nb"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("ia", "ib"),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              p AS (SELECT a.id AS ia, b.id AS ib, COUNT(*) AS shared
                    FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
              sz AS (SELECT id, CAST(len(sh) AS BIGINT) AS nsh FROM docs)
             SELECT ia, ib, shared, na.nsh AS na, nb.nsh AS nb,
               ROUND(shared * 1.0 / (na.nsh + nb.nsh - shared), 4) AS jaccard
             FROM p JOIN sz na ON na.id = p.ia JOIN sz nb ON nb.id = p.ib
             WHERE shared * 1.0 / (na.nsh + nb.nsh - shared) >= 0.4
             ORDER BY ia, ib"""))

  val q36 = QueryDef(
    "q36_ann_cosine_topk",
    "brute-force cosine top-5 neighbors for probes vec_id<10 (broadcast probes, " +
      "corpus streamed once, rank on rounded sim for cross-engine stability)",
    (s, dir) => {
      val v = t(s, dir, "embeddings")
      Similarity.topKBruteForce(v, v.filter(col("vec_id") < 10), k = 5)
        .orderBy("pid", "rank")
    },
    Some("""WITH p AS (SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS pv
                       FROM embeddings WHERE vec_id < 10),
              v AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
              s AS (SELECT pid, nid, ROUND(list_cosine_similarity(pv, nv), 4) AS sim
                    FROM p CROSS JOIN v WHERE pid <> nid),
              r AS (SELECT pid, nid, sim,
                      ROW_NUMBER() OVER (PARTITION BY pid ORDER BY sim DESC, nid) AS rank
                    FROM s)
            SELECT pid, rank, nid, sim FROM r WHERE rank <= 5 ORDER BY pid, rank"""))

  val q37 = QueryDef(
    "q37_neardup_cosine_label",
    "embedding-space near-dup pairs within label groups (rounded cosine ≥ 0.3)",
    (s, dir) =>
      // bands = 12×1 plane: candidacy recall 1-(1-p)^12 with p ≈ 0.6 at
      // the 0.3 threshold — verified equal to all-pairs on the fixture at
      // both SFs (deterministic hyperplanes), exact-scored per candidate.
      // NOTE: oracle equality is FIXTURE-CONTINGENT — the oracle is the
      // exact all-pairs join, and LSH candidacy recall is < 1 by
      // construction, so a regenerated corpus could fail this gate via a
      // candidate miss without any bug; on the current seed-42 fixtures
      // recall is exactly 1 (deterministic hyperplanes, both SFs)
      Similarity.nearDupPairs(t(s, dir, "embeddings"), groupCol = "label", minSim = 0.3,
          bands = 12, planesPerBand = 1)
        .select(col("g").cast(LongType).as("label"), col("ia"), col("ib"), col("sim"))
        .orderBy("label", "ia", "ib"),
    Some("""WITH v AS (SELECT CAST(label AS BIGINT) AS label, vec_id,
                         CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
            SELECT a.label, a.vec_id AS ia, b.vec_id AS ib,
              ROUND(list_cosine_similarity(a.e, b.e), 4) AS sim
            FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.3
            ORDER BY a.label, ia, ib"""))

  val q38 = QueryDef(
    "q38_dedup_minhash_lsh",
    "MinHash(32)+LSH(16 bands) near-dup candidates verified by exact Jaccard ≥ 0.4 " +
      "(no oracle: xxhash64 signatures; ScalaTest checks candidates ⊆ exact pairs). " +
      "bands=16 (r=2) is an EXPLICIT permissive-geometry recall choice for the " +
      "j≈0.4 planted pairs — the library default r=4 would recall ~19% there; " +
      "the operator warns on this config by contract (geometry property-tested)",
    (s, dir) =>
      Dedup.minHashLshPairs(t(s, dir, "documents"),
          numHashes = 32, bands = 16, minJaccard = 0.4)
        .select(col("ia"), col("ib"), col("shared"),
          round(col("jaccard"), 4).as("jaccard"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy("ia", "ib"),
    None)

  val q39 = QueryDef(
    "q39_text_simhash",
    "64-bit SimHash signature + 16-bit band keys per document " +
      "(no oracle: xxhash64 bit votes; pair semantics unit-tested)",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.simHashSignatures(d)
        .select(col("id").as("doc_id"), col("simhash"))
        .withColumn("band0", expr("simhash & 65535"))
        .withColumn("band1", expr("(simhash >> 16) & 65535"))
        .withColumn("band2", expr("(simhash >> 32) & 65535"))
        .withColumn("band3", expr("(simhash >> 48) & 65535"))
        .orderBy("doc_id")
    },
    None)

  val q40 = QueryDef(
    "q40_multimodal_binary",
    "binary payload plumbing on the relational path: byte length, content " +
      "hash, base64 prefix over text-as-bytes payloads",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val bin = col("text").cast("binary")
      d.select(
          col("doc_id"),
          length(bin).cast(LongType).as("n_bytes"),
          sha2(bin, 256).as("payload_sha"),
          substring(base64(bin), 1, 16).as("b64_prefix"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              sha256(text) AS payload_sha,
              substring(to_base64(encode(text)), 1, 16) AS b64_prefix
            FROM documents ORDER BY doc_id"""))

  val q41 = QueryDef(
    "q41_multimodal_features",
    "media featurization (stubbed decode → 16-bin byte histogram) on the " +
      "relational path, per-kind feature stats — hash-gated; the typed " +
      "mapPartitions path is asserted bin-identical in ScalaTest",
    (s, dir) =>
      // histogram bins are raw-double ratios: contributions round into
      // DECIMAL(28,14) before the sum (the distributionDrift accumulation
      // rule) so the mean is partition-merge-order insensitive; the
      // divisor counts NON-NULL bins, preserving avg()'s null-skipping
      // semantics (a null-payload media row must not deflate the mean)
      Multimodal.featurizeRelational(Multimodal.fromDocuments(s, dir).toDF())
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          round(sum(element_at(col("histogram"), 1)
              .cast(org.apache.spark.sql.types.DecimalType(28, 14)))
            .cast("double") / count(element_at(col("histogram"), 1)), 4).as("avg_hist0"),
          round(sum(element_at(col("histogram"), 8)
              .cast(org.apache.spark.sql.types.DecimalType(28, 14)))
            .cast("double") / count(element_at(col("histogram"), 8)), 4).as("avg_hist7"))
        .orderBy("kind"),
    Some("""WITH m AS (
              SELECT doc_id,
                (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
                text,
                octet_length(encode(text)) AS nb
              FROM documents),
            h AS (SELECT kind, nb,
                    len(list_filter(
                      [ord(substring(text, i, 1)) // 16 for i in generate_series(1, len(text))],
                      x -> x = 0)) * 1.0 / greatest(nb, 1) AS h0,
                    len(list_filter(
                      [ord(substring(text, i, 1)) // 16 for i in generate_series(1, len(text))],
                      x -> x = 7)) * 1.0 / greatest(nb, 1) AS h7
                  FROM m)
            SELECT kind, COUNT(*) AS n_media,
              CAST(SUM(nb) AS BIGINT) AS total_bytes,
              ROUND(CAST(SUM(CAST(h0 AS DECIMAL(28,14))) AS DOUBLE) / COUNT(h0), 4) AS avg_hist0,
              ROUND(CAST(SUM(CAST(h7 AS DECIMAL(28,14))) AS DOUBLE) / COUNT(h7), 4) AS avg_hist7
            FROM h GROUP BY kind ORDER BY kind"""))

  val q47 = QueryDef(
    "q47_dedup_minhash_portable",
    "MinHash(8)+LSH(2 bands) with an engine-portable hash family — the full " +
      "signature→band→candidate→verify pipeline hash-gated by the oracle",
    (s, dir) =>
      Dedup.portableMinHashPairs(t(s, dir, "documents"), minJaccard = 0.4)
        .select(col("ia"), col("ib"), col("shared"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("ia", "ib"),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              hh AS (SELECT id,
                       list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                           list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
                         (h, v) -> (h * 31 + v) % 1000000007) AS h
                     FROM e),
              sig AS (SELECT id,
                        MIN((h * 3 + 7) % 1000000007) AS m0,
                        MIN((h * 5 + 1007) % 1000000007) AS m1,
                        MIN((h * 7 + 2007) % 1000000007) AS m2,
                        MIN((h * 9 + 3007) % 1000000007) AS m3,
                        MIN((h * 11 + 4007) % 1000000007) AS m4,
                        MIN((h * 13 + 5007) % 1000000007) AS m5,
                        MIN((h * 15 + 6007) % 1000000007) AS m6,
                        MIN((h * 17 + 7007) % 1000000007) AS m7
                      FROM hh GROUP BY id),
              band AS (
                SELECT id, 0 AS j,
                  ((((m0 * 131 + m1) % 1000000007) * 131 + m2) % 1000000007 * 131 + m3)
                    % 1000000007 AS bk FROM sig
                UNION ALL
                SELECT id, 1,
                  ((((m4 * 131 + m5) % 1000000007) * 131 + m6) % 1000000007 * 131 + m7)
                    % 1000000007 FROM sig),
              cand AS (SELECT DISTINCT a.id AS ia, b.id AS ib
                       FROM band a JOIN band b
                         ON a.j = b.j AND a.bk = b.bk AND a.id < b.id),
              p AS (SELECT ia, ib,
                      CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS shared,
                      len(da.sh) AS na, len(db.sh) AS nb
                    FROM cand JOIN docs da ON da.id = cand.ia
                              JOIN docs db ON db.id = cand.ib)
             SELECT ia, ib, shared,
               ROUND(shared * 1.0 / (na + nb - shared), 4) AS jaccard
             FROM p WHERE shared * 1.0 / (na + nb - shared) >= 0.4
             ORDER BY ia, ib"""))

  val q48 = QueryDef(
    "q48_text_simhash_portable",
    "64-bit SimHash with an engine-portable hash family (polynomial token " +
      "hash, 64 parity-vote SUMs, 4×16-bit band keys) — the whole signature " +
      "pipeline hash-gated by the oracle, closing q39's cross-engine gap",
    (s, dir) =>
      Dedup.portableSimHashSignatures(t(s, dir, "documents"))
        .select(col("id").as("doc_id"),
          col("band0"), col("band1"), col("band2"), col("band3"))
        .orderBy("doc_id"),
    Some("""WITH tok AS (
              SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS t
              FROM documents),
            hh AS (SELECT doc_id,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
                       (h, v) -> (h * 31 + v) % 1000000007) AS h
                   FROM tok),
            votes AS (SELECT doc_id, b,
                        SUM(CASE WHEN ((((h + 131*b + 7) % 1000000007)
                                      * ((h + 131*b + 7) % 1000000007))
                                      % 1000000007) % 2 = 1
                                 THEN 1 ELSE -1 END) AS c
                      FROM hh, range(0, 64) r(b)
                      GROUP BY doc_id, b),
            band AS (SELECT doc_id, b // 16 AS j,
                       CAST(SUM(CASE WHEN c >= 0
                                     THEN 1::BIGINT << CAST(b % 16 AS INT)
                                     ELSE 0 END) AS BIGINT) AS bk
                     FROM votes GROUP BY doc_id, b // 16)
            SELECT doc_id,
              MAX(CASE WHEN j = 0 THEN bk END) AS band0,
              MAX(CASE WHEN j = 1 THEN bk END) AS band1,
              MAX(CASE WHEN j = 2 THEN bk END) AS band2,
              MAX(CASE WHEN j = 3 THEN bk END) AS band3
            FROM band GROUP BY doc_id ORDER BY doc_id"""))

  val q49 = QueryDef(
    "q49_dedup_clusters",
    "near-dup CLUSTERING: 3-gram Jaccard ≥ 0.4 pairs → connected components " +
      "(iterative min-label propagation) → per-doc cluster id + canonical " +
      "keep flag — the corpus-dedup decision output; oracle replays the " +
      "closure with a recursive CTE",
    (s, dir) =>
      Dedup.dedupClusters(t(s, dir, "documents"), minJaccard = 0.4)
        .orderBy("doc_id"),
    Some(s"""WITH RECURSIVE docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              p AS (SELECT a.id AS ia, b.id AS ib, COUNT(*) AS shared
                    FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
              sz AS (SELECT id, CAST(len(sh) AS BIGINT) AS nsh FROM docs),
              pr AS (SELECT ia, ib
                     FROM p JOIN sz na ON na.id = p.ia JOIN sz nb ON nb.id = p.ib
                     WHERE shared * 1.0 / (na.nsh + nb.nsh - shared) >= 0.4),
              ed AS (SELECT ia AS u, ib AS v FROM pr
                     UNION ALL SELECT ib, ia FROM pr),
              reach(src, dst) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.src, ed.v FROM reach JOIN ed ON reach.dst = ed.u)
             SELECT src AS doc_id,
               MIN(dst) AS cluster_id,
               (src = MIN(dst)) AS keep
             FROM reach GROUP BY src ORDER BY doc_id"""))

  val q50 = QueryDef(
    "q50_ann_ivf_full_probe",
    "IVF ANN end-to-end — quantizer construction, corpus cell assignment " +
      "(map-side max_by keep-1), probe cell routing, cell-keyed candidate " +
      "equi-join, heap-operator ranking — at nProbe = nCentroids, where " +
      "cell routing provably changes nothing (full probe ≡ brute force, " +
      "property-tested), so q36's brute-force oracle hash-gates the whole " +
      "quantizer + routing machinery",
    (s, dir) => {
      val v = t(s, dir, "embeddings")
      Similarity.topKIvf(v, v.filter(col("vec_id") < 10), k = 5,
          nCentroids = 16, nProbe = 16)
        .orderBy("pid", "rank")
    },
    Some("""WITH p AS (SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS pv
                       FROM embeddings WHERE vec_id < 10),
              v AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
              s AS (SELECT pid, nid, ROUND(list_cosine_similarity(pv, nv), 4) AS sim
                    FROM p CROSS JOIN v WHERE pid <> nid),
              r AS (SELECT pid, nid, sim,
                      ROW_NUMBER() OVER (PARTITION BY pid ORDER BY sim DESC, nid) AS rank
                    FROM s)
            SELECT pid, rank, nid, sim FROM r WHERE rank <= 5 ORDER BY pid, rank"""))

  val q52 = QueryDef(
    "q52_udtf_shingle_explode",
    "SQL-registered table function (Catalyst Generator, SURVEY §2.11 UDTF): " +
      "explode_shingles(text, 3) resolved through the session function " +
      "registry; shingle document frequency for shingles shared by ≥2 docs",
    (s, dir) =>
      t(s, dir, "documents")
        .select(expr("explode_shingles(text, 3)").as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
        .orderBy(col("df").desc, col("shingle")),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              e AS (SELECT UNNEST(sh) AS shingle FROM docs)
             SELECT shingle, COUNT(*) AS df FROM e
             GROUP BY shingle HAVING COUNT(*) >= 2
             ORDER BY df DESC, shingle"""))

  val q53 = QueryDef(
    "q53_sample_stratified_split",
    "deterministic corpus selection: per-language hash-gated sampling rates " +
      "(domain mixing: en 50%, de 20%, rest 10%) + disjoint train/val/test " +
      "assignment (90/5/5) — pure narrow filters/projections, no RNG state, " +
      "the same corpus on every run, partitioning, and engine",
    (s, dir) => {
      val sampled = Sampling.stratifiedSample(
        t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.2), defaultFraction = 0.1)
      Sampling.withSplit(sampled, "doc_id",
          Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)), salt = "v1")
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy("doc_id")
    },
    Some("""WITH raw AS (
              SELECT doc_id, lang,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                    c -> CAST(ascii(c) AS BIGINT))),
                  (a, v) -> (a * 31 + v) % 1000000007) AS h,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(CAST(doc_id AS VARCHAR) || 'v1', ''),
                    c -> CAST(ascii(c) AS BIGINT))),
                  (a, v) -> (a * 31 + v) % 1000000007) AS hs
              FROM documents),
            h AS (
              SELECT doc_id, lang,
                ((h + 479001599) * (h + 987654323)) % 1000000007 % 10000 AS b,
                ((hs + 479001599) * (hs + 987654323)) % 1000000007 % 10000 AS bs
              FROM raw)
            SELECT doc_id, lang,
              CASE WHEN bs < 9000 THEN 'train'
                   WHEN bs < 9500 THEN 'val'
                   ELSE 'test' END AS split
            FROM h
            WHERE b < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
                                ELSE 1000 END
            ORDER BY doc_id"""))

  val q54 = QueryDef(
    "q54_tfidf_keywords",
    "per-document top-3 TF-IDF keywords — corpus vocabulary statistics " +
      "(document frequency) joined back to per-doc term frequency; rank on " +
      "the ROUNDED score with term tie-break (cross-engine determinism)",
    (s, dir) => {
      val d = t(s, dir, "documents")
      // outer explode for the same InferFiltersFromGenerate reason as q42
      val tok = d.select(col("doc_id"), explode_outer(split(col("text"), "\\s+")).as("term"))
        .where(col("term").isNotNull && col("term") =!= "")
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, "term")
        .crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * log(col("n").cast("double") / col("df")), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w).cast(LongType))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("score"))
        .orderBy("doc_id", "rk")
    },
    Some("""WITH tok AS (
              SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
                   WHERE term <> '' GROUP BY doc_id, term),
            dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
            scored AS (SELECT tf.doc_id, tf.term,
                         ROUND(tf.tf * ln((SELECT COUNT(*) FROM documents) * 1.0
                                          / dfreq.df), 4) AS score
                       FROM tf JOIN dfreq USING (term)),
            ranked AS (SELECT doc_id, term, score,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, term) AS rk
                       FROM scored)
            SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, score
            FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk"""))

  val q55 = QueryDef(
    "q55_quality_repetition_filter",
    "Gopher-style repetition quality filter: per-doc type-token ratio, " +
      "duplicate 2-/3-gram fractions (narrow array arithmetic, no shuffle), " +
      "top-bigram share (the one shuffle, 8-byte gram hashes), keep verdict",
    (s, dir) =>
      Quality.repetitionFilter(t(s, dir, "documents")).orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks
                       FROM documents),
            g AS (SELECT doc_id, toks,
                    CASE WHEN len(toks) >= 2 THEN
                      [array_to_string(toks[i:i+1], ' ')
                       for i in generate_series(1, len(toks)-1)]
                    ELSE [] END AS g2,
                    CASE WHEN len(toks) >= 3 THEN
                      [array_to_string(toks[i:i+2], ' ')
                       for i in generate_series(1, len(toks)-2)]
                    ELSE [] END AS g3
                  FROM t),
            m AS (SELECT doc_id,
                    CAST(len(toks) AS BIGINT) AS n_tokens,
                    ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS ttr,
                    CASE WHEN len(g2) > 0 THEN
                      ROUND(1.0 - len(list_distinct(g2)) * 1.0 / len(g2), 4)
                    ELSE 0.0 END AS dup2_frac,
                    CASE WHEN len(g3) > 0 THEN
                      ROUND(1.0 - len(list_distinct(g3)) * 1.0 / len(g3), 4)
                    ELSE 0.0 END AS dup3_frac
                  FROM g),
            e AS (SELECT doc_id, unnest(g2) AS b FROM g),
            c AS (SELECT doc_id, b, COUNT(*) AS c FROM e GROUP BY doc_id, b),
            tp AS (SELECT doc_id, ROUND(MAX(c) * 1.0 / SUM(c), 4) AS top2_frac
                   FROM c GROUP BY doc_id)
            SELECT m.doc_id, m.n_tokens, m.ttr, m.dup2_frac, m.dup3_frac,
                   COALESCE(tp.top2_frac, 0.0) AS top2_frac,
                   (m.ttr >= 0.3 AND m.dup3_frac <= 0.05
                    AND COALESCE(tp.top2_frac, 0.0) <= 0.12) AS keep
            FROM m LEFT JOIN tp USING (doc_id) ORDER BY m.doc_id"""))

  val q56 = QueryDef(
    "q56_decontaminate_ngram_overlap",
    "train/eval decontamination: deterministic 90/5/5 split (Sampling." +
      "withSplit, salt v1) then every test doc flagged by distinct 5-gram " +
      "overlap with the train corpus — distinct-ed train grams, 64-bit " +
      "hash join currency, shuffle-hash discipline on both sides",
    (s, dir) => {
      val lab = Sampling.withSplit(t(s, dir, "documents"), "doc_id",
        Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)), salt = "v1")
      Decontaminate.overlap(
          lab.where(col("split") === "train"),
          lab.where(col("split") === "test"), n = 5)
        .orderBy("doc_id")
    },
    Some("""WITH raw AS (
              SELECT doc_id, text,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(CAST(doc_id AS VARCHAR) || 'v1', ''),
                    c -> CAST(ascii(c) AS BIGINT))),
                  (a, v) -> (a * 31 + v) % 1000000007) AS hs
              FROM documents),
            lab AS (
              SELECT doc_id, text,
                CASE WHEN ((hs + 479001599) * (hs + 987654323))
                          % 1000000007 % 10000 < 9000 THEN 'train'
                     WHEN ((hs + 479001599) * (hs + 987654323))
                          % 1000000007 % 10000 < 9500 THEN 'val'
                     ELSE 'test' END AS split
              FROM raw),
            g AS (SELECT doc_id, split,
                    CASE WHEN len(t) >= 5 THEN
                      list_distinct([array_to_string(t[i:i+4], ' ')
                                     for i in generate_series(1, len(t)-4)])
                    ELSE [] END AS g5
                  FROM (SELECT doc_id, split,
                          string_split_regex(text, '\s+') AS t FROM lab)),
            tr AS (SELECT DISTINCT unnest(g5) AS ng FROM g WHERE split = 'train'),
            te AS (SELECT doc_id, unnest(g5) AS ng FROM g WHERE split = 'test'),
            ov AS (SELECT te.doc_id, COUNT(*) AS shared
                   FROM te JOIN tr USING (ng) GROUP BY te.doc_id)
            SELECT g.doc_id,
                   CAST(COALESCE(ov.shared, 0) AS BIGINT) AS shared_ngrams,
                   COALESCE(ov.shared, 0) >= 1 AS contaminated
            FROM g LEFT JOIN ov USING (doc_id)
            WHERE g.split = 'test' ORDER BY g.doc_id"""))

  val q57 = QueryDef(
    "q57_chunk_token_windows",
    "context-window chunking: 32-token windows, stride 24 (8-token " +
      "overlap), short docs pass through whole, last window reaches the " +
      "doc end unpadded — pure narrow transform + posexplode, no shuffle",
    (s, dir) =>
      Chunker.tokenChunks(t(s, dir, "documents"), size = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx"),
    Some("""WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks
                       FROM documents),
            n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
            c AS (SELECT doc_id, toks, n,
                    CASE WHEN n <= 32 THEN 1
                         ELSE CAST(ceil((n - 32) * 1.0 / 24) AS BIGINT) + 1
                    END AS nc
                  FROM n),
            x AS (SELECT doc_id, toks, n,
                    unnest(generate_series(0, nc - 1)) AS i FROM c)
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                   CAST(least(32, n - i * 24) AS BIGINT) AS n_chunk_tokens,
                   array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text
            FROM x ORDER BY doc_id, chunk_idx"""))

  val q58 = QueryDef(
    "q58_mixing_token_budget",
    "token-budget domain mixing: per-language token totals (one small " +
      "agg, broadcast back) set hash-gated keep rates min(1, budget/total) " +
      "— en capped at 4000 tokens, de at 2000, es over-budgeted (no-op), " +
      "fr/zh unbudgeted (pass through); then the kept-mass summary",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val kept = Sampling.tokenBudgetSample(d, "doc_id", "lang",
        TextOps.tokenCount(col("text")),
        Map("en" -> 4000L, "de" -> 2000L, "es" -> 999999L), salt = "mix1")
      kept.groupBy("lang")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(TextOps.tokenCount(col("text"))).as("tokens_kept"))
        .orderBy("lang")
    },
    Some("""WITH d AS (
              SELECT doc_id, lang,
                len(string_split_regex(text, '\s+')) AS w,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(CAST(doc_id AS VARCHAR) || 'mix1', ''),
                    c -> CAST(ascii(c) AS BIGINT))),
                  (a, v) -> (a * 31 + v) % 1000000007) AS h
              FROM documents),
            b AS (SELECT doc_id, lang, w,
                    ((h + 479001599) * (h + 987654323)) % 1000000007 % 10000 AS bk
                  FROM d),
            tot AS (SELECT lang, SUM(w) AS tw FROM b GROUP BY lang),
            j AS (SELECT b.*,
                    CASE WHEN lang = 'de' THEN LEAST(1.0, 2000.0 / tw)
                         WHEN lang = 'en' THEN LEAST(1.0, 4000.0 / tw)
                         WHEN lang = 'es' THEN LEAST(1.0, 999999.0 / tw)
                         ELSE 1.0 END AS frac
                  FROM b JOIN tot USING (lang))
            SELECT lang, COUNT(*) AS n_docs_kept,
                   CAST(SUM(w) AS BIGINT) AS tokens_kept
            FROM j WHERE bk < floor(frac * 10000)
            GROUP BY lang ORDER BY lang"""))

  val q59 = QueryDef(
    "q59_pack_sequences",
    "concat-and-split sequence packing: non-overlapping 32-token chunks " +
      "laid on one global tape in (doc_id, chunk_idx) order, cut every " +
      "256 tokens — global offsets via the two-pass prefix-sum operator " +
      "(a bare Window.orderBy would collapse to a single task), then " +
      "pack id / in-pack position / boundary-straddle geometry",
    (s, dir) => {
      val chunks = Chunker.tokenChunks(t(s, dir, "documents"),
        size = 32, stride = 32)
      Packing.packSequences(chunks, Seq("doc_id", "chunk_idx"),
          "n_chunk_tokens", 256L)
        .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
          col("offset"), col("pack_id"), col("pack_pos"), col("crosses_pack"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some("""WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks
                       FROM documents),
            n AS (SELECT doc_id, len(toks) AS n FROM t),
            c AS (SELECT doc_id, n,
                    CASE WHEN n <= 32 THEN 1
                         ELSE CAST(ceil((n - 32) * 1.0 / 32) AS BIGINT) + 1
                    END AS nc
                  FROM n),
            x AS (SELECT doc_id, n, unnest(generate_series(0, nc - 1)) AS i
                  FROM c),
            ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                     CAST(least(32, n - i * 32) AS BIGINT) AS w
                   FROM x),
            o AS (SELECT doc_id, chunk_idx, w,
                    CAST(COALESCE(SUM(w) OVER (ORDER BY doc_id, chunk_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS "offset"
                  FROM ch)
            SELECT doc_id, chunk_idx, w AS n_chunk_tokens, "offset",
                   "offset" // 256 AS pack_id, "offset" % 256 AS pack_pos,
                   (("offset" + w - 1) // 256) > ("offset" // 256) AS crosses_pack
            FROM o ORDER BY doc_id, chunk_idx"""))

  val q60 = QueryDef(
    "q60_corpus_curation_manifest",
    "end-to-end curation manifest: normalize → exact-dedup canonical " +
      "(keep the min doc per content hash) → repetition-quality verdict → " +
      "deterministic train/val/test split — the composed per-document " +
      "decision record a corpus build ships, every stage reusing the " +
      "library operator the standalone queries gate individually",
    (s, dir) => {
      import graft.functions.Clean
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), Clean.normalize(col("text")).as("text"))
      val canon = Dedup.exact(d)
      val withSha = d.withColumn("text_sha", sha2(col("text"), 256))
        .join(canon.select(col("text_sha"), col("keep_id")), "text_sha")
        .withColumn("keep_exact", col("doc_id") === col("keep_id"))
      val qual = Quality.repetitionFilter(d)
        .select(col("doc_id"), col("keep").as("keep_quality"))
      Sampling.withSplit(withSha.join(qual, "doc_id"), "doc_id",
          Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)), salt = "v1")
        .withColumn("final_keep", col("keep_exact") && col("keep_quality"))
        .select(col("doc_id"), col("lang"), col("keep_exact"),
          col("keep_quality"), col("split"), col("final_keep"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, lang,
                         trim(regexp_replace(text, '\s+', ' ', 'g')) AS text
                       FROM documents),
            sha AS (SELECT doc_id, lang, text, sha256(text) AS text_sha FROM d),
            canon AS (SELECT text_sha, MIN(doc_id) AS keep_id
                      FROM sha GROUP BY text_sha),
            t2 AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM d),
            g AS (SELECT doc_id, toks,
                    CASE WHEN len(toks) >= 2 THEN
                      [array_to_string(toks[i:i+1], ' ')
                       for i in generate_series(1, len(toks)-1)]
                    ELSE [] END AS g2,
                    CASE WHEN len(toks) >= 3 THEN
                      [array_to_string(toks[i:i+2], ' ')
                       for i in generate_series(1, len(toks)-2)]
                    ELSE [] END AS g3
                  FROM t2),
            m AS (SELECT doc_id,
                    ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS ttr,
                    CASE WHEN len(g3) > 0 THEN
                      ROUND(1.0 - len(list_distinct(g3)) * 1.0 / len(g3), 4)
                    ELSE 0.0 END AS dup3_frac
                  FROM g),
            e AS (SELECT doc_id, unnest(g2) AS b FROM g),
            c AS (SELECT doc_id, b, COUNT(*) AS c FROM e GROUP BY doc_id, b),
            tp AS (SELECT doc_id, ROUND(MAX(c) * 1.0 / SUM(c), 4) AS top2_frac
                   FROM c GROUP BY doc_id),
            qual AS (SELECT m.doc_id,
                       (m.ttr >= 0.3 AND m.dup3_frac <= 0.05
                        AND COALESCE(tp.top2_frac, 0.0) <= 0.12) AS keep_quality
                     FROM m LEFT JOIN tp USING (doc_id)),
            hs AS (SELECT doc_id,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(CAST(doc_id AS VARCHAR) || 'v1', ''),
                         c -> CAST(ascii(c) AS BIGINT))),
                       (a, v) -> (a * 31 + v) % 1000000007) AS h
                   FROM d),
            sp AS (SELECT doc_id,
                     CASE WHEN ((h + 479001599) * (h + 987654323))
                               % 1000000007 % 10000 < 9000 THEN 'train'
                          WHEN ((h + 479001599) * (h + 987654323))
                               % 1000000007 % 10000 < 9500 THEN 'val'
                          ELSE 'test' END AS split
                   FROM hs)
            SELECT sha.doc_id, sha.lang,
                   (sha.doc_id = canon.keep_id) AS keep_exact,
                   qual.keep_quality, sp.split,
                   ((sha.doc_id = canon.keep_id) AND qual.keep_quality) AS final_keep
            FROM sha
            JOIN canon USING (text_sha)
            JOIN qual ON qual.doc_id = sha.doc_id
            JOIN sp ON sp.doc_id = sha.doc_id
            ORDER BY sha.doc_id"""))

  val q61 = QueryDef(
    "q61_quality_unigram_surprisal",
    "corpus-statistics quality scoring: per-doc mean unigram surprisal " +
      "-avg ln(tf/total) — the relational analogue of the LM-perplexity " +
      "filter; vocabulary frequencies joined back on 8-byte token hashes",
    (s, dir) =>
      Quality.unigramSurprisal(t(s, dir, "documents")).orderBy("doc_id"),
    Some("""WITH tok AS (SELECT doc_id,
                           unnest(string_split_regex(text, '\s+')) AS tok
                         FROM documents),
            f AS (SELECT tok, COUNT(*) AS tf FROM tok GROUP BY tok),
            t AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_total FROM f),
            sc AS (SELECT doc_id,
                     CAST(-ln(tf * 1.0 / n_total) AS DECIMAL(28,14)) AS s
                   FROM tok JOIN f USING (tok) CROSS JOIN t)
            SELECT doc_id, COUNT(*) AS n_tokens,
                   ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 4) AS surprisal
            FROM sc GROUP BY doc_id ORDER BY doc_id"""))

  val q62 = QueryDef(
    "q62_embedding_dedup_clusters",
    "embedding near-dup CLUSTERING — the vector-space counterpart of q49: " +
      "within-label cosine ≥ 0.3 pairs (LSH-banded candidates, exact " +
      "rejoin scoring) → connected components → per-vector cluster id + " +
      "canonical keep flag; oracle replays the closure recursively",
    (s, dir) =>
      Similarity.nearDupClusters(t(s, dir, "embeddings"), groupCol = "label",
          minSim = 0.3, bands = 12, planesPerBand = 1)
        .orderBy("vec_id"),
    Some("""WITH RECURSIVE v AS (SELECT vec_id,
                     CAST(embedding AS DOUBLE[]) AS e,
                     CAST(label AS BIGINT) AS label
                   FROM embeddings),
            pr AS (SELECT a.vec_id AS ia, b.vec_id AS ib
                   FROM v a JOIN v b
                     ON a.label = b.label AND a.vec_id < b.vec_id
                   WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.3),
            ed AS (SELECT ia AS u, ib AS w FROM pr
                   UNION ALL SELECT ib, ia FROM pr),
            reach(src, dst) AS (
              SELECT vec_id, vec_id FROM embeddings
              UNION
              SELECT reach.src, ed.w FROM reach JOIN ed ON reach.dst = ed.u)
            SELECT src AS vec_id,
                   MIN(dst) AS cluster_id,
                   (src = MIN(dst)) AS keep
            FROM reach GROUP BY src ORDER BY vec_id"""))

  val q63 = QueryDef(
    "q63_dedup_duplicated_spans",
    "substring-level duplicated-span coverage (the Lee-et-al training-data " +
      "dedup form): 8-token windows occurring >= 2x in the corpus mark " +
      "their span; overlaps merge via a per-doc lag window; per-doc " +
      "duplicated-token fraction. Linear in corpus tokens, never " +
      "pair-quadratic",
    (s, dir) =>
      Dedup.duplicatedSpanStats(t(s, dir, "documents"), n = 8).orderBy("doc_id"),
    Some("""WITH d AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
            g AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS gram
                  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
                        FROM d WHERE len(t) >= 8)),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
            cov AS (SELECT doc_id, pos,
                      LEAST(8, COALESCE(pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos), 8)) AS add_cov
                    FROM g JOIN dup USING (gram)),
            per AS (SELECT doc_id, CAST(SUM(add_cov) AS BIGINT) AS dup_tokens
                    FROM cov GROUP BY doc_id)
            SELECT s.doc_id, s.n_tokens,
                   COALESCE(per.dup_tokens, 0) AS dup_tokens,
                   ROUND(COALESCE(per.dup_tokens, 0) * 1.0 / s.n_tokens, 4) AS dup_frac
            FROM (SELECT doc_id,
                    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
                  FROM documents) s
            LEFT JOIN per USING (doc_id) ORDER BY s.doc_id"""))

  val q64 = QueryDef(
    "q64_dedup_remove_spans",
    "duplicated-span REMOVAL — the curation action on q63's measurement: " +
      "8-token windows occurring >= 2x are cut out of the text (merged " +
      "intervals, token-index filter); output is the surviving text per doc",
    (s, dir) =>
      Dedup.removeDuplicatedSpans(t(s, dir, "documents"), n = 8).orderBy("doc_id"),
    Some("""WITH d AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
            g AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS gram
                  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
                        FROM d WHERE len(t) >= 8)),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
            cov AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS ci
                    FROM (SELECT doc_id, pos FROM g JOIN dup USING (gram))),
            tok AS (SELECT doc_id, i - 1 AS idx, t[i] AS tok
                    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM d)),
            kept AS (SELECT tok.doc_id,
                       CAST(COUNT(*) AS BIGINT) AS kept_tokens,
                       string_agg(tok.tok, ' ' ORDER BY tok.idx) AS clean_text
                     FROM tok LEFT JOIN cov
                       ON tok.doc_id = cov.doc_id AND tok.idx = cov.ci
                     WHERE cov.ci IS NULL GROUP BY tok.doc_id)
            SELECT s.doc_id, s.n_tokens,
                   COALESCE(kept.kept_tokens, 0) AS kept_tokens,
                   COALESCE(kept.clean_text, '') AS clean_text
            FROM (SELECT doc_id,
                    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
                  FROM documents) s
            LEFT JOIN kept USING (doc_id) ORDER BY s.doc_id"""))

  val q65 = QueryDef(
    "q65_decontaminate_span_cut",
    "span-cut decontamination — the inverse direction of q56: every " +
      "8-token train window occurring ANYWHERE in the held-out eval set " +
      "(doc_id % 10 = 0) is cut out of the train text (no occurrence " +
      "threshold: one benchmark hit is already contamination)",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Decontaminate.cutEvalSpans(
          d.where(col("doc_id") % 10 =!= 0),
          d.where(col("doc_id") % 10 === 0), n = 8)
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
            ev AS (SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS gram
                   FROM (SELECT t, unnest(generate_series(1, len(t) - 7)) AS i
                         FROM d WHERE doc_id % 10 = 0 AND len(t) >= 8)),
            g AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS gram
                  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
                        FROM d WHERE doc_id % 10 != 0 AND len(t) >= 8)),
            cov AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS ci
                    FROM (SELECT doc_id, pos FROM g JOIN ev USING (gram))),
            tok AS (SELECT doc_id, i - 1 AS idx, t[i] AS tok
                    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
                          FROM d WHERE doc_id % 10 != 0)),
            kept AS (SELECT tok.doc_id,
                       CAST(COUNT(*) AS BIGINT) AS kept_tokens,
                       string_agg(tok.tok, ' ' ORDER BY tok.idx) AS clean_text
                     FROM tok LEFT JOIN cov
                       ON tok.doc_id = cov.doc_id AND tok.idx = cov.ci
                     WHERE cov.ci IS NULL GROUP BY tok.doc_id)
            SELECT s.doc_id, s.n_tokens,
                   COALESCE(kept.kept_tokens, 0) AS kept_tokens,
                   COALESCE(kept.clean_text, '') AS clean_text
            FROM (SELECT doc_id,
                    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
                  FROM documents WHERE doc_id % 10 != 0) s
            LEFT JOIN kept USING (doc_id) ORDER BY s.doc_id"""))

  val q66 = QueryDef(
    "q66_retrieval_bm25",
    "Okapi BM25 lexical retrieval — top-10 docs for a 3-term query; " +
      "query-term filter inside the exploded stream (the corpus-wide " +
      "explode never shuffles), decimal-accumulated term contributions " +
      "for order-independent scores, rank ties broken on doc id",
    (s, dir) =>
      graft.operators.Retrieval.bm25(t(s, dir, "documents"),
          Seq("key", "table", "hash"), topK = 10)
        .orderBy(col("score").desc, col("doc_id")),
    Some("""WITH lens AS (SELECT doc_id,
                     CAST(len(list_filter(string_split_regex(text, '\s+'),
                       t -> t <> '')) AS BIGINT) AS dl
                   FROM documents),
            st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens),
            tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
                         FROM documents)
                   WHERE tok IN ('key', 'table', 'hash') GROUP BY doc_id, tok),
            dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
            c AS (SELECT tf.doc_id,
                    ROUND(ln((st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                          * (tf.tf * (1.2 + 1.0))
                          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * lens.dl / st.avgdl)),
                      6) AS c
                  FROM tf JOIN dfreq USING (tok) JOIN lens USING (doc_id) CROSS JOIN st)
            SELECT doc_id,
                   ROUND(CAST(SUM(CAST(c AS DECIMAL(30,6))) AS DOUBLE), 4) AS score
            FROM c GROUP BY doc_id
            ORDER BY score DESC, doc_id LIMIT 10"""))

  val q67 = QueryDef(
    "q67_retrieval_bm25_indexed",
    "BM25 over a MATERIALIZED index — build postings/dictionary/stats " +
      "once, query by term filter (the amortization path for repeated " +
      "queries); must produce exactly q66's ranking, same oracle",
    (s, dir) =>
      graft.operators.Retrieval.bm25FromIndex(
          graft.operators.Retrieval.buildIndex(t(s, dir, "documents")),
          Seq("key", "table", "hash"), topK = 10)
        .orderBy(col("score").desc, col("doc_id")),
    q66.oracle)

  val q68 = QueryDef(
    "q68_source_quota_topk",
    "per-source crawl quota: keep the top-5 docs per source by " +
      "(n_chars desc, doc_id) through the TopKPerKey heap operator — the " +
      "domain-cap every crawl pipeline applies so no single site dominates " +
      "the corpus; the map-side partial heap trims each input partition " +
      "to ≤ k rows per source BEFORE the exchange, so the shuffle moves " +
      "k·partitions rows per source instead of the corpus (the window-" +
      "function idiom would sort and shuffle every row)",
    (s, dir) =>
      graft.plans.TopK.perKey(t(s, dir, "documents"),
          Seq(col("source")), Seq(col("n_chars").desc, col("doc_id")),
          k = 5, rankName = "rank")
        .select(col("source"), col("doc_id"), col("n_chars"), col("rank"))
        .orderBy("source", "rank"),
    Some("""SELECT source, doc_id, n_chars, CAST(rank AS BIGINT) AS rank
            FROM (SELECT source, doc_id, n_chars,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY n_chars DESC, doc_id) AS rank
                  FROM documents)
            WHERE rank <= 5 ORDER BY source, rank"""))

  val q69 = QueryDef(
    "q69_pii_redaction",
    "PII scrub through the production redaction chain (urls → emails → " +
      "ipv4 → phones, all codegen'd regexp_replace, RE2-safe patterns). " +
      "The fixture corpus carries no PII by construction, so the query " +
      "grafts deterministic doc_id-derived email/url/ip/phone text onto " +
      "each document and the DuckDB oracle re-runs the identical chain — " +
      "upgrading the Clean family from unit-only to hash-gated",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val pii = concat(
        lit("contact user"), col("doc_id"),
        lit("@mail"), pmod(col("doc_id"), lit(7)),
        lit(".example.com via https://site"), pmod(col("doc_id"), lit(13)),
        lit(".org/p?id="), col("doc_id"),
        lit(" from 10."), pmod(col("doc_id"), lit(200)),
        lit(".0."), pmod(col("doc_id"), lit(250)),
        lit(" call +1 415-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" -- "), col("text"))
      d.select(col("doc_id"), graft.functions.Clean.redactPii(pii).as("redacted"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                'contact user' || doc_id || '@mail' || (doc_id % 7) ||
                  '.example.com via https://site' || (doc_id % 13) ||
                  '.org/p?id=' || doc_id ||
                  ' from 10.' || (doc_id % 200) || '.0.' || (doc_id % 250) ||
                  ' call +1 415-555-' ||
                  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                  ' -- ' || text,
                'https?://[^\s<>"]+', '[URL]', 'g'),
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                '\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b', '[IP]', 'g'),
                '(?:\+[0-9]{1,3}[ .-]?)?(?:\(?[0-9]{2,4}\)?[ .-]?){2,4}[0-9]{3,4}', '[PHONE]', 'g')
                AS redacted
            FROM documents ORDER BY doc_id"""))

  val q70 = QueryDef(
    "q70_decontaminate_bloom",
    "bloom-pruned decontamination: the eval set's 5-gram vocabulary " +
      "becomes a driver-built Bloom filter (Spark's own BloomFilter" +
      "Aggregate) probed map-side inside the train-side scan, discarding " +
      "non-colliding grams before the distinct aggregation and join — at " +
      "corpus scale the shuffle shrinks from corpus-vocabulary to ~eval-" +
      "vocabulary; false positives die in the exact join, so the result " +
      "is bit-identical to q56's exact shape (same oracle SQL form)",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Decontaminate.overlapBloomPruned(
          d.where(pmod(col("doc_id"), lit(10)) =!= 0),
          d.where(pmod(col("doc_id"), lit(10)) === 0), n = 5)
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, string_split_regex(text, '\s+') AS t
                       FROM documents),
            g AS (SELECT doc_id,
                    CASE WHEN len(t) >= 5 THEN
                      list_distinct([array_to_string(t[i:i+4], ' ')
                                     for i in generate_series(1, len(t)-4)])
                    ELSE [] END AS g5
                  FROM d),
            tr AS (SELECT DISTINCT unnest(g5) AS ng FROM g WHERE doc_id % 10 != 0),
            te AS (SELECT doc_id, unnest(g5) AS ng FROM g WHERE doc_id % 10 = 0),
            ov AS (SELECT te.doc_id, COUNT(*) AS shared
                   FROM te JOIN tr USING (ng) GROUP BY te.doc_id)
            SELECT g.doc_id,
                   CAST(COALESCE(ov.shared, 0) AS BIGINT) AS shared_ngrams,
                   COALESCE(ov.shared, 0) >= 1 AS contaminated
            FROM g LEFT JOIN ov USING (doc_id)
            WHERE g.doc_id % 10 = 0 ORDER BY g.doc_id"""))

  val q71 = QueryDef(
    "q71_quality_calibrated_filter",
    "per-language calibrated quality gate: the composite quality score " +
      "percent-ranked WITHIN each language, keep the top half — an " +
      "absolute threshold would gut languages whose score distribution " +
      "sits lower (shorter stopword lists, different length norms); " +
      "ranking per group is the standard calibration fix. Uses the " +
      "windowed rank (one sort-shuffle per group set); the heap operator " +
      "(q68) is the scale path when only a fixed quota is needed",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("quality").desc, col("doc_id"))
      d.select(col("doc_id"), col("lang"),
          TextOps.qualityScore(col("text")).as("quality"))
        .withColumn("pr", round(percent_rank().over(w), 4))
        .where(col("pr") <= 0.5)
        .orderBy("doc_id")
    },
    Some("""WITH x AS (SELECT doc_id, lang, text,
                 CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nt,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                   t -> list_contains(['the','a','an','and','of','to','in','is','on','for'], t)))
                   AS BIGINT) AS hits
               FROM documents),
            q AS (SELECT doc_id, lang,
                    CAST(ROUND(CAST(LEAST(nt / 50.0, 1.0) * 0.5
                          + (1.0 - ABS(hits * 1.0 / nt - 0.4)) * 0.3
                          + LEAST(((length(text) - (nt - 1)) * 1.0 / nt) / 8.0, 1.0) * 0.2
                          AS DECIMAL(28,14)), 4) AS DOUBLE) AS quality
                  FROM x),
            r AS (SELECT doc_id, lang, quality,
                    ROUND(percent_rank() OVER (PARTITION BY lang
                            ORDER BY quality DESC, doc_id), 4) AS pr
                  FROM q)
            SELECT doc_id, lang, quality, pr FROM r
            WHERE pr <= 0.5 ORDER BY doc_id"""))

  val q72 = QueryDef(
    "q72_ann_pq_adc_rerank",
    "product-quantization ANN (PQ/ADC, Jégou et al. 2011): 4 subspaces × " +
      "16-entry codebooks (2 Lloyd rounds over exact subspace means), " +
      "corpus encoded to 4 codes/vector (the ~1/64-width scan at scale), " +
      "per-probe distance-table scoring, exact cosine re-rank of the " +
      "candidate pool — with topC = corpus candidacy is provably complete " +
      "(property-tested), so q36's brute-force oracle hash-gates the " +
      "whole codebook/encode/ADC/re-rank machinery, the q50 pattern",
    (s, dir) => {
      val v = t(s, dir, "embeddings")
      Similarity.topKPqAdc(v, v.filter(col("vec_id") < 10), k = 5,
          topC = v.count().toInt, iters = 2)
        .orderBy("pid", "rank")
    },
    q36.oracle)

  val q73 = QueryDef(
    "q73_dsir_importance",
    "DSIR-style domain importance weighting (unigram form): per-doc mean " +
      "log-ratio between the en-labeled target LM and the corpus LM, " +
      "add-one smoothed — the classifier-free domain-tilt signal; both " +
      "LMs are vocabulary-sized frames, tokens join as 8-byte hashes",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Quality.importanceWeights(d, d.where(col("lang") === "en"))
        .orderBy("doc_id")
    },
    // `+ 0.0` on importance: DuckDB's ROUND keeps IEEE sign (a tiny
    // negative mean rounds to -0.0) while Spark's BigDecimal-based round
    // yields +0.0; the driver hash is bitwise, so normalize -0.0 away.
    Some("""WITH tok AS (SELECT doc_id,
                           unnest(string_split_regex(text, '\s+')) AS tok
                         FROM documents),
            cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf
                   FROM tok GROUP BY tok),
            tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM (SELECT unnest(string_split_regex(text, '\s+')) AS tok
                         FROM documents WHERE lang = 'en') GROUP BY tok),
            st AS (SELECT (SELECT SUM(cf) FROM cf) AS nc,
                          (SELECT COUNT(*) FROM cf) AS v,
                          (SELECT COALESCE(SUM(tf), 0) FROM tf) AS nt),
            lw AS (SELECT cf.tok,
                     CAST(ln((COALESCE(tf.tf, 0) + 1.0) / (st.nt + st.v))
                       - ln((cf.cf + 1.0) / (st.nc + st.v))
                       AS DECIMAL(28,14)) AS lw
                   FROM cf LEFT JOIN tf USING (tok) CROSS JOIN st)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   ROUND(CAST(SUM(lw) AS DOUBLE) / COUNT(*), 4) + 0.0 AS importance
            FROM tok JOIN lw USING (tok)
            GROUP BY doc_id ORDER BY doc_id"""))

  val q74 = QueryDef(
    "q74_weighted_sample",
    "Efraimidis–Spirakis weighted sampling without replacement, " +
      "deterministic form: u drawn from the engine-portable id hash, " +
      "rank by rounded ln(u)/weight on the heap operator, top-3 per " +
      "source by n_chars weight — heavier docs win proportionally more " +
      "often, the selected set is a pure function of (ids, weights, salt)",
    (s, dir) =>
      Sampling.weightedSample(t(s, dir, "documents"), "doc_id", "n_chars",
          k = 3, groupCols = Seq("source"), salt = "w1")
        .select(col("source"), col("doc_id"), col("n_chars"), col("es_rank"))
        .orderBy("source", "es_rank"),
    Some("""WITH raw AS (SELECT doc_id, source, n_chars,
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(CAST(doc_id AS VARCHAR) || 'w1', ''),
                        c -> CAST(ascii(c) AS BIGINT))),
                      (a, v) -> (a * 31 + v) % 1000000007) AS hs
                  FROM documents),
            b AS (SELECT doc_id, source, n_chars,
                    ((hs + 479001599) * (hs + 987654323))
                      % 1000000007 % 10000 AS bk
                  FROM raw),
            kd AS (SELECT doc_id, source, n_chars,
                     ROUND(ln((bk + 0.5) / 10000) / n_chars, 9) AS key
                   FROM b),
            r AS (SELECT doc_id, source, n_chars,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY key DESC, doc_id) AS es_rank
                  FROM kd)
            SELECT source, doc_id, n_chars, CAST(es_rank AS BIGINT) AS es_rank
            FROM r WHERE es_rank <= 3 ORDER BY source, es_rank"""))

  val q75 = QueryDef(
    "q75_retrieval_bm25_batch",
    "batched BM25: two bag-of-words queries scored in ONE pass over the " +
      "materialized index (the retrieval-mining shape — per-query jobs " +
      "do not scale to workloads of thousands), query table broadcast " +
      "into the postings join, top-5 per query on the heap operator; " +
      "per-query output identical to the single-query path",
    (s, dir) => {
      import s.implicits._
      val qtab = Seq(
        (1L, "key"), (1L, "table"), (1L, "hash"),
        (2L, "window"), (2L, "batch"), (2L, "spark"))
        .toDF("query_id", "term")
      graft.operators.Retrieval.bm25BatchFromIndex(
          graft.operators.Retrieval.buildIndex(t(s, dir, "documents")),
          qtab, topK = 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH q(qid, tok) AS (VALUES (1, 'key'), (1, 'table'), (1, 'hash'),
                 (2, 'window'), (2, 'batch'), (2, 'spark')),
            lens AS (SELECT doc_id,
                       CAST(len(list_filter(string_split_regex(text, '\s+'),
                         t -> t <> '')) AS BIGINT) AS dl
                     FROM documents),
            st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens),
            tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
                         FROM documents)
                   WHERE tok IN (SELECT tok FROM q) GROUP BY doc_id, tok),
            dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
            c AS (SELECT q.qid, tf.doc_id,
                    ROUND(ln((st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                          * (tf.tf * (1.2 + 1.0))
                          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * lens.dl / st.avgdl)),
                      6) AS c
                  FROM q JOIN tf USING (tok) JOIN dfreq USING (tok)
                    JOIN lens USING (doc_id) CROSS JOIN st),
            s AS (SELECT qid, doc_id,
                    ROUND(CAST(SUM(CAST(c AS DECIMAL(30,6))) AS DOUBLE), 4) AS score
                  FROM c GROUP BY qid, doc_id),
            r AS (SELECT qid, doc_id, score,
                    row_number() OVER (PARTITION BY qid
                                       ORDER BY score DESC, doc_id) AS rank
                  FROM s)
            SELECT CAST(qid AS BIGINT) AS query_id, doc_id, score,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  val q76 = QueryDef(
    "q76_shuffle_shards",
    "deterministic corpus shuffle + shard export layout: shard = avalanched " +
      "id-hash mod 8, pos = rank of a second decorrelated id-hash within the " +
      "shard — one hash exchange + per-shard local sort (never a global " +
      "range sort), the whole layout a pure function of (ids, nShards, salt)",
    (s, dir) =>
      Sampling.shuffleShards(t(s, dir, "documents"), "doc_id", nShards = 8,
          salt = "v1")
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos"),
    Some("""WITH raw AS (SELECT doc_id,
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(CAST(doc_id AS VARCHAR) || 'v1#s', ''),
                        c -> CAST(ascii(c) AS BIGINT))),
                      (a, v) -> (a * 31 + v) % 1000000007) AS hsh,
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(CAST(doc_id AS VARCHAR) || 'v1#o', ''),
                        c -> CAST(ascii(c) AS BIGINT))),
                      (a, v) -> (a * 31 + v) % 1000000007) AS hor
                  FROM documents),
            b AS (SELECT doc_id,
                    ((hsh + 479001599) * (hsh + 987654323)) % 1000000007 % 8 AS shard,
                    ((hor + 479001599) * (hor + 987654323)) % 1000000007 AS ord
                  FROM raw)
            SELECT doc_id, shard,
              CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS BIGINT) AS pos
            FROM b ORDER BY shard, pos"""))

  val q77 = QueryDef(
    "q77_knn_graph_ivf",
    "corpus kNN graph (every vector's top-3 neighbors) via IVF at " +
      "PRODUCTION geometry — nProbe=2 of 16 cells, the approximate path " +
      "itself, not the full-probe degenerate case q50 gates: rounded " +
      "routing scores make cell candidacy engine-portable, so the oracle " +
      "replays assignment, probe routing, candidate generation and " +
      "ranking; both sides corpus-sized ⇒ cell-keyed shuffle-hash join, " +
      "no broadcast; nCentroids derives count-conditionally as " +
      "max(16, n/1024) (r15 - the pinned 16 grew per-probe candidate " +
      "volume linearly with the corpus, measured 521x at 100x), the " +
      "same integer rule the oracle computes from COUNT(*)",
    (s, dir) =>
      Similarity.knnGraphAuto(t(s, dir, "embeddings"), k = 3, nProbe = 2)
        .orderBy("pid", "rank"),
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
            c AS (SELECT vec_id AS cid, ev AS cv FROM v ORDER BY vec_id
                  LIMIT (SELECT GREATEST(16, COUNT(*) // 1024) FROM embeddings)),
            cs AS (SELECT v.vec_id, c.cid,
                     ROUND(list_cosine_similarity(v.ev, c.cv), 6) AS csim
                   FROM v CROSS JOIN c),
            rk AS (SELECT vec_id, cid,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY csim DESC, cid) AS r
                   FROM cs),
            vc AS (SELECT vec_id AS nid, cid AS cell FROM rk WHERE r = 1),
            pc AS (SELECT vec_id AS pid, cid AS pcell FROM rk WHERE r <= 2),
            cand AS (SELECT pc.pid, vc.nid FROM pc
                     JOIN vc ON pc.pcell = vc.cell AND pc.pid <> vc.nid),
            s AS (SELECT cand.pid, cand.nid,
                    ROUND(list_cosine_similarity(p.ev, n.ev), 4) AS sim
                  FROM cand JOIN v p ON p.vec_id = cand.pid
                    JOIN v n ON n.vec_id = cand.nid),
            r AS (SELECT pid, nid, sim,
                    ROW_NUMBER() OVER (PARTITION BY pid
                                       ORDER BY sim DESC, nid) AS rank
                  FROM s)
            SELECT pid, rank, nid, sim FROM r WHERE rank <= 3
            ORDER BY pid, rank"""))

  val q78 = QueryDef(
    "q78_bpe_train_merges",
    "BPE tokenizer TRAINING (merge-rule induction, Sennrich 2016): one " +
      "corpus→vocabulary aggregation, then 16 rounds of vocab-sized " +
      "pair-count + TakeOrdered(1) argmax + narrow greedy-merge fold — " +
      "persisted per round, lineage-truncated every 8th; the merge table " +
      "is the model. FULL hash oracle via generated SQL (the q215 " +
      "kCenterSqlCtes technique applied to the merge loop): one " +
      "(pair-count, argmax, gaps-and-islands greedy merge) CTE block " +
      "per round, unrolled from the same round structure the engine " +
      "runs — converted from rows-only in r13; the trainer is also " +
      "equivalence-tested against a sequential reference in BpeTrainSpec",
    (s, dir) => {
      import s.implicits._
      BpeTrain.trainMerges(t(s, dir, "documents"), numMerges = 16)
        .toDF().orderBy("rank")
    },
    Some(BpeTrain.mergesSqlCtes("documents", numMerges = 16)))

  val q79 = QueryDef(
    "q79_bpe_pair_counts",
    "portable twin of q78's training round: weighted adjacent character-" +
      "pair counts over the word vocabulary, top-20 under the trainer's " +
      "exact argmax order (count DESC, pair ASC) — hash-gates the " +
      "corpus→vocab reduction and the pair-count aggregation that every " +
      "BPE round replays",
    (s, dir) => {
      val vocab = BpeTrain.wordVocab(t(s, dir, "documents"))
        .select(BpeTrain.charSyms(col("word")).as("syms"), col("w"))
      BpeTrain.pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(20)
    },
    Some("""WITH wds AS (SELECT unnest(regexp_extract_all(lower(text),
                    '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS word FROM documents),
            wv AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS w FROM wds
                   WHERE word <> '' GROUP BY word),
            cl AS (SELECT string_split(word, '') AS cs, w FROM wv),
            pr AS (SELECT unnest(cs[1:len(cs)-1]) AS l,
                     unnest(cs[2:len(cs)]) AS r, w
                   FROM cl WHERE len(cs) >= 2)
            SELECT l, r, CAST(SUM(w) AS BIGINT) AS cnt FROM pr
            GROUP BY l, r ORDER BY cnt DESC, l, r LIMIT 20"""))

  val q81 = QueryDef(
    "q81_neardup_ingest_gate",
    "ingest-time NEAR-dup admission gate, the fuzzy newContentOnly: every " +
      "(incoming, corpus) pair at 3-gram Jaccard ≥ 0.4 via portable banded " +
      "MinHash (incoming bands meet precomputable corpus bands only inside " +
      "shared LSH buckets, shuffle-hash, never all-against-all) + fused " +
      "exact verify on candidates — the whole cross-corpus pipeline " +
      "replayed by the oracle; incoming = doc_id ≡ 0 (mod 5), corpus = rest",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.nearDupAgainst(
          corpus = d.filter(col("doc_id") % 5 =!= 0),
          incoming = d.filter(col("doc_id") % 5 === 0),
          minJaccard = 0.4)
        .select(col("in_id"), col("corpus_id"), col("shared"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("in_id", "corpus_id")
    },
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              hh AS (SELECT id,
                       list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                           list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
                         (h, v) -> (h * 31 + v) % 1000000007) AS h
                     FROM e),
              sig AS (SELECT id,
                        MIN((h * 3 + 7) % 1000000007) AS m0,
                        MIN((h * 5 + 1007) % 1000000007) AS m1,
                        MIN((h * 7 + 2007) % 1000000007) AS m2,
                        MIN((h * 9 + 3007) % 1000000007) AS m3,
                        MIN((h * 11 + 4007) % 1000000007) AS m4,
                        MIN((h * 13 + 5007) % 1000000007) AS m5,
                        MIN((h * 15 + 6007) % 1000000007) AS m6,
                        MIN((h * 17 + 7007) % 1000000007) AS m7
                      FROM hh GROUP BY id),
              band AS (
                SELECT id, 0 AS j,
                  ((((m0 * 131 + m1) % 1000000007) * 131 + m2) % 1000000007 * 131 + m3)
                    % 1000000007 AS bk FROM sig
                UNION ALL
                SELECT id, 1,
                  ((((m4 * 131 + m5) % 1000000007) * 131 + m6) % 1000000007 * 131 + m7)
                    % 1000000007 FROM sig),
              cand AS (SELECT DISTINCT a.id AS in_id, b.id AS corpus_id
                       FROM band a JOIN band b ON a.j = b.j AND a.bk = b.bk
                       WHERE a.id % 5 = 0 AND b.id % 5 <> 0),
              p AS (SELECT in_id, corpus_id,
                      CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS shared,
                      len(da.sh) AS na, len(db.sh) AS nb
                    FROM cand JOIN docs da ON da.id = cand.in_id
                              JOIN docs db ON db.id = cand.corpus_id)
             SELECT in_id, corpus_id, shared,
               ROUND(shared * 1.0 / (na + nb - shared), 4) AS jaccard
             FROM p WHERE shared * 1.0 / (na + nb - shared) >= 0.4
             ORDER BY in_id, corpus_id"""))

  val q82 = QueryDef(
    "q82_curation_export_layout",
    "the corpus build's FINAL step composed onto q60's manifest: " +
      "survivors (final_keep) receive their deterministic per-SPLIT " +
      "shard + position layout (train shards never interleave val/test " +
      "rows, positions restart per (split, shard)) — normalize → dedup → " +
      "quality → split → export as ONE declarative cross-engine-checked " +
      "plan",
    (s, dir) => {
      // materialize the manifest BEFORE filtering — semantically it is
      // the pipeline's shipped artifact, and structurally the barrier is
      // load-bearing: pushing final_keep below q60's projections
      // substitutes the full token-pipeline expression trees into the
      // filter (Filter-below-Project inlining has no lambda CSE), which
      // measured ~30× on the whole query (49 s vs 1.7 s at sf0.1).
      // Session-cache note: the blocks back a lazy result and live until
      // clearCache (Bench clears per query); a q60 run AFTER q82 in the
      // same session reads this cache — same rows, hence hash-identical
      val manifest = q60.builder(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      Sampling.shuffleShards(
          manifest.filter(col("final_keep"))
            .select("doc_id", "lang", "split"),
          "doc_id", nShards = 4, salt = "exp", groupCols = Seq("split"))
        .select(col("doc_id"), col("split"), col("shard"), col("pos"))
        .orderBy("split", "shard", "pos")
    },
    Some("""WITH d AS (SELECT doc_id, lang,
                         trim(regexp_replace(text, '\s+', ' ', 'g')) AS text
                       FROM documents),
            sha AS (SELECT doc_id, lang, text, sha256(text) AS text_sha FROM d),
            canon AS (SELECT text_sha, MIN(doc_id) AS keep_id
                      FROM sha GROUP BY text_sha),
            t2 AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM d),
            g AS (SELECT doc_id, toks,
                    CASE WHEN len(toks) >= 2 THEN
                      [array_to_string(toks[i:i+1], ' ')
                       for i in generate_series(1, len(toks)-1)]
                    ELSE [] END AS g2,
                    CASE WHEN len(toks) >= 3 THEN
                      [array_to_string(toks[i:i+2], ' ')
                       for i in generate_series(1, len(toks)-2)]
                    ELSE [] END AS g3
                  FROM t2),
            m AS (SELECT doc_id,
                    ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS ttr,
                    CASE WHEN len(g3) > 0 THEN
                      ROUND(1.0 - len(list_distinct(g3)) * 1.0 / len(g3), 4)
                    ELSE 0.0 END AS dup3_frac
                  FROM g),
            e AS (SELECT doc_id, unnest(g2) AS b FROM g),
            c AS (SELECT doc_id, b, COUNT(*) AS c FROM e GROUP BY doc_id, b),
            tp AS (SELECT doc_id, ROUND(MAX(c) * 1.0 / SUM(c), 4) AS top2_frac
                   FROM c GROUP BY doc_id),
            qual AS (SELECT m.doc_id,
                       (m.ttr >= 0.3 AND m.dup3_frac <= 0.05
                        AND COALESCE(tp.top2_frac, 0.0) <= 0.12) AS keep_quality
                     FROM m LEFT JOIN tp USING (doc_id)),
            hs AS (SELECT doc_id,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(CAST(doc_id AS VARCHAR) || 'v1', ''),
                         c -> CAST(ascii(c) AS BIGINT))),
                       (a, v) -> (a * 31 + v) % 1000000007) AS h
                   FROM d),
            sp AS (SELECT doc_id,
                     CASE WHEN ((h + 479001599) * (h + 987654323))
                               % 1000000007 % 10000 < 9000 THEN 'train'
                          WHEN ((h + 479001599) * (h + 987654323))
                               % 1000000007 % 10000 < 9500 THEN 'val'
                          ELSE 'test' END AS split
                   FROM hs),
            surv AS (SELECT sha.doc_id, sp.split
                     FROM sha
                     JOIN canon USING (text_sha)
                     JOIN qual ON qual.doc_id = sha.doc_id
                     JOIN sp ON sp.doc_id = sha.doc_id
                     WHERE sha.doc_id = canon.keep_id AND qual.keep_quality),
            eh AS (SELECT doc_id, split,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(CAST(doc_id AS VARCHAR) || 'exp#s', ''),
                         c -> CAST(ascii(c) AS BIGINT))),
                       (a, v) -> (a * 31 + v) % 1000000007) AS hsd,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(CAST(doc_id AS VARCHAR) || 'exp#o', ''),
                         c -> CAST(ascii(c) AS BIGINT))),
                       (a, v) -> (a * 31 + v) % 1000000007) AS hod
                   FROM surv),
            lay AS (SELECT doc_id, split,
                      ((hsd + 479001599) * (hsd + 987654323)) % 1000000007 % 4 AS shard,
                      ((hod + 479001599) * (hod + 987654323)) % 1000000007 AS ord
                    FROM eh)
            SELECT doc_id, split, shard,
              CAST(ROW_NUMBER() OVER (PARTITION BY split, shard
                                      ORDER BY ord, doc_id) AS BIGINT) AS pos
            FROM lay ORDER BY split, shard, pos"""))

  val q83 = QueryDef(
    "q83_retrieval_hybrid_rrf",
    "hybrid retrieval: BM25 lexical top-10 (q66's query) fused with dense " +
      "cosine top-10 (probe = vec 0) by reciprocal-rank fusion " +
      "1/(60+rank) — rank-based, no score calibration across modalities; " +
      "both rankings and the fusion replayed by the oracle, n_lists marks " +
      "docs found by both retrievers",
    (s, dir) => {
      // keyed on a constant derived key, NOT Window.orderBy with no
      // partition: the input is bm25's top-10 frame either way (the
      // upstream orderBy+limit bounds it), but the no-partition form
      // plans as a flagged global window and prints the "No Partition
      // Defined" warning into every bench log. A literal key would be
      // folded back to a global window by EliminateWindowPartitions, so
      // the key is pmod(doc_id, 1) — constant 0, non-foldable: the same
      // 10-row single-partition sort, warning-free and lintable
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(col("doc_id"), lit(1)))
        .orderBy(col("score").desc, col("doc_id"))
      val lex = graft.operators.Retrieval.bm25(t(s, dir, "documents"),
          Seq("key", "table", "hash"), topK = 10)
        .withColumn("rank", row_number().over(w).cast(LongType))
        .select(col("doc_id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val dense = Similarity.topKBruteForce(emb,
          emb.filter(col("vec_id") === 0), k = 10)
        .select(col("nid").as("doc_id"), col("rank"))
      graft.operators.Retrieval.rrfFuse(Seq(lex, dense), topK = 10)
        .orderBy(col("rrf").desc, col("doc_id"))
    },
    Some("""WITH lens AS (SELECT doc_id,
                     CAST(len(list_filter(string_split_regex(text, '\s+'),
                       t -> t <> '')) AS BIGINT) AS dl
                   FROM documents),
            st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens),
            tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
                         FROM documents)
                   WHERE tok IN ('key', 'table', 'hash') GROUP BY doc_id, tok),
            dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
            c AS (SELECT tf.doc_id,
                    ROUND(ln((st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                          * (tf.tf * (1.2 + 1.0))
                          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * lens.dl / st.avgdl)),
                      6) AS c
                  FROM tf JOIN dfreq USING (tok) JOIN lens USING (doc_id) CROSS JOIN st),
            s66 AS (SELECT doc_id,
                      ROUND(CAST(SUM(CAST(c AS DECIMAL(30,6))) AS DOUBLE), 4) AS score
                    FROM c GROUP BY doc_id
                    ORDER BY score DESC, doc_id LIMIT 10),
            lex AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
                    FROM s66),
            p AS (SELECT CAST(embedding AS DOUBLE[]) AS pv FROM embeddings
                  WHERE vec_id = 0),
            v AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS nv
                  FROM embeddings),
            sc AS (SELECT nid, ROUND(list_cosine_similarity(pv, nv), 4) AS sim
                   FROM p CROSS JOIN v WHERE nid <> 0),
            dense AS (SELECT nid AS doc_id,
                        ROW_NUMBER() OVER (ORDER BY sim DESC, nid) AS rank
                      FROM sc QUALIFY rank <= 10),
            u AS (SELECT doc_id, ROUND(1.0/(60+rank), 9) AS rr FROM lex
                  UNION ALL SELECT doc_id, ROUND(1.0/(60+rank), 9) FROM dense)
            SELECT doc_id,
                   ROUND(CAST(SUM(CAST(rr AS DECIMAL(30,9))) AS DOUBLE), 6) AS rrf,
                   CAST(COUNT(*) AS BIGINT) AS n_lists
            FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 10"""))

  val q84 = QueryDef(
    "q84_semantic_ingest_gate",
    "SEMANTIC ingest admission gate — the vector-space member of the " +
      "newContentOnly family: incoming vectors (vec_id ≡ 0 mod 10) whose " +
      "cosine to any corpus vector within their 4 probed IVF cells " +
      "reaches 0.4 are dropped, survivors pass; rounded routing + the " +
      "deterministic quantizer make assignment, routing, candidacy, " +
      "threshold and anti-join all SQL-replayable; cells are COUNT-" +
      "CONDITIONAL (the q111/q255 guard class applied to the pinned-" +
      "cell gate): pinned 16 at gate scales so the oracle replays " +
      "unchanged, derived via scaledCentroids once the corpus exceeds " +
      "16*targetCell vectors - the point where a pinned cell outgrows " +
      "targetCell and candidate volume turns quadratic (measured 68x " +
      "wall at 100x pinned; the semanticDedupAuto production trade)",
    (s, dir) => {
      val v = t(s, dir, "embeddings")
      val corp = v.filter(col("vec_id") % 10 =!= 0)
      val nCent = {
        val n = corp.count()
        if (n <= 16L * 1024L) 16
        else Similarity.scaledCentroids(n, minCentroids = 16, targetCell = 1024)
      }
      Similarity.semanticNewContentOnly(
          incoming = v.filter(col("vec_id") % 10 === 0),
          corpus = corp,
          minCos = 0.4, nCentroids = nCent, nProbe = 4)
        .select(col("vec_id"), col("label"))
        .orderBy("vec_id")
    },
    Some("""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev
                       FROM embeddings),
            corp AS (SELECT vec_id, ev FROM v WHERE vec_id % 10 <> 0),
            inc AS (SELECT vec_id, label, ev FROM v WHERE vec_id % 10 = 0),
            c AS (SELECT vec_id AS cid, ev AS cv FROM corp
                  ORDER BY vec_id LIMIT 16),
            ccs AS (SELECT corp.vec_id, c.cid,
                      ROUND(list_cosine_similarity(corp.ev, c.cv), 6) AS csim
                    FROM corp CROSS JOIN c),
            crk AS (SELECT vec_id, cid,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cid) AS r
                    FROM ccs),
            vc AS (SELECT vec_id AS nid, cid AS cell FROM crk WHERE r = 1),
            ics AS (SELECT inc.vec_id, c.cid,
                      ROUND(list_cosine_similarity(inc.ev, c.cv), 6) AS csim
                    FROM inc CROSS JOIN c),
            irk AS (SELECT vec_id, cid,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cid) AS r
                    FROM ics),
            pc AS (SELECT vec_id AS pid, cid AS pcell FROM irk WHERE r <= 4),
            cand AS (SELECT pc.pid, vc.nid FROM pc
                     JOIN vc ON pc.pcell = vc.cell AND pc.pid <> vc.nid),
            s AS (SELECT cand.pid,
                    ROUND(list_cosine_similarity(p.ev, n.ev), 4) AS sim
                  FROM cand JOIN v p ON p.vec_id = cand.pid
                    JOIN corp n ON n.vec_id = cand.nid),
            hit AS (SELECT DISTINCT pid FROM s WHERE sim >= 0.4)
            SELECT vec_id, label FROM inc
            WHERE vec_id NOT IN (SELECT pid FROM hit)
            ORDER BY vec_id"""))

  val q87 = QueryDef(
    "q87_neardup_containment",
    "asymmetric containment near-dup pairs: C(A→B) = |A∩B|/|A| over 3-gram " +
      "shingle sets, either direction ≥ 0.5 — the quote/subset detector " +
      "Jaccard structurally misses (Broder's resemblance-vs-containment " +
      "distinction); same 8-byte-shingle self-join machinery as q35, the " +
      "measure is a row-local projection so no extra shuffle",
    (s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), minContainment = 0.5)
        .select(col("ia"), col("ib"), col("shared"), col("na"), col("nb"),
          round(col("c_ab"), 4).as("c_ab"), round(col("c_ba"), 4).as("c_ba"))
        .orderBy("ia", "ib"),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              p AS (SELECT a.id AS ia, b.id AS ib, COUNT(*) AS shared
                    FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
              sz AS (SELECT id, CAST(len(sh) AS BIGINT) AS nsh FROM docs)
             SELECT ia, ib, shared, na.nsh AS na, nb.nsh AS nb,
               ROUND(shared * 1.0 / na.nsh, 4) AS c_ab,
               ROUND(shared * 1.0 / nb.nsh, 4) AS c_ba
             FROM p JOIN sz na ON na.id = p.ia JOIN sz nb ON nb.id = p.ib
             WHERE GREATEST(shared * 1.0 / na.nsh, shared * 1.0 / nb.nsh) >= 0.5
             ORDER BY ia, ib"""))

  val q88 = QueryDef(
    "q88_knn_centrality",
    "PageRank centrality over the corpus kNN graph (3 power-iteration " +
      "rounds on the q77 edge set) — the data-selection signal for dense " +
      "semantic regions; per round one src-keyed shuffle join + one " +
      "map-side-combining mass sum over E=n·k edges, never n²; " +
      "DECIMAL(28,14) contribution accumulation + per-round rank rounding " +
      "make the whole iteration replayable in SQL",
    (s, dir) => {
      val edges = Similarity.knnGraph(t(s, dir, "embeddings"), k = 3,
        nCentroids = 16, nProbe = 2).select("pid", "nid")
      graft.operators.Graph.pageRank(edges, rounds = 3).orderBy("node")
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
            c AS (SELECT vec_id AS cid, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
            cs AS (SELECT v.vec_id, c.cid,
                     ROUND(list_cosine_similarity(v.ev, c.cv), 6) AS csim
                   FROM v CROSS JOIN c),
            rk AS (SELECT vec_id, cid,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY csim DESC, cid) AS r
                   FROM cs),
            vc AS (SELECT vec_id AS nid, cid AS cell FROM rk WHERE r = 1),
            pc AS (SELECT vec_id AS pid, cid AS pcell FROM rk WHERE r <= 2),
            cand AS (SELECT pc.pid, vc.nid FROM pc
                     JOIN vc ON pc.pcell = vc.cell AND pc.pid <> vc.nid),
            sc AS (SELECT cand.pid, cand.nid,
                    ROUND(list_cosine_similarity(p.ev, n.ev), 4) AS sim
                  FROM cand JOIN v p ON p.vec_id = cand.pid
                    JOIN v n ON n.vec_id = cand.nid),
            rr AS (SELECT pid, nid, sim,
                    ROW_NUMBER() OVER (PARTITION BY pid
                                       ORDER BY sim DESC, nid) AS rank
                  FROM sc),
            ed AS (SELECT pid AS src, nid AS dst FROM rr WHERE rank <= 3),
            nd AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
            nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nd),
            od AS (SELECT src, COUNT(*) AS outdeg FROM ed GROUP BY src),
            r0 AS (SELECT node,
                     ROUND(CAST(1 AS DOUBLE) / (SELECT n FROM nn), 10) AS rnk
                   FROM nd),
            c1 AS (SELECT e.dst AS node,
                     CAST(r0.rnk / od.outdeg AS DECIMAL(28,14)) AS c
                   FROM ed e JOIN od USING (src) JOIN r0 ON r0.node = e.src),
            s1 AS (SELECT node, SUM(c) AS mass FROM c1 GROUP BY node),
            r1 AS (SELECT nd.node,
                     ROUND((CAST(1 AS DOUBLE) - 0.85) / (SELECT n FROM nn)
                       + CAST(0.85 AS DOUBLE)
                         * COALESCE(CAST(s1.mass AS DOUBLE), 0.0), 10) AS rnk
                   FROM nd LEFT JOIN s1 USING (node)),
            c2 AS (SELECT e.dst AS node,
                     CAST(r1.rnk / od.outdeg AS DECIMAL(28,14)) AS c
                   FROM ed e JOIN od USING (src) JOIN r1 ON r1.node = e.src),
            s2 AS (SELECT node, SUM(c) AS mass FROM c2 GROUP BY node),
            r2 AS (SELECT nd.node,
                     ROUND((CAST(1 AS DOUBLE) - 0.85) / (SELECT n FROM nn)
                       + CAST(0.85 AS DOUBLE)
                         * COALESCE(CAST(s2.mass AS DOUBLE), 0.0), 10) AS rnk
                   FROM nd LEFT JOIN s2 USING (node)),
            c3 AS (SELECT e.dst AS node,
                     CAST(r2.rnk / od.outdeg AS DECIMAL(28,14)) AS c
                   FROM ed e JOIN od USING (src) JOIN r2 ON r2.node = e.src),
            s3 AS (SELECT node, SUM(c) AS mass FROM c3 GROUP BY node),
            r3 AS (SELECT nd.node,
                     ROUND((CAST(1 AS DOUBLE) - 0.85) / (SELECT n FROM nn)
                       + CAST(0.85 AS DOUBLE)
                         * COALESCE(CAST(s3.mass AS DOUBLE), 0.0), 10) AS rnk
                   FROM nd LEFT JOIN s3 USING (node))
            SELECT node, rnk AS rank FROM r3 ORDER BY node"""))

  val q89 = QueryDef(
    "q89_boilerplate_ngrams",
    "corpus boilerplate audit: top-20 3-grams by DOCUMENT frequency " +
      "(C4/Gopher-style boilerplate detection; the removal action is " +
      "removeSpansMatching) — narrow per-doc distinct shingles, ONE " +
      "map-side-combining gram aggregation, TakeOrdered top-k (k rows to " +
      "the driver, never a global sort)",
    (s, dir) =>
      Quality.boilerplateNgrams(t(s, dir, "documents"), n = 3, k = 20),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              g AS (SELECT UNNEST(sh) AS gram FROM docs)
             SELECT gram, COUNT(*) AS df FROM g GROUP BY gram
             ORDER BY df DESC, gram LIMIT 20"""))

  val q90 = QueryDef(
    "q90_embedding_centroid_cos",
    "embedding-space outlier signal: per-vector cosine to its LABEL " +
      "centroid (CLIP-style filtering / mislabel pruning) — components " +
      "quantized to integers so every cross-row sum is exact (no " +
      "accumulation-order sensitivity); cosine is scale-invariant so the " +
      "quantized centroid-SUM vector scores identically to the mean; " +
      "centroid agg moves labels×dim rows, per-vector agg collapses " +
      "map-side to one row per vector",
    (s, dir) =>
      Similarity.labelCentroidCos(
          t(s, dir, "embeddings").withColumn("label", col("label").cast("long")))
        .orderBy("vec_id"),
    Some("""WITH v0 AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                          CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            ex AS (SELECT vec_id, label, i AS pos,
                     CAST(ROUND(e[i] * 1000000) AS BIGINT) AS vq
                   FROM (SELECT vec_id, label, e,
                           unnest(generate_series(1, len(e))) AS i FROM v0)),
            cent AS (SELECT label, pos, CAST(SUM(vq) AS BIGINT) AS cq
                     FROM ex GROUP BY 1, 2),
            cn AS (SELECT label, SUM(CAST(cq AS HUGEINT) * cq) AS nc2
                   FROM cent GROUP BY 1),
            pd AS (SELECT ex.vec_id, ex.label,
                     SUM(CAST(ex.vq AS HUGEINT) * cent.cq) AS dot,
                     SUM(CAST(ex.vq AS HUGEINT) * ex.vq) AS nx2
                   FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
                   GROUP BY 1, 2)
            SELECT pd.vec_id, pd.label,
                   ROUND(CAST(dot AS DOUBLE)
                     / (sqrt(CAST(nx2 AS DOUBLE)) * sqrt(CAST(nc2 AS DOUBLE))), 4)
                     AS cos_centroid
            FROM pd JOIN cn USING (label)
            WHERE nx2 > 0 AND nc2 > 0
            ORDER BY pd.vec_id"""))

  val q91 = QueryDef(
    "q91_source_distribution_drift",
    "per-source distribution drift: KL(source ‖ corpus) over unigram " +
      "token LMs — the corpus-mix monitor (spam influx / scraper " +
      "breakage surfaces here); one (source, token-hash) aggregation is " +
      "the only corpus-touching step, slice totals and the corpus LM " +
      "derive from it; DECIMAL(28,14) contribution accumulation makes " +
      "the statistic order-insensitive and SQL-replayable",
    (s, dir) =>
      Quality.distributionDrift(t(s, dir, "documents")).orderBy("source"),
    Some("""WITH tok AS (SELECT source AS slice,
                           unnest(string_split_regex(text, '\s+')) AS tok
                         FROM documents),
              sf AS (SELECT slice, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
              sn AS (SELECT slice, CAST(SUM(c) AS BIGINT) AS ns FROM sf GROUP BY 1),
              cf AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ct FROM sf GROUP BY 1),
              cn AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt FROM cf)
            SELECT slice AS source,
                   ROUND(CAST(SUM(CAST((c / ns) * ln((c / ns) / (ct / nt))
                     AS DECIMAL(28,14))) AS DOUBLE), 6) AS kl
            FROM sf JOIN cf USING (tok) JOIN sn USING (slice) CROSS JOIN cn
            GROUP BY slice ORDER BY source"""))

  val q92 = QueryDef(
    "q92_cluster_survivors",
    "survivor selection per near-dup cluster — the curation action on " +
      "q49's decision output: keep the BEST-quality member of each " +
      "cluster (score desc, id-tiebroken), not the arbitrary min-id " +
      "canonical; one id join + the k=1 heap operator (map-side trim to " +
      "one row per cluster before the exchange, never a window sort)",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val clusters = Dedup.dedupClusters(d, minJaccard = 0.4)
      val scored = d.select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"))
      Dedup.clusterSurvivors(clusters, scored).orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              p AS (SELECT a.id AS ia, b.id AS ib, COUNT(*) AS shared
                    FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
              sz AS (SELECT id, CAST(len(sh) AS BIGINT) AS nsh FROM docs),
              pr AS (SELECT ia, ib
                     FROM p JOIN sz na ON na.id = p.ia JOIN sz nb ON nb.id = p.ib
                     WHERE shared * 1.0 / (na.nsh + nb.nsh - shared) >= 0.4),
              ed AS (SELECT ia AS u, ib AS v FROM pr
                     UNION ALL SELECT ib, ia FROM pr),
              reach(src, dst) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.src, ed.v FROM reach JOIN ed ON reach.dst = ed.u),
              cl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
                     FROM reach GROUP BY src),
              x AS (SELECT doc_id, text,
                      CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS nt,
                      CAST(len(list_filter(string_split_regex(text, '\\s+'),
                        t -> list_contains(['the','a','an','and','of','to','in','is','on','for'], t)))
                        AS BIGINT) AS hits
                    FROM documents),
              qs AS (SELECT doc_id,
                       CAST(ROUND(CAST(LEAST(nt / 50.0, 1.0) * 0.5
                         + (1.0 - ABS(hits * 1.0 / nt - 0.4)) * 0.3
                         + LEAST(((length(text) - (nt - 1)) * 1.0 / nt) / 8.0, 1.0) * 0.2
                         AS DECIMAL(28,14)), 4) AS DOUBLE) AS quality
                     FROM x),
              j AS (SELECT cl.cluster_id, cl.doc_id, qs.quality,
                      row_number() OVER (PARTITION BY cl.cluster_id
                                         ORDER BY qs.quality DESC, cl.doc_id) AS rn
                    FROM cl JOIN qs USING (doc_id))
            SELECT cluster_id, doc_id, quality FROM j WHERE rn = 1
            ORDER BY cluster_id"""))

  val q93 = QueryDef(
    "q93_drift_against_reference",
    "distribution drift of an incoming slice vs a FIXED reference LM " +
      "(the recrawl-audit / streaming-monitor form of q91): docs id%5==0 " +
      "stream in, the id%5<>0 corpus is touched only through its " +
      "precomputable (token-hash, count) LM frame plus two scalar stats; " +
      "q is add-one smoothed over the reference vocabulary so unseen " +
      "tokens contribute large-but-finite drift",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val lm = Quality.unigramLm(d.filter(col("doc_id") % 5 =!= 0))
      Quality.distributionDriftAgainst(d.filter(col("doc_id") % 5 === 0), lm)
        .orderBy("source")
    },
    Some("""WITH rt AS (SELECT unnest(string_split_regex(text, '\s+')) AS tok
                        FROM documents WHERE doc_id % 5 <> 0),
              lm AS (SELECT tok, COUNT(*) AS ct FROM rt GROUP BY 1),
              st AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
                            CAST(COUNT(*) AS BIGINT) AS vsz FROM lm),
              inc AS (SELECT source AS slice,
                             unnest(string_split_regex(text, '\s+')) AS tok
                      FROM documents WHERE doc_id % 5 = 0),
              sf AS (SELECT slice, tok, COUNT(*) AS c FROM inc GROUP BY 1, 2),
              sn AS (SELECT slice, CAST(SUM(c) AS BIGINT) AS ns FROM sf GROUP BY 1)
            SELECT slice AS source,
                   ROUND(CAST(SUM(CAST((c / ns) * ln((c / ns)
                     / ((COALESCE(ct, 0) + 1) / (nt + vsz)))
                     AS DECIMAL(28,14))) AS DOUBLE), 6) AS kl
            FROM sf LEFT JOIN lm USING (tok) JOIN sn USING (slice) CROSS JOIN st
            GROUP BY slice ORDER BY source"""))

  val q94 = QueryDef(
    "q94_dedup_capped_copies",
    "SOFT exact dedup: keep up to 2 id-ordered copies per identical-" +
      "content group (the data-constrained-scaling policy — capped " +
      "repetition beats full dedup when tokens are scarce); digest " +
      "currency map-side, then the heap operator trims every partition " +
      "to <= k rows per sha BEFORE the exchange — the window idiom would " +
      "shuffle every copy of every hot boilerplate duplicate",
    (s, dir) =>
      Dedup.exactCapped(t(s, dir, "documents"), maxCopies = 2)
        .orderBy("text_sha", "copy_rank"),
    Some("""SELECT text_sha, doc_id, CAST(copy_rank AS BIGINT) AS copy_rank
            FROM (SELECT sha256(text) AS text_sha, doc_id,
                    row_number() OVER (PARTITION BY sha256(text)
                                       ORDER BY doc_id) AS copy_rank
                  FROM documents)
            WHERE copy_rank <= 2 ORDER BY text_sha, copy_rank"""))

  val q95 = QueryDef(
    "q95_remove_contained",
    "subset pruning — the curation action on q87's containment measure: " +
      "drop every doc near-contained (C >= 0.5) in a LARGER doc, keep the " +
      "superset; smaller shingle set condemned, equal sizes fall back to " +
      "min-id keep; corpus anti-joined against the condemned id set " +
      "((id,id) currency, text never shuffles)",
    (s, dir) =>
      Dedup.removeContained(t(s, dir, "documents"), minContainment = 0.5)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id"),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              p AS (SELECT a.id AS ia, b.id AS ib, COUNT(*) AS shared
                    FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
              sz AS (SELECT id, CAST(len(sh) AS BIGINT) AS nsh FROM docs),
              m AS (SELECT ia, ib, shared, na.nsh AS na, nb.nsh AS nb
                    FROM p JOIN sz na ON na.id = p.ia JOIN sz nb ON nb.id = p.ib),
              cond AS (
                SELECT ia AS cid FROM m
                WHERE shared * 1.0 / na >= 0.5
                  AND (na < nb OR (na = nb AND ib < ia))
                UNION
                SELECT ib FROM m
                WHERE shared * 1.0 / nb >= 0.5
                  AND (nb < na OR (na = nb AND ia < ib)))
            SELECT doc_id, lang, source FROM documents
            WHERE doc_id NOT IN (SELECT cid FROM cond)
            ORDER BY doc_id"""))

  val q96 = QueryDef(
    "q96_quality_bigram_surprisal",
    "bigram-LM perplexity filter (CCNet family, one model up from q61's " +
      "unigram): per-doc mean -ln P(w2|w1) under the add-one-smoothed " +
      "corpus bigram LM — garbled text built from common words passes a " +
      "unigram filter and spikes here; ONE (h1,h2) pair aggregation " +
      "touches the corpus, context counts and vocabulary derive from it; " +
      "DECIMAL(28,14) contribution accumulation replays in SQL",
    (s, dir) =>
      Quality.bigramSurprisal(t(s, dir, "documents")).orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id AS id,
                         string_split_regex(text, '\s+') AS toks
                       FROM documents),
              bi AS (SELECT id, toks[i] AS w1, toks[i + 1] AS w2
                     FROM (SELECT id, toks,
                             unnest(generate_series(1, len(toks) - 1)) AS i
                           FROM t)),
              bf AS (SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY 1, 2),
              uf AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu FROM bf GROUP BY 1),
              vocab AS (SELECT COUNT(DISTINCT w) AS v FROM
                          (SELECT w1 AS w FROM bf UNION SELECT w2 FROM bf)),
              sc AS (SELECT bi.id,
                       CAST(-ln((bf.cb + 1.0) / (uf.cu + (SELECT v FROM vocab)))
                         AS DECIMAL(28,14)) AS s
                     FROM bi JOIN bf USING (w1, w2) JOIN uf USING (w1))
            SELECT id AS doc_id, COUNT(*) AS n_bigrams,
                   ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 4) AS bigram_surprisal
            FROM sc GROUP BY 1 ORDER BY doc_id"""))

  val q97 = QueryDef(
    "q97_winnowing_overlap",
    "winnowing fingerprint overlap (Schleimer et al. SIGMOD 2003, the " +
      "MOSS detector): window-min over consecutive 3-gram poly-hashes, " +
      "pairs sharing a fingerprint with the shared count — the LOCALITY " +
      "guarantee MinHash lacks (any shared run of >= w+n-1 tokens " +
      "surfaces); all narrow until the fp-keyed 8-byte self-join",
    (s, dir) =>
      Dedup.winnowingPairs(t(s, dir, "documents"), n = 3, w = 4)
        .orderBy("ia", "ib"),
    Some("""WITH t AS (SELECT doc_id AS id,
                         string_split_regex(text, '\s+') AS tk FROM documents),
              sh AS (SELECT id, [array_to_string(tk[i:i+2], ' ')
                                 for i in generate_series(1, len(tk) - 2)] AS sh
                     FROM t WHERE len(tk) >= 3),
              g AS (SELECT id, list_transform(sh, s -> list_reduce(
                      list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(s, ''),
                          c -> CAST(ascii(c) AS BIGINT))),
                      (h, v) -> (h * 31 + v) % 1000000007)) AS g
                    FROM sh),
              fp AS (SELECT id, UNNEST(list_distinct(
                       CASE WHEN len(g) >= 4
                            THEN [list_min(g[i:i+3])
                                  for i in generate_series(1, len(g) - 3)]
                            ELSE [list_min(g)] END)) AS fp
                     FROM g WHERE len(g) > 0)
            SELECT a.id AS ia, b.id AS ib, COUNT(*) AS shared
            FROM fp a JOIN fp b ON a.fp = b.fp AND a.id < b.id
            GROUP BY 1, 2 ORDER BY ia, ib"""))

  val q98 = QueryDef(
    "q98_leakage_safe_split",
    "leakage-safe train/val/test split: assignment keyed by the near-dup " +
      "CLUSTER label (q49's connected components), not the row id — " +
      "near-identical docs can never straddle train and eval (the " +
      "overlap the decontamination family scrubs after the fact, " +
      "prevented at assignment); one id-keyed (id,label) join + the " +
      "engine-portable bucket projection",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val clusters = Dedup.dedupClusters(d, minJaccard = 0.4)
      Sampling.splitByGroup(d, clusters,
          splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), salt = "v1")
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              p AS (SELECT a.id AS ia, b.id AS ib, COUNT(*) AS shared
                    FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
              sz AS (SELECT id, CAST(len(sh) AS BIGINT) AS nsh FROM docs),
              pr AS (SELECT ia, ib
                     FROM p JOIN sz na ON na.id = p.ia JOIN sz nb ON nb.id = p.ib
                     WHERE shared * 1.0 / (na.nsh + nb.nsh - shared) >= 0.4),
              ed AS (SELECT ia AS u, ib AS v FROM pr
                     UNION ALL SELECT ib, ia FROM pr),
              reach(src, dst) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.src, ed.v FROM reach JOIN ed ON reach.dst = ed.u),
              cl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
                     FROM reach GROUP BY src),
              raw AS (
                SELECT doc_id,
                  list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(
                      string_split(CAST(cluster_id AS VARCHAR) || 'v1', ''),
                      c -> CAST(ascii(c) AS BIGINT))),
                    (a, v) -> (a * 31 + v) % 1000000007) AS hs
                FROM cl),
              b AS (SELECT doc_id,
                      ((hs + 479001599) * (hs + 987654323)) % 1000000007
                        % 10000 AS bs
                    FROM raw)
            SELECT doc_id,
              CASE WHEN bs < 8000 THEN 'train'
                   WHEN bs < 9000 THEN 'val'
                   ELSE 'test' END AS split
            FROM b ORDER BY doc_id"""))

  val q99 = QueryDef(
    "q99_random_projection",
    "JL random projection (Achlioptas PODS 2001, database-friendly ±1 " +
      "signs): 64-d embeddings to 16-d — the ANN front end that quarters " +
      "every downstream distance; quantized components + bucket-parity " +
      "sign matrix make the projection EXACT integer arithmetic, " +
      "hash-gated end to end; model-sized sign matrix broadcast, " +
      "n*outDim rows cross the exchange",
    (s, dir) =>
      Similarity.randomProjection(t(s, dir, "embeddings"), salt = "v1")
        .orderBy("vec_id", "j"),
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings),
              ex AS (SELECT vec_id, i - 1 AS i,
                       CAST(ROUND(e[i] * 1000000) AS BIGINT) AS vq
                     FROM (SELECT vec_id, e,
                             unnest(generate_series(1, len(e))) AS i FROM v)),
              dims AS (SELECT MAX(len(e)) AS d FROM v),
              sj AS (SELECT ii.i, jj.j FROM
                       (SELECT unnest(generate_series(0,
                          (SELECT d FROM dims) - 1)) AS i) ii
                     CROSS JOIN
                       (SELECT unnest(generate_series(0, 15)) AS j) jj),
              sg AS (SELECT i, j,
                       CASE WHEN ((h + 479001599) * (h + 987654323))
                              % 1000000007 % 10000 % 2 = 0
                            THEN 1 ELSE -1 END AS s
                     FROM (SELECT i, j,
                             list_reduce(list_prepend(CAST(0 AS BIGINT),
                               list_transform(string_split(
                                 CAST(i AS VARCHAR) || ':' ||
                                   CAST(j AS VARCHAR) || 'v1', ''),
                                 c -> CAST(ascii(c) AS BIGINT))),
                               (a, x) -> (a * 31 + x) % 1000000007) AS h
                           FROM sj))
            SELECT ex.vec_id, sg.j, CAST(SUM(ex.vq * sg.s) AS BIGINT) AS proj
            FROM ex JOIN sg ON ex.i = sg.i
            GROUP BY 1, 2 ORDER BY vec_id, j"""))

  val q100 = QueryDef(
    "q100_profile_columns",
    "data-quality profiling (the unit-tests-for-data gate a pipeline " +
      "runs before training on a new drop): per-column completeness, " +
      "exact cardinality, min/max in ONE aggregation pass over the " +
      "table; constraint verdicts (Profile.check) join these " +
      "measurements against a constraints-sized literal frame",
    (s, dir) =>
      graft.operators.Profile.profile(
          t(s, dir, "documents"), Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy("column"),
    Some("""WITH r AS (SELECT COUNT(*) AS n FROM documents)
            SELECT * FROM (
              SELECT 'doc_id' AS "column", (SELECT n FROM r) AS n_rows,
                     COUNT(doc_id) AS n_nonnull,
                     ROUND(COUNT(doc_id) * 1.0 / (SELECT n FROM r), 4) AS completeness,
                     COUNT(DISTINCT doc_id) AS n_distinct,
                     CAST(MIN(doc_id) AS VARCHAR) AS min_value,
                     CAST(MAX(doc_id) AS VARCHAR) AS max_value
              FROM documents
              UNION ALL
              SELECT 'lang', (SELECT n FROM r), COUNT(lang),
                     ROUND(COUNT(lang) * 1.0 / (SELECT n FROM r), 4),
                     COUNT(DISTINCT lang),
                     CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
              FROM documents
              UNION ALL
              SELECT 'source', (SELECT n FROM r), COUNT(source),
                     ROUND(COUNT(source) * 1.0 / (SELECT n FROM r), 4),
                     COUNT(DISTINCT source),
                     CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
              FROM documents
              UNION ALL
              SELECT 'n_chars', (SELECT n FROM r), COUNT(n_chars),
                     ROUND(COUNT(n_chars) * 1.0 / (SELECT n FROM r), 4),
                     COUNT(DISTINCT n_chars),
                     CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
              FROM documents)
            ORDER BY "column""""))

  val q101 = QueryDef(
    "q101_overlap_ingest_gate",
    "ingest-time LOCAL-overlap gate: incoming docs sharing a winnowing " +
      "fingerprint with the landed corpus (quote/copy-paste admission " +
      "check — surfaces a >= w+n-1 token quote even at near-zero " +
      "whole-doc Jaccard, the case q81's MinHash gate structurally " +
      "misses); corpus fingerprints precomputable, one fp-keyed 8-byte " +
      "join; incoming = doc_id ≡ 0 (mod 5), corpus = rest",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.overlapAgainst(
          corpus = d.filter(col("doc_id") % 5 =!= 0),
          incoming = d.filter(col("doc_id") % 5 === 0))
        .orderBy("in_id", "corpus_id")
    },
    Some("""WITH t AS (SELECT doc_id AS id,
                         string_split_regex(text, '\s+') AS tk FROM documents),
              sh AS (SELECT id, [array_to_string(tk[i:i+2], ' ')
                                 for i in generate_series(1, len(tk) - 2)] AS sh
                     FROM t WHERE len(tk) >= 3),
              g AS (SELECT id, list_transform(sh, s -> list_reduce(
                      list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(s, ''),
                          c -> CAST(ascii(c) AS BIGINT))),
                      (h, v) -> (h * 31 + v) % 1000000007)) AS g
                    FROM sh),
              fp AS (SELECT id, UNNEST(list_distinct(
                       CASE WHEN len(g) >= 4
                            THEN [list_min(g[i:i+3])
                                  for i in generate_series(1, len(g) - 3)]
                            ELSE [list_min(g)] END)) AS fp
                     FROM g WHERE len(g) > 0)
            SELECT a.id AS in_id, b.id AS corpus_id, COUNT(*) AS shared
            FROM fp a JOIN fp b ON a.fp = b.fp
            WHERE a.id % 5 = 0 AND b.id % 5 <> 0
            GROUP BY 1, 2 ORDER BY in_id, corpus_id"""))

  val q102 = QueryDef(
    "q102_mixture_epoch_plan",
    "relational mixture/epoch plan (the artifact a run is configured " +
      "from): per-source token mass, temperature share (mass^0.5), " +
      "target under a 200k budget, planned capped at 3 epochs (the " +
      "data-constrained regime), shortfall surfaced not redistributed; " +
      "ONE corpus aggregation, then strata-sized decimal arithmetic",
    (s, dir) =>
      Sampling.mixturePlan(t(s, dir, "documents"), "source",
          TextOps.tokenCount(col("text")), alpha = 0.5,
          budget = 200000L, maxEpochs = 3.0)
        .orderBy("source"),
    Some("""WITH m AS (SELECT source,
                         CAST(SUM(len(string_split_regex(text, '\s+')))
                           AS BIGINT) AS ta
                       FROM documents GROUP BY 1),
              p AS (SELECT source, ta,
                      CAST(pow(ta, 0.5) AS DECIMAL(28,14)) AS pw FROM m),
              z AS (SELECT SUM(pw) AS z FROM p),
              tgt AS (SELECT source, ta,
                        ROUND(CAST(pw / z AS DOUBLE), 6) AS share,
                        CAST(ROUND(CAST(pw / z AS DOUBLE) * 200000) AS BIGINT)
                          AS target_tokens
                      FROM p CROSS JOIN z),
              pl AS (SELECT source, ta, share, target_tokens,
                       LEAST(target_tokens,
                             CAST(ROUND(ta * 3.0) AS BIGINT)) AS planned_tokens
                     FROM tgt)
            SELECT source, ta AS tokens_available, share, target_tokens,
                   planned_tokens,
                   ROUND(planned_tokens * 1.0 / ta, 4) AS epochs,
                   target_tokens - planned_tokens AS shortfall
            FROM pl ORDER BY source"""))

  val q103 = QueryDef(
    "q103_materialize_epochs",
    "materialized epoch plan — q102's plan table turned into the actual " +
      "repeated corpus: floor(epochs) whole copies per doc + a " +
      "hash-gated extra copy for the fractional epoch; one broadcast " +
      "join against the strata-sized plan, then a narrow per-row " +
      "explode — the corpus is read once and amplified in place",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val plan = Sampling.mixturePlan(d, "source",
        TextOps.tokenCount(col("text")), alpha = 0.5,
        budget = 200000L, maxEpochs = 3.0)
      Sampling.materializeEpochs(d, plan, salt = "e1")
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy("doc_id", "epoch")
    },
    Some("""WITH m AS (SELECT source,
                         CAST(SUM(len(string_split_regex(text, '\s+')))
                           AS BIGINT) AS ta
                       FROM documents GROUP BY 1),
              p AS (SELECT source, ta,
                      CAST(pow(ta, 0.5) AS DECIMAL(28,14)) AS pw FROM m),
              z AS (SELECT SUM(pw) AS z FROM p),
              pl AS (SELECT source, ta,
                       LEAST(CAST(ROUND(CAST(pw / z AS DOUBLE) * 200000)
                               AS BIGINT),
                             CAST(ROUND(ta * 3.0) AS BIGINT)) AS planned
                     FROM p CROSS JOIN z),
              ep AS (SELECT source,
                       ROUND(planned * 1.0 / ta, 4) AS epochs FROM pl),
              b0 AS (SELECT doc_id, source,
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(
                           string_split(CAST(doc_id AS VARCHAR) || 'e1', ''),
                           c -> CAST(ascii(c) AS BIGINT))),
                         (a, v) -> (a * 31 + v) % 1000000007) AS h
                     FROM documents),
              b AS (SELECT doc_id, b0.source, epochs,
                      ((h + 479001599) * (h + 987654323))
                        % 1000000007 % 10000 AS bk
                    FROM b0 JOIN ep ON b0.source = ep.source),
              cp AS (SELECT doc_id, source,
                       CAST(FLOOR(epochs) AS BIGINT)
                         + CASE WHEN bk < ROUND((epochs - FLOOR(epochs)) * 10000)
                                THEN 1 ELSE 0 END AS copies
                     FROM b)
            SELECT doc_id, source, UNNEST(generate_series(1, copies)) AS epoch
            FROM cp WHERE copies >= 1
            ORDER BY doc_id, epoch"""))

  val q104 = QueryDef(
    "q104_token_entropy",
    "per-doc token entropy (-sum p ln p over the doc's own distribution) " +
      "+ length-normalized form — the information-density quality axis " +
      "(TTR counts repeats, entropy weighs them); one (doc, token-hash) " +
      "map-side-combining aggregation, DECIMAL(28,14) contribution " +
      "accumulation replays in SQL",
    (s, dir) =>
      Quality.tokenEntropy(t(s, dir, "documents")).orderBy("doc_id"),
    Some("""WITH tok AS (SELECT doc_id,
                           unnest(string_split_regex(text, '\s+')) AS tok
                         FROM documents),
              tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
              n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens
                    FROM tf GROUP BY 1),
              e AS (SELECT tf.doc_id, n.n_tokens,
                      CAST(-(c * 1.0 / n_tokens) * ln(c * 1.0 / n_tokens)
                        AS DECIMAL(28,14)) AS e
                    FROM tf JOIN n USING (doc_id)),
              s AS (SELECT doc_id, n_tokens,
                      ROUND(CAST(SUM(e) AS DOUBLE), 4) AS entropy
                    FROM e GROUP BY 1, 2)
            SELECT doc_id, n_tokens, entropy,
                   CASE WHEN n_tokens > 1
                        THEN ROUND(entropy / ln(n_tokens), 4)
                        ELSE 0.0 END AS norm_entropy
            FROM s ORDER BY doc_id"""))

  val q105 = QueryDef(
    "q105_profile_top_values",
    "per-column heavy hitters (the pre-join skew audit + enum-drift " +
      "eye): top-5 values of lang/source/n_chars by frequency — one " +
      "stack-explode pass, one (column,value) aggregation, heap-operator " +
      "trim to k per column before the exchange",
    (s, dir) =>
      graft.operators.Profile.topValues(
          t(s, dir, "documents"), Seq("lang", "source", "n_chars"), k = 5)
        .orderBy(col("column"), col("rank")),
    Some("""WITH v AS (
              SELECT 'lang' AS "column", CAST(lang AS VARCHAR) AS value
              FROM documents WHERE lang IS NOT NULL
              UNION ALL
              SELECT 'source', CAST(source AS VARCHAR)
              FROM documents WHERE source IS NOT NULL
              UNION ALL
              SELECT 'n_chars', CAST(n_chars AS VARCHAR)
              FROM documents WHERE n_chars IS NOT NULL),
            c AS (SELECT "column", value, COUNT(*) AS n
                  FROM v GROUP BY 1, 2),
            r AS (SELECT "column", value, n,
                    ROW_NUMBER() OVER (PARTITION BY "column"
                                       ORDER BY n DESC, value) AS rank
                  FROM c)
            SELECT "column", value, n, rank FROM r WHERE rank <= 5
            ORDER BY "column", rank"""))

  // Shared pixel-model CTEs for the real-codec queries (q106/q137): the
  // rendered 32×32 gray image cycles the doc's bytes, so the DECODED
  // pixel (PNG is lossless) at index i is ord(text[(i mod len)+1]) on the
  // ASCII corpus contract — block sums, the 64-bit aHash and its 4×16-bit
  // bands all replay in exact integer SQL.
  private val ORACLE_AHASH_SIG =
    """px AS (SELECT doc_id, g.i AS i,
                CASE WHEN len(text) > 0
                  THEN ord(substr(text, CAST(g.i % len(text) AS INT) + 1, 1))
                  ELSE 0 END AS p
              FROM documents, generate_series(0, 1023) AS g(i)),
       blk AS (SELECT doc_id,
                 (i // 32 // 4) * 8 + (i % 32) // 4 AS b,
                 CAST(SUM(p) AS BIGINT) AS s
               FROM px GROUP BY 1, 2),
       tot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS ts FROM blk GROUP BY 1),
       bands AS (SELECT blk.doc_id, CAST(b // 16 AS INT) AS band,
                   CAST(SUM(CASE WHEN s * 64 > ts
                     THEN (CAST(1 AS BIGINT) << CAST(b % 16 AS INT))
                     ELSE 0 END) AS BIGINT) AS bk
                 FROM blk JOIN tot ON blk.doc_id = tot.doc_id
                 GROUP BY 1, 2),
       sig AS (SELECT bands.doc_id,
                 MAX(CASE WHEN band = 0 THEN bk END) AS b0,
                 MAX(CASE WHEN band = 1 THEN bk END) AS b1,
                 MAX(CASE WHEN band = 2 THEN bk END) AS b2,
                 MAX(CASE WHEN band = 3 THEN bk END) AS b3
               FROM bands GROUP BY 1)"""

  val q106 = QueryDef(
    "q106_multimodal_neardup",
    "multimodal near-dup on REAL decoded features, full corpus (the " +
      "round-10 bounded-probe gate is gone): every document renders as " +
      "a genuine 32x32 grayscale PNG (JDK encoder), javax.imageio " +
      "decodes it back, the 8x8 block-mean aHash comes off the decoded " +
      "luminance (integer-exact: bit = blockSum*64 > totalSum), LSH on " +
      "the 4 16-bit bands generates candidates, exact 64-bit hamming " +
      "verifies. PNG losslessness is what makes a real codec roundtrip " +
      "SQL-replayable: the oracle recomputes the pixels from the byte " +
      "pattern and replays block/bit/band/candidate/hamming exactly, " +
      "including the default maxBandDf=256 hot-bucket guard (r15: the " +
      "count-conditional rule is now ON by default, bounding the " +
      "band self-join at cap^2 per bucket instead of birthday-quadratic)",
    (s, dir) =>
      Multimodal.aHashNearDupPairs(
          Multimodal.imageAHash(
            Multimodal.renderGrayPng(
              t(s, dir, "documents")
                .select(col("doc_id").as("media_id"),
                  col("text").cast("binary").as("payload")))).toDF(),
          maxHamming = 6)
        .orderBy("ia", "ib"),
    Some(s"""WITH $ORACLE_AHASH_SIG,
              calm AS (SELECT band, bk FROM bands GROUP BY 1, 2
                       HAVING COUNT(*) <= 256),
              cb AS (SELECT bands.doc_id, bands.band, bands.bk
                     FROM bands JOIN calm USING (band, bk)),
              cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                       FROM cb a JOIN cb b
                         ON a.band = b.band AND a.bk = b.bk
                        AND a.doc_id < b.doc_id),
              v AS (SELECT cand.ia, cand.ib,
                      bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1)) +
                      bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
                        AS hamming
                    FROM cand JOIN sig sa ON sa.doc_id = cand.ia
                              JOIN sig sb ON sb.doc_id = cand.ib)
            SELECT ia, ib, CAST(hamming AS BIGINT) AS hamming
            FROM v WHERE hamming <= 6 ORDER BY ia, ib"""))

  val q137 = QueryDef(
    "q137_image_codec_ahash",
    "the per-image half of q106's codec gate: every document's rendered " +
      "PNG decoded by javax.imageio back to luminance, 8x8 block sums, " +
      "total, and the 4 aHash bands — one row per image, linear; a " +
      "single flipped pixel anywhere in the encode->decode roundtrip " +
      "flips a block sum and breaks the hash match",
    (s, dir) =>
      Multimodal.imageAHash(
          Multimodal.renderGrayPng(
            t(s, dir, "documents")
              .select(col("doc_id").as("media_id"),
                col("text").cast("binary").as("payload")))).toDF()
        .select(col("media_id").as("doc_id"), col("total").as("total_lum"),
          col("band0"), col("band1"), col("band2"), col("band3"))
        .orderBy("doc_id"),
    Some(s"""WITH $ORACLE_AHASH_SIG
            SELECT sig.doc_id AS doc_id, tot.ts AS total_lum,
              b0 AS band0, b1 AS band1, b2 AS band2, b3 AS band3
            FROM sig JOIN tot ON sig.doc_id = tot.doc_id
            ORDER BY sig.doc_id"""))

  val q138 = QueryDef(
    "q138_video_framehash_neardup",
    "video near-dup by per-frame perceptual hash vote over REAL multi-" +
      "frame media (r14, closing the L4 frame-extraction stub): 4 " +
      "aligned 64-byte slices per document become the frames of a " +
      "genuine ANIMATED GIF (256-gray palette, javax.imageio multi-" +
      "frame writer), the GIF is decoded back frame-by-frame through " +
      "the JDK reader, each frame re-encodes to PNG and decodes into " +
      "the integer-exact aHash, LSH on (frame, band, key), pairs where " +
      ">= 3 aligned frames agree within hamming 6 — the standard frame-" +
      "vote video dedup shape with a real multi-frame container codec " +
      "genuinely in the loop both directions; GIF LZW is lossless over " +
      "palette indices, so the oracle replays slice/pixel/block/bit/" +
      "band/vote in exact integer SQL unchanged — including the default " +
      "maxBandDf=256 guard on the frame-aligned (fidx, band, key) " +
      "buckets (r15 count-conditional default)",
    (s, dir) =>
      Multimodal.videoNearDupPairsGif(
          Multimodal.renderAnimatedGif(
            t(s, dir, "documents")
              .select(col("doc_id").as("media_id"),
                col("text").cast("binary").as("payload")),
            nFrames = 4, frameBytes = 64))
        .orderBy("ia", "ib"),
    Some("""WITH fr AS (SELECT doc_id, f.f AS fidx,
                   substr(text, CAST(f.f * 64 AS INT) + 1, 64) AS fs
                 FROM documents, generate_series(0, 3) AS f(f)),
             nfr AS (SELECT doc_id, fidx, fs FROM fr WHERE len(fs) > 0),
             px AS (SELECT doc_id, fidx, g.i AS i,
                      ord(substr(fs, CAST(g.i % len(fs) AS INT) + 1, 1)) AS p
                    FROM nfr, generate_series(0, 1023) AS g(i)),
             blk AS (SELECT doc_id, fidx,
                       (i // 32 // 4) * 8 + (i % 32) // 4 AS b,
                       CAST(SUM(p) AS BIGINT) AS s
                     FROM px GROUP BY 1, 2, 3),
             tot AS (SELECT doc_id, fidx, CAST(SUM(s) AS BIGINT) AS ts
                     FROM blk GROUP BY 1, 2),
             bands AS (SELECT blk.doc_id, blk.fidx, CAST(b // 16 AS INT) AS band,
                         CAST(SUM(CASE WHEN s * 64 > ts
                           THEN (CAST(1 AS BIGINT) << CAST(b % 16 AS INT))
                           ELSE 0 END) AS BIGINT) AS bk
                       FROM blk JOIN tot
                         ON blk.doc_id = tot.doc_id AND blk.fidx = tot.fidx
                       GROUP BY 1, 2, 3),
             sig AS (SELECT bands.doc_id, bands.fidx,
                       MAX(CASE WHEN band = 0 THEN bk END) AS b0,
                       MAX(CASE WHEN band = 1 THEN bk END) AS b1,
                       MAX(CASE WHEN band = 2 THEN bk END) AS b2,
                       MAX(CASE WHEN band = 3 THEN bk END) AS b3
                     FROM bands GROUP BY 1, 2),
             calm AS (SELECT fidx, band, bk FROM bands GROUP BY 1, 2, 3
                      HAVING COUNT(*) <= 256),
             cb AS (SELECT bands.doc_id, bands.fidx, bands.band, bands.bk
                    FROM bands JOIN calm USING (fidx, band, bk)),
             cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                      FROM cb a JOIN cb b
                        ON a.fidx = b.fidx AND a.band = b.band AND a.bk = b.bk
                       AND a.doc_id < b.doc_id),
             pf AS (SELECT cand.ia, cand.ib,
                      CASE WHEN
                        bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1)) +
                        bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
                        <= 6 THEN 1 ELSE 0 END AS m
                    FROM cand
                    JOIN sig sa ON sa.doc_id = cand.ia
                    JOIN sig sb ON sb.doc_id = cand.ib AND sb.fidx = sa.fidx),
             v AS (SELECT ia, ib, CAST(SUM(m) AS BIGINT) AS matched_frames
                   FROM pf GROUP BY 1, 2)
            SELECT ia, ib, matched_frames FROM v
            WHERE matched_frames >= 3 ORDER BY ia, ib"""))

  val q139 = QueryDef(
    "q139_audio_codec_ahash",
    "the audio member of the codec-gate family (q137 images, q138 " +
      "video): every document rendered as a REAL 8-bit PCM mono WAV " +
      "(JDK javax.sound encoder), AudioSystem decodes the container " +
      "back to samples, 64-window energy sums + the integer-exact " +
      "threshold bits as 4x16-bit bands — PCM losslessness makes the " +
      "audio codec roundtrip SQL-replayable exactly as PNG does for " +
      "images; one row per document, linear",
    (s, dir) =>
      Multimodal.audioAHash(
          Multimodal.renderPcmWav(
            t(s, dir, "documents")
              .select(col("doc_id").as("media_id"),
                col("text").cast("binary").as("payload")))).toDF()
        .select(col("media_id").as("doc_id"),
          col("n_samples").cast(LongType).as("n_samples"),
          col("total").as("total_energy"),
          col("band0"), col("band1"), col("band2"), col("band3"))
        .orderBy("doc_id"),
    Some("""WITH px AS (SELECT doc_id, g.i AS i,
                 CASE WHEN len(text) > 0
                   THEN ord(substr(text, CAST(g.i % len(text) AS INT) + 1, 1))
                   ELSE 0 END AS p
               FROM documents, generate_series(0, 1023) AS g(i)),
             w AS (SELECT doc_id, i // 16 AS b, CAST(SUM(p) AS BIGINT) AS s
                   FROM px GROUP BY 1, 2),
             tot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS ts FROM w GROUP BY 1),
             bands AS (SELECT w.doc_id, CAST(b // 16 AS INT) AS band,
                         CAST(SUM(CASE WHEN s * 64 > ts
                           THEN (CAST(1 AS BIGINT) << CAST(b % 16 AS INT))
                           ELSE 0 END) AS BIGINT) AS bk
                       FROM w JOIN tot ON w.doc_id = tot.doc_id
                       GROUP BY 1, 2),
             sig AS (SELECT bands.doc_id,
                       MAX(CASE WHEN band = 0 THEN bk END) AS b0,
                       MAX(CASE WHEN band = 1 THEN bk END) AS b1,
                       MAX(CASE WHEN band = 2 THEN bk END) AS b2,
                       MAX(CASE WHEN band = 3 THEN bk END) AS b3
                     FROM bands GROUP BY 1)
            SELECT sig.doc_id AS doc_id, CAST(1024 AS BIGINT) AS n_samples,
              tot.ts AS total_energy,
              b0 AS band0, b1 AS band1, b2 AS band2, b3 AS band3
            FROM sig JOIN tot ON sig.doc_id = tot.doc_id
            ORDER BY sig.doc_id"""))

  val q140 = QueryDef(
    "q140_multimodal_crossmodal_dedup",
    "cross-modal dedup corroboration — the multimodal capstone (the " +
      "q110 composition pattern over the codec family): a document " +
      "pair is a HIGH-CONFIDENCE media dup only when >= 2 independent " +
      "modality pipelines agree — whole-image aHash, frame-vote video, " +
      "audio energy hash — each run LOOSE (hamming <= 16 of 64; >= 2 " +
      "frame votes) so the strictness lives in the JOINT agreement, " +
      "not any single signal: the corroboration gate a pipeline runs " +
      "before destructive removal; one codec pass per modality, pair " +
      "sets union as 16-byte currency, sorted modality audit string; " +
      "all three modality LSH passes run the default maxBandDf=256 " +
      "guard, replayed per-modality in the oracle (r15)",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
      val img = Multimodal.aHashNearDupPairs(
          Multimodal.imageAHash(Multimodal.renderGrayPng(d)).toDF(),
          maxHamming = 16)
        .select(col("ia"), col("ib"), lit("image").as("modality"))
      val vid = Multimodal.videoNearDupPairs(d, frameBytes = 64,
          maxHamming = 16, minMatchedFrames = 2)
        .select(col("ia"), col("ib"), lit("video").as("modality"))
      val aud = Multimodal.aHashNearDupPairs(
          Multimodal.audioAHash(Multimodal.renderPcmWav(d)).toDF(),
          maxHamming = 16)
        .select(col("ia"), col("ib"), lit("audio").as("modality"))
      img.unionByName(vid).unionByName(aud)
        .groupBy("ia", "ib")
        .agg(count(lit(1)).as("n_modalities"),
          array_join(array_sort(collect_set(col("modality"))), ",")
            .as("modalities"))
        .where(col("n_modalities") >= 2)
        .orderBy("ia", "ib")
    },
    Some("""WITH ipx AS (SELECT doc_id, g.i AS i,
                 CASE WHEN len(text) > 0
                   THEN ord(substr(text, CAST(g.i % len(text) AS INT) + 1, 1))
                   ELSE 0 END AS p
               FROM documents, generate_series(0, 1023) AS g(i)),
             iblk AS (SELECT doc_id, (i // 32 // 4) * 8 + (i % 32) // 4 AS b,
                        CAST(SUM(p) AS BIGINT) AS s
                      FROM ipx GROUP BY 1, 2),
             itot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS ts FROM iblk GROUP BY 1),
             ibands AS (SELECT iblk.doc_id, CAST(b // 16 AS INT) AS band,
                          CAST(SUM(CASE WHEN s * 64 > ts
                            THEN (CAST(1 AS BIGINT) << CAST(b % 16 AS INT))
                            ELSE 0 END) AS BIGINT) AS bk
                        FROM iblk JOIN itot ON iblk.doc_id = itot.doc_id
                        GROUP BY 1, 2),
             isig AS (SELECT ibands.doc_id,
                        MAX(CASE WHEN band = 0 THEN bk END) AS b0,
                        MAX(CASE WHEN band = 1 THEN bk END) AS b1,
                        MAX(CASE WHEN band = 2 THEN bk END) AS b2,
                        MAX(CASE WHEN band = 3 THEN bk END) AS b3
                      FROM ibands GROUP BY 1),
             icalm AS (SELECT band, bk FROM ibands GROUP BY 1, 2
                       HAVING COUNT(*) <= 256),
             icb AS (SELECT ibands.doc_id, ibands.band, ibands.bk
                     FROM ibands JOIN icalm USING (band, bk)),
             icand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                       FROM icb a JOIN icb b
                         ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id),
             ipair AS (SELECT icand.ia, icand.ib FROM icand
                       JOIN isig sa ON sa.doc_id = icand.ia
                       JOIN isig sb ON sb.doc_id = icand.ib
                       WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1)) +
                             bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3)) <= 16),
             vfr AS (SELECT doc_id, f.f AS fidx,
                       substr(text, CAST(f.f * 64 AS INT) + 1, 64) AS fs
                     FROM documents, generate_series(0, 3) AS f(f)),
             vnfr AS (SELECT doc_id, fidx, fs FROM vfr WHERE len(fs) > 0),
             vpx AS (SELECT doc_id, fidx, g.i AS i,
                       ord(substr(fs, CAST(g.i % len(fs) AS INT) + 1, 1)) AS p
                     FROM vnfr, generate_series(0, 1023) AS g(i)),
             vblk AS (SELECT doc_id, fidx,
                        (i // 32 // 4) * 8 + (i % 32) // 4 AS b,
                        CAST(SUM(p) AS BIGINT) AS s
                      FROM vpx GROUP BY 1, 2, 3),
             vtot AS (SELECT doc_id, fidx, CAST(SUM(s) AS BIGINT) AS ts
                      FROM vblk GROUP BY 1, 2),
             vbands AS (SELECT vblk.doc_id, vblk.fidx, CAST(b // 16 AS INT) AS band,
                          CAST(SUM(CASE WHEN s * 64 > ts
                            THEN (CAST(1 AS BIGINT) << CAST(b % 16 AS INT))
                            ELSE 0 END) AS BIGINT) AS bk
                        FROM vblk JOIN vtot
                          ON vblk.doc_id = vtot.doc_id AND vblk.fidx = vtot.fidx
                        GROUP BY 1, 2, 3),
             vsig AS (SELECT vbands.doc_id, vbands.fidx,
                        MAX(CASE WHEN band = 0 THEN bk END) AS b0,
                        MAX(CASE WHEN band = 1 THEN bk END) AS b1,
                        MAX(CASE WHEN band = 2 THEN bk END) AS b2,
                        MAX(CASE WHEN band = 3 THEN bk END) AS b3
                      FROM vbands GROUP BY 1, 2),
             vcalm AS (SELECT fidx, band, bk FROM vbands GROUP BY 1, 2, 3
                       HAVING COUNT(*) <= 256),
             vcb AS (SELECT vbands.doc_id, vbands.fidx, vbands.band, vbands.bk
                     FROM vbands JOIN vcalm USING (fidx, band, bk)),
             vcand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                       FROM vcb a JOIN vcb b
                         ON a.fidx = b.fidx AND a.band = b.band AND a.bk = b.bk
                        AND a.doc_id < b.doc_id),
             vpf AS (SELECT vcand.ia, vcand.ib,
                       CASE WHEN
                         bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1)) +
                         bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
                         <= 16 THEN 1 ELSE 0 END AS m
                     FROM vcand
                     JOIN vsig sa ON sa.doc_id = vcand.ia
                     JOIN vsig sb ON sb.doc_id = vcand.ib AND sb.fidx = sa.fidx),
             vpair AS (SELECT ia, ib FROM vpf GROUP BY ia, ib HAVING SUM(m) >= 2),
             aw AS (SELECT doc_id, i // 16 AS b, CAST(SUM(p) AS BIGINT) AS s
                    FROM ipx GROUP BY 1, 2),
             atot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS ts FROM aw GROUP BY 1),
             abands AS (SELECT aw.doc_id, CAST(b // 16 AS INT) AS band,
                          CAST(SUM(CASE WHEN s * 64 > ts
                            THEN (CAST(1 AS BIGINT) << CAST(b % 16 AS INT))
                            ELSE 0 END) AS BIGINT) AS bk
                        FROM aw JOIN atot ON aw.doc_id = atot.doc_id
                        GROUP BY 1, 2),
             asig AS (SELECT abands.doc_id,
                        MAX(CASE WHEN band = 0 THEN bk END) AS b0,
                        MAX(CASE WHEN band = 1 THEN bk END) AS b1,
                        MAX(CASE WHEN band = 2 THEN bk END) AS b2,
                        MAX(CASE WHEN band = 3 THEN bk END) AS b3
                      FROM abands GROUP BY 1),
             acalm AS (SELECT band, bk FROM abands GROUP BY 1, 2
                       HAVING COUNT(*) <= 256),
             acb AS (SELECT abands.doc_id, abands.band, abands.bk
                     FROM abands JOIN acalm USING (band, bk)),
             acand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                       FROM acb a JOIN acb b
                         ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id),
             apair AS (SELECT acand.ia, acand.ib FROM acand
                       JOIN asig sa ON sa.doc_id = acand.ia
                       JOIN asig sb ON sb.doc_id = acand.ib
                       WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1)) +
                             bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3)) <= 16),
             u AS (SELECT ia, ib, 'image' AS modality FROM ipair
                   UNION ALL SELECT ia, ib, 'video' FROM vpair
                   UNION ALL SELECT ia, ib, 'audio' FROM apair)
            SELECT ia, ib, CAST(COUNT(*) AS BIGINT) AS n_modalities,
              string_agg(DISTINCT modality, ',' ORDER BY modality) AS modalities
            FROM u GROUP BY ia, ib
            HAVING COUNT(*) >= 2 ORDER BY ia, ib"""))

  val q107 = QueryDef(
    "q107_multimodal_signature_dedup",
    "signature-exact media dedup — Dedup.exact in FEATURE space: " +
      "same-kind payloads grouped by the gcd-reduced nibble-count " +
      "ratio signature (a payload concatenated with itself collapses " +
      "into the group; sha2 sees distinct blobs); one kernel pass + " +
      "ONE (kind, signature) aggregation — the linear full-corpus " +
      "media-dedup path (q106 is the bounded-probe pair audit)",
    (s, dir) =>
      Multimodal.signatureDedup(Multimodal.fromDocuments(s, dir).toDF())
        .orderBy("kind", "signature"),
    Some("""WITH m AS (SELECT doc_id AS id,
                         (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)]
                           AS kind,
                         text FROM documents),
              n AS (SELECT id, kind,
                      [ord(substring(text, i, 1)) // 16
                       for i in generate_series(1, len(text))] AS nibs,
                      octet_length(encode(text)) AS nb FROM m),
              c AS (SELECT id, kind,
                      [CAST(len(list_filter(nibs, x -> x = b)) AS BIGINT)
                       for b in generate_series(0, 15)] AS cnt
                    FROM n WHERE nb > 0),
              g AS (SELECT id, kind, cnt,
                      list_reduce(cnt, (a, b) -> gcd(a, b)) AS g FROM c),
              sig AS (SELECT id, kind,
                        array_to_string(
                          list_transform(cnt, x -> CAST(x // g AS VARCHAR)),
                          '_') AS signature
                      FROM g)
            SELECT kind, signature, MIN(id) AS keep_id, COUNT(*) AS n_copies
            FROM sig GROUP BY 1, 2 ORDER BY kind, signature"""))

  val q108 = QueryDef(
    "q108_edit_similarity",
    "edit-similarity near-dup refinement: portable-MinHash LSH " +
      "candidates re-scored by normalized Levenshtein (1 - dist/maxlen " +
      ">= 0.6) — the ORDER axis set-based Jaccard is blind to " +
      "(shuffled boilerplate splits from true re-encodings); O(len^2) " +
      "edit distance runs ONLY inside the banded candidate set, texts " +
      "move only for candidates; band buckets hotter than 32 members " +
      "are dropped (the maxBandDf guard from the r12 scale study — " +
      "bucket pair volume is quadratic in family size; cap replayed by " +
      "the oracle, a no-op at the fixture's max bucket of 16; 32 lands " +
      "the 10x study on the linear target: 14.6k kept pairs vs 48k " +
      "uncapped at sf1)",
    (s, dir) =>
      Dedup.editSimilarityPairs(t(s, dir, "documents"), minSim = 0.6,
          maxBandDf = Some(32))
        .orderBy("ia", "ib"),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              hh AS (SELECT id,
                       list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                           list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
                         (h, v) -> (h * 31 + v) % 1000000007) AS h
                     FROM e),
              sig AS (SELECT id,
                        MIN((h * 3 + 7) % 1000000007) AS m0,
                        MIN((h * 5 + 1007) % 1000000007) AS m1,
                        MIN((h * 7 + 2007) % 1000000007) AS m2,
                        MIN((h * 9 + 3007) % 1000000007) AS m3,
                        MIN((h * 11 + 4007) % 1000000007) AS m4,
                        MIN((h * 13 + 5007) % 1000000007) AS m5,
                        MIN((h * 15 + 6007) % 1000000007) AS m6,
                        MIN((h * 17 + 7007) % 1000000007) AS m7
                      FROM hh GROUP BY id),
              band AS (
                SELECT id, 0 AS j,
                  ((((m0 * 131 + m1) % 1000000007) * 131 + m2) % 1000000007 * 131 + m3)
                    % 1000000007 AS bk FROM sig
                UNION ALL
                SELECT id, 1,
                  ((((m4 * 131 + m5) % 1000000007) * 131 + m6) % 1000000007 * 131 + m7)
                    % 1000000007 FROM sig),
              bsz AS (SELECT j, bk, COUNT(*) AS bn FROM band GROUP BY 1, 2),
              bandc AS (SELECT band.id, band.j, band.bk
                        FROM band JOIN bsz USING (j, bk) WHERE bn <= 32),
              cand AS (SELECT DISTINCT a.id AS ia, b.id AS ib
                       FROM bandc a JOIN bandc b
                         ON a.j = b.j AND a.bk = b.bk AND a.id < b.id),
              v AS (SELECT ia, ib,
                      CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist,
                      GREATEST(length(da.text), length(db.text)) AS maxlen
                    FROM cand JOIN documents da ON da.doc_id = cand.ia
                              JOIN documents db ON db.doc_id = cand.ib)
            SELECT ia, ib, dist,
                   ROUND(1.0 - dist * 1.0 / maxlen, 4) AS edit_sim
            FROM v WHERE maxlen > 0 AND 1.0 - dist * 1.0 / maxlen >= 0.6
            ORDER BY ia, ib"""))

  val q109 = QueryDef(
    "q109_sorted_neighborhood",
    "sorted-neighborhood near-dup pairs (Hernandez/Stolfo merge/purge) " +
      "— the blocking family complementary to LSH: corpus sorted by " +
      "(token count, text, id), pairs within 16 sorted positions " +
      "verified at 3-gram Jaccard >= 0.4; global index via the " +
      "two-pass range-exchange numbering (never a one-task window), " +
      "candidacy an EQUI-join on rank blocks",
    (s, dir) =>
      Dedup.sortedNeighborhoodPairs(t(s, dir, "documents"), window = 16)
        .select(col("ia"), col("ib"), col("shared"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("ia", "ib"),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              keyed AS (SELECT doc_id AS id,
                          ROW_NUMBER() OVER (ORDER BY
                            len(string_split_regex(text, '\\s+')), text, doc_id)
                            - 1 AS rk
                        FROM documents),
              cand AS (SELECT LEAST(a.id, b.id) AS ia,
                              GREATEST(a.id, b.id) AS ib
                       FROM keyed a JOIN keyed b
                         ON b.rk > a.rk AND b.rk <= a.rk + 16),
              p AS (SELECT cand.ia, cand.ib,
                      CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS shared,
                      len(da.sh) AS na, len(db.sh) AS nb
                    FROM cand JOIN docs da ON da.id = cand.ia
                              JOIN docs db ON db.id = cand.ib)
            SELECT ia, ib, shared,
                   ROUND(shared * 1.0 / (na + nb - shared), 4) AS jaccard
            FROM p WHERE shared * 1.0 / (na + nb - shared) >= 0.4
            ORDER BY ia, ib"""))

  val q110 = QueryDef(
    "q110_training_prep_e2e",
    "end-to-end training-prep composition: mixture plan (q102) -> " +
      "epoch materialization (q103) -> deterministic shuffle-shard " +
      "export (q76) as ONE declarative cross-engine-checked plan — " +
      "per-source temperature shares under a token budget, the corpus " +
      "amplified to its planned epochs, every copy assigned its " +
      "reproducible (shard, pos); copy identity = doc_id*100 + epoch",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val plan = Sampling.mixturePlan(d, "source",
        TextOps.tokenCount(col("text")), alpha = 0.5,
        budget = 200000L, maxEpochs = 3.0)
      val mat = Sampling.materializeEpochs(d, plan, salt = "e1")
        .withColumn("copy_id", col("doc_id") * 100 + col("epoch"))
      Sampling.shuffleShards(mat, "copy_id", nShards = 8, salt = "s1")
        .select(col("doc_id"), col("epoch"), col("shard"), col("pos"))
        .orderBy("shard", "pos")
    },
    Some("""WITH m AS (SELECT source,
                         CAST(SUM(len(string_split_regex(text, '\s+')))
                           AS BIGINT) AS ta
                       FROM documents GROUP BY 1),
              p AS (SELECT source, ta,
                      CAST(pow(ta, 0.5) AS DECIMAL(28,14)) AS pw FROM m),
              z AS (SELECT SUM(pw) AS z FROM p),
              pl AS (SELECT source, ta,
                       LEAST(CAST(ROUND(CAST(pw / z AS DOUBLE) * 200000)
                               AS BIGINT),
                             CAST(ROUND(ta * 3.0) AS BIGINT)) AS planned
                     FROM p CROSS JOIN z),
              ep AS (SELECT source,
                       ROUND(planned * 1.0 / ta, 4) AS epochs FROM pl),
              b0 AS (SELECT doc_id, source,
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(
                           string_split(CAST(doc_id AS VARCHAR) || 'e1', ''),
                           c -> CAST(ascii(c) AS BIGINT))),
                         (a, v) -> (a * 31 + v) % 1000000007) AS h
                     FROM documents),
              b AS (SELECT doc_id, b0.source, epochs,
                      ((h + 479001599) * (h + 987654323))
                        % 1000000007 % 10000 AS bk
                    FROM b0 JOIN ep ON b0.source = ep.source),
              cp AS (SELECT doc_id,
                       CAST(FLOOR(epochs) AS BIGINT)
                         + CASE WHEN bk < ROUND((epochs - FLOOR(epochs)) * 10000)
                                THEN 1 ELSE 0 END AS copies
                     FROM b),
              mat AS (SELECT doc_id,
                        UNNEST(generate_series(1, copies)) AS epoch
                      FROM cp WHERE copies >= 1),
              cid AS (SELECT doc_id, epoch,
                        doc_id * 100 + epoch AS copy_id FROM mat),
              raw AS (SELECT doc_id, epoch,
                        list_reduce(list_prepend(CAST(0 AS BIGINT),
                          list_transform(
                            string_split(CAST(copy_id AS VARCHAR) || 's1#s', ''),
                            c -> CAST(ascii(c) AS BIGINT))),
                          (a, v) -> (a * 31 + v) % 1000000007) AS hsh,
                        list_reduce(list_prepend(CAST(0 AS BIGINT),
                          list_transform(
                            string_split(CAST(copy_id AS VARCHAR) || 's1#o', ''),
                            c -> CAST(ascii(c) AS BIGINT))),
                          (a, v) -> (a * 31 + v) % 1000000007) AS hor,
                        copy_id
                      FROM cid),
              sb AS (SELECT doc_id, epoch, copy_id,
                       ((hsh + 479001599) * (hsh + 987654323))
                         % 1000000007 % 8 AS shard,
                       ((hor + 479001599) * (hor + 987654323))
                         % 1000000007 AS ord
                     FROM raw)
            SELECT doc_id, epoch, shard,
                   CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                           ORDER BY ord, copy_id) AS BIGINT)
                     AS pos
            FROM sb ORDER BY shard, pos"""))

  val q111 = QueryDef(
    "q111_ann_recall_eval",
    "ANN recall harness: per-probe recall@3 of the production-geometry " +
      "IVF kNN graph (q77: nProbe=2 of 16 cells) against the exact " +
      "brute-force top-3 — THE number an IVF/PQ/LSH geometry is tuned " +
      "by (sweep nProbe, read recall vs candidate volume); probes the " +
      "approximate path missed entirely score 0, not NULL; evaluated " +
      "on the mod-10 probe SAMPLE (a recall estimate needs a sample, " +
      "not a corpus-squared exact pass — the harness contract); the " +
      "sample is count-conditionally BOUNDED (boundedProbeBudget): at " +
      "gate scales (<= 200 probes) the guard is a no-op and the oracle " +
      "replays the un-guarded geometry, above 1024 probes the eval " +
      "degrades to a fixed 128-probe budget so the REGISTERED geometry " +
      "is budget x corpus linear, not quadratic-by-harness (the r17 " +
      "324x-at-100x adjudication, closed by the q277 pattern applied " +
      "to the registered name itself)",
    (s, dir) => {
      val v = t(s, dir, "embeddings")
      val probes = Similarity.boundedProbeBudget(
        v.filter(col("vec_id") % 10 === 0))
      // probe-restricted topKIvf == knnGraph(v).filter(pid % 10 = 0)
      // bit-exactly: centroids derive from the CORPUS side (first-16 by
      // id), routing/rounding are per-probe, and the crank-1 cell
      // assignment matches keep-1 max_by — so the sf0.01 oracle replay
      // is unchanged while the approximate side now scales with the
      // probe budget instead of the corpus
      val approx = Similarity.topKIvf(v, probes, k = 3, nCentroids = 16,
          nProbe = 2, routeRoundTo = Some(6))
        .select(col("pid"), col("nid"))
      val exact = Similarity.topKBruteForce(v, probes, k = 3)
        .select(col("pid"), col("nid"))
      Similarity.rankingRecall(approx, exact).orderBy("pid")
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
            c AS (SELECT vec_id AS cid, ev AS cv FROM v ORDER BY vec_id LIMIT 16),
            cs AS (SELECT v.vec_id, c.cid,
                     ROUND(list_cosine_similarity(v.ev, c.cv), 6) AS csim
                   FROM v CROSS JOIN c),
            rk AS (SELECT vec_id, cid,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY csim DESC, cid) AS r
                   FROM cs),
            vc AS (SELECT vec_id AS nid, cid AS cell FROM rk WHERE r = 1),
            pc AS (SELECT vec_id AS pid, cid AS pcell FROM rk WHERE r <= 2),
            cand AS (SELECT pc.pid, vc.nid FROM pc
                     JOIN vc ON pc.pcell = vc.cell AND pc.pid <> vc.nid),
            sc AS (SELECT cand.pid, cand.nid,
                    ROUND(list_cosine_similarity(p.ev, n.ev), 4) AS sim
                  FROM cand JOIN v p ON p.vec_id = cand.pid
                    JOIN v n ON n.vec_id = cand.nid),
            rr AS (SELECT pid, nid, sim,
                    ROW_NUMBER() OVER (PARTITION BY pid
                                       ORDER BY sim DESC, nid) AS rank
                  FROM sc),
            approx AS (SELECT pid, nid FROM rr
                       WHERE rank <= 3 AND pid % 10 = 0),
            es AS (SELECT a.vec_id AS pid, b.vec_id AS nid,
                     ROUND(list_cosine_similarity(a.ev, b.ev), 4) AS sim
                   FROM v a CROSS JOIN v b
                   WHERE a.vec_id <> b.vec_id AND a.vec_id % 10 = 0),
            er AS (SELECT pid, nid,
                     ROW_NUMBER() OVER (PARTITION BY pid
                                        ORDER BY sim DESC, nid) AS rank
                   FROM es),
            exact AS (SELECT pid, nid FROM er WHERE rank <= 3),
            h AS (SELECT approx.pid, COUNT(*) AS hits
                  FROM approx JOIN exact
                    ON approx.pid = exact.pid AND approx.nid = exact.nid
                  GROUP BY 1),
            t AS (SELECT pid, COUNT(*) AS n_exact FROM exact GROUP BY 1)
            SELECT t.pid, COALESCE(h.hits, 0) AS hits, t.n_exact,
                   ROUND(COALESCE(h.hits, 0) * 1.0 / t.n_exact, 4) AS recall
            FROM t LEFT JOIN h ON t.pid = h.pid
            ORDER BY t.pid"""))

  val q112 = QueryDef(
    "q112_retrieval_ranking_metrics",
    "retrieval eval metrics: RR / DCG / nDCG of q75's batched BM25 " +
      "top-5 against graded pseudo-qrels (grade = distinct query terms " +
      "a doc contains, judged at >= 2) — the ranked counterpart of " +
      "q111's recall; DCG contributions decimal-accumulated, IDCG " +
      "ranks the qrel set at the same depth",
    (s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val qtab = Seq(
        (1L, "key"), (1L, "table"), (1L, "hash"),
        (2L, "window"), (2L, "batch"), (2L, "spark"))
        .toDF("query_id", "term")
      val ranked = graft.operators.Retrieval.bm25BatchFromIndex(
        graft.operators.Retrieval.buildIndex(d), qtab, topK = 5)
      val rels = d
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
        .join(broadcast(qtab.select(col("query_id"), col("term").as("tok"))), Seq("tok"))
        .groupBy("query_id", "doc_id")
        .agg(countDistinct(col("tok")).as("grade"))
        .filter(col("grade") >= 2)
      graft.operators.Retrieval.rankingMetrics(ranked, rels, depth = 5)
        .orderBy("query_id")
    },
    Some("""WITH q(qid, tok) AS (VALUES (1, 'key'), (1, 'table'), (1, 'hash'),
                 (2, 'window'), (2, 'batch'), (2, 'spark')),
            lens AS (SELECT doc_id,
                       CAST(len(list_filter(string_split_regex(text, '\s+'),
                         t -> t <> '')) AS BIGINT) AS dl
                     FROM documents),
            st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens),
            tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
                         FROM documents)
                   WHERE tok IN (SELECT tok FROM q) GROUP BY doc_id, tok),
            dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
            c AS (SELECT q.qid, tf.doc_id,
                    ROUND(ln((st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                          * (tf.tf * (1.2 + 1.0))
                          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * lens.dl / st.avgdl)),
                      6) AS c
                  FROM q JOIN tf USING (tok) JOIN dfreq USING (tok)
                    JOIN lens USING (doc_id) CROSS JOIN st),
            s AS (SELECT qid, doc_id,
                    ROUND(CAST(SUM(CAST(c AS DECIMAL(30,6))) AS DOUBLE), 4) AS score
                  FROM c GROUP BY qid, doc_id),
            rnk AS (SELECT qid, doc_id,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY score DESC, doc_id) AS rk
                    FROM s),
            ranked AS (SELECT qid, doc_id, rk FROM rnk WHERE rk <= 5),
            rels AS (SELECT q.qid, tf.doc_id,
                       CAST(COUNT(DISTINCT tf.tok) AS BIGINT) AS grade
                     FROM tf JOIN q USING (tok)
                     GROUP BY 1, 2 HAVING COUNT(DISTINCT tf.tok) >= 2),
            hits AS (SELECT ranked.qid, ranked.doc_id, ranked.rk, rels.grade
                     FROM ranked JOIN rels
                       ON ranked.qid = rels.qid AND ranked.doc_id = rels.doc_id),
            rr AS (SELECT qid, ROUND(1.0 / MIN(rk), 6) AS rr FROM hits GROUP BY 1),
            dcg AS (SELECT qid,
                      SUM(CAST(grade / log2(rk + 1) AS DECIMAL(28,14))) AS dcg_
                    FROM hits GROUP BY 1),
            ip AS (SELECT qid, grade,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY grade DESC, doc_id) AS pos
                   FROM rels),
            idcg AS (SELECT qid,
                       SUM(CAST(grade / log2(pos + 1) AS DECIMAL(28,14))) AS idcg_
                     FROM ip WHERE pos <= 5 GROUP BY 1)
            SELECT CAST(idcg.qid AS BIGINT) AS query_id,
                   COALESCE(rr.rr, 0.0) AS rr,
                   ROUND(CAST(COALESCE(dcg.dcg_, 0) AS DOUBLE), 6) AS dcg,
                   ROUND(CAST(COALESCE(dcg.dcg_, 0) / idcg.idcg_ AS DOUBLE), 6)
                     AS ndcg
            FROM idcg LEFT JOIN rr ON rr.qid = idcg.qid
                      LEFT JOIN dcg ON dcg.qid = idcg.qid
            ORDER BY query_id"""))

  val q113 = QueryDef(
    "q113_profile_drift",
    "metric-level recrawl audit: per-column profile drift between two " +
      "snapshots (q86's fabrication: old drops id%11==3, new drops " +
      "id%13==5 and nulls lang on id%7==0) — row-count ratio, " +
      "completeness delta, distinct ratio; two single-pass profiles " +
      "joined on the columns-sized frame",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val before = d.filter(col("doc_id") % 11 =!= 3)
      val after = d.filter(col("doc_id") % 13 =!= 5)
        .withColumn("lang",
          when(col("doc_id") % 7 === 0, lit(null: String)).otherwise(col("lang")))
      graft.operators.Profile.diff(before, after, Seq("doc_id", "lang", "source"))
        .orderBy("column")
    },
    Some("""WITH olds AS (SELECT * FROM documents WHERE doc_id % 11 <> 3),
              news AS (SELECT doc_id,
                         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
                         source
                       FROM documents WHERE doc_id % 13 <> 5),
              ob AS (SELECT COUNT(*) AS n FROM olds),
              nb AS (SELECT COUNT(*) AS n FROM news),
              bp AS (
                SELECT 'doc_id' AS "column", (SELECT n FROM ob) AS n_rows,
                       COUNT(doc_id) AS nn, COUNT(DISTINCT doc_id) AS nd
                FROM olds
                UNION ALL
                SELECT 'lang', (SELECT n FROM ob), COUNT(lang),
                       COUNT(DISTINCT lang) FROM olds
                UNION ALL
                SELECT 'source', (SELECT n FROM ob), COUNT(source),
                       COUNT(DISTINCT source) FROM olds),
              ap AS (
                SELECT 'doc_id' AS "column", (SELECT n FROM nb) AS n_rows,
                       COUNT(doc_id) AS nn, COUNT(DISTINCT doc_id) AS nd
                FROM news
                UNION ALL
                SELECT 'lang', (SELECT n FROM nb), COUNT(lang),
                       COUNT(DISTINCT lang) FROM news
                UNION ALL
                SELECT 'source', (SELECT n FROM nb), COUNT(source),
                       COUNT(DISTINCT source) FROM news)
            SELECT bp."column",
                   bp.n_rows AS n_rows_before, ap.n_rows AS n_rows_after,
                   CASE WHEN bp.n_rows > 0
                        THEN ROUND(ap.n_rows * 1.0 / bp.n_rows, 4) END
                     AS n_rows_ratio,
                   ROUND(bp.nn * 1.0 / bp.n_rows, 4) AS completeness_before,
                   ROUND(ap.nn * 1.0 / ap.n_rows, 4) AS completeness_after,
                   ROUND(ROUND(ap.nn * 1.0 / ap.n_rows, 4)
                     - ROUND(bp.nn * 1.0 / bp.n_rows, 4), 4) AS completeness_delta,
                   bp.nd AS n_distinct_before, ap.nd AS n_distinct_after,
                   CASE WHEN bp.nd > 0
                        THEN ROUND(ap.nd * 1.0 / bp.nd, 4) END AS distinct_ratio
            FROM bp JOIN ap USING ("column") ORDER BY bp."column""""))

  val q114 = QueryDef(
    "q114_compression_ratio",
    "byte-level redundancy quality signal: per-doc DEFLATE ratio via " +
      "the codegen'd deflate_size kernel — catches character-level " +
      "loops and markup chrome that token-level TTR/entropy miss; pure " +
      "per-row map, the scan is the only corpus-touching step (no " +
      "DuckDB analogue: rows-only gate, brute-force-equality spec)",
    (s, dir) =>
      Quality.compressionRatio(t(s, dir, "documents")).orderBy("doc_id"),
    None)

  val q115 = QueryDef(
    "q115_neardup_prefix_filter",
    "PPJoin prefix-filtered exact Jaccard pairs ≥ 0.6 — q35's output " +
      "contract at the strict-dedup threshold through the prefix-ordered " +
      "candidate join (prefix-filtering principle: recall 1 by " +
      "construction), oracle = the exact all-pairs SQL",
    (s, dir) =>
      Dedup.prefixFilterPairs(t(s, dir, "documents"), minJaccard = 0.6)
        .select(col("ia"), col("ib"), col("shared"), col("na"), col("nb"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("ia", "ib"),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              p AS (SELECT a.id AS ia, b.id AS ib, COUNT(*) AS shared
                    FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
              sz AS (SELECT id, CAST(len(sh) AS BIGINT) AS nsh FROM docs)
             SELECT ia, ib, shared, na.nsh AS na, nb.nsh AS nb,
               ROUND(shared * 1.0 / (na.nsh + nb.nsh - shared), 4) AS jaccard
             FROM p JOIN sz na ON na.id = p.ia JOIN sz nb ON nb.id = p.ib
             WHERE shared * 1.0 / (na.nsh + nb.nsh - shared) >= 0.6
             ORDER BY ia, ib"""))

  /** q116's pinned merge table — `BpeTrain.trainMerges` output on the
    * sf0.001 documents fixture (16 rules, the q78 configuration; pinned
    * so the DuckDB oracle can replay the greedy scan with a literal
    * table). BpeTrainSpec asserts the pin still equals a fresh train. */
  private[graft] val Q116Merges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("c", "o"), ("co", "lu"), ("colu", "m"))

  /** The SQL replay of [[BpeTrain.encodeWord]] for the pinned table: each
    * pre-token `w` becomes a DOUBLE-space-boundary symbol string
    * ("␣␣s1␣␣s2␣␣"), and each rank's one greedy left-to-right pass is one
    * non-regex `replace(' l  r ' → ' lr ')` — a match consumes one space
    * of each outer boundary and the replacement restores them, so the
    * double-boundary invariant survives every rank, consecutive
    * occurrences still meet ("abab" → "ab ab"), and a just-merged symbol
    * is never re-matched inside the same pass ("aaa" → "aa a", the fold
    * semantics). Symbols can never contain the boundary char: the
    * pre-tokenizer classes ([a-z]+ | [0-9]+ | single non-alnum-non-space)
    * all exclude the space. */
  private val q116Fold: String = Q116Merges.foldLeft(
    "' ' || ' ' || array_to_string(string_split(w, ''), '  ') || ' ' || ' '") {
    case (acc, (l, r)) => s"replace($acc, ' $l  $r ', ' $l$r ')"
  }

  val q116 = QueryDef(
    "q116_bpe_encode",
    "BPE ENCODE under the pinned trained merge table (the apply side q78's " +
      "training feeds): per-doc token count + full encoded token stream, " +
      "oracle replays the rank-ordered greedy scan via boundary-encoded " +
      "REPLACE folds",
    (s, dir) => {
      val enc = BpeTrain.encodeUdf(Q116Merges)
      t(s, dir, "documents")
        .select(col("doc_id"), enc(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast(LongType).as("n_toks"),
          array_join(col("toks"), " ").as("toks_str"))
        .orderBy("doc_id")
    },
    Some(s"""WITH enc AS (SELECT doc_id,
              [$q116Fold
               for w in regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')] AS es
              FROM documents),
             c AS (SELECT doc_id,
              array_to_string([replace(trim(e), '  ', ' ') for e in es], ' ') AS toks_str
              FROM enc)
            SELECT doc_id,
              CAST(CASE WHEN toks_str = '' THEN 0
                   ELSE len(string_split(toks_str, ' ')) END AS BIGINT) AS n_toks,
              toks_str
            FROM c ORDER BY doc_id"""))

  val q117 = QueryDef(
    "q117_vocab_coverage",
    "vocabulary coverage / OOV audit: top-12 corpus tokens as the fixed " +
      "vocabulary (12 of the fixture's 31 types — a non-vacuous cut), " +
      "per-lang covered token mass + distinct OOV types",
    (s, dir) =>
      Quality.vocabCoverage(t(s, dir, "documents"), sliceCol = "lang", vocabSize = 12),
    Some("""WITH st AS (SELECT slice, tok, COUNT(*) AS n
              FROM (SELECT lang AS slice, UNNEST(string_split_regex(text, '\s+')) AS tok
                    FROM documents)
              WHERE tok <> '' GROUP BY 1, 2),
             v AS (SELECT tok FROM (SELECT tok, SUM(n) AS cn FROM st GROUP BY tok
                   ORDER BY cn DESC, tok LIMIT 12)),
             tot AS (SELECT slice, CAST(SUM(n) AS BIGINT) AS total_toks FROM st GROUP BY slice),
             iv AS (SELECT slice, CAST(SUM(n) AS BIGINT) AS invocab_toks
                    FROM st JOIN v USING (tok) GROUP BY slice),
             oov AS (SELECT slice, CAST(COUNT(*) AS BIGINT) AS oov_types
                     FROM st ANTI JOIN v USING (tok) GROUP BY slice)
            SELECT tot.slice AS lang, total_toks,
              COALESCE(invocab_toks, 0) AS invocab_toks,
              ROUND(COALESCE(invocab_toks, 0) * 1.0 / total_toks, 4) AS coverage,
              COALESCE(oov_types, 0) AS oov_types
            FROM tot LEFT JOIN iv ON tot.slice = iv.slice
              LEFT JOIN oov ON tot.slice = oov.slice
            ORDER BY lang"""))

  val q118 = QueryDef(
    "q118_pmi_collocations",
    "top-20 PMI collocations (adjacent-bigram lift over independence, " +
      "minCount=5 hapax guard, ranked on ROUNDED pmi + (w1,w2) total order)",
    (s, dir) =>
      Quality.pmiCollocations(t(s, dir, "documents"), k = 20, minCount = 5L)
        .orderBy(col("pmi").desc, col("w1"), col("w2")),
    Some("""WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
             u AS (SELECT tok, COUNT(*) AS cu
                   FROM (SELECT UNNEST(toks) AS tok FROM t) WHERE tok <> '' GROUP BY tok),
             nt AS (SELECT CAST(SUM(cu) AS BIGINT) AS nt FROM u),
             b AS (SELECT g, COUNT(*) AS c FROM (
                     SELECT UNNEST(CASE WHEN len(toks) >= 2 THEN
                       [array_to_string(toks[i:i+1], ' ')
                        for i in generate_series(1, len(toks)-1)]
                       ELSE [] END) AS g FROM t)
                   GROUP BY g),
             np AS (SELECT CAST(SUM(c) AS BIGINT) AS np FROM b),
             h AS (SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2,
                     CAST(c AS BIGINT) AS c_ab
                   FROM b WHERE c >= 5),
             s AS (SELECT w1, w2, c_ab,
                     ROUND(ln((c_ab * 1.0 / np) /
                       ((u1.cu * 1.0 / nt) * (u2.cu * 1.0 / nt))), 4) AS pmi
                   FROM h JOIN u u1 ON u1.tok = h.w1 JOIN u u2 ON u2.tok = h.w2,
                     nt, np)
            SELECT w1, w2, c_ab, pmi FROM s
            ORDER BY pmi DESC, w1, w2 LIMIT 20"""))

  val q119 = QueryDef(
    "q119_zipf_slope",
    "per-source Zipf slope + fit r2: OLS of ln(freq) on ln(rank) over the " +
      "token spectrum, DECIMAL(28,14) moment accumulation (order-exact), " +
      "scalar slope arithmetic identical in both engines",
    (s, dir) =>
      Quality.zipfSlope(t(s, dir, "documents"), sliceCol = "source"),
    Some("""WITH st AS (SELECT slice, tok, COUNT(*) AS c
              FROM (SELECT source AS slice, UNNEST(string_split_regex(text, '\s+')) AS tok
                    FROM documents)
              WHERE tok <> '' GROUP BY 1, 2),
             r AS (SELECT slice, c,
                     ROW_NUMBER() OVER (PARTITION BY slice ORDER BY c DESC, tok) AS rk
                   FROM st),
             a AS (SELECT slice, CAST(COUNT(*) AS BIGINT) AS n_types,
                     CAST(SUM(CAST(ln(rk) AS DECIMAL(28,14))) AS DOUBLE) AS sx,
                     CAST(SUM(CAST(ln(c) AS DECIMAL(28,14))) AS DOUBLE) AS sy,
                     CAST(SUM(CAST(ln(rk) * ln(c) AS DECIMAL(28,14))) AS DOUBLE) AS sxy,
                     CAST(SUM(CAST(ln(rk) * ln(rk) AS DECIMAL(28,14))) AS DOUBLE) AS sxx,
                     CAST(SUM(CAST(ln(c) * ln(c) AS DECIMAL(28,14))) AS DOUBLE) AS syy
                   FROM r GROUP BY slice)
            SELECT slice AS source, n_types,
              ROUND((n_types * sxy - sx * sy)
                    / NULLIF(n_types * sxx - sx * sx, 0), 4) AS zipf_slope,
              ROUND((n_types * sxy - sx * sy) * (n_types * sxy - sx * sy)
                    / NULLIF((n_types * sxx - sx * sx) * (n_types * syy - sy * sy), 0),
                4) AS r2
            FROM a ORDER BY source"""))

  val q120 = QueryDef(
    "q120_packing_waste",
    "padding-waste audit at context 128: per-source cost of pad-per-doc " +
      "vs concat-and-split packing (integer ceiling arithmetic, DIV not " +
      "float ceil) — the number q59's packing is justified with",
    (s, dir) =>
      Packing.paddingWaste(t(s, dir, "documents"), contextLen = 128L),
    Some("""WITH d AS (SELECT source AS slice,
                CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nt
              FROM documents),
             p AS (SELECT slice, nt, ((nt + 127) // 128) * 128 AS pad_cost FROM d),
             a AS (SELECT slice, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(nt) AS BIGINT) AS total_toks,
                     CAST(SUM(pad_cost) AS BIGINT) AS padded_cost
                   FROM p GROUP BY slice)
            SELECT slice AS source, n_docs, total_toks, padded_cost,
              ROUND((padded_cost - total_toks) * 1.0 / padded_cost, 4) AS pad_waste,
              ((total_toks + 127) // 128) * 128 AS packed_cost,
              ROUND((((total_toks + 127) // 128) * 128 - total_toks) * 1.0
                    / (((total_toks + 127) // 128) * 128), 4) AS pack_waste
            FROM a ORDER BY source"""))

  val q121 = QueryDef(
    "q121_dedup_accounting",
    "dedup accounting: per-source docs/token mass q49's clustering " +
      "(3-gram Jaccard ≥ 0.4, canonical keep) would remove — corpus-" +
      "global removal, so cross-slice duplicates land on the copy's " +
      "source; oracle replays the closure + the accounting joins",
    (s, dir) =>
      Dedup.dedupAccounting(t(s, dir, "documents"), minJaccard = 0.4),
    Some(s"""WITH RECURSIVE docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              p AS (SELECT a.id AS ia, b.id AS ib, COUNT(*) AS shared
                    FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
              sz AS (SELECT id, CAST(len(sh) AS BIGINT) AS nsh FROM docs),
              pr AS (SELECT ia, ib
                     FROM p JOIN sz na ON na.id = p.ia JOIN sz nb ON nb.id = p.ib
                     WHERE shared * 1.0 / (na.nsh + nb.nsh - shared) >= 0.4),
              ed AS (SELECT ia AS u, ib AS v FROM pr
                     UNION ALL SELECT ib, ia FROM pr),
              reach(src, dst) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.src, ed.v FROM reach JOIN ed ON reach.dst = ed.u),
              cl AS (SELECT src AS doc_id, (src = MIN(dst)) AS keep
                     FROM reach GROUP BY src),
              d AS (SELECT doc_id, source,
                      CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS nt
                    FROM documents),
              a AS (SELECT source,
                      CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(COUNT(*) FILTER (NOT keep) AS BIGINT) AS n_removed,
                      CAST(SUM(nt) AS BIGINT) AS total_toks,
                      CAST(COALESCE(SUM(nt) FILTER (NOT keep), 0) AS BIGINT) AS removed_toks
                    FROM d JOIN cl USING (doc_id) GROUP BY source)
             SELECT source, n_docs, n_removed, total_toks, removed_toks,
               ROUND(removed_toks * 1.0 / total_toks, 4) AS removed_frac
             FROM a ORDER BY source"""))

  val q122 = QueryDef(
    "q122_minhash_calibration",
    "MinHash calibration: per banded candidate pair, the signature " +
      "Jaccard estimate (matching positions / 8 — exact multiples of " +
      "1/8, no float hazard) vs exact shingle Jaccard + abs error — " +
      "the estimator-spread audit a (numHashes, bands) geometry is " +
      "tuned by, over the engine-portable q47 family",
    (s, dir) =>
      Dedup.minHashCalibration(t(s, dir, "documents"))
        .orderBy("ia", "ib"),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              hh AS (SELECT id,
                       list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                           list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
                         (h, v) -> (h * 31 + v) % 1000000007) AS h
                     FROM e),
              sig AS (SELECT id,
                        MIN((h * 3 + 7) % 1000000007) AS m0,
                        MIN((h * 5 + 1007) % 1000000007) AS m1,
                        MIN((h * 7 + 2007) % 1000000007) AS m2,
                        MIN((h * 9 + 3007) % 1000000007) AS m3,
                        MIN((h * 11 + 4007) % 1000000007) AS m4,
                        MIN((h * 13 + 5007) % 1000000007) AS m5,
                        MIN((h * 15 + 6007) % 1000000007) AS m6,
                        MIN((h * 17 + 7007) % 1000000007) AS m7
                      FROM hh GROUP BY id),
              band AS (
                SELECT id, 0 AS j,
                  ((((m0 * 131 + m1) % 1000000007) * 131 + m2) % 1000000007 * 131 + m3)
                    % 1000000007 AS bk FROM sig
                UNION ALL
                SELECT id, 1,
                  ((((m4 * 131 + m5) % 1000000007) * 131 + m6) % 1000000007 * 131 + m7)
                    % 1000000007 FROM sig),
              cand AS (SELECT DISTINCT a.id AS ia, b.id AS ib
                       FROM band a JOIN band b
                         ON a.j = b.j AND a.bk = b.bk AND a.id < b.id),
              est AS (SELECT ia, ib,
                        ((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END)
                         + (CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END)
                         + (CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END)
                         + (CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END)
                         + (CASE WHEN sa.m4 = sb.m4 THEN 1 ELSE 0 END)
                         + (CASE WHEN sa.m5 = sb.m5 THEN 1 ELSE 0 END)
                         + (CASE WHEN sa.m6 = sb.m6 THEN 1 ELSE 0 END)
                         + (CASE WHEN sa.m7 = sb.m7 THEN 1 ELSE 0 END)) * 1.0 / 8 AS est
                      FROM cand JOIN sig sa ON sa.id = cand.ia
                                JOIN sig sb ON sb.id = cand.ib),
              p AS (SELECT ia, ib, est,
                      CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS shared,
                      len(da.sh) AS na, len(db.sh) AS nb
                    FROM est JOIN docs da ON da.id = est.ia
                             JOIN docs db ON db.id = est.ib)
             SELECT ia, ib, est AS est_jaccard,
               ROUND(shared * 1.0 / (na + nb - shared), 4) AS exact_jaccard,
               ROUND(abs(est - shared * 1.0 / (na + nb - shared)), 4) AS abs_err
             FROM p ORDER BY ia, ib"""))

  val q123 = QueryDef(
    "q123_budget_by_quality",
    "quality-ordered token-budget selection at 800 tokens/source: " +
      "best-first prefix admission per slice on the grouped two-pass " +
      "prefix sum (never a per-source window task) — q58's budget " +
      "spent on the BEST tokens instead of a random sample",
    (s, dir) =>
      Sampling.budgetByQuality(t(s, dir, "documents"), tokenBudget = 800L)
        .orderBy("doc_id"),
    Some("""WITH x AS (SELECT doc_id, source,
                CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nt,
                CAST(len(list_filter(string_split_regex(text, '\s+'),
                  t -> list_contains(['the','a','an','and','of','to','in','is','on','for'], t)))
                  AS BIGINT) AS hits,
                length(text) AS ln_
              FROM documents),
             q AS (SELECT doc_id, source, nt,
                CAST(ROUND(CAST(LEAST(nt / 50.0, 1.0) * 0.5
                      + (1.0 - ABS(hits * 1.0 / nt - 0.4)) * 0.3
                      + LEAST(((ln_ - (nt - 1)) * 1.0 / nt) / 8.0, 1.0) * 0.2
                      AS DECIMAL(28,14)), 4) AS DOUBLE) AS quality
              FROM x),
             c AS (SELECT doc_id, source, nt, quality,
                CAST(COALESCE(SUM(nt) OVER (PARTITION BY source
                  ORDER BY quality DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                  AS cum_before
              FROM q)
            SELECT doc_id, source, nt, quality, cum_before,
              cum_before < 800 AS kept
            FROM c ORDER BY doc_id"""))

  val q124 = QueryDef(
    "q124_corpus_novelty",
    "corpus novelty: per doc, fraction of its distinct 3-gram shingles " +
      "first seen in THIS doc (min-id first occurrence) — the marginal-" +
      "novelty decay audit of a growing crawl; one min-aggregation + one " +
      "hash join, never a pair join",
    (s, dir) =>
      Dedup.noveltyPerDoc(t(s, dir, "documents"))
        .orderBy("doc_id"),
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              e AS (SELECT id, UNNEST(sh) AS s FROM docs),
              f AS (SELECT s, MIN(id) AS first_id FROM e GROUP BY s)
             SELECT e.id AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(*) FILTER (f.first_id = e.id) AS BIGINT) AS n_novel,
               ROUND(COUNT(*) FILTER (f.first_id = e.id) * 1.0 / COUNT(*), 4)
                 AS novelty_frac
             FROM e JOIN f USING (s)
             GROUP BY e.id ORDER BY doc_id"""))

  val q125 = QueryDef(
    "q125_langid_margin",
    "language-ID confidence margin (CCNet-style confidence gating): per " +
      "doc the argmax guess, top-two hit counts, token-normalized margin, " +
      "and the ambiguity flag a confidence threshold would act on — " +
      "tokens staged ONCE (4 per-language counts share one split)",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          split(col("text"), "\\s+").as("toks"))
        .select(col("doc_id"), col("lang"), col("toks"),
          TextOps.languageIdToks(col("toks")).as("guess"),
          sort_array(array(
            Seq("en", "es", "de", "fr").map(l =>
              TextOps.hitCountToks(col("toks"), TextOps.stopwords(l))): _*),
            asc = false).as("sorted_hits"))
      d.select(col("doc_id"), col("lang"), col("guess"),
          element_at(col("sorted_hits"), 1).as("best_hits"),
          element_at(col("sorted_hits"), 2).as("second_hits"),
          round((element_at(col("sorted_hits"), 1) - element_at(col("sorted_hits"), 2))
            * lit(1.0) / size(col("toks")), 4).as("margin"),
          (element_at(col("sorted_hits"), 1) === element_at(col("sorted_hits"), 2) ||
            col("guess") === "und").as("ambiguous"))
        .orderBy("doc_id")
    },
    Some("""WITH h AS (
              SELECT doc_id, lang,
                CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nt,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['the','a','an','and','of','to','in','is','on','for'], t))) AS BIGINT) AS en,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['el','la','los','de','que','y','en','un','una','por'], t))) AS BIGINT) AS es,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['der','die','das','und','ein','eine','zu','mit','von','ist'], t))) AS BIGINT) AS de,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['le','la','les','et','un','une','des','du','est','dans'], t))) AS BIGINT) AS fr
              FROM documents),
             g AS (SELECT doc_id, lang, nt,
                CASE WHEN en > 0 AND en >= GREATEST(en, es, de, fr) THEN 'en'
                     WHEN es > 0 AND es >= GREATEST(en, es, de, fr) THEN 'es'
                     WHEN de > 0 AND de >= GREATEST(en, es, de, fr) THEN 'de'
                     WHEN fr > 0 AND fr >= GREATEST(en, es, de, fr) THEN 'fr'
                     ELSE 'und' END AS guess,
                list_sort([en, es, de, fr], 'DESC') AS sh
              FROM h)
            SELECT doc_id, lang, guess,
              sh[1] AS best_hits, sh[2] AS second_hits,
              ROUND((sh[1] - sh[2]) * 1.0 / nt, 4) AS margin,
              (sh[1] = sh[2] OR guess = 'und') AS ambiguous
            FROM g ORDER BY doc_id"""))

  val q126 = QueryDef(
    "q126_novelty_ingest_gate",
    "aggregate-novelty ingest gate: incoming docs scored by the fraction " +
      "of their shingles absent from the corpus's shingle UNION, admitted " +
      "at novelty >= 0.5 — catches the stitched-from-fragments doc every " +
      "pairwise gate (q81 fuzzy, q84 semantic, q101 span) structurally " +
      "misses; incoming = doc_id ≡ 0 (mod 5), corpus = rest",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.noveltyGate(
          corpus = d.filter(col("doc_id") % 5 =!= 0),
          incoming = d.filter(col("doc_id") % 5 === 0),
          minNovelty = 0.5)
        .orderBy("doc_id")
    },
    Some(s"""WITH docs AS ($ORACLE_SHINGLES),
              corp AS (SELECT DISTINCT UNNEST(sh) AS h FROM docs WHERE id % 5 <> 0),
              inc AS (SELECT id, UNNEST(sh) AS h FROM docs WHERE id % 5 = 0),
              j AS (SELECT inc.id, inc.h, corp.h IS NOT NULL AS seen
                    FROM inc LEFT JOIN corp ON inc.h = corp.h)
             SELECT id AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(*) FILTER (NOT seen) AS BIGINT) AS n_novel,
               ROUND(COUNT(*) FILTER (NOT seen) * 1.0 / COUNT(*), 4) AS novelty,
               (COUNT(*) FILTER (NOT seen) * 1.0 / COUNT(*)) >= 0.5 AS admit
             FROM j GROUP BY id ORDER BY doc_id"""))

  val q131 = QueryDef(
    "q131_markup_extraction",
    "HTML/markup -> text extraction through Clean.stripMarkup (script/" +
      "style blocks drop with their content, then comments, then tags — " +
      "each becoming a word-separating space — then the five-entity " +
      "named decode with &amp; last, then whitespace collapse; all " +
      "codegen'd regexp_replace in the RE2-portable subset). The fixture " +
      "corpus is plain text, so the query grafts a deterministic " +
      "doc_id-derived HTML document around each text (the q69 pattern) " +
      "and the oracle re-runs the identical chain",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val wrapped = concat(
        lit("<!DOCTYPE html><!-- doc "), col("doc_id"),
        lit(" --><html><head><script type=\"text/javascript\">if (a<b && c>d) { track(\""),
        col("doc_id"),
        lit("\"); }</script><style>p { margin: 0; } .x { content: \"</p>\"; }</style></head><body><h1 class=\""),
        col("lang"),
        lit("\">"), col("source"),
        lit("</h1><p>"), col("text"),
        lit("</p><div data-id=\""), col("doc_id"),
        lit("\"><br/>&amp;copy; &lt;b&gt;corp&nbsp;"), pmod(col("doc_id"), lit(10)),
        lit("&quot;</div></body></html>"))
      d.select(col("doc_id"),
          graft.functions.Clean.stripMarkup(wrapped).as("extracted"))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (SELECT doc_id,
                '<!DOCTYPE html><!-- doc ' || doc_id ||
                ' --><html><head><script type="text/javascript">if (a<b && c>d) { track("' ||
                doc_id ||
                '"); }</script><style>p { margin: 0; } .x { content: "</p>"; }</style></head><body><h1 class="' ||
                lang || '">' || source || '</h1><p>' || text ||
                '</p><div data-id="' || doc_id ||
                '"><br/>&amp;copy; &lt;b&gt;corp&nbsp;' || (doc_id % 10) ||
                '&quot;</div></body></html>' AS h
              FROM documents),
            s1 AS (SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(h,
                  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                  '(?s)<!--.*?-->', ' ', 'g'),
                  '(?s)</?[A-Za-z!][^>]*>', ' ', 'g') AS t
              FROM w),
            s2 AS (SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  regexp_replace(t,
                  '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
                  '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t
              FROM s1)
            SELECT doc_id,
              trim(regexp_replace(t, '\s+', ' ', 'g')) AS extracted
            FROM s2 ORDER BY doc_id"""))

  val q132 = QueryDef(
    "q132_url_host_accounting",
    "per-domain crawl accounting: TextOps.urlHost (RE2-safe scheme + " +
      "userinfo + host extract, lowercased, NULL on non-URL) over " +
      "deterministic doc_id-derived URLs grafted per doc (every 7th doc " +
      "gets a non-URL — absence surfaces as the '(invalid)' bucket, " +
      "never silently dropped), then the host-keyed count a domain-cap " +
      "or robots ledger keys on. One narrow map + one aggregation",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val url = when(pmod(col("doc_id"), lit(7)) === 0, lit("no url here"))
        .otherwise(concat(
          lit("https://user"), pmod(col("doc_id"), lit(3)),
          lit("@sub"), pmod(col("doc_id"), lit(5)),
          lit(".Site"), pmod(col("doc_id"), lit(20)),
          lit(".example.org:8080/path?x="), col("doc_id")))
      d.select(coalesce(graft.functions.TextOps.urlHost(url), lit("(invalid)")).as("host"))
        .groupBy("host").agg(count(lit(1)).as("n_docs"))
        .orderBy("host")
    },
    Some("""WITH u AS (SELECT CASE WHEN doc_id % 7 = 0 THEN 'no url here'
                  ELSE 'https://user' || (doc_id % 3) || '@sub' || (doc_id % 5) ||
                       '.Site' || (doc_id % 20) || '.example.org:8080/path?x=' || doc_id
                  END AS url
                FROM documents),
            h AS (SELECT regexp_extract(url,
                    '^(?i)(?:https?|ftp)://(?:[^/?#@]*@)?([^/?#:]+)', 1) AS h0
                  FROM u)
            SELECT COALESCE(CASE WHEN h0 = '' THEN NULL ELSE lower(h0) END,
                            '(invalid)') AS host,
                   COUNT(*) AS n_docs
            FROM h GROUP BY 1 ORDER BY host"""))

  val q166 = QueryDef(
    "q166_registrable_domains",
    "registrable-domain (eTLD+1) crawl accounting — q132 at the ledger's " +
      "TRUE key: hosts resolve against the pinned public-suffix snapshot " +
      "(Psl.Snapshot, longest match; host-is-suffix -> '(none)', unknown " +
      "TLD -> the PSL default rule) as one narrow codegen'd projection — " +
      "no UDF, no join, no shuffle before the final count; fixture URLs " +
      "cover multi-label suffixes, private registries, suffix-only hosts " +
      "and unknown TLDs",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val m7 = pmod(col("doc_id"), lit(7))
      val variant = pmod(col("doc_id"), lit(6))
      val url = when(variant === 0, lit("not a url"))
        .when(variant === 1, concat(lit("https://a"), m7, lit(".b.example"),
          pmod(col("doc_id"), lit(13)), lit(".com/x")))
        .when(variant === 2, concat(lit("http://x"), m7, lit(".blog"),
          pmod(col("doc_id"), lit(11)), lit(".co.uk/")))
        .when(variant === 3 && m7 === 0, lit("https://github.io/"))
        .when(variant === 3, concat(lit("https://user"), m7, lit(".github.io/repo")))
        .when(variant === 4, concat(lit("https://deep.a.site"),
          pmod(col("doc_id"), lit(13)), lit(".com.au?q=1")))
        // variant 5 exercises the full PSL rule grammar: wildcard
        // (*.ck -> any label.ck is a registry), the exception carved
        // out of it (!www.ck is registrable), a host that IS a
        // wildcard public suffix, and the default rule for unknown TLDs
        .when(variant === 5 && m7 === 1, concat(lit("https://shop"),
          pmod(col("doc_id"), lit(11)), lit(".foo.ck/")))
        .when(variant === 5 && m7 === 2, lit("https://www.ck/"))
        .when(variant === 5 && m7 === 3, lit("https://sub.www.ck/x"))
        .when(variant === 5 && m7 === 4, concat(lit("https://zone"),
          pmod(col("doc_id"), lit(11)), lit(".ck/")))
        .otherwise(concat(lit("https://host"), m7, lit(".internal/")))
      // host PROJECTED once before the derivation references it: the
      // when-chain + regex would otherwise re-evaluate per reference
      // (the Psl lambda-binding note; same lesson as Cdc's __codes)
      val rd = graft.functions.Psl.registrableDomain(col("host"))
      d.select(graft.functions.TextOps.urlHost(url).as("host"))
        .select(
          when(col("host").isNull, lit("(invalid)"))
            .otherwise(coalesce(rd, lit("(none)"))).as("domain"))
        .groupBy("domain").agg(count(lit(1)).as("n_docs"))
        .orderBy("domain")
    },
    Some(s"""WITH u AS (SELECT CASE
                  WHEN doc_id % 6 = 0 THEN 'not a url'
                  WHEN doc_id % 6 = 1 THEN 'https://a' || (doc_id % 7) ||
                    '.b.example' || (doc_id % 13) || '.com/x'
                  WHEN doc_id % 6 = 2 THEN 'http://x' || (doc_id % 7) ||
                    '.blog' || (doc_id % 11) || '.co.uk/'
                  WHEN doc_id % 6 = 3 AND doc_id % 7 = 0 THEN 'https://github.io/'
                  WHEN doc_id % 6 = 3 THEN 'https://user' || (doc_id % 7) ||
                    '.github.io/repo'
                  WHEN doc_id % 6 = 4 THEN 'https://deep.a.site' ||
                    (doc_id % 13) || '.com.au?q=1'
                  WHEN doc_id % 6 = 5 AND doc_id % 7 = 1
                    THEN 'https://shop' || (doc_id % 11) || '.foo.ck/'
                  WHEN doc_id % 6 = 5 AND doc_id % 7 = 2 THEN 'https://www.ck/'
                  WHEN doc_id % 6 = 5 AND doc_id % 7 = 3 THEN 'https://sub.www.ck/x'
                  WHEN doc_id % 6 = 5 AND doc_id % 7 = 4
                    THEN 'https://zone' || (doc_id % 11) || '.ck/'
                  ELSE 'https://host' || (doc_id % 7) || '.internal/'
                  END AS url
                FROM documents),
            h AS (SELECT CASE WHEN h0 = '' THEN NULL ELSE lower(h0) END AS h
                  FROM (SELECT regexp_extract(url,
                    '^(?i)(?:https?|ftp)://(?:[^/?#@]*@)?([^/?#:]+)', 1) AS h0
                    FROM u)),
            x AS (SELECT h, string_split(h, '.') AS ls, len(string_split(h, '.')) AS n
                  FROM h),
            b AS (SELECT h, ls, n,
                    list_min(list_filter(range(1, n + 1), i ->
                      list_contains(${graft.functions.Psl.exceptionSqlList},
                        array_to_string(list_slice(ls, i, n), '.')))) AS excbest,
                    list_min(list_filter(range(1, n + 1), i ->
                      list_contains(${graft.functions.Psl.snapshotSqlList},
                        array_to_string(list_slice(ls, i, n), '.')))) AS pbest,
                    list_min(list_filter(range(1, n), i ->
                      list_contains(${graft.functions.Psl.wildcardTailSqlList},
                        array_to_string(list_slice(ls, i + 1, n), '.')))) AS wbest
                  FROM x),
            rd AS (SELECT CASE WHEN h IS NULL THEN '(invalid)'
                     WHEN excbest IS NOT NULL
                       THEN array_to_string(list_slice(ls, excbest, n), '.')
                     WHEN LEAST(pbest, wbest) = 1 THEN '(none)'
                     WHEN LEAST(pbest, wbest) IS NOT NULL
                       THEN array_to_string(list_slice(ls, LEAST(pbest, wbest) - 1, n), '.')
                     WHEN n >= 2 THEN array_to_string(list_slice(ls, n - 1, n), '.')
                     ELSE '(none)' END AS domain
                   FROM b)
            SELECT domain, COUNT(*) AS n_docs
            FROM rd GROUP BY domain ORDER BY domain"""))

  val q170 = QueryDef(
    "q170_bitext_margin_mining",
    "margin-based bitext mining (Artetxe & Schwenk 2019 — the CCMatrix " +
      "miner): even vec_ids as the source language pool, odd as target; " +
      "cosine relative to both sides' k-NN neighborhood density " +
      "(ratio margin), MUTUAL best matches above the mining threshold — " +
      "hubness-robust parallel-pair extraction; exact-decimal " +
      "denominators make the whole pipeline hash-replayable",
    (s, dir) => {
      val v = t(s, dir, "embeddings")
      graft.operators.Similarity.marginBitextPairs(
          src = v.filter(col("vec_id") % 2 === 0),
          tgt = v.filter(col("vec_id") % 2 =!= 0),
          k = 4, minMargin = 1.02)
        .orderBy("src_id", "tgt_id")
    },
    Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings
                  WHERE NOT isnan(list_inner_product(CAST(embedding AS DOUBLE[]),
                                                     CAST(embedding AS DOUBLE[])))
                    AND list_inner_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[])) > 0),
            s AS (SELECT vec_id AS sid, e FROM v WHERE vec_id % 2 = 0),
            tt AS (SELECT vec_id AS tid, e FROM v WHERE vec_id % 2 <> 0),
            fa AS (SELECT sid, tid,
                     ROUND(list_cosine_similarity(s.e, tt.e), 4) AS sim
                   FROM s CROSS JOIN tt),
            fwd AS (SELECT sid, tid, sim FROM (
                      SELECT sid, tid, sim, ROW_NUMBER() OVER (
                        PARTITION BY sid ORDER BY sim DESC, tid) AS rk FROM fa)
                    WHERE rk <= 4),
            bwd AS (SELECT sid, tid, sim FROM (
                      SELECT sid, tid, sim, ROW_NUMBER() OVER (
                        PARTITION BY tid ORDER BY sim DESC, sid) AS rk FROM fa)
                    WHERE rk <= 4),
            dx AS (SELECT sid, SUM(CAST(sim AS DECIMAL(20,4))) AS sx,
                     COUNT(*) AS nx FROM fwd GROUP BY sid),
            dy AS (SELECT tid, SUM(CAST(sim AS DECIMAL(20,4))) AS sy,
                     COUNT(*) AS ny FROM bwd GROUP BY tid),
            sc AS (SELECT f.sid, f.tid, f.sim,
                     ROUND(f.sim / ((CAST(dx.sx AS DOUBLE) / dx.nx +
                       CAST(dy.sy AS DOUBLE) / dy.ny) / 2), 4) AS margin
                   FROM fwd f JOIN dx USING (sid) JOIN dy USING (tid)),
            bf AS (SELECT sid, tid, sim, margin FROM (
                     SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY sid ORDER BY margin DESC, tid) AS rk FROM sc)
                   WHERE rk = 1),
            bb AS (SELECT sid, tid FROM (
                     SELECT sid, tid, ROW_NUMBER() OVER (
                       PARTITION BY tid ORDER BY margin DESC, sid) AS rk FROM sc)
                   WHERE rk = 1)
            SELECT bf.sid AS src_id, bf.tid AS tgt_id, bf.sim AS cos, bf.margin
            FROM bf JOIN bb ON bf.sid = bb.sid AND bf.tid = bb.tid
            WHERE bf.margin >= 1.02
            ORDER BY src_id, tgt_id"""))

  val q171 = QueryDef(
    "q171_robots_decisions",
    "robots-exclusion evaluation (RFC 9309 longest-match): per-URL " +
      "allow/deny against a 3-host rule table — longest prefix wins, " +
      "allow beats deny at equal length, no match defaults to allow, " +
      "non-URLs surface as 'invalid'; rules broadcast, the URL stream " +
      "passes once, the argmax rides the TopK heap operator",
    (s, dir) => {
      val m5 = pmod(col("doc_id"), lit(5))
      val url = when(m5 === 4, lit("not a url"))
        .otherwise(concat(lit("https://crawl"), pmod(col("doc_id"), lit(3)),
          lit(".example.com"),
          when(m5 === 0, concat(lit("/private/data"), col("doc_id")))
            .when(m5 === 1, concat(lit("/public/page"), col("doc_id")))
            .when(m5 === 2, concat(lit("/public/tmp/cache"), col("doc_id")))
            .otherwise(lit("/"))))
      val urls = t(s, dir, "documents").select(col("doc_id"), url.as("url"))
      import s.implicits._
      val rules = Seq(
        (1L, "crawl0.example.com", false, "/private/"),
        (2L, "crawl0.example.com", true, "/public/"),
        (3L, "crawl0.example.com", false, "/public/tmp/"),
        (4L, "crawl1.example.com", false, "/"),
        (5L, "crawl1.example.com", true, "/public/"),
        (6L, "crawl2.example.com", true, "/private/"),
        (7L, "crawl2.example.com", false, "/private/"),
        (8L, "crawl2.example.com", false, "/public/tmp/"))
        .toDF("rule_id", "host", "allow", "prefix")
      graft.operators.Crawl.robotsDecisions(urls, rules)
        .orderBy("doc_id")
    },
    Some("""WITH u AS (SELECT doc_id, CASE WHEN doc_id % 5 = 4 THEN 'not a url'
                  ELSE 'https://crawl' || (doc_id % 3) || '.example.com' ||
                    CASE WHEN doc_id % 5 = 0 THEN '/private/data' || doc_id
                         WHEN doc_id % 5 = 1 THEN '/public/page' || doc_id
                         WHEN doc_id % 5 = 2 THEN '/public/tmp/cache' || doc_id
                         ELSE '/' END
                  END AS url
                FROM documents),
            r(rule_id, host, allow, prefix) AS (VALUES
              (1, 'crawl0.example.com', false, '/private/'),
              (2, 'crawl0.example.com', true, '/public/'),
              (3, 'crawl0.example.com', false, '/public/tmp/'),
              (4, 'crawl1.example.com', false, '/'),
              (5, 'crawl1.example.com', true, '/public/'),
              (6, 'crawl2.example.com', true, '/private/'),
              (7, 'crawl2.example.com', false, '/private/'),
              (8, 'crawl2.example.com', false, '/public/tmp/')),
            b AS (SELECT doc_id,
                    CASE WHEN h0 = '' THEN NULL ELSE lower(h0) END AS host,
                    CASE WHEN h0 = '' THEN NULL
                         WHEN p0 = '' THEN '/' ELSE p0 END AS path
                  FROM (SELECT doc_id,
                          regexp_extract(url,
                            '^(?i)(?:https?|ftp)://(?:[^/?#@]*@)?([^/?#:]+)', 1) AS h0,
                          regexp_extract(url,
                            '^(?i)(?:https?|ftp)://[^/?#]*(/[^?#]*)', 1) AS p0
                        FROM u)),
            best AS (SELECT doc_id, allow, prefix FROM (
                       SELECT b.doc_id, r.allow, r.prefix,
                         ROW_NUMBER() OVER (PARTITION BY b.doc_id ORDER BY
                           len(r.prefix) DESC, r.allow DESC, r.rule_id) AS rk
                       FROM b JOIN r ON b.host = r.host
                         AND starts_with(b.path, r.prefix)
                       WHERE b.path IS NOT NULL) WHERE rk = 1)
            SELECT b.doc_id, b.host, b.path,
              CASE WHEN b.path IS NULL THEN 'invalid'
                   WHEN COALESCE(best.allow, true) THEN 'allow'
                   ELSE 'deny' END AS decision,
              best.prefix AS matched_prefix
            FROM b LEFT JOIN best USING (doc_id)
            ORDER BY doc_id"""))

  val q133 = QueryDef(
    "q133_sentence_stats",
    "sentence segmentation quality signals: TextOps.sentences (RE2 " +
      "subset, no lookbehind: maximal non-terminator runs with trailing " +
      ".!? attached, trimmed, empties dropped) over text with " +
      "deterministic grafted terminators (the fixture is punctuation-" +
      "free), then per-doc sentence count and mean sentence length in " +
      "tokens — the C4/Gopher-class features a quality gate thresholds. " +
      "Narrow per-row work only",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val txt = regexp_replace(col("text"), "table", "table.")
      val sents = graft.functions.TextOps.sentences(txt)
      // nullif guard: a doc whose text is empty or all-terminators has 0
      // sentences; the mean must surface as NULL in both engines instead
      // of riding on fixture luck (or ANSI DIVIDE_BY_ZERO).
      d.select(col("doc_id"),
          size(sents).cast(LongType).as("n_sentences"),
          round(graft.functions.TextOps.tokenCount(txt).cast("double") /
              nullif(size(sents), lit(0)), 4)
            .as("mean_sentence_tokens"))
        .orderBy("doc_id")
    },
    Some("""WITH x AS (SELECT doc_id,
                  regexp_replace(text, 'table', 'table.', 'g') AS t
                FROM documents),
            s AS (SELECT doc_id, t,
                  len(list_filter([trim(v) for v in
                        regexp_extract_all(t, '[^.!?]+[.!?]*')],
                      v -> v <> '')) AS ns
                  FROM x)
            SELECT doc_id, CAST(ns AS BIGINT) AS n_sentences,
              ROUND(len(string_split_regex(t, '\s+')) * 1.0 / NULLIF(ns, 0), 4)
                AS mean_sentence_tokens
            FROM s ORDER BY doc_id"""))

  val q134 = QueryDef(
    "q134_drop_boilerplate_units",
    "boilerplate removal at sentence granularity — the C4/Dolma curation " +
      "ACTION on q89's audit: units (q133's sentence extractor over " +
      "grafted-terminator text) present in > 25 distinct docs are cut " +
      "from every doc, survivors reassembled in original order; docs " +
      "losing everything survive as empty text. One doc-frequency " +
      "aggregation on md5 currency + one verdict join + per-doc " +
      "bounded reassembly",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("text", regexp_replace(col("text"), "table", "table."))
      Quality.dropBoilerplateUnits(
          d, graft.functions.TextOps.sentences(col("text")), maxDf = 25)
        .orderBy("doc_id")
    },
    Some("""WITH x AS (SELECT doc_id,
                  regexp_replace(text, 'table', 'table.', 'g') AS t
                FROM documents),
            su AS (SELECT doc_id,
                  list_filter([trim(v) for v in
                      regexp_extract_all(t, '[^.!?]+[.!?]*')],
                    v -> v <> '') AS us
                  FROM x),
            e AS (SELECT doc_id, i AS pos, us[i] AS u
                  FROM (SELECT doc_id, us,
                          unnest(generate_series(1, len(us))) AS i
                        FROM su)),
            f AS (SELECT u, COUNT(DISTINCT doc_id) AS df FROM e GROUP BY u),
            k AS (SELECT e.doc_id, e.pos, e.u
                  FROM e JOIN f USING (u) WHERE f.df <= 25),
            per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_units,
                      string_agg(u, ' ' ORDER BY pos) AS clean_text
                    FROM k GROUP BY doc_id)
            SELECT su.doc_id,
                   COALESCE(CAST(len(su.us) AS BIGINT), 0) AS n_units,
                   COALESCE(per.kept_units, 0) AS kept_units,
                   COALESCE(per.clean_text, '') AS clean_text
            FROM su LEFT JOIN per USING (doc_id) ORDER BY su.doc_id"""))

  val q142 = QueryDef(
    "q142_hashed_linear_classifier",
    "fastText-shaped model-based quality gate (Joulin 2016; the CCNet/" +
      "LLaMA-filter idiom): lowercased unigram+bigram features hashed " +
      "into 4096 buckets by the engine's portable avalanche polyhash, " +
      "scored against a broadcast (bucket, weight) linear model — " +
      "inference is pure relational algebra (explode + broadcast join + " +
      "one doc-keyed mean), no model runtime; the model here is " +
      "fabricated hash-deterministically so the oracle replays weight " +
      "synthesis, feature hashing and decimal-accumulated scoring exactly",
    (s, dir) => {
      import org.apache.spark.sql.types.DoubleType
      val dim = 4096
      // stand-in for trained weights: w(b) = (bucket(b,"w1") - 5000)/5000
      // — exact multiples of 2e-4 in [-1, 1), so the DECIMAL(30,6)
      // accumulation cast is lossless on both engines
      val weights = s.range(0, dim).select(col("id").as("bucket"),
        ((graft.operators.Sampling.bucket(col("id"), "w1") - lit(5000L))
          .cast(DoubleType) / lit(5000.0)).as("weight"))
      graft.operators.Quality.hashedLinearScore(
          t(s, dir, "documents"), weights, dim = dim)
        .orderBy("doc_id")
    },
    Some("""WITH pw AS (
              SELECT i AS bucket,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(CAST(i AS VARCHAR) || 'w1', ''),
                         c -> CAST(ascii(c) AS BIGINT))),
                       (a, v) -> (a * 31 + v) % 1000000007) AS h
              FROM range(0, 4096) t(i)),
            w AS (SELECT bucket,
                    (((h + 479001599) * (h + 987654323)) % 1000000007 % 10000
                      - 5000) / 5000.0 AS weight
                  FROM pw),
            tk AS (SELECT doc_id,
                     string_split_regex(lower(text), '\s+') AS toks
                   FROM documents),
            gr AS (SELECT doc_id,
                     UNNEST(list_concat(toks,
                       list_transform(range(1, len(toks)),
                         j -> toks[j] || ' ' || toks[j + 1]))) AS g
                   FROM tk),
            fh AS (SELECT doc_id,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(g, ''),
                         c -> CAST(ascii(c) AS BIGINT))),
                       (a, v) -> (a * 31 + v) % 1000000007) AS h
                   FROM gr),
            f AS (SELECT doc_id,
                    ((h + 479001599) * (h + 987654323)) % 1000000007 % 4096 AS b
                  FROM fh)
            SELECT doc_id, COUNT(*) AS n_features,
                   ROUND(CAST(COALESCE(
                       SUM(CAST(w.weight AS DECIMAL(30,6))), 0) AS DOUBLE)
                     / COUNT(*), 6) AS score
            FROM f LEFT JOIN w ON w.bucket = f.b
            GROUP BY doc_id ORDER BY doc_id"""))

  val q143 = QueryDef(
    "q143_negative_pair_sampling",
    "deterministic negative sampling for contrastive/retrieval training: " +
      "4 pseudo-uniform other-source negatives per anchor doc via a " +
      "two-level hash-pick (bucket routing + pair-decorrelated min-hash " +
      "member pick, distinct negatives per anchor — a collided draw " +
      "drops, surfaced as a missing row) — one bucket-keyed shuffle " +
      "join, never corpus², reproducible run-over-run like the shard " +
      "export; oracle replays all three hash levels, the per-draw " +
      "argmin, and the collision dedup exactly; nBuckets derives " +
      "count-conditionally as max(64, n/8) (r15 — the pinned 64 grew " +
      "per-draw fan-out linearly with the corpus), the same integer " +
      "rule the oracle computes from COUNT(*)",
    (s, dir) =>
      graft.operators.Sampling.negativePairsAuto(
          t(s, dir, "documents"), idCol = "doc_id", k = 4,
          groupCol = "source", salt = "v1")
        .select(col("doc_id"), col("draw").cast("long").as("draw"),
          col("neg_doc_id"))
        .orderBy("doc_id", "draw"),
    Some("""WITH m AS (SELECT doc_id AS nid, source AS ngrp,
                    ((h + 479001599) * (h + 987654323)) % 1000000007
                      % (SELECT GREATEST(64, COUNT(*) // 8) FROM documents) AS bkt
                  FROM (SELECT doc_id, source,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                            list_transform(string_split(
                              CAST(doc_id AS VARCHAR) || 'v1#b', ''),
                              c -> CAST(ascii(c) AS BIGINT))),
                            (a, v) -> (a * 31 + v) % 1000000007) AS h
                        FROM documents)),
            d AS (SELECT aid, agrp, draw,
                    ((h + 479001599) * (h + 987654323)) % 1000000007
                      % (SELECT GREATEST(64, COUNT(*) // 8) FROM documents) AS bkt
                  FROM (SELECT doc_id AS aid, source AS agrp, j AS draw,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                            list_transform(string_split(
                              CAST(doc_id AS VARCHAR) || ':' ||
                              CAST(j AS VARCHAR) || 'v1#t', ''),
                              c -> CAST(ascii(c) AS BIGINT))),
                            (a, v) -> (a * 31 + v) % 1000000007) AS h
                        FROM documents CROSS JOIN range(1, 5) t(j))),
            c AS (SELECT aid, draw, nid,
                    ((h + 479001599) * (h + 987654323)) % 1000000007 AS pick
                  FROM (SELECT aid, draw, nid,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                            list_transform(string_split(
                              CAST(aid AS VARCHAR) || ':' ||
                              CAST(draw AS VARCHAR) || ':' ||
                              CAST(nid AS VARCHAR) || 'v1#p', ''),
                              c -> CAST(ascii(c) AS BIGINT))),
                            (a, v) -> (a * 31 + v) % 1000000007) AS h,
                          agrp, ngrp
                        FROM d JOIN m USING (bkt)
                        WHERE nid <> aid AND ngrp IS DISTINCT FROM agrp)),
            r AS (SELECT aid, draw, nid,
                    ROW_NUMBER() OVER (PARTITION BY aid, draw
                                       ORDER BY pick, nid) AS rk
                  FROM c),
            dd AS (SELECT aid, MIN(draw) AS draw, nid
                   FROM r WHERE rk = 1 GROUP BY aid, nid)
            SELECT aid AS doc_id, draw, nid AS neg_doc_id
            FROM dd ORDER BY doc_id, draw"""))

  val q144 = QueryDef(
    "q144_readability_flesch",
    "Flesch reading-ease readability scoring (the quality-rubric band): " +
      "three exact integer counts over the engine's own tokenizer/" +
      "segmenter/vowel-group syllable estimate, folded into ONE exact-" +
      "integer rational and a single rounded quotient (the three-term " +
      "double form ties at the 4th decimal across engines); degenerate " +
      "docs surface NULL (the q133 divisor rule) — narrow per-row " +
      "arithmetic over staged projections, no shuffle",
    (s, dir) => {
      import graft.functions.TextOps
      val staged = t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextOps.tokenize(col("text")).as("toks"),
          TextOps.sentences(col("text")).as("sents"))
      staged.select(col("doc_id"),
          size(col("toks")).cast("long").as("n_words"),
          size(col("sents")).cast("long").as("n_sentences"),
          TextOps.syllableCount(col("text")).as("n_syllables"),
          TextOps.fleschReadingEase(col("text"), col("sents"), col("toks"))
            .as("flesch"))
        .orderBy("doc_id")
    },
    Some("""WITH x AS (SELECT doc_id,
                    len(string_split_regex(text, '\s+')) AS nw,
                    len(list_filter(
                      [trim(v) for v in
                        regexp_extract_all(text, '[^.!?]+[.!?]*')],
                      v -> v <> '')) AS ns,
                    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy
                  FROM documents)
            SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
                   CAST(ns AS BIGINT) AS n_sentences,
                   CAST(sy AS BIGINT) AS n_syllables,
                   ROUND(CAST(206835 * ns * nw - 1015 * nw * nw
                              - 84600 * sy * ns AS DOUBLE)
                         / NULLIF(1000 * ns * nw, 0), 4) AS flesch
            FROM x ORDER BY doc_id"""))

  val q145 = QueryDef(
    "q145_url_canonicalize_dedup",
    "URL canonicalization + URL-level dedup accounting (the crawl-ledger " +
      "identity, applied BEFORE any fetch or text dedup): scheme/host " +
      "case-fold, userinfo + default-port strip, fragment drop, " +
      "tracking-param strip with separator repair, trailing-slash " +
      "collapse — grafted URL variants of the same resource collapse to " +
      "one canonical key; non-URLs surface as '(invalid)', never " +
      "silently dropped. Narrow regexp decomposition + one aggregation",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val url = when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit("no url "), col("doc_id")))
        .when(pmod(col("doc_id"), lit(5)) === 1,
          concat(lit("HTTP://User@WWW.Example"), pmod(col("doc_id"), lit(4)),
            lit(".COM:80/P"), pmod(col("doc_id"), lit(10)), lit("/?utm_source=x")))
        .when(pmod(col("doc_id"), lit(5)) === 2,
          concat(lit("http://www.example"), pmod(col("doc_id"), lit(4)),
            lit(".com/P"), pmod(col("doc_id"), lit(10)), lit("#sec")))
        .when(pmod(col("doc_id"), lit(5)) === 3,
          concat(lit("http://www.example"), pmod(col("doc_id"), lit(4)),
            lit(".com/P"), pmod(col("doc_id"), lit(10)),
            lit("?keep="), pmod(col("doc_id"), lit(2)), lit("&utm_c=2")))
        .otherwise(
          concat(lit("https://www.example"), pmod(col("doc_id"), lit(4)),
            lit(".com:443/P"), pmod(col("doc_id"), lit(10))))
      d.select(coalesce(graft.functions.Clean.canonicalizeUrl(url),
            lit("(invalid)")).as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("canonical_url")
    },
    Some("""WITH u AS (SELECT
              CASE
                WHEN doc_id % 5 = 0 THEN 'no url ' || doc_id
                WHEN doc_id % 5 = 1 THEN 'HTTP://User@WWW.Example' ||
                  (doc_id % 4) || '.COM:80/P' || (doc_id % 10) || '/?utm_source=x'
                WHEN doc_id % 5 = 2 THEN 'http://www.example' ||
                  (doc_id % 4) || '.com/P' || (doc_id % 10) || '#sec'
                WHEN doc_id % 5 = 3 THEN 'http://www.example' ||
                  (doc_id % 4) || '.com/P' || (doc_id % 10) || '?keep=' ||
                  (doc_id % 2) || '&utm_c=2'
                ELSE 'https://www.example' ||
                  (doc_id % 4) || '.com:443/P' || (doc_id % 10)
              END AS url FROM documents),
            p AS (SELECT trim(url) AS t FROM u),
            d1 AS (SELECT t,
                     lower(regexp_extract(t, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
                     regexp_replace(t, '^[A-Za-z][A-Za-z0-9+.\-]*://', '') AS tl
                   FROM p),
            d2 AS (SELECT scheme,
                     lower(regexp_replace(regexp_extract(tl, '^([^/?#]*)', 1),
                       '^.*@', '')) AS host,
                     regexp_replace(regexp_replace(tl, '^[^/?#]*', ''),
                       '#.*$', '') AS rnf
                   FROM d1),
            d3 AS (SELECT scheme,
                     CASE WHEN scheme = 'http' THEN regexp_replace(host, ':80$', '')
                          WHEN scheme = 'https' THEN regexp_replace(host, ':443$', '')
                          ELSE host END AS host,
                     regexp_replace(regexp_replace(rnf, '\?.*$', ''),
                       '/+$', '') AS path,
                     regexp_extract(rnf, '(\?.*)$', 1) AS qry
                   FROM d2),
            d4 AS (SELECT scheme, host, path,
                     regexp_replace(regexp_replace(
                       regexp_replace(qry,
                         '(?i)[?&](?:utm_[a-z0-9_]*|fbclid|gclid|msclkid)=[^&]*',
                         '', 'g'),
                       '^&', '?'), '^\?$', '') AS qry
                   FROM d3),
            c AS (SELECT CASE WHEN scheme = '' THEN '(invalid)'
                     ELSE scheme || '://' || host || path || qry END AS canonical_url
                  FROM d4)
            SELECT canonical_url, COUNT(*) AS n_docs
            FROM c GROUP BY canonical_url ORDER BY canonical_url"""))

  val q146 = QueryDef(
    "q146_kmv_distinct_sketch",
    "KMV bottom-k distinct-count sketch per event_type (Bar-Yossef 2002) " +
      "over the portable avalanche hash — unlike HLL the whole estimate " +
      "replays cross-engine exactly: distinct (group, hash) aggregation, " +
      "TopKPerKey heap trim to the 64 smallest hashes per group, " +
      "n̂ = floor((k−1)·P/h_k); small groups report exact occupancy; " +
      "estimate checked against the exact distinct-hash count in BOTH " +
      "engines (deterministic tolerance flag)",
    (s, dir) => {
      val e = t(s, dir, "events")
      val kmv = graft.operators.Sketches.kmvDistinct(
        e, groupCol = "event_type", keyCol = "user_id", k = 64, salt = "v1")
      val exact = e.groupBy("event_type")
        .agg(count_distinct(
          graft.operators.Sketches.keyHash(col("user_id"), "v1"))
          .as("n_exact"))
      kmv.join(exact, "event_type")
        .select(col("event_type"), col("n_seen"), col("kth_hash"),
          col("est_distinct"), col("n_exact"),
          (abs(col("est_distinct") - col("n_exact")) <= col("n_exact") / 2)
            .as("err_ok"))
        .orderBy("event_type")
    },
    Some("""WITH h AS (SELECT DISTINCT event_type AS g,
                    ((hp + 479001599) * (hp + 987654323)) % 1000000007 AS h
                  FROM (SELECT event_type,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                            list_transform(string_split(
                              CAST(user_id AS VARCHAR) || 'v1', ''),
                              c -> CAST(ascii(c) AS BIGINT))),
                            (a, v) -> (a * 31 + v) % 1000000007) AS hp
                        FROM events)),
            r AS (SELECT g, h,
                    ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
                  FROM h),
            s AS (SELECT g,
                    LEAST(COUNT(*), 64) AS n_seen,
                    MAX(CASE WHEN rn <= 64 THEN h END) AS kth_hash,
                    COUNT(*) AS n_exact
                  FROM r GROUP BY g),
            e AS (SELECT g, n_seen, kth_hash, n_exact,
                    CASE WHEN n_seen < 64 THEN n_seen
                         ELSE CAST(FLOOR(63.0 * 1000000007 / kth_hash) AS BIGINT)
                    END AS est_distinct
                  FROM s)
            SELECT g AS event_type, CAST(n_seen AS BIGINT) AS n_seen,
                   kth_hash, est_distinct, CAST(n_exact AS BIGINT) AS n_exact,
                   abs(est_distinct - n_exact) <= n_exact // 2 AS err_ok
            FROM e ORDER BY event_type"""))

  val q147 = QueryDef(
    "q147_cms_heavy_hitter_counts",
    "count-min sketch (Cormode 2005, depth 4 × width 256) over the " +
      "portable hash family: the grid build is ONE (row, bucket) " +
      "aggregation (mergeable across time partitions by re-aggregating), " +
      "probe = broadcast-join min over depth counters for the exact " +
      "top-10 users; the one-sided guarantee est ≥ true count is " +
      "asserted per row in both engines",
    (s, dir) => {
      val e = t(s, dir, "events")
      val sk = graft.operators.Sketches.cmsSketch(
        e, keyCol = "user_id", depth = 4, width = 256, salt = "v1")
      val exact = e.groupBy("user_id").agg(count(lit(1)).as("n_events"))
      val top = exact.orderBy(col("n_events").desc, col("user_id")).limit(10)
      val est = graft.operators.Sketches.cmsEstimate(
        top, sk, keyCol = "user_id", depth = 4, width = 256, salt = "v1")
      top.join(est, "user_id")
        .select(col("user_id"), col("n_events"), col("cms_est"),
          (col("cms_est") >= col("n_events")).as("one_sided_ok"))
        .orderBy("user_id")
    },
    Some("""WITH ct AS (SELECT user_id, COUNT(*) AS n_events
                  FROM events GROUP BY user_id),
            top AS (SELECT user_id, n_events FROM ct
                    ORDER BY n_events DESC, user_id LIMIT 10),
            rb AS (SELECT user_id, j,
                    ((hp + 479001599) * (hp + 987654323)) % 1000000007 % 256 AS bucket
                  FROM (SELECT user_id, j,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                            list_transform(string_split(
                              CAST(user_id AS VARCHAR) || 'v1#' ||
                              CAST(j AS VARCHAR), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
                            (a, v) -> (a * 31 + v) % 1000000007) AS hp
                        FROM events CROSS JOIN range(0, 4) t(j))),
            grid AS (SELECT j, bucket, COUNT(*) AS cnt
                     FROM rb GROUP BY j, bucket),
            pr AS (SELECT t.user_id, j,
                    ((hp + 479001599) * (hp + 987654323)) % 1000000007 % 256 AS bucket
                  FROM (SELECT user_id, j,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                            list_transform(string_split(
                              CAST(user_id AS VARCHAR) || 'v1#' ||
                              CAST(j AS VARCHAR), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
                            (a, v) -> (a * 31 + v) % 1000000007) AS hp
                        FROM top CROSS JOIN range(0, 4) t2(j)) t),
            est AS (SELECT pr.user_id, MIN(COALESCE(grid.cnt, 0)) AS cms_est
                    FROM pr LEFT JOIN grid USING (j, bucket)
                    GROUP BY pr.user_id)
            SELECT top.user_id, CAST(top.n_events AS BIGINT) AS n_events,
                   CAST(est.cms_est AS BIGINT) AS cms_est,
                   est.cms_est >= top.n_events AS one_sided_ok
            FROM top JOIN est USING (user_id) ORDER BY user_id"""))

  /** q173's grafted document structure — the fixture corpus is prose-free
    * word soup (no newlines, bullets, ellipses or symbols), so the line-
    * and symbol-level Gopher rules get their signal from deterministic
    * grafts (the q169 pattern): every 11th doc becomes a bullet-only
    * listing (fails the bullet-line, word-count and alpha rules), every
    * 3rd gains a 3-bullet tail (passes — 3 of many lines), every 5th an
    * ellipsis-terminated stop-word-rich tail (flips its stop-word rule to
    * pass), every 7th a `#`-symbol tail. ASCII apart from the bullet
    * `•` (valid UTF-8 in both engines' literals); apostrophe-free for the
    * SQL literal. */
  private val Q173BulletOnly =
    "• alpha\n• beta\n• gamma\n• delta"
  private val Q173BulletTail =
    "\n• promoted listing item\n• second bullet entry\n- third bullet entry"
  private val Q173EllipsisTail =
    "\nthe story continues and more to think of here...\n" +
      "that would have ended with another pause..."
  private val Q173SymbolTail = " ### ## # tag"

  val q173 = QueryDef(
    "q173_gopher_quality_rules",
    "the published Gopher/MassiveText document-quality rule bundle (Rae " +
      "2021 A.1.1) over structurally grafted docs: word-count bounds, " +
      "mean word length, symbol ratio, bullet/ellipsis line fractions, " +
      "alphabetic-word fraction, stop-word presence — per-language " +
      "per-rule failure counts + overall pass rate, every fraction " +
      "rounded before its threshold compare so the verdict replays " +
      "bit-identically in SQL",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val g = d.select(col("doc_id"), col("lang"),
        when(pmod(col("doc_id"), lit(11)) === 0, lit(Q173BulletOnly))
          .otherwise(concat(col("text"),
            when(pmod(col("doc_id"), lit(3)) === 0, lit(Q173BulletTail))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(5)) === 0, lit(Q173EllipsisTail))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(7)) === 0, lit(Q173SymbolTail))
              .otherwise(lit("")))).as("text"))
      val m = Quality.gopherRules(g)
      def fails(r: String): org.apache.spark.sql.Column =
        count(when(!col(r), lit(1)))
      m.join(g.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          fails("r_word_count").as("fail_word_count"),
          fails("r_mean_word_len").as("fail_mean_word_len"),
          fails("r_symbol_ratio").as("fail_symbol_ratio"),
          fails("r_bullet_lines").as("fail_bullet_lines"),
          fails("r_ellipsis_lines").as("fail_ellipsis_lines"),
          fails("r_alpha_words").as("fail_alpha_words"),
          fails("r_stop_words").as("fail_stop_words"),
          count(when(col("pass"), lit(1))).as("n_pass"),
          round(count(when(col("pass"), lit(1))).cast("double") /
            count(lit(1)), 4).as("pass_rate"))
        .orderBy("lang")
    },
    Some("""WITH raw AS (SELECT doc_id, lang,
              CASE WHEN doc_id % 11 = 0 THEN
                '• alpha' || chr(10) || '• beta' || chr(10) ||
                '• gamma' || chr(10) || '• delta'
              ELSE text ||
                CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
                     '• promoted listing item' || chr(10) ||
                     '• second bullet entry' || chr(10) ||
                     '- third bullet entry' ELSE '' END ||
                CASE WHEN doc_id % 5 = 0 THEN chr(10) ||
                     'the story continues and more to think of here...' ||
                     chr(10) ||
                     'that would have ended with another pause...'
                   ELSE '' END ||
                CASE WHEN doc_id % 7 = 0 THEN ' ### ## # tag' ELSE '' END
              END AS t FROM documents),
            x AS (SELECT doc_id, lang, t,
                list_filter(string_split_regex(t, '\s+'), w -> w <> '') AS ws,
                list_filter(string_split(t, chr(10)), l -> l <> '') AS ls
              FROM raw),
            c AS (SELECT doc_id, lang,
                CAST(len(ws) AS BIGINT) AS n_words,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(ws, w -> CAST(len(w) AS BIGINT))),
                  (a, v) -> a + v) AS sum_len,
                CAST((len(t) - len(replace(t, '#', ''))) +
                  (len(t) - len(replace(t, '...', ''))) / 3 AS BIGINT)
                  AS n_symbols,
                CAST(len(ls) AS BIGINT) AS n_lines,
                CAST(len(list_filter(ls, l -> starts_with(l, '• ') OR
                  starts_with(l, '- '))) AS BIGINT) AS n_bullet,
                CAST(len(list_filter(ls, l -> ends_with(l, '...') OR
                  ends_with(l, '…'))) AS BIGINT) AS n_ell,
                CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
                  AS BIGINT) AS n_alpha,
                CAST(len(list_filter(
                  ['the','be','to','of','and','that','have','with'],
                  s -> list_contains(ws, s))) AS BIGINT) AS stop_hits
              FROM x),
            m AS (SELECT doc_id, lang, n_words,
                CASE WHEN n_words > 0
                  THEN ROUND(sum_len * 1.0 / n_words, 4) ELSE 0.0 END
                  AS mean_word_len,
                CASE WHEN n_words > 0
                  THEN ROUND(n_symbols * 1.0 / n_words, 4) ELSE 0.0 END
                  AS symbol_ratio,
                CASE WHEN n_lines > 0
                  THEN ROUND(n_bullet * 1.0 / n_lines, 4) ELSE 0.0 END
                  AS bullet_line_frac,
                CASE WHEN n_lines > 0
                  THEN ROUND(n_ell * 1.0 / n_lines, 4) ELSE 0.0 END
                  AS ellipsis_line_frac,
                CASE WHEN n_words > 0
                  THEN ROUND(n_alpha * 1.0 / n_words, 4) ELSE 0.0 END
                  AS alpha_word_frac,
                stop_hits FROM c),
            r AS (SELECT lang,
                (n_words BETWEEN 50 AND 100000) AS r1,
                (n_words > 0 AND mean_word_len BETWEEN 3.0 AND 10.0) AS r2,
                (symbol_ratio <= 0.1) AS r3,
                (bullet_line_frac <= 0.9) AS r4,
                (ellipsis_line_frac <= 0.3) AS r5,
                (n_words > 0 AND alpha_word_frac >= 0.8) AS r6,
                (stop_hits >= 2) AS r7 FROM m)
            SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_word_count,
              CAST(SUM(CASE WHEN NOT r2 THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_mean_word_len,
              CAST(SUM(CASE WHEN NOT r3 THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_symbol_ratio,
              CAST(SUM(CASE WHEN NOT r4 THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_bullet_lines,
              CAST(SUM(CASE WHEN NOT r5 THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_ellipsis_lines,
              CAST(SUM(CASE WHEN NOT r6 THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_alpha_words,
              CAST(SUM(CASE WHEN NOT r7 THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_stop_words,
              CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 AND r6
                AND r7 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
              ROUND(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 AND r6
                AND r7 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS pass_rate
            FROM r GROUP BY lang ORDER BY lang"""))

  /** q174's grafts (the q173/q169 pattern — the soup corpus carries no
    * punctuation, so every C4 rule gets a deterministic planted case):
    * every 2nd doc gains three clean ≥5-word sentences (survives), every
    * 3rd a punctuated `javascript` line (line-dropped), every 5th a
    * `lorem ipsum` sentence (page-dropped), every 7th a `{` snippet
    * (page-dropped), every 11th a short punctuated line (word-count
    * line rule); the base soup line itself never ends in terminal
    * punctuation, so it always drops. */
  private val Q174Sentences =
    "\nThis line carries a full plain sentence with enough words." +
      "\nAnother complete sentence follows here with more than five words." +
      "\nThe third sentence closes the page with a clean period."
  private val Q174Javascript =
    "\nEnable javascript to view the comment section on this page."
  private val Q174Lorem =
    "\nlorem ipsum dolor sit amet consectetur adipiscing elit sed do."
  private val Q174Brace =
    "\nfunction render() { return the layout template markup }"
  private val Q174Short = "\nToo short line."

  val q174 = QueryDef(
    "q174_c4_line_filter",
    "the published C4 cleanup (Raffel 2020 §2.2) over structurally " +
      "grafted docs: terminal-punctuation + min-5-word + no-javascript " +
      "line rules, lorem-ipsum / brace / too-few-sentences page rules " +
      "- per-source drop-reason counts, survivor count and kept-line/" +
      "word totals, replayed verbatim in SQL",
    (s, dir) => {
      val d = t(s, dir, "documents")
      def tail(m: Int, lit_ : String) =
        when(pmod(col("doc_id"), lit(m)) === 0, lit(lit_)).otherwise(lit(""))
      val g = d.select(col("doc_id"), col("source"),
        concat(col("text"),
          tail(2, Q174Sentences), tail(3, Q174Javascript),
          tail(5, Q174Lorem), tail(7, Q174Brace),
          tail(11, Q174Short)).as("text"))
      val f = Quality.c4Filter(g)
      def drops(r: String): org.apache.spark.sql.Column =
        count(when(col("drop_reason") === r, lit(1)))
      f.join(g.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          drops("lorem_ipsum").as("drop_lorem"),
          drops("brace").as("drop_brace"),
          drops("too_few_sentences").as("drop_few_sentences"),
          count(when(col("drop_reason").isNull, lit(1))).as("n_survivors"),
          sum(col("n_kept_lines")).as("kept_lines"),
          sum(col("n_kept_words")).as("kept_words"))
        .orderBy("source")
    },
    Some("""WITH raw AS (SELECT doc_id, source, text ||
              CASE WHEN doc_id % 2 = 0 THEN chr(10) ||
                'This line carries a full plain sentence with enough words.' ||
                chr(10) ||
                'Another complete sentence follows here with more than five words.' ||
                chr(10) ||
                'The third sentence closes the page with a clean period.'
              ELSE '' END ||
              CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
                'Enable javascript to view the comment section on this page.'
              ELSE '' END ||
              CASE WHEN doc_id % 5 = 0 THEN chr(10) ||
                'lorem ipsum dolor sit amet consectetur adipiscing elit sed do.'
              ELSE '' END ||
              CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
                'function render() { return the layout template markup }'
              ELSE '' END ||
              CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'Too short line.'
              ELSE '' END AS t FROM documents),
            x AS (SELECT doc_id, source, t,
                list_filter(string_split(t, chr(10)), l -> l <> '') AS ls
              FROM raw),
            k AS (SELECT doc_id, source, t, CAST(len(ls) AS BIGINT) AS n_lines,
                list_filter(ls, l ->
                  (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!') OR
                   ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"')) AND
                  len(list_filter(string_split_regex(l, '\s+'),
                    w -> w <> '')) >= 5 AND
                  NOT contains(lower(l), 'javascript')) AS kls
              FROM x),
            sh AS (SELECT doc_id, source, t, n_lines,
                CAST(len(kls) AS BIGINT) AS n_kept_lines,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(kls, l -> CAST(len(list_filter(
                    string_split_regex(l, '\s+'), w -> w <> '')) AS BIGINT))),
                  (a, v) -> a + v) AS n_kept_words,
                COALESCE(array_to_string(kls, chr(10)), '') AS kt
              FROM k),
            sen AS (SELECT doc_id, source, n_lines, n_kept_lines,
                n_kept_words,
                CAST(len(kt) - len(replace(replace(replace(kt, '.', ''),
                  '!', ''), '?', '')) AS BIGINT) AS n_sentences,
                CASE WHEN contains(lower(t), 'lorem ipsum') THEN 'lorem_ipsum'
                     WHEN contains(t, '{') THEN 'brace'
                     WHEN len(kt) - len(replace(replace(replace(kt, '.', ''),
                       '!', ''), '?', '')) < 3 THEN 'too_few_sentences'
                END AS drop_reason
              FROM sh)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN drop_reason = 'lorem_ipsum' THEN 1 ELSE 0
                END) AS BIGINT) AS drop_lorem,
              CAST(SUM(CASE WHEN drop_reason = 'brace' THEN 1 ELSE 0
                END) AS BIGINT) AS drop_brace,
              CAST(SUM(CASE WHEN drop_reason = 'too_few_sentences' THEN 1
                ELSE 0 END) AS BIGINT) AS drop_few_sentences,
              CAST(SUM(CASE WHEN drop_reason IS NULL THEN 1 ELSE 0
                END) AS BIGINT) AS n_survivors,
              CAST(SUM(n_kept_lines) AS BIGINT) AS kept_lines,
              CAST(SUM(n_kept_words) AS BIGINT) AS kept_words
            FROM sen GROUP BY source ORDER BY source"""))

  /** q175's planted numbers: two valid test PANs (Visa 4111…1111, Amex
    * 37828…0005), one checksum-broken near-miss (…1112) and one
    * sequential order-id-shaped run — the exact false-positive family
    * the Luhn gate exists to spare. */
  private val Q175Tails = Seq(
    (4, " card 4111111111111111 on file"),
    (6, " ref 4111111111111112 order"),
    (9, " amex 378282246310005 travel"),
    (15, " track 1234567890123456 parcel"))

  val q175 = QueryDef(
    "q175_luhn_card_detection",
    "Luhn-gated card-number detection (ISO/IEC 7812 mod-10) - the " +
      "precision tier of the PII family: bare [0-9]{13,19} candidates " +
      "vs checksum-valid PANs per source, plus the chars-redacted " +
      "delta of the precision-gated redaction; valid test PANs and " +
      "checksum-broken near-misses planted deterministically",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val g = d.select(col("doc_id"), col("source"),
        concat(col("text") +: Q175Tails.map { case (m, tl) =>
          when(pmod(col("doc_id"), lit(m)) === 0, lit(tl)).otherwise(lit(""))
        }: _*).as("t"))
      val staged = g.select(col("source"), col("t"),
        array_distinct(
          regexp_extract_all(col("t"), lit("[0-9]{13,19}"), lit(0)))
          .as("cands"))
      val m = staged.select(col("source"),
        size(col("cands")).cast(LongType).as("nc"),
        size(filter(col("cands"), p => graft.functions.Clean.luhnValid(p)))
          .cast(LongType).as("nv"),
        (length(col("t")) -
          length(graft.functions.Clean.redactValidCards(col("t"))))
          .cast(LongType).as("delta"))
      m.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("nc").as("n_candidates"),
          sum("nv").as("n_valid"),
          (sum("nc") - sum("nv")).as("n_rejected"),
          sum("delta").as("chars_redacted"),
          count(when(col("nv") > 0, lit(1))).as("docs_with_pan"))
        .orderBy("source")
    },
    Some("""WITH raw AS (SELECT doc_id, source, text ||
              CASE WHEN doc_id % 4 = 0
                THEN ' card 4111111111111111 on file' ELSE '' END ||
              CASE WHEN doc_id % 6 = 0
                THEN ' ref 4111111111111112 order' ELSE '' END ||
              CASE WHEN doc_id % 9 = 0
                THEN ' amex 378282246310005 travel' ELSE '' END ||
              CASE WHEN doc_id % 15 = 0
                THEN ' track 1234567890123456 parcel' ELSE '' END AS t
              FROM documents),
            x AS (SELECT source, t,
                list_distinct(regexp_extract_all(t, '[0-9]{13,19}')) AS cands
              FROM raw),
            v AS (SELECT source,
                CAST(len(cands) AS BIGINT) AS nc,
                list_filter(cands, p -> len(p) BETWEEN 13 AND 19 AND
                  list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(1, len(p) + 1), i ->
                      CASE WHEN i % 2 = 0 THEN
                        CASE WHEN CAST(substr(reverse(p), CAST(i AS INTEGER),
                            1) AS BIGINT) * 2 > 9
                          THEN CAST(substr(reverse(p), CAST(i AS INTEGER),
                            1) AS BIGINT) * 2 - 9
                          ELSE CAST(substr(reverse(p), CAST(i AS INTEGER),
                            1) AS BIGINT) * 2 END
                      ELSE CAST(substr(reverse(p), CAST(i AS INTEGER),
                        1) AS BIGINT) END)),
                    (a, w) -> a + w) % 10 = 0) AS valid
              FROM x),
            m AS (SELECT source, nc,
                CAST(len(valid) AS BIGINT) AS nv,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(valid, p -> CAST(len(p) - 4 AS BIGINT))),
                  (a, w) -> a + w) AS delta
              FROM v)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(nc) AS BIGINT) AS n_candidates,
              CAST(SUM(nv) AS BIGINT) AS n_valid,
              CAST(SUM(nc) - SUM(nv) AS BIGINT) AS n_rejected,
              CAST(SUM(delta) AS BIGINT) AS chars_redacted,
              CAST(SUM(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS docs_with_pan
            FROM m GROUP BY source ORDER BY source"""))

  val q176 = QueryDef(
    "q176_neyman_allocation",
    "Neyman-optimal stratified allocation (Neyman 1934): per market " +
      "segment, allocate a 1000-row annotation budget proportional to " +
      "N_h*S_h over account balance - exact-decimal sufficient stats " +
      "(the q156 OLS discipline), IEEE sqrt, weights rounded back into " +
      "decimal for the normalization so shares and integer allocations " +
      "replay bit-identically",
    (s, dir) =>
      graft.operators.Sampling.neymanAllocation(
          t(s, dir, "customer"), "c_mktsegment", col("c_acctbal"),
          budget = 1000L)
        .orderBy("c_mktsegment"),
    Some("""WITH b AS (SELECT c_mktsegment AS stratum,
                CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS q
              FROM customer
              WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL),
            per AS (SELECT stratum, COUNT(*) AS n_rows,
                SUM(CAST(q AS DECIMAL(19,0))) AS s1,
                SUM(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0)))
                  AS s2
              FROM b GROUP BY stratum),
            v AS (SELECT stratum, n_rows,
                (CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE) -
                 CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
                (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0))
                  AS varq
              FROM per),
            w AS (SELECT stratum, n_rows,
                ROUND(CAST(n_rows AS DOUBLE) *
                  (CASE WHEN n_rows > 1 AND varq > 0.0 THEN sqrt(varq)
                        ELSE 0.0 END), 6) AS w6,
                ROUND((CASE WHEN n_rows > 1 AND varq > 0.0 THEN sqrt(varq)
                       ELSE 0.0 END) / 100.0, 6) AS stddev
              FROM v),
            tot AS (SELECT SUM(CAST(w6 AS DECIMAL(28,14))) AS t FROM w)
            SELECT stratum AS c_mktsegment, n_rows, stddev,
              CASE WHEN t > 0
                THEN ROUND(w6 / CAST(t AS DOUBLE), 6) ELSE 0.0 END
                AS alloc_share,
              CASE WHEN t > 0
                THEN LEAST(n_rows, CAST(FLOOR(1000.0 *
                  (w6 / CAST(t AS DOUBLE))) AS BIGINT))
                ELSE 0 END AS n_alloc
            FROM w CROSS JOIN tot ORDER BY c_mktsegment"""))

  val q179 = QueryDef(
    "q179_class_diversity_sumvector",
    "within-class semantic diversity WITHOUT pair enumeration - the " +
      "sum-vector identity (mean pairwise cosine of unit vectors from " +
      "per-dimension component sums, O(n*dim) vs O(n^2*dim) pairs): " +
      "per embedding label, n and the mean pairwise cosine on the " +
      "q90-style quantized unit vectors - exact integer sums, one " +
      "fixed-order double division",
    (s, dir) =>
      Similarity.classDiversity(
          t(s, dir, "embeddings").withColumn("label", col("label").cast("long")))
        .orderBy("label"),
    Some("""WITH v0 AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            n0 AS (SELECT vec_id, label, e,
                sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(e, x -> x * x)), (a, b) -> a + b)) AS nrm
              FROM v0),
            f0 AS (SELECT * FROM n0 WHERE NOT isnan(nrm) AND nrm > 0),
            ex AS (SELECT vec_id, label, i AS pos,
                CAST(ROUND(e[i] / nrm * 1000000) AS BIGINT) AS vq
              FROM (SELECT vec_id, label, e, nrm,
                      unnest(generate_series(1, len(e))) AS i FROM f0)),
            pv AS (SELECT label, vec_id,
                SUM(CAST(vq AS HUGEINT) * vq) AS sq FROM ex GROUP BY 1, 2),
            sd AS (SELECT label, pos, CAST(SUM(vq) AS BIGINT) AS s
              FROM ex GROUP BY 1, 2),
            s2 AS (SELECT label, SUM(CAST(s AS HUGEINT) * s) AS s2
              FROM sd GROUP BY 1),
            ag AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                SUM(sq) AS qsum FROM pv GROUP BY 1)
            SELECT ag.label, n_vecs,
              CASE WHEN n_vecs > 1 THEN
                ROUND(CAST(s2 - qsum AS DOUBLE) / 1000000000000.0 /
                  CAST(n_vecs * (n_vecs - 1) AS DOUBLE), 6) END
                AS mean_pairwise_cos
            FROM ag JOIN s2 USING (label) ORDER BY label"""))

  val q181 = QueryDef(
    "q181_cross_source_duplication",
    "cross-source duplication matrix: every 2nd doc re-ingested under " +
      "the NEXT source (the mirror-scrape shape) - per source pair, " +
      "shared distinct contents and content-set Jaccard from the " +
      "distinct (sha256, source) frame; the self-join fans out per " +
      "CONTENT by slice count only, text never shuffles",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val copies = d.where(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id"), col("text"),
          concat(lit("src"),
            pmod(pmod(col("doc_id"), lit(20)) + 1, lit(20)).cast("string"))
            .as("source"))
      Dedup.crossSliceOverlap(
        d.select(col("doc_id"), col("text"), col("source"))
          .unionByName(copies))
    },
    Some("""WITH g AS (SELECT text, source FROM documents
              UNION ALL
              SELECT text,
                'src' || CAST((doc_id % 20 + 1) % 20 AS VARCHAR) AS source
              FROM documents WHERE doc_id % 2 = 0),
            hs AS (SELECT DISTINCT sha256(text) AS h, source AS sl FROM g),
            per AS (SELECT sl, CAST(COUNT(*) AS BIGINT) AS n FROM hs
              GROUP BY sl),
            sh AS (SELECT a.sl AS sl_a, b.sl AS sl_b,
                CAST(COUNT(*) AS BIGINT) AS shared
              FROM hs a JOIN hs b ON a.h = b.h AND a.sl < b.sl
              GROUP BY 1, 2)
            SELECT sl_a, sl_b, shared, pa.n AS n_a, pb.n AS n_b,
              ROUND(shared * 1.0 / (pa.n + pb.n - shared), 4) AS jaccard
            FROM sh JOIN per pa ON sh.sl_a = pa.sl
                    JOIN per pb ON sh.sl_b = pb.sl
            ORDER BY sl_a, sl_b"""))

  val q182 = QueryDef(
    "q182_tfidf_salient_terms",
    "TF-IDF salient terms: top-3 keywords per document under the " +
      "smoothed idf tf*(ln((N+1)/(df+1))+1), score rounded BEFORE " +
      "ranking with term-string tie-breaks (the q36 rule) so rank " +
      "order is engine-stable; top-k rides the TopKPerKey heap " +
      "(partition-local trim before the exchange)",
    (s, dir) =>
      graft.operators.Retrieval.salientTerms(t(s, dir, "documents"), k = 3)
        .orderBy("doc_id", "rank"),
    Some("""WITH tok AS (SELECT doc_id AS id,
                unnest(list_filter(string_split_regex(lower(text), '\s+'),
                  w -> w <> '')) AS term
              FROM documents),
            tf AS (SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM tok GROUP BY 1, 2),
            dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfreq
              FROM tf GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
            sc AS (SELECT id, term, tf,
                ROUND(tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (dfreq + 1))
                  + 1), 6) AS tfidf
              FROM tf JOIN dfreq USING (term) CROSS JOIN n),
            r AS (SELECT id, term, tf, tfidf,
                ROW_NUMBER() OVER (PARTITION BY id
                  ORDER BY tfidf DESC, term) AS rank
              FROM sc)
            SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank, term, tf,
              tfidf
            FROM r WHERE rank <= 3 ORDER BY doc_id, rank"""))

  val q183 = QueryDef(
    "q183_benford_first_digit",
    "Benford first-digit audit (Newcomb 1881/Benford 1938 - the " +
      "fabrication screen): leading-digit distribution of " +
      "l_extendedprice vs log10(1+1/d), per-digit chi-square " +
      "contributions; the leading digit reads from the DECIMAL string " +
      "rendering (no E-notation hazard), expectations compute in-engine " +
      "under the libm-then-round rule",
    (s, dir) =>
      graft.operators.Profile.benfordAudit(
        t(s, dir, "lineitem"), col("l_extendedprice")),
    Some("""WITH src AS (SELECT regexp_extract(CAST(CAST(ABS(
                  l_extendedprice) AS DECIMAL(38,6)) AS VARCHAR),
                  '[1-9]', 0) AS digit
              FROM lineitem),
            obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM src
              WHERE digit IS NOT NULL AND digit <> '' GROUP BY 1),
            filled AS (SELECT CAST(t.d AS INTEGER) AS digit,
                COALESCE(n, 0) AS n
              FROM (SELECT unnest(range(1, 10)) AS d) t
              LEFT JOIN obs ON CAST(t.d AS VARCHAR) = obs.digit),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM filled)
            SELECT digit, n,
              ROUND(n * 1.0 / nt, 6) AS obs_share,
              ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS exp_share,
              ROUND((n - nt * ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6)) *
                    (n - nt * ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6)) /
                    (nt * ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6)), 6)
                AS chi2_contrib
            FROM filled CROSS JOIN tot ORDER BY digit"""))

  val q184 = QueryDef(
    "q184_langid_confusion_matrix",
    "classifier-vs-label confusion matrix: the stop-word language " +
      "guesser scored against the declared lang column - per (label, " +
      "guess) cell, count, label-row share (diagonal = recall) and " +
      "guess-column share (diagonal = precision); the eval primitive " +
      "any model-derived gate column needs against a labeled slice",
    (s, dir) =>
      Quality.confusionMatrix(
        t(s, dir, "documents")
          .select(col("lang"), TextOps.languageId(col("text")).as("guess")),
        "lang", "guess"),
    Some("""WITH h AS (
              SELECT lang,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['the','a','an','and','of','to','in','is','on','for'], t))) AS BIGINT) AS en,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['el','la','los','de','que','y','en','un','una','por'], t))) AS BIGINT) AS es,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['der','die','das','und','ein','eine','zu','mit','von','ist'], t))) AS BIGINT) AS de,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['le','la','les','et','un','une','des','du','est','dans'], t))) AS BIGINT) AS fr
              FROM documents),
            g AS (SELECT lang,
                CASE WHEN en > 0 AND en >= GREATEST(en, es, de, fr) THEN 'en'
                     WHEN es > 0 AND es >= GREATEST(en, es, de, fr) THEN 'es'
                     WHEN de > 0 AND de >= GREATEST(en, es, de, fr) THEN 'de'
                     WHEN fr > 0 AND fr >= GREATEST(en, es, de, fr) THEN 'fr'
                     ELSE 'und' END AS guess
              FROM h),
            cells AS (SELECT lang AS label, guess AS pred,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM g WHERE lang IS NOT NULL AND guess IS NOT NULL
              GROUP BY 1, 2),
            rt AS (SELECT label, CAST(SUM(n) AS BIGINT) AS lt FROM cells
              GROUP BY 1),
            ct AS (SELECT pred, CAST(SUM(n) AS BIGINT) AS pt FROM cells
              GROUP BY 1)
            SELECT label AS lang, pred AS guess, n,
              ROUND(n * 1.0 / lt, 4) AS row_share,
              ROUND(n * 1.0 / pt, 4) AS col_share,
              (label = pred) AS correct
            FROM cells JOIN rt USING (label) JOIN ct USING (pred)
            ORDER BY lang, guess"""))

  val q185 = QueryDef(
    "q185_source_concentration_gini",
    "token-mass concentration across sources: Gini coefficient (exact " +
      "ascending-rank formula, ties broken by source - a total order), " +
      "largest-source share and top-decile share - the domain-" +
      "concentration read of a corpus mix review; ranking rides the " +
      "two-pass global prefix (no single-task window), sums in exact " +
      "decimal, one fixed-order double combination",
    (s, dir) =>
      graft.operators.Profile.concentration(
        t(s, dir, "documents"), "source",
        TextOps.tokenCount(col("text"))),
    Some("""WITH g AS (SELECT source AS k,
                CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
                  AS x
              FROM documents WHERE source IS NOT NULL GROUP BY 1),
            r AS (SELECT k, x,
                ROW_NUMBER() OVER (ORDER BY x, k) AS i FROM g),
            st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
                SUM(CAST(x AS HUGEINT)) AS tot,
                SUM(CAST(x AS HUGEINT) * i) AS iwx,
                MAX(x) AS xmax
              FROM r),
            td AS (SELECT SUM(CAST(r.x AS HUGEINT)) AS topx
              FROM r CROSS JOIN st
              WHERE r.i > st.n_groups - CEIL(st.n_groups / 10.0))
            SELECT n_groups, CAST(tot AS BIGINT) AS total,
              CASE WHEN n_groups > 1 AND tot > 0 THEN
                ROUND(2.0 * CAST(iwx AS DOUBLE) /
                  (CAST(n_groups AS DOUBLE) * CAST(tot AS DOUBLE)) -
                  (CAST(n_groups AS DOUBLE) + 1.0) /
                  CAST(n_groups AS DOUBLE), 6) END AS gini,
              CASE WHEN tot > 0 THEN
                ROUND(CAST(xmax AS DOUBLE) / CAST(tot AS DOUBLE), 6) END
                AS top1_share,
              ROUND(CAST(topx AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                AS top_decile_share
            FROM st CROSS JOIN td"""))

  val q189 = QueryDef(
    "q189_retrieval_average_precision",
    "average precision at 5 of q75's batched BM25 against the q112 " +
      "pseudo-qrels (binary relevance) - the order-sensitive " +
      "completion of the RR/DCG/nDCG family: AP punishes every " +
      "relevant doc ranked below a non-relevant one; precision " +
      "contributions decimal-accumulated, denominator min(|rel|, 5)",
    (s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val qtab = Seq(
        (1L, "key"), (1L, "table"), (1L, "hash"),
        (2L, "window"), (2L, "batch"), (2L, "spark"))
        .toDF("query_id", "term")
      val ranked = graft.operators.Retrieval.bm25BatchFromIndex(
        graft.operators.Retrieval.buildIndex(d), qtab, topK = 5)
      val rels = d
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
        .join(broadcast(qtab.select(col("query_id"), col("term").as("tok"))),
          Seq("tok"))
        .groupBy("query_id", "doc_id")
        .agg(countDistinct(col("tok")).as("grade"))
        .filter(col("grade") >= 2)
      graft.operators.Retrieval.averagePrecision(ranked, rels, depth = 5)
        .orderBy("query_id")
    },
    Some("""WITH q(qid, tok) AS (VALUES (1, 'key'), (1, 'table'), (1, 'hash'),
                 (2, 'window'), (2, 'batch'), (2, 'spark')),
            lens AS (SELECT doc_id,
                       CAST(len(list_filter(string_split_regex(text, '\s+'),
                         t -> t <> '')) AS BIGINT) AS dl
                     FROM documents),
            st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens),
            tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
                         FROM documents)
                   WHERE tok IN (SELECT tok FROM q) GROUP BY doc_id, tok),
            dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
            c AS (SELECT q.qid, tf.doc_id,
                    ROUND(ln((st.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                          * (tf.tf * (1.2 + 1.0))
                          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * lens.dl / st.avgdl)),
                      6) AS c
                  FROM q JOIN tf USING (tok) JOIN dfreq USING (tok)
                    JOIN lens USING (doc_id) CROSS JOIN st),
            s AS (SELECT qid, doc_id,
                    ROUND(CAST(SUM(CAST(c AS DECIMAL(30,6))) AS DOUBLE), 4) AS score
                  FROM c GROUP BY qid, doc_id),
            rnk AS (SELECT qid, doc_id,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY score DESC, doc_id) AS rk
                    FROM s),
            ranked AS (SELECT qid, doc_id, rk FROM rnk WHERE rk <= 5),
            rels AS (SELECT q.qid, tf.doc_id,
                       CAST(COUNT(DISTINCT tf.tok) AS BIGINT) AS grade
                     FROM tf JOIN q USING (tok)
                     GROUP BY 1, 2 HAVING COUNT(DISTINCT tf.tok) >= 2),
            hits AS (SELECT ranked.qid, ranked.rk,
                       row_number() OVER (PARTITION BY ranked.qid
                                          ORDER BY ranked.rk) AS idx
                     FROM ranked JOIN rels
                       ON ranked.qid = rels.qid AND ranked.doc_id = rels.doc_id),
            aps AS (SELECT qid,
                      SUM(CAST(idx * 1.0 / rk AS DECIMAL(28,14))) AS psum,
                      CAST(COUNT(*) AS BIGINT) AS n_hits
                    FROM hits GROUP BY 1),
            nr AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel FROM rels
                   GROUP BY 1)
            SELECT CAST(nr.qid AS BIGINT) AS query_id, n_rel,
              COALESCE(n_hits, 0) AS n_hits,
              ROUND(CAST(COALESCE(psum, 0) AS DOUBLE) /
                CAST(LEAST(n_rel, 5) AS DOUBLE), 6) AS ap
            FROM nr LEFT JOIN aps ON nr.qid = aps.qid
            ORDER BY query_id"""))

  val q192 = QueryDef(
    "q192_script_mix_profile",
    "Unicode script profiling + mixed-script detection (the homoglyph-" +
      "spoofing shape: latin-dominant text carrying a few Cyrillic " +
      "letters): per language, per-script letter totals and the " +
      "mixed-script doc count over grafted Cyrillic/Greek/CJK/Arabic " +
      "tails - literal code-point ranges, not p{...} classes, so Java " +
      "and RE2 compile the SAME character sets",
    (s, dir) => {
      val d = t(s, dir, "documents")
      def tail(m: Int, t0: String) =
        when(pmod(col("doc_id"), lit(m)) === 0, lit(t0)).otherwise(lit(""))
      val g = d.select(col("doc_id"), col("lang"),
        concat(col("text"),
          tail(4, " привет мир"), tail(9, " γειά σου"),
          tail(25, " 你好世界"), tail(49, " مرحبا")).as("text"))
      g.select(col("lang"),
          TextOps.scriptCount(col("text"), "latin").as("lat"),
          TextOps.scriptCount(col("text"), "cyrillic").as("cyr"),
          TextOps.scriptCount(col("text"), "greek").as("grk"),
          TextOps.scriptCount(col("text"), "cjk").as("cjk"),
          TextOps.scriptCount(col("text"), "arabic").as("ara"),
          (TextOps.scriptsPresent(col("text")) >= 2).as("mixed"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("lat").as("latin_chars"), sum("cyr").as("cyrillic_chars"),
          sum("grk").as("greek_chars"), sum("cjk").as("cjk_chars"),
          sum("ara").as("arabic_chars"),
          count(when(col("mixed"), lit(1))).as("n_mixed"))
        .orderBy("lang")
    },
    Some("""WITH g AS (SELECT lang, text ||
              CASE WHEN doc_id % 4 = 0 THEN ' привет мир' ELSE '' END ||
              CASE WHEN doc_id % 9 = 0 THEN ' γειά σου' ELSE '' END ||
              CASE WHEN doc_id % 25 = 0 THEN ' 你好世界' ELSE '' END ||
              CASE WHEN doc_id % 49 = 0 THEN ' مرحبا' ELSE '' END AS t
              FROM documents),
            c AS (SELECT lang,
                CAST(length(t) - length(regexp_replace(t, '[A-Za-z]', '',
                  'g')) AS BIGINT) AS lat,
                CAST(length(t) - length(regexp_replace(t, '[Ѐ-ӿ]', '',
                  'g')) AS BIGINT) AS cyr,
                CAST(length(t) - length(regexp_replace(t, '[Ͱ-Ͽ]', '',
                  'g')) AS BIGINT) AS grk,
                CAST(length(t) - length(regexp_replace(t, '[一-鿿]', '',
                  'g')) AS BIGINT) AS cjk,
                CAST(length(t) - length(regexp_replace(t, '[؀-ۿ]', '',
                  'g')) AS BIGINT) AS ara
              FROM g),
            m AS (SELECT lang, lat, cyr, grk, cjk, ara,
                ((CASE WHEN lat > 0 THEN 1 ELSE 0 END) +
                 (CASE WHEN cyr > 0 THEN 1 ELSE 0 END) +
                 (CASE WHEN grk > 0 THEN 1 ELSE 0 END) +
                 (CASE WHEN cjk > 0 THEN 1 ELSE 0 END) +
                 (CASE WHEN ara > 0 THEN 1 ELSE 0 END)) >= 2 AS mixed
              FROM c)
            SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(lat) AS BIGINT) AS latin_chars,
              CAST(SUM(cyr) AS BIGINT) AS cyrillic_chars,
              CAST(SUM(grk) AS BIGINT) AS greek_chars,
              CAST(SUM(cjk) AS BIGINT) AS cjk_chars,
              CAST(SUM(ara) AS BIGINT) AS arabic_chars,
              CAST(SUM(CASE WHEN mixed THEN 1 ELSE 0 END) AS BIGINT)
                AS n_mixed
            FROM m GROUP BY lang ORDER BY lang"""))

  val q196 = QueryDef(
    "q196_langid_cohens_kappa",
    "Cohen's kappa of the language guesser vs the declared label - " +
      "the chance-corrected completion of q184's confusion matrix " +
      "(raw accuracy flatters any classifier on a skewed label mix): " +
      "one-row (n, accuracy, expected agreement, kappa), marginal " +
      "products in exact decimal, fixed-order double combination",
    (s, dir) =>
      Quality.cohensKappa(
        t(s, dir, "documents")
          .select(col("lang"), TextOps.languageId(col("text")).as("guess")),
        "lang", "guess"),
    Some("""WITH h AS (
              SELECT lang,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['the','a','an','and','of','to','in','is','on','for'], t))) AS BIGINT) AS en,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['el','la','los','de','que','y','en','un','una','por'], t))) AS BIGINT) AS es,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['der','die','das','und','ein','eine','zu','mit','von','ist'], t))) AS BIGINT) AS de,
                CAST(len(list_filter(string_split_regex(text,'\s+'), t -> list_contains(['le','la','les','et','un','une','des','du','est','dans'], t))) AS BIGINT) AS fr
              FROM documents),
            g AS (SELECT lang,
                CASE WHEN en > 0 AND en >= GREATEST(en, es, de, fr) THEN 'en'
                     WHEN es > 0 AND es >= GREATEST(en, es, de, fr) THEN 'es'
                     WHEN de > 0 AND de >= GREATEST(en, es, de, fr) THEN 'de'
                     WHEN fr > 0 AND fr >= GREATEST(en, es, de, fr) THEN 'fr'
                     ELSE 'und' END AS guess
              FROM h),
            cells AS (SELECT lang AS l, guess AS p,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM g WHERE lang IS NOT NULL AND guess IS NOT NULL
              GROUP BY 1, 2),
            r AS (SELECT l, CAST(SUM(n) AS BIGINT) AS nl FROM cells
              GROUP BY 1),
            c AS (SELECT p, CAST(SUM(n) AS BIGINT) AS np FROM cells
              GROUP BY 1),
            a AS (SELECT CAST(SUM(n) AS BIGINT) AS tot,
                CAST(COALESCE(SUM(CASE WHEN l = p THEN n END), 0) AS BIGINT)
                  AS diag FROM cells),
            pe AS (SELECT COALESCE(SUM(CAST(nl AS HUGEINT) * np), 0)
                AS pesum FROM r JOIN c ON r.l = c.p)
            SELECT tot AS n,
              ROUND(CAST(diag AS DOUBLE) / tot, 6) AS accuracy,
              ROUND(CAST(pesum AS DOUBLE) /
                (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6)
                AS expected_agreement,
              CASE WHEN CAST(pesum AS DOUBLE) <
                  CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE) THEN
                ROUND((CAST(diag AS DOUBLE) / tot -
                    CAST(pesum AS DOUBLE) /
                    (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))) /
                  (1.0 - CAST(pesum AS DOUBLE) /
                    (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))), 6) END
                AS kappa
            FROM a CROSS JOIN pe"""))

  val q197 = QueryDef(
    "q197_gate_rate_wilson_ci",
    "Wilson score interval on a gate's pass rate per language (the " +
      "small-n-safe binomial CI - a normal interval collapses to +-0 " +
      "at k=0 or k=n, exactly where a gate dashboard most needs " +
      "honesty): the Gopher word-count rule as the gate, z=1.96; the " +
      "z*z literal is WRITTEN as a product in both engines so the " +
      "IEEE value is identical",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val m = Quality.gopherRules(d.select(col("doc_id"), col("text")))
      m.join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          count(when(col("r_word_count"), lit(1))).as("k"))
        .select(col("lang"), col("n"), col("k"),
          round(col("k") * lit(1.0) / col("n"), 6).as("rate"),
          round(Quality.wilsonLo(col("k"), col("n")), 6).as("wilson_lo"),
          round(Quality.wilsonHi(col("k"), col("n")), 6).as("wilson_hi"))
        .orderBy("lang")
    },
    Some("""WITH w AS (SELECT doc_id, lang,
                CAST(len(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '')) AS BIGINT) AS nw
              FROM documents),
            g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN nw BETWEEN 50 AND 100000 THEN 1
                  ELSE 0 END) AS BIGINT) AS k
              FROM w GROUP BY 1),
            p0 AS (SELECT lang, n, k,
                CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM g)
            SELECT lang, n, k,
              ROUND(k * 1.0 / n, 6) AS rate,
              ROUND(GREATEST(CAST(0 AS DOUBLE), LEAST(CAST(1 AS DOUBLE),
                (p + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2.0 * n) -
                  1.96 * sqrt(p * (1.0 - p) / n +
                    (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4.0 * n * n))) /
                (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / n))), 6)
                AS wilson_lo,
              ROUND(GREATEST(CAST(0 AS DOUBLE), LEAST(CAST(1 AS DOUBLE),
                (p + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (2.0 * n) +
                  1.96 * sqrt(p * (1.0 - p) / n +
                    (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / (4.0 * n * n))) /
                (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / n))), 6)
                AS wilson_hi
            FROM p0 ORDER BY lang"""))

  val q199 = QueryDef(
    "q199_trending_terms",
    "trending-term detection: term-velocity z against each term's own " +
      "trailing baseline over ALL prior days (absent days are genuine " +
      "zero counts - a term seen once before is a burst, not a " +
      "regular); docs dealt onto 30 synthetic days by doc_id, the max " +
      "day carrying a grafted 'merge' burst the monitor must surface; " +
      "drift says THAT the mix moved, this names the terms",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val burst = " merge merge merge merge merge merge merge merge merge merge"
      val g = d.select(pmod(col("doc_id"), lit(30)).as("day"),
        when(pmod(col("doc_id"), lit(30)) === 29,
          concat(col("text"), lit(burst))).otherwise(col("text")).as("text"))
      Quality.trendingTerms(g, col("day"))
    },
    Some("""WITH g AS (SELECT doc_id % 30 AS day,
                lower(text || CASE WHEN doc_id % 30 = 29 THEN
                  ' merge merge merge merge merge merge merge merge merge merge'
                  ELSE '' END) AS t
              FROM documents),
            tok AS (SELECT day, unnest(list_filter(
                string_split_regex(t, '\s+'), w -> w <> '')) AS term
              FROM g),
            c AS (SELECT day, term, CAST(COUNT(*) AS BIGINT) AS c
              FROM tok GROUP BY 1, 2),
            cal AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS nd,
                MAX(day) AS d1 FROM c),
            cur AS (SELECT term, c AS c_today FROM c CROSS JOIN cal
              WHERE day = d1),
            pri AS (SELECT term,
                CAST(SUM(c) AS BIGINT) AS s1,
                CAST(SUM(c * c) AS BIGINT) AS s2,
                MAX(nd) AS nd
              FROM c CROSS JOIN cal WHERE day < d1 GROUP BY 1)
            SELECT term, c_today,
              ROUND(CAST(s1 AS DOUBLE) / CAST(nd - 1 AS DOUBLE), 4)
                AS mean_prior,
              ROUND(sqrt((CAST(s2 AS DOUBLE) -
                  CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
                  CAST(nd - 1 AS DOUBLE)) /
                (CAST(nd - 1 AS DOUBLE) - 1.0)), 4) AS sd_prior,
              ROUND((c_today - CAST(s1 AS DOUBLE) / CAST(nd - 1 AS DOUBLE)) /
                sqrt((CAST(s2 AS DOUBLE) -
                    CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
                    CAST(nd - 1 AS DOUBLE)) /
                  (CAST(nd - 1 AS DOUBLE) - 1.0)), 4) AS z
            FROM cur JOIN pri USING (term)
            WHERE nd >= 3 AND
              (CAST(s2 AS DOUBLE) -
                CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
                CAST(nd - 1 AS DOUBLE)) /
              (CAST(nd - 1 AS DOUBLE) - 1.0) > 0
            ORDER BY z DESC, term LIMIT 15"""))

  val q200 = QueryDef(
    "q200_source_scorecard",
    "the source governance scorecard - the one table a curation " +
      "review reads, composing the session's signal families per " +
      "source: volume (docs/tokens/token share), the Gopher word-" +
      "count gate rate, language-ID accuracy against the declared " +
      "label, mean type-token ratio, and the mean composite quality " +
      "score; means through exact decimal (the davg rule), one " +
      "corpus pass plus source-sized arithmetic",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val staged = d.select(col("source"), col("lang"), col("text"),
        split(col("text"), "\\s+").as("toks"))
      val base = staged.select(col("source"),
        size(col("toks")).cast(LongType).as("nt"),
        (TextOps.languageIdToks(col("toks")) === col("lang")).as("lid_ok"),
        TextOps.qualityScore(col("text")).as("q"),
        round(size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")), 4).as("ttr"))
      val agg = base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("nt").as("n_tokens"),
        count(when(col("nt") >= 50 && col("nt") <= 100000, lit(1)))
          .as("__wc"),
        count(when(col("lid_ok"), lit(1))).as("__lid"),
        sum(dec(col("ttr"))).as("__sttr"),
        sum(dec(col("q"))).as("__sq"))
      val tot = agg.agg(sum("n_tokens").as("__t"))
      agg.crossJoin(broadcast(tot)).select(
          col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens") * lit(1.0) / col("__t"), 6).as("token_share"),
          round(col("__wc") * lit(1.0) / col("n_docs"), 4).as("wc_pass_rate"),
          round(col("__lid") * lit(1.0) / col("n_docs"), 4).as("langid_acc"),
          round(col("__sttr").cast("double") / col("n_docs"), 4).as("avg_ttr"),
          round(col("__sq").cast("double") / col("n_docs"), 4)
            .as("avg_quality"))
        .orderBy("source")
    },
    Some("""WITH x AS (SELECT source, lang, text,
                string_split_regex(text, '\s+') AS t FROM documents),
            y AS (SELECT source, lang, text, t,
                CAST(len(t) AS BIGINT) AS nt,
                CAST(len(list_filter(t, w -> list_contains(['the','a','an','and','of','to','in','is','on','for'], w))) AS BIGINT) AS en,
                CAST(len(list_filter(t, w -> list_contains(['el','la','los','de','que','y','en','un','una','por'], w))) AS BIGINT) AS es,
                CAST(len(list_filter(t, w -> list_contains(['der','die','das','und','ein','eine','zu','mit','von','ist'], w))) AS BIGINT) AS de,
                CAST(len(list_filter(t, w -> list_contains(['le','la','les','et','un','une','des','du','est','dans'], w))) AS BIGINT) AS fr
              FROM x),
            b AS (SELECT source, nt,
                ((CASE WHEN en > 0 AND en >= GREATEST(en, es, de, fr)
                    THEN 'en'
                  WHEN es > 0 AND es >= GREATEST(en, es, de, fr) THEN 'es'
                  WHEN de > 0 AND de >= GREATEST(en, es, de, fr) THEN 'de'
                  WHEN fr > 0 AND fr >= GREATEST(en, es, de, fr) THEN 'fr'
                  ELSE 'und' END) = lang) AS lid_ok,
                CAST(ROUND(CAST(LEAST(nt / 50.0, 1.0) * 0.5
                    + (1.0 - ABS(en * 1.0 / nt - 0.4)) * 0.3
                    + LEAST(((length(text) - (nt - 1)) * 1.0 / nt) / 8.0,
                        1.0) * 0.2
                    AS DECIMAL(28,14)), 4) AS DOUBLE) AS q,
                ROUND(len(list_distinct(t)) * 1.0 / len(t), 4) AS ttr
              FROM y),
            agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS n_tokens,
                CAST(SUM(CASE WHEN nt BETWEEN 50 AND 100000 THEN 1
                  ELSE 0 END) AS BIGINT) AS wc,
                CAST(SUM(CASE WHEN lid_ok THEN 1 ELSE 0 END) AS BIGINT)
                  AS lid,
                SUM(CAST(ttr AS DECIMAL(30,6))) AS sttr,
                SUM(CAST(q AS DECIMAL(30,6))) AS sq
              FROM b GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM agg)
            SELECT source, n_docs, n_tokens,
              ROUND(n_tokens * 1.0 / tt, 6) AS token_share,
              ROUND(wc * 1.0 / n_docs, 4) AS wc_pass_rate,
              ROUND(lid * 1.0 / n_docs, 4) AS langid_acc,
              ROUND(CAST(sttr AS DOUBLE) / n_docs, 4) AS avg_ttr,
              ROUND(CAST(sq AS DOUBLE) / n_docs, 4) AS avg_quality
            FROM agg CROSS JOIN tot ORDER BY source"""))

  val q205 = QueryDef(
    "q205_unigram_lm_train",
    "unigram-LM tokenizer TRAINING (Kudo 2018, the SentencePiece " +
      "default; the other production tokenizer family next to q78's " +
      "BPE): seed with the most frequent substrings (+ all single " +
      "chars), 3 rounds of hard-EM - distributed Viterbi best-" +
      "segmentation counting over the DISTINCT-WORD frame against a " +
      "broadcast piece table, model-sized count collect, driver " +
      "renormalize - then keep the strongest pieces. FULL generated-SQL " +
      "hash oracle (r14, closing the r13 adjudication): per-piece " +
      "scores QUANTIZE to micro-nat int64 inside the trainer (the q217 " +
      "exact-integer rule), so every Viterbi path sum is an exact " +
      "integer and the DP replays engine-portably - the forward pass " +
      "unrolls per EM round as a RECURSIVE CTE over consumed-prefix " +
      "length carrying a maxPieceLen sliding window of best scores, " +
      "the backtrack as a second recursive CTE re-deriving the argmax " +
      "with the longest-piece tie-break as exact integer equalities",
    (s, dir) => {
      val m = graft.operators.UnigramLm.train(t(s, dir, "documents"),
        seedSize = 300, maxPieceLen = 4, iters = 3, vocabSize = 120)
      graft.operators.UnigramLm.vocabTable(s, m).orderBy("rank")
    },
    Some(graft.operators.UnigramLm.trainSqlCtes("documents",
      seedSize = 300, maxPieceLen = 4, iters = 3, vocabSize = 120)))

  val q206 = QueryDef(
    "q206_unigram_seed_candidates",
    "portable twin of q205's seed phase: count-weighted substring " +
      "candidates (length <= 4) over the word vocabulary, top-25 under " +
      "the trainer's exact selection order (cnt DESC, piece ASC) - " +
      "hash-gates the corpus->vocab reduction and the candidate " +
      "inventory every unigram-LM round starts from",
    (s, dir) => {
      val vocab = graft.operators.BpeTrain.wordVocab(t(s, dir, "documents"))
      graft.operators.UnigramLm.seedCandidates(vocab, maxPieceLen = 4)
        .orderBy(col("cnt").desc, col("piece")).limit(25)
    },
    Some("""WITH wds AS (SELECT unnest(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS word FROM documents),
            wv AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS w FROM wds
              WHERE word <> '' GROUP BY word),
            px AS (SELECT word, w,
                unnest(generate_series(1, length(word))) AS i FROM wv),
            ps AS (SELECT substring(word, i, l) AS piece, w
              FROM (SELECT word, w, i,
                unnest(generate_series(1,
                  least(4, length(word) - i + 1))) AS l FROM px))
            SELECT piece, CAST(SUM(w) AS BIGINT) AS cnt FROM ps
            GROUP BY 1 ORDER BY cnt DESC, piece LIMIT 25"""))

  val q208 = QueryDef(
    "q208_chi2_term_source",
    "chi-squared term-source association (Manning & Schutze ch.5 / " +
      "Yang & Pedersen 1997 feature selection): per source the top-5 " +
      "terms by the 2x2 document-presence contingency chi2 - the " +
      "statistic that names the terms making a slice read like itself " +
      "(TF-IDF ranks within a doc, PMI pairs terms, KL scores the " +
      "whole slice); exact long contingency cells, the squared " +
      "difference moves to double AFTER the exact subtraction, chi2 " +
      "rounds before the heap-operator rank",
    (s, dir) =>
      graft.operators.Quality.chiSquaredTerms(t(s, dir, "documents"))
        .orderBy("slice", "rank"),
    Some("""WITH raw AS (SELECT doc_id AS id, source AS slice,
                unnest(list_filter(string_split_regex(lower(text), '\s+'),
                  w -> w <> '')) AS term
              FROM documents WHERE source IS NOT NULL),
            pres AS (SELECT DISTINCT id, slice, term FROM raw),
            st AS (SELECT slice, term, CAST(COUNT(*) AS BIGINT) AS a
              FROM pres GROUP BY 1, 2),
            tt AS (SELECT term, CAST(SUM(a) AS BIGINT) AS t_total
              FROM st GROUP BY 1),
            sn AS (SELECT slice, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_s
              FROM pres GROUP BY 1),
            nn AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_total FROM sn),
            j AS (SELECT slice, term, a, t_total, n_s, n_total
              FROM st JOIN tt USING (term) JOIN sn USING (slice)
              CROSS JOIN nn
              WHERE t_total >= 5 AND t_total < n_total),
            k AS (SELECT slice, term, a, n_total,
                n_s - a AS b, t_total - a AS c,
                n_total - n_s - (t_total - a) AS d FROM j),
            sc AS (SELECT slice, term, a AS df_in,
                ROUND(CAST(n_total AS DOUBLE)
                  * CAST(a * d - b * c AS DOUBLE)
                  * CAST(a * d - b * c AS DOUBLE)
                  / (CAST((a + b) * (c + d) AS DOUBLE)
                    * CAST((a + c) * (b + d) AS DOUBLE)), 4) AS chi2,
                CASE WHEN a * d - b * c > 0 THEN 'over' ELSE 'under' END
                  AS direction
              FROM k),
            r AS (SELECT slice, term, df_in, chi2, direction,
                ROW_NUMBER() OVER (PARTITION BY slice
                  ORDER BY chi2 DESC, term) AS rank
              FROM sc)
            SELECT slice, term, df_in, chi2, direction, rank
            FROM r WHERE rank <= 5 ORDER BY slice, rank"""))

  val q211 = QueryDef(
    "q211_code_prose_router",
    "code-vs-prose routing gate (the corpus router: code wants " +
      "different dedup/quality/tokenizer settings than prose, and " +
      "crawls interleave them): structural-symbol density + code-" +
      "keyword token rate, saturating 0.6/0.4 blend; every 9th doc's " +
      "text is replaced by a grafted code snippet the router must " +
      "flag; per source: docs, flagged count/rate, exact-decimal mean " +
      "score",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val code = lit("def run(x) { return x + 1; } val y = f(x); " +
        "if (y > 0) { while (y < 9) { y = y + 1; } }")
      val staged = d.select(col("source"),
        when(pmod(col("doc_id"), lit(9)) === 0, code)
          .otherwise(col("text")).as("text"))
      val scored = staged.select(col("source"),
        TextOps.codeScore(col("text")).as("score"))
      scored.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          count(when(col("score") >= 0.5, lit(1))).as("n_code"),
          round(count(when(col("score") >= 0.5, lit(1))) * lit(1.0) /
            count(lit(1)), 4).as("code_rate"),
          round(sum(dec(col("score"))).cast("double") / count(lit(1)), 4)
            .as("avg_score"))
        .orderBy("source")
    },
    Some("""WITH g AS (SELECT source,
                CASE WHEN doc_id % 9 = 0 THEN
                  'def run(x) { return x + 1; } val y = f(x); if (y > 0) { while (y < 9) { y = y + 1; } }'
                ELSE text END AS text
              FROM documents),
            f AS (SELECT source, text,
                CAST(length(text) AS DOUBLE) AS n,
                CAST(length(text) - length(regexp_replace(text,
                  '[\[\]{}();=<>]', '', 'g')) AS DOUBLE) AS sym,
                list_filter(string_split_regex(lower(text), '\s+'),
                  w -> w <> '') AS toks
              FROM g),
            sc AS (SELECT source,
                CASE WHEN n > 0 AND len(toks) > 0 THEN
                  ROUND(LEAST(sym / n * 6.0, 1.0) * 0.6 +
                    LEAST(CAST(len(list_filter(toks, w ->
                      list_contains(['def','return','import','var','val',
                        'if','else','for','while','class','function'], w)))
                      AS DOUBLE) / len(toks) * 8.0, 1.0) * 0.4, 4)
                ELSE 0.0 END AS score
              FROM f)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_code,
              ROUND(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) * 1.0
                / COUNT(*), 4) AS code_rate,
              ROUND(CAST(SUM(CAST(score AS DECIMAL(30,6))) AS DOUBLE)
                / COUNT(*), 4) AS avg_score
            FROM sc GROUP BY 1 ORDER BY source"""))

  val q215 = QueryDef(
    "q215_kcenter_diverse_selection",
    "greedy k-center selection (Gonzalez 1985, the 2-approx to the " +
      "NP-hard coverage objective) - the diverse-subset pick: each " +
      "round takes the point FARTHEST from everything chosen (SemDeDup " +
      "removes redundancy, this picks the spanning exemplars for eval " +
      "seeding / annotation budgets); exact int64 quantized distances, " +
      "ties (dist DESC, id), the picked_dist column IS the coverage-" +
      "radius stopping diagnostic; the BPE loop shape - k one-pass " +
      "rounds, 1-row argmax collects, k vectors of driver state; the " +
      "oracle SQL is GENERATED from the same round structure",
    (s, dir) =>
      graft.operators.Similarity.kCenterSelect(
        t(s, dir, "embeddings"), k = 5),
    Some(graft.operators.Similarity.kCenterSqlCtes("embeddings", 5)))

  /** Session-scoped handoff of q216's mined repeat frame to q225 (r15
    * verdict item 6 — 22.5 s of the 243 s sweep was the same SA pass run
    * twice): q216 ALWAYS re-mines (its bench number stays the honest
    * structural mine cost) and deposits the ≤topK collected rows here;
    * q225 reuses them when present — the PRODUCTION accounting, where
    * one mine feeds both the audit frame and the cut. Keyed by fixture
    * dir; in-JVM only (dies with the session, so a regenerated fixture
    * can never serve stale mines — the reason this is NOT a disk memo),
    * and `spark.catalog.clearCache()` does not touch it by design: the
    * rows are model-sized driver state, not cached corpus blocks. A
    * standalone q225 (scoped run, memo empty) mines for itself. */
  private val saMineMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[org.apache.spark.sql.Row]]()

  private def saAuditSlice(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "documents")
      .where(col("doc_id") % 5 === 0 && length(col("text")) >= 1)

  val q216 = QueryDef(
    "q216_suffix_array_repeats",
    "EXACT longest repeated substrings via a distributed suffix array " +
      "(Manber-Myers prefix QUADRUPLING, r19 fusion: log4 rounds of " +
      "per-doc lead() shifts + distinct 4-tuples + counted contiguous " +
      "global re-rank, never a one-task window) - the any-length " +
      "exact-repeat machinery behind " +
      "Lee et al. 2022's suffix-array dedup, where the span family " +
      "(q63-q65) fixes one window width; adjacent-suffix LCPs surface " +
      "every maximal repeat at once. The ORACLE builds the same array " +
      "by DIRECT suffix sort (ROW_NUMBER over ORDER BY suffix) - two " +
      "genuinely different algorithms, one answer. Gated on the " +
      "doc_id%5=0 audit slice - the operator doc's prescribed usage " +
      "(audit-grade exact repeat mining on a slice; full-corpus " +
      "curation sweeps stay on the O(1)-rounds span family)",
    (s, dir) => {
      val out = graft.operators.SuffixArray.longestRepeats(
        saAuditSlice(s, dir), lcpCap = 64, minLen = 20, topK = 20)
      // deposit the model-sized mined frame for q225 (the out frame is
      // already an eager ≤topK local DF — this collect is free)
      saMineMemo.put(dir, out.collect())
      out
    },
    Some("""WITH d AS (SELECT doc_id AS id, text AS txt FROM documents
                       WHERE doc_id % 5 = 0 AND length(text) >= 1),
              sfx AS (SELECT id, UNNEST(generate_series(1, length(txt))) AS pos,
                        txt FROM d),
              s2 AS (SELECT id, pos, substr(txt, CAST(pos AS INT)) AS sfx,
                       substr(txt, CAST(pos AS INT), 64) AS pfx FROM sfx),
              sa AS (SELECT id, pos, pfx,
                       ROW_NUMBER() OVER (ORDER BY sfx, id, pos) - 1 AS sa
                     FROM s2),
              adj AS (SELECT a.id AS a_doc, a.pos AS a_pos, a.pfx AS a_pfx,
                        b.id AS b_doc, b.pos AS b_pos, b.pfx AS b_pfx
                      FROM sa a JOIN sa b ON b.sa = a.sa + 1),
              l AS (SELECT *,
                      list_reduce(
                        list_prepend(CAST(0 AS BIGINT), generate_series(1, 64)),
                        (acc, i) -> CASE WHEN acc = i - 1
                            AND i <= least(length(a_pfx), length(b_pfx))
                            AND substr(a_pfx, CAST(i AS INT), 1)
                                = substr(b_pfx, CAST(i AS INT), 1)
                          THEN i ELSE acc END) AS lcp
                    FROM adj)
            SELECT CAST(lcp AS BIGINT) AS lcp,
              substr(a_pfx, 1, CAST(lcp AS INT)) AS rep,
              a_doc, CAST(a_pos AS BIGINT) AS a_pos,
              b_doc, CAST(b_pos AS BIGINT) AS b_pos
            FROM l WHERE lcp >= 20
            ORDER BY lcp DESC, a_doc, a_pos LIMIT 20"""))

  val q217 = QueryDef(
    "q217_wordpiece_train",
    "WordPiece tokenizer TRAINING (Schuster-Nakajima 2012; the BERT " +
      "tokenizer) - BPE's merge loop under the LIKELIHOOD objective " +
      "score(l,r) = count(lr)/(count(l)*count(r)) with ##-continuation " +
      "symbols; completes the third production tokenizer family next " +
      "to BPE (q78) and unigram-LM (q205/q206). Score compared as the " +
      "EXACT integer (cnt*10^12) div (cl*cr) - decimal-exact in Spark, " +
      "HUGEINT-exact in DuckDB, ties (score, cnt, l, r) - so the merge " +
      "table is corpus-deterministic at any parallelism; FULL generated-" +
      "SQL hash oracle (one symbol-count + pair-count + score-argmax + " +
      "gaps-and-islands greedy-merge CTE block per round, the q78/q215 " +
      "technique)",
    (s, dir) => {
      import s.implicits._
      WordPieceTrain.trainMerges(t(s, dir, "documents"), numMerges = 12)
        .toDF().orderBy("rank")
    },
    Some(WordPieceTrain.mergesSqlCtes("documents", numMerges = 12)))

  val q225 = QueryDef(
    "q225_suffix_repeat_cut",
    "suffix-array substring dedup, mine AND cut (r15 — closing the " +
      "r14 verdict's item 3): q216's exact-repeat miner feeds " +
      "Dedup.removeRepeatStrings, which deletes every occurrence of " +
      "the mined any-length repeats from the audit slice — the full " +
      "Lee et al. 2022 substring-dedup pipeline (the span family " +
      "q63-q65 cuts at fixed n-token windows; this cuts the exact " +
      "character substrings the SA surfaced). The repeat set is " +
      "model-sized driver state (<= topK strings); the cut is one " +
      "narrow codegen'd replace fold in a FIXED total order (length " +
      "desc, then lexicographic — longest-first so shorter repeats " +
      "never destroy longer occurrences), single-pass left-to-right " +
      "replace semantics identical in both engines, so the oracle " +
      "replays mine + order + fold verbatim",
    (s, dir) => {
      val slice = saAuditSlice(s, dir)
      // reuse q216's in-session mine when present (production
      // accounting: ONE mine feeds audit + cut; in-sweep this query
      // then measures cut-given-mine, standalone it pays the full mine)
      val reps = Option(saMineMemo.get(dir)) match {
        case Some(rows) => rows.map(_.getAs[String]("rep")).distinct.toSeq
        case None => graft.operators.SuffixArray.longestRepeats(slice,
            lcpCap = 64, minLen = 20, topK = 20)
          .select("rep").distinct().collect().map(_.getString(0)).toSeq
      }
      graft.operators.Dedup.removeRepeatStrings(slice, reps)
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id AS id, text AS txt FROM documents
                       WHERE doc_id % 5 = 0 AND length(text) >= 1),
              sfx AS (SELECT id, UNNEST(generate_series(1, length(txt))) AS pos,
                        txt FROM d),
              s2 AS (SELECT id, pos, substr(txt, CAST(pos AS INT)) AS sfx,
                       substr(txt, CAST(pos AS INT), 64) AS pfx FROM sfx),
              sa AS (SELECT id, pos, pfx,
                       ROW_NUMBER() OVER (ORDER BY sfx, id, pos) - 1 AS sa
                     FROM s2),
              adj AS (SELECT a.id AS a_doc, a.pos AS a_pos, a.pfx AS a_pfx,
                        b.id AS b_doc, b.pos AS b_pos, b.pfx AS b_pfx
                      FROM sa a JOIN sa b ON b.sa = a.sa + 1),
              l AS (SELECT *,
                      list_reduce(
                        list_prepend(CAST(0 AS BIGINT), generate_series(1, 64)),
                        (acc, i) -> CASE WHEN acc = i - 1
                            AND i <= least(length(a_pfx), length(b_pfx))
                            AND substr(a_pfx, CAST(i AS INT), 1)
                                = substr(b_pfx, CAST(i AS INT), 1)
                          THEN i ELSE acc END) AS lcp
                    FROM adj),
              top AS (SELECT lcp, substr(a_pfx, 1, CAST(lcp AS INT)) AS rep,
                        a_doc, a_pos
                      FROM l WHERE lcp >= 20
                      ORDER BY lcp DESC, a_doc, a_pos LIMIT 20),
              rl AS (SELECT LIST(rep ORDER BY length(rep) DESC, rep) AS rs
                     FROM (SELECT DISTINCT rep FROM top)),
              cutd AS (SELECT id, txt,
                         list_reduce(
                           list_prepend(txt, COALESCE((SELECT rs FROM rl), [])),
                           (acc, r) -> replace(acc, r, '')) AS clean_text
                       FROM d)
            SELECT id AS doc_id, CAST(length(txt) AS BIGINT) AS n_chars,
              CAST(length(clean_text) AS BIGINT) AS kept_chars, clean_text
            FROM cutd ORDER BY doc_id"""))

  /** The verified near-dup pair graph as a self-contained SELECT (own
    * WITH chain) yielding unique undirected (a, b) — the shared edge set
    * of q212 (triangles) and q218 (label propagation), one source for
    * both replays. */
  private lazy val ORACLE_MINHASH_EDGES: String =
    s"""WITH docs AS ($ORACLE_SHINGLES),
       | ex AS (SELECT id, UNNEST(sh) AS s FROM docs),
       | hh AS (SELECT id,
       |          list_reduce(
       |            list_prepend(CAST(0 AS BIGINT),
       |              list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
       |            (h, v) -> (h * 31 + v) % 1000000007) AS h
       |        FROM ex),
       | sig AS (SELECT id,
       |           MIN((h * 3 + 7) % 1000000007) AS m0,
       |           MIN((h * 5 + 1007) % 1000000007) AS m1,
       |           MIN((h * 7 + 2007) % 1000000007) AS m2,
       |           MIN((h * 9 + 3007) % 1000000007) AS m3,
       |           MIN((h * 11 + 4007) % 1000000007) AS m4,
       |           MIN((h * 13 + 5007) % 1000000007) AS m5,
       |           MIN((h * 15 + 6007) % 1000000007) AS m6,
       |           MIN((h * 17 + 7007) % 1000000007) AS m7
       |         FROM hh GROUP BY id),
       | band AS (
       |   SELECT id, 0 AS j,
       |     ((((m0 * 131 + m1) % 1000000007) * 131 + m2) % 1000000007 * 131 + m3)
       |       % 1000000007 AS bk FROM sig
       |   UNION ALL
       |   SELECT id, 1,
       |     ((((m4 * 131 + m5) % 1000000007) * 131 + m6) % 1000000007 * 131 + m7)
       |       % 1000000007 FROM sig),
       | cand AS (SELECT DISTINCT a.id AS ia, b.id AS ib
       |          FROM band a JOIN band b
       |            ON a.j = b.j AND a.bk = b.bk AND a.id < b.id),
       | p AS (SELECT ia, ib,
       |         CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS shared,
       |         len(da.sh) AS na, len(db.sh) AS nb
       |       FROM cand JOIN docs da ON da.id = cand.ia
       |                 JOIN docs db ON db.id = cand.ib)
       | SELECT LEAST(ia, ib) AS a, GREATEST(ia, ib) AS b
       | FROM p WHERE shared * 1.0 / (na + nb - shared) >= 0.4
       |   AND ia <> ib
       | GROUP BY 1, 2""".stripMargin

  val q218 = QueryDef(
    "q218_neardup_graph_communities",
    "community detection via synchronous label propagation (Raghavan " +
      "2007, smallest-label tie-break - the deterministic variant) over " +
      "the verified near-dup pair graph: the resolution BETWEEN " +
      "connected components (q49: everything reachable) and the " +
      "triangle census (q212: one cohesion number) - inside a big " +
      "component, LPA separates the template families that chance " +
      "edges chain together. Fixed synchronous rounds; per round one " +
      "edge-label join + map-side (node,label) count + max(struct) " +
      "argmax, NO per-node window (hot-vertex rule); oracle GENERATED " +
      "from the same round structure over the same edge CTE q212 reads",
    (s, dir) =>
      graft.operators.Graph.labelPropagation(
        Dedup.portableMinHashPairs(t(s, dir, "documents"), minJaccard = 0.4)
          .select(col("ia"), col("ib")), rounds = 4)
        .orderBy("id"),
    Some(graft.operators.Graph.lpaSqlCtes(ORACLE_MINHASH_EDGES, rounds = 4)))

  val q219 = QueryDef(
    "q219_community_modularity",
    "Newman modularity of the q218 label-propagation partition - the " +
      "quality score telling a curation review whether the detected " +
      "template families are REAL structure or noise (Q~0 = random, " +
      "~0.3-0.7 = genuine clustering): per-community contribution " +
      "e_c/m - (d_c/2m)^2 from the EXACT integer numerator 4m*e_c - " +
      "d_c^2 (DECIMAL(38)/HUGEINT - degree mass squares past int64 at " +
      "web scale) over one double division; oracle = the generated LPA " +
      "chain (same edge CTE as q212/q218) + the modularity block, one " +
      "source of truth for the whole composition",
    (s, dir) => {
      // persist the expensive MinHash pair producer ONCE across the two
      // consumers (modularity's own contract note: "callers composing
      // the two over an expensive pair producer should persist `pairs`
      // themselves") — without this the full LSH pipeline ran twice,
      // once into labelPropagation's edge persist and again into
      // modularity's (r19 optimization round). Both consumers return
      // eagerly-materialized frames, so the release below is safe.
      val edges = Dedup.portableMinHashPairs(t(s, dir, "documents"), minJaccard = 0.4)
        .select(col("ia"), col("ib"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      try
        graft.operators.Graph.modularity(edges,
          graft.operators.Graph.labelPropagation(edges, rounds = 4))
      finally edges.unpersist()
    },
    Some(graft.operators.Graph.lpaModularitySqlCtes(ORACLE_MINHASH_EDGES, rounds = 4)))

  val q212 = QueryDef(
    "q212_neardup_graph_triangles",
    "triangle census + global clustering coefficient (Newman's " +
      "transitivity) over the verified near-dup pair graph - the " +
      "cohesion read a dedup-policy review starts from: triangle-dense " +
      "regions are template families/mirror clusters, isolated edges " +
      "are chance similarity; lexicographic-orientation edge-edge join " +
      "(each triangle found once, cost = the wedge count the output " +
      "itself reports - a self-pricing plan), exact integer census, " +
      "one rounded ratio",
    (s, dir) =>
      graft.operators.Graph.triangleStats(
        Dedup.portableMinHashPairs(t(s, dir, "documents"), minJaccard = 0.4)
          .select(col("ia"), col("ib")), "ia", "ib"),
    Some(s"""WITH e AS ($ORACLE_MINHASH_EDGES),
              deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d
                      FROM (SELECT a AS v FROM e
                            UNION ALL SELECT b FROM e)
                      GROUP BY 1),
              ds AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                       CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
                     FROM deg),
              ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
              tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
                      FROM e e1 JOIN e e2 ON e1.b = e2.a
                        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
             SELECT n_nodes, n_edges, n_wedges, n_triangles,
               CASE WHEN n_wedges > 0 THEN
                 ROUND(CAST(3 AS DOUBLE) * n_triangles / n_wedges, 6)
               END AS transitivity
             FROM ds CROSS JOIN ne CROSS JOIN tri"""))

  override def queries: Seq[QueryDef] =
    Seq(q30, q31, q32, q33, q34, q35, q36, q37, q38, q39, q40, q41, q47, q48, q49, q50,
      q52, q53, q54, q55, q56, q57, q58, q59, q60, q61, q62, q63, q64, q65, q66, q67,
      q68, q69, q70, q71, q72, q73, q74, q75, q76, q77, q78, q79, q81, q82, q83, q84,
      q87, q88, q89, q90, q91, q92, q93, q94, q95, q96, q97, q98, q99, q100,
      q101, q102, q103, q104, q105, q106, q107, q108, q109, q110, q111,
      q112, q113, q114, q115, q116, q117, q118, q119, q120, q121, q122, q123,
      q124, q125, q126, q131, q132, q133, q134, q137, q138, q139, q140, q142,
      q143, q144, q145, q146, q147, q166, q170, q171, q173, q174, q175, q176, q179, q181, q182, q183, q184, q185, q189, q192, q196, q197, q199, q200,
      q205, q206, q208, q211, q212, q215, q216, q217, q218, q219, q225)
}
