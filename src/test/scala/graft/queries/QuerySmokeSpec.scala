package graft.queries

import graft.SparkSpecBase

/** Every registered query builds and executes on sf0.001; the DuckDB hash
  * gate (driver-side) is the real correctness check — this catches plan-
  * time regressions early and keeps the registry self-consistent. */
class QuerySmokeSpec extends SparkSpecBase {

  test("registry is well-formed: unique names, oracle coverage documented") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.toSet === Set(
      "q38_dedup_minhash_lsh", "q39_text_simhash",
      "q114_compression_ratio"),
      "every new query needs a DuckDB oracle unless provably inexpressible " +
        "(q38/q39: xxhash64 signatures, portable twins q47/q48 gated; " +
        "q114: DEFLATE byte size has no DuckDB analogue, kernel unit-" +
        "tested against java.util.zip on known payloads. q78 graduated " +
        "to a FULL generated-SQL oracle in r13 and q205 in r14 — " +
        "micro-nat-quantized Viterbi scores made the unigram-LM trainer " +
        "recursive-CTE-replayable, see UnigramLm.trainSqlCtes — so " +
        "neither iterative argmax nor data-dependent DP depth is a " +
        "waiver reason anymore)")
  }

  // legitimately-empty results on the smallest fixture: q07 (anti join on
  // dense keys), q106 (the sf0.001 corpus has no image pair within
  // hamming 6 of the real decoded aHash — the DuckDB oracle agrees on 0
  // rows; sf0.01/sf0.1 produce 2/32 pairs and gate the non-empty path)
  private val emptyOkOnSmallest =
    Set("q07_join_anti_customers", "q106_multimodal_neardup")

  for (q <- Registry.all) {
    test(s"${q.name} executes on sf0.001") {
      val n = q.builder(spark, sfDir).count()
      if (!emptyOkOnSmallest(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }
}
