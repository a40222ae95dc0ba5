package graft.core

import graft.SparkSpecBase

/** The cluster profile's contract: correctness-visible configuration is
  * IDENTICAL to the local profile (a plan validated by the oracle gate
  * behaves the same on a 1000-executor cluster), and the sizing knobs
  * scale with the cluster, not the box. Asserted on the PURE config maps
  * ([[GraftSession.localConf]]/[[GraftSession.clusterConf]]) — no
  * Builder-internals reflection — plus one applied-builder smoke so the
  * maps and the apply path cannot drift apart. */
class GraftSessionSpec extends SparkSpecBase {

  test("cluster profile: correctness configs identical to local, sizing scaled") {
    val local = GraftSession.localConf(32)
    val clust = GraftSession.clusterConf(4000)

    // correctness-visible keys must agree exactly
    for (k <- Seq("spark.sql.extensions", "spark.sql.session.timeZone",
        "spark.sql.legacy.parquet.nanosAsLong", "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.autoBroadcastJoinThreshold"))
      assert(clust.get(k) === local.get(k), s"$k must not differ across profiles")

    // the UI is deliberately NOT in the identical set: off on the bench
    // box, back on for the cluster (the primary debugging surface there)
    assert(clust("spark.ui.enabled") === "true")
    // sizing keys scale with the cluster
    assert(clust("spark.sql.shuffle.partitions") === "4000")
    assert(clust("spark.sql.adaptive.coalescePartitions.initialPartitionNum") === "12000")
    assert(clust("spark.sql.adaptive.advisoryPartitionSizeInBytes") ===
      (128L * 1024 * 1024).toString)
    assert(clust("spark.sql.files.maxPartitionBytes") === (256L * 1024 * 1024).toString)
  }

  test("the live test session carries the applied local profile") {
    // the maps are the spec surface; this pins that configure() actually
    // applied them to the session every suite runs on (keys whose values
    // the harness overrides per-box are skipped: shuffle partitions)
    for (k <- Seq("spark.sql.session.timeZone",
        "spark.sql.legacy.parquet.nanosAsLong", "spark.sql.adaptive.enabled"))
      assert(spark.conf.getOption(k) === GraftSession.localConf(32).get(k),
        s"$k not applied to the live session")
  }
}
