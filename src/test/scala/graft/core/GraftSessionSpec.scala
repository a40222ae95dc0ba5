package graft.core

import graft.SparkSpecBase

/** The cluster profile's contract: correctness-visible configuration is
  * IDENTICAL to the local profile (a plan validated by the oracle gate
  * behaves the same on a 1000-executor cluster), and the sizing knobs
  * scale with the cluster, not the box. */
class GraftSessionSpec extends SparkSpecBase {

  private def confOf(b: org.apache.spark.sql.SparkSession.Builder): Map[String, String] = {
    // Builder keeps its options map private and getOrCreate would apply
    // them onto the LIVE shared test session — read the map reflectively
    // instead (test-only; the spec owns the breakage risk if the field
    // moves in a Spark upgrade).
    val f = (b.getClass.getSuperclass.getDeclaredFields.toSeq ++
        b.getClass.getDeclaredFields.toSeq)
      .find(_.getName.endsWith("options"))
      .getOrElse(fail(
        "SparkSession.Builder no longer has an 'options'-suffixed field — " +
          "a Spark upgrade moved it; rewrite confOf to capture configs " +
          "another way (e.g. apply the builder to a fresh SparkConf)"))
    f.setAccessible(true)
    f.get(b).asInstanceOf[scala.collection.mutable.Map[String, String]].toMap
  }

  test("cluster profile: correctness configs identical to local, sizing scaled") {
    val local = confOf(GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder(), 32))
    val clust = confOf(GraftSession.cluster(
      org.apache.spark.sql.SparkSession.builder(), 4000))

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
}
