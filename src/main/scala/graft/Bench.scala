package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is fully materialized through the `noop`
  * sink (not `.count()`, which would let Catalyst prune away projection work
  * and under-report). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths once so per-query times measure the engine,
    // not first-query classloading.
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // the warm-up may have registered caches (e.g. shingle-set persists);
    // drop them so the FIRST measured query is as cold as the rest
    spark.catalog.clearCache()
    // Dev loop: SPARK_GRAFT_ONLY=q38,q47 restricts the run to queries whose
    // name starts with one of the comma-separated prefixes. Unset in the
    // driver's full runs, so the published metric is never filtered.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).filter(_.nonEmpty))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // per-query isolation: drop any caches a query left behind so (a)
      // every timing is self-contained (no cross-query cache reuse) and
      // (b) blocks cannot accumulate across the 130-query session — the
      // contended-box failure mode. Cleanup time is excluded from the
      // query's own number but the whole run stays honest end-to-end.
      spark.catalog.clearCache()
      // A crashed query must not read as a fast success: report -1.
      (name, if (ok) elapsed else -1.0, ok)
    }
    // Two renderings of the same numbers (r9 verdict item: the driver
    // keeps only the final 2,000 stdout chars, which truncated the
    // 130-key line mid-JSON):
    //  - stdout gets SHORT keys ("q01") so the whole line fits inside
    //    the tail window and always parses;
    //  - BENCH_FULL.json beside the repo artifacts gets the full names,
    //    so the slowest-query audit never depends on truncation luck.
    // Locale.ROOT: the default-locale f-interpolator would render
    // 0.553 as "0,553" on comma-decimal JVMs and corrupt the JSON
    def fmt(v: Double, decimals: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))
    def render(
        key: (String, Double, Boolean) => String,
        decimals: Int = 3,
        keep: Seq[(String, Double, Boolean)] = results): String = {
      val qs = keep.map { case (k, v, ok) =>
        "\"" + key(k, v, ok) + "\":" + fmt(v, decimals)
      }.mkString("{", ",", "}")
      val errs = results.collect { case (k, _, false) => "\"" + key(k, 0, false) + "\"" }
        .mkString("[", ",", "]")
      val dropped = results.size - keep.size
      val trunc = if (dropped > 0) s""","queries_truncated":$dropped""" else ""
      val total = results.collect { case (_, v, true) => v }.sum
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$trunc,"errors":$errs,"sf":"$sfDir"}"""
    }
    // The driver keeps only the final 2,000 stdout chars, and a line cut
    // mid-JSON parses as nothing (the r9 failure, which resurfaced when
    // the registry passed ~155 queries even with short keys): render the
    // stdout line at 2 decimals, and if it STILL exceeds the window,
    // keep only the slowest entries that fit (errors always kept;
    // queries_truncated says how many fast ones were elided — the full
    // registry always lands in BENCH_FULL.json).
    def stdoutLine: String = {
      val shortKey = (k: String, _: Double, _: Boolean) => k.takeWhile(_ != '_')
      val full = render(shortKey, decimals = 2)
      if (full.length <= 1900) full
      else {
        val bySlow = results.sortBy(-_._2)
        // estimated-shrink loop (NOT a bisection): drop ~over/13 of the
        // fastest entries per pass until the line fits — may elide a few
        // more than strictly necessary, which is fine (BENCH_FULL.json
        // always carries everything); terminates because keep strictly
        // decreases toward 1
        var keep = bySlow.size
        var line = full
        while (line.length > 1900 && keep > 1) {
          val over = line.length - 1900
          keep = math.max(1, keep - math.max(1, over / 13))
          line = render(shortKey, decimals = 2, keep = bySlow.take(keep).sortBy(_._1))
        }
        line
      }
    }
    // scoped dev runs (SPARK_GRAFT_ONLY set) must NOT clobber the
    // published full-registry artifact with a 4-query fragment
    if (only.isEmpty) {
      // lands beside the repo artifacts wherever the checkout lives:
      // SPARK_GRAFT_REPO_DIR overrides, else the working directory
      val repoDir = sys.env.getOrElse("SPARK_GRAFT_REPO_DIR",
        System.getProperty("user.dir", "."))
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(repoDir, "BENCH_FULL.json"),
        render((k, _, _) => k) + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] BENCH_FULL.json write failed: $e") }
    }
    println(stdoutLine)
    spark.stop()
  }
}
