package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is fully materialized through the `noop`
  * sink (not `.count()`, which would let Catalyst prune away projection work
  * and under-report). */
object Bench {
  /** Extract the `"queries": {name: seconds}` map from a BENCH artifact.
    * Whitespace-tolerant on BOTH levels: BENCH_FLOORS.json is written
    * pretty-printed (`"queries": {` / `"q02": 0.5` with spaces) while
    * BENCH_FULL.json is compact — round 18's planted-floor end-to-end
    * test caught the strict form silently parsing the floors file as
    * EMPTY, which made the regression-rerun rule fire on nothing (the
    * exact failure the r17 verdict's item 5 was about). Spec-pinned on
    * both renderings (BenchParseSpec). */
  private[graft] def parseQueriesMap(s: String): Map[String, Double] = {
    val qmap = """"queries"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    // An entry whose VALUE doesn't match the number pattern at all (a
    // hand-edit typo like `1,21` or `"1.2"`) would previously vanish —
    // or truncate to a wrong prefix — with no warning unless the WHOLE
    // map came back empty. Count the raw keys in the block and report
    // any shortfall loudly: a floor silently missing or wrong re-disarms
    // the regression-rerun rule for that one query, the same failure
    // class the planted-floor test closed for the empty-map case.
    val rawKeys = """"([^"]+)"\s*:""".r.findAllMatchIn(qmap).size
    // exponent-tolerant (ADVICE r18): a value ever rendered as 1.0E-4
    // must parse rather than silently re-disarm the floors rule; a
    // value the pattern STILL can't read (hand-edit typo) is reported
    // loudly by readQueriesMap's empty/partial-parse check below, not
    // swallowed here.
    val parsed = """"([^"]+)"\s*:\s*(-?[0-9][0-9.]*(?:[eE][-+]?[0-9]+)?)""".r
      .findAllMatchIn(qmap)
      .flatMap { m =>
        m.group(2).toDoubleOption match {
          case Some(v) => Some(m.group(1) -> v)
          case None =>
            System.err.println(
              s"[bench] WARNING unparseable floor value for '${m.group(1)}': '${m.group(2)}'")
            None
        }
      }.toMap
    if (parsed.size < rawKeys) System.err.println(
      s"[bench] WARNING queries block has $rawKeys entries but only " +
        s"${parsed.size} parsed — the missing floors' regression-rerun " +
        "rule is silently disarmed (check for hand-edit typos): " +
        (""""([^"]+)"\s*:""".r.findAllMatchIn(qmap).map(_.group(1)).toSet
          -- parsed.keySet).take(5).mkString(", "))
    parsed
  }

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
    // process-CPU clock: wall time can read 3× under host contention
    // while the query's own CPU seconds stay flat — recording both lets
    // the round artifact self-adjudicate load spikes (three of the last
    // five rounds needed a manual contention adjudication)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    def cpuNow(): Long = osBean.map(_.getProcessCpuTime).getOrElse(0L)
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double, Boolean) = {
      val t0 = System.nanoTime()
      val c0 = cpuNow()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      val cpu = (cpuNow() - c0) / 1e9
      // per-query isolation: drop any caches a query left behind so (a)
      // every timing is self-contained (no cross-query cache reuse) and
      // (b) blocks cannot accumulate across the 130-query session — the
      // contended-box failure mode. Cleanup time is excluded from the
      // query's own number but the whole run stays honest end-to-end.
      spark.catalog.clearCache()
      (elapsed, cpu, ok)
    }
    val results = selected.map { case (name, fn) =>
      val (elapsed, cpu, ok) = timeOne(name, fn)
      // A crashed query must not read as a fast success: report -1.
      (name, if (ok) elapsed else -1.0, cpu, ok)
    }
    // lands beside the repo artifacts wherever the checkout lives:
    // SPARK_GRAFT_REPO_DIR overrides, else the working directory
    val repoDir = sys.env.getOrElse("SPARK_GRAFT_REPO_DIR",
      System.getProperty("user.dir", "."))
    // the PREVIOUS round's published floors: the r16 verdict's
    // regression-rerun rule needs them to know which queries moved
    // without a code change. r17 verdict item 5: these must come from a
    // COMMITTED, write-once-per-round artifact (BENCH_FLOORS.json,
    // updated by the builder at round close), never from the
    // BENCH_FULL.json this same run is about to overwrite — reading the
    // mutable artifact meant the rule compared a sweep against itself
    // (or against nothing) and fired on zero of 19 real regressions.
    def readQueriesMap(fileName: String): Map[String, Double] = {
      val p = java.nio.file.Paths.get(repoDir, fileName)
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        val parsed =
          try parseQueriesMap(java.nio.file.Files.readString(p))
          catch {
            case e: Throwable =>
              System.err.println(
                s"[bench] WARNING $fileName exists but failed to read/parse: $e")
              Map.empty[String, Double]
          }
        // ADVICE r18: an existing floors file that parses EMPTY is the
        // exact silent-disarm failure class the planted-floor test
        // caught twice — it must never pass quietly again.
        if (parsed.isEmpty) System.err.println(
          s"[bench] WARNING $fileName exists but yielded an EMPTY queries map — " +
            "the regression-rerun rule is running without these floors")
        parsed
      }
    }
    val prevFloors: Map[String, Double] = {
      val pinned = readQueriesMap("BENCH_FLOORS.json")
      if (pinned.nonEmpty) pinned else readQueriesMap("BENCH_FULL.json")
    }
    // second pass (r12 verdict item 7 + r16 verdict item 4): by the time
    // the sweep ends, a transient load spike has usually passed — a
    // rerun at or near the floor tags the in-sweep number as contention,
    // a rerun matching the slow number tags it as real. Covered set:
    //  (a) the 8 slowest ABSOLUTE queries, and
    //  (b) every ≥2× ROUND-OVER-ROUND regression vs the previous
    //      BENCH_FULL.json floor (≥1 s, so sub-second noise on fast
    //      queries doesn't trigger re-pays) — r16 shipped q141 at 3.8×
    //      its r15 floor with zero code change and no floor to disprove
    //      it, because the absolute-slowest rule missed it.
    // Full runs only (a scoped dev loop must not re-pay its slowest
    // queries), and a CRASHED rerun is OMITTED from the map rather than
    // recorded as a small number the adjudication rule would misread as
    // "re-measured at the floor".
    val rerun: Map[String, Double] =
      if (only.nonEmpty) Map.empty
      else {
        val slowest = results.filter(_._4).sortBy(-_._2).take(8).map(_._1)
        val regressed = results.collect {
          case (name, v, _, true)
            if v >= 1.0 && prevFloors.get(name).exists(p => p > 0 && v >= 2 * p) =>
            name
        }
        if (regressed.nonEmpty) System.err.println(
          s"[bench] rerunning ${regressed.size} round-over-round regressions: " +
            regressed.mkString(", "))
        // r17 verdict item 5 (second half): the rerun pass itself can run
        // contended — r17 published q233's rerun at 57.35 s against its
        // own 12.79 s in-sweep reading. A rerun reading ≥2× the in-sweep
        // number cannot be the structural cost (the query already ran
        // faster in this very process); retry it once, and if still ≥2×,
        // DISCARD it rather than publish a number known to be load noise.
        val insweepByName = results.collect { case (n, v, _, true) => n -> v }.toMap
        (slowest ++ regressed).distinct.flatMap { name =>
          def attempt(): Option[Double] = {
            val (elapsed, _, ok) = timeOne(name, SparkEntry.queries(name))
            if (ok) Some(elapsed)
            else { System.err.println(s"[bench] rerun of $name FAILED"); None }
          }
          val contended = (e: Double) =>
            insweepByName.get(name).exists(v => v >= 0.5 && e >= 2 * v)
          attempt().flatMap { e1 =>
            if (!contended(e1)) Some(name -> e1)
            else attempt() match {
              case Some(e2) if !contended(e2) =>
                System.err.println(
                  s"[bench] rerun of $name contended ($e1 s vs in-sweep); retry kept at $e2 s")
                Some(name -> e2)
              case Some(e2) =>
                System.err.println(
                  s"[bench] rerun of $name discarded: $e1 s / $e2 s both ≥2× in-sweep " +
                    s"${insweepByName.getOrElse(name, Double.NaN)} s — load noise, not structure")
                None
              case None => None
            }
          }
        }.toMap
      }
    // r14 verdict item 9 (bench hygiene): the HEADLINE per-query number
    // must be the structural one, not the contention-inflated in-sweep
    // reading — three rounds running, the worst in-sweep numbers were
    // disproven by their own rerun column, and a reader of BENCH_rN who
    // missed that column drew the wrong conclusion. So the published
    // `queries` map takes min(insweep, rerun) for the rerun'd slowest-k
    // (a query cannot run FASTER than its structural cost; the min is
    // the better estimate of it), while the raw in-sweep readings stay
    // visible in the `insweep` map and the `rerun` map records the
    // second pass verbatim — nothing is hidden, but the headline no
    // longer depends on the reader cross-referencing.
    val insweepOverridden: Map[String, Double] =
      results.collect { case (name, v, _, true)
        if rerun.get(name).exists(_ < v) => name -> v }.toMap
    val headline = results.map { case (name, v, cpu, ok) =>
      val hv = if (ok) math.min(v, rerun.getOrElse(name, v)) else v
      (name, hv, cpu, ok)
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
        keep: Seq[(String, Double, Double, Boolean)] = headline,
        withCpu: Boolean = false): String = {
      val qs = keep.map { case (k, v, _, ok) =>
        "\"" + key(k, v, ok) + "\":" + fmt(v, decimals)
      }.mkString("{", ",", "}")
      val errs = results.collect { case (k, _, _, false) => "\"" + key(k, 0, false) + "\"" }
        .mkString("[", ",", "]")
      val dropped = results.size - keep.size
      // a truncated stdout line names the artifact carrying all queries,
      // so BENCH_rN readers never need to guess where the full map lives
      val trunc = if (dropped > 0)
        s""","queries_truncated":$dropped,"full_map":"BENCH_FULL.json"""" else ""
      // "value" sums the SAME headline numbers the queries map carries
      // (rerun-floored structural estimates) so the map always sums to
      // the total; the raw wall-clock sweep stays as insweep_total
      val total = headline.collect { case (_, v, _, true) => v }.sum
      val insweepTotal = results.collect { case (_, v, _, true) => v }.sum
      val cpuTotal = results.collect { case (_, _, c, true) => c }.sum
      val cpuMap = if (!withCpu) "" else {
        val m = keep.map { case (k, _, c, ok) =>
          "\"" + key(k, c, ok) + "\":" + fmt(c, decimals)
        }.mkString("{", ",", "}")
        s""","cpu":$m"""
      }
      val rr = if (rerun.isEmpty) "" else {
        val m = rerun.toSeq.sortBy(_._1).map { case (k, v) =>
          "\"" + key(k, v, true) + "\":" + fmt(v, decimals)
        }.mkString("{", ",", "}")
        s""","rerun":$m"""
      }
      // raw in-sweep readings for the queries whose headline came from
      // the rerun floor — the contention audit trail
      val isw = if (insweepOverridden.isEmpty) "" else {
        val m = insweepOverridden.toSeq.sortBy(_._1).map { case (k, v) =>
          "\"" + key(k, v, true) + "\":" + fmt(v, decimals)
        }.mkString("{", ",", "}")
        s""","insweep":$m"""
      }
      s"""{"metric":"total","value":${fmt(total, decimals)},"unit":"sec","insweep_total":${fmt(insweepTotal, decimals)},"cpu_total":${fmt(cpuTotal, decimals)},"queries":$qs$cpuMap$rr$isw$trunc,"errors":$errs,"sf":"$sfDir"}"""
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
        val bySlow = headline.sortBy(-_._2)
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
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(repoDir, "BENCH_FULL.json"),
        render((k, _, _) => k, withCpu = true) + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] BENCH_FULL.json write failed: $e") }
    }
    println(stdoutLine)
    spark.stop()
  }
}
