package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump `.explain("formatted")` for selected queries to files.
  *
  * Usage: `runMain graft.PlanDump <outDir> <prefix1,prefix2,...>`
  * (env `SPARK_GRAFT_SF_DIR` picks the data directory, default sf0.1;
  * `SPARK_GRAFT_CPUS` the core count, default 32 — same contract as
  * [[Bench]]). One `<queryname>.txt` per selected query.
  *
  * Note: several registered queries are driver-coordinated multi-job
  * pipelines (suffix array rounds, LPA, streaming drains); for those the
  * dumped plan is the FINAL frame's plan and the file notes say so —
  * the per-round structure lives in the operator scaladoc. Building the
  * plan never executes the query, but operators that materialize eagerly
  * (collect/checkpoint inside the builder) do run their upstream jobs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <prefix1,prefix2,...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val prefixes = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (prefixes.exists(name.startsWith)) {
        val txt =
          try fn(spark, sfDir).queryExecution.explainString(FormattedMode)
          catch { case e: Throwable => s"PLAN BUILD FAILED: $e" }
        java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), txt)
        println(s"[plandump] wrote $name (${txt.length} chars)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
