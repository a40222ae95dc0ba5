package graft

import org.apache.spark.sql.SparkSession

/** Deploy-shaped smoke main (r18 verdict item 6): the flagship entry
  * driven through `spark-submit` on the PACKAGED jar (`sbt package`),
  * so the closing gate exercises the artifact a cluster would actually
  * receive — manifest, classpath, resource files — not just compiled
  * classes on a dev `--driver-class-path`. Master comes from the
  * spark-submit CLI (local[8] in the gate; a real cluster URL in
  * production). Prints one `ENTRY_ROWS=<n>` line; the gate expects
  * n > 0 and exit 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession
      .configure(SparkSession.builder(), 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("ENTRY_ROWS=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}
