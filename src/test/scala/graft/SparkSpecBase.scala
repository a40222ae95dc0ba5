package graft

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite run (JVM-wide, matching
  * sbt's single forked test JVM). */
object SparkSpecBase {
  lazy val spark: SparkSession = {
    // keep saveAsTable artifacts (BucketedJoinSpec) out of the repo dir
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    System.setProperty("derby.system.home", wh)
    val s = GraftSession
      .configure(SparkSession.builder().master("local[4]"), 4)
      .config("spark.sql.warehouse.dir", wh)
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkSpecBase extends AnyFunSuite {
  def spark: SparkSession = SparkSpecBase.spark
  def sfDir: String = SparkSpecBase.sfDir
}
