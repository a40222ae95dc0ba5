package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.graftglue.PlanGlue
import org.apache.spark.storage.StorageLevel

/** Contract of [[PlanGlue.releaseLocalCheckpoint]]: releases exactly a
  * bare localCheckpoint frame, and fails fast on anything derived — a
  * derived plan may share its LogicalRDD leaf with a live sibling whose
  * truncated lineage could never recompute the dropped blocks. */
class PlanGlueSpec extends SparkSpecBase {

  test("releases the blocks of a bare localCheckpoint frame") {
    val s = spark; import s.implicits._
    val ckpt = (1 to 100).toDF("x").localCheckpoint(true, StorageLevel.DISK_ONLY)
    val rdd = PlanGlue.logicalPlan(ckpt) match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => fail(s"expected LogicalRDD, got ${other.nodeName}")
    }
    assert(rdd.getStorageLevel === StorageLevel.DISK_ONLY)
    PlanGlue.releaseLocalCheckpoint(ckpt)
    assert(rdd.getStorageLevel === StorageLevel.NONE)
  }

  test("fails fast on a derived plan instead of corrupting a shared leaf") {
    val s = spark; import s.implicits._
    val ckpt = (1 to 100).toDF("x").localCheckpoint(true, StorageLevel.DISK_ONLY)
    try {
      val derived = ckpt.select($"x" + 1 as "y")
      val e = intercept[IllegalArgumentException] {
        PlanGlue.releaseLocalCheckpoint(derived)
      }
      assert(e.getMessage.contains("LogicalRDD"))
      // the shared leaf's blocks must be untouched — the sibling still reads
      assert(ckpt.count() === 100L)
    } finally PlanGlue.releaseLocalCheckpoint(ckpt)
  }
}
