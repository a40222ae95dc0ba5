package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** [[Changes.snapshotDelta]] gates: classification truth table (added /
  * removed / changed / unchanged), multi-column content identity, and the
  * shuffle-width contract (digests, not text, reach the join exchange). */
class SnapshotDeltaSpec extends SparkSpecBase {

  private val s_ = spark
  import s_.implicits._

  test("classifies added/removed/changed/unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = Changes.snapshotDelta(oldSnap, newSnap)
      .select("doc_id", "change").as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("content identity spans all contentCols") {
    val oldSnap = Seq((1L, "t", "en"), (2L, "t", "en")).toDF("doc_id", "text", "lang")
    val newSnap = Seq((1L, "t", "de"), (2L, "t", "en")).toDF("doc_id", "text", "lang")
    val out = Changes.snapshotDelta(oldSnap, newSnap,
        contentCols = Seq("text", "lang"))
      .select("doc_id", "change").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("delta partitions the id space: every id classified exactly once") {
    val oldSnap = spark.range(0, 100).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    val newSnap = spark.range(50, 150).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id"), when(col("id") % 3 === 0, lit(" v2")).otherwise(lit(""))).as("text"))
    val out = Changes.snapshotDelta(oldSnap, newSnap)
    assert(out.count() === 150)
    assert(out.select("doc_id").distinct().count() === 150)
    val byChange = out.groupBy("change").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // removed: 0..49; added: 100..149; changed: ids 50..99 with id%3==0 (17 of them)
    assert(byChange("removed") === 50)
    assert(byChange("added") === 50)
    assert(byChange("changed") === 17)
    assert(byChange("unchanged") === 33)
  }

  test("text never reaches the join: exchange inputs carry only id + digest") {
    val oldSnap = Seq((1L, "a")).toDF("doc_id", "text")
    val newSnap = Seq((1L, "a")).toDF("doc_id", "text")
    val plan = Changes.snapshotDelta(oldSnap, newSnap)
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        val names = side.output.map(_.name).toSet
        assert(!names.contains("text"),
          s"raw content column crossed into the join input: $names")
      }
    }
  }
}
