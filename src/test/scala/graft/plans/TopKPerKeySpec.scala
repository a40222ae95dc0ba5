package graft.plans

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom top-k operator (logical node + strategy + heap exec) must be
  * indistinguishable from the window-rank formulation in results, while
  * planning as partial → exchange → final with no sort. */
class TopKPerKeySpec extends SparkSpecBase {

  private def events = Tables.load(spark, sfDir, "events")
    .select(col("user_id"), col("event_id"), col("value"))

  test("perKey equals row_number().over(window) <= k, ties broken identically") {
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val expected = events
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).toSet
    val got = TopK.perKey(events,
        Seq(col("user_id")), Seq(col("value").desc, col("event_id")), 5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("computed key and ascending order work; groups smaller than k emit all rows") {
    val w = Window.partitionBy(pmod(col("user_id"), lit(7))).orderBy(col("event_id"))
    val expected = events
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    val got = TopK.perKey(events,
        Seq(pmod(col("user_id"), lit(7))), Seq(col("event_id")), 3)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(got === expected)
  }

  test("plans as partial -> exchange -> final heap, with no sort operator") {
    val plan = TopK.perKey(events,
        Seq(col("user_id")), Seq(col("value").desc, col("event_id")), 5)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("TopKPerKey")) === 2,
      s"expected partial + final heap phases:\n$plan")
    assert(plan.linesIterator.exists(_.contains("Exchange hashpartitioning(user_id")),
      "final phase must demand key co-location")
    assert(!plan.contains("Sort "), s"heap top-k must not sort:\n$plan")
    // partial trims below the exchange: the node order must be
    // final ... exchange ... partial
    val lines = plan.linesIterator.toSeq
    val finalIdx = lines.indexWhere(_.contains("TopKPerKey"))
    val exIdx = lines.indexWhere(_.contains("Exchange"))
    val partialIdx = lines.lastIndexWhere(_.contains("TopKPerKey"))
    assert(finalIdx < exIdx && exIdx < partialIdx,
      "map-side partial must run before the shuffle")
  }
}
