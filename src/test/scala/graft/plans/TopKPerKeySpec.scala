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

  test("property: random tables across skews match the window formulation") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      // skewed key space: trial 1 has 1 key (everything collides), later
      // trials spread; values collide often to exercise tie-breaking
      val nKeys = Seq(1, 2, 7, 50, 500)(trial - 1)
      val n = 2000
      val rows = (0 until n).map { i =>
        (rng.nextInt(nKeys).toLong, i.toLong, rng.nextInt(20).toLong)
      }
      val df = rows.toDF("k", "id", "v")
      val k = 1 + rng.nextInt(7)
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      val expected = df.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      val got = TopK.perKey(df, Seq(col("k")), Seq(col("v").desc, col("id")), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(got === expected, s"trial $trial (nKeys=$nKeys, k=$k)")
    }
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
