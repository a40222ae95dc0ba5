package graft.operators

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** [[Rollup]] — the mergeable-partial contract: merging per-partition
  * partials must equal the direct whole-range aggregation (including the
  * KMV estimate, which must equal [[Sketches.kmvDistinct]] EXACTLY — the
  * lossless bottom-k merge identity), and an incremental union of
  * separately-built partials must merge to the same answer. */
class RollupSpec extends SparkSpecBase {

  private val K = 16

  test("mergeRollup(partialRollup) == direct aggregation + kmvDistinct, field for field") {
    val e = Tables.load(spark, sfDir, "events")
    val partials = Rollup.partialRollup(
      e, to_date(col("ts")), Seq("event_type"), "value", "user_id", k = K, salt = "r")
    val merged = Rollup.mergeRollup(partials, Seq("event_type"), k = K)
      .collect().map(r => r.getString(0) -> r).toMap
    val direct = e.groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast(DecimalType(30, 6))).as("sum_v"),
        min("value"), max("value"))
      .collect().map(r => r.getString(0) -> r).toMap
    val directKmv = Sketches.kmvDistinct(e, "event_type", "user_id", K, "r")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(merged.keySet === direct.keySet)
    merged.foreach { case (g, m) =>
      val d = direct(g); val s = directKmv(g)
      assert(m.getLong(1) === d.getLong(1), s"$g n_rows")
      assert(m.getDecimal(2).compareTo(d.getDecimal(2)) === 0, s"$g sum_v exact")
      assert(m.getDouble(3) === d.getDouble(3), s"$g min_v")
      assert(m.getDouble(4) === d.getDouble(4), s"$g max_v")
      assert(m.getLong(5) === s.getLong(1), s"$g n_seen")
      assert(m.getLong(6) === s.getLong(2), s"$g kth_hash")
      assert(m.getLong(7) === s.getLong(3), s"$g est_distinct == kmvDistinct")
    }
  }

  test("incremental union: old partials + new-day partial merge to the whole-range answer") {
    val e = Tables.load(spark, sfDir, "events")
    val cutoff = e.select(to_date(max(col("ts")))).head().getDate(0)
    val old = Rollup.partialRollup(e.filter(to_date(col("ts")) < lit(cutoff)),
      to_date(col("ts")), Seq("event_type"), "value", "user_id", k = K, salt = "r")
    val fresh = Rollup.partialRollup(e.filter(to_date(col("ts")) >= lit(cutoff)),
      to_date(col("ts")), Seq("event_type"), "value", "user_id", k = K, salt = "r")
    assert(fresh.count() > 0, "cutoff slices off a non-empty newest day")
    val viaUnion = Rollup.mergeRollup(old.unionByName(fresh), Seq("event_type"), k = K)
    val whole = Rollup.mergeRollup(
      Rollup.partialRollup(e, to_date(col("ts")), Seq("event_type"),
        "value", "user_id", k = K, salt = "r"),
      Seq("event_type"), k = K)
    val a = viaUnion.orderBy("event_type").collect().map(_.toString)
    val b = whole.orderBy("event_type").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("all-null distinct keys: empty sketch, estimate 0, null kth_hash") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "a", 2.0, Option.empty[Long]), (2, "a", 3.0, Option.empty[Long]))
      .toDF("part0", "g", "value", "dk")
    val p = Rollup.partialRollup(df, col("part0"), Seq("g"), "value", "dk", k = K)
    assert(p.collect().head.getSeq[Long](p.columns.indexOf("kmv")).isEmpty)
    val m = Rollup.mergeRollup(p, Seq("g"), k = K).collect().head
    assert(m.getLong(5) === 0L && m.isNullAt(6) && m.getLong(7) === 0L)
  }
}
