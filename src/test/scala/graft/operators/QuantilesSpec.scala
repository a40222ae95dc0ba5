package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The bounded-state exact-quantile operator must agree with Spark's own
  * `percentile` aggregate (the unbounded-state reference semantics) on
  * every group shape — THE property that licenses q11's plan swap. */
class QuantilesSpec extends SparkSpecBase {

  private val QS = Map(
    "q00" -> 0.0, "q25" -> 0.25, "q50" -> 0.5,
    "q77" -> 0.77, "q90" -> 0.9, "q100" -> 1.0)

  test("exactQuantiles == percentile aggregate across group shapes and q values") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random fixture: duplicates, skewed group
    // sizes, a single-row group, an all-equal group, nulls to ignore
    val rows = (
      (1 to 257).map(i => ("a", ((i * 2654435761L) % 1000).toDouble / 7.0)) ++
      (1 to 64).map(i => ("b", (i % 9).toDouble)) ++         // heavy duplicates
      Seq(("c", 42.0)) ++                                    // single row
      (1 to 16).map(_ => ("d", 5.5)) ++                      // all equal
      Seq(("a", Double.NaN)).filter(_ => false)
    ).toDF("g", "v")
      .union(Seq(("b", null.asInstanceOf[java.lang.Double]))
        .toDF("g", "v").select(col("g"), col("v").cast("double")))
    val mine = Quantiles.exactQuantiles(rows, "g", "v", QS).collect()
      .map(r => r.getString(0) ->
        QS.keys.toSeq.sorted.map(k => r.getDouble(r.fieldIndex(k)))).toMap
    val ref = rows.groupBy("g").agg(
        QS.toSeq.sortBy(_._1).map { case (k, q) =>
          percentile(col("v"), lit(q)).as(k)
        }.head,
        QS.toSeq.sortBy(_._1).map { case (k, q) =>
          percentile(col("v"), lit(q)).as(k)
        }.tail: _*)
      .collect()
      .map(r => r.getString(0) ->
        QS.keys.toSeq.sorted.map(k => r.getDouble(r.fieldIndex(k)))).toMap
    assert(mine.keySet === ref.keySet,
      "all-NULL-value groups aside, group coverage must match")
    for (g <- ref.keySet; (a, b) <- mine(g).zip(ref(g)))
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"group $g: $a vs percentile's $b")
  }

  test("n column counts non-null values; all-null group is absent") {
    val s = spark
    import s.implicits._
    val rows = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None), ("z", None))
      .toDF("g", "v").select(col("g"), col("v").cast("double"))
    val out = Quantiles.exactQuantiles(rows, "g", "v", Map("med" -> 0.5))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("a", 2L, 1.5)),
      "nulls excluded from rank arithmetic; all-null group absent")
  }

  test("plan: no percentile buffer, no Expand, distinct values travel once") {
    val s = spark
    import s.implicits._
    val rows = (1 to 100).map(i => (s"g${i % 3}", (i % 17).toDouble)).toDF("g", "v")
    val p = Quantiles.exactQuantiles(rows, "g", "v", Map("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!p.contains("percentile("), "no unbounded percentile aggregate")
    assert(!p.contains("Expand"), "no Expand")
    assert(!p.contains("CartesianProduct"), "keyed joins only")
  }
}
