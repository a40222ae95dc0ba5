package graft.expressions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ShingleExplodeSpec extends SparkSpecBase {

  test("explode_shingles works from pure SQL via LATERAL VIEW (registry-resolved)") {
    val s = spark
    import s.implicits._
    Seq((1L, "a b c d"), (2L, "x y"), (3L, "a b c a b c"))
      .toDF("doc_id", "text").createOrReplaceTempView("docs_udtf")
    try {
      val rows = s.sql(
        """SELECT d.doc_id, sh.shingle
          |FROM docs_udtf d LATERAL VIEW explode_shingles(text, 3) sh AS shingle
          |ORDER BY doc_id, shingle""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // doc 2 has < 3 tokens -> no rows; doc 3's duplicate shingles dedupe
      assert(rows.toSeq === Seq(
        (1L, "a b c"), (1L, "b c d"),
        (3L, "a b c"), (3L, "b c a"), (3L, "c a b")))
    } finally s.catalog.dropTempView("docs_udtf")
  }

  test("explode_shingles equals the declarative distinct-shingle explode") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d"), (2L, " a b c d "), (3L, "a\tb\nc d"),
      (4L, "x  y   z w"), (5L, ""), (6L, " "), (7L, "a b"),
      (8L, "w1 w2 w3 w4 w5 w1 w2 w3")).toDF("doc_id", "text")
    val declared = df
      .select(col("doc_id"), graft.functions.TextOps.shingles(col("text"), 3).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val generated = df
      .select(col("doc_id"), expr("explode_shingles(text, 3)").as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(generated === declared)
  }

  test("explode_shingles rejects non-string input with a clear message") {
    val s = spark
    import s.implicits._
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(expr("explode_shingles(x, 3)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
