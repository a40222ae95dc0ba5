package graft

import org.apache.spark.sql.Row

/** Registration-drift guard: every native expression the extension
  * injects must stay reachable from RAW SQL (the pure-SQL user surface
  * GraftExtensions exists for). A kernel that compiles but silently
  * drops out of the registry would only fail here. */
class GraftExtensionsSpec extends SparkSpecBase {

  private def one(sql: String): Row = spark.sql(sql).collect().head

  test("every registered function is callable from SQL") {
    // scalar kernels
    assert(one("SELECT float_dot(array(1.0F, 2.0F), array(3.0F, 4.0F))").getDouble(0) === 11.0)
    assert(one("SELECT ascii_poly_hash('ab')").getLong(0) ===
      (('a'.toLong * 31 + 'b'.toLong) % 1000000007L))
    assert(one("SELECT size(nibble_hist(cast('ab' as binary)))").getInt(0) === 16)
    assert(one("SELECT simhash64('a b c')").schema.head.dataType.typeName === "long")
    assert(one("SELECT size(portable_simhash_bands('a b c'))").getInt(0) === 4)
    assert(one("SELECT size(minhash_sig('a b c d', 3, 8))").getInt(0) === 8)
    assert(one("SELECT minhash_sig('a b', 3, 8)").isNullAt(0),
      "short docs must yield null signatures")
    assert(one("SELECT size(shingle_hashes('a b c d', 3))").getInt(0) === 2)
    assert(one("SELECT jaccard_shingles('a b c d', 'a b c', 3)")
      .getSeq[Long](0) === Seq(1L, 2L, 1L))
    assert(one("SELECT size(hyperplane_bands(array(1.0F, 0.5F), 2, 3))").getInt(0) === 2)
    assert(one("SELECT sorted_long_intersect(array(1L, 3L, 7L, 9L), array(3L, 4L, 9L))")
      .getLong(0) === 2L)
    assert(one("SELECT sorted_long_intersect(array(1L, 2L), array(3L, 4L))").getLong(0) === 0L)
    assert(one(
      "SELECT sorted_long_intersect(shingle_hashes('', 3), array(1L))").getLong(0) === 0L)
    // generator UDTF in SELECT position
    assert(spark.sql("SELECT explode_shingles('a b c d', 3)").count() === 2L)
  }

  test("literal-argument contract errors are clear, not planner internals") {
    val e = intercept[Exception](
      spark.sql("SELECT minhash_sig('a b c', length('xxx'), 8)").collect())
    assert(e.getMessage.contains("integer literal"))
  }
}
