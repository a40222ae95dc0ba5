package graft.operators

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Positional-zip gates: contiguous 0-based ranks equal to the window
  * form, partition invariance, shorter-side trim, and the disjoint-name
  * and total-order preconditions. */
class ZipSpec extends SparkSpecBase {

  private lazy val orders = Tables.load(spark, sfDir, "orders")
  private lazy val customer = Tables.load(spark, sfDir, "customer")

  test("seqByOrder equals the (one-task) window rank under the same total order") {
    val got = Zip.seqByOrder(orders.select("o_orderkey"), Seq(col("o_orderkey")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("o_orderkey")
    val want = orders.select(col("o_orderkey"),
        (row_number().over(w) - 1).cast("long").as("seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("seqByOrder is invariant to input partitioning") {
    val base = Zip.seqByOrder(orders.select("o_orderkey"), Seq(col("o_orderkey")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val again = Zip.seqByOrder(orders.select("o_orderkey").repartition(11),
        Seq(col("o_orderkey")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === base)
  }

  test("zipByOrder trims to the shorter side and pairs in index order") {
    val nCust = customer.count()
    val z = Zip.zipByOrder(
      orders.select(col("o_orderkey")), Seq(col("o_orderkey")),
      customer.select(col("c_custkey")), Seq(col("c_custkey")))
    assert(z.count() === math.min(orders.count(), nCust))
    // the i-th order pairs with the i-th customer: both columns ascend with seq
    val rows = z.orderBy("seq").collect()
    val oks = rows.map(_.getLong(1))
    val cks = rows.map(_.getLong(2))
    assert(oks.zip(oks.tail).forall { case (a, b) => a < b })
    assert(cks.zip(cks.tail).forall { case (a, b) => a < b })
  }

  test("preconditions fail fast: overlapping names, existing seq column, empty order") {
    intercept[IllegalArgumentException] {
      Zip.zipByOrder(orders, Seq(col("o_orderkey")), orders, Seq(col("o_orderkey")))
    }
    intercept[IllegalArgumentException] {
      Zip.seqByOrder(orders.withColumn("seq", lit(1L)), Seq(col("o_orderkey")))
    }
    intercept[IllegalArgumentException] {
      Zip.seqByOrder(orders, Seq.empty)
    }
  }
}
