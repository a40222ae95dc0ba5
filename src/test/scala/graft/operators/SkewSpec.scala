package graft.operators

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {

  test("saltedJoin returns exactly the plain-join result") {
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(o, c, "o_custkey", "c_custkey", saltFactor = 4)
      .select("o_orderkey", "c_custkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === plain)
  }

  test("salting replicates the small side saltFactor times") {
    val s = spark
    import s.implicits._
    val big = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
    val small = Seq((1L, "dim1"), (2L, "dim2")).toDF("k2", "d")
    val out = Skew.saltedJoin(big, small, "k", "k2", saltFactor = 8)
    assert(out.count() === 3, "join multiplicity unchanged by salting")
  }
}
