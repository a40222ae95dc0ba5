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

  test("keySkewProfile: hand-computed hot key, ratio, and salt recommendation") {
    val s = spark
    import s.implicits._
    // key 7 appears 60 times, 40 other keys once: n=100, keys=41
    val rows = Seq.fill(60)(7L) ++ (100L until 140L)
    val r = Skew.keySkewProfile(rows.toDF("k"), "k", targetTasks = 10)
      .collect().head
    assert(r.getLong(0) === 100L && r.getLong(1) === 41L)
    assert(r.getLong(2) === 60L && r.getString(3) === "7")
    assert(r.getDouble(4) === 2.439)                   // 100/41 rounded
    assert(r.getDouble(5) === 24.6)                    // 60*41/100
    // hot key holds 60% of rows; 10 target tasks ⇒ level share is 10 rows
    // ⇒ salt 6 caps the hottest reducer at one share: ceil(60*10/100)=6
    assert(r.getLong(6) === 6L)
  }

  test("keySkewProfile: level keys recommend salt 1; top-key ties break by key") {
    val s = spark
    import s.implicits._
    val level = Seq(1L, 2L, 3L, 4L).flatMap(k => Seq.fill(3)(k))
    val r = Skew.keySkewProfile(level.toDF("k"), "k").collect().head
    assert(r.getDouble(5) === 1.0 && r.getLong(6) === 1L)
    assert(r.getString(3) === "1", "tied max frequencies pick the smallest key string")
  }
}
