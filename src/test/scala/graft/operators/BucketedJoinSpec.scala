package graft.operators

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The co-located join story (SURVEY.md "Partitioning & shuffle"): both
  * sides bucketed on the join key ⇒ the join runs with ZERO exchanges —
  * at 100 TB this is the difference between a full-fact-table shuffle and
  * none at all. */
class BucketedJoinSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key plans without any Exchange") {
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      Tables.load(s, sfDir, "orders")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bucketed")
      Tables.load(s, sfDir, "customer")
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bucketed")

      val joined = s.table("orders_bucketed")
        .join(s.table("customer_bucketed"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed co-located join must not shuffle:\n$plan")
      assert(joined.count() === Tables.load(s, sfDir, "orders").count(),
        "every order matches exactly one customer")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS orders_bucketed")
      s.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
