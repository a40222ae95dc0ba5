package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F1–F4 / O1–O3 — analytic window functions, per-group and global top-k
  * (SURVEY.md §2.6, §2.7). Window functions shuffle once on the partition key
  * and sort within partitions — no self-joins. The global top-k compiles to
  * TakeOrderedAndProject: each partition keeps k rows, the driver merges
  * k×partitions rows, so it never materializes a full sort at 100 TB.
  */
object WindowFnQueries extends QueryGroup {
  import H._

  val q15 = QueryDef(
    "q15_window_topk_per_group",
    "top-3 orders per customer by totalprice: row_number over (custkey, price desc)",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) t
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  val q16 = QueryDef(
    "q16_window_running_sum",
    "running revenue per customer over order date (rowsBetween unboundedPreceding→current)",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(
          col("o_custkey"), col("o_orderkey"), tsStr(col("o_orderdate")).as("order_ts"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spent"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some(s"""SELECT o_custkey, o_orderkey, ${oTsStr("o_orderdate")} AS order_ts,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spent
             FROM orders ORDER BY o_custkey, o_orderkey"""))

  val q17 = QueryDef(
    "q17_window_lag_lead",
    "per-user inter-event gaps via lag/lead, first event type via first_value",
    (s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      e.select(col("user_id"), col("event_id"), col("event_type"), us(col("ts")).as("tus"))
        .select(
          col("user_id"), col("event_id"),
          (col("tus") - lag(col("tus"), 1).over(w)).cast("long").as("prev_gap_us"),
          (lead(col("tus"), 1).over(w) - col("tus")).cast("long").as("next_gap_us"),
          first_value(col("event_type")).over(w).as("first_type"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
              CAST(epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS BIGINT) AS prev_gap_us,
              CAST(LEAD(epoch_us(ts), 1) OVER w - epoch_us(ts) AS BIGINT) AS next_gap_us,
              FIRST_VALUE(event_type) OVER w AS first_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            ORDER BY user_id, event_id"""))

  val q18 = QueryDef(
    "q18_topk_global_offset",
    "global top-k with pagination: rows 6..15 by extendedprice (TakeOrderedAndProject)",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .offset(5)
        .limit(10)
    },
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
            LIMIT 10 OFFSET 5"""))

  override def queries: Seq[QueryDef] = Seq(q15, q16, q17, q18)
}
