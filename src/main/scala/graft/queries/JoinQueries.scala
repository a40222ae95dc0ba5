package graft.queries

import org.apache.spark.sql.functions._

/** J1–J6 — the join surface (SURVEY.md §2.4). All shapes are Catalyst
  * built-ins; the engine's job is picking scale-correct physical strategies:
  * dimension tables (region/nation/customer/part at these ratios) are
  * broadcast so the 100 TB fact side never shuffles for the join; the
  * range/as-of self-joins pre-filter both sides before the equi-join on the
  * key so the range predicate runs on a co-partitioned pair.
  */
object JoinQueries extends QueryGroup {
  import H._

  val q03 = QueryDef(
    "q03_join_star_revenue",
    "4-way star join lineitem→orders→customer→nation→region; revenue per region",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      // customer scales with SF — no forced broadcast hint; the 32MB
      // autoBroadcastJoinThreshold / AQE picks broadcast at small SF and
      // falls back to shuffle join at 100TB scale. nation/region are
      // fixed-size dims, always safe to hint.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          msum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name")
    },
    Some(s"""SELECT r_name,
             ${oMsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             COUNT(*) AS n_items
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY r_name ORDER BY r_name"""))

  val q04 = QueryDef(
    "q04_join_broadcast_part",
    "fact ⋈ dim: lineitem ⋈ part, price stats per brand (auto-broadcast under threshold)",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      // part scales with SF: rely on autoBroadcastJoinThreshold/AQE rather
      // than a forced hint that would OOM at the 100TB design point.
      val p = t(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          davg(col("l_extendedprice")).as("avg_price"),
          msum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")
    },
    Some(s"""SELECT p_brand, COUNT(*) AS n_items,
             ${oDavg("l_extendedprice")} AS avg_price,
             ${oMsum("l_quantity")} AS sum_qty
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY p_brand ORDER BY p_brand"""))

  val q05 = QueryDef(
    "q05_join_left_outer_orders",
    "customer LEFT OUTER JOIN orders: per-customer order count incl. zero-order customers",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(msum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    },
    Some(s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
             COALESCE(${oMsum("o_totalprice")}, 0.0) AS total_spent
             FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey ORDER BY c_custkey"""))

  val q06 = QueryDef(
    "q06_join_semi_customers",
    "LEFT SEMI: customers having at least one order (EXISTS)",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  val q07 = QueryDef(
    "q07_join_anti_customers",
    "LEFT ANTI: customers with no orders (NOT EXISTS)",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  val q08 = QueryDef(
    "q08_join_theta_region_nation",
    "cross/theta join (BroadcastNestedLoopJoin): region × nation pairs with differing keys",
    (s, dir) => {
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      r.crossJoin(broadcast(n))
        .filter(col("n_regionkey") =!= col("r_regionkey"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name FROM region, nation
            WHERE n_regionkey <> r_regionkey
            ORDER BY r_name, n_name"""))

  val q09 = QueryDef(
    "q09_join_range_events",
    "range join: per purchase, clicks of the same user in the preceding hour",
    (s, dir) => {
      val e = t(s, dir, "events")
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), us(col("ts")).as("pts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), us(col("ts")).as("cts"))
      p.join(c, col("user_id") === col("c_user") &&
          col("cts") >= col("pts") - lit(3600000000L) && col("cts") < col("pts"))
        .groupBy("pid")
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy("pid")
    },
    Some("""SELECT p.event_id AS pid, COUNT(*) AS n_clicks
            FROM events p JOIN events c
              ON c.user_id = p.user_id
             AND c.event_type = 'click'
             AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
             AND epoch_us(c.ts) < epoch_us(p.ts)
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id ORDER BY pid"""))

  val q10 = QueryDef(
    "q10_join_asof_events",
    "as-of join: most recent prior click per purchase — union + per-user ordered window scan " +
      "(single shuffle on user_id, linear per-user work; no purchases×clicks fan-out)",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "events")
      // One pass: interleave purchases and clicks per user in time order.
      // At a purchase row, the preceding frame holds exactly the clicks with
      // cts < pts (equal-ts clicks sort AFTER the purchase via is_click), and
      // the LAST click row in (tus, is_click, click_value) order is the
      // latest one, max-value on cts ties — a deterministic tie-break, per
      // the FIXTURES determinism contract.
      val ev = e.filter(col("event_type").isin("purchase", "click"))
        .select(
          col("event_id"), col("user_id"), us(col("ts")).as("tus"),
          (col("event_type") === "click").cast("int").as("is_click"),
          when(col("event_type") === "click", col("value")).as("click_value"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("tus"), col("is_click"), col("click_value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // ts and value come from the SAME click row (one last() over a
      // struct): two independent last(..., ignoreNulls) calls would pair
      // the newest timestamp with a value from an OLDER click whenever the
      // newest click's value is NULL, and existence-filtering on the value
      // would drop purchases whose only prior clicks carry NULL values —
      // the oracle keeps them with a NULL asof_value
      ev.withColumn("asof",
          last(when(col("is_click") === 1, struct(col("tus"), col("click_value"))),
            ignoreNulls = true).over(w))
        .filter(col("is_click") === 0 && col("asof").isNotNull)
        .select(col("event_id").as("pid"),
          col("asof.tus").as("asof_ts_us"), col("asof.click_value").as("asof_value"))
        .orderBy("pid")
    },
    Some("""WITH j AS (
              SELECT p.event_id AS pid, epoch_us(c.ts) AS cts, c.value AS cval
              FROM events p JOIN events c
                ON c.user_id = p.user_id
               AND c.event_type = 'click'
               AND epoch_us(c.ts) < epoch_us(p.ts)
              WHERE p.event_type = 'purchase'
            ), m AS (SELECT pid, MAX(cts) AS asof_ts_us FROM j GROUP BY pid)
            SELECT m.pid, m.asof_ts_us, MAX(j.cval) AS asof_value
            FROM m JOIN j ON j.pid = m.pid AND j.cts = m.asof_ts_us
            GROUP BY m.pid, m.asof_ts_us
            ORDER BY m.pid"""))

  val q51 = QueryDef(
    "q51_join_salted_skew",
    "skew-salted join: a synthetic 75%-hot key (three quarters of lineitem " +
      "land on key 0) joined to nation through Skew.saltedJoin, which fans " +
      "the hot key across saltFactor reducers; revenue aggregated per " +
      "nation — results identical to the plain join (the oracle IS the " +
      "plain join)",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("hk",
          when(pmod(col("l_orderkey"), lit(1000)) < 750, lit(0L))
            .otherwise(pmod(col("l_orderkey"), lit(25))))
      val n = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
      graft.operators.Skew.saltedJoin(li, n, "hk", "nk", saltFactor = 8)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_rows"), msum(col("l_extendedprice")).as("sum_price"))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, COUNT(*) AS n_rows,
              ${oMsum("l_extendedprice")} AS sum_price
            FROM lineitem JOIN nation
              ON (CASE WHEN l_orderkey % 1000 < 750 THEN 0
                       ELSE l_orderkey % 25 END) = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  override def queries: Seq[QueryDef] =
    Seq(q03, q04, q05, q06, q07, q08, q09, q10, q51)
}
