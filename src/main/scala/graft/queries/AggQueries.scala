package graft.queries

import org.apache.spark.sql.functions._

/** A2–A9 — distinct / approximate / percentile aggregates, collection
  * aggregates, grouping sets (SURVEY.md §2.5). All partial+final hash
  * aggregates: the map-side combine keeps shuffle volume proportional to
  * group count, not row count, at any SF.
  *
  * Approximate aggregates (`approx_count_distinct` = HLL++,
  * `percentile_approx` = KLL-ish sketch) cannot hash-match an exact oracle;
  * per SURVEY.md §7.5 they are gated as a tolerance *flag* computed in Spark
  * (approx vs exact within 3×rsd) whose expected value the oracle asserts as
  * TRUE, alongside exact variants that hash-match bit-for-bit.
  */
object AggQueries extends QueryGroup {
  import H._

  val q11 = QueryDef(
    "q11_agg_distinct_approx_percentile",
    "per event_type: exact countDistinct, HLL approx within tolerance (flag), " +
      "exact interpolated percentiles (sort-based two-pass — bounded state), " +
      "distinct-sum",
    (s, dir) => {
      val e = t(s, dir, "events")
      // Exact quantiles via the bounded-state sort-based operator
      // (graft.operators.Quantiles — NOT Spark's `percentile`, whose
      // O(rows/group) value→count buffer merges on one task per group
      // and OOMs at 100× scale); distinct aggregates split into separate
      // aggregations so no Expand multiplies the input.
      val qt = graft.operators.Quantiles.exactQuantiles(
        e, "event_type", "value", Map("p50" -> 0.5, "p90" -> 0.9))
      val stats = e.where(col("value").isNotNull)
        .groupBy("event_type", "value").agg(count(lit(1)).as("c"))
        .groupBy("event_type").agg(
          min(col("value")).as("vmin"),
          max(col("value")).as("vmax"),
          // the distinct rows ARE the distinct values: distinct-sum for free
          sum(dec(col("value"))).cast("double").as("sum_distinct_value"))
      // HLL++ register updates are idempotent, so the sketch over the
      // deduped (event_type, user_id) pairs equals the sketch over the raw
      // log — one distinct-shuffle, no Expand from mixed distinct aggs.
      val users = e.select("event_type", "user_id").distinct()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"),
             approx_count_distinct(col("user_id"), 0.05).as("au"))
      // KLL-style sketch stays per-group-bounded (state ~ accuracy), gated
      // as a tolerance flag exactly as before.
      val papprox = e.groupBy("event_type")
        .agg(percentile_approx(col("value"), lit(0.5), lit(100)).as("ap50"))
      qt
        .join(stats, "event_type")
        .join(users, "event_type")
        .join(papprox, "event_type")
        .select(
          col("event_type"),
          col("n_users"),
          (abs(col("au") - col("n_users")) <= col("n_users") * 0.15).as("approx_ok"),
          round(col("p50"), 4).as("p50_value"),
          round(col("p90"), 4).as("p90_value"),
          (abs(col("ap50") - col("p50"))
            <= (col("vmax") - col("vmin")) * 0.05).as("approx_p50_ok"),
          col("sum_distinct_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
            COUNT(DISTINCT user_id) AS n_users,
            TRUE AS approx_ok,
            ROUND(quantile_cont(value, 0.5), 4) AS p50_value,
            ROUND(quantile_cont(value, 0.9), 4) AS p90_value,
            TRUE AS approx_p50_ok,
            CAST(SUM(DISTINCT CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_distinct_value
            FROM events GROUP BY event_type ORDER BY event_type"""))

  val q12 = QueryDef(
    "q12_agg_collect_map",
    "per user: sorted collect_set of event types, map_from_entries(type→count) " +
      "probed via element_at — the reference's collectMap analogue (README.md:54)",
    (s, dir) => {
      val e = t(s, dir, "events")
      val perType = e.groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      perType.groupBy("user_id")
        .agg(
          array_join(array_sort(collect_set(col("event_type"))), ",").as("types_sorted"),
          sum(col("cnt")).as("n_events"),
          map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt")))))
            .as("type_map"))
        .select(
          col("user_id"), col("types_sorted"), col("n_events"),
          coalesce(element_at(col("type_map"), "click"), lit(0L)).as("n_click"),
          coalesce(element_at(col("type_map"), "purchase"), lit(0L)).as("n_purchase"),
          coalesce(element_at(col("type_map"), "error"), lit(0L)).as("n_error"))
        .orderBy("user_id")
    },
    Some("""WITH tc AS (
              SELECT user_id, event_type, COUNT(*) AS cnt
              FROM events GROUP BY user_id, event_type)
            SELECT user_id,
              string_agg(event_type, ',' ORDER BY event_type) AS types_sorted,
              CAST(SUM(cnt) AS BIGINT) AS n_events,
              COALESCE(MAX(CASE WHEN event_type = 'click' THEN cnt END), 0) AS n_click,
              COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN cnt END), 0) AS n_purchase,
              COALESCE(MAX(CASE WHEN event_type = 'error' THEN cnt END), 0) AS n_error
            FROM tc GROUP BY user_id ORDER BY user_id"""))

  val q13 = QueryDef(
    "q13_agg_rollup_region_nation",
    "ROLLUP(r_name, n_name) over customer acctbal with grouping_id — " +
      "subtotal + grand-total rows in one aggregation pass",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("rname"), col("n_name").as("nname"), col("c_acctbal"))
        // expr() refs, not col()/names: rollup over a post-join Dataset with
        // dataset-id-tagged grouping refs trips the ambiguous-self-join
        // detector (the rollup Expand duplicates the tagged attributes)
        .rollup(expr("rname"), expr("nname"))
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_cust"),
          msum(col("c_acctbal")).as("sum_acctbal"))
        .withColumnRenamed("rname", "r_name")
        .withColumnRenamed("nname", "n_name")
        // expr() resolves by name against this plan only — Dataset-tagged
        // col() refs to rollup grouping columns trip the self-join detector
        .orderBy(expr("gid"), expr("coalesce(r_name, '')"), expr("coalesce(n_name, '')"))
    },
    Some(s"""SELECT r_name, n_name,
             GROUPING(r_name, n_name) AS gid,
             COUNT(*) AS n_cust,
             ${oMsum("c_acctbal")} AS sum_acctbal
             FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY ROLLUP(r_name, n_name)
             ORDER BY gid, COALESCE(r_name, ''), COALESCE(n_name, '')"""))

  val q14 = QueryDef(
    "q14_agg_cube_orders",
    "CUBE(o_orderstatus, o_orderpriority): all 4 grouping-set combinations",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_orders"),
          msum(col("o_totalprice")).as("sum_price"),
          davg(col("o_totalprice")).as("avg_price"))
        .orderBy(col("gid"), coalesce(col("o_orderstatus"), lit("")),
          coalesce(col("o_orderpriority"), lit("")))
    },
    Some(s"""SELECT o_orderstatus, o_orderpriority,
             GROUPING(o_orderstatus, o_orderpriority) AS gid,
             COUNT(*) AS n_orders,
             ${oMsum("o_totalprice")} AS sum_price,
             ${oDavg("o_totalprice")} AS avg_price
             FROM orders
             GROUP BY CUBE(o_orderstatus, o_orderpriority)
             ORDER BY gid, COALESCE(o_orderstatus, ''), COALESCE(o_orderpriority, '')"""))

  override def queries: Seq[QueryDef] = Seq(q11, q12, q13, q14)
}
