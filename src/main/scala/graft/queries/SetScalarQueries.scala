package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

/** O4–O6 set operations, §2.8 scalar function families (string / date / json /
  * map / array higher-order). Set ops hash-partition both sides on the full
  * row — at scale Catalyst plans them as aggregates over union / left-anti
  * joins, which AQE can broadcast when one side is small. Scalar functions
  * are all codegen'd Catalyst built-ins evaluated inside WholeStageCodegen —
  * no UDFs anywhere on these paths (SURVEY.md §4.2).
  */
object SetScalarQueries extends QueryGroup {
  import H._

  val q19 = QueryDef(
    "q19_set_intersect_except",
    "set algebra over customer-key sets: BUILDING-segment vs big-spender custkeys " +
      "(INTERSECT / EXCEPT both directions, tagged and unioned)",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val seg = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val big = o.filter(col("o_totalprice") > 200000.0)
        .select(col("o_custkey").as("c_custkey")).distinct()
      seg.intersect(big).withColumn("tag", lit("both"))
        .union(seg.except(big).withColumn("tag", lit("seg_only")))
        .union(big.except(seg).withColumn("tag", lit("big_only")))
        .orderBy("tag", "c_custkey")
    },
    Some("""WITH seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
                 big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                         WHERE o_totalprice > 200000.0)
            SELECT c_custkey, 'both' AS tag FROM (SELECT * FROM seg INTERSECT SELECT * FROM big)
            UNION ALL
            SELECT c_custkey, 'seg_only' AS tag FROM (SELECT * FROM seg EXCEPT SELECT * FROM big)
            UNION ALL
            SELECT c_custkey, 'big_only' AS tag FROM (SELECT * FROM big EXCEPT SELECT * FROM seg)
            ORDER BY tag, c_custkey"""))

  val q20 = QueryDef(
    "q20_distinct_pairs",
    "dropDuplicates on (user_id, event_type), then count distinct pairs per type",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.dropDuplicates("user_id", "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n_pairs
            FROM (SELECT DISTINCT user_id, event_type FROM events) t
            GROUP BY event_type ORDER BY event_type"""))

  val q21 = QueryDef(
    "q21_string_functions",
    "string family over part: regexp_extract/replace, split, LIKE, case, pad, instr",
    (s, dir) => {
      val p = t(s, dir, "part")
      p.filter(col("p_brand").like("Brand#1%"))
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
          size(split(col("p_name"), " ")).cast(LongType).as("n_tokens"),
          upper(col("p_brand")).as("brand_upper"),
          substring(col("p_type"), 1, 3).as("type3"),
          length(col("p_name")).cast(LongType).as("name_len"),
          instr(col("p_name"), "a").cast(LongType).as("first_a"),
          lpad(col("p_size").cast(StringType), 4, "0").as("size_padded"),
          regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey,
              regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
              CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
              upper(p_brand) AS brand_upper,
              substring(p_type, 1, 3) AS type3,
              CAST(length(p_name) AS BIGINT) AS name_len,
              CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
              lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
              regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel
            FROM part WHERE p_brand LIKE 'Brand#1%'
            ORDER BY p_partkey"""))

  val q22 = QueryDef(
    "q22_date_extract_orders",
    "date family: orders per year×month with span (year/month/date_trunc/min/max)",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(
          year(col("o_orderdate")).cast(LongType).as("yr"),
          month(col("o_orderdate")).cast(LongType).as("mo"))
        .agg(
          count(lit(1)).as("n_orders"),
          msum(col("o_totalprice")).as("sum_price"),
          countDistinct(date_trunc("day", col("o_orderdate"))).as("n_days"),
          tsStr(min(col("o_orderdate"))).as("first_order"),
          tsStr(max(col("o_orderdate"))).as("last_order"))
        .orderBy("yr", "mo")
    },
    Some(s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
             COUNT(*) AS n_orders,
             ${oMsum("o_totalprice")} AS sum_price,
             COUNT(DISTINCT date_trunc('day', o_orderdate)) AS n_days,
             ${oTsStr("MIN(o_orderdate)")} AS first_order,
             ${oTsStr("MAX(o_orderdate)")} AS last_order
             FROM orders GROUP BY 1, 2 ORDER BY yr, mo"""))

  val q23 = QueryDef(
    "q23_date_trunc_events",
    "daily event rollup via date_trunc + date arithmetic (date_add)",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"), msum(col("value")).as("sum_value"))
        .select(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          date_format(date_add(col("day"), 7), "yyyy-MM-dd").as("week_later"),
          col("n_events"), col("sum_value"))
        .orderBy("day")
    },
    Some(s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             strftime(date_trunc('day', ts) + INTERVAL 7 DAY, '%Y-%m-%d') AS week_later,
             COUNT(*) AS n_events,
             ${oMsum("value")} AS sum_value
             FROM events GROUP BY date_trunc('day', ts)
             ORDER BY day"""))

  val q24 = QueryDef(
    "q24_json_map_props",
    "JSON parsing of events.props: get_json_object scalar probe + from_json map keys",
    (s, dir) => {
      val e = t(s, dir, "events")
      // stage the parsed map as an attribute: one from_json per row, and
      // map_keys against the bound reference twice for free
      e.select(col("event_id"), col("props"),
          from_json(col("props"), MapType(StringType, StringType)).as("m"))
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k_value"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"),
          size(map_keys(col("m"))).cast(LongType).as("n_keys"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
              array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
              CAST(len(json_keys(props)) AS BIGINT) AS n_keys
            FROM events ORDER BY event_id"""))

  val q25 = QueryDef(
    "q25_array_higher_order",
    "array/higher-order family over embeddings: size, L2 norm via aggregate, " +
      "filter, sort+slice — all codegen-free lambda built-ins",
    (s, dir) => {
      val v = t(s, dir, "embeddings")
      v.select(
          col("vec_id"), col("label").cast(LongType).as("label"),
          size(col("embedding")).cast(LongType).as("dim"),
          expr("round(sqrt(aggregate(embedding, cast(0 as double), " +
            "(s, x) -> s + cast(x as double) * cast(x as double))), 4)").as("l2_norm"),
          expr("round(cast(element_at(embedding, 1) as double), 5)").as("first_val"),
          expr("cast(size(filter(embedding, x -> x > 0)) as bigint)").as("n_positive"),
          expr("round(aggregate(slice(sort_array(embedding, false), 1, 3), " +
            "cast(0 as double), (s, x) -> s + cast(x as double)), 4)").as("top3_sum"))
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id, CAST(label AS BIGINT) AS label,
              CAST(len(embedding) AS BIGINT) AS dim,
              ROUND(sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
              ROUND(CAST(embedding[1] AS DOUBLE), 5) AS first_val,
              CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
              ROUND(list_sum(list_transform(list_reverse_sort(embedding)[1:3],
                x -> CAST(x AS DOUBLE))), 4) AS top3_sum
            FROM embeddings ORDER BY vec_id"""))

  override def queries: Seq[QueryDef] = Seq(q19, q20, q21, q22, q23, q24, q25)
}
