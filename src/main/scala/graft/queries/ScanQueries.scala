package graft.queries

import org.apache.spark.sql.functions._

/** S8/P1/P2/A1 — scans, filter/project, hash aggregation (SURVEY.md §2.1, §2.3,
  * §2.5). Filters and projections are plain Catalyst expressions so predicate
  * pushdown + column pruning reach the parquet scan; the aggregate is a
  * partial+final hash aggregate with no extra shuffle beyond the group-by.
  */
object ScanQueries extends QueryGroup {
  import H._

  val q01 = QueryDef(
    "q01_scan_filter_project",
    "σ/π over lineitem: shipdate range filter (pushed to parquet), arithmetic projection",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      l.filter(col("l_shipdate") >= ntz("1997-01-01 00:00:00") &&
          col("l_shipdate") < ntz("1998-01-01 00:00:00"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some(s"""SELECT l_orderkey, l_linenumber,
            ${oDec4("l_extendedprice * (1.0 - l_discount)")} AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
            ORDER BY l_orderkey, l_linenumber"""))

  val q02 = QueryDef(
    "q02_agg_lineitem_pricing",
    "TPC-H Q1-style pricing summary: multi-aggregate groupBy with exact decimal sums",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val charge = discPrice * (lit(1.0) + col("l_tax"))
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          msum(col("l_quantity")).as("sum_qty"),
          msum(col("l_extendedprice")).as("sum_base_price"),
          msum(discPrice).as("sum_disc_price"),
          msum(charge).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
             ${oMsum("l_quantity")} AS sum_qty,
             ${oMsum("l_extendedprice")} AS sum_base_price,
             ${oMsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
             ${oMsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
             ${oDavg("l_quantity")} AS avg_qty,
             ${oDavg("l_extendedprice")} AS avg_price,
             ${oDavg("l_discount", 6)} AS avg_disc,
             COUNT(*) AS count_order
             FROM lineitem
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus"""))

  override def queries: Seq[QueryDef] = Seq(q01, q02)
}
