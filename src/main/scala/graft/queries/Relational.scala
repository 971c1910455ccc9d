package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Relational query surface over the TPC-H-ish tables.
  *
  * bristle itself has no query language (SURVEY.md §2.5) — these are the
  * ClickHouse-side analytics its landed tables exist to serve, expressed
  * with the stock DataFrame API so Catalyst provides pushdown, pruning,
  * partial aggregation and join planning for free.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: scan-heavy group-aggregate.
    * At scale: partial (map-side) aggregation collapses 100 TB to a
    * handful of groups before the shuffle; only the 4-ish group keys
    * cross the wire.
    */
  val q01 = Q(
    "q01_pricing_summary",
    (spark, dir) => {
      val l = Tables(spark, dir, "lineitem")
      l.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${oSum("l_quantity")} AS sum_qty,
             ${oSum("l_extendedprice")} AS sum_base_price,
             ${oSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${oSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
             ${oAvg("l_quantity")} AS avg_qty,
             ${oAvg("l_extendedprice")} AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  val all: Seq[Q] = Seq(q01)
}
