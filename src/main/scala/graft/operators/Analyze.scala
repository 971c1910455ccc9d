package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table statistics — the ANALYZE / system.columns surface a query
  * planner and a data-quality dashboard both need: per column, the
  * row count, non-null count, exact distinct count, and min/max
  * (rendered as strings so every column fits one uniform schema).
  *
  * Plan shape: ONE scan producing ONE aggregate row (4 aggregates per
  * column, all partial-aggregatable), then a driver-side unpivot of
  * that single row into per-column rows — no per-column rescans, no
  * shuffle beyond the one aggregate exchange. At 100 TB the exact
  * distinct count swaps for approx_count_distinct (HLL++, same call
  * shape, mergeable) — the q53 discipline.
  */
object Analyze {

  def stats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        countDistinct(col(c)).as(s"${c}__d"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*).collect()(0)
    val rows = row.getLong(0)
    val out = cols.map { c =>
      (c, rows, rows - row.getAs[Long](s"${c}__n"),
        row.getAs[Long](s"${c}__d"),
        row.getAs[String](s"${c}__min"), row.getAs[String](s"${c}__max"))
    }
    out.toDF("column", "n_rows", "n_null", "n_distinct", "min", "max")
  }
}
