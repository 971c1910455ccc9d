package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Query-surface exposure of the transcode parity semantics (SURVEY.md
  * §2.2): bristle's Go-style integer narrowing wraps two's-complement
  * (reference clickhouse_table.go:290-370), bools become 0/1 integers
  * (:308-314). Spark 4 runs ANSI mode, where a plain overflow CAST
  * throws, so narrowing is expressed as explicit wraparound arithmetic —
  * which also makes the semantics engine-independent (identical in the
  * DuckDB oracle).
  */
object Transcode {

  /** Two's-complement wrap of a BIGINT column to a signed width of 2^bits,
    * matching Go's int8(x)/int16(x)/int32(x) conversion semantics.
    */
  def wrapSigned(c: Column, bits: Int): Column = {
    val m = 1L << bits
    val half = 1L << (bits - 1)
    ((c % m + m + half) % m) - half
  }

  /** DuckDB spelling of [[wrapSigned]]. */
  def oWrap(e: String, bits: Int): String = {
    val m = 1L << bits
    val half = 1L << (bits - 1)
    s"((($e) % $m + $m + $half) % $m) - $half"
  }

  /** P4: integer width narrowing with Go wraparound semantics. */
  val q18 = Q(
    "q18_width_casts",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          wrapSigned(col("l_orderkey"), 8).cast("tinyint").as("ok_i8"),
          wrapSigned(col("l_orderkey"), 16).cast("smallint").as("ok_i16"),
          wrapSigned(col("l_partkey") * 77777, 32).cast("int").as("pk_i32"))
        .filter(col("l_orderkey") < 500)
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some(s"""
      SELECT l_orderkey, l_linenumber,
             CAST(${oWrap("l_orderkey", 8)} AS TINYINT) AS ok_i8,
             CAST(${oWrap("l_orderkey", 16)} AS SMALLINT) AS ok_i16,
             CAST(${oWrap("l_partkey * 77777", 32)} AS INT) AS pk_i32
      FROM lineitem
      WHERE l_orderkey < 500
      ORDER BY l_orderkey, l_linenumber"""))

  /** P5: bool → 0/1 integer column (UInt8 target in the reference). */
  val q19 = Q(
    "q19_bool_to_int",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .withColumn("discounted",
          (col("l_discount") > lit(0.05)).cast("tinyint"))
        .groupBy(col("discounted"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("discounted")),
    Some(s"""
      SELECT CAST(l_discount > 0.05 AS TINYINT) AS discounted,
             COUNT(*) AS n,
             ${oSum("l_extendedprice")} AS sum_price
      FROM lineitem
      GROUP BY 1
      ORDER BY discounted"""))

  val all: Seq[Q] = Seq(q18, q19)
}
