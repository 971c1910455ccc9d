package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Readers for the driver's parquet testdata tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * API takes a directory so every query is scale-factor agnostic and
  * the physical layout can be swapped without touching query code.
  */
object Tables {

  /** The event-time surface every query sees, whichever physical type
    * the generator wrote:
    *
    *  - `ts_ns`  LongType epoch nanos — the arithmetic/sort/bucket
    *    spine (OHLC buckets, as-of ordering, z-order keys).
    *  - `ts`     TimestampType (µs) — the calendar surface
    *    (date_format, windows); floored from nanos, identical to what
    *    DuckDB's µs/ms operations compute.
    *  - `ts_raw` the column AS STORED — the ONLY one whose predicates
    *    reach parquet row-group stats. Range-filter via [[tsRange]],
    *    never by hand.
    *
    * Generators have shipped events.ts two ways: parquet
    * TIMESTAMP(NANOS) (rounds 1-9; Spark's vectorized reader rejects
    * it outright, so it is read as raw int64 nanos via
    * `nanosAsLong`), and plain TIMESTAMP(MICROS) NTZ (round 10+).
    * Both normalize to the same three-column surface, so queries,
    * layouts, and oracles are byte-identical across generator
    * versions.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ts_ns/ts derivation below converts wall-clock to epoch via the
    // session zone; the surface (and every oracle) defines event time
    // in UTC, so a non-UTC session cannot produce correct results.
    // Pin it — but NOISILY (ADVICE r10): a caller that set another
    // zone on purpose sees the override on stderr instead of a silent
    // permanent session mutation. Every graft main already sets UTC,
    // so the warning only fires for embedding callers.
    val zone = spark.conf.get("spark.sql.session.timeZone")
    if (zone != "UTC") {
      System.err.println(s"[tables] overriding spark.sql.session.timeZone " +
        s"'$zone' -> 'UTC': the ts_ns/ts surface and its oracles define " +
        "event time in UTC")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        case LongType => // TIMESTAMP(NANOS) read as raw int64 nanos
          df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_raw", col("ts_ns"))
            .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
        case _ => // native µs timestamp (NTZ): derive the nanos spine
          df.withColumnRenamed("ts", "ts_raw")
            .withColumn("ts_ns",
              expr("unix_micros(cast(ts_raw as timestamp)) * 1000"))
            .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      }
    } else df
  }

  /** Pushdown-safe event-time bound: epoch nanos of a UTC instant, for
    * comparing against the raw `ts_ns` column.
    */
  def utcNanos(isoInstant: String): Long = {
    val i = java.time.Instant.parse(isoInstant)
    i.getEpochSecond * 1000000000L + i.getNano
  }

  /** Half-open event-time range `[lo, hi)` as a predicate that reaches
    * parquet row-group stats: it compares `ts_raw` — the column as
    * physically stored — with a literal of the SAME type, so the
    * filter survives into `PushedFilters` instead of dissolving into
    * unpushable arithmetic on a derived column (PlanSpec pins this; a
    * predicate on the derived `ts`/`ts_ns` scans everything).
    */
  def tsRange(df: DataFrame, loIso: String, hiIso: String): Column =
    df.schema("ts_raw").dataType match {
      case LongType =>
        col("ts_raw") >= utcNanos(loIso) && col("ts_raw") < utcNanos(hiIso)
      case TimestampType =>
        col("ts_raw") >= lit(java.sql.Timestamp.from(
          java.time.Instant.parse(loIso))) &&
          col("ts_raw") < lit(java.sql.Timestamp.from(
            java.time.Instant.parse(hiIso)))
      case _ => // TIMESTAMP_NTZ: wall-clock literal, tz-free
        col("ts_raw") >= lit(java.time.LocalDateTime.ofInstant(
          java.time.Instant.parse(loIso), java.time.ZoneOffset.UTC)) &&
          col("ts_raw") < lit(java.time.LocalDateTime.ofInstant(
            java.time.Instant.parse(hiIso), java.time.ZoneOffset.UTC))
    }
}
