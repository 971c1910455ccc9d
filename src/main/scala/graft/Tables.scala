package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's parquet testdata tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * API takes a directory so every query is scale-factor agnostic and
  * the physical layout can be swapped without touching query code.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects outright; read it as raw nanos and floor to the
    // engine's microsecond TimestampType (DuckDB's TIMESTAMP_NS operations
    // truncate identically at µs and ms granularity).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The raw nanos column stays exposed as ts_ns: a range predicate on
    // the DERIVED timestamp (timestamp_micros(...)) cannot be pushed to
    // parquet (PlanSpec caught the full scan); one on ts_ns prunes
    // row groups. Filter on ts_ns, read time through ts.
    if (name == "events")
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    else df
  }

  /** Pushdown-safe event-time bound: epoch nanos of a UTC instant, for
    * comparing against the raw `ts_ns` column.
    */
  def utcNanos(isoInstant: String): Long = {
    val i = java.time.Instant.parse(isoInstant)
    i.getEpochSecond * 1000000000L + i.getNano
  }
}
