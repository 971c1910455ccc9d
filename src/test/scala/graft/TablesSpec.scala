package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** The events time spine must be generator-shape-proof: the testdata
  * generator has shipped `events.ts` both as parquet TIMESTAMP(NANOS)
  * (rounds 1-9; Spark reads it as raw int64 nanos under
  * `nanosAsLong`) and as plain TIMESTAMP(MICROS) NTZ (round 10+).
  * Tables must normalize both to an IDENTICAL ts_ns/ts/ts_raw
  * surface, and tsRange must produce a parquet-pushable predicate
  * against whichever physical type is stored. Round 10 lost the whole
  * events suite to exactly this seam — pin it.
  */
class TablesSpec extends SparkSpec {

  // one instant either side of the q14 day boundary, µs precision
  private val instants = Seq(
    "2024-01-04T23:59:59.999999Z",
    "2024-01-05T00:00:00Z",
    "2024-01-05T12:34:56.789012Z",
    "2024-01-06T00:00:00Z")

  private def micros(iso: String): Long = {
    val i = java.time.Instant.parse(iso)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Write an events-shaped parquet with `ts` of the given physical
    * type and read it back through Tables.
    */
  private def eventsVia(tsType: DataType, tsVal: Long => Any): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tablesspec-").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val rows = instants.zipWithIndex.map { case (iso, i) =>
      Row(i.toLong, tsVal(micros(iso)), 7L, "click", 1.0, "{}")
    }
    spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val ntzDir = eventsVia(TimestampNTZType,
    us => java.time.LocalDateTime.ofEpochSecond(
      us / 1000000L, (us % 1000000L).toInt * 1000,
      java.time.ZoneOffset.UTC))
  // the legacy shape as Tables sees it: int64 epoch nanos under
  // nanosAsLong (the logical annotation is invisible above the scan).
  // Known fixture gap (ADVICE r10): this writes PLAIN INT64 — Spark
  // cannot write a TIMESTAMP(NANOS) logical annotation — so the
  // PushedFilters pin exercises the post-nanosAsLong reader surface,
  // not annotated-nanos pushdown eligibility itself; that was probed
  // against the real rounds-1-9 generator files while they existed.
  private val nanosDir = eventsVia(LongType, us => us * 1000L)

  test("both generator shapes normalize to the same ts_ns/ts surface") {
    val ntz = Tables(spark, ntzDir, "events")
      .select("event_id", "ts_ns", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      .sortBy(_._1)
    val legacy = Tables(spark, nanosDir, "events")
      .select("event_id", "ts_ns", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      .sortBy(_._1)
    assert(ntz.toSeq == legacy.toSeq)
    assert(ntz.map(_._2).toSeq == instants.map(micros(_) * 1000L))
  }

  test("tsRange slices the same half-open window in both shapes") {
    for (dir <- Seq(ntzDir, nanosDir)) {
      val ev = Tables(spark, dir, "events")
      val got = ev.filter(Tables.tsRange(ev,
          "2024-01-05T00:00:00Z", "2024-01-06T00:00:00Z"))
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L), s"wrong slice for $dir")
    }
  }

  test("tsRange predicate reaches PushedFilters in both shapes") {
    for (dir <- Seq(ntzDir, nanosDir)) {
      val ev = Tables(spark, dir, "events")
      val plan = ev.filter(Tables.tsRange(ev,
          "2024-01-05T00:00:00Z", "2024-01-06T00:00:00Z"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThanOrEqual(ts"),
        s"range not pushed for $dir:\n$plan")
    }
  }
}
