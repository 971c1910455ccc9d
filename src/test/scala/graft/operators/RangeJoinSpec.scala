package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** RangeJoin's bucket rewrite must be complete AND precise vs the
  * naive inequality join, including pairs that straddle bucket edges.
  */
class RangeJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("band == naive inequality join on real events") {
    val ev = Tables(spark, sf, "events")
    val l = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val band = 3600L * 1000 * 1000 * 1000
    val got = RangeJoin.band(l, r, Seq("user_id"), "ts_ns", "ts_ns",
        band, "p_")
      .select(col("event_id"), col("p_event_id"))
    val naive = l.as("a").join(r.as("b"),
        col("a.user_id") === col("b.user_id") &&
          abs(col("a.ts_ns") - col("b.ts_ns")) <= band)
      .select(col("a.event_id"), col("b.event_id").as("p_event_id"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "bucketed band join diverges from the naive join")
    assert(got.count() == naive.count(), "duplicate or lost candidate pairs")
  }

  test("bucket edges: pairs exactly band apart and cross-bucket pairs survive") {
    import spark.implicits._
    val l = Seq((1L, "k", 100L), (2L, "k", 10L)).toDF("id", "key", "t")
    val r = Seq((10L, "k", 110L),  // exactly band above id 1
      (11L, "k", 90L),             // below, same bucket
      (12L, "k", 21L),             // 11 above id 2, > band
      (13L, "k", 0L),              // exactly band below id 2
      (14L, "x", 100L))            // other key — never matches
      .toDF("id", "key", "t")
    val got = RangeJoin.band(l, r, Seq("key"), "t", "t", band = 10L, "r_")
      .select(col("id"), col("r_id")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 13L)))
  }
}
