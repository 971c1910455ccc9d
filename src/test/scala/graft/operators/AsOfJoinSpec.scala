package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** AsOfJoin must equal the brute-force per-left-row definition (join
  * all prior right rows, keep the max in order) and honor the total
  * order's tie rule exactly.
  */
class AsOfJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("asof == brute-force latest-prior on real events") {
    val ev = Tables(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts_ns"))

    val got = AsOfJoin.asofFlat(clicks, views, Seq("user_id"),
      Seq("ts_ns", "event_id"), Seq("event_id"), "view_")
      .select(col("event_id"), col("view_event_id"))

    // brute force: all (click, prior view) pairs, keep max (ts, id)
    val pairs = clicks.as("c").join(views.as("v"),
        col("c.user_id") === col("v.user_id") &&
          (col("v.ts_ns") < col("c.ts_ns") ||
            (col("v.ts_ns") === col("c.ts_ns") &&
              col("v.event_id") < col("c.event_id"))),
        "left")
      .groupBy(col("c.event_id").as("event_id"))
      .agg(max_by(col("v.event_id"),
        struct(col("v.ts_ns"), col("v.event_id"))).as("view_event_id"))

    assert(got.count() == clicks.count(), "as-of must keep every left row")
    assert(got.exceptAll(pairs).isEmpty && pairs.exceptAll(got).isEmpty,
      "as-of join diverges from brute-force latest-prior")
  }

  test("tie rule and no-match edges") {
    import spark.implicits._
    // key k: right rows at t=10 (id 1), t=20 (id 4); left at t=5 (no
    // match), t=10 id 0 (tie, right id 1 NOT < 0 → only nothing), t=10
    // id 2 (tie, right id 1 < 2 → match), t=30 (latest = id 4)
    val left = Seq(("k", 5L, 0L), ("k", 10L, 0L), ("k", 10L, 2L), ("k", 30L, 9L))
      .toDF("key", "t", "id")
    val right = Seq(("k", 10L, 1L), ("k", 20L, 4L), ("x", 1L, 7L))
      .toDF("key", "t", "id")
    val got = AsOfJoin.asof(left, right, Seq("key"), Seq("t", "id"),
        Seq("id"), "m")
      .orderBy(col("t"), col("id"))
      .select(col("m.id")).collect()
    assert(got(0).isNullAt(0), "left before any right must be unmatched")
    assert(got(1).isNullAt(0), "tie with larger right id must not match")
    assert(got(2).getLong(0) == 1L, "tie with smaller right id must match")
    assert(got(3).getLong(0) == 4L)
  }

  test("asofWithin nulls stale matches; fresh ones keep the asof answer") {
    import spark.implicits._
    // right at t=10; lefts at t=15 (gap 5, fresh), t=60 (gap exactly
    // the tolerance — inclusive bound keeps it), t=100 (gap 90, stale
    // under tolerance 50 — would match without the bound)
    val left = Seq(("k", 15L, 0L), ("k", 60L, 2L), ("k", 100L, 1L))
      .toDF("key", "t", "id")
    val right = Seq(("k", 10L, 7L)).toDF("key", "t", "id")
    val got = AsOfJoin.asofWithin(left, right, Seq("key"), Seq("t", "id"),
        Seq("t", "id"), "m", tolerance = 50L)
      .orderBy(col("t")).select(col("m.id")).collect()
    assert(got(0).getLong(0) == 7L, "fresh match must survive the bound")
    assert(got(1).getLong(0) == 7L,
      "gap == tolerance is 'no older than X' inclusive — must match")
    assert(got(2).isNullAt(0), "stale match must be nulled, not carried")
    // equivalence with unbounded asof under a huge tolerance
    val loose = AsOfJoin.asofWithin(left, right, Seq("key"), Seq("t", "id"),
        Seq("t", "id"), "m", tolerance = Long.MaxValue)
      .orderBy(col("t")).select(col("m.id")).collect()
    assert(loose(0).getLong(0) == 7L && loose(1).getLong(0) == 7L &&
      loose(2).getLong(0) == 7L)
  }
}
