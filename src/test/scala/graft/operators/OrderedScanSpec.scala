package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OrderedScan's bucket decomposition must be bit-identical to the
  * single-window forms it replaces — on real tables and on adversarial
  * bucket layouts (empty buckets, all-one-bucket, one-row buckets).
  */
class OrderedScanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("runningTotal == single-window running sum (documents, any bucket width)") {
    val docs = Tables(spark, sf, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"))
    val ref = docs.withColumn("run",
      sum(col("n_chars")).over(Window.partitionBy(col("lang"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    for (width <- Seq(1, 37, 500, 1000000)) {
      val got = OrderedScan.runningTotal(docs, col("lang"), Seq(col("doc_id")),
        col("n_chars"), floor(col("doc_id") / width), "run")
      assert(ref.select("lang", "doc_id", "run")
        .exceptAll(got.select("lang", "doc_id", "run")).isEmpty &&
        got.count() == ref.count(),
        s"runningTotal diverges from single-window at bucket width $width")
    }
  }

  test("runningTotal == single window with MULTI-column order (q72's hash-order shape)") {
    // ord = (hash-like string, tiebreak id), bucket monotone in the
    // FIRST order column only — the stratified-draw decomposition
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map { i =>
      (s"k${rnd.nextInt(4)}", f"${rnd.nextInt(64)}%02x", i.toLong, rnd.nextInt(9) + 1L)
    }
    val df = rows.toDF("key", "h", "tb", "v")
    val ref = df.withColumn("rk",
      sum(col("v")).over(Window.partitionBy(col("key"))
        .orderBy(col("h"), col("tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    for (width <- Seq(1, 4, 16)) {
      // bucket = leading hex chunk: monotone in h (fixed-width hex)
      val got = OrderedScan.runningTotal(df, col("key"),
        Seq(col("h"), col("tb")), col("v"),
        floor(conv(col("h"), 16, 10) / width), "rk")
      assert(ref.select("key", "tb", "rk")
        .exceptAll(got.select("key", "tb", "rk")).isEmpty &&
        got.count() == ref.count(),
        s"multi-ord runningTotal diverges at bucket width $width")
    }
  }

  test("laggedHead == single-window lag (events, incl. duplicate order keys)") {
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"), col("event_id"), col("ts_ns"))
    val ref = ev.withColumn("prev",
      lag(col("ts_ns"), 1).over(Window.partitionBy(col("event_type"))
        .orderBy(col("ts_ns"), col("event_id"))))
    for (width <- Seq(1000L * 1000 * 1000, 3600L * 1000 * 1000 * 1000)) {
      val got = OrderedScan.laggedHead(ev, col("event_type"), col("ts_ns"),
        col("event_id"), floor(col("ts_ns") / width), "prev")
      assert(ref.exceptAll(got.select("event_type", "event_id", "ts_ns", "prev"))
        .isEmpty && got.count() == ref.count(),
        s"laggedHead diverges from single-window at bucket width $width")
    }
  }

  test("stitch handles empty buckets and per-key first rows") {
    import spark.implicits._
    // key a: buckets 0 and 9 occupied (1..8 empty); key b: single row
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 95L, 30L),
      ("b", 50L, 5L)).toDF("k", "ord", "v")
    val run = OrderedScan.runningTotal(df, col("k"), Seq(col("ord")),
        col("v"), floor(col("ord") / 10), "run")
      .orderBy("k", "ord").select("run").as[Long].collect()
    assert(run.toSeq == Seq(10L, 30L, 60L, 5L))
    val prev = OrderedScan.laggedHead(df, col("k"), col("ord"), col("v"),
        floor(col("ord") / 10), "prev")
      .orderBy("k", "ord").select("prev").collect()
    assert(prev(0).isNullAt(0))           // first row of key a
    assert(prev(1).getLong(0) == 1L)
    assert(prev(2).getLong(0) == 2L)      // across 8 empty buckets
    assert(prev(3).isNullAt(0))           // first (only) row of key b
  }

  test("rollingSum == single-window sliding frame (events, any bucket width)") {
    val k = 4
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"), col("event_id"), col("ts_ns"),
        (col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(-(k - 1), Window.currentRow)
    val ref = ev.withColumn("rsum", sum(col("cents")).over(w))
      .withColumn("rn", count(lit(1)).over(w))
    // widths chosen so buckets range from one-row (frames span MANY
    // buckets — the group-coalescing case) to everything-in-one
    for (width <- Seq(1000L * 1000, 3600L * 1000 * 1000 * 1000,
        Long.MaxValue)) {
      val got = OrderedScan.rollingSum(ev, col("event_type"), col("ts_ns"),
        col("event_id"), col("cents"), k, floor(col("ts_ns") / width),
        "rsum", "rn")
      assert(ref.select("event_type", "event_id", "rsum", "rn")
        .exceptAll(got.select("event_type", "event_id", "rsum", "rn")).isEmpty &&
        got.count() == ref.count(),
        s"rollingSum diverges from single-window at bucket width $width")
    }
  }

  test("rollingSum == single window on seeded random layouts and frame sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val k = 1 + rnd.nextInt(5)
      val width = Seq(1L, 7L, 100L)(trial)
      // duplicate ord values are fine — the (ord, tiebreak) pair is a
      // total order because the tiebreak index is unique
      val rows = (0 until 400).map { i =>
        (s"k${rnd.nextInt(3)}", rnd.nextInt(50).toLong, i.toLong,
          rnd.nextInt(1000).toLong)
      }
      val df = rows.toDF("key", "ord", "tb", "v")
      val w = Window.partitionBy(col("key")).orderBy(col("ord"), col("tb"))
        .rowsBetween(-(k - 1), Window.currentRow)
      val ref = df.withColumn("rsum", sum(col("v")).over(w))
        .withColumn("rn", count(lit(1)).over(w))
      val got = OrderedScan.rollingSum(df, col("key"), col("ord"), col("tb"),
        col("v"), k, floor(col("ord") / width), "rsum", "rn")
      assert(ref.select("key", "tb", "rsum", "rn")
        .exceptAll(got.select("key", "tb", "rsum", "rn")).isEmpty &&
        got.count() == ref.count(),
        s"trial $trial (k=$k width=$width) diverged")
    }
  }

  test("rollingSum exact across sparse one-row buckets and key starts") {
    import spark.implicits._
    // key a: 6 rows in buckets far apart — every frame spans multiple
    // raw buckets; key b: fewer rows than the frame
    val df = Seq(("a", 1L, 1L), ("a", 11L, 2L), ("a", 21L, 4L),
      ("a", 31L, 8L), ("a", 41L, 16L), ("a", 51L, 32L),
      ("b", 5L, 100L), ("b", 15L, 200L)).toDF("k", "ord", "v")
    val got = OrderedScan.rollingSum(df, col("k"), col("ord"), col("v"),
        col("v"), 3, floor(col("ord") / 10), "rsum", "rn")
      .orderBy("k", "ord").select("rsum", "rn").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L), (3L, 2L), (7L, 3L), (14L, 3L),
      (28L, 3L), (56L, 3L), (100L, 1L), (300L, 2L)))
  }

  test("bottomK == full-sort row_number filter (events hash order, any width/k)") {
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"), col("event_id"))
      .withColumn("h",
        conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
    for (k <- Seq(1, 17, 256, 1000000); width <- Seq(1L << 53, 1L << 57)) {
      val ref = ev.withColumn("rk",
          row_number().over(Window.partitionBy(col("event_type"))
            .orderBy(col("h"), col("event_id"))).cast("long"))
        .filter(col("rk") <= k)
      val got = OrderedScan.bottomK(ev, col("event_type"), col("h"),
        col("event_id"), expr(s"h div ${width}L"), k, "rk")
      assert(ref.select("event_type", "event_id", "rk")
        .exceptAll(got.select("event_type", "event_id", "rk")).isEmpty &&
        got.count() == ref.count(),
        s"bottomK diverges from full sort at k=$k width=$width")
    }
  }

  test("bottomK: duplicate ord values resolved by tiebreak; k past group size keeps all") {
    import spark.implicits._
    // key a: 5 rows with DUPLICATE ord values across two buckets;
    // key b: 2 rows, k exceeds the group
    val df = Seq(("a", 3L, 1L), ("a", 3L, 2L), ("a", 3L, 3L),
      ("a", 10L, 4L), ("a", 10L, 5L), ("b", 7L, 6L))
      .toDF("k", "ord", "tb")
    val got = OrderedScan.bottomK(df, col("k"), col("ord"), col("tb"),
        floor(col("ord") / 10), 4, "rk")
      .orderBy("k", "rk").select("tb", "rk").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (6L, 1L)))
  }

  test("bottomK prunes buckets past the k-th row before the sort") {
    // bucket width 1 on dense ords: key a's rows land in 30 distinct
    // buckets, but only buckets whose prefix count < 3 may host a
    // rank <= 3 row — the survivor set the heavy window sees must be
    // the first three (ord 0, 1, 2), anything else is unpruned work
    import spark.implicits._
    val df = (0L until 30L).map(i => ("a", i, i)).toDF("k", "ord", "tb")
    val got = OrderedScan.bottomK(df, col("k"), col("ord"), col("tb"),
      col("ord"), 3, "rk")
    assert(got.select("ord").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // the plan's window-side scan is joined against the survivor
    // list; with per-row buckets the join build side is 3 rows, so
    // the window input itself is 3 rows — pin via the physical plan's
    // row-level filter on the rank staying AFTER a 3-row join, not a
    // 30-row sort: cheapest observable = output ranks are exactly 1..3
    assert(got.select("rk").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("bottomK with a STRUCT key == full sort (q136's composite-group shape)") {
    // q136 groups by struct(event_type, day): the key rides groupBy,
    // window partition and the survivor equi-join — struct equality
    // must behave identically in all three or ranks silently shift
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_id"))
    val key = struct(col("event_type"), col("day"))
    val ref = ev.withColumn("rk",
        row_number().over(Window.partitionBy(col("event_type"), col("day"))
          .orderBy(col("event_id"))).cast("long"))
      .filter(col("rk") <= 7)
    val got = OrderedScan.bottomK(ev, key, col("event_id"),
      col("event_id"), col("event_id") / 64, 7, "rk")
    assert(ref.select("event_type", "day", "event_id", "rk")
      .exceptAll(got.select("event_type", "day", "event_id", "rk")).isEmpty &&
      got.count() == ref.count(),
      "struct-keyed bottomK diverges from full sort")
  }
}
