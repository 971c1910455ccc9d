package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time semantics pins: watermark drops late rows exactly once
  * it has passed their window; explicit per-key state accumulates
  * across micro-batches.
  */
class WindowedStatsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarked window agg drops rows later than the watermark") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = WindowedStats.windowedCounts(
        ms.toDF().toDF("ts", "key", "value"),
        "ts", "key", windowLen = "10 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("update")
      .start()
    try {
      // batch 1: a 10:00-window row and a 10:20 row that will advance
      // the watermark to 10:15 for the NEXT batch
      ms.addData((ts("2024-01-01 10:00:30"), "a", 1.0),
        (ts("2024-01-01 10:20:00"), "a", 2.0))
      q.processAllAvailable()
      // batch 2: 10:01 is later than the 10:15 watermark and its
      // [10:00, 10:10) window is closed → dropped, not double-counted
      ms.addData((ts("2024-01-01 10:01:00"), "a", 100.0))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .filter($"w_start" === ts("2024-01-01 10:00:00")).collect()
      assert(rows.length == 1, s"late row re-opened a closed window: ${rows.toSeq}")
      assert(rows(0).getLong(2) == 1L && rows(0).getDouble(3) == 1.0,
        "late row was counted despite the watermark")
      // a timely row in the open 10:20 window still lands
      ms.addData((ts("2024-01-01 10:21:00"), "a", 4.0))
      q.processAllAvailable()
      val open = spark.table("wc")
        .filter($"w_start" === ts("2024-01-01 10:20:00")).collect()
      assert(open.map(_.getLong(2)).max == 2L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer: gap closes inline, idle key closes by timeout") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val withWm = ms.toDF().toDF("ts", "key", "value")
      .withWatermark("ts", "0 seconds")
      .select($"key", $"ts", $"value")
      .as[(String, java.sql.Timestamp, Double)]
    val q = WindowedStats.sessionize(withWm, gapMs = 60000L)
      .writeStream.format("memory").queryName("sess").outputMode("append")
      .start()
    try {
      def sessions() = spark.table("sess").orderBy($"startMs").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // batch 1: two events 30 s apart (one session), then one 10 min
      // later — the in-batch gap closes session 1 immediately
      ms.addData((ts("2024-01-01 10:00:00"), "a", 1.0),
        (ts("2024-01-01 10:00:30"), "a", 2.0),
        (ts("2024-01-01 10:10:00"), "a", 3.0))
      q.processAllAvailable()
      assert(sessions().count(_._1 == "a") == 1, "in-batch gap did not close a session")
      assert(sessions().head._4 == 2L)
      // batch 2: next event far past the gap → closes session 2 inline
      ms.addData((ts("2024-01-01 10:20:00"), "a", 4.0))
      q.processAllAvailable()
      assert(sessions().count(_._1 == "a") == 2)
      // batch 3: only key b arrives; it advances the watermark past
      // 10:21, so a's last open session closes via event-time timeout
      ms.addData((ts("2024-01-01 10:30:00"), "b", 9.0))
      q.processAllAvailable()
      val a = sessions().filter(_._1 == "a")
      assert(a.length == 3, s"idle session did not close by timeout: ${a.toSeq}")
      assert(a(2)._2 == a(2)._3 && a(2)._4 == 1L) // single-event session
      // exactly-once: nothing re-emits on a further watermark advance
      ms.addData((ts("2024-01-01 11:00:00"), "b", 1.0))
      q.processAllAvailable()
      assert(sessions().count(_._1 == "a") == 3)
    } finally q.stop()
  }

  test("sessionize: cross-batch out-of-order event extends backwards, never rewinds") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    // a REAL watermark delay so older-than-state events survive the
    // late filter — the 0-second test above can never exercise this
    val withWm = ms.toDF().toDF("ts", "key", "value")
      .withWatermark("ts", "10 minutes")
      .select($"key", $"ts", $"value")
      .as[(String, java.sql.Timestamp, Double)]
    val q = WindowedStats.sessionize(withWm, gapMs = 60000L)
      .writeStream.format("memory").queryName("sess_ooo").outputMode("append")
      .start()
    try {
      ms.addData((ts("2024-01-01 10:00:00"), "k", 1.0))
      q.processAllAvailable()
      // out-of-order, above the watermark, within the gap of the open
      // session: must extend startMs backwards and keep lastMs
      ms.addData((ts("2024-01-01 09:59:30"), "k", 2.0))
      q.processAllAvailable()
      // advance the watermark far past lastMs + gap → timeout close
      ms.addData((ts("2024-01-01 10:30:00"), "z", 9.0))
      q.processAllAvailable()
      val k = spark.table("sess_ooo").filter($"key" === "k").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(k.length == 1, s"expected one closed session: ${k.toSeq}")
      val (start, last, n) = k.head
      assert(start == ts("2024-01-01 09:59:30").getTime,
        "out-of-order event did not extend the session backwards")
      assert(last == ts("2024-01-01 10:00:00").getTime,
        "out-of-order event rewound lastMs (premature close, wrong end)")
      assert(n == 2L)
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-key state across micro-batches") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Double)]
    val q = WindowedStats.runningStats(ms.toDS())
      .writeStream.format("memory").queryName("rs").outputMode("update")
      .start()
    try {
      ms.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
      q.processAllAvailable()
      ms.addData(("a", 4.0))
      q.processAllAvailable()
      val last = spark.table("rs").filter($"key" === "a")
        .orderBy($"n".desc).collect().head
      assert(last.getLong(1) == 3L, "state did not persist across batches")
      assert(last.getDouble(2) == 7.0 && last.getDouble(3) == 4.0)
      val b = spark.table("rs").filter($"key" === "b")
        .orderBy($"n".desc).collect().head
      assert(b.getLong(1) == 1L && b.getDouble(3) == 10.0)
    } finally q.stop()
  }

  test("chi2 drift monitor: matching window scores 0, skewed window alarms") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long, Double)]
    // append mode: a window emits only once the watermark finalizes it
    val q = WindowedStats.windowedCounts(
        ms.toDF().toDF("ts", "bucket", "value"),
        "ts", "bucket", windowLen = "10 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("drift").outputMode("append")
      .start()
    try {
      // window 10:00: 10 rows of each bucket — exactly the reference shape
      val even = (0 until 10).flatMap(i => Seq(
        (ts(f"2024-01-01 10:00:${i}%02d"), 0L, 0.0),
        (ts(f"2024-01-01 10:01:${i}%02d"), 1L, 0.0)))
      // window 10:10: all 20 rows in bucket 0 — maximal skew
      val skew = (0 until 20).map(i => (ts(f"2024-01-01 10:10:${i}%02d"), 0L, 0.0))
      ms.addData(even ++ skew: _*)
      q.processAllAvailable()
      // push the watermark past both windows so append finalizes them
      ms.addData((ts("2024-01-01 10:40:00"), 0L, 0.0))
      q.processAllAvailable()
      val finalized = spark.table("drift")
      assert(finalized.filter($"w_start" < ts("2024-01-01 10:20:00"))
        .count() == 3, "both windows must be finalized (3 bucket rows)")

      val ref = Seq((0L, 50L), (1L, 50L)).toDF("bucket", "ref_n")
      val chi2 = WindowedStats.chi2Drift(
          finalized.filter($"w_start" < ts("2024-01-01 10:20:00")), ref)
        .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1.getTime)
      assert(chi2.length == 2)
      // matching shape: E = 10/10, observed 10/10 → χ² exactly 0
      assert(chi2(0)._2 == 0.0, s"matched window must score 0: ${chi2(0)}")
      // skew: E = 10/10, observed 20/0 → (10²/10) + (10²/10) = 20 exactly
      assert(chi2(1)._2 == 20.0, s"skewed window must score 20: ${chi2(1)}")
      // the vanished bucket was counted (zero-count buckets contribute)
      assert(chi2.forall(_._3 == 2L))
    } finally q.stop()
  }
}
