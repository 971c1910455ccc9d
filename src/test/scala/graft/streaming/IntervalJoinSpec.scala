package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join semantics: same-key pairs within the
  * time band match across micro-batches, out-of-band pairs never
  * match, and the watermark + range condition bound the buffered
  * state (matches stop once the horizon passes — the property that
  * makes the join runnable on unbounded streams).
  */
class IntervalJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("same-key in-band pairs match across batches; out-of-band never") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val errs = MemoryStream[(String, java.sql.Timestamp, Long)]
    val purs = MemoryStream[(String, java.sql.Timestamp, Long)]
    val joined = WindowedStats.intervalJoin(
      errs.toDF().toDF("user", "ts", "id"),
      purs.toDF().toDF("user", "ts", "id"),
      key = "user", tsCol = "ts", watermarkDelay = "5 minutes",
      before = "10 minutes", after = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      def pairs() = spark.table("ij")
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      // batch 1: one error; matching purchase arrives in a LATER batch
      errs.addData(("u1", ts("2024-01-01 10:00:00"), 1L))
      purs.addData(("u2", ts("2024-01-01 10:00:00"), 100L)) // other key
      q.processAllAvailable()
      assert(pairs().isEmpty)

      // batch 2: u1 purchase 4 min after the error → in band, matches
      // the BUFFERED left row; u1 purchase 30 min later → out of band
      purs.addData(("u1", ts("2024-01-01 10:04:00"), 101L),
        ("u1", ts("2024-01-01 10:30:00"), 102L))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 101L)),
        s"expected exactly the in-band cross-batch match: ${pairs()}")

      // batch 3: a second error inside 102's band still matches it —
      // right rows stay buffered while the watermark horizon allows
      errs.addData(("u1", ts("2024-01-01 10:28:00"), 2L))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 101L), (2L, 102L)))
    } finally q.stop()
  }
}
