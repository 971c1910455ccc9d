package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** dedupWithinWatermark semantics pins: first occurrence passes,
  * in-window duplicates are dropped across micro-batches, and state
  * is EVICTED after the watermark passes (a far-later duplicate
  * re-emits — the bounded-state trade, caught downstream by batch
  * dedup).
  */
class StreamingDedupSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("incremental dedup stream: history hits suppressed, stream dups collapse, novel passes") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val history = Seq((0L, "seen before"), (1L, "old text"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = WindowedStats.incrementalDedupStream(
        ms.toDF().toDF("ts", "doc_id", "text"), history,
        "text", "ts", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("incdd").outputMode("append")
      .start()
    try {
      // batch 1: a history dup, a novel text duplicated in-batch
      ms.addData(
        (ts("2024-01-01 10:00:00"), 10L, "seen before"),
        (ts("2024-01-01 10:00:01"), 11L, "fresh one"),
        (ts("2024-01-01 10:00:02"), 12L, "fresh one"))
      q.processAllAvailable()
      // batch 2: cross-batch stream dup + another history hit + novel
      ms.addData(
        (ts("2024-01-01 10:01:00"), 13L, "fresh one"),
        (ts("2024-01-01 10:01:01"), 14L, "old text"),
        (ts("2024-01-01 10:01:02"), 15L, "unique new"))
      q.processAllAvailable()
      val got = spark.table("incdd").collect()
        .map(r => (r.getLong(1), r.getString(2))).toSeq.sortBy(_._1)
      // first arrival of "fresh one" (id 11) survives; ids 10/14 are
      // history hits; 12/13 are stream dups; 15 is novel
      assert(got == Seq((11L, "fresh one"), (15L, "unique new")),
        s"got $got")
      // parity with the batch operator on the same data, modulo the
      // documented arrival-order-vs-min-id difference (here aligned)
      val batch = graft.pipeline.Dedup.incrementalExact(history,
          Seq((10L, "seen before"), (11L, "fresh one"), (12L, "fresh one"),
            (13L, "fresh one"), (14L, "old text"), (15L, "unique new"))
            .toDF("doc_id", "text"),
          "text", "doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(batch == got.map(_._1), "streaming result diverged from batch dedup")
    } finally q.stop()
  }

  test("in-window duplicates dropped across batches; state evicted after watermark") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = WindowedStats.dedupWithinWatermark(
        ms.toDF().toDF("ts", "digest", "value"),
        "ts", Seq("digest"), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dd").outputMode("append")
      .start()
    try {
      def emitted() = spark.table("dd").collect()
        .map(r => (r.getString(1), r.getDouble(2))).toSeq.sorted

      // batch 1: duplicate digest inside one batch → one survivor
      ms.addData((ts("2024-01-01 10:00:00"), "A", 1.0),
        (ts("2024-01-01 10:00:05"), "A", 2.0),
        (ts("2024-01-01 10:00:10"), "B", 3.0))
      q.processAllAvailable()
      assert(emitted().map(_._1) == Seq("A", "B"))

      // batch 2: duplicate across batches, still within the delay → dropped
      ms.addData((ts("2024-01-01 10:05:00"), "A", 4.0))
      q.processAllAvailable()
      assert(emitted().map(_._1) == Seq("A", "B"))

      // batch 3: advance the watermark far past A's expiry
      // (event time + delay), evicting its dedup state
      ms.addData((ts("2024-01-01 11:00:00"), "C", 5.0))
      q.processAllAvailable()

      // batch 4: A again, long after the delay window → re-emitted
      // (bounded state: the stream CANNOT remember keys forever)
      ms.addData((ts("2024-01-01 11:00:30"), "A", 6.0))
      q.processAllAvailable()
      val byKey = emitted().groupBy(_._1).view.mapValues(_.size).toMap
      assert(byKey == Map("A" -> 2, "B" -> 1, "C" -> 1),
        s"expected A re-emitted after state eviction: ${emitted()}")
    } finally q.stop()
  }
}
