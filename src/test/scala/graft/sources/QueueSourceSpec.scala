package graft.sources

import graft.SparkSpec
import graft.bind.SchemaBinder
import graft.proto.ProtoRows
import graft.queries.TranscodeE2E
import graft.streaming.{QueueIngest, RowBuffer}
import org.apache.spark.sql.functions._

/** The custom MicroBatchStream source: admission inside the source,
  * monotone offsets under load shedding, incremental micro-batches,
  * and end-to-end equivalence with the batch transcode path.
  */
class QueueSourceSpec extends SparkSpec {

  private def msg(i: Int) = Array[Byte](i.toByte)

  test("drop-oldest sheds unread head and advances the readable start") {
    val q = new QueueSource.IngestQueue(4, RowBuffer.DropOldest)
    assert(q.writeBatch(Seq(msg(1), msg(2), msg(3))) == RowBuffer.Ok)
    assert(q.writeBatch(Seq(msg(4), msg(5), msg(6))) == RowBuffer.Ok)
    // 1, 2 evicted: readable range is [2, 6) = values 3, 4, 5, 6
    assert(q.firstSeq == 2 && q.endSeq == 6)
    assert(q.slice(0, 10).map(_._2(0)).toSeq == Seq(3, 4, 5, 6))
    // a planned range that predates retention clamps, never throws
    assert(q.slice(0, 2).isEmpty)
  }

  test("block policy rejects whole batch; commit truncates retention") {
    val q = new QueueSource.IngestQueue(4, RowBuffer.Block)
    assert(q.writeBatch(Seq(msg(1), msg(2), msg(3))) == RowBuffer.Ok)
    assert(q.writeBatch(Seq(msg(4), msg(5))) == RowBuffer.Full)
    q.truncate(2)
    assert(q.firstSeq == 2 && q.slice(0, 10).map(_._2(0)).toSeq == Seq(3))
  }

  test("streams incremental micro-batches with monotone offsets") {
    import spark.implicits._
    val q = QueueSource.create("spec-incr", capacity = 100,
      onFull = RowBuffer.Block)
    q.writeBatch(Seq(msg(1), msg(2)))
    val sq = QueueSource.readStream(spark, "spec-incr")
      .writeStream.format("memory").queryName("qincr").outputMode("append")
      .start()
    try {
      sq.processAllAvailable()
      assert(spark.table("qincr").count() == 2)
      q.writeBatch(Seq(msg(3)))
      sq.processAllAvailable()
      val rows = spark.table("qincr").select($"seq", $"value").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)(0)).sortBy(_._1)
      assert(rows.toSeq == Seq(0L -> 1.toByte, 1L -> 2.toByte, 2L -> 3.toByte))
    } finally sq.stop()
  }

  test("queue-source ingest lands exactly what batch transcode produces") {
    val binding = SchemaBinder.bind(TranscodeE2E.message, TranscodeE2E.table)
    val batches = TranscodeE2E.fixtures.grouped(8)
      .map(_.map(f => ProtoRows.encodeValues(TranscodeE2E.message, f.protoValues)))
      .toSeq
    val streamed = QueueIngest.runOnce(spark, TranscodeE2E.message, binding,
      batches, capacity = 1000, onFull = RowBuffer.Block, name = "spec-e2e")

    import spark.implicits._
    val batch = binding.transcode(ProtoRows.decodeFramed(
      spark.createDataset(TranscodeE2E.frames), TranscodeE2E.message))
    def flat(df: org.apache.spark.sql.DataFrame) = df.select(
      col("name"), col("type"), col("timestamp"), col("value"),
      array_join(col("`tags.key`"), ",").as("tk"),
      array_join(col("`tags.value`"), ",").as("tv"),
      array_join(col("labels"), ",").as("ls"))
    assert(flat(streamed).exceptAll(flat(batch)).isEmpty)
    assert(flat(batch).exceptAll(flat(streamed)).isEmpty)
  }

  test("drop-oldest eviction racing a mid-flight drain: no dup, no loss " +
      "of delivered rows, exact shed accounting") {
    // VERDICT r9 #7: the policy evicts WHILE a drain is in flight.
    // Writer thread floods a small drop-oldest queue; consumer thread
    // runs the MicroBatchStream protocol (latestOffset → slice →
    // advance cursor → commit/truncate) concurrently. Every method is
    // individually synchronized, so the interleavings under test are
    // the cross-method races: eviction between latestOffset and
    // slice, eviction during cursor advance, truncate vs append.
    // Payload = the row's global index, so integrity is checkable per
    // row: seq i must ALWAYS carry payload i, however `first` moved.
    val total = 5000
    val q = new QueueSource.IngestQueue(64, RowBuffer.DropOldest)
    def pay(i: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8); b.putLong(i.toLong); b.array()
    }
    val writer = new Thread(() => {
      var i = 0
      while (i < total) {
        val n = math.min(7, total - i)
        assert(q.writeBatch((i until i + n).map(pay)) == RowBuffer.Ok)
        i += n
        if (i % 70 == 0) Thread.`yield`()
      }
    })
    val delivered = scala.collection.mutable.ArrayBuffer.empty[Long]
    var shed = 0L
    writer.start()
    var cursor = 0L
    while (writer.isAlive || cursor < q.endSeq) {
      val target = q.endSeq // latestOffset
      if (target > cursor) {
        val rows = q.slice(cursor, target) // plan: rows copied out
        // integrity under concurrent eviction: seq i carries payload i
        rows.foreach { case (seq, v) =>
          assert(java.nio.ByteBuffer.wrap(v).getLong == seq,
            s"seq $seq carried someone else's payload")
        }
        delivered ++= rows.map(_._1)
        shed += (target - cursor) - rows.size
        cursor = target // Spark advances to `end` even when clamped
        q.truncate(cursor) // commit barrier racing the writer
      }
      Thread.`yield`()
    }
    writer.join()
    // no dup / no reorder across every batch boundary
    assert(delivered.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      "a delivered seq repeated or went backwards")
    // exact accounting: every written row is delivered XOR shed
    assert(delivered.size + shed == total.toLong,
      s"${delivered.size} delivered + $shed shed != $total written")
    // the race must actually have shed something through this queue
    // (64-cap vs 5000 rows) — otherwise the test degenerated
    assert(shed > 0 && delivered.nonEmpty)
  }

  test("rows planned into an InputPartition survive total eviction") {
    // The drain's other half: once slice() hands rows to the planner
    // they ride INSIDE the serialized partition, so a task (re)read
    // works even after the queue evicted every one of those rows —
    // acked delivery can't be yanked back by admission.
    val q = new QueueSource.IngestQueue(8, RowBuffer.DropOldest)
    assert(q.writeBatch((0 until 8).map(msg)) == RowBuffer.Ok)
    val planned = QueueInputPartition(q.slice(0, 8).toArray)
    // evict EVERYTHING the partition references
    assert(q.writeBatch((8 until 16).map(msg)) == RowBuffer.Ok)
    assert(q.firstSeq == 8 && q.slice(0, 8).isEmpty)
    val reader = QueueReaderFactory.createReader(planned)
    val got = Iterator.continually(reader)
      .takeWhile(_.next()).map(_.get()).map(r =>
        r.getLong(0) -> r.getBinary(1)(0)).toSeq
    assert(got == (0 until 8).map(i => i.toLong -> i.toByte))
  }
}
