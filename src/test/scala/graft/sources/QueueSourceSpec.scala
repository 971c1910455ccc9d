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
}
