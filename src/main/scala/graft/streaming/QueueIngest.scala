package graft.streaming

import graft.bind.Binding
import graft.proto.{PMessage, ProtoRows}
import graft.sources.QueueSource
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The QueueSource twin of [[LandingIngest.runOnce]]: admit message
  * batches through the source's own admission control, stream them out
  * of the custom MicroBatchStream, transcode, and land with the
  * idempotent batch sink — S1/S2's engine contract end-to-end through
  * a real DataSourceV2 source instead of the file shim.
  */
object QueueIngest {

  def runOnce(spark: SparkSession, message: PMessage, binding: Binding,
      batches: Seq[Seq[Array[Byte]]], capacity: Int,
      onFull: RowBuffer.OnFull, numWriters: Int = 2,
      name: String = "queue-ingest"): DataFrame = {
    val q = QueueSource.create(name, capacity, onFull)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        q.writeBatch(b) match {
          case RowBuffer.Ok => ()
          case rejected =>
            // legitimate shedding under DropOldest/DropNewest; under
            // Block it means the caller lost this batch — say so
            System.err.println(s"[queue-ingest] batch $i: $rejected")
        }
      }
      drain(spark, name, message, binding, numWriters)
    } finally {
      // the registry is process-global: without this, each run leaks
      // its queue object (and any retained uncommitted rows)
      QueueSource.drop(name)
    }
  }

  /** Drain an EXISTING queue (filled by any producer — in-process
    * writes or the [[graft.net.IngestServer]] socket path) through the
    * MicroBatchStream → decode → transcode → idempotent-sink pipeline,
    * returning the landed frame. Does not own the queue's lifecycle:
    * the caller created it and decides when to drop it.
    */
  def drain(spark: SparkSession, name: String, message: PMessage,
      binding: Binding, numWriters: Int = 2): DataFrame = {
    val base = Files.createTempDirectory("graft-queue-ingest-")
    val outDir = base.resolve("out").toString
    val bodies = QueueSource.readStream(spark, name)
      .select(col("value")).as[Array[Byte]](Encoders.BINARY)
    val transcoded = binding.transcode(ProtoRows.decode(bodies, message))
    val sq = transcoded.writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        LandingIngest.sinkBatch(df, batchId, outDir, numWriters)
      }
      .start()
    sq.processAllAvailable()
    sq.stop()
    sq.awaitTermination()
    // all-shed/all-rejected runs land nothing: empty frame, not a crash
    if (!Files.exists(base.resolve("out")))
      binding.transcode(ProtoRows.decode(
        spark.emptyDataset(Encoders.BINARY), message))
    else spark.read.parquet(outDir).drop("p_batch")
  }
}
