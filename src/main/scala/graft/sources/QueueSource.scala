package graft.sources

import graft.streaming.RowBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** S1/S2 engine side as a REAL custom DataSourceV2 MicroBatchStream
  * (SURVEY §4's "only genuinely stateful custom component"): an
  * in-memory, admission-controlled message queue the gRPC surface
  * would feed. The wire protocol stays out of scope (no gRPC in the
  * zero-egress build — the landing-dir shim covers durability); what
  * this source makes real is the engine contract:
  *
  *  - bounded buffer with bristle's drop-oldest / drop-newest(tail) /
  *    block admission INSIDE the source (D1/D7 live at the source
  *    boundary, before durability — reference memory_row_buffer.go:47-89);
  *  - monotone offsets (absolute sequence numbers) with retention:
  *    load-shedding advances the readable start, commit() truncates
  *    below the committed offset;
  *  - micro-batch planning ships each batch's rows inside the
  *    serialized InputPartitions (the MemoryStream pattern), so
  *    executors never reach back into driver state.
  */
object QueueSource {

  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("value", BinaryType, nullable = false)))

  /** Admission-controlled, offset-addressed message log. */
  final class IngestQueue(val capacity: Int, val onFull: RowBuffer.OnFull) {
    private val log = scala.collection.mutable.ArrayDeque.empty[Array[Byte]]
    private var first: Long = 0L // seq of log.head

    def firstSeq: Long = synchronized(first)
    def endSeq: Long = synchronized(first + log.size)

    /** RowBuffer-policy admission (same observable semantics,
      * StreamingSpec quirks included); drop-oldest eviction advances
      * the readable start — shed rows are gone before durability,
      * exactly like the reference.
      */
    def writeBatch(batch: Seq[Array[Byte]]): RowBuffer.WriteResult = synchronized {
      val bs = batch.size
      if (bs > capacity) return RowBuffer.TooBig
      val spare = capacity - log.size
      var toAppend = batch
      if (spare < bs) onFull match {
        case RowBuffer.DropOldest =>
          val evict = bs - spare
          log.remove(0, evict)
          first += evict
        case RowBuffer.DropNewest =>
          toAppend = batch.drop(bs - spare) // head-drop quirk preserved
        case RowBuffer.Block => return RowBuffer.Full
      }
      log.appendAll(toAppend)
      RowBuffer.Ok
    }

    /** Rows in [start, end), clamped to what retention still holds. */
    def slice(start: Long, end: Long): Seq[(Long, Array[Byte])] = synchronized {
      val s = math.max(start, first)
      val e = math.min(end, first + log.size)
      (s until e).map(i => i -> log((i - first).toInt))
    }

    /** Commit barrier: data below `upTo` is processed and released. */
    def truncate(upTo: Long): Unit = synchronized {
      val k = math.min(math.max(upTo - first, 0L), log.size.toLong).toInt
      log.remove(0, k)
      first += k
    }
  }

  private val queues =
    scala.collection.concurrent.TrieMap.empty[String, IngestQueue]

  /** Create (or replace) a queue with explicit admission settings —
    * the producer entry point. A lazy `queue(name)` accessor would
    * silently keep stale settings if a consumer touched the name
    * first.
    */
  def create(name: String, capacity: Int,
      onFull: RowBuffer.OnFull): IngestQueue = {
    val q = new IngestQueue(capacity, onFull)
    queues.put(name, q)
    q
  }

  /** Accessor for stream plumbing: default settings only if nothing
    * created the queue yet.
    */
  def queue(name: String): IngestQueue =
    queues.getOrElseUpdate(name,
      new IngestQueue(1 << 20, RowBuffer.Block))

  def drop(name: String): Unit = { queues.remove(name); () }

  /** readStream entry point. */
  def readStream(spark: org.apache.spark.sql.SparkSession,
      name: String): org.apache.spark.sql.DataFrame =
    spark.readStream.format(classOf[QueueSourceProvider].getName)
      .option("queue", name).load()
}

class QueueSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QueueSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new QueueTable(properties.get("queue"))
}

class QueueTable(queueName: String) extends Table with SupportsRead {
  require(queueName != null && queueName.nonEmpty, "option 'queue' is required")
  override def name(): String = s"graft-queue($queueName)"
  override def schema(): StructType = QueueSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new QueueScan(queueName)
}

class QueueScan(queueName: String) extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = QueueSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new QueueMicroBatchStream(queueName)
}

case class QueueOffset(seq: Long) extends Offset {
  override def json: String = seq.toString
}

class QueueMicroBatchStream(queueName: String) extends MicroBatchStream {
  private def q = QueueSource.queue(queueName)

  override def initialOffset(): Offset = QueueOffset(q.firstSeq)
  override def latestOffset(): Offset = QueueOffset(q.endSeq)
  override def deserializeOffset(json: String): Offset =
    QueueOffset(json.trim.toLong)
  override def commit(end: Offset): Unit =
    q.truncate(end.asInstanceOf[QueueOffset].seq)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val rows = q.slice(start.asInstanceOf[QueueOffset].seq,
      end.asInstanceOf[QueueOffset].seq)
    if (rows.isEmpty) Array.empty
    else {
      // a few serialized slices so the batch reads in parallel
      val per = math.max(1, (rows.size + 3) / 4)
      rows.grouped(per).map(g => QueueInputPartition(g.toArray)).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    QueueReaderFactory
  override def stop(): Unit = ()
}

/** Rows ride inside the partition (seq + bytes are Serializable), so
  * the read side has no dependency on driver-JVM state.
  */
case class QueueInputPartition(rows: Array[(Long, Array[Byte])])
  extends InputPartition

object QueueReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[QueueInputPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](rows(i)._1, rows(i)._2))
      override def close(): Unit = ()
    }
}
