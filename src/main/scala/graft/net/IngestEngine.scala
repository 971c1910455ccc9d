package graft.net

import graft.net.ControlProto._
import graft.proto.{ProtoRows, Wire}
import graft.streaming.RowBuffer

import java.util.concurrent.{ExecutorService, Semaphore, TimeUnit}

/** Transport-agnostic core of the ingest service (reference
  * `ingest_service.go`): payload admission (`writePayload`, `:79-107`),
  * the unary first-non-OK fold (`:109-120`), and the streaming session
  * state machine (`:185-234`) — per-session type-id dictionary,
  * `maxInFlight`-permit admission, per-batch `BatchResult` acks, and
  * server-push backoff.
  *
  * Both transports drive this one engine, so their semantics cannot
  * drift: [[IngestServer]] (varint frames on a plain socket) and
  * [[GrpcIngestServer]] (real gRPC over netty HTTP/2 — the transport
  * the reference itself uses). A transport owns only bytes-on-the-wire;
  * every admission decision, result code, and state transition lives
  * here.
  */
final class IngestEngine(
    targets: () => Map[String, IngestServer.Target],
    maxInFlight: Int,
    backoffHighWater: Double,
    backoffMs: Long,
    metrics: Metrics,
    pool: ExecutorService) {

  /** Run `r` on the engine's worker pool (transports use this to get
    * blocking work — e.g. a close-time drain — off their IO threads).
    */
  def poolExecute(r: Runnable): Unit = { pool.submit(r); () }

  /** `writePayload` (`ingest_service.go:79-107`): resolve, decode each
    * body, admit the batch; first failing stage is the result.
    */
  def writePayload(p: Payload): Int = {
    val reg = targets()
    reg.get(p.msgType) match {
      case None => BatchResult.UnkMessage
      case Some(t) =>
        // one pooled scratch checkout per payload, reused across all
        // its bodies — the reference's instance-pool discipline
        // (ingest_service.go:87-96); get() blocking IS the decode
        // memory bound (D12)
        val buf = t.scratch.get()
        try p.bodies.foreach(ProtoRows.decodeValuesInto(t.message, _, buf))
        catch { case _: Wire.MalformedProto => return BatchResult.DecodeErr }
        finally t.scratch.release(buf)
        t.queue.writeBatch(p.bodies) match {
          case RowBuffer.Ok =>
            metrics.add("graft_ingest_rows_total", p.bodies.size.toLong,
              "type" -> p.msgType)
            BatchResult.Ok
          case RowBuffer.Full => BatchResult.Full
          case RowBuffer.TooBig => BatchResult.TooBig
          case _ => BatchResult.TranscodeErr
        }
    }
  }

  /** Unary `WriteBatch` (`ingest_service.go:109-120`): the first
    * non-OK payload aborts the request; `rpc` labels the metric.
    */
  def unaryWriteBatch(req: WriteBatchRequest, rpc: String): Int = {
    val status = req.payloads.iterator.map(writePayload)
      .find(_ != BatchResult.Ok).getOrElse(BatchResult.Ok)
    metrics.inc("graft_ingest_batches_total",
      "rpc" -> rpc, "result" -> BatchResult.name(status))
    status
  }

  /** One streaming-RPC session. The transport feeds decoded
    * [[ClientMessage]]s to [[handle]] and supplies `send`, which must
    * be safe to call from any thread (batch acks complete on pool
    * threads); `handle` itself is driven from the transport's single
    * read loop. `handle` returning false means the session ends with
    * the reference's `ErrUnsupported` condition (register with a
    * descriptor, update-default). [[drain]] lets in-flight writes
    * finish on close.
    */
  final class Session(send: ServerMessage => Unit, rpc: String = "streaming") {
    private val sem = new Semaphore(maxInFlight)
    private val typeIds = scala.collection.mutable.Map.empty[Int, String]
    private var nextTypeId = 0
    @volatile private var lastBackoffUntil = 0L

    private def maybeBackoff(): Unit = {
      val now = System.currentTimeMillis()
      val pressured = targets().collect {
        case (name, t)
            if t.queue.endSeq - t.queue.firstSeq >=
              (t.queue.capacity * backoffHighWater).toLong => name
      }.toSeq.sorted
      if (pressured.nonEmpty) synchronized {
        if (now >= lastBackoffUntil) { // one push per deadline window
          lastBackoffUntil = now + backoffMs
          send(ServerBackoff(now + backoffMs, pressured))
          metrics.inc("graft_ingest_backoff_sent_total")
        }
      }
    }

    private def handleBatch(wb: ClientWriteBatch): Unit = {
      val resolved = wb.typeName.orElse(wb.typeId.flatMap { id =>
        typeIds.synchronized(typeIds.get(id))
      })
      val result = resolved match {
        case None => BatchResult.UnkMessage
        case Some(name) =>
          // data is a varint-framed body blob (the ConsumeBytes loop,
          // reference :152-177); a torn frame is DECODE_ERR for the
          // whole batch, same as an unmarshal failure
          try writePayload(Payload(name, Wire.splitFrames(wb.data)))
          catch { case _: Wire.MalformedProto => BatchResult.DecodeErr }
      }
      metrics.inc("graft_ingest_batches_total",
        "rpc" -> rpc, "result" -> BatchResult.name(result))
      send(ServerWriteBatchResult(wb.id, result))
      maybeBackoff()
    }

    /** Returns false when the message closes the stream. */
    def handle(msg: ClientMessage): Boolean = msg match {
      case rt: ClientRegisterType =>
        if (rt.descriptor.nonEmpty) {
          // dynamic registration is ErrUnsupported (reference :181)
          false
        } else {
          val id = typeIds.synchronized {
            nextTypeId += 1
            typeIds(nextTypeId) = rt.msgType
            nextTypeId
          }
          send(ServerIdentifyType(rt.msgType, id))
          true
        }
      case _: ClientUpdateDefault => false // ErrUnsupported (:228)
      case wb: ClientWriteBatch =>
        if (!sem.tryAcquire()) {
          metrics.inc("graft_ingest_batches_total", "rpc" -> rpc,
            "result" -> BatchResult.name(BatchResult.TooManyInFlightBatches))
          send(ServerWriteBatchResult(wb.id,
            BatchResult.TooManyInFlightBatches))
        } else pool.submit[Unit] { () =>
          try handleBatch(wb) finally sem.release()
        }
        true
    }

    /** A closing stream lets in-flight batch writes finish (their acks
      * may or may not reach the departing client, same as gRPC).
      */
    def drain(): Unit = {
      sem.tryAcquire(maxInFlight, 2, TimeUnit.SECONDS)
      ()
    }
  }
}
