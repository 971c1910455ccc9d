package graft.net

import graft.net.ControlProto._
import graft.proto.{PMessage, ProtoRows, Wire}
import graft.sources.QueueSource
import graft.streaming.RowBuffer

import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.{ConcurrentHashMap, Executors, Semaphore, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean
import scala.util.control.NonFatal

/** The network half of S1/S2: a TCP server speaking the ingest
  * protocol of reference `ingest_service.go` — unary `WriteBatch`
  * (`:109-120`) and the bidirectional streaming session (`:185-234`)
  * with the per-session type-id dictionary, the 12-permit in-flight
  * admission semaphore, per-batch `BatchResult` acks, and server-push
  * backoff. Message schemas and result codes are `bristle.proto`
  * verbatim (see [[ControlProto]]); the transport is varint-framed
  * messages on a plain socket instead of gRPC/HTTP2 — the one
  * documented seam in the zero-egress build.
  *
  * Connection protocol: first byte selects the RPC, `'U'` (unary) or
  * `'S'` (streaming); all subsequent traffic is varint-length-framed
  * protobuf, both directions.
  *  - Unary: one `WriteBatchRequest` in; `ServerWriteBatchResult`
  *    (id 0) as the status out, then — only when OK — a
  *    `WriteBatchResponse` with the acknowledged payload count. The
  *    reference surfaces non-OK as a gRPC error
  *    (`ingest_service.go:113`); raw TCP has no side channel, so the
  *    status message carries the same `BatchResult`.
  *  - Streaming: `ClientMessage` frames in, `ServerMessage` frames
  *    out, interleaved. Writes admitted under `maxInFlight` permits
  *    and executed off the read loop (reference `:199-207`); register
  *    with a non-empty descriptor and update-default close the stream,
  *    mirroring `ErrUnsupported` (`:181,228`).
  *
  * Admitted bodies land in per-message-type [[QueueSource]] queues —
  * the same admission-controlled buffers the Structured Streaming
  * drain (`QueueIngest`/`LandingIngest`) reads — so the full path is
  * socket → queue → micro-batch → transcode → parquet. Server-side
  * synchronous checks mirror the reference's: unknown type →
  * `UNK_MESSAGE`, per-body decode failure → `DECODE_ERR`, buffer
  * policy → `FULL`/`TOO_BIG`. Per-row transcode rejection (P11)
  * happens downstream in the drain's lenient decode path, which is
  * where this engine's columnar transcode runs.
  *
  * Backoff: the reference schema defines server-push backoff
  * (`bristle.proto:96`) and its client honors it
  * (`client/client.go:128-136`) but its server never emits it; here
  * the streaming session pushes `ServerBackoff` when a queue crosses
  * `backoffHighWater` of capacity, deadline `now + backoffMs`,
  * rate-limited to one push per deadline window per connection —
  * completing the protocol with the documented flow-control loop.
  */
final class IngestServer(
    targets: () => Map[String, IngestServer.Target],
    port: Int = 0,
    maxInFlight: Int = 12,
    backoffHighWater: Double = 0.8,
    backoffMs: Long = 250,
    metrics: Metrics = Metrics.default) {

  private val listener = new ServerSocket(port)
  private val running = new AtomicBoolean(false)
  private val conns = ConcurrentHashMap.newKeySet[Socket]()
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-ingest")
    t.setDaemon(true)
    t
  })

  metrics.help("graft_ingest_batches_total",
    "Write batches received, by rpc and result")
  metrics.help("graft_ingest_rows_total", "Rows admitted into queues")
  metrics.help("graft_ingest_backoff_sent_total", "Backoff pushes sent")
  metrics.help("graft_ingest_connections_open", "Open ingest connections")
  metrics.gauge("graft_ingest_connections_open")(conns.size.toDouble)

  def boundPort: Int = listener.getLocalPort

  def start(): this.type = {
    if (!running.compareAndSet(false, true)) return this
    pool.submit[Unit](() => acceptLoop())
    this
  }

  private def acceptLoop(): Unit =
    while (running.get()) {
      try {
        val sock = listener.accept()
        sock.setTcpNoDelay(true)
        conns.add(sock)
        pool.submit[Unit](() => serve(sock))
      } catch {
        case _: SocketException if !running.get() => // closed in stop()
        case NonFatal(e) =>
          if (running.get())
            System.err.println(s"[ingest-server] accept failed: ${e.getMessage}")
      }
    }

  private def serve(sock: Socket): Unit = {
    try {
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      in.read() match {
        case 'U' => serveUnary(in, out)
        case 'S' => serveStreaming(in, out)
        case -1 => // connected and left
        case other =>
          System.err.println(s"[ingest-server] unknown mode byte $other")
      }
    } catch {
      case _: java.io.EOFException | _: SocketException => // client went away
      case NonFatal(e) =>
        System.err.println(s"[ingest-server] connection error: ${e.getMessage}")
    } finally {
      conns.remove(sock)
      try sock.close() catch { case NonFatal(_) => }
    }
  }

  /** `writePayload` (`ingest_service.go:79-107`): resolve, decode each
    * body, admit the batch; first failing stage is the result.
    */
  private def writePayload(p: Payload): Int = {
    val reg = targets()
    reg.get(p.msgType) match {
      case None => BatchResult.UnkMessage
      case Some(t) =>
        try p.bodies.foreach(ProtoRows.decodeValues(t.message, _))
        catch { case _: Wire.MalformedProto => return BatchResult.DecodeErr }
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

  private def serveUnary(in: java.io.InputStream,
      out: java.io.OutputStream): Unit =
    readFrame(in).foreach { frame =>
      val req = decodeWriteBatchRequest(frame)
      // first non-OK payload aborts the request (reference :110-115)
      val status = req.payloads.iterator.map(writePayload)
        .find(_ != BatchResult.Ok).getOrElse(BatchResult.Ok)
      metrics.inc("graft_ingest_batches_total",
        "rpc" -> "unary", "result" -> BatchResult.name(status))
      writeFrame(out, encode(ServerWriteBatchResult(0, status)))
      if (status == BatchResult.Ok)
        writeFrame(out,
          encode(WriteBatchResponse(req.payloads.size.toLong, 0L)))
    }

  private def serveStreaming(in: java.io.InputStream,
      rawOut: java.io.OutputStream): Unit = {
    val sem = new Semaphore(maxInFlight)
    val typeIds = scala.collection.mutable.Map.empty[Int, String]
    var nextTypeId = 0
    val sendLock = new Object
    var lastBackoffUntil = 0L
    def send(m: ServerMessage): Unit = sendLock.synchronized {
      writeFrame(rawOut, encode(m))
    }

    def maybeBackoff(): Unit = {
      val now = System.currentTimeMillis()
      val pressured = targets().collect {
        case (name, t)
            if t.queue.endSeq - t.queue.firstSeq >=
              (t.queue.capacity * backoffHighWater).toLong => name
      }.toSeq.sorted
      if (pressured.nonEmpty) sendLock.synchronized {
        if (now >= lastBackoffUntil) { // one push per deadline window
          lastBackoffUntil = now + backoffMs
          writeFrame(rawOut, encode(ServerBackoff(now + backoffMs, pressured)))
          metrics.inc("graft_ingest_backoff_sent_total")
        }
      }
    }

    def handleBatch(wb: ClientWriteBatch): Unit = {
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
        "rpc" -> "streaming", "result" -> BatchResult.name(result))
      send(ServerWriteBatchResult(wb.id, result))
      maybeBackoff()
    }

    var open = true
    while (open) readFrame(in) match {
      case None => open = false
      case Some(frame) => decodeClientMessage(frame) match {
        case rt: ClientRegisterType =>
          if (rt.descriptor.nonEmpty) {
            // dynamic registration is ErrUnsupported (reference :181)
            open = false
          } else {
            val id = typeIds.synchronized {
              nextTypeId += 1
              typeIds(nextTypeId) = rt.msgType
              nextTypeId
            }
            send(ServerIdentifyType(rt.msgType, id))
          }
        case _: ClientUpdateDefault => open = false // ErrUnsupported (:228)
        case wb: ClientWriteBatch =>
          if (!sem.tryAcquire()) {
            metrics.inc("graft_ingest_batches_total", "rpc" -> "streaming",
              "result" -> BatchResult.name(BatchResult.TooManyInFlightBatches))
            send(ServerWriteBatchResult(wb.id,
              BatchResult.TooManyInFlightBatches))
          } else pool.submit[Unit] { () =>
            try handleBatch(wb) finally sem.release()
          }
      }
    }
    // a closing stream lets in-flight batch writes finish (their acks
    // may or may not reach the departing client, same as gRPC)
    sem.tryAcquire(maxInFlight, 2, TimeUnit.SECONDS)
  }

  def stop(): Unit = {
    if (!running.compareAndSet(true, false)) return
    try listener.close() catch { case NonFatal(_) => }
    conns.forEach(s => try s.close() catch { case NonFatal(_) => })
    pool.shutdown()
    pool.awaitTermination(5, TimeUnit.SECONDS)
    ()
  }
}

object IngestServer {
  /** One registered ingest target: the message schema used for the
    * synchronous decode check and the admission-controlled queue the
    * streaming drain reads.
    */
  final case class Target(message: PMessage, queue: QueueSource.IngestQueue)
}
