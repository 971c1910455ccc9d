package graft.net

import graft.net.ControlProto._
import graft.proto.Wire
import graft.streaming.RowBuffer

import java.net.Socket
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.util.control.NonFatal

/** Client half of the ingest protocol (reference
  * `client/client.go:49-210`): one streaming session per connection,
  * a reader thread dispatching per-batch acks and server backoff, and
  * a synchronous `writeBatch` that serializes bodies into the
  * varint-framed blob, waits out any backoff deadline first
  * (`client.go:158-170`), and retries `FULL` while failing `TOO_BIG`
  * fast (`client.go:187-196`). Message-type registration trades the
  * full type name for a session-scoped uint32 id
  * (`ingest_service.go:185-204`), shrinking every subsequent batch
  * header.
  *
  * [[sink]] adapts a session to the `(type, bodies) => WriteResult`
  * function [[graft.streaming.Batcher]] delivers through, so the
  * whole client stack — batching, type dictionary, retry/backoff —
  * runs unchanged over the network instead of in-process.
  */
final class IngestClient(host: String, port: Int,
    retrySleepMs: Long = 20, ackTimeoutMs: Long = 10000) {

  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val out = new java.io.BufferedOutputStream(sock.getOutputStream)
  private val in = new java.io.BufferedInputStream(sock.getInputStream)
  out.write('S'); out.flush()

  private val nextId = new AtomicInteger(0)
  private val backoffUntil = new AtomicLong(0L)
  private val pendingAcks = new ConcurrentHashMap[Int, Ack]()
  private val typeIds = new ConcurrentHashMap[String, Int]()
  private val pendingIdentify = new ConcurrentHashMap[String, CountDownLatch]()
  @volatile private var closed = false

  private final class Ack {
    val latch = new CountDownLatch(1)
    @volatile var result: Int = -1
  }

  private val reader = new Thread(() => {
    try {
      var open = true
      while (open && !closed) readFrame(in) match {
        case None => open = false
        case Some(frame) => decodeServerMessage(frame) match {
          case ServerWriteBatchResult(id, result) =>
            val ack = pendingAcks.remove(id)
            if (ack != null) { ack.result = result; ack.latch.countDown() }
          case ServerBackoff(until, _) =>
            // monotonic max, like the reference's atomic store guard
            var done = false
            while (!done) {
              val cur = backoffUntil.get()
              done = until <= cur || backoffUntil.compareAndSet(cur, until)
            }
          case ServerIdentifyType(t, id) =>
            typeIds.put(t, id)
            val l = pendingIdentify.remove(t)
            if (l != null) l.countDown()
        }
      }
    } catch { case NonFatal(_) if closed => () case NonFatal(_) => () }
    finally {
      // fail any waiters so a dropped connection surfaces as an error,
      // not a hang
      pendingAcks.forEach((_, a) => a.latch.countDown())
      pendingIdentify.forEach((_, l) => l.countDown())
    }
  }, "graft-ingest-client-reader")
  reader.setDaemon(true)
  reader.start()

  def inBackoff: Boolean = System.currentTimeMillis() < backoffUntil.get()
  def backoffDeadline: Long = backoffUntil.get()

  private val sendLock = new Object
  private def send(m: ClientMessage): Unit = sendLock.synchronized {
    writeFrame(out, encode(m))
  }

  /** Register `msgType`, returning the session id the server assigned.
    * Subsequent [[writeBatch]] calls for the type use the id form.
    */
  def registerType(msgType: String): Int = {
    if (typeIds.containsKey(msgType)) return typeIds.get(msgType)
    val latch = pendingIdentify.computeIfAbsent(msgType, _ => new CountDownLatch(1))
    send(ClientRegisterType(msgType, Array.emptyByteArray))
    if (!latch.await(ackTimeoutMs, TimeUnit.MILLISECONDS))
      throw new java.io.IOException(s"registerType($msgType) timed out")
    if (!typeIds.containsKey(msgType))
      throw new java.io.IOException(s"registerType($msgType): connection lost")
    typeIds.get(msgType)
  }

  /** Synchronous batch write: returns the server's `BatchResult` after
    * retrying `FULL` up to `retryTimes` times (−1 = forever). Backoff
    * deadlines are honored before EVERY attempt.
    */
  def writeBatch(msgType: String, bodies: Seq[Array[Byte]],
      retryTimes: Int = 3): Int = {
    val data = Wire.joinFrames(bodies)
    var attemptsLeft = retryTimes
    while (true) {
      var until = backoffUntil.get()
      while (System.currentTimeMillis() < until) {
        Thread.sleep(math.max(1, math.min(retrySleepMs,
          until - System.currentTimeMillis())))
        until = backoffUntil.get()
      }
      val id = nextId.incrementAndGet()
      val ack = new Ack
      pendingAcks.put(id, ack)
      val msg =
        if (typeIds.containsKey(msgType))
          ClientWriteBatch(id, None, Some(typeIds.get(msgType)), bodies.size, data)
        else ClientWriteBatch(id, Some(msgType), None, bodies.size, data)
      send(msg)
      if (!ack.latch.await(ackTimeoutMs, TimeUnit.MILLISECONDS)) {
        pendingAcks.remove(id)
        throw new java.io.IOException(s"writeBatch ack timed out after ${ackTimeoutMs}ms")
      }
      ack.result match {
        case r if r == BatchResult.Ok || r == BatchResult.TooBig => return r
        case -1 => throw new java.io.IOException("connection lost awaiting ack")
        case r => // FULL / TOO_MANY_IN_FLIGHT / transient: retry budget
          if (attemptsLeft == 0) return r
          if (attemptsLeft > 0) attemptsLeft -= 1
          if (retrySleepMs > 0) Thread.sleep(retrySleepMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Adapter for [[graft.streaming.Batcher]]'s sink signature: one
    * delivery attempt per call (the Batcher owns retry/backoff).
    */
  def sink: (String, Seq[Array[Byte]]) => RowBuffer.WriteResult =
    (t, msgs) => writeBatch(t, msgs, retryTimes = 0) match {
      case BatchResult.Ok => RowBuffer.Ok
      case BatchResult.TooBig => RowBuffer.TooBig
      case _ => RowBuffer.Full
    }

  def close(): Unit = {
    closed = true
    try sock.close() catch { case NonFatal(_) => }
    reader.join(2000)
  }
}

object IngestClient {
  /** One-shot unary `WriteBatch` (reference `ingest_service.go:109`):
    * returns the status `BatchResult` and, when OK, the response.
    */
  def unaryWriteBatch(host: String, port: Int,
      req: WriteBatchRequest): (Int, Option[WriteBatchResponse]) = {
    val sock = new Socket(host, port)
    try {
      sock.setTcpNoDelay(true)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      out.write('U')
      writeFrame(out, encode(req))
      val status = readFrame(in).map(decodeServerMessage) match {
        case Some(ServerWriteBatchResult(_, r)) => r
        case other => throw new java.io.IOException(s"bad unary status: $other")
      }
      if (status != BatchResult.Ok) (status, None)
      else {
        val resp = readFrame(in).map(decodeWriteBatchResponse).getOrElse(
          throw new java.io.IOException("missing WriteBatchResponse"))
        (status, Some(resp))
      }
    } finally sock.close()
  }
}
