package graft.net

import java.io.ByteArrayOutputStream

/** The gRPC wire protocol layer (what `google.golang.org/grpc` gives
  * the reference for free, re-expressed over netty's HTTP/2 codec):
  * length-prefixed message framing, status codes, and the
  * `grpc-message` percent-encoding — per the published gRPC
  * PROTOCOL-HTTP2 spec.
  *
  * Each message on a gRPC stream is `[1-byte compressed flag][4-byte
  * big-endian length][payload]` inside HTTP/2 DATA frames, with no
  * alignment between message and frame boundaries — [[Framer]]
  * reassembles messages across arbitrary DATA splits. This build
  * never compresses (flag always 0) and rejects compressed inbound
  * messages with UNIMPLEMENTED, matching a server with no registered
  * compressor.
  */
object GrpcWire {

  /** gRPC status codes used on this surface. */
  val StatusOk = 0
  /** What grpc-go maps a plain `error` return to — the reference's
    * non-OK unary path (`ingest_service.go:113`).
    */
  val StatusUnknown = 2
  val StatusUnimplemented = 12
  val StatusInternal = 13

  /** `WriteBatch error code %v` (reference `ingest_service.go:113`):
    * the exact message a stock bristle client sees on a rejected
    * unary batch, carrying the `BatchResult` enum name.
    */
  def writeBatchErrorMessage(result: Int): String =
    s"WriteBatch error code ${ControlProto.BatchResult.name(result)}"

  /** Parse the `BatchResult` back out of the reference-format error
    * message; -1 when the message is not that shape.
    */
  def parseWriteBatchError(message: String): Int = {
    val prefix = "WriteBatch error code "
    if (!message.startsWith(prefix)) -1
    else {
      val name = message.substring(prefix.length)
      (0 to 6).find(ControlProto.BatchResult.name(_) == name).getOrElse(-1)
    }
  }

  /** The 5-byte message header alone (uncompressed flag) — for the
    * zero-copy send path: netty writers compose `header ++ payload`
    * as a wrapped composite buffer, so the payload crosses into the
    * HTTP/2 codec without the full-payload copy [[frame]] pays. On
    * the per-message hot path that copy was measurable against the
    * raw socket at 1 MiB batches.
    */
  def header(len: Int): Array[Byte] = {
    val h = new Array[Byte](5)
    h(0) = 0 // uncompressed
    h(1) = (len >>> 24).toByte
    h(2) = (len >>> 16).toByte
    h(3) = (len >>> 8).toByte
    h(4) = len.toByte
    h
  }

  /** The zero-copy frame composition every netty send path uses (the
    * client message, server ack, and unary response writes): the
    * payload array rides into the HTTP/2 codec WRAPPED as a composite
    * component — the only per-message allocations are the 5-byte
    * header and the wrapper nodes, never a payload-sized copy.
    * GrpcZeroCopySpec pins this (mutating the source array after
    * composition is visible through the buffer — proof the bytes were
    * wrapped, not copied).
    */
  def composeFrame(payload: Array[Byte]): io.netty.buffer.ByteBuf =
    io.netty.buffer.Unpooled.wrappedBuffer(header(payload.length), payload)

  /** One message → its length-prefixed gRPC frame. */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + payload.length)
    out(0) = 0 // uncompressed
    out(1) = (payload.length >>> 24).toByte
    out(2) = (payload.length >>> 16).toByte
    out(3) = (payload.length >>> 8).toByte
    out(4) = payload.length.toByte
    System.arraycopy(payload, 0, out, 5, payload.length)
    out
  }

  /** Raised on a compressed-flag byte this server can't handle. */
  final class Unsupported(msg: String) extends RuntimeException(msg)

  /** Raised when a compressed message inflates past the receive cap —
    * a gzip bomb must fail BEFORE allocating past
    * max_receive_message_size, exactly where grpc-go applies the
    * limit (to the decompressed size).
    */
  final class TooLarge(msg: String) extends RuntimeException(msg)

  /** Bounded gunzip for inbound message payloads. */
  def gunzip(bytes: Array[Byte], cap: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream(math.min(bytes.length * 4, cap))
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) {
      out.write(buf, 0, n)
      if (out.size() > cap)
        throw new TooLarge(s"decompressed message larger than $cap")
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** One message → its gzip-compressed gRPC frame (flag byte 1) — the
    * client half for tests and gzip-enabled producers.
    */
  def frameGzip(payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(payload.length / 2 + 32)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(payload); gz.close()
    val z = bos.toByteArray
    val out = new Array[Byte](5 + z.length)
    out(0) = 1 // compressed
    out(1) = (z.length >>> 24).toByte
    out(2) = (z.length >>> 16).toByte
    out(3) = (z.length >>> 8).toByte
    out(4) = z.length.toByte
    System.arraycopy(z, 0, out, 5, z.length)
    out
  }

  /** Stateful reassembler: DATA-frame bytes in, complete messages
    * out. One per stream direction; not thread-safe (a stream's reads
    * arrive on one event-loop thread).
    *
    * Fed chunks are QUEUED, not re-buffered: the old
    * ByteArrayOutputStream form copied the entire pending buffer on
    * every feed (`toByteArray`), which made reassembling a message
    * split over n DATA frames O(size·n) — the measured 2× transport
    * tax vs the raw socket at 1 MiB batches. Here every payload byte
    * is copied exactly once, straight from its arrival chunk into the
    * message array, when the message completes.
    */
  final class Framer {
    private val chunks = new java.util.ArrayDeque[Array[Byte]]()
    private var headOff = 0 // consumed bytes of the head chunk
    private var pending = 0

    /** Inbound message codec, installed from the stream's
      * `grpc-encoding` header (e.g. [[gunzip]] for gzip). While unset,
      * a compressed-flag message is [[Unsupported]] — a server with no
      * registered compressor, the reference's own posture.
      */
    @volatile var codec: Array[Byte] => Array[Byte] = null

    /** Copy (dst != null) or skip (dst == null) the next `n` queued
      * bytes.
      */
    private def consume(dst: Array[Byte], n: Int): Unit = {
      var copied = 0
      while (copied < n) {
        val head = chunks.peekFirst()
        val take = math.min(head.length - headOff, n - copied)
        if (dst != null) System.arraycopy(head, headOff, dst, copied, take)
        copied += take
        headOff += take
        if (headOff == head.length) { chunks.pollFirst(); headOff = 0 }
      }
      pending -= n
    }

    /** Read the 5-byte message header across chunk boundaries without
      * consuming it (the message may still be torn).
      */
    private def peekHeader(hdr: Array[Byte]): Unit = {
      var n = 0
      var off = headOff
      val it = chunks.iterator()
      while (n < 5) {
        val c = it.next()
        while (off < c.length && n < 5) { hdr(n) = c(off); n += 1; off += 1 }
        off = 0
      }
    }

    /** Append `bytes` and return every now-complete message. */
    def feed(bytes: Array[Byte]): Seq[Array[Byte]] = {
      if (bytes.length > 0) { chunks.addLast(bytes); pending += bytes.length }
      val out = Seq.newBuilder[Array[Byte]]
      val hdr = new Array[Byte](5)
      var more = true
      while (more && pending >= 5) {
        peekHeader(hdr)
        val flag = hdr(0)
        if (flag != 0 && (flag != 1 || codec == null))
          throw new Unsupported("compressed gRPC message without a codec")
        val len = ((hdr(1) & 0xff) << 24) | ((hdr(2) & 0xff) << 16) |
          ((hdr(3) & 0xff) << 8) | (hdr(4) & 0xff)
        if (len < 0)
          throw new Unsupported(s"invalid gRPC frame length $len")
        if (pending - 5 < len) more = false
        else {
          consume(null, 5)
          val msg = new Array[Byte](len)
          consume(msg, len)
          out += (if (flag == 1) codec(msg) else msg)
        }
      }
      out.result()
    }

    /** Bytes of a torn trailing message still waiting for more DATA. */
    def pendingBytes: Int = pending
  }

  /** `grpc-message` percent-encoding (spec: percent-encode bytes
    * outside 0x20..0x7E plus `%` itself).
    */
  def encodeMessage(msg: String): String = {
    val bytes = msg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length)
    bytes.foreach { b =>
      val c = b & 0xff
      if (c >= 0x20 && c <= 0x7e && c != '%') sb.append(c.toChar)
      else sb.append(f"%%$c%02X")
    }
    sb.toString
  }

  def decodeMessage(enc: String): String = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < enc.length) {
      val c = enc.charAt(i)
      if (c == '%' && i + 2 < enc.length) {
        out.write(Integer.parseInt(enc.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toInt); i += 1 }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}
