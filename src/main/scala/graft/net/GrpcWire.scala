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

  /** Stateful reassembler: DATA-frame bytes in, complete messages
    * out. One per stream direction; not thread-safe (a stream's reads
    * arrive on one event-loop thread).
    */
  final class Framer {
    private val buf = new ByteArrayOutputStream()

    /** Append `bytes` and return every now-complete message. */
    def feed(bytes: Array[Byte]): Seq[Array[Byte]] = {
      buf.write(bytes)
      val all = buf.toByteArray
      var off = 0
      val out = Seq.newBuilder[Array[Byte]]
      var more = true
      while (more && all.length - off >= 5) {
        if (all(off) != 0)
          throw new Unsupported("compressed gRPC message without a codec")
        val len = ((all(off + 1) & 0xff) << 24) | ((all(off + 2) & 0xff) << 16) |
          ((all(off + 3) & 0xff) << 8) | (all(off + 4) & 0xff)
        if (all.length - off - 5 < len) more = false
        else {
          out += java.util.Arrays.copyOfRange(all, off + 5, off + 5 + len)
          off += 5 + len
        }
      }
      if (off > 0) {
        buf.reset()
        buf.write(all, off, all.length - off)
      }
      out.result()
    }

    /** Bytes of a torn trailing message still waiting for more DATA. */
    def pendingBytes: Int = buf.size()
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
