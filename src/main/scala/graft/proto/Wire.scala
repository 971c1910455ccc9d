package graft.proto

import scala.collection.mutable

/** Protobuf wire-format primitives (the published encoding:
  * https://protobuf.dev/programming-guides/encoding/) plus bristle's
  * varint-length frame format (reference bristle.proto:35-50 — a framed
  * batch is `len(msg) msg len(msg) msg …`, consumed with a
  * ConsumeBytes loop at ingest_service.go:152-177).
  */
object Wire {

  /** Cursor-based reader over one byte array. Throws
    * [[MalformedProto]] on truncated/invalid input — callers map that
    * to the reference's whole-batch TRANSCODE_ERR rejection.
    */
  final case class MalformedProto(msg: String) extends RuntimeException(msg)

  final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    def hasNext: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        if (pos >= end) throw MalformedProto("truncated varint")
        val b = buf(pos)
        pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw MalformedProto("varint too long")
    }

    def readFixed32(): Int = {
      if (pos + 4 > end) throw MalformedProto("truncated fixed32")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }

    def readFixed64(): Long = {
      if (pos + 8 > end) throw MalformedProto("truncated fixed64")
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (buf(pos + i) & 0xffL); i -= 1 }
      pos += 8
      v
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint()
      if (len < 0 || pos + len > end) throw MalformedProto("truncated bytes")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len.toInt)
      pos += len.toInt
      out
    }

    /** Skip a field of the given wire type (unknown-field tolerance,
      * required by the proto3 spec).
      */
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => if (pos + 8 > end) throw MalformedProto("truncated") else pos += 8
      case 2 => readBytes()
      case 5 => if (pos + 4 > end) throw MalformedProto("truncated") else pos += 4
      case w => throw MalformedProto(s"unsupported wire type $w")
    }
  }

  final class Writer {
    private val out = new mutable.ArrayBuilder.ofByte

    def writeVarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out += ((x & 0x7f) | 0x80).toByte
        x >>>= 7
      }
      out += (x & 0x7f).toByte
    }

    def writeTag(fieldNumber: Int, wireType: Int): Unit =
      writeVarint((fieldNumber.toLong << 3) | wireType)

    def writeFixed32(v: Int): Unit = {
      out += v.toByte
      out += (v >>> 8).toByte
      out += (v >>> 16).toByte
      out += (v >>> 24).toByte
    }

    def writeFixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out += (v >>> (8 * i)).toByte; i += 1 }
    }

    def writeBytes(b: Array[Byte]): Unit = {
      writeVarint(b.length.toLong)
      out ++= b
    }

    def toBytes: Array[Byte] = out.result()
  }

  def zigzagEncode32(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
  def zigzagEncode64(v: Long): Long = (v << 1) ^ (v >> 63)
  def zigzagDecode32(v: Long): Int = (((v >>> 1) ^ -(v & 1)).toInt)
  def zigzagDecode64(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Split a varint-length-prefixed frame blob into messages (S3). */
  def splitFrames(data: Array[Byte]): Seq[Array[Byte]] = {
    val r = new Reader(data)
    val out = mutable.ArrayBuffer.empty[Array[Byte]]
    while (r.hasNext) out += r.readBytes()
    out.toSeq
  }

  /** Concatenate messages into one varint-length-prefixed frame blob. */
  def joinFrames(messages: Iterable[Array[Byte]]): Array[Byte] = {
    val w = new Writer
    messages.foreach(w.writeBytes)
    w.toBytes
  }
}
