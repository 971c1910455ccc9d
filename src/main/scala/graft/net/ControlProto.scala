package graft.net

import graft.proto.Wire

import java.io.{EOFException, InputStream, OutputStream}

/** Hand-rolled protobuf codec for the ingest control messages
  * (reference `bristle.proto:15-115`): `Payload`, `WriteBatchRequest/
  * Response`, and the streaming client/server envelope with its
  * write-batch / backoff / type-registration variants. Field numbers
  * and wire types match the reference schema exactly, so the bytes a
  * bristle client produces for these messages decode here unchanged.
  *
  * The transport is the one deliberate seam: the reference carries
  * these messages over gRPC/HTTP2; this build (zero-egress, no gRPC
  * dependency) carries the SAME messages varint-length-framed over a
  * plain TCP stream — the framing already used for message bodies
  * (`Wire.splitFrames`). Everything above the socket — schemas,
  * result codes, admission, type-id dictionary, backoff — is the
  * reference protocol.
  */
object ControlProto {

  /** `Payload` (bristle.proto:15): one message type + encoded bodies. */
  final case class Payload(msgType: String, bodies: Seq[Array[Byte]])

  /** `WriteBatchRequest` (bristle.proto:22). */
  final case class WriteBatchRequest(key: String, payloads: Seq[Payload])

  /** `WriteBatchResponse` (bristle.proto:27). */
  final case class WriteBatchResponse(acknowledged: Long, dropped: Long)

  /** `BatchResult` (bristle.proto:52). Values are the wire enum. */
  object BatchResult {
    val Ok = 0
    val TooBig = 1
    val Full = 2
    val UnkMessage = 3
    val DecodeErr = 4
    val TranscodeErr = 5
    val TooManyInFlightBatches = 6
    def name(v: Int): String = v match {
      case 0 => "OK"
      case 1 => "TOO_BIG"
      case 2 => "FULL"
      case 3 => "UNK_MESSAGE"
      case 4 => "DECODE_ERR"
      case 5 => "TRANSCODE_ERR"
      case 6 => "TOO_MANY_IN_FLIGHT_BATCHES"
      case other => s"UNKNOWN($other)"
    }
  }

  /** Client → server streaming envelope (bristle.proto:100). */
  sealed trait ClientMessage
  /** `StreamingClientMessageWriteBatch` (bristle.proto:35): exactly one
    * of `typeName`/`typeId` is set (proto3 oneof).
    */
  final case class ClientWriteBatch(id: Int, typeName: Option[String],
      typeId: Option[Int], length: Int, data: Array[Byte]) extends ClientMessage
  /** `StreamingClientMessageRegisterMessageType` (bristle.proto:79). */
  final case class ClientRegisterType(msgType: String,
      descriptor: Array[Byte]) extends ClientMessage
  /** `StreamingClientMessageUpdateDefault` (bristle.proto:74). */
  final case class ClientUpdateDefault(msgType: String,
      default: Array[Byte]) extends ClientMessage

  /** Server → client streaming envelope (bristle.proto:108). */
  sealed trait ServerMessage
  /** `StreamingServerMessageWriteBatchResult` (bristle.proto:70). */
  final case class ServerWriteBatchResult(id: Int, result: Int) extends ServerMessage
  /** `StreamingServerMessageBackoff` (bristle.proto:96): wall-clock
    * epoch-millis deadline plus the message types under pressure.
    */
  final case class ServerBackoff(untilEpochMs: Long,
      types: Seq[String]) extends ServerMessage
  /** `StreamingServerMessageIdentifyMessageType` (bristle.proto:91). */
  final case class ServerIdentifyType(msgType: String, id: Int) extends ServerMessage

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private def str(b: Array[Byte]): String = new String(b, Utf8)

  // ---- encoders ----------------------------------------------------

  private def writeStringField(w: Wire.Writer, num: Int, s: String): Unit =
    if (s.nonEmpty) { w.writeTag(num, 2); w.writeBytes(s.getBytes(Utf8)) }

  private def writeBytesField(w: Wire.Writer, num: Int, b: Array[Byte]): Unit =
    if (b.nonEmpty) { w.writeTag(num, 2); w.writeBytes(b) }

  private def writeVarintField(w: Wire.Writer, num: Int, v: Long): Unit =
    if (v != 0L) { w.writeTag(num, 0); w.writeVarint(v) }

  def encode(p: Payload): Array[Byte] = {
    val w = new Wire.Writer
    writeStringField(w, 1, p.msgType)
    p.bodies.foreach { b => w.writeTag(2, 2); w.writeBytes(b) }
    w.toBytes
  }

  def encode(r: WriteBatchRequest): Array[Byte] = {
    val w = new Wire.Writer
    writeStringField(w, 1, r.key)
    r.payloads.foreach { p => w.writeTag(2, 2); w.writeBytes(encode(p)) }
    w.toBytes
  }

  def encode(r: WriteBatchResponse): Array[Byte] = {
    val w = new Wire.Writer
    writeVarintField(w, 1, r.acknowledged)
    writeVarintField(w, 2, r.dropped)
    w.toBytes
  }

  def encode(m: ClientMessage): Array[Byte] = {
    val inner = new Wire.Writer
    val field = m match {
      case wb: ClientWriteBatch =>
        writeVarintField(inner, 1, wb.id.toLong & 0xffffffffL)
        wb.typeName.foreach(writeStringField(inner, 2, _))
        // a oneof field is emitted even when zero-valued: presence IS
        // the discriminant (type_id 0 ≠ absent)
        wb.typeId.foreach { id => inner.writeTag(3, 0)
          inner.writeVarint(id.toLong & 0xffffffffL) }
        writeVarintField(inner, 4, wb.length.toLong & 0xffffffffL)
        writeBytesField(inner, 5, wb.data)
        1
      case ud: ClientUpdateDefault =>
        writeStringField(inner, 1, ud.msgType)
        writeBytesField(inner, 2, ud.default)
        2
      case rt: ClientRegisterType =>
        writeStringField(inner, 1, rt.msgType)
        writeBytesField(inner, 2, rt.descriptor)
        3
    }
    val w = new Wire.Writer
    w.writeTag(field, 2)
    w.writeBytes(inner.toBytes)
    w.toBytes
  }

  def encode(m: ServerMessage): Array[Byte] = {
    val inner = new Wire.Writer
    val field = m match {
      case r: ServerWriteBatchResult =>
        writeVarintField(inner, 1, r.id.toLong & 0xffffffffL)
        writeVarintField(inner, 2, r.result.toLong)
        1
      case b: ServerBackoff =>
        writeVarintField(inner, 1, b.untilEpochMs)
        b.types.foreach(writeStringField(inner, 2, _))
        2
      case i: ServerIdentifyType =>
        writeStringField(inner, 1, i.msgType)
        writeVarintField(inner, 2, i.id.toLong & 0xffffffffL)
        3
    }
    val w = new Wire.Writer
    w.writeTag(field, 2)
    w.writeBytes(inner.toBytes)
    w.toBytes
  }

  // ---- decoders ----------------------------------------------------

  private def eachField(bytes: Array[Byte])(f: (Int, Int, Wire.Reader) => Unit): Unit = {
    val r = new Wire.Reader(bytes)
    while (r.hasNext) {
      val tag = r.readVarint()
      f((tag >>> 3).toInt, (tag & 7).toInt, r)
    }
  }

  def decodePayload(bytes: Array[Byte]): Payload = {
    var t = ""
    val bodies = Seq.newBuilder[Array[Byte]]
    eachField(bytes) {
      case (1, 2, r) => t = str(r.readBytes())
      case (2, 2, r) => bodies += r.readBytes()
      case (_, wt, r) => r.skip(wt)
    }
    Payload(t, bodies.result())
  }

  def decodeWriteBatchRequest(bytes: Array[Byte]): WriteBatchRequest = {
    var key = ""
    val ps = Seq.newBuilder[Payload]
    eachField(bytes) {
      case (1, 2, r) => key = str(r.readBytes())
      case (2, 2, r) => ps += decodePayload(r.readBytes())
      case (_, wt, r) => r.skip(wt)
    }
    WriteBatchRequest(key, ps.result())
  }

  def decodeWriteBatchResponse(bytes: Array[Byte]): WriteBatchResponse = {
    var ack = 0L; var dropped = 0L
    eachField(bytes) {
      case (1, 0, r) => ack = r.readVarint()
      case (2, 0, r) => dropped = r.readVarint()
      case (_, wt, r) => r.skip(wt)
    }
    WriteBatchResponse(ack, dropped)
  }

  def decodeClientMessage(bytes: Array[Byte]): ClientMessage = {
    var out: Option[ClientMessage] = None
    eachField(bytes) {
      case (1, 2, r) =>
        var id = 0; var tn: Option[String] = None; var ti: Option[Int] = None
        var len = 0; var data = Array.emptyByteArray
        eachField(r.readBytes()) {
          case (1, 0, rr) => id = rr.readVarint().toInt
          case (2, 2, rr) => tn = Some(str(rr.readBytes()))
          case (3, 0, rr) => ti = Some(rr.readVarint().toInt)
          case (4, 0, rr) => len = rr.readVarint().toInt
          case (5, 2, rr) => data = rr.readBytes()
          case (_, wt, rr) => rr.skip(wt)
        }
        out = Some(ClientWriteBatch(id, tn, ti, len, data))
      case (2, 2, r) =>
        var t = ""; var d = Array.emptyByteArray
        eachField(r.readBytes()) {
          case (1, 2, rr) => t = str(rr.readBytes())
          case (2, 2, rr) => d = rr.readBytes()
          case (_, wt, rr) => rr.skip(wt)
        }
        out = Some(ClientUpdateDefault(t, d))
      case (3, 2, r) =>
        var t = ""; var d = Array.emptyByteArray
        eachField(r.readBytes()) {
          case (1, 2, rr) => t = str(rr.readBytes())
          case (2, 2, rr) => d = rr.readBytes()
          case (_, wt, rr) => rr.skip(wt)
        }
        out = Some(ClientRegisterType(t, d))
      case (_, wt, r) => r.skip(wt)
    }
    out.getOrElse(throw Wire.MalformedProto("empty StreamingClientMessage"))
  }

  def decodeServerMessage(bytes: Array[Byte]): ServerMessage = {
    var out: Option[ServerMessage] = None
    eachField(bytes) {
      case (1, 2, r) =>
        var id = 0; var res = 0
        eachField(r.readBytes()) {
          case (1, 0, rr) => id = rr.readVarint().toInt
          case (2, 0, rr) => res = rr.readVarint().toInt
          case (_, wt, rr) => rr.skip(wt)
        }
        out = Some(ServerWriteBatchResult(id, res))
      case (2, 2, r) =>
        var until = 0L
        val ts = Seq.newBuilder[String]
        eachField(r.readBytes()) {
          case (1, 0, rr) => until = rr.readVarint()
          case (2, 2, rr) => ts += str(rr.readBytes())
          case (_, wt, rr) => rr.skip(wt)
        }
        out = Some(ServerBackoff(until, ts.result()))
      case (3, 2, r) =>
        var t = ""; var id = 0
        eachField(r.readBytes()) {
          case (1, 2, rr) => t = str(rr.readBytes())
          case (2, 0, rr) => id = rr.readVarint().toInt
          case (_, wt, rr) => rr.skip(wt)
        }
        out = Some(ServerIdentifyType(t, id))
      case (_, wt, r) => r.skip(wt)
    }
    out.getOrElse(throw Wire.MalformedProto("empty StreamingServerMessage"))
  }

  // ---- stream framing ----------------------------------------------

  /** Read one varint-length-prefixed frame; None at clean EOF (EOF
    * mid-frame throws — a torn frame is corruption, not shutdown).
    */
  def readFrame(in: InputStream, maxLen: Int = 64 << 20): Option[Array[Byte]] = {
    val first = in.read()
    if (first < 0) return None
    var len = (first & 0x7f).toLong
    var shift = 7
    var b = first
    while ((b & 0x80) != 0) {
      if (shift >= 64) throw Wire.MalformedProto("frame varint too long")
      b = in.read()
      if (b < 0) throw new EOFException("EOF inside frame length")
      len |= (b & 0x7fL) << shift
      shift += 7
    }
    if (len > maxLen) throw Wire.MalformedProto(
      s"frame of $len bytes exceeds max $maxLen")
    val buf = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val n = in.read(buf, off, len.toInt - off)
      if (n < 0) throw new EOFException("EOF inside frame body")
      off += n
    }
    Some(buf)
  }

  def writeFrame(out: OutputStream, bytes: Array[Byte]): Unit = {
    val w = new Wire.Writer
    w.writeBytes(bytes)
    out.write(w.toBytes)
    out.flush()
  }
}
