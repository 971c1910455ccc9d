package graft.proto

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types.{StringType, StructType}

import java.sql.Timestamp
import java.time.Instant
import scala.collection.mutable

/** Protobuf message ⇄ Spark Row, driven by a [[PMessage]] schema — the
  * engine's S4 decode stage (reference `proto.Unmarshal` + dynamicpb,
  * ingest_service.go:92-96,163-167) without a protobuf runtime: the wire
  * format is parsed directly with [[Wire]].
  *
  * Decode runs inside `mapPartitions` — a narrow transformation, so at
  * scale it parallelizes per input split with no shuffle; one decoder
  * per partition replaces the reference's per-type message instance
  * pool (message_instance_pool.go — JVM allocation makes pooling moot).
  */
object ProtoRows {

  /** Decode one message body to field values in schema order.
    * Proto3 semantics: absent fields yield zero values ([[PType.zero]]),
    * last scalar occurrence wins, repeated fields accumulate, packed and
    * unpacked numeric encodings both accepted, unknown fields skipped.
    */
  def decodeValues(schema: PMessage, bytes: Array[Byte]): Array[Any] = {
    val values = new Array[Any](schema.fields.length)
    decodeValuesInto(schema, bytes, values)
    values
  }

  /** [[decodeValues]] into a caller-owned scratch array — the reuse
    * seam the ingest edge's instance pool needs (SURVEY §2 D12; the
    * reference unmarshals into a pooled message instance the same way,
    * `ingest_service.go:87-96`). The array is cleared first, so a
    * reused buffer can't leak values between bodies.
    */
  def decodeValuesInto(schema: PMessage, bytes: Array[Byte],
      values: Array[Any]): Unit = {
    require(values.length == schema.fields.length,
      s"scratch length ${values.length} != ${schema.fields.length} fields")
    java.util.Arrays.fill(values.asInstanceOf[Array[AnyRef]], null)
    val index = schema.indexByNumber // precomputed once per schema, not per row
    var repeatedAcc: mutable.Map[Int, mutable.ArrayBuffer[Any]] = null
    var mapAcc: mutable.Map[Int, mutable.LinkedHashMap[Any, Any]] = null

    val r = new Wire.Reader(bytes)
    while (r.hasNext) {
      val tag = r.readVarint()
      val fieldNumber = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      index.get(fieldNumber) match {
        case None => r.skip(wt)
        case Some(i) =>
          val f = schema.fields(i)
          f.mapOf match {
            case Some((kt, vt)) if wt == 2 =>
              val entry = r.readBytes()
              val (k, v) = decodeMapEntry(kt, vt, entry)
              if (mapAcc == null) mapAcc = mutable.Map.empty
              mapAcc.getOrElseUpdate(i, mutable.LinkedHashMap.empty)
                .update(k, v)
            case None if f.repeated &&
                (wt == 2 || wt == PType.wireType(f.ptype)) =>
              if (repeatedAcc == null) repeatedAcc = mutable.Map.empty
              val acc = repeatedAcc.getOrElseUpdate(i, mutable.ArrayBuffer.empty)
              if (wt == 2 && PType.wireType(f.ptype) != 2) {
                // packed encoding: one length-delimited run of values
                val packed = r.readBytes()
                val pr = new Wire.Reader(packed)
                while (pr.hasNext) acc += readScalar(pr, f.ptype, PType.wireType(f.ptype))
              } else acc += readScalar(r, f.ptype, wt)
            case None if !f.repeated && wt == PType.wireType(f.ptype) =>
              values(i) = readScalar(r, f.ptype, wt)
            case _ =>
              // known field, WRONG wire type: treat as unknown and skip
              // by the ACTUAL wire type (spec-conformant parsers do the
              // same) — decoding by the declared type would misalign
              // the reader and corrupt every later field silently
              r.skip(wt)
          }
      }
    }
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (f.mapOf.isDefined)
        values(i) =
          if (mapAcc == null) Map.empty[Any, Any]
          else mapAcc.get(i).map(_.toMap).getOrElse(Map.empty[Any, Any])
      else if (f.repeated)
        values(i) =
          if (repeatedAcc == null) Seq.empty[Any]
          else repeatedAcc.get(i).map(_.toSeq).getOrElse(Seq.empty[Any])
      else if (values(i) == null) values(i) = PType.zero(f.ptype)
    }
  }

  def decodeRow(schema: PMessage, bytes: Array[Byte]): Row =
    Row.fromSeq(decodeValues(schema, bytes).toIndexedSeq)

  private def decodeMapEntry(kt: PType, vt: PType,
      entry: Array[Byte]): (Any, Any) = {
    var k: Any = PType.zero(kt)
    var v: Any = PType.zero(vt)
    val r = new Wire.Reader(entry)
    while (r.hasNext) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => k = readScalar(r, kt, (tag & 7).toInt)
        case 2 => v = readScalar(r, vt, (tag & 7).toInt)
        case _ => r.skip((tag & 7).toInt)
      }
    }
    (k, v)
  }

  private def readScalar(r: Wire.Reader, pt: PType, wt: Int): Any = pt match {
    case PType.PDouble => java.lang.Double.longBitsToDouble(r.readFixed64())
    case PType.PFloat => java.lang.Float.intBitsToFloat(r.readFixed32())
    case PType.PInt32 => r.readVarint().toInt
    case PType.PInt64 => r.readVarint()
    case PType.PUInt32 => r.readVarint() & 0xffffffffL
    case PType.PUInt64 => r.readVarint() // uint64 bit pattern in a Long
    case PType.PSInt32 => Wire.zigzagDecode32(r.readVarint())
    case PType.PSInt64 => Wire.zigzagDecode64(r.readVarint())
    case PType.PFixed32 => r.readFixed32().toLong & 0xffffffffL
    case PType.PFixed64 => r.readFixed64()
    case PType.PSFixed32 => r.readFixed32()
    case PType.PSFixed64 => r.readFixed64()
    case PType.PBool => r.readVarint() != 0L
    case PType.PString => new String(r.readBytes(), "UTF-8")
    case PType.PBytes => r.readBytes()
    case PType.PEnum(_, _) => r.readVarint().toInt
    case PType.PMessageT(m) if m.fullName == PType.Timestamp.fullName =>
      val vals = decodeValues(PType.Timestamp, r.readBytes())
      // time.Unix(seconds, nanos).UTC() parity (clickhouse_table.go:267);
      // Spark TimestampType floors to microseconds.
      Timestamp.from(Instant.ofEpochSecond(vals(0).asInstanceOf[Long],
        vals(1).asInstanceOf[Int].toLong))
    case PType.PMessageT(m) => decodeRow(m, r.readBytes())
  }

  // ---------------------------------------------------------------- encode

  /** Encode field values (schema order) to wire bytes. Proto3 emission:
    * zero-valued scalars are skipped, exactly like the official
    * serializers — which makes encode∘decode a true identity on decoded
    * values and exercises the zero-value parity path.
    */
  def encodeValues(schema: PMessage, values: Seq[Any]): Array[Byte] = {
    val w = new Wire.Writer
    schema.fields.zip(values).foreach { case (f, v) =>
      f.mapOf match {
        case Some((kt, vt)) =>
          val m = v.asInstanceOf[scala.collection.Map[Any, Any]]
          m.foreach { case (k, mv) =>
            val ew = new Wire.Writer
            writeScalar(ew, 1, kt, k, skipZero = false)
            writeScalar(ew, 2, vt, mv, skipZero = false)
            w.writeTag(f.number, 2)
            w.writeBytes(ew.toBytes)
          }
        case None if f.repeated =>
          v.asInstanceOf[Seq[Any]].foreach(e =>
            writeScalar(w, f.number, f.ptype, e, skipZero = false))
        case None =>
          writeScalar(w, f.number, f.ptype, v, skipZero = true)
      }
    }
    w.toBytes
  }

  def encodeRow(schema: PMessage, row: Row): Array[Byte] =
    encodeValues(schema, row.toSeq)

  private def writeScalar(w: Wire.Writer, num: Int, pt: PType, v: Any,
      skipZero: Boolean): Unit = {
    if (skipZero && isZero(pt, v)) return
    pt match {
      case PType.PDouble =>
        w.writeTag(num, 1)
        w.writeFixed64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case PType.PFloat =>
        w.writeTag(num, 5)
        w.writeFixed32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
      case PType.PInt32 =>
        w.writeTag(num, 0); w.writeVarint(v.asInstanceOf[Int].toLong)
      case PType.PInt64 =>
        w.writeTag(num, 0); w.writeVarint(v.asInstanceOf[Long])
      case PType.PUInt32 =>
        w.writeTag(num, 0); w.writeVarint(asLong(v) & 0xffffffffL)
      case PType.PUInt64 =>
        w.writeTag(num, 0); w.writeVarint(asLong(v))
      case PType.PSInt32 =>
        w.writeTag(num, 0); w.writeVarint(Wire.zigzagEncode32(v.asInstanceOf[Int]))
      case PType.PSInt64 =>
        w.writeTag(num, 0); w.writeVarint(Wire.zigzagEncode64(v.asInstanceOf[Long]))
      case PType.PFixed32 =>
        w.writeTag(num, 5); w.writeFixed32(asLong(v).toInt)
      case PType.PFixed64 =>
        w.writeTag(num, 1); w.writeFixed64(asLong(v))
      case PType.PSFixed32 =>
        w.writeTag(num, 5); w.writeFixed32(v.asInstanceOf[Int])
      case PType.PSFixed64 =>
        w.writeTag(num, 1); w.writeFixed64(v.asInstanceOf[Long])
      case PType.PBool =>
        w.writeTag(num, 0); w.writeVarint(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case PType.PString =>
        w.writeTag(num, 2); w.writeBytes(v.asInstanceOf[String].getBytes("UTF-8"))
      case PType.PBytes =>
        w.writeTag(num, 2); w.writeBytes(v.asInstanceOf[Array[Byte]])
      case PType.PEnum(_, _) =>
        w.writeTag(num, 0); w.writeVarint(asLong(v))
      case PType.PMessageT(m) if m.fullName == PType.Timestamp.fullName =>
        val ts = v.asInstanceOf[Timestamp].toInstant
        val ew = new Wire.Writer
        if (ts.getEpochSecond != 0) {
          ew.writeTag(1, 0); ew.writeVarint(ts.getEpochSecond)
        }
        if (ts.getNano != 0) { ew.writeTag(2, 0); ew.writeVarint(ts.getNano.toLong) }
        w.writeTag(num, 2)
        w.writeBytes(ew.toBytes)
      case PType.PMessageT(m) =>
        w.writeTag(num, 2)
        w.writeBytes(encodeRow(m, v.asInstanceOf[Row]))
    }
  }

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(s"not an integer: $other")
  }

  private def isZero(pt: PType, v: Any): Boolean = pt match {
    case PType.PString => v == null || v == ""
    case PType.PBytes => v == null || v.asInstanceOf[Array[Byte]].isEmpty
    case PType.PBool => v == false
    case PType.PDouble => v == 0.0d
    case PType.PFloat => v == 0.0f
    case t if PType.isTimestamp(t) =>
      v == null || v.asInstanceOf[Timestamp].toInstant == Instant.EPOCH
    case PType.PMessageT(_) => v == null
    case _ => asLong(v) == 0L
  }

  // ----------------------------------------------------------- DataFrames

  /** Decode a DataFrame column of message bodies into one decoded-struct
    * DataFrame (one column per proto field). Narrow map-partitions — no
    * shuffle, codegen resumes downstream of the decode boundary.
    */
  def decode(bodies: Dataset[Array[Byte]], schema: PMessage): DataFrame = {
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(schema.structType))
    bodies.mapPartitions(it => it.map(b => decodeRow(schema, b)))(enc)
  }

  /** Decode varint-length-framed blobs (S3 + S4 in one pass): each input
    * blob is a framed batch of messages (reference
    * ingest_service.go:152-177).
    */
  def decodeFramed(frames: Dataset[Array[Byte]], schema: PMessage): DataFrame = {
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(schema.structType))
    frames.mapPartitions(it =>
      it.flatMap(blob => Wire.splitFrames(blob).map(b => decodeRow(schema, b))))(enc)
  }

  /** Lenient decode with a dead-letter side-channel — the NON-parity
    * P11 option (parity = MalformedProto fails the whole batch, which
    * a 100 TB ingest can't afford for one poisoned row). Every output
    * row carries an extra `_error` column: null for good rows; the
    * decode failure message (with all data fields null) for bad ones.
    * One pass, no shuffle; split downstream with `_error IS NULL` /
    * `IS NOT NULL` into the table append and the dead-letter sink.
    */
  def decodeFramedLenient(frames: Dataset[Array[Byte]],
      schema: PMessage): DataFrame = {
    // dead-letter rows carry null data fields — every field must be
    // nullable here, unlike the strict decode's schema
    val outType = StructType(
      schema.structType.fields.map(_.copy(nullable = true))
    ).add("_error", StringType)
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outType))
    val width = schema.fields.length
    frames.mapPartitions { it =>
      it.flatMap { blob =>
        // a torn blob dead-letters once; a bad message inside a good
        // blob dead-letters individually
        val msgs =
          try Wire.splitFrames(blob).map(Right(_): Either[String, Array[Byte]])
          catch { case e: Exception => Seq(Left(s"frame: ${e.getMessage}")) }
        msgs.map {
          case Right(b) =>
            try Row.fromSeq(decodeValues(schema, b).toIndexedSeq :+ null)
            catch { case e: Exception =>
              Row.fromSeq(Seq.fill[Any](width)(null) :+ s"decode: ${e.getMessage}")
            }
          case Left(err) => Row.fromSeq(Seq.fill[Any](width)(null) :+ err)
        }
      }
    }(enc)
  }

  def structType(schema: PMessage): StructType = schema.structType
}
