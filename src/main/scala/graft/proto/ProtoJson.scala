package graft.proto

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.time.OffsetDateTime
import scala.jdk.CollectionConverters._

/** JVM-side protojson decoder: one JSON line → the decoded-values
  * shape [[ProtoRows.encodeValues]] consumes — the per-line parse the
  * reference's JSON forwarder does with `protojson.Unmarshal`
  * (cmd/bristle-forward-json/main.go:36-40) before handing bodies to
  * the client batcher.
  *
  * This is the driver-side twin of [[graft.streaming.JsonLines]]
  * (which parses the same format as Spark columns, for the engine
  * path): same conventions — enums by NAME with numbers also
  * accepted, 64-bit ints as strings or bare numbers, full-range
  * uint64 via unsigned parse, bytes as base64, Timestamp as RFC3339
  * with 0/3/6/9 fraction digits and `Z`/`±hh:mm` offsets, maps as
  * objects, repeated as arrays; absent fields take proto3 zeros, a
  * present-but-unconvertible value throws (P11 posture). JsonSpec
  * proves both twins agree on the shared fixtures. Field lookup
  * accepts the original proto name and its lowerCamel `json_name`,
  * as protojson does.
  */
object ProtoJson {

  final case class JsonDecodeError(msg: String)
    extends RuntimeException(msg)

  private val mapper = new ObjectMapper()

  private def camel(snake: String): String = {
    val parts = snake.split('_')
    (parts.head +: parts.tail.map(_.capitalize)).mkString
  }

  def parseLine(m: PMessage, line: String): Seq[Any] = {
    val root =
      try mapper.readTree(line)
      catch { case e: Exception =>
        throw JsonDecodeError(s"unparseable JSON line: ${e.getMessage}") }
    if (root == null || !root.isObject)
      throw JsonDecodeError("protojson line is not a JSON object")
    m.fields.map { f =>
      val node = Option(root.get(f.name)).orElse(Option(root.get(camel(f.name))))
        .filterNot(_.isNull)
      node match {
        case None =>
          if (f.mapOf.isDefined) Map.empty[Any, Any]
          else if (f.repeated) Seq.empty[Any]
          else PType.zero(f.ptype)
        case Some(n) =>
          if (f.mapOf.isDefined) {
            val (kt, vt) = f.mapOf.get
            if (!n.isObject)
              throw JsonDecodeError(s"map field ${f.name} is not an object")
            n.properties().asScala.map { e =>
              scalarFromText(kt, e.getKey, f.name) ->
                scalar(vt, e.getValue, f.name)
            }.toMap
          } else if (f.repeated) {
            if (!n.isArray)
              throw JsonDecodeError(s"repeated field ${f.name} is not an array")
            n.elements().asScala.map(scalar(f.ptype, _, f.name)).toSeq
          } else scalar(f.ptype, n, f.name)
      }
    }
  }

  /** protojson map keys are always JSON strings; convert per key type. */
  private def scalarFromText(t: PType, s: String, field: String): Any =
    scalar(t, mapper.getNodeFactory.textNode(s), field)

  private def scalar(t: PType, n: JsonNode, field: String): Any = t match {
    case PType.PEnum(_, values) =>
      if (n.isTextual) {
        val name = n.asText
        values.collectFirst { case (`name`, v) => v }.getOrElse(
          // protojson also permits the numeric spelling as a string
          try name.trim.toInt catch { case _: NumberFormatException =>
            throw JsonDecodeError(s"unknown enum value for $field: $name") })
      } else if (n.canConvertToInt) n.asInt
      else throw JsonDecodeError(s"unknown enum value for $field: $n")
    case tt if PType.isTimestamp(tt) =>
      val s = n.asText
      try java.sql.Timestamp.from(OffsetDateTime.parse(s).toInstant)
      catch { case _: java.time.format.DateTimeParseException =>
        throw JsonDecodeError(s"unparseable timestamp $field: $s") }
    case PType.PUInt64 | PType.PFixed64 =>
      try java.lang.Long.parseUnsignedLong(n.asText.trim)
      catch { case _: NumberFormatException =>
        throw JsonDecodeError(s"unparseable uint64 $field: ${n.asText}") }
    case PType.PInt64 | PType.PSInt64 | PType.PSFixed64 =>
      try n.asText.trim.toLong
      catch { case _: NumberFormatException =>
        throw JsonDecodeError(s"unparseable int64 $field: ${n.asText}") }
    case PType.PUInt32 | PType.PFixed32 =>
      try n.asText.trim.toLong
      catch { case _: NumberFormatException =>
        throw JsonDecodeError(s"unparseable uint32 $field: ${n.asText}") }
    case PType.PInt32 | PType.PSInt32 | PType.PSFixed32 =>
      try n.asText.trim.toInt
      catch { case _: NumberFormatException =>
        throw JsonDecodeError(s"unparseable int32 $field: ${n.asText}") }
    case PType.PBool =>
      if (n.isBoolean) n.asBoolean
      else throw JsonDecodeError(s"non-boolean $field: $n")
    case PType.PString => n.asText
    case PType.PBytes =>
      try java.util.Base64.getDecoder.decode(n.asText)
      catch { case _: IllegalArgumentException =>
        throw JsonDecodeError(s"unparseable base64 $field") }
    case PType.PDouble =>
      try n.asText.trim.toDouble
      catch { case _: NumberFormatException =>
        throw JsonDecodeError(s"unparseable double $field: ${n.asText}") }
    case PType.PFloat =>
      try n.asText.trim.toFloat
      catch { case _: NumberFormatException =>
        throw JsonDecodeError(s"unparseable float $field: ${n.asText}") }
    case other =>
      throw JsonDecodeError(s"unsupported protojson type $other for $field")
  }

  /** Parse + re-encode in one step: the forwarder's line → wire body. */
  def toWire(m: PMessage, line: String): Array[Byte] =
    ProtoRows.encodeValues(m, parseLine(m, line))
}
