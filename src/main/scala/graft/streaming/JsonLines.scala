package graft.streaming

import graft.proto.{PMessage, PType}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S5: JSON-lines source — the engine-side analog of the reference's
  * bristle-forward-json producer (cmd/bristle-forward-json/main.go:25-46),
  * which reads protojson lines and forwards decoded messages.
  *
  * protojson conventions honored: enums as NAMES (numeric values also
  * accepted, as protojson parsers do), 64-bit integers as JSON strings
  * (the spec's mapping — bare numbers are also accepted), bytes as
  * base64, google.protobuf.Timestamp as RFC3339 with 0/3/6/9 fraction
  * digits and `Z` or `±hh:mm` offsets, maps as JSON objects, repeated
  * fields as arrays. `parse` lands rows in the exact decoded shape
  * [[graft.proto.ProtoRows.decode]] produces, so the same
  * [[graft.bind.Binding]] transcodes either source — one binder, two
  * wire formats.
  *
  * Error posture (P11 parity): absent fields take proto3 zero values;
  * a PRESENT but unconvertible value raises and fails the batch.
  */
object JsonLines {

  private def is64Bit(t: PType): Boolean = t match {
    case PType.PInt64 | PType.PUInt64 | PType.PSInt64 |
         PType.PFixed64 | PType.PSFixed64 => true
    case _ => false
  }

  private def isUnsigned64(t: PType): Boolean = t match {
    case PType.PUInt64 | PType.PFixed64 => true
    case _ => false
  }

  /** The JSON-facing schema. StringType is used wherever protojson's
    * rendering is a string (enums, timestamps, 64-bit ints, bytes) —
    * Spark's JSON parser captures a bare-number token as its text for
    * a StringType field, so both spellings parse.
    */
  def jsonSchema(m: PMessage): StructType = StructType(m.fields.map { f =>
    def asJson(t: PType): DataType = t match {
      case PType.PEnum(_, _) => StringType
      case tt if PType.isTimestamp(tt) => StringType
      case tt if is64Bit(tt) => StringType
      case PType.PBytes => StringType
      case tt => PType.sparkType(tt)
    }
    val dt =
      if (f.mapOf.isDefined)
        MapType(asJson(f.mapOf.get._1), asJson(f.mapOf.get._2))
      else if (f.repeated) ArrayType(asJson(f.ptype))
      else asJson(f.ptype)
    StructField(f.name, dt)
  })

  /** Full-range uint64: parseUnsignedLong gives the same Long bit
    * pattern the wire decoder produces for values above
    * Long.MaxValue.
    */
  private val unsignedLong = udf { (s: String) =>
    java.lang.Long.parseUnsignedLong(s.trim)
  }

  /** Proto3 zero value as a Column literal (instant-based for
    * timestamps — never a session-timezone-parsed string).
    */
  private def zeroLit(t: PType): Column = PType.zero(t) match {
    case null => lit(null)
    case ts: java.sql.Timestamp => lit(ts)
    case b: Array[Byte] => lit(b)
    case s: String => lit(s)
    case b: Boolean => lit(b)
    case d: Double => lit(d)
    case f: Float => lit(f)
    case i: Int => lit(i)
    case l: Long => lit(l)
    case other => lit(other.toString)
  }

  /** Convert one PRESENT (non-null) JSON-shaped value to the decoded
    * shape. Usable on scalars and, via `transform`, on array elements
    * and map keys/values.
    */
  private def convert(c: Column, t: PType, fieldName: String): Column = t match {
    case PType.PEnum(_, values) =>
      val dict = map(values.flatMap { case (n, v) => Seq(lit(n), lit(v)) }: _*)
      // names resolve via the dict; protojson also permits numbers
      coalesce(element_at(dict, c), c.try_cast("int"),
        raise_error(concat(lit(s"unknown enum value for $fieldName: "), c))
          .cast(IntegerType))
    case tt if PType.isTimestamp(tt) =>
      // 0/3/6/9 fraction digits x (Z | ±hh:mm) offsets
      val widths = Seq("", ".SSS", ".SSSSSS", ".SSSSSSSSS")
      val pats = widths.flatMap(w =>
        Seq(s"yyyy-MM-dd'T'HH:mm:ss${w}X", s"yyyy-MM-dd'T'HH:mm:ss${w}XXX"))
      coalesce(pats.map(p => try_to_timestamp(c, lit(p))) :+
        raise_error(concat(lit(s"unparseable timestamp $fieldName: "), c))
          .cast(TimestampType): _*)
    case tt if isUnsigned64(tt) => unsignedLong(c)
    case tt if is64Bit(tt) =>
      coalesce(c.cast(LongType),
        raise_error(concat(lit(s"unparseable int64 $fieldName: "), c))
          .cast(LongType))
    case PType.PBytes => unbase64(c)
    case tt => c.cast(PType.sparkType(tt))
  }

  /** Parse JSON lines into the decoded-message shape. */
  def parse(lines: Dataset[String], m: PMessage): DataFrame = {
    val parsed = lines.select(
      from_json(col("value"), jsonSchema(m), Map("mode" -> "FAILFAST")).as("j"))
    val cols: Seq[Column] = m.fields.map { f =>
      val j = col(s"j.${f.name}")
      val e: Column =
        if (f.mapOf.isDefined) {
          val (kt, vt) = f.mapOf.get
          val zm = map().cast(MapType(PType.sparkType(kt), PType.sparkType(vt)))
          when(j.isNull, zm).otherwise(
            map_from_arrays(
              transform(map_keys(j), k => convert(k, kt, f.name)),
              transform(map_values(j), v => convert(v, vt, f.name))))
        } else if (f.repeated) {
          val za = array().cast(ArrayType(PType.sparkType(f.ptype)))
          when(j.isNull, za)
            .otherwise(transform(j, x => convert(x, f.ptype, f.name)))
        } else {
          when(j.isNull, zeroLit(f.ptype))
            .otherwise(convert(j, f.ptype, f.name))
        }
      e.as(f.name)
    }
    parsed.select(cols: _*)
  }
}
