package graft.proto

import org.apache.spark.sql.types._

/** Runtime protobuf message schema — our analog of the reference's
  * dynamic descriptor registry (reference proto_registry.go:34-43), as a
  * plain Scala model: enough descriptor surface for schema binding,
  * wire decode, and StructType derivation, without a protobuf runtime.
  */
sealed trait PType
object PType {
  case object PDouble extends PType
  case object PFloat extends PType
  case object PInt32 extends PType
  case object PInt64 extends PType
  case object PUInt32 extends PType
  case object PUInt64 extends PType
  case object PSInt32 extends PType
  case object PSInt64 extends PType
  case object PFixed32 extends PType
  case object PFixed64 extends PType
  case object PSFixed32 extends PType
  case object PSFixed64 extends PType
  case object PBool extends PType
  case object PString extends PType
  case object PBytes extends PType
  /** Enum carries its name→number dictionary (numbers on the wire). */
  final case class PEnum(name: String, values: Seq[(String, Int)]) extends PType
  /** Nested message. `google.protobuf.Timestamp` gets special transcode
    * treatment (reference clickhouse_table.go:215-226); any other nested
    * message is rejected at bind time in parity mode (:224).
    */
  final case class PMessageT(schema: PMessage) extends PType

  /** Well-known Timestamp as a plain message schema. */
  val Timestamp: PMessage = PMessage(
    "google.protobuf.Timestamp",
    Seq(PField("seconds", 1, PInt64), PField("nanos", 2, PInt32)))

  def isTimestamp(t: PType): Boolean = t match {
    case PMessageT(m) => m.fullName == Timestamp.fullName
    case _ => false
  }

  /** True for the integer kinds Go's Int()/Uint() accessors cover —
    * the set the reference narrows to sized columns
    * (clickhouse_table.go:295-314).
    */
  def isSigned(t: PType): Boolean = t match {
    case PInt32 | PInt64 | PSInt32 | PSInt64 | PSFixed32 | PSFixed64 => true
    case _: PEnum => true
    case _ => false
  }
  def isUnsigned(t: PType): Boolean = t match {
    case PUInt32 | PUInt64 | PFixed32 | PFixed64 => true
    case _ => false
  }

  /** Wire type (0=varint, 1=64-bit, 2=length-delimited, 5=32-bit). */
  def wireType(t: PType): Int = t match {
    case PDouble | PFixed64 | PSFixed64 => 1
    case PFloat | PFixed32 | PSFixed32 => 5
    case PString | PBytes | _: PMessageT => 2
    case _ => 0
  }

  /** Spark type produced by the wire decoder (pre-transcode). Unsigned
    * 64-bit lands in LongType with the uint64 bit pattern (documented
    * wraparound, matching Go uint64→int64 semantics downstream).
    */
  def sparkType(t: PType): DataType = t match {
    case PDouble => DoubleType
    case PFloat => FloatType
    case PInt32 | PSInt32 | PSFixed32 => IntegerType
    case PInt64 | PSInt64 | PSFixed64 => LongType
    case PUInt32 | PFixed32 => LongType
    case PUInt64 | PFixed64 => LongType
    case PBool => BooleanType
    case PString => StringType
    case PBytes => BinaryType
    case _: PEnum => IntegerType
    case PMessageT(m) if m.fullName == Timestamp.fullName => TimestampType
    case PMessageT(m) => m.structType
  }

  /** Proto3 zero value (what an absent field decodes to — parity with
    * the reference's observable fall-through semantics, SURVEY.md §1.3).
    */
  def zero(t: PType): Any = t match {
    case PDouble => 0.0d
    case PFloat => 0.0f
    case PInt32 | PSInt32 | PSFixed32 => 0
    case PUInt32 | PFixed32 => 0L
    case PInt64 | PSInt64 | PSFixed64 | PUInt64 | PFixed64 => 0L
    case PBool => false
    case PString => ""
    case PBytes => Array.emptyByteArray
    case _: PEnum => 0
    case PMessageT(m) if m.fullName == Timestamp.fullName =>
      java.sql.Timestamp.from(java.time.Instant.EPOCH)
    case _: PMessageT => null
  }
}

/** One proto field. `repeated` and `mapOf` are mutually exclusive;
  * `bristleColumn` mirrors the reference's per-field column-rename
  * option (reference bristle.proto:10, applied clickhouse_table.go:178-181).
  */
final case class PField(
    name: String,
    number: Int,
    ptype: PType,
    repeated: Boolean = false,
    mapOf: Option[(PType, PType)] = None,
    bristleColumn: Option[String] = None) {

  def sparkField: StructField = {
    val dt =
      if (mapOf.isDefined)
        MapType(PType.sparkType(mapOf.get._1), PType.sparkType(mapOf.get._2),
          valueContainsNull = false)
      else if (repeated) ArrayType(PType.sparkType(ptype), containsNull = false)
      else PType.sparkType(ptype)
    // proto3 without presence: nothing is ever missing, only zero-valued
    StructField(name, dt, nullable = false)
  }
}

/** Message schema; `bristleTable` mirrors the message-level target-table
  * option (reference bristle.proto:8, message_binding_registry.go:41-49).
  */
final case class PMessage(
    fullName: String,
    fields: Seq[PField],
    bristleTable: Option[String] = None) {

  require(fields.map(_.number).distinct.size == fields.size,
    s"$fullName: duplicate field numbers")

  lazy val structType: StructType = StructType(fields.map(_.sparkField))
  lazy val byNumber: Map[Int, PField] = fields.map(f => f.number -> f).toMap
  /** field number → positional index, precomputed once per schema so
    * the per-message decode loop allocates nothing for the lookup.
    */
  lazy val indexByNumber: Map[Int, Int] =
    fields.zipWithIndex.map { case (f, i) => f.number -> i }.toMap
}
