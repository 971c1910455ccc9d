package graft.bind

import graft.proto.{PField, PMessage, PType}
import graft.types.{ChPrim, ChType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One sink column as introspected from the catalog — the reference
  * reads (name, position, type, default_expression) from ClickHouse
  * `system.columns` (reference clickhouse_cluster.go:74-91); our catalog
  * carries the same tuple.
  */
final case class ChColumn(
    name: String,
    position: Int, // 1-based, like system.columns
    typeString: String,
    default: String = "") {
  lazy val chType: ChType = ChType.parse(typeString)
}

final case class BindError(msg: String) extends IllegalArgumentException(msg)

/** A compiled message→table binding: the bind-time projection the
  * reference builds as a `PrepareFunc` closure
  * (clickhouse_table.go:171-247), expressed as a `Seq[Column]` that
  * Catalyst analyzes once and whole-stage-codegens — the Spark analog
  * of "compile the row projector at bind time, keep the hot path
  * branch-free".
  */
final case class Binding(
    message: PMessage,
    columns: Seq[ChColumn], // sink order (by position)
    projection: Seq[Column]) {

  /** Apply to a DataFrame of decoded messages (one column per proto
    * field, e.g. from [[graft.proto.ProtoRows.decode]]): yields rows in
    * sink column order/types (P3, clickhouse_table.go:229-239).
    */
  def transcode(decoded: DataFrame): DataFrame =
    decoded.select(projection: _*)
}

object SchemaBinder {

  /** Parity knob for the reference's observable unset-field semantics
    * (SURVEY.md §1.3): its "absent field" defaults are dead stores —
    * execution falls through to `Get`, so proto3 zero values are written
    * and `Nullable` columns never receive NULL
    * (clickhouse_table.go:253-263). `ZeroValues` replicates that;
    * `NullIfZero` is the fixed mode (zero-valued field + Nullable column
    * → NULL — proto3 without presence cannot distinguish unset from
    * explicit zero, so this is the closest honest semantic).
    */
  sealed trait UnsetMode
  case object ZeroValues extends UnsetMode
  case object NullIfZero extends UnsetMode

  /** Resolve every proto field to its sink column and compile the
    * transcode projection. Bind failures are hard errors with the
    * reference's message text (clickhouse_table.go:186,190,206,224).
    */
  def bind(message: PMessage, table: Seq[ChColumn],
      unset: UnsetMode = ZeroValues): Binding = {
    val byName = table.map(c => c.name -> c).toMap
    // position → transcode expression
    val exprs = scala.collection.mutable.Map.empty[Int, Column]
    // two fields resolving to the same column is data loss, not a
    // last-wins: fail like every other bind conflict
    def setExpr(column: ChColumn, field: PField, e: Column): Unit = {
      if (exprs.contains(column.position))
        throw BindError(
          s"column '${column.name}' bound by more than one field " +
            s"(second: '${field.name}')")
      exprs(column.position) = e.as(column.name)
    }

    message.fields.foreach { field =>
      field.mapOf match {
        case Some((kt, vt)) =>
          // map<K,V> → Nested(key,value) parallel arrays (P8,
          // clickhouse_table.go:183-201). Unlike the reference — whose two
          // independent Map.Range iterations may disagree on order —
          // map_keys/map_values over one MapType value are aligned by
          // construction. bristle_column renames the Nested base name,
          // same as it renames a scalar's column.
          vt match {
            case PType.PMessageT(m) if !PType.isTimestamp(vt) =>
              throw BindError(
                s"cannot handle arbitrary embedded message of type ${m.fullName}")
            case _ =>
          }
          val baseName = field.bristleColumn.getOrElse(field.name)
          val keyCol = byName.getOrElse(s"$baseName.key",
            throw BindError(s"Failed to find key column for map '${field.name}'"))
          val valCol = byName.getOrElse(s"$baseName.value",
            throw BindError(s"Failed to find value column for map '${field.name}'"))
          val m = col(quoted(field.name))
          setExpr(keyCol, field, castArray(map_keys(m), kt, keyCol, field))
          setExpr(valCol, field, castArray(map_values(m), vt, valCol, field))
        case None =>
          val columnName = field.bristleColumn.getOrElse(field.name)
          val column = byName.getOrElse(columnName,
            throw BindError(
              s"Failed to find column '$columnName' for field '${field.name}'"))
          field.ptype match {
            case PType.PMessageT(m) if !PType.isTimestamp(field.ptype) =>
              throw BindError(
                s"cannot handle arbitrary embedded message of type ${m.fullName}")
            case _ =>
          }
          val base = col(quoted(field.name))
          val e =
            if (field.repeated) castArray(base, field.ptype, column, field)
            else scalarExpr(base, field.ptype, column, field, unset)
          setExpr(column, field, e)
      }
    }

    val unbound = table.filterNot(c => exprs.contains(c.position))
    if (unbound.nonEmpty)
      // The reference leaves such columns as zero-value preparedFields and
      // would fault on first use; we fail at bind, which is the intent of
      // its startup-time hard-error policy.
      throw BindError(
        s"no message field binds columns: ${unbound.map(_.name).mkString(", ")}")

    val ordered = table.sortBy(_.position)
    Binding(message, ordered, ordered.map(c => exprs(c.position)))
  }

  private def quoted(name: String): String = s"`$name`"

  /** Scalar transcode expression for (proto kind × CH type) — the
    * §1.3 matrix; dispatch mirrors getPreparedFieldValue
    * (clickhouse_table.go:249-380) but is compiled, not interpreted.
    */
  private def scalarExpr(base: Column, pt: PType, column: ChColumn,
      field: PField, unset: SchemaBinder.UnsetMode): Column = {
    val ct = column.chType
    val raw: Column = ct.prim match {
      case ChPrim.ChInt(bits, unsigned) =>
        val asLong = intSource(base, pt, field, column)
        wrapToWidth(asLong, bits, unsigned).cast(ct.prim.spark)
      case ChPrim.ChEnum(bits, _) =>
        // enum number → Enum8/16 code. The reference routes this through
        // its *unsigned* cast arm (uint8/uint16, clickhouse_table.go:322-332
        // via intSize<0) — a quirk that only diverges for enum numbers
        // outside [0, 127/32767]; we keep the signed (storage-correct) wrap.
        wrapToWidth(intSource(base, pt, field, column), bits, unsigned = false)
          .cast(ct.prim.spark)
      case ChPrim.ChFloat64 => base.cast(DoubleType)
      case ChPrim.ChFloat32 => base.cast(FloatType)
      case ChPrim.ChDecimal(p, s) => base.cast(DecimalType(p, s))
      case ChPrim.ChDateTime(precision) =>
        pt match {
          case t if PType.isTimestamp(t) => base // decoder already built the instant (P7)
          case t if PType.isUnsigned(t) || PType.isSigned(t) =>
            // integer epoch → DateTime64(p): binance eventTime pattern
            // (examples/binance.sql:3, flag clickhouse_table.go:126)
            precision match {
              case 0 => timestamp_seconds(base)
              case 3 => timestamp_millis(base)
              case 6 => timestamp_micros(base)
              case p => throw BindError(
                s"DateTime64($p) from integer field '${field.name}' unsupported")
            }
          case other => throw BindError(
            s"field '${field.name}' kind $other cannot fill ${column.typeString}")
        }
      case ChPrim.ChString | _: ChPrim.ChFixedString | ChPrim.ChUuid =>
        base.cast(StringType)
      case ChPrim.ChBool => base.cast(BooleanType)
      case ChPrim.ChDate | ChPrim.ChDate32 => base.cast(DateType)
    }
    if (ct.nullable && unset == NullIfZero) nullIfZero(raw, base, pt)
    else raw
  }

  /** The reference's int-conversion source set: int/sint/sfixed kinds via
    * Int(), uint/fixed via Uint(), bool→0/1, enum→number; anything else
    * is a transcode error (clickhouse_table.go:295-320 — there a runtime
    * whole-batch reject; here a bind-time failure).
    */
  private def intSource(base: Column, pt: PType, field: PField,
      column: ChColumn): Column = pt match {
    case t if PType.isSigned(t) => base.cast(LongType)
    case t if PType.isUnsigned(t) => base // decoder yields the Long bit pattern
    case PType.PBool => when(base, 1L).otherwise(0L) // P5
    case other =>
      throw BindError(
        s"unsupported type for int conversion: field '${field.name}' " +
          s"($other) → column '${column.name}' (${column.typeString})")
  }

  /** Go conversion semantics for integer narrowing (P4): two's-complement
    * wrap for intN(x), modulo 2^N for uintN(x)
    * (clickhouse_table.go:322-370). ANSI-safe: arithmetic, not CAST.
    */
  private[graft] def wrapToWidth(v: Column, bits: Int, unsigned: Boolean): Column =
    if (bits == 64) v // same 64-bit pattern either way
    else {
      val m = lit(1L << bits)
      if (unsigned) ((v % m) + m) % m
      else {
        val half = lit(1L << (bits - 1))
        (((v % m) + m + half) % m) - half
      }
    }

  private def castArray(arr: Column, elemType: PType, column: ChColumn,
      field: PField): Column = {
    val ct = column.chType
    if (!ct.array)
      throw BindError(
        s"repeated field '${field.name}' needs Array column, " +
          s"got '${column.typeString}'")
    val elemPrim = ct.prim
    val target = elemPrim.spark
    elemPrim match {
      case ChPrim.ChInt(bits, unsigned) =>
        transform(arr, x => wrapToWidth(x.cast(LongType), bits, unsigned).cast(target))
      case ChPrim.ChEnum(bits, _) =>
        // same wrap discipline as the scalar enum arm — a plain CAST
        // would throw under ANSI for out-of-width enum numbers
        transform(arr, x =>
          wrapToWidth(x.cast(LongType), bits, unsigned = false).cast(target))
      case _ =>
        // per-element cast: unlike a container cast it never trips over
        // containsNull mismatches between decoder and sink schemas
        transform(arr, x => x.cast(target))
    }
  }

  /** NullIfZero mode: proto3 cannot observe presence for plain scalars,
    * so "unset" is approximated as "zero value" (the only information
    * the wire carries).
    */
  private def nullIfZero(raw: Column, base: Column, pt: PType): Column = {
    val z = pt match {
      case PType.PString => lit("")
      case PType.PBytes => lit(Array.empty[Byte])
      case PType.PBool => lit(false)
      case PType.PDouble => lit(0.0d)
      case PType.PFloat => lit(0.0f)
      case t if PType.isTimestamp(t) =>
        // instant literal, not a session-timezone-parsed string: the
        // decoder's zero is epoch UTC regardless of session tz
        lit(java.sql.Timestamp.from(java.time.Instant.EPOCH))
      case _ => lit(0L)
    }
    when(base === z, lit(null)).otherwise(raw)
  }
}
