package graft.bind

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** S6: sink-schema introspection — the reference reads (name,
  * position, type, default_expression) from ClickHouse
  * `system.columns` at startup (clickhouse_cluster.go:74-91); our
  * authoritative sink catalog is the landed table itself, so the same
  * tuple is read back from the parquet footer (or any StructType).
  *
  * The Spark→ClickHouse type rendering is the inverse of
  * [[graft.types.ChType.parse]] restricted to the types a landed sink
  * can contain; `bind` against an introspected schema therefore
  * round-trips: land → introspect → bind → transcode lands the same
  * shape again.
  */
object ChCatalog {

  def typeString(dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case StringType => "String"
      case BooleanType => "Bool"
      case DateType => "Date"
      case TimestampType => "DateTime64(6)" // Spark timestamps are micros
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case ArrayType(et, en) => s"Array(${typeString(et, en)})"
      case other =>
        throw BindError(s"no ClickHouse rendering for Spark type $other")
    }
    // Nullable(...) never wraps Array (invalid in ClickHouse, and the
    // reference's Array default path expects bare Array)
    if (nullable && !dt.isInstanceOf[ArrayType]) s"Nullable($base)" else base
  }

  /** Introspect a StructType into sink columns, positions 1-based in
    * field order — the system.columns shape.
    */
  def fromSchema(schema: StructType): Seq[ChColumn] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val default = f.dataType match {
        case _: ArrayType => "[]"
        case _ => ""
      }
      ChColumn(f.name, i + 1, typeString(f.dataType, f.nullable), default)
    }.toSeq

  /** Introspect a landed parquet table's footer schema. */
  def fromParquet(spark: SparkSession, path: String): Seq[ChColumn] =
    fromSchema(spark.read.parquet(path).schema)
}
