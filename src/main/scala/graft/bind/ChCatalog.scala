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

  /** Introspect a JDBC sink table — the system.columns half of S6 for
    * real SQL engines (reference clickhouse_cluster.go:74-91 runs
    * `SELECT name, position, type, default_expression FROM
    * system.columns WHERE table = ?`): the same (name, position,
    * type, default) tuple is read through `DatabaseMetaData
    * .getColumns`, which every JDBC engine serves, so a config whose
    * table points only at a `jdbc_url` can bind without a parquet
    * twin. Sink-infrastructure columns (the idempotence `batch_key`
    * [[graft.streaming.JdbcSink]] adds) are excluded and positions
    * renumbered, so the result round-trips against the data schema
    * exactly like [[fromParquet]].
    *
    * Identifier case: engines that fold unquoted identifiers
    * (Derby → upper) report the folded form; names are folded back to
    * lower case there so they match the proto/descriptor names the
    * binder joins on — ClickHouse itself is case-preserving and takes
    * the other branch.
    */
  def fromJdbc(url: String, table: String,
      exclude: Set[String] = Set("batch_key")): Seq[ChColumn] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try fromJdbc(conn, table, exclude) finally conn.close()
  }

  /** Dialect-dispatched introspection (VERDICT r14 #4): a dialect
    * carrying a [[SqlDialect.columnsQuery]] (ClickHouse — the
    * reference's `system.columns` SELECT verbatim) introspects through
    * [[fromColumnsQuery]]; every other engine through the JDBC
    * `DatabaseMetaData` path. `database` feeds the query's first
    * parameter and is ignored on the metadata path (where the JDBC
    * catalog/schema filters stay null, as [[fromJdbc]] always has).
    */
  def fromJdbc(conn: java.sql.Connection, database: String, table: String,
      dialect: SqlDialect, exclude: Set[String]): Seq[ChColumn] =
    dialect.columnsQuery match {
      case Some(sql) => fromColumnsQuery(conn, sql, database, table, exclude)
      case None => fromJdbc(conn, table, exclude)
    }

  /** The `system.columns`-shaped catalog path: run `sql` with
    * `(database, table)` parameters; each row is `(name, position,
    * type, default_expression)` where `type` is the ENGINE's own type
    * string (ClickHouse rendering), kept verbatim —
    * [[graft.types.ChType.parse]] consumes it downstream exactly as it
    * consumes config-declared types, so no JDBC-type mapping happens
    * on this arm. Sink-infrastructure columns are excluded and
    * positions renumbered like [[fromParquet]]. The row-mapping is
    * dialect-independent and ChDialectSpec drives it through Derby
    * with a Derby-safe spelling of the same query.
    */
  def fromColumnsQuery(conn: java.sql.Connection, sql: String,
      database: String, table: String,
      exclude: Set[String] = Set("batch_key")): Seq[ChColumn] = {
    val st = conn.prepareStatement(sql)
    try {
      st.setString(1, database)
      st.setString(2, table)
      val rs = st.executeQuery()
      val rows = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getInt(2), r.getString(1), r.getString(3),
          Option(r.getString(4)).getOrElse("")))
        .toVector
      rs.close()
      if (rows.isEmpty)
        throw BindError(s"catalog has no table '$database.$table'")
      rows.sortBy(_._1)
        .filterNot { case (_, n, _, _) => exclude.contains(n) }
        .zipWithIndex
        .map { case ((_, n, t, d), i) => ChColumn(n, i + 1, t, d) }
    } finally st.close()
  }

  def fromJdbc(conn: java.sql.Connection, table: String,
      exclude: Set[String]): Seq[ChColumn] = {
    import java.sql.Types._
    val meta = conn.getMetaData
    val foldsUpper = meta.storesUpperCaseIdentifiers
    val lookup =
      if (foldsUpper) table.toUpperCase
      else if (meta.storesLowerCaseIdentifiers) table.toLowerCase
      else table
    val rs = meta.getColumns(null, null, lookup, null)
    val rows = Iterator.continually(rs)
      .takeWhile(_.next())
      .map { r =>
        val size = r.getInt("COLUMN_SIZE")
        val digits = r.getInt("DECIMAL_DIGITS")
        val base = r.getInt("DATA_TYPE") match {
          case BIGINT => "Int64"
          case INTEGER => "Int32"
          case SMALLINT => "Int16"
          case TINYINT => "Int8"
          case DOUBLE | FLOAT => "Float64"
          case REAL => "Float32"
          case BOOLEAN | BIT => "Bool"
          case VARCHAR | CHAR | LONGVARCHAR | CLOB | NVARCHAR | NCHAR =>
            "String"
          case TIMESTAMP => "DateTime64(6)"
          case DATE => "Date"
          case DECIMAL | NUMERIC => s"Decimal($size, $digits)"
          case other => throw BindError(
            s"no ClickHouse rendering for JDBC type $other " +
              s"(column ${r.getString("COLUMN_NAME")})")
        }
        val nullable =
          r.getInt("NULLABLE") == java.sql.DatabaseMetaData.columnNullable
        val name0 = r.getString("COLUMN_NAME")
        val name = if (foldsUpper) name0.toLowerCase else name0
        (r.getInt("ORDINAL_POSITION"), name,
          if (nullable) s"Nullable($base)" else base,
          Option(r.getString("COLUMN_DEF")).getOrElse(""))
      }.toVector
    rs.close()
    if (rows.isEmpty)
      throw BindError(s"JDBC catalog has no table '$table'")
    rows.sortBy(_._1)
      .filterNot { case (_, n, _, _) => exclude.contains(n) }
      .zipWithIndex
      .map { case ((_, n, t, d), i) => ChColumn(n, i + 1, t, d) }
  }
}
