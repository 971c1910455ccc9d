package graft.bind

/** Engine dialect seam for the JDBC sink + catalog (VERDICT r14 #4):
  * the two places the reference speaks ClickHouse-specific SQL —
  * INSERT generation (`clickhouse_table.go:87-111`) and `system
  * .columns` introspection (`clickhouse_cluster.go:74-91`) — factored
  * behind one trait so flipping a deployment from the embedded-Derby/
  * parquet twin to a live ClickHouse endpoint is CONFIG ONLY (the
  * `jdbc:clickhouse:` / `jdbc:ch:` URL selects [[ChDialect]]; see
  * USAGE.md for the endpoint example). Everything here is proven
  * through Derby in ChDialectSpec with the dialect abstracted: the
  * catalog row-mapping runs the same code against a system.columns-
  * shaped Derby table, and the CH spellings are pinned literally
  * against the reference's.
  */
trait SqlDialect {
  def name: String

  /** Quote an identifier for INSERT statements. */
  def ident(name: String): String

  /** `INSERT INTO t (…) VALUES (…)` in this engine's spelling. */
  def insertSql(table: String, cols: Seq[String]): String =
    s"INSERT INTO $table (${cols.map(ident).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"

  /** Catalog introspection SQL returning one row per column —
    * `(name, position, type, default_expression)` — for `(database,
    * table)` parameters, or None to introspect through JDBC
    * `DatabaseMetaData.getColumns` (the every-engine path).
    */
  def columnsQuery: Option[String] = None
}

object SqlDialect {
  /** Dialect by JDBC URL; unknown engines get the ANSI arm. */
  def forUrl(url: String): SqlDialect =
    if (url.startsWith("jdbc:clickhouse:") || url.startsWith("jdbc:ch:"))
      ChDialect
    else AnsiDialect
}

/** The every-engine arm (Derby/Postgres/…): delimit only identifiers
  * that need it — the Nested flatten's `tags.key`/`tags.value` names
  * take ANSI double quotes, plain names stay unquoted so tables
  * created with undelimited (engine-case-folded) DDL keep matching.
  */
object AnsiDialect extends SqlDialect {
  val name = "ansi"
  def ident(name: String): String =
    if (name.forall(c => c.isLetterOrDigit || c == '_') &&
        name.headOption.exists(c => c.isLetter || c == '_')) name
    else "\"" + name.replace("\"", "\"\"") + "\""
}

/** The ClickHouse arm, spelled exactly as the reference does:
  *
  *  - INSERT encloses EVERY column name in double quotes and ends
  *    with `;` (`clickhouse_table.go:95,103-108` — `"%s"` per column,
  *    `"INSERT INTO %s (%s) VALUES (%s);"`);
  *  - the catalog query is the reference's `system.columns` SELECT
  *    verbatim (`clickhouse_cluster.go:74-78`), returning ClickHouse
  *    type STRINGS that [[graft.types.ChType.parse]] consumes and
  *    [[graft.types.ChType.render]] reproduces (the round-trip
  *    ChDialectSpec pins).
  *
  * Batch-replay idempotence note: the ANSI sink's delete-by-batch-key
  * tx works on ClickHouse ≥ 22.8 (lightweight DELETE), but a
  * production CH deployment should prefer the engine's own
  * `insert_deduplication_token` window — the discipline the
  * LedgerStore scaladoc credits.
  */
object ChDialect extends SqlDialect {
  val name = "clickhouse"
  def ident(name: String): String =
    "\"" + name.replace("\"", "\\\"") + "\""
  override def insertSql(table: String, cols: Seq[String]): String =
    s"INSERT INTO $table (${cols.map(ident).mkString(",")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(",")});"
  override val columnsQuery: Option[String] = Some(
    "SELECT name, position, type, default_expression FROM " +
      "system.columns WHERE database = ? AND table = ? ORDER BY position")
}
