package graft.bind

import graft.types.{ChPrim, ChType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The ClickHouse dialect seam (VERDICT r14 #4): CH spellings pinned
  * literally against the reference's generated SQL, the ChType → CH
  * DDL rendering round-trips through the parser, and the
  * `system.columns`-shaped catalog path runs end-to-end through Derby
  * with the dialect abstracted — so flipping a deployment to a live
  * ClickHouse endpoint is config only.
  */
class ChDialectSpec extends AnyFunSuite {

  private val url = "jdbc:derby:memory:chdialect;create=true"

  test("CH INSERT spelling matches the reference's cached insert " +
      "query exactly (clickhouse_table.go:87-111: every column " +
      "double-quoted, comma-joined, trailing semicolon)") {
    assert(ChDialect.insertSql("finnhub.trades",
      Seq("symbol", "price", "tradeConditions")) ==
      """INSERT INTO finnhub.trades ("symbol","price","tradeConditions") VALUES (?,?,?);""")
    // the ANSI arm is byte-identical to the historical JdbcSink
    // spelling — the seam changed nothing for Derby/Postgres callers
    assert(AnsiDialect.insertSql("t", Seq("a", "tags.key")) ==
      graft.streaming.JdbcSink.insertSql("t", Seq("a", "tags.key")))
    assert(AnsiDialect.insertSql("t", Seq("a", "b")) ==
      "INSERT INTO t (a, b) VALUES (?, ?)")
  }

  test("the CH catalog query is the reference's system.columns SELECT " +
      "verbatim (clickhouse_cluster.go:74-78)") {
    assert(ChDialect.columnsQuery.contains(
      "SELECT name, position, type, default_expression FROM " +
        "system.columns WHERE database = ? AND table = ? ORDER BY position"))
    assert(AnsiDialect.columnsQuery.isEmpty,
      "the ANSI arm introspects through DatabaseMetaData")
  }

  test("dialect by URL: clickhouse/ch prefixes take the CH arm, " +
      "everything else the ANSI arm") {
    assert(SqlDialect.forUrl("jdbc:clickhouse://ch.example:8123/logs") ==
      ChDialect)
    assert(SqlDialect.forUrl("jdbc:ch://ch.example:8123/logs") == ChDialect)
    assert(SqlDialect.forUrl(url) == AnsiDialect)
    assert(SqlDialect.forUrl("jdbc:postgresql://h/db") == AnsiDialect)
  }

  private val primGen: Gen[ChPrim] = Gen.oneOf(
    Gen.const(ChPrim.ChString),
    Gen.const(ChPrim.ChBool),
    Gen.const(ChPrim.ChFloat32),
    Gen.const(ChPrim.ChFloat64),
    Gen.const(ChPrim.ChUuid),
    Gen.const(ChPrim.ChDate),
    Gen.const(ChPrim.ChDate32),
    Gen.choose(1, 256).map(ChPrim.ChFixedString(_)),
    for {
      bits <- Gen.oneOf(8, 16, 32, 64)
      u <- Gen.oneOf(true, false)
    } yield ChPrim.ChInt(bits, u),
    for {
      p <- Gen.choose(1, 38)
      s <- Gen.choose(0, 38)
    } yield ChPrim.ChDecimal(p, math.min(p, s)),
    Gen.oneOf(0, 3, 6, 9).map(ChPrim.ChDateTime(_)),
    for {
      bits <- Gen.oneOf(8, 16)
      names <- Gen.someOf("up", "down", "it's odd", "x_1", "B")
        .suchThat(_.nonEmpty)
      vals <- Gen.listOfN(names.size, Gen.choose(-128, 127))
    } yield ChPrim.ChEnum(bits, names.toSeq.zip(vals)))

  private val chTypeGen: Gen[ChType] = for {
    prim <- primGen
    nullable <- Gen.oneOf(true, false)
    lc <- Gen.oneOf(true, false)
    array <- Gen.oneOf(true, false)
  } yield ChType(prim, nullable = nullable, lowCardinality = lc,
    array = array)

  test("ChType render ↔ parse round-trip: parse(render(t)) == t for " +
      "every representable shape (300-case generator property)") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(chTypeGen) { t =>
        ChType.parse(t.render) == t
      })
    assert(res.passed, s"round-trip: ${res.status}")
  }

  test("render reproduces the reference's own example DDL types " +
      "(examples/finnhub.sql)") {
    assert(ChType.parse("LowCardinality(String)").render ==
      "LowCardinality(String)")
    assert(ChType.parse("DateTime64(3)").render == "DateTime64(3)")
    assert(ChType.parse("Array(String)").render == "Array(String)")
    assert(ChType.parse("Array(LowCardinality(String))").render ==
      "Array(LowCardinality(String))")
    // parse accepts either wrapper nesting order and render emits the
    // canonical one — the TYPE is preserved exactly
    assert(ChType.parse("LowCardinality(Nullable(String))") ==
      ChType.parse("Nullable(LowCardinality(String))"))
    assert(ChType.parse("LowCardinality(Nullable(String))").render ==
      "Nullable(LowCardinality(String))")
    assert(ChType.parse("Enum8('buy' = 1, 'sell' = 2)").render ==
      "Enum8('buy' = 1, 'sell' = 2)")
  }

  test("the system.columns-shaped catalog path end-to-end through " +
      "Derby (dialect abstracted): CH type strings arrive verbatim, " +
      "infra columns excluded, positions renumbered, every type " +
      "parses") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("""CREATE SCHEMA "system"""")
      catch { case _: java.sql.SQLException => () } // re-run
      try st.execute("""DROP TABLE "system"."columns"""")
      catch { case _: java.sql.SQLException => () }
      st.execute(
        """CREATE TABLE "system"."columns" (
          |  "database" VARCHAR(128), "table" VARCHAR(128),
          |  "name" VARCHAR(128), "position" INT,
          |  "type" VARCHAR(512), "default_expression" VARCHAR(512))"""
          .stripMargin)
      val ins = conn.prepareStatement(
        """INSERT INTO "system"."columns" VALUES (?,?,?,?,?,?)""")
      val rows = Seq(
        ("logs", "trades", "symbol", 1, "LowCardinality(String)", ""),
        ("logs", "trades", "price", 2, "Float64", ""),
        ("logs", "trades", "tradeTime", 3, "DateTime64(3)", ""),
        ("logs", "trades", "batch_key", 4, "String", ""),
        ("logs", "trades", "tradeConditions", 5, "Array(String)", "[]"),
        ("other", "trades", "decoy", 1, "Int64", ""))
      rows.foreach { case (d, t, n, p, ty, de) =>
        ins.setString(1, d); ins.setString(2, t); ins.setString(3, n)
        ins.setInt(4, p); ins.setString(5, ty); ins.setString(6, de)
        ins.executeUpdate()
      }
      ins.close(); st.close()
      // the SAME row-mapping code ChDialect's query feeds, driven with
      // a Derby-safe spelling of the same SELECT (Derby reserves
      // `table`, so the CH literal cannot parse there — the dialect
      // carries the CH spelling, the mapping is dialect-independent)
      val derbySql =
        """SELECT "name", "position", "type", "default_expression" """ +
          """FROM "system"."columns" WHERE "database" = ? AND """ +
          """"table" = ? ORDER BY "position""""
      val cols = ChCatalog.fromColumnsQuery(conn, derbySql, "logs", "trades")
      assert(cols.map(_.name) ==
        Seq("symbol", "price", "tradeTime", "tradeConditions"),
        "batch_key excluded, decoy database filtered")
      assert(cols.map(_.position) == Seq(1, 2, 3, 4),
        "positions renumbered after exclusion")
      assert(cols.map(_.typeString) == Seq("LowCardinality(String)",
        "Float64", "DateTime64(3)", "Array(String)"),
        "engine type strings kept verbatim")
      assert(cols.find(_.name == "tradeConditions").get.default == "[]")
      // every string parses and round-trips — bind-ready
      cols.foreach { c =>
        assert(ChType.parse(c.typeString).render == c.typeString)
      }
      // the dispatching overload: a dialect with a columnsQuery takes
      // this path; the ANSI arm (None) falls back to DatabaseMetaData
      object DerbyShapedDialect extends SqlDialect {
        val name = "derby-shaped"
        def ident(n: String): String = AnsiDialect.ident(n)
        override val columnsQuery: Option[String] = Some(derbySql)
      }
      assert(ChCatalog.fromJdbc(conn, "logs", "trades",
        DerbyShapedDialect, Set("batch_key")) == cols)
      val missing = intercept[BindError] {
        ChCatalog.fromColumnsQuery(conn, derbySql, "logs", "nope")
      }
      assert(missing.getMessage.contains("logs.nope"))
    } finally conn.close()
  }
}
