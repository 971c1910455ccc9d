package graft.bind

import graft.SparkSpec
import graft.types.ChType

/** S6: footer introspection round-trips through the ChType parser and
  * can feed bind() directly.
  */
class CatalogSpec extends SparkSpec {

  test("every rendered type string parses back to the same Spark type") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true),
      StructField("c", DoubleType, nullable = false),
      StructField("d", TimestampType, nullable = true),
      StructField("e", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("f", DecimalType(38, 6), nullable = false),
      StructField("g", ByteType, nullable = false),
      StructField("h", BooleanType, nullable = true)))
    val cols = ChCatalog.fromSchema(schema)
    assert(cols.map(_.position) == (1 to 8))
    cols.zip(schema.fields).foreach { case (c, f) =>
      val parsed = ChType.parse(c.typeString)
      assert(parsed.spark == f.dataType, s"${c.typeString} vs ${f.dataType}")
      assert(parsed.nullable == (f.nullable && !f.dataType.isInstanceOf[ArrayType]))
    }
    assert(cols.find(_.name == "e").get.default == "[]")
  }

  test("two fields binding the same column is a bind error, not last-wins") {
    import graft.proto.{PField, PMessage, PType}
    val cols = Seq(ChColumn("x", 1, "Int64"))
    val msg = PMessage("M", Seq(
      PField("a", 1, PType.PInt64, bristleColumn = Some("x")),
      PField("x", 2, PType.PInt64)))
    val e = intercept[BindError] { SchemaBinder.bind(msg, cols) }
    assert(e.getMessage.contains("more than one field"))
  }

  test("bristle_column renames the Nested base name for map fields") {
    import graft.proto.{PField, PMessage, PType}
    val cols = Seq(
      ChColumn("renamed.key", 1, "Array(String)", "[]"),
      ChColumn("renamed.value", 2, "Array(String)", "[]"))
    val msg = PMessage("M", Seq(
      PField("tags", 1, PType.PString, mapOf = Some((PType.PString, PType.PString)),
        bristleColumn = Some("renamed"))))
    val binding = SchemaBinder.bind(msg, cols)
    assert(binding.columns.map(_.name) == Seq("renamed.key", "renamed.value"))
  }

  test("JDBC catalog introspection matches fromSchema on the sink DDL") {
    import org.apache.spark.sql.types._
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home",
        java.nio.file.Files.createTempDirectory("derby-home").toString)
    val url = "jdbc:derby:memory:catspec;create=true"
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = false),
      StructField("ratio", FloatType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("amount", DecimalType(12, 3), nullable = false),
      StructField("flag", BooleanType, nullable = true)))
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      graft.streaming.JdbcSink.ddlFor("t_cat", schema))
    finally conn.close()
    // the engine's catalog (DatabaseMetaData — the system.columns
    // read for engines without one) yields the SAME (name, position,
    // type, default) tuple as introspecting the Spark schema: the
    // idempotence batch_key is excluded, positions renumber, Derby's
    // upper-case identifier fold is undone
    val cols = ChCatalog.fromJdbc(url, "t_cat")
    assert(cols == ChCatalog.fromSchema(schema))
    // a missing table is a bind error, not an empty catalog
    val e = intercept[BindError] { ChCatalog.fromJdbc(url, "no_such") }
    assert(e.getMessage.contains("no_such"))
  }

  test("introspected parquet footer binds a matching message") {
    import graft.proto.{PField, PMessage, PType}
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cat-").toString
    Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "name", "score")
      .write.mode("overwrite").parquet(dir)

    val cols = ChCatalog.fromParquet(spark, dir)
    val msg = PMessage("M", Seq(
      PField("id", 1, PType.PInt64),
      PField("name", 2, PType.PString),
      PField("score", 3, PType.PDouble)))
    val binding = SchemaBinder.bind(msg, cols)
    assert(binding.columns.map(_.name) == Seq("id", "name", "score"))
    // transcode over the landed data itself is the identity
    val out = binding.transcode(spark.read.parquet(dir))
    assert(out.orderBy("id").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1L, "x", 1.5), Seq(2L, "y", 2.5)))
  }
}
