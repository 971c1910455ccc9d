package graft.types

import graft.types.ChPrim._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ChTypeSpec extends AnyFunSuite {

  test("integer widths, signed and unsigned") {
    assert(ChType.parse("Int8").spark == ByteType)
    assert(ChType.parse("Int16").spark == ShortType)
    assert(ChType.parse("Int32").spark == IntegerType)
    assert(ChType.parse("Int64").spark == LongType)
    // unsigned widen one step; UInt64 stays Long (documented wraparound)
    assert(ChType.parse("UInt8").spark == ShortType)
    assert(ChType.parse("UInt16").spark == IntegerType)
    assert(ChType.parse("UInt32").spark == LongType)
    assert(ChType.parse("UInt64").spark == LongType)
  }

  test("floats, string, bool, uuid, dates") {
    assert(ChType.parse("Float32").spark == FloatType)
    assert(ChType.parse("Float64").spark == DoubleType)
    assert(ChType.parse("String").spark == StringType)
    assert(ChType.parse("FixedString(16)").spark == StringType)
    assert(ChType.parse("Bool").spark == BooleanType)
    assert(ChType.parse("UUID").spark == StringType)
    assert(ChType.parse("Date").spark == DateType)
    assert(ChType.parse("Date32").spark == DateType)
  }

  test("decimal and datetime (examples/binance.sql:3,6)") {
    assert(ChType.parse("Decimal(38, 8)").spark == DecimalType(38, 8))
    assert(ChType.parse("DateTime").spark == TimestampType)
    assert(ChType.parse("DateTime('UTC')").spark == TimestampType)
    val dt64 = ChType.parse("DateTime64(3)")
    assert(dt64.spark == TimestampType)
    assert(dt64.prim == ChDateTime(3))
  }

  test("enum with dictionary (examples/example.sql:3)") {
    val e = ChType.parse("Enum('empty' = 0, 'small' = 1, 'big' = 2)")
    assert(e.spark == ByteType)
    assert(e.prim == ChEnum(8, Seq("empty" -> 0, "small" -> 1, "big" -> 2)))
    assert(ChType.parse("Enum16('a'=-5,'b'=300)").prim ==
      ChEnum(16, Seq("a" -> -5, "b" -> 300)))
  }

  test("wrappers: Nullable, LowCardinality, Array, nesting") {
    val n = ChType.parse("Nullable(Int64)")
    assert(n.nullable && n.spark == LongType)
    val lc = ChType.parse("LowCardinality(String)")
    assert(lc.lowCardinality && lc.spark == StringType)
    val a = ChType.parse("Array(String)")
    assert(a.array && a.spark == ArrayType(StringType, containsNull = false))
    val an = ChType.parse("Array(Nullable(String))")
    assert(an.array && an.spark == ArrayType(StringType, containsNull = true))
    val lcn = ChType.parse("LowCardinality(Nullable(String))")
    assert(lcn.nullable && lcn.lowCardinality)
  }

  test("invalid types fail with ParseError") {
    assertThrows[ChType.ParseError](ChType.parse("Array(Array(Int8))"))
    assertThrows[ChType.ParseError](ChType.parse("Nullable(Array(Int8))"))
    assertThrows[ChType.ParseError](ChType.parse("Frobnicate"))
    assertThrows[ChType.ParseError](ChType.parse("Enum8()"))
  }
}
