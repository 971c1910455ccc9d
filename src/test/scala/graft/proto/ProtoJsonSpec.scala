package graft.proto

import graft.SparkSpec
import graft.queries.TranscodeE2E
import graft.streaming.JsonLines

/** [[ProtoJson]] — the JVM protojson twin of the Spark-side
  * [[JsonLines]] parser: both must agree with each other and with the
  * fixtures' logical values on every line, or the forwarder CLI and
  * the engine's S5 source would drift.
  */
class ProtoJsonSpec extends SparkSpec {

  private val m = TranscodeE2E.message

  test("protojson lines decode to the exact fixture values") {
    TranscodeE2E.fixtures.foreach { f =>
      val got = ProtoJson.parseLine(m, f.protojsonLine)
      val want = f.protoValues
      assert(got.length == want.length)
      got.lazyZip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"field $i of fixture ${f.i}: got $g want $w")
      }
    }
  }

  test("toWire bodies decode identically to the Spark JsonLines twin") {
    import spark.implicits._
    val lines = TranscodeE2E.fixtures.map(_.protojsonLine)
    val viaSpark = JsonLines.parse(spark.createDataset(lines), m)
      .orderBy("value").collect().toSeq
    val viaJvm = ProtoRows.decode(
        spark.createDataset(lines.map(l => ProtoJson.toWire(m, l))), m)
      .orderBy("value").collect().toSeq
    assert(viaSpark == viaJvm)
  }

  test("enum accepts name, numeric string, and bare number; rejects junk") {
    val line = """{"name":"x","type":"BIG","value":1}"""
    assert(ProtoJson.parseLine(m, line)(1) == 2)
    assert(ProtoJson.parseLine(m, """{"type":"1"}""")(1) == 1)
    assert(ProtoJson.parseLine(m, """{"type":2}""")(1) == 2)
    intercept[ProtoJson.JsonDecodeError](
      ProtoJson.parseLine(m, """{"type":"NOPE"}"""))
  }

  test("timestamp offsets and fraction widths parse to the same instant") {
    def ts(s: String) =
      ProtoJson.parseLine(m, s"""{"timestamp":"$s"}""")(2)
        .asInstanceOf[java.sql.Timestamp].toInstant
    val base = java.time.Instant.parse("2021-06-01T12:00:00Z")
    assert(ts("2021-06-01T12:00:00Z") == base)
    assert(ts("2021-06-01T12:00:00.500Z") == base.plusMillis(500))
    assert(ts("2021-06-01T13:00:00+01:00") == base)
    assert(ts("2021-06-01T12:00:00.000000001Z") == base.plusNanos(1))
    intercept[ProtoJson.JsonDecodeError](ts("junk"))
  }

  test("camelCase json_name lookup and absent-field zeros") {
    // 'name' has no underscore, so exercise lookup aliasing on a
    // synthetic two-word field
    val m2 = PMessage("T", Seq(PField("event_count", 1, PType.PInt64)))
    assert(ProtoJson.parseLine(m2, """{"eventCount":"41"}""") == Seq(41L))
    assert(ProtoJson.parseLine(m2, """{"event_count":42}""") == Seq(42L))
    assert(ProtoJson.parseLine(m2, """{}""") == Seq(0L))
    // absent repeated/map land as empty, not null
    val parsed = ProtoJson.parseLine(m, """{"value":"7"}""")
    assert(parsed(4) == Map.empty[Any, Any] && parsed(5) == Seq.empty[Any])
  }

  test("uint64 full range round-trips through the unsigned parse") {
    val m2 = PMessage("U", Seq(PField("v", 1, PType.PUInt64)))
    assert(ProtoJson.parseLine(m2, """{"v":"18446744073709551615"}""") ==
      Seq(-1L)) // uint64 max as the Go-parity bit pattern
  }
}
