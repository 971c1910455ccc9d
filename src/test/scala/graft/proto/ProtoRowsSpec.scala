package graft.proto

import graft.proto.PType._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp
import java.time.Instant
import scala.util.Random

class ProtoRowsSpec extends AnyFunSuite {

  // examples/example.proto:12-21 shape (enum, timestamp, map, repeated)
  val example: PMessage = PMessage(
    "ExampleMessage",
    Seq(
      PField("name", 1, PString),
      PField("type", 2, PEnum("MessageType",
        Seq("EMPTY" -> 0, "SMALL" -> 1, "BIG" -> 2))),
      PField("timestamp", 3, PMessageT(PType.Timestamp)),
      PField("value", 4, PInt64),
      PField("tags", 5, PString, mapOf = Some((PString, PString))),
      PField("labels", 6, PString, repeated = true)),
    bristleTable = Some("default.example_table"))

  test("scalar round trip all kinds (property)") {
    val allKinds = PMessage("AllKinds", Seq(
      PField("d", 1, PDouble), PField("f", 2, PFloat),
      PField("i32", 3, PInt32), PField("i64", 4, PInt64),
      PField("u32", 5, PUInt32), PField("u64", 6, PUInt64),
      PField("s32", 7, PSInt32), PField("s64", 8, PSInt64),
      PField("f32", 9, PFixed32), PField("f64", 10, PFixed64),
      PField("sf32", 11, PSFixed32), PField("sf64", 12, PSFixed64),
      PField("b", 13, PBool), PField("s", 14, PString)))
    val r = new Random(42)
    (0 until 300).foreach { _ =>
      val (i32, i64, u32, u64) = (r.nextInt(), r.nextLong(), r.nextInt(), r.nextLong())
      val vals: Seq[Any] = Seq(r.nextDouble(), r.nextFloat(), i32, i64,
        u32.toLong & 0xffffffffL, u64, i32, i64,
        u32.toLong & 0xffffffffL, u64, i32, i64, r.nextBoolean(),
        r.alphanumeric.take(r.nextInt(20)).mkString + "é☃") // multi-byte UTF-8
      val bytes = ProtoRows.encodeValues(allKinds, vals)
      val back = ProtoRows.decodeValues(allKinds, bytes).toSeq
      assert(back == vals)
    }
  }

  test("unset fields decode to proto3 zero values (parity, SURVEY §1.3)") {
    val vals = ProtoRows.decodeValues(example, Array.emptyByteArray).toSeq
    assert(vals(0) == "")
    assert(vals(1) == 0) // EMPTY
    assert(vals(2) == Timestamp.from(Instant.EPOCH)) // epoch, never null
    assert(vals(3) == 0L)
    assert(vals(4) == Map.empty)
    assert(vals(5) == Seq.empty)
  }

  test("example message round trip with map and repeated") {
    val ts = Timestamp.from(Instant.parse("2021-06-01T12:34:56.789Z"))
    val vals: Seq[Any] = Seq("hello", 2, ts, -42L,
      Map("a" -> "1", "b" -> "2"), Seq("x", "y", "z"))
    val bytes = ProtoRows.encodeValues(example, vals)
    val back = ProtoRows.decodeValues(example, bytes).toSeq
    assert(back == vals)
  }

  test("timestamp nanos floor to micros (Spark TimestampType)") {
    val w = new Wire.Writer
    w.writeTag(1, 0); w.writeVarint(12L)
    w.writeTag(2, 0); w.writeVarint(123456789L) // nanos
    val msg = new Wire.Writer
    msg.writeTag(3, 2); msg.writeBytes(w.toBytes)
    val vals = ProtoRows.decodeValues(example, msg.toBytes)
    assert(vals(2) == Timestamp.from(Instant.ofEpochSecond(12, 123456789)))
  }

  test("last scalar wins; unknown fields skipped; packed accepted") {
    val m = PMessage("M", Seq(
      PField("a", 1, PInt32), PField("r", 2, PInt32, repeated = true)))
    val w = new Wire.Writer
    w.writeTag(1, 0); w.writeVarint(1) // a = 1
    w.writeTag(9, 2); w.writeBytes("junk".getBytes) // unknown field
    w.writeTag(1, 0); w.writeVarint(7) // a = 7 (last wins)
    // r packed: [3, 4, 5]
    val packed = new Wire.Writer
    packed.writeVarint(3); packed.writeVarint(4); packed.writeVarint(5)
    w.writeTag(2, 2); w.writeBytes(packed.toBytes)
    w.writeTag(2, 0); w.writeVarint(6) // r unpacked continuation
    val vals = ProtoRows.decodeValues(m, w.toBytes)
    assert(vals(0) == 7)
    assert(vals(1) == Seq(3, 4, 5, 6))
  }

  test("malformed body raises (→ whole-batch TRANSCODE_ERR parity)") {
    val m = PMessage("M", Seq(PField("s", 1, PString)))
    val w = new Wire.Writer
    w.writeTag(1, 2); w.writeVarint(100) // claims 100 bytes, has none
    assertThrows[Wire.MalformedProto](ProtoRows.decodeValues(m, w.toBytes))
  }

  test("proto3 zero-skip emission round-trips zeros") {
    val vals: Seq[Any] = Seq("", 0, Timestamp.from(Instant.EPOCH), 0L,
      Map.empty[Any, Any], Seq.empty[Any])
    val bytes = ProtoRows.encodeValues(example, vals)
    assert(bytes.isEmpty) // nothing on the wire
    assert(ProtoRows.decodeValues(example, bytes).toSeq == vals)
  }

  test("known field with WRONG wire type is skipped, later fields survive") {
    val m = PMessage("M", Seq(
      PField("s", 1, PString), PField("v", 2, PInt64)))
    val w = new Wire.Writer
    // field 2 declared varint but encoded as fixed32 — must be skipped
    // by the ACTUAL wire type, not decoded by the declared one
    w.writeTag(2, 5)
    w.writeFixed32(0xdeadbeef)
    w.writeTag(1, 2); w.writeBytes("ok".getBytes("UTF-8"))
    w.writeTag(2, 0); w.writeVarint(42)
    val vals = ProtoRows.decodeValues(m, w.toBytes)
    assert(vals(0) == "ok", "reader misaligned after wrong-wire-type field")
    assert(vals(1) == 42L)
  }
}
