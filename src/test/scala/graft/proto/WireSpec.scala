package graft.proto

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class WireSpec extends AnyFunSuite {

  private def rng = new Random(42)

  test("varint round trip (property)") {
    val r = rng
    val cases = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue, 127L, 128L,
      300L) ++ Seq.fill(500)(r.nextLong())
    cases.foreach { v =>
      val w = new Wire.Writer
      w.writeVarint(v)
      val rd = new Wire.Reader(w.toBytes)
      assert(rd.readVarint() == v, s"varint $v")
      assert(!rd.hasNext)
    }
  }

  test("zigzag round trip (property)") {
    val r = rng
    (Seq(0, 1, -1, Int.MinValue, Int.MaxValue) ++ Seq.fill(500)(r.nextInt()))
      .foreach(i => assert(Wire.zigzagDecode32(Wire.zigzagEncode32(i)) == i))
    (Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue) ++
      Seq.fill(500)(r.nextLong()))
      .foreach(l => assert(Wire.zigzagDecode64(Wire.zigzagEncode64(l)) == l))
  }

  test("fixed32/64 round trip (property)") {
    val r = rng
    Seq.fill(200)((r.nextInt(), r.nextLong())).foreach { case (i, l) =>
      val w = new Wire.Writer
      w.writeFixed32(i)
      w.writeFixed64(l)
      val rd = new Wire.Reader(w.toBytes)
      assert(rd.readFixed32() == i)
      assert(rd.readFixed64() == l)
    }
  }

  test("frame split/join round trip (S3, property)") {
    val r = rng
    (0 until 50).foreach { _ =>
      val msgs = Seq.fill(r.nextInt(20))(
        Array.fill[Byte](r.nextInt(200))(r.nextInt().toByte))
      val back = Wire.splitFrames(Wire.joinFrames(msgs))
      assert(back.length == msgs.length)
      back.zip(msgs).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
  }

  test("truncated input raises MalformedProto") {
    val w = new Wire.Writer
    w.writeBytes(Array.fill[Byte](10)(7))
    val whole = w.toBytes
    assertThrows[Wire.MalformedProto](
      new Wire.Reader(whole.dropRight(1)).readBytes())
    assertThrows[Wire.MalformedProto](
      new Wire.Reader(Array[Byte](0x80.toByte)).readVarint())
    assertThrows[Wire.MalformedProto](Wire.splitFrames(whole.dropRight(2)))
  }
}
