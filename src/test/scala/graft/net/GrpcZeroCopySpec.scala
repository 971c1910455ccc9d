package graft.net

import org.scalatest.funsuite.AnyFunSuite

/** The zero-copy send-path contract (VERDICT r13 #4): every per-message
  * gRPC write composes `header ++ payload` with the payload array
  * WRAPPED, never copied — the remaining per-message cost is the
  * 5-byte header and wrapper nodes, independent of payload size. The
  * proof is aliasing: bytes mutated in the source array after
  * composition must be visible through the composed buffer (a copying
  * path would snapshot them), and the composite must expose exactly
  * the wrapped region with no size-dependent backing reallocation.
  */
class GrpcZeroCopySpec extends AnyFunSuite {

  test("composeFrame wraps the payload array — mutation after " +
      "composition is visible through the buffer (no payload copy)") {
    val payload = Array.tabulate[Byte](1 << 20)(i => (i % 251).toByte)
    val buf = GrpcWire.composeFrame(payload)
    try {
      assert(buf.readableBytes() == 5 + payload.length)
      // header: uncompressed flag + big-endian length
      assert(buf.getByte(0) == 0)
      assert(buf.getInt(1) == payload.length)
      // the aliasing proof: flip source bytes AFTER composition
      val probe = Seq(0, 12345, payload.length - 1)
      probe.foreach { i =>
        payload(i) = (payload(i) ^ 0x5a).toByte
        assert(buf.getByte(5 + i) == payload(i),
          s"payload byte $i was copied, not wrapped")
      }
    } finally { buf.release(); () }
  }

  test("composeFrame allocates only the fixed header per message — " +
      "composite components are the 5-byte header and the payload " +
      "array itself, at any payload size") {
    for (size <- Seq(1, 256, 64 * 1024, 1 << 20)) {
      val payload = new Array[Byte](size)
      val buf = GrpcWire.composeFrame(payload)
      try {
        buf match {
          case c: io.netty.buffer.CompositeByteBuf =>
            assert(c.numComponents() == 2,
              s"expected header+payload components at size $size")
            // component 1 IS the payload array (identity, not equality)
            val comp = c.internalComponent(1)
            assert(comp.hasArray && (comp.array() eq payload),
              s"payload component must be the caller's array at $size")
          case other =>
            // netty collapses the 2-element wrap only if one side is
            // empty — never the case with a 5-byte header + payload
            fail(s"expected a composite buffer, got ${other.getClass}")
        }
      } finally { buf.release(); () }
    }
  }
}
