package graft.net

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.proto.PType._
import graft.proto.{PField, PMessage, ProtoRows}
import org.scalatest.funsuite.AnyFunSuite

/** D12 — the reference's strictly-sized `MessageInstancePool`
  * (`message_instance_pool.go:35-96`): blocking Get, invariant-checked
  * Release, and the decode-scratch reuse it exists for
  * (`ingest_service.go:87-96`).
  */
class InstancePoolSpec extends AnyFunSuite {

  test("get blocks until a release frees an instance") {
    val pool = new InstancePool[Array[Any]](1, () => new Array[Any](2))
    val held = pool.get()
    assert(pool.available === 0)
    val got = new java.util.concurrent.CompletableFuture[Array[Any]]()
    val waiter = new Thread(() => got.complete(pool.get()))
    waiter.start()
    Thread.sleep(100)
    assert(!got.isDone, "get() must park while the pool is empty")
    pool.release(held)
    assert(got.get(5, TimeUnit.SECONDS) eq held,
      "the released instance is the one the waiter wakes with")
    waiter.join()
  }

  test("release into a full pool is an invariant error (reference panic)") {
    val pool = new InstancePool[Array[Any]](1, () => new Array[Any](2))
    val e = intercept[IllegalStateException] {
      pool.release(new Array[Any](2)) // never checked out
    }
    assert(e.getMessage.contains("invariant"))
  }

  test("size strictly bounds concurrent holders (decode backpressure)") {
    val size = 4
    val pool = new InstancePool[Array[Any]](size, () => new Array[Any](1))
    val inUse = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val done = new CountDownLatch(32)
    (1 to 32).foreach { _ =>
      new Thread(() => {
        val inst = pool.get()
        val now = inUse.incrementAndGet()
        maxSeen.accumulateAndGet(now, Math.max)
        Thread.sleep(5)
        inUse.decrementAndGet()
        pool.release(inst)
        done.countDown()
      }).start()
    }
    assert(done.await(30, TimeUnit.SECONDS))
    assert(maxSeen.get() <= size,
      s"held=${maxSeen.get()} must never exceed pool size $size")
    assert(pool.available === size)
  }

  test("decodeValuesInto clears the reused scratch — no value bleed") {
    val msg = PMessage("M", Seq(
      PField("a", 1, PInt64), PField("s", 2, PString),
      PField("tags", 3, PString, repeated = true)))
    val full = ProtoRows.encodeValues(msg, Seq(7L, "seven", Seq("x", "y")))
    val empty = Array.emptyByteArray // proto3 all-defaults body
    val buf = new Array[Any](msg.fields.length)
    ProtoRows.decodeValuesInto(msg, full, buf)
    assert(buf.toSeq == Seq(7L, "seven", Seq("x", "y")))
    // same buffer, all-default body: every field must be the zero
    // value, nothing left over from the previous decode
    ProtoRows.decodeValuesInto(msg, empty, buf)
    assert(buf.toSeq == Seq(0L, "", Seq.empty))
    val bad = new Array[Any](msg.fields.length + 1)
    intercept[IllegalArgumentException] {
      ProtoRows.decodeValuesInto(msg, full, bad)
    }
  }
}
