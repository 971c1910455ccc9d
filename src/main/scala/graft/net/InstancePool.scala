package graft.net

import java.util.concurrent.ArrayBlockingQueue

/** Strictly-sized pool of reusable instances — SURVEY §2 D12, the
  * reference's `MessageInstancePool` (`message_instance_pool.go:35-96`).
  *
  * Semantics, matched exactly:
  *  - the pool holds `size` pre-created instances and NEVER grows;
  *  - [[get]] blocks until an instance is available (the reference
  *    parks on a `sync.Cond`; the `ArrayBlockingQueue` wait is the
  *    idiomatic JVM spelling of the same monitor discipline) — this is
  *    the point: checkout is ingestion BACKPRESSURE that bounds the
  *    memory held by concurrently-decoding payloads of one type;
  *  - [[release]] of an instance into an already-full pool is an
  *    invariant violation and throws (the reference panics).
  *
  * Where the reference pools `protoreflect.Message` instances and
  * reuses them across `proto.Unmarshal` calls (`ingest_service.go:
  * 87-89` — one checkout per payload, reused for every body in it),
  * the JVM analog pools the decode scratch `Array[Any]` that
  * [[graft.proto.ProtoRows.decodeValuesInto]] fills per body. Tungsten
  * manages row memory once data is inside Spark; this pool exists for
  * the pre-Spark ingest edge, where per-body allocation is the only
  * allocator pressure the JVM doesn't already amortize.
  */
final class InstancePool[T <: AnyRef](size: Int, make: () => T) {
  require(size >= 1, "InstancePool cannot have size less than 1")

  private val pool = new ArrayBlockingQueue[T](size)
  locally { var i = 0; while (i < size) { pool.add(make()); i += 1 } }

  /** Blocks until an instance is free. */
  def get(): T = pool.take()

  /** Returns an instance; throws if the pool is already full (the
    * reference's "invariant error: MessageInstancePool is full upon
    * Release" panic — releasing something never checked out).
    */
  def release(instance: T): Unit =
    if (!pool.offer(instance))
      throw new IllegalStateException(
        "invariant error: InstancePool is full upon release")

  /** Instances currently checked in (for tests/metrics). */
  def available: Int = pool.size()
}

object InstancePool {
  /** The reference's default `message_instance_pool_size`
    * (`clickhouse_table.go:58-59`).
    */
  val DefaultSize = 32
}
