package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.Exchange

/** FanOut contract: widens degenerate (fewer-partitions-than-cores)
  * inputs to the session's default parallelism, and — the part that
  * matters at scale — is a strict no-op on healthy inputs: no
  * Exchange is added to a plan that already has enough splits.
  */
class FanOutSpec extends SparkSpec {

  test("single-partition input is widened to default parallelism") {
    val df = spark.range(0, 1000).toDF("id").coalesce(1)
    val out = FanOut(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // same rows, just redistributed
    assert(out.count() == 1000)
  }

  test("already-parallel input passes through with no added Exchange") {
    val target = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 1000, 1, target).toDF("id")
    val out = FanOut(df)
    assert(out.rdd.getNumPartitions == target)
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: Exchange => e
    }
    assert(exchanges.isEmpty, "FanOut must not reshuffle healthy inputs")
  }
}
