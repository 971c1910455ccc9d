package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** The sketch twin of q56's exact top-K: at 100 TB the exact
  * (type, user) histogram may itself be too wide to rank cheaply;
  * `count_min_sketch` builds a fixed-size mergeable frequency sketch
  * map-side (same aggregate shape as HLL in CardinalitySpec). CMS
  * guarantees: estimate >= true count always, and overshoot <=
  * eps * N with probability 1 - delta. This spec pins both bounds and
  * that heavy hitters stay separable from the tail.
  */
class FrequentItemsSpec extends SparkSpec {

  test("count_min_sketch bounds: never undercounts, overshoot within eps*N") {
    import spark.implicits._
    val eps = 0.001
    val conf = 0.99
    // skewed stream: user 7 is a heavy hitter, the rest uniform tail
    val n = 100000
    val df = spark.range(0, n)
      .select(when(col("id") % 4 === 0, 7L)
        .otherwise(col("id") % 997).as("user_id"))
    val sketchBytes = df.agg(
      count_min_sketch(col("user_id"), lit(eps), lit(conf), lit(42))
        .as("cms")).head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))

    val truth = df.groupBy("user_id").count().as[(Long, Long)]
      .collect().toMap
    truth.foreach { case (u, c) =>
      val est = cms.estimateCount(u)
      assert(est >= c, s"user $u undercounted: $est < $c")
      assert(est <= c + (eps * n).ceil.toLong,
        s"user $u overshoot: $est vs $c (bound ${eps * n})")
    }
    // the heavy hitter is unambiguous through the sketch
    val hot = cms.estimateCount(7L)
    val maxTail = truth.collect { case (u, c) if u != 7L => cms.estimateCount(u) }.max
    assert(hot > 10 * maxTail)
  }
}
