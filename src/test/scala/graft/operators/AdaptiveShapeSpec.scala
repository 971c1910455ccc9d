package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.util.concurrent.{CountDownLatch, TimeUnit}

/** Pins the session-isolation contract of the measured-size loop shape
  * (VERDICT r17 #2): the derived partition count and the AQE toggle
  * apply to plans the block itself runs, and are INVISIBLE to a
  * concurrent planner on another thread of the same session — the old
  * session-conf set/restore let a streaming microbatch transiently
  * plan a corpus-scale job with partitions=1 and AQE off.
  */
class AdaptiveShapeSpec extends SparkSpec {

  test("inside the block: partitions derived from rows, AQE off") {
    val df = spark.range(1000).toDF("x")
    // 1.5M measured rows at 500k rows/partition => 3 partitions; with
    // AQE off inside the block the post-shuffle count is exact
    AdaptiveShape.withLoopFrame(df, 1500000L) { e =>
      val agg = e.groupBy(col("x") % 7).count()
      assert(agg.rdd.getNumPartitions == 3)
      assert(!agg.queryExecution.executedPlan.toString
        .contains("AdaptiveSparkPlan"))
      assert(e.sparkSession ne spark)
    }
  }

  test("above the gate the session posture applies untouched") {
    val df = spark.range(1000).toDF("x")
    AdaptiveShape.withLoopFrame(df, AdaptiveShape.smallRows + 1) { e =>
      assert(e.sparkSession eq spark)
      val agg = e.groupBy(col("x") % 7).count()
      // session shuffle.partitions = 4 (SparkSpec); no 3-derivation
      assert(agg.rdd.getNumPartitions != 3)
    }
  }

  test("rebind hands results back: values intact, caller session posture") {
    val df = spark.range(100).toDF("x")
    val out = AdaptiveShape.withLoopFrame(df, 10L) { e =>
      AdaptiveShape.rebind(e.groupBy((col("x") % 5).as("k"))
        .agg(count(lit(1)).as("n")), spark)
    }
    assert(out.sparkSession eq spark)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      (0L to 4L).map(k => (k, 20L)).toSet)
    // frames composed ON the rebound result plan under the session
    // posture (no 1-partition leak into downstream tails)
    val tail = out.groupBy(col("n")).count()
    assert(tail.sparkSession eq spark)
  }

  test("a concurrent planner on another thread keeps the session posture") {
    val df = spark.range(1000).toDF("x")
    val inBlock = new CountDownLatch(1)
    val done = new CountDownLatch(1)
    @volatile var otherParts = -1
    @volatile var otherConf: String = null
    @volatile var otherAqe = false
    @volatile var err: Throwable = null
    val other = new Thread(() => {
      try {
        inBlock.await(30, TimeUnit.SECONDS)
        // plans while the loop block is ACTIVE on the main thread
        otherConf = spark.conf.get("spark.sql.shuffle.partitions")
        val agg = df.groupBy(col("x") % 7).count()
        otherAqe = agg.queryExecution.executedPlan.toString
          .contains("AdaptiveSparkPlan")
        otherParts = agg.rdd.getNumPartitions
      } catch { case t: Throwable => err = t }
      finally done.countDown()
    })
    other.start()
    AdaptiveShape.withLoopFrame(df, 1500000L) { e =>
      val agg = e.groupBy(col("x") % 7).count()
      assert(agg.rdd.getNumPartitions == 3)
      inBlock.countDown()
      assert(done.await(60, TimeUnit.SECONDS), "concurrent planner hung")
    }
    if (err != null) throw err
    // the session was never mutated: the concurrent plan kept AQE and
    // did not inherit the loop's 3-partition derivation
    assert(otherConf == "4", s"session conf observed as $otherConf")
    assert(otherAqe, "concurrent planner lost the session's AQE")
    assert(otherParts != 3,
      s"concurrent planner inherited the loop shape ($otherParts)")
  }

  test("session conf is identical before and after the block") {
    val df = spark.range(10).toDF("x")
    val before = (spark.conf.get("spark.sql.shuffle.partitions"),
      spark.conf.get("spark.sql.adaptive.enabled"))
    AdaptiveShape.withLoopFrame(df, 1L) { _ => () }
    val after = (spark.conf.get("spark.sql.shuffle.partitions"),
      spark.conf.get("spark.sql.adaptive.enabled"))
    assert(before == after)
  }
}
