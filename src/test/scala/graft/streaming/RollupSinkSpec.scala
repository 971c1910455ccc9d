package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** RollupSink contract: merge-on-read equals a batch recompute over
  * everything landed, batch replay never double-counts, compaction
  * preserves results and new parts keep landing after it.
  */
class RollupSinkSpec extends SparkSpec {

  private val keys = Seq("k")
  private val values = Seq("cents")

  private def batch(rows: (String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "cents")
  }

  private def rollup(dir: String): Map[String, (Long, Long)] =
    RollupSink.read(spark, dir, keys, values).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("merge-on-read == batch recompute; replay idempotent; compaction stable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup-")
      .resolve("t").toString
    val b0 = batch(("a", 100L), ("a", 50L), ("b", 10L))
    val b1 = batch(("a", 25L), ("c", 7L))
    val b2 = batch(("b", 90L), ("c", 3L))
    RollupSink.sinkBatch(b0, 0L, keys, values, dir)
    RollupSink.sinkBatch(b1, 1L, keys, values, dir)
    RollupSink.sinkBatch(b2, 2L, keys, values, dir)
    val expected = Map("a" -> (3L, 175L), "b" -> (2L, 100L), "c" -> (2L, 10L))
    assert(rollup(dir) == expected)

    // a crash-replay of batch 1 overwrites its own part — no double count
    RollupSink.sinkBatch(b1, 1L, keys, values, dir)
    assert(rollup(dir) == expected, "replayed batch double-counted")

    // background merge: same answer from one folded part
    RollupSink.compact(spark, dir, keys, values)
    assert(rollup(dir) == expected, "compaction changed the rollup")
    val parts = spark.read.parquet(dir).select("p_batch").distinct().count()
    assert(parts == 1L, "compaction left multiple parts")

    // parts keep landing after compaction
    RollupSink.sinkBatch(batch(("a", 1L)), 3L, keys, values, dir)
    assert(rollup(dir) == Map(
      "a" -> (4L, 176L), "b" -> (2L, 100L), "c" -> (2L, 10L)))
  }

  test("rollup maintained by a live stream equals the batch aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup-stream-")
      .resolve("t").toString
    val ms = MemoryStream[(String, Long)]
    val q = ms.toDF().toDF("k", "cents")
      .writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        RollupSink.sinkBatch(df, id, keys, values, dir)
      }
      .start()
    try {
      ms.addData(("a", 10L), ("b", 5L))
      q.processAllAvailable()
      ms.addData(("a", 7L), ("c", 1L))
      q.processAllAvailable()
      assert(rollup(dir) == Map(
        "a" -> (2L, 17L), "b" -> (1L, 5L), "c" -> (1L, 1L)))
    } finally q.stop()
  }
}
