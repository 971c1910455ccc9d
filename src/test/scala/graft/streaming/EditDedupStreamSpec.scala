package graft.streaming

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Streaming incremental edit near-dup: micro-batches of arriving
  * docs probe the corpus's positional gram index, and each epoch's
  * pairs are row-identical to the batch API's answer for the same
  * rows.
  */
class EditDedupStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("per-epoch stream output equals the batch incrementalEditNearDups answer") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val history = docs.filter(col("doc_id") % 7 =!= 0)
    val arrivals = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(arrivals.length >= 4, "fixture too small")
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Array[String]]
    val sq = EditDedupStream.start(history,
        ms.toDF().toDF("doc_id", "text"), "text", "doc_id") {
      (df, id) => got(id) = df.orderBy(col("a"), col("b"))
        .collect().map(_.mkString("|"))
    }
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    assert(got.size == 2, s"expected 2 epochs, saw ${got.keys.toList}")

    def expectFor(rows: Array[(Long, String)]): Array[String] =
      Dedup.incrementalEditNearDups(history,
          rows.toSeq.toDF("doc_id", "text"), "text", "doc_id")
        .orderBy(col("a"), col("b"))
        .collect().map(_.mkString("|"))
    val epochs = got.keys.toSeq.sorted
    assert(got(epochs.head).sameElements(expectFor(b1)),
      "epoch 1 diverged from the batch API")
    assert(got(epochs.last).sameElements(expectFor(b2)),
      "epoch 2 diverged from the batch API")
    // the full fixture run finds pairs, so the parity check is not
    // vacuously comparing empty sets across both epochs
    assert(expectFor(arrivals).nonEmpty,
      "fixture yields no pairs — parity check is vacuous")
  }

  test("stored-index stream probes the landed GramIndexLayout identically") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val history = docs.filter(col("doc_id") % 7 =!= 0)
    val dir = java.nio.file.Files
      .createTempDirectory("editstream-stored-").toString
    graft.sources.GramIndexLayout.write(history, "text", "doc_id", dir)
    val arrivals = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Array[String]]
    val sq = EditDedupStream.startStored(dir,
        ms.toDF().toDF("doc_id", "text"), "text", "doc_id") {
      (df, id) => got(id) = df.orderBy(col("a"), col("b"))
        .collect().map(_.mkString("|"))
    }
    try {
      ms.addData(arrivals.toIndexedSeq: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    val expected = Dedup.incrementalEditNearDups(history,
        arrivals.toSeq.toDF("doc_id", "text"), "text", "doc_id")
      .orderBy(col("a"), col("b")).collect().map(_.mkString("|"))
    assert(expected.nonEmpty, "fixture yields no pairs — check is vacuous")
    assert(got.values.toSeq.exists(_.sameElements(expected)),
      "stored-index epoch diverged from the batch API")
  }
}
