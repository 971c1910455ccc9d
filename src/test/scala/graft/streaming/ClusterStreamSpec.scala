package graft.streaming

import graft.SparkSpec
import graft.pipeline.Dedup
import graft.sources.{BandIndexLayout, LabelStoreLayout}

import org.apache.spark.sql.functions._

/** Continuous clustering loop: stream micro-batches through
  * probe-fold-append and the LANDED labeling must equal a
  * from-scratch q55 run over everything that ever arrived; each
  * epoch's pairs must equal the batch API's answer for the corpus as
  * it stood when that epoch ran.
  */
class ClusterStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streamed folds reach the from-scratch q55 labeling; epochs match the batch API") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val history = docs.filter(col("doc_id") % 3 =!= 0)
    val arrivals = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(arrivals.length >= 4, "fixture too small")
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)

    val bandDir = java.nio.file.Files
      .createTempDirectory("clusterstream-bands-").toString
    val labelDir = java.nio.file.Files
      .createTempDirectory("clusterstream-labels-").toString
    BandIndexLayout.write(history, "text", "doc_id", bandDir)
    LabelStoreLayout.write(
      Dedup.connectedComponents(
        Dedup.minhashNearDups(history, "text", "doc_id", 0.5), "a", "b"),
      labelDir)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Array[String]]
    val sq = ClusterStream.start(bandDir, labelDir,
        ms.toDF().toDF("doc_id", "text"), "text", "doc_id", 0.5) {
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

    // per-epoch pair parity vs the batch API at the corpus state the
    // epoch observed: epoch 1 probes history, epoch 2 history ∪ b1
    def pairsFor(hist: org.apache.spark.sql.DataFrame,
        rows: Array[(Long, String)]): Array[String] =
      Dedup.incrementalMinhashPairs(hist,
          rows.toSeq.toDF("doc_id", "text"), "text", "doc_id", 0.5)
        .orderBy(col("a"), col("b")).collect().map(_.mkString("|"))
    val epochs = got.keys.toSeq.sorted
    val exp1 = pairsFor(history, b1)
    if (!got(epochs.head).sameElements(exp1)) {
      System.err.println(s"[debug] epoch1 got ${got(epochs.head).length}: " +
        got(epochs.head).mkString(", "))
      System.err.println(s"[debug] epoch1 exp ${exp1.length}: " +
        exp1.mkString(", "))
    }
    assert(got(epochs.head).sameElements(exp1),
      "epoch 1 pairs diverged from the batch API")
    assert(got(epochs.last).sameElements(
      pairsFor(history.select(col("doc_id").cast("long"), col("text"))
        .union(b1.toSeq.toDF("doc_id", "text")), b2)),
      "epoch 2 pairs diverged from the batch API")

    // the landed labeling equals a from-scratch q55 run over the
    // full corpus (history + both batches)
    val full = Dedup.connectedComponents(
        Dedup.minhashNearDups(docs, "text", "doc_id", 0.5), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val landed = LabelStoreLayout.read(spark, labelDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.nonEmpty, "fixture yields no clusters — check is vacuous")
    assert(landed == full,
      "landed labeling diverged from the from-scratch run")
  }

  test("a replayed epoch id is skipped whole (at-least-once discipline)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val history = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").cast("long"), col("text"))
    val bandDir = java.nio.file.Files
      .createTempDirectory("clusterstream-replay-bands-").toString
    val labelDir = java.nio.file.Files
      .createTempDirectory("clusterstream-replay-labels-").toString
    BandIndexLayout.write(history, "text", "doc_id", bandDir)
    LabelStoreLayout.write(
      Dedup.connectedComponents(
        Dedup.minhashNearDups(history, "text", "doc_id", 0.5), "a", "b"),
      labelDir)
    var sinkCalls = 0
    def run(): Boolean = ClusterStream.applyEpoch(bandDir, labelDir,
      batch, 7L, "s1", 0.5, "text", "doc_id") { (_, _) => sinkCalls += 1 }
    assert(run(), "first delivery of epoch 7 must execute")
    val labelsAfter = LabelStoreLayout.read(spark, labelDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexFiles = spark.read.parquet(s"$bandDir/index").inputFiles.toSet
    assert(!run(), "replayed epoch 7 must be skipped whole")
    assert(sinkCalls == 1, "replay must not re-deliver pairs")
    assert(spark.read.parquet(s"$bandDir/index").inputFiles.toSet
      == indexFiles, "replay must not re-append postings")
    assert(LabelStoreLayout.read(spark, labelDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == labelsAfter)
    // a DIFFERENT streamId over the same store is a fresh namespace
    assert(ClusterStream.applyEpoch(bandDir, labelDir,
      batch.limit(0).union(batch.limit(1)), 7L, "s2", 0.5,
      "text", "doc_id") { (_, _) => () })
  }

  test("probe output is row-identical when the batch's postings already landed") {
    // the crash-window replay shape: append happened, marker did not —
    // the next probe must not self-pair or duplicate rows
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val history = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("clusterstream-window-").toString
    BandIndexLayout.write(history, "text", "doc_id", dir)
    val before = BandIndexLayout
      .probePairs(spark, dir, batch, "text", "doc_id", 0.5)
      .orderBy(col("a"), col("b")).collect().map(_.mkString("|"))
    assert(before.nonEmpty, "fixture must produce pairs")
    BandIndexLayout.append(batch, "text", "doc_id", dir)
    val after = BandIndexLayout
      .probePairs(spark, dir, batch, "text", "doc_id", 0.5)
      .orderBy(col("a"), col("b")).collect().map(_.mkString("|"))
    assert(after.sameElements(before),
      "probe against a store already holding the batch must be row-identical")
  }
}
