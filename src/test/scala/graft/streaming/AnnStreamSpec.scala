package graft.streaming

import graft.SparkSpec
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** Streaming incremental ANN: micro-batches of arriving vectors probe
  * the history-trained index, and each epoch's output is row-for-row
  * the batch API's answer for the same rows.
  */
class AnnStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("per-epoch stream output equals the batch ivfAppendTopK answer") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val history = emb.filter(col("vec_id") % 3 =!= 0)
    // two arriving micro-batches, drawn from the held-out slice
    val arrivals = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(arrivals.length >= 4, "fixture too small")
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.Map.empty[Long, Array[String]]
    val sq = AnnStream.start(history, ms.toDF()
        .toDF("vec_id", "embedding"), "vec_id", "embedding", k = 3) {
      (df, id) => got(id) = df.orderBy(col("query_id"), col("rank"))
        .collect().map(_.mkString("|"))
    }
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    assert(got.size == 2, s"expected 2 epochs, saw ${got.keys.toList}")

    // batch-API parity per epoch: same rows, same index, same answer
    def expectFor(rows: Array[(Long, Seq[Double])]): Array[String] = {
      val batch = rows.toSeq.toDF("vec_id", "embedding")
      Similarity.ivfAppendTopK(history, batch, "vec_id", "embedding",
          _ => lit(true), k = 3)
        .orderBy(col("query_id"), col("rank"))
        .collect().map(_.mkString("|"))
    }
    val epochs = got.keys.toSeq.sorted
    assert(got(epochs.head).sameElements(expectFor(b1)),
      "epoch 1 diverged from the batch API")
    assert(got(epochs.last).sameElements(expectFor(b2)),
      "epoch 2 diverged from the batch API")
    // sanity: every arriving vector got a full top-3
    assert(got(epochs.head).length == b1.length * 3)
    assert(got(epochs.last).length == b2.length * 3)
  }
}
