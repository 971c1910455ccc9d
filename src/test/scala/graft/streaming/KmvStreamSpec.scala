package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming KMV: after every stream prefix the live sketch equals the
  * batch bottom-k over the same rows, state stays ≤ k hashes per
  * source forever, and the downstream estimate matches q121's.
  */
class KmvStreamSpec extends SparkSpec {

  test("streamed KMV sketch converges to the batch sketch per prefix") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("text"))
      .as[(String, String)].collect()
    assert(docs.length > 50)
    val (b1, b2) = docs.splitAt(docs.length / 2)

    // batch reference: per-source sorted distinct hashes, bottom-64
    def batchSketch(ds: Seq[(String, String)]): Map[String, Seq[Long]] =
      graft.queries.Pipeline.kmvHashProjection(
          ds.toDF("source", "text"))
        .distinct().collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1)
        .map { case (s, hs) =>
          s -> hs.map(_._2).sorted.take(KmvStream.K).toSeq }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val live = scala.collection.mutable.Map.empty[String, Seq[Long]]
    val sq = KmvStream.start(ms.toDF().toDF("source", "text")) { (ds, _) =>
      ds.collect().foreach { case (s, arr) => live(s) = arr.toSeq }
    }
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(live.toMap == batchSketch(b1.toSeq),
        "prefix 1: stream sketch != batch sketch")
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
      val full = batchSketch(docs.toSeq)
      assert(live.toMap == full, "full stream: sketch != batch sketch")
      // state bound: never more than k hashes per source, and within
      // each sketch the array is sorted ascending (the TreeSet order
      // the estimator's .last read relies on)
      live.values.foreach { s =>
        assert(s.length <= KmvStream.K)
        assert(s == s.sorted)
      }
      // the downstream estimate over the emitted rows is q121's
      // formula over the same sketch — exact below k, (k-1)M/h_k at k
      live.foreach { case (_, s) =>
        val est = KmvStream.estimate(s.toArray)
        if (s.length < KmvStream.K) assert(est == s.length.toDouble)
        else assert(est == 63.0 * KmvStream.M / s.last.toDouble)
      }
    } finally sq.stop()
  }

  test("duplicate and out-of-order arrivals leave the sketch unchanged") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("text"))
      .as[(String, String)].collect().take(40)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val live = scala.collection.mutable.Map.empty[String, Seq[Long]]
    val sq = KmvStream.start(ms.toDF().toDF("source", "text")) { (ds, _) =>
      ds.collect().foreach { case (s, arr) => live(s) = arr.toSeq }
    }
    try {
      ms.addData(docs.toIndexedSeq: _*)
      sq.processAllAvailable()
      val once = live.toMap
      // replay the same docs reversed: a set-function sketch must not
      // move (the micro-batch-boundary / at-least-once argument)
      ms.addData(docs.reverse.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(live.toMap == once)
    } finally sq.stop()
  }
}
