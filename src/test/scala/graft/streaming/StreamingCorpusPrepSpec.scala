package graft.streaming

import graft.SparkSpec
import graft.pipeline.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The corpus-prep operators (quality score, language-ID, md5-bucket
  * mixture sampling) are stateless per-row transforms, so they lift
  * unchanged onto a Structured Stream — the ingest-time "filter the
  * crawl as it lands" path. This spec pins that the STREAMING output
  * is row-identical to the batch computation on the same data: same
  * kernels, same plan fragments, no stream-specific drift.
  */
class StreamingCorpusPrepSpec extends SparkSpec {

  // the q49/q69 shapes: score + lang from the token array, an
  // md5-bucket mixture test against a per-lang rate
  private def prep(df: DataFrame): DataFrame = {
    val ws = TextOps.words(col("text"))
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long") % 100
    val rate = when(col("lang") === "en", 100)
      .when(col("lang").isin("de", "es"), 50).otherwise(25)
    df.withColumn("score", TextOps.qualityScoreFast(ws))
      .withColumn("lang_pred", TextOps.langIdFast(ws))
      .filter(col("score") >= 0.3)
      .withColumn("in_mix", bucket < rate)
      .select("doc_id", "lang", "lang_pred", "score", "in_mix")
  }

  test("streaming corpus-prep output is row-identical to the batch form") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSeq
    assert(data.nonEmpty)

    val ms = MemoryStream[(Long, String, String)]
    val q = prep(ms.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("memory").queryName("prep").outputMode("append")
      .start()
    try {
      // feed in two micro-batches to cross a batch boundary
      val (b1, b2) = data.splitAt(data.length / 2)
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()

      val streamed = spark.table("prep").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
      val batch = prep(data.toDF("doc_id", "text", "lang")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
      assert(batch.nonEmpty && batch.exists(_._5) && batch.exists(!_._5),
        "fixture should exercise both mixture outcomes")
      assert(streamed.toSeq == batch.toSeq,
        "streaming corpus-prep diverged from the batch computation")
    } finally q.stop()
  }

  test("streaming PII scrub is row-identical to the batch redaction") {
    // q102's detect/redact chain is stateless per-row too — the
    // redact-as-it-lands path. Fixture injects PII shapes since the
    // corpus is digit-free.
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def scrub(df: DataFrame): DataFrame = df
      .withColumn("hits", TextOps.PiiPatterns.map { case (n, _) =>
        TextOps.piiHits(col("text"), n) }.reduce(_ + _))
      .withColumn("red", TextOps.piiRedact(col("text")))
      .select("doc_id", "hits", "red")
    val data = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .map { case (id, t) =>
        (id, if (id % 3 == 0) s"$t mail a$id@ex.org ip 10.0.0.${id % 250 + 1}"
             else t)
      }
    val ms = MemoryStream[(Long, String)]
    val q = scrub(ms.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("piiscrub")
      .outputMode("append").start()
    try {
      val (b1, b2) = data.splitAt(data.length / 2)
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("piiscrub").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(_._1)
      val batch = scrub(data.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(_._1)
      assert(batch.exists(_._2 > 0), "fixture should contain PII hits")
      assert(streamed.toSeq == batch.toSeq,
        "streaming PII scrub diverged from the batch computation")
    } finally q.stop()
  }
}
