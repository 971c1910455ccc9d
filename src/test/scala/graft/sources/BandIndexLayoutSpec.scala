package graft.sources

import graft.SparkSpec
import graft.pipeline.Dedup

import org.apache.spark.sql.functions._

/** Stored MinHash band index: row-for-row equivalence with the
  * stateless incremental probe (the property that lets q107 share
  * q76's oracle) and directory-level pruning.
  */
class BandIndexLayoutSpec extends SparkSpec {

  test("stored probe == stateless incremental MinHash, row for row") {
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf, "documents")
    val hist = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("bandindex-spec-").toString
    BandIndexLayout.write(hist, "text", "doc_id", dir)
    val stored = BandIndexLayout
      .probe(spark, dir, batch, "text", "doc_id", threshold = 0.5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val stateless = Dedup
      .incrementalMinhash(hist, batch, "text", "doc_id", threshold = 0.5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty, "fixture must produce matches or the test is vacuous")
    assert(stored == stateless)
    // pruning: the probe's partition predicate reads a strict subset
    // of the index's bucket directories when given few band keys
    val filtered = spark.read.parquet(s"$dir/index")
      .filter(col("pb").isin(0, 1))
    filtered.collect()
    val physical = filtered.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val numFiles = physical.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
    val all = spark.read.parquet(s"$dir/index").inputFiles.length
    assert(numFiles > 0 && numFiles < all,
      s"pruned scan read $numFiles of $all files - expected a strict subset")
  }

  test("append folds a batch into the band index; the next probe sees it") {
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf, "documents")
    val hist = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
    val b2 = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
    val dir = java.nio.file.Files
      .createTempDirectory("bandindex-append-").toString
    BandIndexLayout.write(hist, "text", "doc_id", dir)
    BandIndexLayout.append(b1, "text", "doc_id", dir)
    val stored = BandIndexLayout
      .probe(spark, dir, b2, "text", "doc_id", threshold = 0.5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val stateless = Dedup
      .incrementalMinhash(hist.unionAll(b1), b2, "text", "doc_id",
        threshold = 0.5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty)
    assert(stored == stateless)
  }
}
