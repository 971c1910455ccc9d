package graft.sources

import graft.SparkSpec
import graft.pipeline.Dedup

import org.apache.spark.sql.functions._

/** The stored inverted char-gram index: landed triple, directory
  * pruning, and row-for-row equivalence with the stateless
  * incremental edit probe (the property that lets q106 share q105's
  * oracle).
  */
class GramIndexLayoutSpec extends SparkSpec {

  test("stored probe == stateless incremental edit near-dup, row for row") {
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf, "documents")
    val hist = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("gramindex-spec-").toString
    GramIndexLayout.write(hist, "text", "doc_id", dir)
    val stored = GramIndexLayout.probe(spark, dir, batch, "text", "doc_id")
      .orderBy("a", "b").collect().map(_.toSeq).toSeq
    val stateless = Dedup
      .incrementalEditNearDups(hist, batch, "text", "doc_id")
      .orderBy("a", "b").collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty, "fixture must produce pairs or the test is vacuous")
    assert(stored == stateless)
    // the layout triple is self-contained
    for (part <- Seq("index", "stats", "docs"))
      assert(spark.read.parquet(s"$dir/$part").count() > 0, part)
  }

  test("append folds a batch into the index; the next probe sees it") {
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf, "documents")
    // three-way split: initial corpus, landed batch, probing batch
    val hist = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
    val b2 = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
    val dir = java.nio.file.Files
      .createTempDirectory("gramindex-append-").toString
    GramIndexLayout.write(hist, "text", "doc_id", dir)
    GramIndexLayout.append(b1, "text", "doc_id", dir)
    val stored = GramIndexLayout.probe(spark, dir, b2, "text", "doc_id")
      .orderBy("a", "b").collect().map(_.toSeq).toSeq
    val stateless = Dedup
      .incrementalEditNearDups(hist.unionAll(b1), b2, "text", "doc_id")
      .orderBy("a", "b").collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty, "fixture must produce pairs across the splits")
    assert(stored == stateless)
  }

  test("small-batch probe takes the lookup path and stays exact") {
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf, "documents")
    val hist = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    // a 3-doc arriving batch: the "is this doc a near-dup" lookup
    // shape, whose gram set is far under LookupGrams
    val batchIds = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select("doc_id").orderBy("doc_id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    val batch = docs.filter(col("doc_id").isin(batchIds: _*))
    val dir = java.nio.file.Files
      .createTempDirectory("gramindex-lookup-").toString
    GramIndexLayout.write(hist, "text", "doc_id", dir)
    val stored = GramIndexLayout.probe(spark, dir, batch, "text", "doc_id")
      .orderBy("a", "b").collect().map(_.toSeq).toSeq
    val stateless = Dedup
      .incrementalEditNearDups(hist, batch, "text", "doc_id")
      .orderBy("a", "b").collect().map(_.toSeq).toSeq
    assert(stored == stateless) // exactness holds on the lookup path
  }

  test("bucket predicate prunes at the directory level") {
    val dir = java.nio.file.Files
      .createTempDirectory("gramindex-prune-").toString
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    GramIndexLayout.write(docs, "text", "doc_id", dir)
    val filtered = spark.read.parquet(s"$dir/index")
      .filter(col("bucket").isin(0, 1))
    // collect(), not count(): collect executes THIS dataset's own
    // queryExecution (count builds a separate aggregate plan), so the
    // scan metrics below are the executed scan's
    filtered.collect()
    val scans = filtered.queryExecution.executedPlan.toString
    assert(scans.contains("PartitionFilters") && scans.contains("bucket"),
      s"bucket predicate must prune partitions, not filter rows:\n$scans")
    // the executed scan reads only the probed buckets' files (unwrap
    // AQE to reach the final physical plan's scan node)
    val physical = filtered.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val numFiles = physical.collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    val all = spark.read.parquet(s"$dir/index").inputFiles.length
    assert(numFiles > 0 && numFiles < all,
      s"pruned scan read $numFiles of $all files - expected a strict subset")
  }
}
