package graft.sources

import graft.SparkSpec
import graft.pipeline.Similarity

import org.apache.spark.sql.functions._

/** Stored IVF cell index: row-for-row equivalence with the stateless
  * incremental probe (q108 shares q99's oracle) and directory-level
  * pruning of the cells table.
  */
class CellIndexLayoutSpec extends SparkSpec {

  test("stored probe == stateless ivfAppendTopK, row for row") {
    val sf = "/root/testdata/sf0.01"
    val emb = graft.Tables(spark, sf, "embeddings")
    val hist = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("cellindex-spec-").toString
    CellIndexLayout.write(hist, "vec_id", "embedding", dir)
    val stored = CellIndexLayout
      .probe(spark, dir, batch, "vec_id", "embedding", _ < 30, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val stateless = Similarity
      .ivfAppendTopK(hist, batch, "vec_id", "embedding", _ < 30, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty)
    assert(stored == stateless)
    // pruning: a single-cell predicate reads a strict subset of files
    val filtered = spark.read.parquet(s"$dir/cells")
      .filter(col("cell").isin(
        spark.read.parquet(s"$dir/centroids").orderBy("cid")
          .limit(1).collect()(0).getLong(0)))
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
    val all = spark.read.parquet(s"$dir/cells").inputFiles.length
    assert(numFiles > 0 && numFiles < all,
      s"pruned scan read $numFiles of $all files - expected a strict subset")
  }

  test("append adds vectors under the FROZEN quantizer (IVF add semantics)") {
    val sf = "/root/testdata/sf0.01"
    val emb = graft.Tables(spark, sf, "embeddings")
    val h1 = emb.filter(col("vec_id") % 3 === 1)
    val h2 = emb.filter(col("vec_id") % 3 === 2)
    val b = emb.filter(col("vec_id") % 3 === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("cellindex-append-").toString
    CellIndexLayout.write(h1, "vec_id", "embedding", dir)
    CellIndexLayout.append(h2, "vec_id", "embedding", dir)
    val stored = CellIndexLayout
      .probe(spark, dir, b, "vec_id", "embedding", _ < 30, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    // the pinnable truth: ivfSearch with the STORED (h1-trained)
    // centroids over the grown corpus — append never retrains, like
    // FAISS add after train
    val cents = spark.read.parquet(s"$dir/centroids").orderBy("cid")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val expected = Similarity.ivfSearch(
        h1.unionAll(h2).unionAll(b).select(col("vec_id"), col("embedding")),
        b.filter(col("vec_id") < 30), cents, "vec_id", "embedding",
        k = 5, nprobe = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty)
    assert(stored == expected)
  }
}
