package graft.sources

import graft.SparkSpec
import graft.pipeline.Dedup

import org.apache.spark.sql.functions._

/** Stored component labeling: after any sequence of folds the landed
  * table must equal a from-scratch connectedComponents run over ALL
  * pairs ever folded, and a fold must rewrite only the touched pb
  * partitions.
  */
class LabelStoreLayoutSpec extends SparkSpec {

  private def ccMap(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def readMap(dir: String): Map[Long, Long] =
    LabelStoreLayout.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def land(pairs: Seq[(Long, Long)], nBuckets: Int = 8): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("labelstore-spec-").toString
    LabelStoreLayout.write(
      Dedup.connectedComponents(pairs.toDF("a", "b"), "a", "b"),
      dir, nBuckets)
    dir
  }

  test("fold merges across stored components; result == from-scratch CC") {
    import spark.implicits._
    val hist = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val batch = Seq((3L, 10L), (30L, 31L))
    val dir = land(hist)
    LabelStoreLayout.fold(spark, dir, batch.toDF("a", "b"), "a", "b", 8)
    assert(readMap(dir) == ccMap(hist ++ batch))
  }

  test("two successive folds == one from-scratch run over the union") {
    import spark.implicits._
    val hist = Seq((1L, 2L), (10L, 11L), (20L, 21L), (40L, 41L))
    val b1 = Seq((2L, 10L), (50L, 51L))
    val b2 = Seq((11L, 20L), (51L, 40L))
    val dir = land(hist)
    LabelStoreLayout.fold(spark, dir, b1.toDF("a", "b"), "a", "b", 8)
    LabelStoreLayout.fold(spark, dir, b2.toDF("a", "b"), "a", "b", 8)
    assert(readMap(dir) == ccMap(hist ++ b1 ++ b2))
  }

  test("batch of entirely new nodes folds in without touching stored rows") {
    import spark.implicits._
    val hist = Seq((1L, 2L), (10L, 11L))
    val batch = Seq((100L, 101L), (101L, 102L))
    val dir = land(hist)
    LabelStoreLayout.fold(spark, dir, batch.toDF("a", "b"), "a", "b", 8)
    assert(readMap(dir) == ccMap(hist ++ batch))
  }

  test("empty batch leaves the store byte-identical") {
    import spark.implicits._
    val hist = Seq((1L, 2L), (10L, 11L))
    val dir = land(hist)
    val before = spark.read.parquet(s"$dir/labels").inputFiles.toSet
    LabelStoreLayout.fold(spark, dir,
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b", 8)
    assert(spark.read.parquet(s"$dir/labels").inputFiles.toSet == before)
    assert(readMap(dir) == ccMap(hist))
  }

  test("untouched partitions are not rewritten by a fold") {
    import spark.implicits._
    // canons land in pb = canon % 8: component {1,2} -> pb 1,
    // {10,11} -> pb 2, {20,21} -> pb 4. Batch touches only pb 1.
    val hist = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val dir = land(hist)
    val files = (pb: Int) => {
      val d = new java.io.File(s"$dir/labels/pb=$pb")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toSet
    }
    val pb2Before = files(2); val pb4Before = files(4)
    LabelStoreLayout.fold(spark, dir,
      Seq((2L, 60L)).toDF("a", "b"), "a", "b", 8)
    assert(files(2) == pb2Before && files(4) == pb4Before,
      "a fold touching pb 1 must not rewrite pb 2 or pb 4")
    assert(readMap(dir) == ccMap(hist ++ Seq((2L, 60L))))
  }

  test("a partition whose components all merged away is removed") {
    import spark.implicits._
    // single component {9, 10}: canon 9 -> pb 1. Batch pair (1, 9)
    // re-canons the whole component to 1 -> pb 1... use canon 9 with
    // merge target canon 16 -> pb 0: component {16,17} + pair (9,16)
    // moves 9,10,16,17 all under canon 9 (min) -> pb 1; pb 0 empties.
    val hist = Seq((9L, 10L), (16L, 17L))
    val dir = land(hist)
    assert(new java.io.File(s"$dir/labels/pb=0").exists())
    LabelStoreLayout.fold(spark, dir,
      Seq((9L, 16L)).toDF("a", "b"), "a", "b", 8)
    assert(!new java.io.File(s"$dir/labels/pb=0").exists(),
      "emptied partition directory must be deleted, not left stale")
    assert(readMap(dir) == ccMap(hist ++ Seq((9L, 16L))))
  }

  test("sf0.01 corpus: stored folds == q110's in-memory incremental run") {
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf, "documents")
    val hist = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val histPairs = Dedup.minhashNearDups(hist, "text", "doc_id", 0.5)
    val dir = java.nio.file.Files
      .createTempDirectory("labelstore-sf-").toString
    LabelStoreLayout.write(
      Dedup.connectedComponents(histPairs, "a", "b"), dir)
    val newPairs = Dedup.incrementalMinhashPairs(hist, batch,
      "text", "doc_id", 0.5)
    LabelStoreLayout.fold(spark, dir, newPairs, "a", "b")
    val full = Dedup.connectedComponents(
        Dedup.minhashNearDups(docs, "text", "doc_id", 0.5), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stored = readMap(dir)
    assert(stored.nonEmpty, "fixture must produce clusters or the test is vacuous")
    assert(stored == full)
  }
}
