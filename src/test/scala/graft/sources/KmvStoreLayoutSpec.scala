package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stored KMV sketches: folds converge to the direct bottom-k build,
  * a replayed fold is a no-op (set-union idempotence), untouched
  * source directories keep their exact files, and the shared estimate
  * finale over the store equals batch q121.
  */
class KmvStoreLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def skMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, Set[Long]] =
    df.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).toSet }

  private def directSketch(docs: org.apache.spark.sql.DataFrame) =
    graft.operators.OrderedScan.bottomK(
      graft.queries.Pipeline.kmvHashes(docs),
      col("source"), col("h"), col("h"),
      expr(s"h div ${1L << 53}L"), 64, "rk")
      .select(col("source"), col("h"))

  test("fold sequence converges to the direct sketch; replay is a no-op; " +
      "estimate over the store equals batch q121") {
    val docs = graft.Tables(spark, sf, "documents")
    val (h1, h2) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0))
    val dir = java.nio.file.Files
      .createTempDirectory("kmvstore-spec-").toString
    KmvStoreLayout.write(directSketch(h1), dir)
    KmvStoreLayout.fold(spark, dir, h2)
    val stored = skMap(KmvStoreLayout.read(spark, dir))
    val direct = skMap(directSketch(docs))
    assert(stored == direct, "folded store != direct bottom-k sketch")
    KmvStoreLayout.fold(spark, dir, h2)
    assert(skMap(KmvStoreLayout.read(spark, dir)) == direct,
      "replayed fold moved the sketch")
    val got = graft.queries.Pipeline.kmvDistinctFrom(
      KmvStoreLayout.read(spark, dir),
      graft.queries.Pipeline.kmvHashes(docs)).collect().map(_.toSeq)
    val expect = graft.queries.Pipeline.q121.fn(spark, sf)
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.sameElements(expect),
      "estimate over the store diverges from batch q121")
  }

  test("the FIRST fold into a never-written store bootstraps it") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("kmvstore-spec-").toString
    KmvStoreLayout.fold(spark, dir,
      Seq(("a", "x y z w v u")).toDF("source", "text"))
    val got = skMap(KmvStoreLayout.read(spark, dir))
    val want = skMap(directSketch(
      Seq(("a", "x y z w v u")).toDF("source", "text")))
    assert(got == want, "bootstrap fold diverges from direct sketch")
  }

  test("a fold carrying a source the store has never seen lands it as a " +
      "new directory") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("kmvstore-spec-").toString
    KmvStoreLayout.write(directSketch(
      Seq(("a", "x y z w v u")).toDF("source", "text")), dir)
    KmvStoreLayout.fold(spark, dir,
      Seq(("c", "f g h i j k l")).toDF("source", "text"))
    val got = skMap(KmvStoreLayout.read(spark, dir))
    val want = skMap(directSketch(
      Seq(("a", "x y z w v u"), ("c", "f g h i j k l"))
        .toDF("source", "text")))
    assert(got == want, "new-source fold diverges from direct sketch")
  }

  test("fold touches only the folded sources' directories") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("kmvstore-spec-").toString
    KmvStoreLayout.write(directSketch(
      Seq(("a", "x y z w v u"), ("b", "p q r s t o"))
        .toDF("source", "text")
        .withColumn("doc_id", lit(1L))), dir)
    def files(s: String): Set[String] = {
      val p = java.nio.file.Paths.get(s"$dir/sketch/source=$s")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(p).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    }
    val bBefore = files("b")
    KmvStoreLayout.fold(spark, dir,
      Seq(("a", "m n o u e i")).toDF("source", "text"))
    assert(files("b") == bBefore, "fold rewrote an untouched source")
    KmvStoreLayout.expire(dir, "a")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/sketch/source=a")))
    assert(files("b") == bBefore, "expire touched a survivor")
  }
}
