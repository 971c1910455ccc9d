package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stored HLL registers: folds converge to the batch register table,
  * a replayed fold is a no-op (max idempotence), untouched source
  * directories keep their exact files, and the shared estimate finale
  * over the store equals batch q117.
  */
class HllStoreLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def regMap(df: org.apache.spark.sql.DataFrame)
      : Map[(String, Long), Int] =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap

  test("fold sequence converges to batch registers; replay is a no-op; " +
      "estimate over the store equals batch q117") {
    val docs = graft.Tables(spark, sf, "documents")
    val (h1, h2) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0))
    val dir = java.nio.file.Files
      .createTempDirectory("hllstore-spec-").toString
    HllStoreLayout.write(
      graft.queries.Pipeline.hllRegistersOf(h1), dir)
    HllStoreLayout.fold(spark, dir, h2)
    val stored = regMap(HllStoreLayout.read(spark, dir))
    val batch = regMap(graft.queries.Pipeline.hllRegistersOf(docs))
    assert(stored == batch, "folded store != batch registers")
    HllStoreLayout.fold(spark, dir, h2)
    assert(regMap(HllStoreLayout.read(spark, dir)) == batch,
      "replayed fold changed the registers")
    val got = graft.queries.Pipeline.hllDistinctFrom(
      HllStoreLayout.read(spark, dir), docs).collect().map(_.toSeq)
    val expect = graft.queries.Pipeline.q117.fn(spark, sf)
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.sameElements(expect),
      "estimate over the store diverges from batch q117")
  }

  test("the FIRST fold into a never-written store bootstraps it") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("hllstore-spec-").toString
    HllStoreLayout.fold(spark, dir,
      Seq(("a", "x y z w v")).toDF("source", "text"))
    val got = regMap(HllStoreLayout.read(spark, dir))
    val want = regMap(graft.queries.Pipeline.hllRegistersOf(
      Seq(("a", "x y z w v")).toDF("source", "text")))
    assert(got == want, "bootstrap fold diverges from direct registers")
  }

  test("a fold carrying a source the store has never seen lands it as a " +
      "new directory") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("hllstore-spec-").toString
    HllStoreLayout.write(
      graft.queries.Pipeline.hllRegistersOf(
        Seq(("a", "x y z w v")).toDF("source", "text")), dir)
    HllStoreLayout.fold(spark, dir,
      Seq(("c", "f g h i j k")).toDF("source", "text"))
    val got = regMap(HllStoreLayout.read(spark, dir))
    val want = regMap(graft.queries.Pipeline.hllRegistersOf(
      Seq(("a", "x y z w v"), ("c", "f g h i j k"))
        .toDF("source", "text")))
    assert(got == want, "new-source fold diverges from direct registers")
  }

  test("fold touches only the folded sources' directories") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("hllstore-spec-").toString
    HllStoreLayout.write(
      graft.queries.Pipeline.hllRegistersOf(
        Seq(("a", "x y z w v"), ("b", "p q r s t"))
          .toDF("source", "text")), dir)
    def files(s: String): Set[String] = {
      val p = java.nio.file.Paths.get(s"$dir/regs/source=$s")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(p).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    }
    val bBefore = files("b")
    HllStoreLayout.fold(spark, dir,
      Seq(("a", "m n o u e")).toDF("source", "text"))
    assert(files("b") == bBefore, "fold rewrote an untouched source")
    HllStoreLayout.expire(dir, "a")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/regs/source=a")))
    assert(files("b") == bBefore, "expire touched a survivor")
  }
}
