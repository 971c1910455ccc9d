package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stored audience bitmaps: after any sequence of folds the landed
  * word table must equal the batch projection over all events ever
  * folded; replaying a fold is a bit-identical no-op (bit_or
  * idempotence — the exactly-once-without-a-ledger argument); a fold
  * touches only the folded types' directories; the shared algebra
  * finale over the store equals the batch q171 answer.
  */
class BitmapStoreLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def wordsMap(df: org.apache.spark.sql.DataFrame)
      : Map[(String, Long), Long] =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("fold sequence converges to the batch projection; replay is a no-op; " +
      "algebra over the store equals batch q171") {
    val ev = graft.Tables(spark, sf, "events")
      .select(col("event_type"), col("user_id"))
    val (h1, h2) = (ev.filter(col("user_id") % 2 === 0),
      ev.filter(col("user_id") % 2 =!= 0))
    val dir = java.nio.file.Files
      .createTempDirectory("bitmapstore-spec-").toString
    BitmapStoreLayout.write(
      graft.queries.Events.audienceWordsOf(h1), dir)
    BitmapStoreLayout.fold(spark, dir, h2)
    val stored = wordsMap(BitmapStoreLayout.read(spark, dir))
    val batch = wordsMap(graft.queries.Events.audienceWordsOf(ev))
    assert(stored == batch, "folded store != batch word table")
    // replay: folding the same batch again cannot flip a bit
    BitmapStoreLayout.fold(spark, dir, h2)
    assert(wordsMap(BitmapStoreLayout.read(spark, dir)) == batch,
      "replayed fold changed the store")
    // the shared finale over the store IS the batch q171 answer
    val got = graft.queries.Events.audienceAlgebraFromWords(
      BitmapStoreLayout.read(spark, dir)).collect().map(_.toSeq)
    val expect = graft.queries.Events.q171.fn(spark, sf)
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.sameElements(expect),
      "algebra over the store diverges from batch q171")
  }

  test("the FIRST fold into a never-written store bootstraps it " +
      "(fold is the natural incremental entry point)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("bitmapstore-spec-").toString
    BitmapStoreLayout.fold(spark, dir,
      Seq(("click", 1L), ("click", 65L)).toDF("event_type", "user_id"))
    val got = wordsMap(BitmapStoreLayout.read(spark, dir))
    assert(got == Map(("click", 0L) -> 2L, ("click", 1L) -> 2L),
      s"bootstrap fold wrong: $got")
  }

  test("a fold carrying a type the store has never seen lands it as a " +
      "new directory") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("bitmapstore-spec-").toString
    BitmapStoreLayout.write(
      graft.queries.Events.audienceWordsOf(
        Seq(("click", 1L)).toDF("event_type", "user_id")), dir)
    BitmapStoreLayout.fold(spark, dir,
      Seq(("signup", 7L), ("signup", 70L)).toDF("event_type", "user_id"))
    val got = wordsMap(BitmapStoreLayout.read(spark, dir))
    assert(got == Map(("click", 0L) -> 2L,
      ("signup", 0L) -> (1L << 7), ("signup", 1L) -> (1L << 6)),
      s"new-type fold wrong: $got")
  }

  test("fold reads/writes only the touched audience directories; expire " +
      "is one directory delete") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("bitmapstore-spec-").toString
    BitmapStoreLayout.write(
      graft.queries.Events.audienceWordsOf(
        Seq(("click", 1L), ("view", 2L), ("purchase", 3L))
          .toDF("event_type", "user_id")), dir)
    def files(t: String): Set[String] = {
      val p = java.nio.file.Paths.get(s"$dir/words/event_type=$t")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(p).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    }
    val viewBefore = files("view")
    val purchaseBefore = files("purchase")
    BitmapStoreLayout.fold(spark, dir,
      Seq(("click", 65L)).toDF("event_type", "user_id"))
    // untouched audiences keep their exact files
    assert(files("view") == viewBefore &&
      files("purchase") == purchaseBefore,
      "fold rewrote an untouched audience directory")
    // the touched audience gained the new word
    val click = BitmapStoreLayout.read(spark, dir)
      .filter(col("event_type") === "click").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(click == Map(0L -> 2L, 1L -> 2L), s"click words wrong: $click")
    BitmapStoreLayout.expire(dir, "view")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/words/event_type=view")))
    assert(files("purchase") == purchaseBefore, "expire touched a survivor")
  }
}
