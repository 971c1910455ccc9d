package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Paths

/** The STORED KMV bottom-k sketch — the landed leg of the q121/q123
  * theta-sketch family (batch `OrderedScan.bottomK` over
  * `kmvHashes`, live `streaming/KmvStream`, and now storage), and the
  * third idempotent corner of the sketch-store triangle next to
  * [[BitmapStoreLayout]] (bit_or) and [[HllStoreLayout]] (max): the
  * sketch is a pure function of the distinct-hash SET, and
  * set-union + deterministic bottom-k truncation is idempotent AND
  * associative, so replaying a fold cannot move the sketch — exactly
  * once with NO ledger. State is ≤ 64 (source, h) rows per source
  * FOREVER; fold I/O reads and rewrites only the touched sources'
  * directories.
  *
  * The estimate stays the shared downstream read
  * (`Pipeline.kmvDistinctFrom`), and because the landed rows ARE the
  * k minimum hashes, q123's pairwise set expressions run over stores
  * the same way they run over fresh sketches.
  */
object KmvStoreLayout {

  private val K = 64

  /** Land a bottom-k sketch table (columns source, h) at `dir`. */
  def write(sk: DataFrame, dir: String): String = {
    sk.select(col("source"), col("h"))
      .repartition(col("source"))
      .sortWithinPartitions(col("h"))
      .write.mode("overwrite").partitionBy("source")
      .parquet(s"$dir/sketch")
    dir
  }

  /** The stored sketch rows, as (source, h). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/sketch")
      .select(col("source"), col("h"))

  /** Union-fold a batch of raw documents (source, text) into the
    * stored sketches: the batch's distinct hashes merge with the
    * landed rows and the bottom-64 per touched source survive.
    * Idempotent under replay (set union + deterministic truncation).
    */
  def fold(spark: SparkSession, dir: String, docs: DataFrame): String = {
    val batch = graft.queries.Pipeline.kmvHashes(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sources = batch.select(col("source")).distinct()
        .collect().map(_.getString(0)).toSeq
      if (sources.isEmpty) return dir
      // a never-initialized store folds from empty (first batch
      // bootstraps — fold is the natural incremental entry point)
      val stored =
        if (java.nio.file.Files.exists(Paths.get(s"$dir/sketch")))
          spark.read.parquet(s"$dir/sketch")
            .filter(col("source").isin(sources: _*))
            .select(col("source"), col("h"))
        else batch.limit(0)
      val merged = graft.operators.OrderedScan.bottomK(
          stored.unionByName(batch).distinct(),
          col("source"), col("h"), col("h"),
          expr(s"h div ${1L << 53}L"), K, "rk")
        .select(col("source"), col("h"))
        .repartition(col("source"))
        .sortWithinPartitions(col("h"))
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("source")
        .parquet(s"$dir/sketch")
    } finally batch.unpersist(blocking = false)
    dir
  }

  /** Drop a source's sketch: one directory delete. */
  def expire(dir: String, source: String): Unit =
    graft.streaming.Parts.deleteTree(
      Paths.get(s"$dir/sketch/source=$source"))
}
