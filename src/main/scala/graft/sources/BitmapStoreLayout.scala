package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Paths

/** The STORED audience bitmap — the landed leg of the q171 family
  * (batch `Events.audienceWordsOf`, live `streaming/BitmapStream`,
  * and now storage), and the shape a production bitmap store actually
  * has: one directory per audience key (`event_type`), holding the
  * (w = user_id div 64, bm) 64-bit words sorted by word index — the
  * Roaring-container design as a partitioned parquet table.
  *
  * The fold is the whole point: a landing batch collapses MAP-SIDE to
  * its own words (`audienceWordsOf` — raw ids never shuffle), then
  * ONLY the touched types' directories are read, OR-merged, and
  * rewritten under dynamic partition overwrite; untouched audiences
  * are never read and never written, so fold I/O is proportional to
  * the touched audiences' word counts (≤ audience/64 rows each),
  * never the corpus. Because `bit_or` is idempotent AND associative,
  * replaying a batch cannot flip a bit — the stored table is
  * exactly-once WITHOUT any ledger, the same argument as the live
  * twin (spec-pinned: fold ∘ fold of the same batch is byte-stable).
  *
  * The set algebra stays the shared downstream read
  * (`Events.audienceAlgebraFromWords`) over [[read]], identical to
  * what the batch query and the live stream's sink run — three legs,
  * one projection, one finale.
  */
object BitmapStoreLayout {

  /** Land a word table (columns event_type, w, bm) at `dir`. */
  def write(words: DataFrame, dir: String): String = {
    words.select(col("event_type"), col("w"), col("bm"))
      .repartition(col("event_type"))
      .sortWithinPartitions(col("w"))
      .write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$dir/words")
    dir
  }

  /** The stored words, as (event_type, w, bm). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/words")
      .select(col("event_type"), col("w"), col("bm"))

  /** OR-fold a batch of raw events (event_type, user_id) into the
    * stored words. Reads and rewrites ONLY the touched types'
    * directories; idempotent under replay (bit_or).
    */
  def fold(spark: SparkSession, dir: String, events: DataFrame): String = {
    val batch = graft.queries.Events.audienceWordsOf(events)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val types = batch.select(col("event_type")).distinct()
        .collect().map(_.getString(0)).toSeq
      if (types.isEmpty) return dir
      // directory-pruned read of the touched audiences only; a store
      // that was never write()-initialized folds from empty (fold is
      // the natural incremental entry point — first batch bootstraps)
      val stored =
        if (java.nio.file.Files.exists(Paths.get(s"$dir/words")))
          spark.read.parquet(s"$dir/words")
            .filter(col("event_type").isin(types: _*))
            .select(col("event_type"), col("w"), col("bm"))
        else batch.limit(0)
      val merged = stored.unionByName(batch)
        .groupBy(col("event_type"), col("w"))
        .agg(expr("bit_or(bm)").as("bm"))
        .repartition(col("event_type"))
        .sortWithinPartitions(col("w"))
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(s"$dir/words")
    } finally batch.unpersist(blocking = false)
    dir
  }

  /** Drop an audience outright (the retention-delete a bitmap store
    * serves): one directory delete, no row rewrites.
    */
  def expire(dir: String, eventType: String): Unit =
    graft.streaming.Parts.deleteTree(
      Paths.get(s"$dir/words/event_type=$eventType"))
}
