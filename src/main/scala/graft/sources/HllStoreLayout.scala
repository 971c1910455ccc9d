package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Paths

/** The STORED HyperLogLog registers — the landed leg of the q117
  * family (batch `Pipeline.hllRegistersOf`, live `streaming/HllStream`,
  * and now storage): one directory per `source`, holding the ≤ 256
  * (bucket, m) register rows. Like [[BitmapStoreLayout]] this is the
  * idempotent-fold corner of the sketch-store triangle: `max` is
  * idempotent AND associative, so an OR-style fold of a landing
  * batch's registers is exactly-once under replay with NO ledger
  * (count-based sketches — CM, timing, DD — are the contrasting case:
  * additive folds need the sink's batch-id ledger; documented at
  * their streams). Fold I/O reads and rewrites ONLY the touched
  * sources' directories, each ≤ 256 rows whatever the corpus size.
  *
  * The distinct-count estimate stays the shared downstream read
  * (`Pipeline.hllDistinctFrom`) over [[read]] — three legs, one
  * register projection, one finale.
  */
object HllStoreLayout {

  /** Land a register table (columns source, bucket, m) at `dir`. */
  def write(regs: DataFrame, dir: String): String = {
    regs.select(col("source"), col("bucket"), col("m"))
      .repartition(col("source"))
      .sortWithinPartitions(col("bucket"))
      .write.mode("overwrite").partitionBy("source")
      .parquet(s"$dir/regs")
    dir
  }

  /** The stored registers, as (source, bucket, m). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/regs")
      .select(col("source"), col("bucket"), col("m"))

  /** Max-fold a batch of raw documents (source, text) into the stored
    * registers. Reads and rewrites ONLY the touched sources'
    * directories; idempotent under replay (max).
    */
  def fold(spark: SparkSession, dir: String, docs: DataFrame): String = {
    val batch = graft.queries.Pipeline.hllRegistersOf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sources = batch.select(col("source")).distinct()
        .collect().map(_.getString(0)).toSeq
      if (sources.isEmpty) return dir
      // a never-initialized store folds from empty (first batch
      // bootstraps — fold is the natural incremental entry point)
      val stored =
        if (java.nio.file.Files.exists(Paths.get(s"$dir/regs")))
          spark.read.parquet(s"$dir/regs")
            .filter(col("source").isin(sources: _*))
            .select(col("source"), col("bucket"), col("m"))
        else batch.limit(0)
      val merged = stored.unionByName(batch)
        .groupBy(col("source"), col("bucket"))
        .agg(max(col("m")).as("m"))
        .repartition(col("source"))
        .sortWithinPartitions(col("bucket"))
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("source")
        .parquet(s"$dir/regs")
    } finally batch.unpersist(blocking = false)
    dir
  }

  /** Drop a source's registers: one directory delete. */
  def expire(dir: String, source: String): Unit =
    graft.streaming.Parts.deleteTree(
      Paths.get(s"$dir/regs/source=$source"))
}
