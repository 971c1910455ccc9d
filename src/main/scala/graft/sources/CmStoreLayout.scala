package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The STORED Count-Min sketch — the landed leg of the q120 family
  * (batch `Pipeline.cmProjection.groupBy.count`, live
  * `streaming/CmStream`, and now storage), and the first ADDITIVE
  * corner of the sketch-store triangle: CM cells are COUNTS, so
  * unlike the idempotent stores (bitmap/HLL/KMV) a replayed fold
  * would double-count — exactly-once needs [[LedgerStore]]'s batch-id
  * ledger, committed atomically with the cells (the reference's
  * transactional-batch sink discipline,
  * `clickhouse_table_writer.go:115-149`, in parquet form).
  *
  * State is the 48-cell (depth 3 × width 16) table FOREVER — fold
  * cost is O(sketch), never O(corpus). Point estimates stay the
  * shared downstream read (`Pipeline.cmEstimateFrom`) over [[read]],
  * identical to what the batch query and the live stream's sink run —
  * three legs, one projection, one finale.
  */
object CmStoreLayout {

  private val Keys = Seq("i", "bucket")

  /** A batch's CM cell table from its token stream (w column). */
  def cellsOf(toks: DataFrame): DataFrame =
    graft.queries.Pipeline.cmProjection(toks)
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Add a token batch into the stored sketch exactly once; an
    * already-applied batchId is a no-op (returns false).
    */
  def fold(spark: SparkSession, dir: String, batchId: String,
      toks: DataFrame): Boolean =
    LedgerStore.fold(spark, dir, batchId, cellsOf(toks), Keys)

  /** Spec-only contrast: the same merge without the ledger. */
  private[graft] def foldUnledgered(spark: SparkSession, dir: String,
      toks: DataFrame): Unit =
    LedgerStore.foldUnledgered(spark, dir, cellsOf(toks), Keys)

  /** The stored cells, as (i, bucket, c). */
  def read(spark: SparkSession, dir: String): DataFrame =
    LedgerStore.readCells(spark, dir)
      .select(col("i"), col("bucket"), col("c"))
}
