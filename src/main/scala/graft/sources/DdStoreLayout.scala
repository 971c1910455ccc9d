package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The STORED DDSketch — the landed leg of the q176 family (batch
  * `Events.ddBucketsOf`, live `streaming/DdStream`, partial-merge
  * q184, and now storage). γ-bucket cells are COUNTS (additive), so
  * this rides [[LedgerStore]]'s batch-id ledger for exactly-once
  * under replay, completing the additive corner with
  * [[CmStoreLayout]] and [[TimingStoreLayout]].
  *
  * State is ≤ 643 γ-buckets per event type FOREVER; the bucket's
  * exact lower boundary `lo` is a pure function of `k` (the one
  * sequential correctly-rounded γ-power chain both engines build), so
  * it rides along as a key and folds group stably. Quantiles stay the
  * shared downstream read (`Events.ddQuantilesFrom`) over [[read]].
  */
object DdStoreLayout {

  private val Keys = Seq("event_type", "k", "lo")

  /** A batch's γ-bucket table from raw (event_type, value) rows. */
  def cellsOf(spark: SparkSession, raw: DataFrame): DataFrame =
    graft.queries.Events.ddBucketsOf(raw,
      graft.queries.Events.ddBounds(spark))

  /** Add an event batch into the stored sketch exactly once; an
    * already-applied batchId is a no-op (returns false).
    */
  def fold(spark: SparkSession, dir: String, batchId: String,
      raw: DataFrame): Boolean =
    LedgerStore.fold(spark, dir, batchId, cellsOf(spark, raw), Keys)

  /** The stored cells, as (event_type, k, lo, c). */
  def read(spark: SparkSession, dir: String): DataFrame =
    LedgerStore.readCells(spark, dir)
      .select(col("event_type"), col("k"), col("lo"), col("c"))
}
