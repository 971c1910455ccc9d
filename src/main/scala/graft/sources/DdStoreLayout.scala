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

  // ---- day-windowed variant: the TTL'd form of the same store ----
  // (completing the retention corner across all three additive
  // stores — timing got it in r13, CM and DD in r14)

  private val DailyKeys = Seq("di", "event_type", "k", "lo")

  /** A batch's γ-bucket table keyed additionally by event day — the
    * retention key; ≤ 643 cells per type per retained day.
    */
  def cellsByDayOf(spark: SparkSession, raw: DataFrame): DataFrame =
    graft.queries.Events.ddBucketsByDayOf(raw,
      graft.queries.Events.ddBounds(spark))

  /** Exactly-once fold of an event batch into the daily store. */
  def foldDaily(spark: SparkSession, dir: String, batchId: String,
      raw: DataFrame): Boolean =
    LedgerStore.fold(spark, dir, batchId, cellsByDayOf(spark, raw),
      DailyKeys)

  /** Drop every cell of days before `cutoffDi` (atomic snapshot; the
    * carried ledger keeps expired-window replays no-ops).
    */
  def expireBefore(spark: SparkSession, dir: String,
      cutoffDi: Long): Unit =
    LedgerStore.retain(spark, dir, col("di") >= cutoffDi)

  /** The daily cells, as (di, event_type, k, lo, c). */
  def readDaily(spark: SparkSession, dir: String): DataFrame =
    LedgerStore.readCells(spark, dir)
      .select(col("di"), col("event_type"), col("k"), col("lo"), col("c"))
}
