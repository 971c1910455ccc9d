package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The STORED timing-grid histogram — the landed leg of the q172
  * family (batch `Events.timingHistOf`, live `streaming/TimingStream`,
  * and now storage). Histogram cells are COUNTS (additive), so this
  * rides [[LedgerStore]]'s batch-id ledger for exactly-once under
  * replay, like [[CmStoreLayout]] and unlike the idempotent stores.
  *
  * State is ≤ 2 838 cells per event type FOREVER (exact 1 ms cells
  * < 1024 ms, 16 ms cells to 30 s, one overflow cell) — fold cost is
  * O(sketch geometry), never O(corpus). Quantiles stay the shared
  * downstream read (`Events.timingQuantilesFrom`) over [[read]].
  */
object TimingStoreLayout {

  private val Keys = Seq("event_type", "b")

  /** A batch's histogram from raw (event_type, value) rows. */
  def cellsOf(raw: DataFrame): DataFrame =
    graft.queries.Events.timingHistOf(raw)

  /** Add an event batch into the stored histogram exactly once; an
    * already-applied batchId is a no-op (returns false).
    */
  def fold(spark: SparkSession, dir: String, batchId: String,
      raw: DataFrame): Boolean =
    LedgerStore.fold(spark, dir, batchId, cellsOf(raw), Keys)

  /** The stored cells, as (event_type, b, c). */
  def read(spark: SparkSession, dir: String): DataFrame =
    LedgerStore.readCells(spark, dir)
      .select(col("event_type"), col("b"), col("c"))

  // ---- day-windowed variant: the TTL'd form of the same store ----

  private val DailyKeys = Seq("di", "event_type", "b")

  /** A batch's histogram keyed additionally by day — the retention
    * key. Cells stay sketch-bounded per retained window (≤ 2 838 per
    * type per day); expiry is [[LedgerStore.retain]] on `di`, the TTL
    * discipline an additive sketch needs because batches cannot be
    * subtracted.
    */
  def cellsByDayOf(raw: DataFrame): DataFrame =
    graft.queries.Events.timingHistByDayOf(raw)

  /** Exactly-once fold of an event batch into the daily store. */
  def foldDaily(spark: SparkSession, dir: String, batchId: String,
      raw: DataFrame): Boolean =
    LedgerStore.fold(spark, dir, batchId, cellsByDayOf(raw), DailyKeys)

  /** Drop every cell of days before `cutoffDi` (atomic snapshot). */
  def expireBefore(spark: SparkSession, dir: String,
      cutoffDi: Long): Unit =
    LedgerStore.retain(spark, dir, col("di") >= cutoffDi)

  /** The daily cells, as (di, event_type, b, c). */
  def readDaily(spark: SparkSession, dir: String): DataFrame =
    LedgerStore.readCells(spark, dir)
      .select(col("di"), col("event_type"), col("b"), col("c"))
}
