package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The STORED Count-Min sketch — the landed leg of the q120 family
  * (batch `Pipeline.cmProjection.groupBy.count`, live
  * `streaming/CmStream`, and now storage), and the first ADDITIVE
  * corner of the sketch-store triangle: CM cells are COUNTS, so
  * unlike the idempotent stores (bitmap/HLL/KMV) a replayed fold
  * would double-count — exactly-once needs [[LedgerStore]]'s batch-id
  * ledger, committed atomically with the cells (the reference lands
  * each batch in one plain transaction,
  * `clickhouse_table_writer.go:115-149`; the replay ledger is this
  * repo's addition — see [[LedgerStore]]).
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

  // ---- day-windowed variant: the TTL'd form of the same store ----
  // (frequency sketches are the most TTL'd additive tables in
  // production — "top terms over the last N days" — so the CM store
  // gets the retention corner [[TimingStoreLayout]] has)

  private val DailyKeys = Seq("di", "i", "bucket")

  /** A batch's CM cells keyed additionally by its INGEST day `di` —
    * the retention key. Tokens carry no timestamp (unlike the timing
    * grid's events), so the window key is the batch's arrival day, the
    * shape a streaming CM with TTL runs: each day's folds land under
    * that day, and expiry drops whole day-slices of cells. State stays
    * 48 cells per retained day.
    */
  def cellsByDayOf(toks: DataFrame, di: Long): DataFrame =
    cellsOf(toks).withColumn("di", lit(di))

  /** Exactly-once fold of a token batch into the daily store under its
    * ingest day.
    */
  def foldDaily(spark: SparkSession, dir: String, batchId: String,
      toks: DataFrame, di: Long): Boolean =
    LedgerStore.fold(spark, dir, batchId, cellsByDayOf(toks, di),
      DailyKeys)

  /** Drop every cell of days before `cutoffDi` (atomic snapshot; the
    * carried ledger keeps expired-window replays no-ops).
    */
  def expireBefore(spark: SparkSession, dir: String,
      cutoffDi: Long): Unit =
    LedgerStore.retain(spark, dir, col("di") >= cutoffDi)

  /** The daily cells, as (di, i, bucket, c). */
  def readDaily(spark: SparkSession, dir: String): DataFrame =
    LedgerStore.readCells(spark, dir)
      .select(col("di"), col("i"), col("bucket"), col("c"))
}
