package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The ADDITIVE corner of the sketch-store triangle — the storage
  * discipline count-based sketches (Count-Min, the timing grid,
  * DDSketch) need and the idempotent corners (bitmap `bit_or`
  * [[BitmapStoreLayout]], HLL `max` [[HllStoreLayout]], KMV set-union
  * [[KmvStoreLayout]]) can skip: a replayed fold of an ADDITIVE cell
  * table double-counts, so exactly-once requires remembering which
  * batches were applied. This is the reference's transactional-batch
  * sink discipline (bristle wraps each landing batch in one
  * transaction keyed by its batch identity,
  * `clickhouse_table_writer.go:115-149` — replaying an applied batch
  * must be a no-op) re-expressed for a parquet store:
  *
  *   - state lives in versioned snapshot directories
  *     `dir/v<N>/{cells,ledger}`; `dir/CURRENT` names the committed
  *     version and is replaced with an ATOMIC_MOVE — the ONE commit
  *     point. Cells and the batch-id ledger always land together or
  *     not at all: a crash mid-fold leaves CURRENT at the old version
  *     (batch unapplied — the replay re-folds it), a crash after the
  *     swap leaves the batch in the ledger (the replay is a no-op).
  *     There is no visible state where a batch's counts exist without
  *     its ledger entry or vice versa.
  *   - `fold` first reads the committed ledger; an already-applied
  *     batch id returns false and touches nothing.
  *
  * Scale: additive sketch tables are bounded by SKETCH GEOMETRY, not
  * corpus (48 CM cells; ≤ 2 838 timing cells/type; ≤ 643 γ-buckets/
  * type), so the full-state rewrite per fold is O(sketch) however
  * large the folded history — the snapshot pattern that would be
  * wrong for a fact table is exactly right for a sketch store. The
  * ledger grows one row per applied batch and is kept in full —
  * dropping ids older than every possible replay (the reference's
  * deduplication-window argument) is safe but deliberately not done:
  * the id set is tiny next to any corpus, and keeping it all makes
  * [[retain]]'s no-resurrection guarantee unconditional.
  *
  * Single-writer discipline (one folder per store directory) is
  * ENFORCED by an advisory file lock ([[withWriterLock]]) — a second
  * concurrent writer fails loudly; readers are safe concurrently —
  * they resolve CURRENT once and read an immutable snapshot (the
  * previous version is retained for exactly this reason and
  * garbage-collected one commit later).
  */
object LedgerStore {

  /** The committed version, or -1 for a never-committed store. */
  def version(dir: String): Long = {
    val cur = Paths.get(dir, "CURRENT")
    if (Files.exists(cur))
      new String(Files.readAllBytes(cur), StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  /** The committed cell table. Requires at least one committed fold. */
  def readCells(spark: SparkSession, dir: String): DataFrame = {
    val v = version(dir)
    require(v >= 0, s"ledger store at $dir has no committed version")
    spark.read.parquet(s"$dir/v$v/cells")
  }

  /** Batch ids already applied (empty for a never-committed store). */
  def appliedBatches(spark: SparkSession, dir: String): Set[String] = {
    val v = version(dir)
    if (v < 0) Set.empty
    else spark.read.parquet(s"$dir/v$v/ledger")
      .select(col("batch_id")).collect().map(_.getString(0)).toSet
  }

  /** Add a batch's cell table (`keyCols` + a `c` count column) into
    * the store, exactly once: an already-applied `batchId` is a no-op
    * (returns false). Otherwise cells merge by cell-wise count
    * addition and the new snapshot (cells + ledger including
    * `batchId`) commits atomically; returns true.
    */
  def fold(spark: SparkSession, dir: String, batchId: String,
      batch: DataFrame, keyCols: Seq[String]): Boolean =
    withWriterLock(dir) {
      // the ledger check lives INSIDE the writer lock: two concurrent
      // folds of the same id must serialize into apply-then-no-op,
      // never both-pass-the-check-then-double-apply
      if (appliedBatches(spark, dir).contains(batchId)) false
      else {
        applyLocked(spark, dir, batch, keyCols,
          addToLedger = Some(batchId))
        true
      }
    }

  /** RETENTION: commit a new snapshot keeping only the cells matching
    * `keep`, ledger carried forward unchanged. This is how a COUNT
    * sketch expires — you cannot subtract a batch from an additive
    * table, but cells keyed by a window column (day) drop wholesale
    * when the window ages out (the TTL discipline production sketch
    * tables run). Atomic like [[fold]]: readers see the old snapshot
    * until the CURRENT swap. The ledger keeps every applied batch id:
    * replaying an expired-window batch stays a no-op rather than
    * resurrecting dropped counts.
    */
  def retain(spark: SparkSession, dir: String,
      keep: org.apache.spark.sql.Column): Unit = withWriterLock(dir) {
    import spark.implicits._
    val v = version(dir)
    require(v >= 0, s"ledger store at $dir has no committed version")
    val cells = spark.read.parquet(s"$dir/v$v/cells").filter(keep)
    val ledger = spark.read.parquet(s"$dir/v$v/ledger")
      .select(col("batch_id")).collect().map(_.getString(0)).toSeq
    val vNew = v + 1
    cells.coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/v$vNew/cells")
    ledger.toDF("batch_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/v$vNew/ledger")
    commit(dir, vNew)
    gc(dir, keepFrom = vNew - 1)
  }

  /** The CONTRAST path (spec-only): the same cell merge with the
    * ledger check skipped and the id not recorded — demonstrating
    * that without the ledger a replayed additive fold double-counts.
    */
  private[graft] def foldUnledgered(spark: SparkSession, dir: String,
      batch: DataFrame, keyCols: Seq[String]): Unit =
    withWriterLock(dir) {
      applyLocked(spark, dir, batch, keyCols, addToLedger = None)
    }

  /** Single-writer discipline, ENFORCED: every mutation holds an
    * advisory file lock on `dir/LOCK` for its whole
    * read-merge-write-commit span. A second writer (same or another
    * JVM) fails LOUDLY instead of racing the CURRENT swap — two
    * interleaved folds could otherwise both read version N and the
    * loser's batch would vanish from the winner's snapshot while its
    * ledger entry vanished too (silent count loss). Readers never
    * take the lock (they resolve CURRENT once and read an immutable
    * snapshot).
    */
  private def withWriterLock[A](dir: String)(body: => A): A = {
    Files.createDirectories(Paths.get(dir))
    val ch = java.nio.channels.FileChannel.open(Paths.get(dir, "LOCK"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock =
        try ch.tryLock()
        catch { case _: java.nio.channels.OverlappingFileLockException =>
          null }
      if (lock == null)
        throw new IllegalStateException(
          s"ledger store at $dir has another writer (fold/retain are " +
            "single-writer; serialize the callers)")
      try body finally lock.release()
    } finally ch.close()
  }

  private def applyLocked(spark: SparkSession, dir: String,
      batch: DataFrame, keyCols: Seq[String],
      addToLedger: Option[String]): Unit = {
    import spark.implicits._
    val v = version(dir)
    val keys = keyCols.map(col)
    val summed = batch.groupBy(keys: _*).agg(sum(col("c")).as("c"))
    val merged =
      if (v < 0) summed
      else spark.read.parquet(s"$dir/v$v/cells").unionByName(summed)
        .groupBy(keys: _*).agg(sum(col("c")).as("c"))
    val oldLedger: Seq[String] =
      if (v < 0) Seq.empty
      else spark.read.parquet(s"$dir/v$v/ledger")
        .select(col("batch_id")).collect().map(_.getString(0)).toSeq
    val ledger = (oldLedger ++ addToLedger).distinct
    val vNew = v + 1
    // sketch-geometry-bounded tables: one file each is the right shape
    merged.orderBy(keys: _*).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/v$vNew/cells")
    ledger.toDF("batch_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/v$vNew/ledger")
    commit(dir, vNew)
    gc(dir, keepFrom = vNew - 1)
  }

  /** The one atomic commit point: CURRENT names the new version. */
  private def commit(dir: String, v: Long): Unit = {
    val tmp = Paths.get(dir, "CURRENT.tmp")
    Files.createDirectories(Paths.get(dir))
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, "CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Drop snapshots older than `keepFrom` (the previous version stays
    * one commit for in-flight readers).
    */
  private def gc(dir: String, keepFrom: Long): Unit = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return
    val listing = Files.list(root)
    val stale =
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("v"))
        .filter { p =>
          val n = p.getFileName.toString.drop(1)
          n.forall(_.isDigit) && n.nonEmpty && n.toLong < keepFrom
        }
        .toList
      finally listing.close() // Files.list holds a directory handle
    stale.foreach((p: Path) => graft.streaming.Parts.deleteTree(p))
  }
}
