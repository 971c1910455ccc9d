package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The additive sketch-store corner: folds converge to the direct
  * build, a replayed fold WITH the ledger is a byte-stable no-op, the
  * SAME replay WITHOUT the ledger double-counts (the contrast that
  * proves the ledger is load-bearing — counts are not idempotent),
  * commits are snapshot-atomic (cells and ledger flip together via
  * CURRENT), and the shared finales over the stored legs equal the
  * batch q172/q176 answers.
  */
class LedgerStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cmMap(df: org.apache.spark.sql.DataFrame)
      : Map[(Int, Long), Long] =
    df.collect().map(r =>
      (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def docsToks(half: Int) = {
    val docs = graft.Tables(spark, sf, "documents")
    graft.queries.Pipeline.cmToksOf(
      if (half < 0) docs
      else docs.filter(col("doc_id") % 2 === half))
  }

  test("CM store: ledgered folds converge to the direct sketch; a " +
      "replayed batch id is a byte-stable no-op; the SAME replay " +
      "unledgered double-counts") {
    val dir = java.nio.file.Files
      .createTempDirectory("cmstore-spec-").toString
    assert(CmStoreLayout.fold(spark, dir, "even", docsToks(0)),
      "bootstrap fold must apply")
    assert(CmStoreLayout.fold(spark, dir, "odd", docsToks(1)),
      "incremental fold must apply")
    val direct = cmMap(CmStoreLayout.cellsOf(docsToks(-1)))
    assert(cmMap(CmStoreLayout.read(spark, dir)) == direct,
      "folded store != direct CM build")
    // WITH the ledger: the replay is refused and nothing moves
    assert(!CmStoreLayout.fold(spark, dir, "odd", docsToks(1)),
      "replayed fold must return false")
    assert(cmMap(CmStoreLayout.read(spark, dir)) == direct,
      "ledger no-op replay changed the cells")
    // WITHOUT the ledger: the same replay double-counts — counts are
    // additive, so exactly-once really does come from the ledger
    CmStoreLayout.foldUnledgered(spark, dir, docsToks(1))
    val oddCells = cmMap(CmStoreLayout.cellsOf(docsToks(1)))
    val doubled = cmMap(CmStoreLayout.read(spark, dir))
    assert(doubled != direct, "unledgered replay must change the cells")
    oddCells.foreach { case (k, c) =>
      assert(doubled(k) == direct(k) + c,
        s"cell $k not double-counted: ${doubled(k)} vs ${direct(k)} + $c")
    }
  }

  test("commits are snapshot-versioned: CURRENT advances per applied " +
      "fold, the previous snapshot survives one commit, older are GC'd") {
    val dir = java.nio.file.Files
      .createTempDirectory("cmstore-spec-").toString
    assert(LedgerStore.version(dir) == -1L)
    CmStoreLayout.fold(spark, dir, "b0", docsToks(0))
    assert(LedgerStore.version(dir) == 0L)
    CmStoreLayout.fold(spark, dir, "b1", docsToks(1))
    assert(LedgerStore.version(dir) == 1L)
    def has(v: Long) = java.nio.file.Files
      .exists(java.nio.file.Paths.get(s"$dir/v$v"))
    assert(has(0) && has(1), "previous snapshot must survive one commit")
    assert(LedgerStore.recentBatches(dir) == Seq("b0", "b1"))
    // a replay does NOT advance the version (nothing was written)
    CmStoreLayout.fold(spark, dir, "b1", docsToks(1))
    assert(LedgerStore.version(dir) == 1L, "replay advanced the version")
    import spark.implicits._
    CmStoreLayout.fold(spark, dir, "b2",
      Seq("spark", "spark", "merge").toDF("w"))
    assert(LedgerStore.version(dir) == 2L)
    assert(!has(0) && has(1) && has(2), "GC must drop snapshots older " +
      "than the previous one and keep the previous")
    assert(LedgerStore.recentBatches(dir) == Seq("b0", "b1", "b2"),
      "ledger must carry the applied ids across snapshots")
    assert(LedgerStore.highWatermark(dir) == Some(2L),
      "numeric-tailed ids must advance the watermark")
  }

  test("the ledger check is BOUNDED: a below-watermark numeric id " +
      "outside the recent window is refused LOUDLY, the window trims " +
      "to its bound, and fold state never grows with applied-batch count") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("cmstore-spec-").toString
    val one = Seq("spark").toDF("w")
    def fold(id: String) = LedgerStore.foldWindowed(spark, dir, id,
      CmStoreLayout.cellsOf(one), Seq("i", "bucket"), window = 2)
    assert(fold("m-1") && fold("m-2") && fold("m-3"))
    // the window kept only the last 2 ids — state is bounded
    assert(LedgerStore.recentBatches(dir) == Seq("m-2", "m-3"),
      "recent window must trim to its bound")
    assert(LedgerStore.highWatermark(dir) == Some(3L))
    // an IN-WINDOW replay is the plausible redelivery: silent no-op
    assert(!fold("m-3"), "in-window replay must be a silent no-op")
    // m-1 fell out of the window: seq 1 <= watermark 3, but at that
    // depth a replay is indistinguishable from an id-sequence reset
    // that would silently lose data — the refusal is LOUD (ADVICE r14
    // #1: a silent false here reads exactly like a healthy no-op).
    // The check stays O(window), never O(#applied batches).
    val deep = intercept[LedgerStore.WatermarkRefusal] { fold("m-1") }
    assert(deep.getMessage.contains("high-watermark 3"))
    // a NEVER-applied below-watermark id — the date-rollover /
    // reset-to-zero data-loss case the r14 advice flagged — raises too
    val reset = intercept[LedgerStore.WatermarkRefusal] {
      LedgerStore.foldWindowed(spark, dir, "m-0",
        CmStoreLayout.cellsOf(one), Seq("i", "bucket"), window = 2)
    }
    assert(reset.getMessage.contains("'m-0'"))
    // neither refusal moved the store
    assert(LedgerStore.version(dir) == 2L,
      "a watermark refusal must not commit anything")
    assert(fold("m-4"), "above-watermark ids must apply")
    // non-numeric ids are protected by the window ALONE: past the
    // window they lose replay protection (the documented trade — use
    // sequenced ids for unbounded histories, as the streams do)
    val dir2 = java.nio.file.Files
      .createTempDirectory("cmstore-spec-").toString
    def fold2(id: String) = LedgerStore.foldWindowed(spark, dir2, id,
      CmStoreLayout.cellsOf(one), Seq("i", "bucket"), window = 2)
    assert(fold2("alpha") && fold2("beta") && fold2("gamma"))
    assert(!fold2("gamma"), "in-window non-numeric replay refused")
    assert(fold2("alpha"),
      "past-window non-numeric id re-applies (window-scoped protection)")
  }

  test("a pre-bounded legacy snapshot (v<N>/ledger parquet dir) is " +
      "detected by name in the spark-free reader and MIGRATED by the " +
      "next fold — watermark exact, replay protection carried over") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("cmstore-legacy-").toString
    // hand-build the r13-era layout: cells + a batch_id parquet dir +
    // CURRENT, exactly what pre-bounded code committed
    val one = Seq("spark").toDF("w")
    CmStoreLayout.cellsOf(one).orderBy(col("i"), col("bucket")).coalesce(1)
      .write.parquet(s"$dir/v0/cells")
    Seq("m-1", "m-2", "alpha").toDF("batch_id").coalesce(1)
      .write.parquet(s"$dir/v0/ledger")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "CURRENT"),
      "0".getBytes)
    // the spark-free reader raises the NAMED error, not a bare
    // NoSuchFileException (ADVICE r14 #2)
    val e = intercept[IllegalStateException] {
      LedgerStore.recentBatches(dir)
    }
    assert(e.getMessage.contains("legacy ledger layout"))
    // reads of the cells are unaffected
    val before = cmMap(CmStoreLayout.read(spark, dir))
    // the next fold migrates: legacy ids seed hw + window, the new
    // batch applies, and the committed snapshot is the bounded format
    assert(CmStoreLayout.fold(spark, dir, "m-3", Seq("merge").toDF("w")))
    assert(LedgerStore.version(dir) == 1L)
    assert(LedgerStore.highWatermark(dir) == Some(3L),
      "migration must seed the watermark from the legacy ids")
    assert(LedgerStore.recentBatches(dir).contains("alpha"),
      "migration must carry legacy ids into the recent window")
    // replay protection survived the migration, both arms
    assert(!CmStoreLayout.fold(spark, dir, "alpha", Seq("merge").toDF("w")),
      "migrated non-numeric id must stay a replay no-op")
    intercept[LedgerStore.WatermarkRefusal] {
      LedgerStore.foldWindowed(spark, dir, "m-0",
        CmStoreLayout.cellsOf(one), Seq("i", "bucket"), window = 2)
    }
    val after = cmMap(CmStoreLayout.read(spark, dir))
    val direct = cmMap(CmStoreLayout.cellsOf(
      Seq("spark", "merge").toDF("w")))
    assert(after == direct && after != before,
      "migrated store diverged from the direct build")
  }

  test("a crash mid-fold (snapshot dir written, CURRENT not swapped) " +
      "leaves readers at the old version and the next fold reclaims " +
      "the orphan dir") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("cmstore-spec-").toString
    CmStoreLayout.fold(spark, dir, "b0", Seq("spark").toDF("w"))
    val committed = cmMap(CmStoreLayout.read(spark, dir))
    // simulate the crash window: the next version's directory exists
    // (cells+LEDGER written) but CURRENT was never swapped
    val orphan = java.nio.file.Paths.get(s"$dir/v1")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("LEDGER"),
      "hw:-\nGARBAGE".getBytes)
    java.nio.file.Files.write(orphan.resolve("cells"),
      Array[Byte](1, 2, 3))
    // readers resolve CURRENT: the orphan is invisible
    assert(LedgerStore.version(dir) == 0L,
      "an unswapped snapshot must not be visible")
    assert(cmMap(CmStoreLayout.read(spark, dir)) == committed)
    assert(LedgerStore.recentBatches(dir) == Seq("b0"),
      "ledger state must come from the committed snapshot")
    // the crashed batch was never applied — its replay re-folds, and
    // the fold overwrites the orphan v1 cleanly
    assert(CmStoreLayout.fold(spark, dir, "b1", Seq("merge").toDF("w")),
      "the next fold must succeed over a crash-orphaned version dir")
    assert(LedgerStore.version(dir) == 1L)
    assert(LedgerStore.recentBatches(dir) == Seq("b0", "b1"))
    val direct = cmMap(CmStoreLayout.cellsOf(
      Seq("spark", "merge").toDF("w")))
    assert(cmMap(CmStoreLayout.read(spark, dir)) == direct,
      "recovered store diverged from the direct build")
  }

  test("StoreMemo builds a key AT MOST ONCE under concurrent callers " +
      "(the TrieMap.getOrElseUpdate race the r13 advice flagged)") {
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val key = s"spec-race-${System.nanoTime()}"
    val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val threads = (1 to 8).map { _ =>
      val t = new Thread(() => {
        val d = StoreMemo.tempStore(key, "storememo-spec-") { _ =>
          built.incrementAndGet()
          Thread.sleep(50) // widen the race window
        }
        dirs.add(d)
        ()
      })
      t.start(); t
    }
    threads.foreach(_.join())
    assert(built.get() == 1,
      s"builder ran ${built.get()} times for one key")
    assert(dirs.size() == 1, "every caller must see the same store dir")
  }

  test("a second concurrent writer fails loudly instead of racing the " +
      "CURRENT swap (advisory lock held for the whole fold span)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("cmstore-spec-").toString
    CmStoreLayout.fold(spark, dir, "b0", Seq("spark").toDF("w"))
    // simulate another writer holding the lock
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(dir, "LOCK"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = ch.lock()
    try {
      val e = intercept[IllegalStateException] {
        CmStoreLayout.fold(spark, dir, "b1", Seq("merge").toDF("w"))
      }
      assert(e.getMessage.contains("another writer"))
    } finally { lock.release(); ch.close() }
    // once the other writer releases, the fold proceeds normally
    assert(CmStoreLayout.fold(spark, dir, "b1", Seq("merge").toDF("w")))
  }

  test("retention: retain drops expired day-windows atomically, keeps " +
      "the ledger, and a replayed expired-window batch cannot " +
      "resurrect dropped counts") {
    val ev = graft.Tables(spark, sf, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("timingttl-spec-").toString
    assert(TimingStoreLayout.foldDaily(spark, dir, "all", ev))
    val before = TimingStoreLayout.readDaily(spark, dir)
    val d0 = before.agg(min(col("di"))).collect()(0).getLong(0)
    val dMax = before.agg(max(col("di"))).collect()(0).getLong(0)
    assert(dMax > d0, "fixture must span multiple days")
    val keptDirect = before.filter(col("di") > d0)
      .collect().map(_.toSeq).toSet
    TimingStoreLayout.expireBefore(spark, dir, d0 + 1)
    val after = TimingStoreLayout.readDaily(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(after == keptDirect, "retain kept the wrong cells")
    assert(!after.exists(r => r.head == d0), "expired day survived")
    // the ledger survived the retain: replaying the (now partially
    // expired) batch is STILL a no-op — dropped counts stay dropped
    assert(!TimingStoreLayout.foldDaily(spark, dir, "all", ev),
      "replay after expiry must stay a ledger no-op")
    assert(TimingStoreLayout.readDaily(spark, dir)
      .collect().map(_.toSeq).toSet == after,
      "replay after expiry resurrected dropped counts")
  }

  test("CM daily store: expiry drops whole day-slices atomically, the " +
      "kept window equals the direct sketch over kept batches, and an " +
      "expired-window replay cannot resurrect dropped counts") {
    val dir = java.nio.file.Files
      .createTempDirectory("cmttl-spec-").toString
    assert(CmStoreLayout.foldDaily(spark, dir, "day10-even",
      docsToks(0), di = 10L))
    assert(CmStoreLayout.foldDaily(spark, dir, "day11-odd",
      docsToks(1), di = 11L))
    def daily(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))
        -> r.getLong(3)).toMap
    val both = daily(CmStoreLayout.readDaily(spark, dir))
    assert(both.keys.map(_._1).toSet == Set(10L, 11L),
      "daily store must keep per-day cell slices")
    CmStoreLayout.expireBefore(spark, dir, cutoffDi = 11L)
    val kept = daily(CmStoreLayout.readDaily(spark, dir))
    val direct = daily(CmStoreLayout.cellsByDayOf(docsToks(1), 11L)
      .select(col("di"), col("i"), col("bucket"), col("c")))
    assert(kept == direct,
      "kept window must equal the direct CM over the kept day's batches")
    // the carried ledger keeps the expired-window replay a no-op —
    // dropped counts stay dropped
    assert(!CmStoreLayout.foldDaily(spark, dir, "day10-even",
      docsToks(0), di = 10L),
      "expired-window replay must stay a ledger no-op")
    assert(daily(CmStoreLayout.readDaily(spark, dir)) == kept,
      "expired-window replay resurrected dropped counts")
  }

  test("timing store: ledgered folds converge; the shared quantile " +
      "finale over the store equals batch q172") {
    val ev = graft.Tables(spark, sf, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("timingstore-spec-").toString
    assert(TimingStoreLayout.fold(spark, dir, "even",
      ev.filter(col("user_id") % 2 === 0)))
    assert(TimingStoreLayout.fold(spark, dir, "odd",
      ev.filter(col("user_id") % 2 =!= 0)))
    assert(!TimingStoreLayout.fold(spark, dir, "odd",
      ev.filter(col("user_id") % 2 =!= 0)))
    val got = graft.queries.Events.timingQuantilesFrom(
      TimingStoreLayout.read(spark, dir)).collect().map(_.toSeq)
    val expect = graft.queries.Events.q172.fn(spark, sf)
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.sameElements(expect),
      "quantiles over the store diverge from batch q172")
  }

  test("DD daily store: expiry drops whole day-slices, the kept window " +
      "equals the direct day-keyed sketch over kept days, and an " +
      "expired-window replay cannot resurrect dropped counts") {
    val ev = graft.Tables(spark, sf, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("ddttl-spec-").toString
    assert(DdStoreLayout.foldDaily(spark, dir, "all-events", ev))
    def daily(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))
        -> (r.getDouble(3), r.getLong(4))).toMap
    val before = daily(DdStoreLayout.readDaily(spark, dir))
    val d0 = before.keys.map(_._1).min
    assert(before.keys.map(_._1).max > d0, "fixture must span days")
    DdStoreLayout.expireBefore(spark, dir, d0 + 1)
    val kept = daily(DdStoreLayout.readDaily(spark, dir))
    assert(kept == before.filter { case ((di, _, _), _) => di > d0 },
      "retain kept the wrong DD day-cells")
    assert(!DdStoreLayout.foldDaily(spark, dir, "all-events", ev),
      "expired-window replay must stay a ledger no-op")
    assert(daily(DdStoreLayout.readDaily(spark, dir)) == kept,
      "expired-window replay resurrected dropped counts")
  }

  test("DD store: ledgered folds converge; the shared quantile finale " +
      "over the store equals batch q176") {
    val ev = graft.Tables(spark, sf, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("ddstore-spec-").toString
    assert(DdStoreLayout.fold(spark, dir, "even",
      ev.filter(col("user_id") % 2 === 0)))
    assert(DdStoreLayout.fold(spark, dir, "odd",
      ev.filter(col("user_id") % 2 =!= 0)))
    assert(!DdStoreLayout.fold(spark, dir, "odd",
      ev.filter(col("user_id") % 2 =!= 0)))
    val got = graft.queries.Events.ddQuantilesFrom(
      DdStoreLayout.read(spark, dir)).collect().map(_.toSeq)
    val expect = graft.queries.Events.q176.fn(spark, sf)
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.sameElements(expect),
      "quantiles over the store diverge from batch q176")
  }
}
