package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming Count-Min: the live table equals the batch sketch over
  * the same rows after every prefix, and update-mode only re-emits
  * touched cells.
  */
class CmStreamSpec extends SparkSpec {

  test("streamed CM table converges to the batch sketch per prefix") {
    import spark.implicits._
    val words = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(graft.pipeline.TextOps.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .as[String].collect()
    assert(words.length > 100)
    val (b1, b2) = words.splitAt(words.length / 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    // latest update per cell wins — the converged table
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    var lastEmit = 0
    val sq = CmStream.start(ms.toDF().toDF("w")) { (df, _) =>
      val rows = df.collect()
      lastEmit = rows.length
      rows.foreach(r =>
        cells((r.getInt(0), r.getLong(1))) = r.getLong(2))
    }
    def batchTable(ws: Seq[String]): Map[(Int, Long), Long] =
      CmStream.table(ws.toDF("w")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(cells.toMap == batchTable(b1.toSeq),
        "prefix 1: stream table != batch table")
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(cells.toMap == batchTable(words.toSeq),
        "full stream: table != batch table")
      // geometry bound: never more cells than depth x width
      assert(cells.size <= 3 * 16)
      // update mode: the second emit only carries touched cells
      assert(lastEmit <= 3 * 16)
    } finally sq.stop()
  }

  test("stream -> ledgered CM store is exactly-once end to end: " +
      "micro-batches fold under their ids, a replayed micro-batch is " +
      "a no-op, the landed cells equal the batch sketch") {
    import spark.implicits._
    val words = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(graft.pipeline.TextOps.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .as[String].collect()
    val (b1, b2) = words.splitAt(words.length / 2)
    val dir = java.nio.file.Files
      .createTempDirectory("cmstream-store-").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val sq = CmStream.startStore(ms.toDF().toDF("w"), dir)
    def cellsOf(df: org.apache.spark.sql.DataFrame)
        : Map[(Int, Long), Long] =
      df.collect().map(r =>
        (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    val direct = cellsOf(CmStream.table(words.toSeq.toDF("w")))
    val stored = cellsOf(
      graft.sources.CmStoreLayout.read(spark, dir))
    assert(stored == direct, "landed store != direct batch sketch")
    // the foreachBatch restart case: the SAME micro-batch id is
    // re-delivered — the ledger must make the replay a no-op (an
    // unledgered additive fold would double-count, LedgerStoreSpec)
    assert(!graft.sources.CmStoreLayout.fold(spark, dir,
      "cm-micro-1", b2.toSeq.toDF("w")),
      "replayed micro-batch must be refused by the ledger")
    assert(cellsOf(graft.sources.CmStoreLayout.read(spark, dir)) == direct,
      "replayed micro-batch changed the landed cells")
  }

  test("stream -> ledgered timing and DD stores: micro-batch folds land, " +
      "replays are no-ops, stored quantile finales equal batch q172/q176") {
    import spark.implicits._
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    val (b1, b2) = ev.splitAt(ev.length / 2)
    val tDir = java.nio.file.Files
      .createTempDirectory("timingstream-store-").toString
    val dDir = java.nio.file.Files
      .createTempDirectory("ddstream-store-").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val src = ms.toDF().toDF("event_type", "value")
    val sqT = TimingStream.startStore(src, tDir)
    val sqD = DdStream.startStore(src, dDir)
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sqT.processAllAvailable(); sqD.processAllAvailable()
      ms.addData(b2.toIndexedSeq: _*)
      sqT.processAllAvailable(); sqD.processAllAvailable()
    } finally { sqT.stop(); sqD.stop() }
    val gotT = graft.queries.Events.timingQuantilesFrom(
      graft.sources.TimingStoreLayout.read(spark, tDir))
      .collect().map(_.toSeq)
    val wantT = graft.queries.Events.q172
      .fn(spark, "/root/testdata/sf0.001").collect().map(_.toSeq)
    assert(gotT.nonEmpty && gotT.sameElements(wantT),
      "stored timing quantiles diverge from batch q172")
    val gotD = graft.queries.Events.ddQuantilesFrom(
      graft.sources.DdStoreLayout.read(spark, dDir))
      .collect().map(_.toSeq)
    val wantD = graft.queries.Events.q176
      .fn(spark, "/root/testdata/sf0.001").collect().map(_.toSeq)
    assert(gotD.nonEmpty && gotD.sameElements(wantD),
      "stored DD quantiles diverge from batch q176")
    // replayed micro-batch ids are ledger no-ops on both stores
    val replay = b2.toSeq.toDF("event_type", "value")
    assert(!graft.sources.TimingStoreLayout.fold(spark, tDir,
      "timing-micro-1", replay))
    assert(!graft.sources.DdStoreLayout.fold(spark, dDir,
      "dd-micro-1", replay))
  }

  test("streamed HLL registers converge to the batch register table") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("text"))
      .as[(String, String)].collect()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val regs = scala.collection.mutable.Map.empty[(String, Long), Int]
    val sq = HllStream.start(ms.toDF().toDF("source", "text")) { (df, _) =>
      df.collect().foreach(r =>
        regs((r.getString(0), r.getLong(1))) = r.getInt(2))
    }
    def batch(rows: Seq[(String, String)]): Map[(String, Long), Int] =
      graft.queries.Pipeline.hllRegistersOf(rows.toDF("source", "text"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2))
        .toMap
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(regs.toMap == batch(b1.toSeq))
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(regs.toMap == batch(docs.toSeq),
        "drained stream registers != batch registers")
    } finally sq.stop()
  }

  test("streamed contingency table converges per prefix; the q148 finale " +
      "over it equals the batch statistic") {
    import spark.implicits._
    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), col("props"))
      .as[(String, String)].collect()
    assert(events.length > 100)
    val (b1, b2) = events.splitAt(events.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val cells = scala.collection.mutable.Map.empty[(String, Long), Long]
    var lastEmit = 0
    val sq = ContingencyStream.start(
      ms.toDF().toDF("event_type", "props")) { (df, _) =>
      val rows = df.collect()
      lastEmit = rows.length
      rows.foreach(r =>
        cells((r.getString(0), r.getLong(1))) = r.getLong(2))
    }
    def batch(rows: Seq[(String, String)]): Map[(String, Long), Long] =
      ContingencyStream.table(rows.toDF("event_type", "props"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    def vOf(cellsNow: Map[(String, Long), Long]): Seq[org.apache.spark.sql.Row] =
      graft.queries.Events.cramersVFromCont(
        cellsNow.toSeq.map { case ((t, kb), n) => (t, kb, n) }
          .toDF("event_type", "kb", "n")).collect().toSeq
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(cells.toMap == batch(b1.toSeq),
        "prefix 1: stream contingency != batch contingency")
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(cells.toMap == batch(events.toSeq),
        "full stream: contingency != batch contingency")
      // the downstream read over the live table IS the batch statistic
      assert(vOf(cells.toMap) == vOf(batch(events.toSeq)),
        "cramersV finale over the live table != batch")
      // geometry bound: the fixture's 5 types x 10 buckets
      assert(cells.size <= 50)
      assert(lastEmit <= 50)
    } finally sq.stop()
  }

  test("streamed mixture counts converge per prefix; the q183 α-weight " +
      "finale over the live table equals the batch answer") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("text"))
      .as[(String, String)].collect()
    assert(docs.length > 100)
    val (b1, b2) = docs.splitAt(docs.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val counts = scala.collection.mutable.Map.empty[String, Long]
    var lastEmit = 0
    val sq = MixStream.start(ms.toDF().toDF("source", "text")) { (df, _) =>
      val rows = df.collect()
      lastEmit = rows.length
      rows.foreach(r => counts(r.getString(0)) = r.getLong(1))
    }
    def batch(rows: Seq[(String, String)]): Map[String, Long] =
      MixStream.counts(rows.toDF("source", "text"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def weightsOf(c: Map[String, Long]): Seq[org.apache.spark.sql.Row] =
      graft.queries.Pipeline.alphaWeightsFromCounts(
        c.toSeq.toDF("source", "n_tokens")).collect().toSeq
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(counts.toMap == batch(b1.toSeq),
        "prefix 1: stream counts != batch counts")
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(counts.toMap == batch(docs.toSeq),
        "full stream: counts != batch counts")
      // the downstream read over the live table IS the batch q183
      assert(weightsOf(counts.toMap) == weightsOf(batch(docs.toSeq)),
        "α-weight finale over the live table != batch")
      // geometry bound: one row per source
      val nSources = docs.map(_._1).distinct.length
      assert(counts.size <= nSources)
      assert(lastEmit <= nSources)
    } finally sq.stop()
  }

  test("streamed Benford digit table converges per prefix; the q178 χ² " +
      "finale over the live table equals the batch statistic") {
    import spark.implicits._
    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    assert(events.length > 100)
    val (b1, b2) = events.splitAt(events.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val cells = scala.collection.mutable.Map.empty[(String, Long), Long]
    var lastEmit = 0
    val sq = BenfordStream.start(
      ms.toDF().toDF("event_type", "value")) { (df, _) =>
      val rows = df.collect()
      lastEmit = rows.length
      rows.foreach(r =>
        cells((r.getString(0), r.getLong(1))) = r.getLong(2))
    }
    def batch(rows: Seq[(String, Double)]): Map[(String, Long), Long] =
      BenfordStream.table(rows.toDF("event_type", "value"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    def chiOf(c: Map[(String, Long), Long]): Seq[org.apache.spark.sql.Row] =
      graft.queries.Events.benfordFromCounts(
        c.toSeq.map { case ((t, d), o) => (t, d, o) }
          .toDF("event_type", "digit", "o")).collect().toSeq
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(cells.toMap == batch(b1.toSeq),
        "prefix 1: stream digit table != batch")
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(cells.toMap == batch(events.toSeq),
        "full stream: digit table != batch")
      assert(chiOf(cells.toMap) == chiOf(batch(events.toSeq)),
        "Benford finale over the live table != batch")
      // geometry bound: 9 digits × the fixture's 5 types
      assert(cells.size <= 45)
      assert(lastEmit <= 45)
    } finally sq.stop()
  }

  test("streamed audience bitmaps converge per prefix, survive a replay " +
      "bit-identically, and the q171 algebra over them equals batch") {
    import spark.implicits._
    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)].collect()
    assert(events.length > 100)
    val (b1, b2) = events.splitAt(events.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val words = scala.collection.mutable.Map.empty[(String, Long), Long]
    val sq = BitmapStream.start(
      ms.toDF().toDF("event_type", "user_id")) { (df, _) =>
      df.collect().foreach(r =>
        words((r.getString(0), r.getLong(1))) = r.getLong(2))
    }
    def batch(rows: Seq[(String, Long)]): Map[(String, Long), Long] =
      BitmapStream.words(rows.toDF("event_type", "user_id"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    def algebra(ws: Map[(String, Long), Long]): Seq[org.apache.spark.sql.Row] =
      graft.queries.Events.audienceAlgebraFromWords(
        ws.toSeq.map { case ((t, w), bm) => (t, w, bm) }
          .toDF("event_type", "w", "bm")).collect().toSeq
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(words.toMap == batch(b1.toSeq),
        "prefix 1: stream words != batch words")
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
      val drained = words.toMap
      assert(drained == batch(events.toSeq),
        "full stream: words != batch words")
      // the downstream set algebra over the live table IS the batch
      // q171 answer over the same rows
      assert(algebra(drained) == algebra(batch(events.toSeq)),
        "audience algebra over the live table != batch")
      // bit_or is idempotent: replaying a whole batch (at-least-once
      // delivery) cannot flip a bit — no sink-side ledger needed
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      assert(words.toMap == drained,
        "replay changed the word table — bit_or idempotence broken")
      // state bound: audience/64 words per type
      val types = events.map(_._1).distinct.length
      val maxUid = events.map(_._2).max
      assert(words.size <= types * (maxUid / 64 + 1))
    } finally sq.stop()
  }

  test("streamed timing histogram and DDSketch table converge to batch " +
      "per prefix, state bounded by sketch geometry") {
    import spark.implicits._
    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    assert(events.length > 100)
    val (b1, b2) = events.splitAt(events.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msT = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val msD = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val tcells = scala.collection.mutable.Map.empty[(String, Long), Long]
    val dcells = scala.collection.mutable.Map.empty[(String, Long), Long]
    val sqT = TimingStream.start(
      msT.toDF().toDF("event_type", "value")) { (df, _) =>
      df.collect().foreach(r =>
        tcells((r.getString(0), r.getLong(1))) = r.getLong(2))
    }
    val sqD = DdStream.start(
      msD.toDF().toDF("event_type", "value")) { (df, _) =>
      df.collect().foreach(r =>
        dcells((r.getString(0), r.getLong(1))) = r.getLong(3))
    }
    def batchT(rows: Seq[(String, Double)]): Map[(String, Long), Long] =
      graft.queries.Events.timingHistOf(rows.toDF("event_type", "value"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    def batchD(rows: Seq[(String, Double)]): Map[(String, Long), Long] =
      graft.queries.Events.ddBucketsOf(
          rows.toDF("event_type", "value"),
          graft.queries.Events.ddBounds(spark))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
        .toMap
    try {
      msT.addData(b1.toIndexedSeq: _*); sqT.processAllAvailable()
      msD.addData(b1.toIndexedSeq: _*); sqD.processAllAvailable()
      assert(tcells.toMap == batchT(b1.toSeq),
        "prefix 1: timing table != batch")
      assert(dcells.toMap == batchD(b1.toSeq),
        "prefix 1: DD table != batch (hist-first batch vs row-level live)")
      msT.addData(b2.toIndexedSeq: _*); sqT.processAllAvailable()
      msD.addData(b2.toIndexedSeq: _*); sqD.processAllAvailable()
      assert(tcells.toMap == batchT(events.toSeq),
        "full stream: timing table != batch")
      assert(dcells.toMap == batchD(events.toSeq),
        "full stream: DD table != batch")
      // geometry bounds: 1024 + 1813 + 1 timing cells, 643 γ buckets
      val types = events.map(_._1).distinct.length
      assert(tcells.size <= types * 2838)
      assert(dcells.size <= types * 643)
    } finally { sqT.stop(); sqD.stop() }
  }
}
