package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Live interval coverage + trailing EMA: pure advance kernels against
  * the batch formulas under random splits (coverage with the watermark
  * contract emulated; EMA under ARBITRARY reorderings — its state is an
  * order-free monoid), and the live mapGroupsWithState queries against
  * the oracle-checked batch q129/q132 on real fixture rows.
  */
class SeriesStreamSpec extends SparkSpec {

  private val D = SeriesStream.D

  private def bruteCov(evs: Seq[(Long, Long)]): (Long, Long, Long) = {
    val ts = evs.distinct.sorted.map(_._1)
    if (ts.isEmpty) (0L, 0L, 0L)
    else {
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      (ts.length.toLong, 1L + gaps.count(_ > D),
        gaps.map(g => math.min(D, g)).sum + D)
    }
  }

  test("covAdvance ≡ batch formula under random splits + watermark pruning") {
    val evGen = for {
      t <- Gen.chooseNum(0L, 8L * D)
      j <- Gen.chooseNum(0, 2) // deliberate time collisions
    } yield (t / 3 * 3 + j, 0L)
    val gen = for {
      evs <- Gen.listOfN(24, evGen)
      cuts <- Gen.listOfN(2, Gen.chooseNum(0, evs.length))
    } yield (evs.zipWithIndex.map { case ((t, _), i) => (t, i.toLong) },
      cuts.sorted)
    val prop = Prop.forAll(gen) { case (evs, cuts) =>
      val sorted = evs.sortBy(e => (e._1, e._2))
      val batches = Seq(
        sorted.take(cuts(0)),
        sorted.slice(cuts(0), cuts(1)),
        sorted.drop(cuts(1))).filter(_.nonEmpty)
      var st = SeriesStream.CovSt(0L, 0L, 0L, None, Seq.empty)
      var last = (0L, 0L, 0L)
      batches.zipWithIndex.foreach { case (b, i) =>
        val horizon = batches.drop(i + 1).flatten.map(_._1)
          .minOption.getOrElse(Long.MaxValue)
        val (next, out) = SeriesStream.covAdvance(st, b, horizon)
        assert(next.kept.forall(_._1 >= horizon))
        st = next; last = out
      }
      val expect = bruteCov(evs)
      if (last != expect)
        println(s"mismatch: got $last want $expect evs=$evs cuts=$cuts")
      last == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"covAdvance-vs-brute: ${res.status}")
  }

  test("covAdvance: replayed batch is a no-op within the kept window") {
    val b = Seq((10L, 1L), (20L, 2L), (10L * D, 3L))
    val (st1, o1) = SeriesStream.covAdvance(
      SeriesStream.CovSt(0L, 0L, 0L, None, Seq.empty), b, Long.MinValue)
    val (st2, o2) = SeriesStream.covAdvance(st1, b, Long.MinValue)
    assert(st1 == st2 && o1 == o2)
    assert(o1 == (3L, 2L, 10L + D + D)) // two islands: {10,20}, {10D}
  }

  test("emaAdvance ≡ batch formula under ARBITRARY splits and order") {
    val evGen = for {
      t <- Gen.chooseNum(0L, 500L)
      v <- Gen.chooseNum(0L, 1000L)
    } yield (t, v)
    val gen = for {
      n <- Gen.chooseNum(1, 60) // crosses the 40-term window
      evs <- Gen.listOfN(n, evGen)
      order <- Gen.listOfN(n, Gen.chooseNum(0, 1 << 20))
      cuts <- Gen.listOfN(2, Gen.chooseNum(0, n))
    } yield (evs.zipWithIndex.map { case ((t, v), i) => (t, i.toLong, v) },
      order, cuts.sorted)
    val prop = Prop.forAll(gen) { case (evs, order, cuts) =>
      // NO watermark contract: shuffle arbitrarily before cutting
      val shuffled = evs.zip(order).sortBy(_._2).map(_._1)
      val batches = Seq(
        shuffled.take(cuts(0)),
        shuffled.slice(cuts(0), cuts(1)),
        shuffled.drop(cuts(1))).filter(_.nonEmpty)
      var st = SeriesStream.EmaSt(Seq.empty)
      var last = (0L, 0L, 0L)
      batches.foreach { b =>
        val (next, out) = SeriesStream.emaAdvance(st, b)
        assert(next.top.length <= 40)
        st = next; last = out
      }
      val sorted = evs.sortBy(e => (e._1, e._2))
      val m = math.min(sorted.length, 40)
      // most-recent-first fold, q132's weighting (2^(m-1) on the
      // newest event)
      val win = sorted.takeRight(m).reverse
      val num = win.foldLeft(0L)((acc, e) => acc * 2L + e._3)
      last == ((m.toLong, num, (1L << m) - 1L))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"emaAdvance-vs-batch: ${res.status}")
  }

  private def bruteSweep(evs: Seq[(Long, Long)]): (Long, Long, Long) = {
    // all endpoints, (t, delta, eid) order, running sum, max + first pos
    val pts = evs.distinct.flatMap { case (t, eid) =>
      Seq((t, 1L, eid), (t + D, -1L, eid)) }.sorted
    var (r, m, p) = (0L, 0L, Long.MinValue)
    pts.foreach { case (t, d, _) =>
      r += d; if (r > m) { m = r; p = t }
    }
    (evs.distinct.length.toLong, m, p)
  }

  test("sweepAdvance ≡ brute sweep under random splits + watermark pruning") {
    val evGen = for {
      t <- Gen.chooseNum(0L, 3L * D)
    } yield t / 7 * 7 // deliberate endpoint collisions
    val gen = for {
      ts <- Gen.listOfN(20, evGen)
      cuts <- Gen.listOfN(2, Gen.chooseNum(0, ts.length))
    } yield (ts.zipWithIndex.map { case (t, i) => (t, i.toLong) },
      cuts.sorted)
    val prop = Prop.forAll(gen) { case (evs, cuts) =>
      val sorted = evs.sortBy(e => (e._1, e._2))
      val batches = Seq(
        sorted.take(cuts(0)),
        sorted.slice(cuts(0), cuts(1)),
        sorted.drop(cuts(1))).filter(_.nonEmpty)
      var st = SeriesStream.SweepSt(0L, 0L, Long.MinValue, 0L, Seq.empty)
      var last = (0L, 0L, 0L)
      batches.zipWithIndex.foreach { case (b, i) =>
        // the event-time watermark: min event time of future batches;
        // every endpoint of a future event sits at or above it
        val wm = batches.drop(i + 1).flatten.map(_._1)
          .minOption.getOrElse(Long.MaxValue)
        val pts = b.flatMap { case (t, eid) =>
          Seq((t, 1L, eid), (t + D, -1L, eid)) }
        val (next, out) = SeriesStream.sweepAdvance(st, pts, wm)
        assert(next.kept.forall(_._1 >= wm))
        st = next; last = out
      }
      val expect = bruteSweep(evs)
      if (last != expect)
        println(s"mismatch: got $last want $expect evs=$evs cuts=$cuts")
      last == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"sweepAdvance-vs-brute: ${res.status}")
  }

  test("brAdvance ≡ endpoint min/max under ARBITRARY splits and order") {
    val evGen = for {
      t <- Gen.chooseNum(0L, 500L)
      v <- Gen.chooseNum(-100L, 100L)
    } yield (t, v)
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      evs <- Gen.listOfN(n, evGen)
      order <- Gen.listOfN(n, Gen.chooseNum(0, 1 << 20))
      cuts <- Gen.listOfN(2, Gen.chooseNum(0, n))
    } yield (evs.zipWithIndex.map { case ((t, v), i) => (t, i.toLong, v) },
      order, cuts.sorted)
    val prop = Prop.forAll(gen) { case (evs, order, cuts) =>
      val shuffled = evs.zip(order).sortBy(_._2).map(_._1)
      // replay the first batch at the end: idempotent-merge exactness
      val batches = (Seq(
        shuffled.take(cuts(0)),
        shuffled.slice(cuts(0), cuts(1)),
        shuffled.drop(cuts(1))) ++ Seq(shuffled.take(cuts(0))))
        .filter(_.nonEmpty)
      var st = Option.empty[SeriesStream.BrSt]
      var last = (0L, 0L)
      batches.foreach { b =>
        val (next, out) = SeriesStream.brAdvance(st, b)
        st = Some(next); last = out
      }
      val f = evs.min
      val l = evs.max
      last == ((l._3 - f._3, l._1 - f._1))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"brAdvance-vs-endpoints: ${res.status}")
  }

  test("smAdvance: order-free map merge matches a single-batch fold") {
    val gen = for {
      n <- Gen.chooseNum(1, 50)
      evs <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0L, 9L)
        v <- Gen.chooseNum(-50L, 50L)
      } yield (k, v))
      order <- Gen.listOfN(n, Gen.chooseNum(0, 1 << 20))
      cut <- Gen.chooseNum(0, n)
    } yield (evs, order, cut)
    val prop = Prop.forAll(gen) { case (evs, order, cut) =>
      val shuffled = evs.zip(order).sortBy(_._2).map(_._1)
      val batches = Seq(shuffled.take(cut), shuffled.drop(cut))
        .filter(_.nonEmpty)
      var st = SeriesStream.SmSt(Map.empty)
      var last = (0L, 0L, "", "")
      batches.foreach { b =>
        val (next, out) = SeriesStream.smAdvance(st, b)
        st = next; last = out
      }
      val (_, once) = SeriesStream.smAdvance(
        SeriesStream.SmSt(Map.empty), evs)
      last == once
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"smAdvance-vs-once: ${res.status}")
  }

  test("live bounding ratio and sumMap converge to batch q140/q139") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    // q140 live: feed REVERSED batches — the endpoint monoid needs no
    // watermark to stay exact under gross disorder
    val bRows = graft.Tables(spark, sf, "events")
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        expr("ts_ns div 1000").as("t_us"), col("event_id"),
        floor(col("value") * 64).as("v"))
      .as[SeriesStream.BEv].collect().sortBy(e => (e.t_us, e.event_id))
    val (bb1, bb2) = bRows.splitAt(bRows.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msB = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SeriesStream.BEv]
    val lastBr =
      scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    val sqB = SeriesStream.startBoundingRatio(msB.toDS()) { (df, _) =>
      df.collect().foreach(r =>
        lastBr((r.getString(0), r.getString(1))) =
          (r.getLong(2), r.getLong(3)))
    }
    try {
      msB.addData(bb2.toIndexedSeq: _*)
      sqB.processAllAvailable()
      msB.addData(bb1.toIndexedSeq: _*)
      sqB.processAllAvailable()
    } finally sqB.stop()
    val expectBr = graft.queries.Events.q140.fn(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4)))
      .toMap
    assert(lastBr.nonEmpty && lastBr.keySet == expectBr.keySet)
    lastBr.foreach { case (k, got) =>
      assert(got == expectBr(k), s"$k: stream $got != batch ${expectBr(k)}")
    }

    // q139 live: shuffled single-delivery feed matches the batch rows
    val mRows = graft.Tables(spark, sf, "events")
      .select(col("event_type"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
          .as("k"),
        floor(col("value") * 64).as("v"))
      .filter(col("k").isNotNull)
      .select(col("event_type"), expr("k div 10").as("kb"), col("v"))
      .as[SeriesStream.MEv].collect()
    val shuffled = mRows.sortBy(e => (e.v * 2654435761L + e.kb).toInt)
    val (mb1, mb2) = shuffled.splitAt(shuffled.length / 2)
    val msM = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SeriesStream.MEv]
    val lastSm =
      scala.collection.mutable.Map.empty[String, (Long, Long, String, String)]
    val sqM = SeriesStream.startSumMap(msM.toDS()) { (df, _) =>
      df.collect().foreach(r =>
        lastSm(r.getString(0)) =
          (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    }
    try {
      msM.addData(mb1.toIndexedSeq: _*)
      sqM.processAllAvailable()
      msM.addData(mb2.toIndexedSeq: _*)
      sqM.processAllAvailable()
    } finally sqM.stop()
    val expectSm = graft.queries.Events.q139.fn(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(lastSm.nonEmpty && lastSm.keySet == expectSm.keySet)
    lastSm.foreach { case (k, got) =>
      assert(got == expectSm(k), s"$k: stream $got != batch ${expectSm(k)}")
    }
  }

  test("evicting bounding ratio: state pinned to the watermark horizon " +
      "under a multi-day replay (VERDICT r11 #6)") {
    import spark.implicits._
    // 2 types × 6 days, 3 events per group, fed day by day in order so
    // the watermark marches: without eviction state would hold 12
    // groups; with it, closed days reclaim and the state operator ends
    // with only the horizon's worth of rows.
    val dayUs = 86400000000L
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z in µs — t_us
    // must MATCH the day strings, or end-of-day timeouts never align
    // with the watermark the events actually advance
    def evs(d: Int): Seq[SeriesStream.BEv] =
      for {
        tp <- Seq("click", "view")
        j <- 0 until 3
      } yield SeriesStream.BEv(tp, f"2024-01-${d + 1}%02d",
        baseUs + d * dayUs + j * 3600000000L, d * 100L + j,
        (d * 10 + j).toLong)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SeriesStream.BEv]
    val ds = ms.toDF()
      .withColumn("et", timestamp_micros(col("t_us")))
      .withWatermark("et", "1 second")
      .as[SeriesStream.BEv]
    val last =
      scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    val sq = SeriesStream.startBoundingRatioEvicting(ds) { (df, _) =>
      df.collect().foreach(r =>
        last((r.getString(0), r.getString(1))) =
          (r.getLong(2), r.getLong(3)))
    }
    try {
      (0 until 6).foreach { d =>
        ms.addData(evs(d).toIndexedSeq: _*)
        sq.processAllAvailable()
      }
      // every group's LAST emitted row is the exact endpoint delta
      // (the final re-emit at eviction carries it too)
      for (d <- 0 until 6; tp <- Seq("click", "view")) {
        val got = last((tp, f"2024-01-${d + 1}%02d"))
        assert(got == ((2L, 2 * 3600000000L)),
          s"($tp, day $d): $got")
      }
      // the state operator holds only the un-evicted horizon: far
      // fewer than the 12 groups the stream created (the NoTimeout
      // variant would hold all 12 forever)
      val stateRows = sq.lastProgress.stateOperators
        .map(_.numRowsTotal).sum
      assert(stateRows <= 4,
        s"state holds $stateRows rows; eviction should cap it at the " +
          "watermark horizon (~2 types x <=2 open days)")
    } finally sq.stop()
  }

  test("smAdvance replay behind a batch-id ledger converges exactly once " +
      "(ADVICE r11 #4 — the documented JdbcRollup pairing)") {
    // smAdvance counts, so an at-least-once source that redelivers a
    // batch would double-count — exactly-once is the sink's job. The
    // documented composition: a SQL ledger claims each batch id with a
    // primary-key INSERT (JdbcRollup's discipline, ANSI SQLState 23505
    // on replay); only a successful claim advances the state.
    val url = "jdbc:derby:memory:smledger;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      try c.createStatement().execute("DROP TABLE sm_ledger")
      catch { case _: java.sql.SQLException => () }
      c.createStatement().execute(
        "CREATE TABLE sm_ledger (batch_id BIGINT NOT NULL PRIMARY KEY)")
    } finally c.close()
    def claim(id: Long): Boolean = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.prepareStatement(
          "INSERT INTO sm_ledger (batch_id) VALUES (?)")
        try { st.setLong(1, id); st.executeUpdate(); true }
        catch {
          case e: java.sql.SQLException if e.getSQLState == "23505" => false
        } finally st.close()
      } finally conn.close()
    }
    val b1 = Seq((1L, 5L), (2L, 7L))
    val b2 = Seq((1L, 3L), (9L, -4L))
    val b3 = Seq((2L, 1L))
    // at-least-once delivery: batch 2 arrives twice
    val delivered = Seq((1L, b1), (2L, b2), (2L, b2), (3L, b3))
    var st = SeriesStream.SmSt(Map.empty)
    var lastOut = (0L, 0L, "", "")
    delivered.foreach { case (id, b) =>
      if (claim(id)) {
        val (next, out) = SeriesStream.smAdvance(st, b)
        st = next; lastOut = out
      }
    }
    val (_, once) = SeriesStream.smAdvance(
      SeriesStream.SmSt(Map.empty), b1 ++ b2 ++ b3)
    assert(lastOut == once, "ledger-gated replay must equal single fold")
    // and the hazard is real: WITHOUT the ledger the replay drifts
    var stNo = SeriesStream.SmSt(Map.empty)
    var lastNo = (0L, 0L, "", "")
    delivered.foreach { case (_, b) =>
      val (next, out) = SeriesStream.smAdvance(stNo, b)
      stNo = next; lastNo = out
    }
    assert(lastNo != once, "unledgered replay double-counts (documented)")
  }

  test("live daily counts + movingSumOver converge to batch q163") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // shuffled single-delivery feed: the counter monoid is order-free
    val rows = graft.Tables(spark, sf, "events")
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_id"))
      .as[SeriesStream.DEv].collect()
    val shuffled = rows.sortBy(e => (e.event_id * 2654435761L).toInt)
    val (b1, b2) = shuffled.splitAt(shuffled.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SeriesStream.DEv]
    val lastCnt =
      scala.collection.mutable.Map.empty[(String, String), Long]
    val sq = SeriesStream.startDailyCounts(ms.toDS()) { (df, _) =>
      df.collect().foreach(r =>
        lastCnt((r.getString(0), r.getString(1))) = r.getLong(2))
    }
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    // downstream read: the q163 finale over the live table
    val live = lastCnt.toSeq.map { case ((tp, d), c) => (tp, d, c) }
      .toDF("event_type", "day", "c")
    val got = SeriesStream.movingSumOver(live)
      .orderBy(col("event_type"), col("day"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val expect = graft.queries.Events.q163.fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty && got.sameElements(expect),
      s"live moving sum diverges from batch q163 " +
        s"(${got.length} vs ${expect.length} rows)")
  }

  test("live daily counts + cusumFromDaily converge to batch q177") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // key the live series by day INDEX (the q177 axis); the counter
    // monoid is order-free so a shuffled single-delivery feed is exact
    val rows = graft.Tables(spark, sf, "events")
      .select(col("event_type"),
        expr("ts_ns div 86400000000000").cast("string").as("day"),
        col("event_id"))
      .as[SeriesStream.DEv].collect()
    val shuffled = rows.sortBy(e => (e.event_id * 2654435761L).toInt)
    val (b1, b2) = shuffled.splitAt(shuffled.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SeriesStream.DEv]
    val lastCnt =
      scala.collection.mutable.Map.empty[(String, String), Long]
    val sq = SeriesStream.startDailyCounts(ms.toDS()) { (df, _) =>
      df.collect().foreach(r =>
        lastCnt((r.getString(0), r.getString(1))) = r.getLong(2))
    }
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    // downstream read: the q177 CUSUM finale over the live table
    val live = lastCnt.toSeq.map { case ((tp, d), c) => (tp, d.toLong, c) }
      .toDF("event_type", "di", "c")
    val got = graft.queries.Events.cusumFromDaily(live)
      .collect().map(_.toSeq)
    val expect = graft.queries.Events.q177.fn(spark, sf)
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.sameElements(expect),
      s"live CUSUM diverges from batch q177 " +
        s"(${got.length} vs ${expect.length} rows)")
  }

  test("evicting daily counts: state pinned to the watermark horizon") {
    import spark.implicits._
    val dayUs = 86400000000L
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z in µs
    def evs(d: Int): Seq[SeriesStream.DEv] =
      for {
        tp <- Seq("click", "view")
        j <- 0 until 3
      } yield SeriesStream.DEv(tp, f"2024-01-${d + 1}%02d",
        d * 100L + j)
    def t(d: Int, j: Int): Long = baseUs + d * dayUs + j * 3600000000L
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, Long, Long)]
    val ds = ms.toDF()
      .toDF("event_type", "day", "event_id", "t_us")
      .withColumn("et", timestamp_micros(col("t_us")))
      .withWatermark("et", "1 second")
      .as[SeriesStream.DEv]
    val last = scala.collection.mutable.Map.empty[(String, String), Long]
    val sq = SeriesStream.startDailyCountsEvicting(ds) { (df, _) =>
      df.collect().foreach(r =>
        last((r.getString(0), r.getString(1))) = r.getLong(2))
    }
    try {
      (0 until 6).foreach { d =>
        ms.addData(evs(d).zipWithIndex.map { case (e, i) =>
          (e.event_type, e.day, e.event_id, t(d, i % 3))
        }.toIndexedSeq: _*)
        sq.processAllAvailable()
      }
      for (d <- 0 until 6; tp <- Seq("click", "view")) {
        val got = last((tp, f"2024-01-${d + 1}%02d"))
        assert(got == 3L, s"($tp, day $d): $got")
      }
      val stateRows = sq.lastProgress.stateOperators
        .map(_.numRowsTotal).sum
      assert(stateRows <= 4,
        s"state holds $stateRows rows; eviction should cap it at the " +
          "watermark horizon")
    } finally sq.stop()
  }

  test("live sweep over fixture events converges to batch q130") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.Tables(spark, sf, "events")
      .select(col("event_type"), expr("ts_ns div 1000").as("t_us"),
        col("event_id"))
      .as[SeriesStream.TEv].collect().sortBy(e => (e.t_us, e.event_id))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SeriesStream.TEv]
    val ds = ms.toDF()
      .withColumn("et", timestamp_micros(col("t_us")))
      .withWatermark("et", "1 second")
      .as[SeriesStream.TEv]
    val last = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    val sq = SeriesStream.startSweep(ds) { (df, _) =>
      df.collect().foreach(r =>
        last(r.getString(0)) = (r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    val expect = graft.queries.Events.q130.fn(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(last.nonEmpty && last.keySet == expect.keySet)
    last.foreach { case (tp, got) =>
      assert(got == expect(tp), s"type $tp: stream $got != batch ${expect(tp)}")
    }
  }

  test("live streams over fixture events converge to batch q129/q132") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.Tables(spark, sf, "events")
      .select(col("user_id"), expr("ts_ns div 1000").as("t_us"),
        col("event_id"), floor(col("value") * 64).as("v"))
      .as[SeriesStream.Ev].collect().sortBy(e => (e.t_us, e.event_id))
    assert(rows.length > 20, "fixture too small")
    val (b1, b2) = rows.splitAt(rows.length / 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val msC = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SeriesStream.Ev]
    val dsC = msC.toDF()
      .withColumn("et", timestamp_micros(col("t_us")))
      .withWatermark("et", "1 second")
      .as[SeriesStream.Ev]
    val lastCov = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val sqC = SeriesStream.startCoverage(dsC) { (df, _) =>
      df.collect().foreach(r =>
        lastCov(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    try {
      msC.addData(b1.toIndexedSeq: _*)
      sqC.processAllAvailable()
      msC.addData(b2.toIndexedSeq: _*)
      sqC.processAllAvailable()
    } finally sqC.stop()
    val expectCov = graft.queries.Events.q129.fn(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(lastCov.nonEmpty && lastCov.keySet == expectCov.keySet)
    lastCov.foreach { case (u, got) =>
      assert(got == expectCov(u),
        s"user $u: stream $got != batch ${expectCov(u)}")
    }

    // EMA: deliberately feed the batches in REVERSED order — the
    // monoid state must absorb gross disorder without a watermark
    val msE = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SeriesStream.Ev]
    val lastEma = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val sqE = SeriesStream.startEma(msE.toDS()) { (df, _) =>
      df.collect().foreach(r =>
        lastEma(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    try {
      msE.addData(b2.toIndexedSeq: _*)
      sqE.processAllAvailable()
      msE.addData(b1.toIndexedSeq: _*)
      sqE.processAllAvailable()
    } finally sqE.stop()
    val expectEma = graft.queries.Events.q132.fn(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(lastEma.nonEmpty && lastEma.keySet == expectEma.keySet)
    lastEma.foreach { case (u, got) =>
      assert(got == expectEma(u),
        s"user $u: stream $got != batch ${expectEma(u)}")
    }
  }
}
