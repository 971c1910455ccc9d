package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Streaming windowFunnel: the pure advance kernel against a
  * chain-enumerating brute force under random batch splits (with the
  * watermark contract emulated), and the live mapGroupsWithState query
  * against the oracle-checked batch q112 on real fixture rows.
  */
class FunnelStreamSpec extends SparkSpec {

  private val Steps = Seq("view", "click", "purchase")
  private val W = 6L * 3600 * 1000000000L

  /** Independent reference: enumerate EVERY chain (no greedy
    * assumption) — max depth over all anchors and all subsequences.
    */
  private def brute(evs: Seq[(Long, Long, String)], steps: Seq[String],
      w: Long): Int = {
    val sorted = evs.distinct.sortBy(e => (e._1, e._2))
    def ext(anchor: (Long, Long, String), cur: (Long, Long, String),
        level: Int): Int =
      if (level == steps.length) level
      else {
        val cands = sorted.filter(e =>
          (e._1 > cur._1 || (e._1 == cur._1 && e._2 > cur._2)) &&
            e._1 <= anchor._1 + w && e._3 == steps(level))
        if (cands.isEmpty) level
        else cands.map(c => ext(anchor, c, level + 1)).max
      }
    val starts = sorted.filter(_._3 == steps.head)
    if (starts.isEmpty) 0 else starts.map(s => ext(s, s, 1)).max
  }

  test("advance ≡ brute force under random splits + watermark pruning") {
    val w = 100L
    val types = Gen.oneOf("view", "click", "purchase", "noise")
    val evGen = for {
      ts <- Gen.chooseNum(0L, 400L)
      tp <- types
    } yield (ts, tp)
    val gen = for {
      evs <- Gen.listOfN(24, evGen)
      cuts <- Gen.listOfN(2, Gen.chooseNum(0, evs.length))
    } yield (evs.zipWithIndex.map { case ((ts, tp), i) => (ts, i.toLong, tp) },
      cuts.sorted)
    val prop = Prop.forAll(gen) { case (evs, cuts) =>
      // the watermark contract: batch k's events all sit at or above
      // the watermark BEFORE batch k arrives — emulate a perfect
      // watermark by sorting events by ts and cutting the sorted list
      val sorted = evs.sortBy(e => (e._1, e._2))
      val batches = Seq(
        sorted.take(cuts(0)),
        sorted.slice(cuts(0), cuts(1)),
        sorted.drop(cuts(1))).filter(_.nonEmpty)
      var st = FunnelStream.St(0, Seq.empty)
      var last = 0
      batches.zipWithIndex.foreach { case (b, i) =>
        // wm after batch i = min ts of future batches (nothing below
        // it will ever arrive); the last batch closes the stream
        val wm = batches.drop(i + 1).flatten.map(_._1)
          .minOption.getOrElse(Long.MaxValue - w)
        val (next, d) = FunnelStream.advance(st, b, Steps, w, wm - w)
        // state bound: nothing below the horizon is retained
        assert(next.evs.forall(_._1 >= wm - w))
        st = next; last = d
      }
      val expect = brute(evs, Steps, w)
      if (last != expect)
        println(s"mismatch: got $last want $expect evs=$evs cuts=$cuts")
      last == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"advance-vs-brute: ${res.status}")
  }

  test("replayed batch is a no-op (distinct dedup)") {
    val b = Seq((10L, 1L, "view"), (20L, 2L, "click"), (30L, 3L, "purchase"))
    val (st1, d1) = FunnelStream.advance(
      FunnelStream.St(0, Seq.empty), b, Steps, 100L, Long.MinValue)
    val (st2, d2) = FunnelStream.advance(st1, b, Steps, 100L, Long.MinValue)
    assert(d1 == 3 && d2 == 3 && st1 == st2)
  }

  test("live stream over fixture events converges to batch q112") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.Tables(spark, sf, "events")
      .filter(col("event_type").isin(Steps.map(x => x: Any): _*))
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type"))
      .as[FunnelStream.Ev].collect().sortBy(e => (e.ts_ns, e.event_id))
    assert(rows.length > 20, "fixture too small")
    val (b1, b2) = rows.splitAt(rows.length / 2) // time-ordered split:
    // watermark contract holds across the cut by construction

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[FunnelStream.Ev]
    val ds = ms.toDF()
      .withColumn("et", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("et", "1 second")
      .as[FunnelStream.Ev]
    val last = scala.collection.mutable.Map.empty[Long, Int]
    val sq = FunnelStream.start(ds, Steps, W) { (df, _) =>
      df.collect().foreach(r => last(r.getLong(0)) = r.getInt(1))
    }
    try {
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
    } finally sq.stop()

    // parity: q112 on the same sf dir, restricted to users that HAVE
    // step events (users without any never emit on the stream)
    val expect = graft.queries.Events.q112.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val emitted = last.keySet
    assert(emitted.nonEmpty)
    emitted.foreach { u =>
      assert(last(u) == expect(u),
        s"user $u: stream ${last(u)} != batch ${expect(u)}")
    }
    // every user with a positive batch depth must have emitted
    expect.filter(_._2 > 0).keys.foreach(u => assert(emitted.contains(u)))
  }

  test("an unbounded window turns the funnel into live sequenceMatch (q114)") {
    // q114 = signup →* error →* purchase with NO window: FunnelStream
    // with an effectively-infinite window and those steps computes the
    // same chain, so depth==3 ⇔ matched — one operator serves both
    // ClickHouse combinators
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val steps = Seq("signup", "error", "purchase")
    val rows = graft.Tables(spark, sf, "events")
      .filter(col("event_type").isin(steps.map(x => x: Any): _*))
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type"))
      .as[FunnelStream.Ev].collect().sortBy(e => (e.ts_ns, e.event_id))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[FunnelStream.Ev]
    // no watermark: the horizon stays at -inf, full-history state —
    // correct for the windowless combinator (nothing ever finalizes)
    val last = scala.collection.mutable.Map.empty[Long, Int]
    val sq = FunnelStream.start(ms.toDS(), steps, Long.MaxValue / 4) {
      (df, _) => df.collect().foreach(r => last(r.getLong(0)) = r.getInt(1))
    }
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      ms.addData(b1.toIndexedSeq: _*)
      sq.processAllAvailable()
      ms.addData(b2.toIndexedSeq: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    val expect = graft.queries.Events.q114.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(last.nonEmpty)
    last.foreach { case (u, d) =>
      assert((if (d == 3) 1 else 0) == expect(u),
        s"user $u: stream depth $d vs q114 matched=${expect(u)}")
    }
  }
}
