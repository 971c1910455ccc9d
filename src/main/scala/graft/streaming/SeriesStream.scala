package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, round}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Live interval/series aggregates — q129 (interval-union coverage) and
  * q132 (exact trailing EMA) maintained over an event stream with
  * `mapGroupsWithState`, the [[FunnelStream]] discipline: bounded
  * per-user state with an EXACT finalization argument, pure advance
  * kernels property-checked against the batch formulas, and e2e parity
  * with the oracle-checked batch queries.
  *
  * Coverage state is (finalized prefix sums, the LAST finalized time,
  * kept events ≥ the watermark). Why the bound is exact: a pair of
  * consecutive sorted times (a, b) with b < watermark is FINAL — any
  * future arrival sits at or above the watermark > b, so nothing can
  * ever land between them — while the pair bridging the last finalized
  * time to the first kept event stays recomputable (the kept side may
  * still change). State per user is O(events within one watermark
  * delay), not O(stream).
  *
  * EMA state is the top-40 events by (t_us, event_id) — a monoid fold
  * (merge, sort, take 40), so late and replayed arrivals are handled
  * exactly WITHOUT a watermark: a replayed event either is already in
  * the kept set (distinct no-op) or sorts below the 40th and is
  * dropped. `m = kept.size` equals min(distinct events seen, 40) under
  * replays for the same reason. State is 40 entries forever.
  */
object SeriesStream {

  /** One event: time in µs (the q129/q132 grain), unique event id, and
    * the scaled integer value v = floor(value·64) (unused by coverage).
    */
  case class Ev(user_id: Long, t_us: Long, event_id: Long, v: Long)

  val D = 300000000L // 5 min in µs, q129's interval length

  // ---------------------------------------------------------------- q129

  /** Finalized-prefix coverage state: `partial` = Σ min(D, gap) over
    * finalized consecutive pairs, `gapsOverD` = #{finalized gaps > D},
    * `nDone` finalized events, `lastT` = last finalized time (the
    * bridge anchor), `kept` = (t, eid) at or above the horizon.
    */
  case class CovSt(partial: Long, gapsOverD: Long, nDone: Long,
      lastT: Option[Long], kept: Seq[(Long, Long)])

  /** Pure transition: merge, finalize below `horizon`, emit the
    * CURRENT (n_events, n_islands, covered_us) — batch-q129-equal on
    * the events seen so far.
    */
  def covAdvance(st: CovSt, incoming: Seq[(Long, Long)],
      horizon: Long): (CovSt, (Long, Long, Long)) = {
    val all = (st.kept ++ incoming).distinct.sorted
    val (done, keep) = all.partition(_._1 < horizon)
    def pairs(ts: Seq[Long]): (Long, Long) =
      if (ts.length < 2) (0L, 0L)
      else ts.zip(ts.tail).foldLeft((0L, 0L)) { case ((s, g), (a, b)) =>
        (s + math.min(D, b - a), if (b - a > D) g + 1 else g)
      }
    val doneChain = st.lastT.toSeq ++ done.map(_._1)
    val (addS, addG) = pairs(doneChain)
    val next = CovSt(st.partial + addS, st.gapsOverD + addG,
      st.nDone + done.length,
      done.lastOption.map(_._1).orElse(st.lastT), keep)
    val liveChain = next.lastT.toSeq ++ keep.map(_._1)
    val (liveS, liveG) = pairs(liveChain)
    val n = next.nDone + keep.length
    val out =
      if (n == 0) (0L, 0L, 0L)
      else (n, 1L + next.gapsOverD + liveG, next.partial + liveS + D)
    (next, out)
  }

  /** Attach live coverage to an event stream. `events` must carry a
    * watermark on an event-time column derived from `t_us` for the
    * horizon to advance; without one, state holds the full history
    * (still correct, unbounded).
    */
  def coverage(events: Dataset[Ev]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[CovSt, (Long, Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[CovSt]) =>
          val horizon = scala.util.Try(state.getCurrentWatermarkMs())
            .getOrElse(0L) match {
            case 0 => Long.MinValue
            case wm => wm * 1000L // ms → µs
          }
          val (next, (n, isl, cov)) = covAdvance(
            state.getOption.getOrElse(CovSt(0L, 0L, 0L, None, Seq.empty)),
            it.map(e => (e.t_us, e.event_id)).toSeq, horizon)
          state.update(next)
          (uid, n, isl, cov)
      }
      .toDF("user_id", "n_events", "n_islands", "covered_us")
  }

  def startCoverage(events: Dataset[Ev])(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    coverage(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  // ---------------------------------------------------------------- q132

  /** Top-40 events by (t_us, event_id), DESCENDING. */
  case class EmaSt(top: Seq[(Long, Long, Long)])

  /** Pure transition: monoid merge of the kept window. Emits
    * (m, ema_num, ema_den) — batch-q132-equal on the events seen so
    * far, regardless of arrival order or replays.
    */
  def emaAdvance(st: EmaSt, incoming: Seq[(Long, Long, Long)])
      : (EmaSt, (Long, Long, Long)) = {
    val top = (st.top ++ incoming).distinct
      .sortBy(e => (-e._1, -e._2)).take(40)
    val m = top.length
    // fold MOST-RECENT-FIRST: the first element of an acc·2 + v fold
    // is doubled m-1 times, so descending order puts 2^(m-1) on the
    // most recent event — q132's weighting
    val num = top.foldLeft(0L)((acc, e) => acc * 2L + e._3)
    (EmaSt(top), (m.toLong, num, (1L << m) - 1L))
  }

  def ema(events: Dataset[Ev]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EmaSt, (Long, Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[EmaSt]) =>
          val (next, (m, num, den)) = emaAdvance(
            state.getOption.getOrElse(EmaSt(Seq.empty)),
            it.map(e => (e.t_us, e.event_id, e.v)).toSeq)
          state.update(next)
          (uid, m, num, den)
      }
      .toDF("user_id", "m", "ema_num", "ema_den")
  }

  def startEma(events: Dataset[Ev])(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    ema(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  // ---------------------------------------------------------------- q130

  /** One typed event for the sweep (key = event_type). */
  case class TEv(event_type: String, t_us: Long, event_id: Long)

  /** Finalized sweep-prefix state: the running endpoint sum after all
    * finalized endpoints, the max so far and the FIRST time it was
    * reached, the finalized interval (start-endpoint) count, and kept
    * endpoints (t, delta, eid) at or above the horizon.
    */
  case class SweepSt(run: Long, mx: Long, pos: Long, nDone: Long,
      kept: Seq[(Long, Long, Long)])

  /** Pure transition for the q130 sweep. Every endpoint with
    * t < watermark is FINAL: an arriving event has event time ≥
    * watermark and creates endpoints at t and t + D, both ≥ watermark,
    * so nothing can ever be inserted before the horizon — the running
    * sum, max, and first-peak position commit exactly. Emits the
    * CURRENT (n_intervals, max_concurrent, first_peak_us), batch-q130-
    * equal on the events seen so far.
    */
  def sweepAdvance(st: SweepSt, incoming: Seq[(Long, Long, Long)],
      horizon: Long): (SweepSt, (Long, Long, Long)) = {
    val all = (st.kept ++ incoming).distinct.sorted
    val (done, keep) = all.partition(_._1 < horizon)
    def fold(run0: Long, mx0: Long, pos0: Long,
        pts: Seq[(Long, Long, Long)]): (Long, Long, Long) =
      pts.foldLeft((run0, mx0, pos0)) { case ((r, m, p), (t, d, _)) =>
        val r2 = r + d
        if (r2 > m) (r2, r2, t) else (r2, m, p)
      }
    val (run1, mx1, pos1) = fold(st.run, st.mx, st.pos, done)
    val next = SweepSt(run1, mx1, pos1,
      st.nDone + done.count(_._2 == 1L), keep)
    val (_, mx2, pos2) = fold(run1, mx1, pos1, keep)
    val n = next.nDone + keep.count(_._2 == 1L)
    (next, (n, mx2, pos2))
  }

  /** Attach the live sweep to an event stream; requires a watermark on
    * an event-time column derived from `t_us` for finalization (state
    * is unbounded but still correct without one).
    */
  def sweep(events: Dataset[TEv]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[SweepSt, (String, Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (tp: String, it: Iterator[TEv], state: GroupState[SweepSt]) =>
          val horizon = scala.util.Try(state.getCurrentWatermarkMs())
            .getOrElse(0L) match {
            case 0 => Long.MinValue
            case wm => wm * 1000L
          }
          val (next, (n, mx, pos)) = sweepAdvance(
            state.getOption.getOrElse(
              SweepSt(0L, 0L, Long.MinValue, 0L, Seq.empty)),
            it.flatMap(e => Seq((e.t_us, 1L, e.event_id),
              (e.t_us + D, -1L, e.event_id))).toSeq, horizon)
          state.update(next)
          (tp, n, mx, pos)
      }
      .toDF("event_type", "n_intervals", "max_concurrent", "first_peak_us")
  }

  def startSweep(events: Dataset[TEv])(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    sweep(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  // ---------------------------------------------------------------- q140

  /** One typed+dated event for the live bounding ratio (key =
    * (event_type, day), q140's grouping).
    */
  case class BEv(event_type: String, day: String, t_us: Long,
      event_id: Long, v: Long)

  /** Endpoint state: the min and max (t_us, event_id, v) seen so far.
    * Lexicographic min/max over the unique (t_us, event_id) prefix is
    * a commutative idempotent monoid, so late and replayed arrivals
    * are EXACT without any watermark — a replayed endpoint merges to
    * itself, an out-of-order one simply takes its place. State is two
    * triples PER KEY; the (type, day) key space grows one key per day
    * per type. [[boundingRatio]] keeps NoTimeout so arbitrarily late
    * replays stay exact; [[boundingRatioEvicting]] is the bounded-key
    * deployment shape (VERDICT r11 #6): closed days evict at the
    * event-time watermark, state is O(types × days inside the
    * horizon) forever — at the cost of an arrival later than the
    * declared watermark recreating a partial (wrong-endpoint) row,
    * exactly the lateness contract the watermark declares.
    */
  case class BrSt(fT: Long, fE: Long, fV: Long,
      lT: Long, lE: Long, lV: Long)

  /** Pure transition: merge endpoints, emit the CURRENT (dv, dt_us) —
    * batch-q140-equal on the events seen so far, regardless of
    * arrival order or replays.
    */
  def brAdvance(st: Option[BrSt], incoming: Seq[(Long, Long, Long)])
      : (BrSt, (Long, Long)) = {
    // a timeout invocation (empty incoming, state present) re-emits
    // the current delta; state AND input both empty has no answer
    require(st.nonEmpty || incoming.nonEmpty,
      "brAdvance needs existing state or at least one event")
    val all = st.map(s => Seq((s.fT, s.fE, s.fV), (s.lT, s.lE, s.lV)))
      .getOrElse(Seq.empty) ++ incoming
    val f = all.min
    val l = all.max
    (BrSt(f._1, f._2, f._3, l._1, l._2, l._3), (l._3 - f._3, l._1 - f._1))
  }

  /** Attach the live q140 bounding ratio to an event stream. */
  def boundingRatio(events: Dataset[BEv]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.event_type, e.day))
      .mapGroupsWithState[BrSt, (String, String, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: (String, String), it: Iterator[BEv],
            state: GroupState[BrSt]) =>
          val (next, (dv, dt)) = brAdvance(state.getOption,
            it.map(e => (e.t_us, e.event_id, e.v)).toSeq)
          state.update(next)
          (key._1, key._2, dv, dt)
      }
      .toDF("event_type", "day", "dv", "dt_us")
  }

  def startBoundingRatio(events: Dataset[BEv])(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    boundingRatio(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  /** Bounded-key live q140: a (type, day) group EVICTS once the
    * event-time watermark passes the end of its day — the group is
    * final by the watermark contract (no arrival below the watermark),
    * so the last emitted row already carries the exact endpoints and
    * the state slot is reclaimed. Requires `events` to carry a
    * watermark on an event-time column; state is O(types × watermark
    * horizon in days) no matter how many days the stream spans.
    */
  def boundingRatioEvicting(events: Dataset[BEv]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.event_type, e.day))
      .mapGroupsWithState[BrSt, (String, String, Long, Long)](
        GroupStateTimeout.EventTimeTimeout) {
        (key: (String, String), it: Iterator[BEv],
            state: GroupState[BrSt]) =>
          if (state.hasTimedOut) {
            // the watermark passed end-of-day: re-emit the final exact
            // row and reclaim the slot
            val s = state.get
            state.remove()
            (key._1, key._2, s.lV - s.fV, s.lT - s.fT)
          } else {
            val (next, (dv, dt)) = brAdvance(state.getOption,
              it.map(e => (e.t_us, e.event_id, e.v)).toSeq)
            state.update(next)
            val endOfDayMs = java.time.LocalDate.parse(key._2)
              .plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC)
              .toInstant.toEpochMilli
            // a timeout timestamp must sit above the current watermark
            // (a late-created group whose day already closed times out
            // on the next trigger)
            state.setTimeoutTimestamp(
              math.max(endOfDayMs, state.getCurrentWatermarkMs() + 1))
            (key._1, key._2, dv, dt)
          }
      }
      .toDF("event_type", "day", "dv", "dt_us")
  }

  def startBoundingRatioEvicting(events: Dataset[BEv])(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    boundingRatioEvicting(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  // ---------------------------------------------------------------- q139

  /** One event for the live map merge (key = event_type; kb/v are
    * q139's bucketed map key and scaled integer value).
    */
  case class MEv(event_type: String, kb: Long, v: Long)

  /** Per-key sums — a commutative Map-monoid, so arrival ORDER never
    * matters; like [[CmStream]] (and unlike the min/max and register
    * states) the semantics are counting, so a replayed batch adds
    * again — exactly-once delivery is the sink's job (JdbcRollup's
    * batch-id ledger is the worked example). State is ≤10 keys by
    * q139's bucket construction — geometry-bounded forever.
    */
  case class SmSt(sums: Map[Long, Long])

  /** Pure transition: merge the incoming (kb, v) pairs, emit the
    * CURRENT q139 row (n_keys, tot_v, canonical serialized arrays).
    */
  def smAdvance(st: SmSt, incoming: Seq[(Long, Long)])
      : (SmSt, (Long, Long, String, String)) = {
    val sums = incoming.foldLeft(st.sums) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    val sorted = sums.toSeq.sorted
    (SmSt(sums), (sorted.length.toLong, sorted.map(_._2).sum,
      sorted.map(_._1).mkString(","), sorted.map(_._2).mkString(",")))
  }

  /** Attach the live q139 sumMap to an event stream. */
  def sumMap(events: Dataset[MEv]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[SmSt, (String, Long, Long, String, String)](
        GroupStateTimeout.NoTimeout) {
        (tp: String, it: Iterator[MEv], state: GroupState[SmSt]) =>
          val (next, (n, tot, ks, vs)) = smAdvance(
            state.getOption.getOrElse(SmSt(Map.empty)),
            it.map(e => (e.kb, e.v)).toSeq)
          state.update(next)
          (tp, n, tot, ks, vs)
      }
      .toDF("event_type", "n_keys", "tot_v", "map_keys", "map_sums")
  }

  def startSumMap(events: Dataset[MEv])(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    sumMap(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  // ---------------------------------------------------------------- q163

  /** One event for the live daily-count series (key = (type, day)). */
  case class DEv(event_type: String, day: String, event_id: Long)

  /** Daily count per (type, day) — a commutative counter monoid, so
    * arrival ORDER never matters; like [[SmSt]] the semantics are
    * counting, so a replayed batch adds again — exactly-once delivery
    * is the sink's job (the batch-id ledger composition demonstrated
    * for smAdvance in SeriesStreamSpec applies verbatim). State is one
    * long per (type, day); [[dailyCountsEvicting]] is the bounded-key
    * deployment shape (closed days reclaim at the watermark, the
    * [[boundingRatioEvicting]] contract).
    */
  case class CntSt(n: Long)

  /** Pure transition: add the batch's arrivals, emit the CURRENT
    * count.
    */
  def cntAdvance(st: Option[CntSt], arrived: Long): (CntSt, Long) = {
    val next = CntSt(st.map(_.n).getOrElse(0L) + arrived)
    (next, next.n)
  }

  /** Live (type, day, c) counts — the q163 day SERIES maintained as
    * the stream lands. The moving-sum finale ([[movingSumOver]]) is a
    * downstream read over this live table: state here is one counter
    * per key, and the window runs on calendar-bounded summary rows
    * exactly like batch q163.
    */
  def dailyCounts(events: Dataset[DEv]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.event_type, e.day))
      .mapGroupsWithState[CntSt, (String, String, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: (String, String), it: Iterator[DEv],
            state: GroupState[CntSt]) =>
          val (next, n) = cntAdvance(state.getOption, it.size.toLong)
          state.update(next)
          (key._1, key._2, n)
      }
      .toDF("event_type", "day", "c")
  }

  def startDailyCounts(events: Dataset[DEv])(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    dailyCounts(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  /** Bounded-key live day series: a (type, day) group evicts once the
    * event-time watermark passes its end of day (final by the
    * watermark contract — the [[boundingRatioEvicting]] shape), so
    * state is O(types × horizon days) however long the stream runs.
    */
  def dailyCountsEvicting(events: Dataset[DEv]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.event_type, e.day))
      .mapGroupsWithState[CntSt, (String, String, Long)](
        GroupStateTimeout.EventTimeTimeout) {
        (key: (String, String), it: Iterator[DEv],
            state: GroupState[CntSt]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            (key._1, key._2, s.n)
          } else {
            val (next, n) = cntAdvance(state.getOption, it.size.toLong)
            state.update(next)
            val endOfDayMs = java.time.LocalDate.parse(key._2)
              .plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC)
              .toInstant.toEpochMilli
            state.setTimeoutTimestamp(
              math.max(endOfDayMs, state.getCurrentWatermarkMs() + 1))
            (key._1, key._2, n)
          }
      }
      .toDF("event_type", "day", "c")
  }

  def startDailyCountsEvicting(events: Dataset[DEv])(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    dailyCountsEvicting(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  /** The q163 moving-window finale over ANY (event_type, day, c)
    * frame — the identical 7-row window and fixed-divisor average the
    * batch query runs, so live-table ∘ this ≡ batch q163 per prefix
    * (spec-pinned). Runs on day-series summary rows only.
    */
  def movingSumOver(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("mov_sum", org.apache.spark.sql.functions.sum(col("c"))
        .over(w))
      .select(col("event_type"), col("day"), col("c"), col("mov_sum"),
        round(col("mov_sum").cast("double") / 7.0, 6).as("mov_avg"))
  }
}
