package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming windowFunnel — q112 run live: per-user maximum funnel
  * depth (step1 → step2 → …, each later step strictly after the
  * previous in (ts_ns, event_id) chain order and within `windowNs` of
  * the FIRST step), maintained incrementally over an event stream with
  * `mapGroupsWithState`.
  *
  * State is NOT the user's whole history. Per user it holds:
  *
  *  - `best` — the depth already finalized, and
  *  - the events with `ts_ns >= horizon`, where
  *    `horizon = watermark − windowNs`.
  *
  * Why that bound is exact: a chain anchored at `t1 < horizon` can
  * only use events `<= t1 + windowNs < watermark`, all of which have
  * arrived (the watermark contract) — so such chains are COMPLETE and
  * fold into `best` before their events are dropped; and every
  * still-open chain is anchored at `t1 >= horizon`, and any event it
  * can use sits at or after its anchor, so the kept set suffices.
  * State per user is O(events in one window), not O(stream) — the
  * shape that survives an unbounded stream — while out-of-order
  * arrivals within the watermark reorder freely (the kept set is
  * re-sorted each batch) and replayed events dedup via `distinct`.
  *
  * Parity contract (FunnelStreamSpec): after the stream drains, the
  * last emitted depth per user equals the oracle-checked batch q112 on
  * the same rows, under any batch split and any pre-watermark
  * reordering.
  */
object FunnelStream {

  case class Ev(user_id: Long, ts_ns: Long, event_id: Long,
      event_type: String)

  /** (best-so-far, kept events ascending in (ts_ns, event_id)). */
  case class St(best: Int, evs: Seq[(Long, Long, String)])

  /** Greedy max funnel depth over `evs` SORTED in chain order,
    * considering only chains anchored at a step-1 event with
    * `anchorFrom <= ts_ns < anchorUntil`. Greedy earliest-next-step is
    * optimal for a fixed anchor (taking the earliest candidate never
    * removes later options), so the max over anchors is the true
    * maximum.
    */
  def depth(evs: IndexedSeq[(Long, Long, String)], steps: Seq[String],
      windowNs: Long, anchorFrom: Long = Long.MinValue,
      anchorUntil: Long = Long.MaxValue): Int = {
    var best = 0
    var i = 0
    while (i < evs.length) {
      val (t1, _, tp) = evs(i)
      if (tp == steps.head && t1 >= anchorFrom && t1 < anchorUntil) {
        var d = 1
        var j = i + 1
        while (d < steps.length && j < evs.length &&
            evs(j)._1 <= t1 + windowNs) {
          if (evs(j)._3 == steps(d)) d += 1
          j += 1
        }
        if (d > best) best = d
      }
      i += 1
    }
    best
  }

  /** One state transition: merge `incoming` into `st`, finalize every
    * chain anchored below `horizonNs` into `best`, drop events below
    * the horizon. Returns the new state and the user's current max
    * depth (finalized ∨ still-open). Pure — FunnelStreamSpec
    * property-checks it against a chain-enumerating brute force under
    * random splits and reorderings.
    */
  def advance(st: St, incoming: Seq[(Long, Long, String)],
      steps: Seq[String], windowNs: Long, horizonNs: Long): (St, Int) = {
    val all = (st.evs ++ incoming).distinct.sortBy(e => (e._1, e._2))
      .toIndexedSeq
    // chains anchored below the horizon are complete (every event they
    // can use is <= anchor + window < watermark, hence in `all`)
    val best = math.max(st.best,
      depth(all, steps, windowNs, anchorUntil = horizonNs))
    val kept = all.filter(_._1 >= horizonNs)
    val open = depth(kept, steps, windowNs)
    (St(best, kept), math.max(best, open))
  }

  /** Attach the live funnel to an event stream. `events` must carry a
    * watermark on an event-time column derived from `ts_ns` (the spec
    * uses `timestamp_micros(ts_ns div 1000)`) for the horizon to
    * advance; with no watermark the horizon stays at -inf and state
    * holds the full per-user history (still correct, unbounded).
    */
  def attach(events: Dataset[Ev], steps: Seq[String],
      windowNs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[St, (Long, Int)](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[St]) =>
          // getCurrentWatermarkMs THROWS on a stream with no watermark
          // (rather than returning 0) — both spell "no horizon yet"
          val horizon = scala.util.Try(state.getCurrentWatermarkMs())
            .getOrElse(0L) match {
            case 0 => Long.MinValue // no watermark (yet)
            case wm => wm * 1000000L - windowNs
          }
          val (next, d) = advance(
            state.getOption.getOrElse(St(0, Seq.empty)),
            it.map(e => (e.ts_ns, e.event_id, e.event_type)).toSeq,
            steps, windowNs, horizon)
          state.update(next)
          (uid, d)
      }
      .toDF("user_id", "funnel_depth")
  }

  /** Convenience: run the stream to a sink via update-mode output. */
  def start(events: Dataset[Ev], steps: Seq[String], windowNs: Long)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    attach(events, steps, windowNs).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()
}
