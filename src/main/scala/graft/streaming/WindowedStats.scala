package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Extended (non-parity) event-time streaming analytics. The
  * reference's own streaming is processing-time only — ticker flush,
  * no watermarks, no late-data rules (SURVEY §2.5,
  * clickhouse_table_writer.go:91-96) — but a training-data pipeline
  * over event streams needs the two Structured Streaming state shapes:
  *
  *  - watermarked tumbling-window aggregation: per-window state is
  *    kept only until the watermark passes the window end, so state is
  *    bounded at any corpus rate and late data is dropped
  *    deterministically;
  *  - explicit per-key state via mapGroupsWithState, for running
  *    aggregates the built-in windowed model can't express.
  *
  * Both run on the same micro-batch engine as LandingIngest, so they
  * compose downstream of the transcode pipeline.
  */
object WindowedStats {

  /** Tumbling event-time aggregation with a watermark: counts and
    * value sums per (window, key). State for a window is dropped once
    * the watermark (max event time - delay) passes its end; rows
    * arriving later than that are discarded, never double-counted
    * (WindowedStatsSpec pins both).
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, watermarkDelay: String,
      valueCol: String = "value"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("w_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** Streaming corpus drift monitor — the finishing fold of q91's χ²
    * homogeneity test run live: feed [[windowedCounts]] (keyed on a
    * bucket column, e.g. quality deciles) through a memory/foreachBatch
    * sink, then fold the FINALIZED (w_start, bucket, n) rows against a
    * static reference histogram `(bucket, ref_n)` — "did the crawl
    * change shape under me" as a per-window number. Expected counts
    * are the reference PROPORTIONS scaled to each window's total, so
    * windows of any size compare against the same reference shape, and
    * zero-count buckets contribute their full expectation (a vanished
    * decile must raise the alarm, not dodge it). The fold runs on
    * windows × buckets rows — tiny at any corpus rate; per-bucket
    * χ² terms are the q91 IEEE chain over integer counts and the
    * per-window sum goes through the decimal accumulator so it cannot
    * depend on partitioning.
    */
  def chi2Drift(windowCounts: DataFrame, reference: DataFrame): DataFrame = {
    val wc = windowCounts.select(col("w_start"), col("bucket"), col("n"))
    val refTot = reference.agg(sum(col("ref_n")).cast("double")
      .as("ref_total"))
    // rename the aggregate's key so the (windows × ref-buckets) grid
    // shares no attribute with the probe side of the left join below
    val wTot = wc.groupBy(col("w_start")).agg(sum(col("n")).as("w_total"))
      .select(col("w_start").as("_w"), col("w_total"))
    val grid = wTot.crossJoin(broadcast(
        reference.select(col("bucket").as("_b"), col("ref_n"))))
      .crossJoin(broadcast(refTot))
    val joined = grid
      .join(wc, grid("_w") === wc("w_start") && grid("_b") === wc("bucket"),
        "left")
      .select(col("_w").as("w_start"), col("_b").as("bucket"),
        coalesce(col("n"), lit(0L)).as("n0"),
        col("w_total"), col("ref_n"), col("ref_total"))
    val e = col("w_total").cast("double") *
      (col("ref_n").cast("double") / col("ref_total"))
    val d = col("n0").cast("double") - e
    joined.withColumn("contrib", d * d / e)
      .groupBy(col("w_start"))
      .agg(graft.queries.dsum(col("contrib")).as("chi2"),
        count(lit(1)).as("n_buckets"))
  }

  final case class Running(n: Long, total: Double, max: Double)
  final case class KeyStats(key: String, n: Long, total: Double, max: Double)

  /** Per-key running stats with explicit state: the
    * KeyValueGroupedDataset.mapGroupsWithState shape for custom state
    * machines (session tracking, dedup windows, rate stats). State
    * lives in the state store per key; each micro-batch folds its rows
    * into the prior state and emits the updated snapshot.
    */
  def runningStats(events: Dataset[(String, Double)]): Dataset[KeyStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[Running, KeyStats](GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[Running]) =>
          var s = state.getOption.getOrElse(Running(0L, 0.0, Double.MinValue))
          rows.foreach { case (_, v) =>
            s = Running(s.n + 1, s.total + v, math.max(s.max, v))
          }
          state.update(s)
          KeyStats(key, s.n, s.total, s.max)
      }
  }

  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, total: Double)
  final case class Session(key: String, startMs: Long, endMs: Long,
      n: Long, total: Double)

  /** Streaming gap-sessionization via flatMapGroupsWithState — the
    * 0..N-output state shape (mapGroupsWithState emits exactly one row
    * per touched key; closing sessions needs zero-or-more). Semantics
    * mirror the batch q42 sessionizer (session_window): a session
    * closes when a gap > `gapMs` separates consecutive events of a
    * key. Event-time timeout closes the last session of an idle key
    * once the watermark passes lastMs + gapMs — so state is bounded
    * and every session is emitted exactly once, both pinned by
    * WindowedStatsSpec.
    *
    * Input rows: (key, eventTime, value). The event-time column must
    * keep its caller-set watermark tag into this operator (convert to
    * epoch only inside — a projection like unix_millis(ts) sheds the
    * tag and fails analysis).
    */
  def sessionize(events: Dataset[(String, java.sql.Timestamp, Double)],
      gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp, Double)],
         state: GroupState[OpenSession]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed lastMs + gap: the open session can never
            // be extended — close and clear
            val s = state.get
            state.remove()
            Iterator.single(Session(key, s.startMs, s.lastMs, s.n, s.total))
          } else {
            val closed = Iterator.newBuilder[Session]
            var open = state.getOption
            // fold this batch's rows in event-time order; a gap closes
            // the open session and starts the next
            rows.map(r => (r._1, r._2.getTime, r._3)).toSeq
              .sortBy(r => (r._2, r._3)).foreach { case (_, t, v) =>
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  // clamp both bounds: a CROSS-batch out-of-order event
                  // (older than lastMs but above the watermark) must
                  // extend the session backwards, never rewind lastMs —
                  // a rewound lastMs resets the event-time timeout into
                  // the past and closes the session early with a wrong
                  // end. Within-gap-of-span late events merge; the
                  // watermark bounds how far back that reaches.
                  open = Some(OpenSession(math.min(s.startMs, t),
                    math.max(s.lastMs, t), s.n + 1, s.total + v))
                case Some(s) =>
                  closed += Session(key, s.startMs, s.lastMs, s.n, s.total)
                  open = Some(OpenSession(t, t, 1L, v))
                case None =>
                  open = Some(OpenSession(t, t, 1L, v))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close once no on-time event can extend it
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result()
          }
      }
  }

  /** Stream-stream interval join — the STREAMING half of the band-join
    * story (batch form: operators/RangeJoin, driver q51): left rows
    * match right rows of the same key whose event time lies within
    * [leftTs - before, leftTs + after]. Both sides carry watermarks,
    * and the time-range predicate is what lets Spark BOUND the join
    * state: a buffered right row can be evicted once the watermark
    * guarantees no future left row's interval can reach it (state is
    * rows-per-watermark-horizon, not rows-ever). Without the range
    * condition a stream-stream inner join would buffer both streams
    * forever. Output columns: key, left `l_` payload, right `r_`
    * payload (timestamps included) — append mode, emitted as matches
    * become final.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, watermarkDelay: String,
      before: String, after: String, leftPrefix: String = "l_",
      rightPrefix: String = "r_"): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay)
      .select(col(key) +: left.columns.toIndexedSeq.filter(_ != key)
        .map(c => col(c).as(s"$leftPrefix$c")): _*)
    val r = right.withWatermark(tsCol, watermarkDelay)
      .select(col(key).as(s"$rightPrefix$key") +:
        right.columns.toIndexedSeq.filter(_ != key)
          .map(c => col(c).as(s"$rightPrefix$c")): _*)
    l.join(r,
      col(key) === col(s"$rightPrefix$key") &&
        col(s"$rightPrefix$tsCol") >=
          col(s"$leftPrefix$tsCol") - expr(s"INTERVAL $before") &&
        col(s"$rightPrefix$tsCol") <=
          col(s"$leftPrefix$tsCol") + expr(s"INTERVAL $after"))
      .drop(s"$rightPrefix$key")
  }

  /** Ingest-time exact dedup with BOUNDED state: first row per dedup
    * key passes, duplicates arriving within `watermarkDelay` of it are
    * dropped, and each key's state is evicted once the watermark
    * passes its event time + delay — so state size is (keys seen per
    * delay window), not (keys ever seen), which is what makes dedup
    * at ingest survivable at 100 TB/day. The documented trade: a
    * duplicate arriving later than the delay after its original is
    * NOT suppressed (its state is gone) — the batch-side exact dedup
    * (q21/q55) catches those. This is the streaming half of the §2.6
    * dedup story, composable after the transcode stage exactly like
    * the reference's ingest pipeline (decode → bind → buffer → sink).
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      dedupCols: Seq[String], watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(dedupCols)

  /** Streaming incremental dedup — the live half of q75/q86: dedup
    * the crawl AS IT LANDS against the already-landed corpus. Two
    * stages, both bounded-state: (1) within-stream collapse via
    * watermarked dropDuplicates (first ARRIVAL wins — the streaming
    * analog of batch min-id, which has no meaning before all ids have
    * arrived); (2) a stream-static LEFT ANTI join against the history
    * digest table — static side re-read per micro-batch, so a
    * compaction/refresh of the digest table is picked up without
    * restarting the query (at scale: the q86 Bloom front-end cuts the
    * probe before this join the same way). Bodies never enter state:
    * both stages key on the 32-byte sha256 digest.
    */
  def incrementalDedupStream(incoming: DataFrame, history: DataFrame,
      textCol: String, tsCol: String, watermarkDelay: String): DataFrame = {
    val hist = history.select(sha2(col(textCol), 256).as("digest")).distinct()
    incoming.withColumn("digest", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("digest"))
      .join(hist, Seq("digest"), "left_anti")
      .drop("digest")
  }
}
