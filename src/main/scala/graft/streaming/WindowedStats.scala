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
}
