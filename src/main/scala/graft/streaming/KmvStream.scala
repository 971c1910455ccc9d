package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming KMV — q121's bottom-k distinct sketch maintained live,
  * completing the live-sketch triad next to [[CmStream]] and
  * [[HllStream]]. Unlike those two, bottom-k is NOT a grouped
  * aggregate over a fixed key space (the sketch holds the k smallest
  * distinct VALUES, not per-cell counts), so the built-in stateful
  * aggregation can't carry it; the operator is `mapGroupsWithState`
  * with the canonical sketch state: one sorted array of ≤ k hashes
  * per source — 64 longs, bounded forever however long the stream
  * runs. Insert rule is insert-if-smaller-and-absent, which is also
  * what makes upstream dedup unnecessary: a duplicate hash is either
  * already in the state row or above its max, so the (stream-
  * unbounded) distinct of the batch path simply disappears.
  *
  * Merge order cannot matter — the sketch is the bottom-k of the set
  * of hashes seen, a pure function of the set — so micro-batch
  * boundaries and replays leave it unchanged; KmvStreamSpec pins
  * stream ≡ batch after every prefix. Estimates stay a downstream
  * read (q121's (k−1)·M/h_k over the emitted row), like a production
  * sketch store: the stream maintains sketches, not numbers. And
  * because KMV sketches are mergeable set-expressible objects (q123),
  * the emitted rows can feed the pairwise union/intersection matrix
  * without touching the stream again.
  */
object KmvStream {

  val K = 64

  /** M = 2^60: hashes are 15 md5 hex digits, uniform on [0, M). */
  val M: Double = 1152921504606846976d

  /** Per-source live sketch rows: (source, sorted bottom-k hashes).
    * `docs` must be a streaming frame with source + text columns.
    */
  def sketches(docs: DataFrame): Dataset[(String, Array[Long])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.queries.Pipeline.kmvHashProjection(docs)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Array[Long])](
        GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, Long)],
         state: GroupState[Array[Long]]) =>
          val kept = scala.collection.mutable.TreeSet.empty[Long]
          state.getOption.foreach(kept ++= _)
          rows.foreach { case (_, h) =>
            if (kept.size < K) kept += h
            else if (h < kept.last && !kept.contains(h)) {
              kept += h
              kept -= kept.last
            }
          }
          val arr = kept.toArray // TreeSet iterates ascending
          state.update(arr)
          (source, arr)
      }
  }

  /** q121's estimator over one emitted sketch row — exact below k. */
  def estimate(sketch: Array[Long]): Double =
    if (sketch.length < K) sketch.length.toDouble
    else (K - 1).toDouble * M / sketch.last.toDouble

  def start(docs: DataFrame)(
      sink: (Dataset[(String, Array[Long])], Long) => Unit): StreamingQuery =
    sketches(docs).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()
}
