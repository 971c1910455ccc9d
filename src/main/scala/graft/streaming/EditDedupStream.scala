package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental edit-distance near-dup — q105 run live: each
  * micro-batch of arriving documents is checked for ≤ k-edit
  * revisions of the history corpus (and of itself) as it lands — the
  * online "is this a small revision of something we already hold"
  * triage at ingest time.
  *
  * foreachBatch is the right streaming shape for the same reason as
  * [[AnnStream]]: the probe is a stateless per-epoch join of the
  * batch's anchors against the corpus's positional sliding-gram
  * index — no watermark or state store, results final on arrival. At
  * scale the history half of that index is the STORED inverted
  * char-gram table (q105's posture); it is re-derived per epoch here
  * only because the harness keeps no external index state.
  *
  * Parity contract (EditDedupStreamSpec): a micro-batch's emitted
  * pairs are row-identical to the batch API
  * `Dedup.incrementalEditNearDups(history, batch, …)` on the same
  * rows — the candidate generation and the thresholded verify are
  * deterministic, so streaming changes nothing but the arrival
  * cadence.
  */
object EditDedupStream {

  def start(history: DataFrame, stream: DataFrame, textCol: String,
      idCol: String, k: Int = 10, q: Int = 16)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          sink(Dedup.incrementalEditNearDups(history, batch,
            textCol, idCol, k, q), id)
          // consumed — drain this epoch's result cache
          graft.pipeline.Similarity.releaseResult()
        }
      }
      .start()

  /** [[start]] against the STORED index (round 11): each micro-batch
    * probes a [[graft.sources.GramIndexLayout]] on disk instead of
    * re-deriving the history index per epoch — the caveat the
    * stateless form documents, closed. Probing and landing compose:
    * a caller that also wants the stream folded into the index calls
    * `GramIndexLayout.append` in the same sink after probing (probe
    * first, append second, or batch-internal pairs double-report).
    */
  def startStored(indexDir: String, stream: DataFrame, textCol: String,
      idCol: String, k: Int = 10, q: Int = 16)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          sink(graft.sources.GramIndexLayout.probe(batch.sparkSession,
            indexDir, batch, textCol, idCol, k, q), id)
          graft.pipeline.Similarity.releaseResult()
        }
      }
      .start()
}
