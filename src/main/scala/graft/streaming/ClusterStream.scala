package graft.streaming

import graft.sources.{BandIndexLayout, LabelStoreLayout}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous dedup CLUSTERING — the full loop, stored end-to-end:
  * each micro-batch of arriving documents (1) probes the LANDED band
  * index for every verified near-dup pair it is involved in
  * ([[BandIndexLayout.probePairs]] — batch×corpus directory-pruned,
  * plus batch-internal), (2) FOLDS those pairs into the LANDED
  * component labeling ([[LabelStoreLayout.fold]] — only touched
  * partitions rewrite), and (3) APPENDS its own band postings so the
  * next batch sees it. Between batches, all state lives in storage —
  * no driver or executor memory carries the corpus, which is the only
  * posture that survives a 100 TB corpus and an unbounded stream.
  *
  * Probe strictly before append, or batch-internal pairs
  * double-report (the [[EditDedupStream.startStored]] note); fold
  * order vs append is immaterial (the labeling never reads bands).
  *
  * Parity contract (ClusterStreamSpec): after any sequence of
  * micro-batches, the landed labeling equals a from-scratch
  * `Dedup.connectedComponents` over the full corpus's
  * `minhashNearDups` pairs — the q55 semantics, reached
  * incrementally.
  */
object ClusterStream {

  def start(bandDir: String, labelDir: String, stream: DataFrame,
      textCol: String, idCol: String, threshold: Double)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // PIN the probe result before mutating the index it reads:
          // append's write triggers refreshByPath on bandDir, which
          // invalidates any cached plan referencing it — a later read
          // of a merely-persisted result would silently recompute
          // against the batch's OWN postings (self-pairs). The local
          // checkpoint cuts the lineage to the path entirely.
          val pairs = BandIndexLayout.probePairs(spark, bandDir, batch,
            textCol, idCol, threshold).localCheckpoint(true)
          LabelStoreLayout.fold(spark, labelDir, pairs, "a", "b")
          BandIndexLayout.append(batch, textCol, idCol, bandDir)
          sink(pairs, id)
          // results are consumed — drain the epoch's result caches or
          // an unbounded stream pins one set per epoch forever
          graft.pipeline.Similarity.releaseResult()
        }
      }
      .start()
}
