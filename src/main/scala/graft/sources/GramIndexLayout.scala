package graft.sources

import graft.pipeline.Dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

/** The edit-dedup family's STORED inverted char-gram index — the
  * scale posture its scaladocs assume ("at 100 TB the sliding index
  * is the stored table; the harness recomputes it only because it is
  * stateless"), made executable:
  *
  *  - `index/`  — the positional sliding-gram index (sid, slen, spos,
  *    gh, bkt), parquet PARTITIONED by `bucket` = pmod(gh, nBuckets)
  *    and sorted within files by (gh, bkt): a probe that knows its
  *    anchor grams reads ONLY the buckets they hash into (directory
  *    pruning), and row-group stats skip inside a bucket;
  *  - `stats/`  — the (gh, df) posting-count sidecar, the rarity
  *    table anchor selection reads (the q37 rarest-first discipline)
  *    without a per-query aggregation pass;
  *  - `docs/`   — the length-floored (id, text) projection, bucketed
  *    the same way ids shuffle in the verify join (at scale this is
  *    the landed corpus itself; it lives in the layout so the index
  *    is self-contained for verification).
  *
  * Build once per corpus, probe per batch: [[probe]] is the stored
  * form of `Dedup.incrementalEditNearDups` and returns the IDENTICAL
  * pair set (candidate completeness is anchor-selection-agnostic; the
  * exact levenshtein verify fixes the output), which is why q106
  * shares q105's oracle.
  */
object GramIndexLayout {

  /** Lookup-path threshold: the largest distinct batch gram set whose
    * literals are pushed into the sorted stats/index reads. Bounds
    * the probe's driver-side collect AND the pushed predicate size —
    * parquet materializes an In filter as a recursively built
    * or-chain, so thousands of literals stack-overflow the scan
    * (measured at ~4k); 256 covers the single-document lookup shape
    * (a ~400-char doc has ~25 grid grams) with an order of magnitude
    * of headroom. Batches past it take the plain-join plan, the
    * right one when the batch rivals the index.
    */
  val LookupGrams = 256

  /** Land the index/stats/docs triple for `docs`. Returns `dir`.
    * `nBuckets = 0` (default) derives the bucket count from the doc
    * count and records it in the layout sidecar ([[LayoutMeta]]).
    */
  def write(docs: DataFrame, textCol: String, idCol: String, dir: String,
      k: Int = 10, q: Int = 16, nBuckets0: Int = 0): String = {
    val minLen = (k + 1) * q + k
    val d = Dedup.editProject(docs, textCol, idCol, minLen)
    val nBuckets =
      if (nBuckets0 > 0) nBuckets0 else LayoutMeta.nBucketsFor(d.count())
    LayoutMeta.writeNBuckets(dir, nBuckets)
    Dedup.editSliding(d, k, q)
      .withColumn("bucket", pmod(col("gh"), lit(nBuckets)).cast("int"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("gh"), col("bkt"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/index")
    val spark = docs.sparkSession
    // df from the landed index (one columnar read of gh), not a
    // second explode of the corpus; range-sorted by gh so a probe
    // that pushes gram literals skips row groups
    spark.read.parquet(s"$dir/index")
      .groupBy("gh").agg(count(lit(1)).as("df"))
      .repartitionByRange(8, col("gh"))
      .sortWithinPartitions(col("gh"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    d.write.mode("overwrite").parquet(s"$dir/docs")
    d.unpersist(blocking = false)
    dir
  }

  /** Fold an arriving batch INTO the stored index — the lifecycle
    * step between probes (land batch → probe next batch against the
    * grown index): new postings append into the same bucket
    * directories (parquet append under partitionBy — no rewrite of
    * existing parts; the background part-merge is
    * `LandingIngest.compact`'s job, per bucket), the corpus
    * projection appends, and the df sidecar refreshes. The sidecar
    * refresh here re-aggregates the landed index (one columnar read
    * of gh); at 100 TB it is a merge-add of the batch's own counts
    * into the stats table — the cheaper form the harness skips
    * because stats/ has no key-value store behind it.
    */
  def append(docs: DataFrame, textCol: String, idCol: String, dir: String,
      k: Int = 10, q: Int = 16, nBuckets0: Int = 0): String = {
    val nBuckets =
      if (nBuckets0 > 0) nBuckets0 else LayoutMeta.readNBuckets(dir)
    val minLen = (k + 1) * q + k
    val d = Dedup.editProject(docs, textCol, idCol, minLen)
    Dedup.editSliding(d, k, q)
      .withColumn("bucket", pmod(col("gh"), lit(nBuckets)).cast("int"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("gh"), col("bkt"))
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$dir/index")
    d.write.mode("append").parquet(s"$dir/docs")
    val spark = docs.sparkSession
    // derives from index/, not stats/ — safe to overwrite stats/
    spark.read.parquet(s"$dir/index")
      .groupBy("gh").agg(count(lit(1)).as("df"))
      .repartitionByRange(8, col("gh"))
      .sortWithinPartitions(col("gh"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    d.unpersist(blocking = false)
    dir
  }

  /** The stored form of `Dedup.incrementalEditNearDups`: an arriving
    * batch is checked for ≤ k-edit revisions of the indexed corpus
    * (and of itself) — the corpus shuffles NOTHING on arrival, and
    * only the buckets the batch's anchor grams hash into are read at
    * all. The anchor-bucket set (≤ nBuckets ints — bounded driver
    * state by construction) becomes a literal partition predicate, so
    * the pruning is directory-level, visible in the scan's
    * PartitionFilters. Rarity ranks against the stats sidecar.
    * History-internal pairs are deliberately absent, q105 semantics.
    */
  def probe(spark: SparkSession, dir: String, incoming: DataFrame,
      textCol: String, idCol: String, k: Int = 10, q: Int = 16,
      nBuckets0: Int = 0): DataFrame = {
    val nBuckets =
      if (nBuckets0 > 0) nBuckets0 else LayoutMeta.readNBuckets(dir)
    val minLen = (k + 1) * q + k
    val b = Dedup.editProject(incoming, textCol, idCol, minLen)
    val grid = Dedup.editGrid(b, q)
    // small-batch LOOKUP path ("is THIS doc a near-dup of the
    // corpus"): when the batch's distinct gram set is tiny, its
    // grams become literal predicates on the gh-sorted stats and
    // index reads, so row-group min/max stats skip everything the
    // lookup doesn't touch — the probe costs O(batch), not O(index).
    // The collect is bounded by LookupGrams + 1 by construction
    // (limit before collect); larger batches take the plain-join
    // path, which is the right plan when the batch rivals the index.
    val smallGh = {
      val sample = grid.select(col("gh")).distinct()
        .limit(LookupGrams + 1).collect().map(_.getLong(0))
      if (sample.length <= LookupGrams) Some(sample.toSeq) else None
    }
    val stats0 = spark.read.parquet(s"$dir/stats")
    val stats = smallGh.fold(stats0)(g => stats0.filter(col("gh").isin(g: _*)))
    val anchors = Dedup.editAnchorsByDf(grid, stats, k, q)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // parquet only pushes In-filters up to inFilterThreshold literals
    // (beyond it, a min-max range — useless on uniform hashes); widen
    // it around the TWO scans that need it (stats — materialized by
    // the buckets collect through the anchors cache — and the pruned
    // index read, pinned by an eager persist), then restore. The
    // verify tail no longer runs inside the window, so it can be LAZY
    // (the caller's action materializes it) — the old
    // whole-result-eager form paid one full extra result pass per
    // probe just to keep the conf window closed (guide §1.4/§5).
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    val prev = spark.conf.get(key, "10")
    if (smallGh.isDefined) spark.conf.set(key, LookupGrams.toString)
    val (stored, storedCache) =
      try {
        // ≤ nBuckets distinct ints: the bounded collect that buys
        // directory-level pruning on the stored index (and the one
        // action that materializes the anchors cache, stats scan
        // included, inside the widened window)
        val buckets = anchors
          .select(pmod(col("gh"), lit(nBuckets)).cast("int").as("bucket"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val stored0 = spark.read.parquet(s"$dir/index")
          .filter(col("bucket").isin(buckets: _*)).drop("bucket")
        // anchors carry only selected (rarest) grams, but candidate
        // completeness needs index rows for exactly those grams — the
        // full batch gram set is a safe superset filter
        smallGh match {
          case Some(g) =>
            // pin the gh-pushed read NOW (while the threshold is
            // wide): the pruned posting set is lookup-sized
            val m = stored0.filter(col("gh").isin(g: _*))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            m.count()
            (m, Seq(m))
          case None => (stored0, Nil)
        }
      } finally if (smallGh.isDefined) spark.conf.set(key, prev)
    // the batch's own sliding grams only ever join anchor grams, and
    // every anchor gh is one of the batch's grid ghs ⊆ smallGh — so
    // on the lookup path the batch leg of the union prunes to the
    // same gram set as the stored leg (no candidate can be lost;
    // PipelineSpec pins probe ≡ incremental output)
    val slidingB0 = Dedup.editSliding(b, k, q)
    val slidingB = smallGh.fold(slidingB0)(g =>
      slidingB0.filter(col("gh").isin(g: _*)))
    val union = stored.unionByName(slidingB)
    val texts = spark.read.parquet(s"$dir/docs").unionByName(b)
    val out = Dedup.editVerify(anchors, union, texts, k)
    graft.pipeline.Similarity.cacheAndRelease(out,
      Seq(b, anchors) ++ storedCache)
  }

  // one stored index per (source dir, split) per JVM — queries and
  // bench share it instead of rebuilding per call (the
  // PartitionedLayout memoization pattern; the build is the one-time
  // table construction, not query work)
  private val layouts = TrieMap.empty[String, String]

  /** The documents history index (doc_id % 7 != 0 — q105's split) for
    * a scale-factor dir, built on first use per JVM.
    */
  def documentsHistory(spark: SparkSession, dir: String): String =
    layouts.getOrElseUpdate(s"$dir/documents-history", {
      val out = Files.createTempDirectory("graft-gramindex-").toString
      write(graft.Tables(spark, dir, "documents")
          .filter(pmod(col("doc_id"), lit(7)) =!= 0),
        "text", "doc_id", out)
    })
}
