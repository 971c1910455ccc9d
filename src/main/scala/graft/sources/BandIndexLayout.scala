package graft.sources

import graft.pipeline.Dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

/** The MinHash family's STORED band index — [[GramIndexLayout]]'s
  * recipe applied to q76's caveat ("incoming band keys probe the
  * history band index, incrementally maintained and bucketed at
  * scale"):
  *
  *  - `index/`    — the (id, band, bucket) band-key postings of the
  *    corpus, parquet PARTITIONED by `pb` = pmod(bucket, nBuckets)
  *    and sorted within files by (band, bucket): a batch probe reads
  *    only the partitions its own band keys hash into;
  *  - `shingles/` — the (id, shingle-set) projection the exact
  *    Jaccard verify joins (at scale: recomputable from the landed
  *    corpus; stored so the layout is self-contained).
  *
  * [[probe]] is the stored form of `Dedup.incrementalMinhash` and
  * returns the IDENTICAL result (the partition filter only removes
  * rows the equi-join could never match — pmod is consistent — and
  * the verify is the same exact-Jaccard kernel), so q107 shares
  * q76's oracle and the equivalence is driver-checked.
  */
object BandIndexLayout {

  /** Land the index/shingles pair for `docs`. Returns `dir`.
    * `nBuckets = 0` (default) derives the bucket count from the doc
    * count and records it in the layout sidecar ([[LayoutMeta]]).
    */
  def write(docs: DataFrame, textCol: String, idCol: String, dir: String,
      nBuckets0: Int = 0): String = {
    val sh = Dedup.minhashPrep(docs, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBuckets =
      if (nBuckets0 > 0) nBuckets0 else LayoutMeta.nBucketsFor(sh.count())
    LayoutMeta.writeNBuckets(dir, nBuckets)
    sh.write.mode("overwrite").parquet(s"$dir/shingles")
    Dedup.minhashBandRows(sh)
      .withColumn("pb", pmod(col("bucket"), lit(nBuckets)).cast("int"))
      .repartition(col("pb"))
      .sortWithinPartitions(col("band"), col("bucket"))
      .write.mode("overwrite").partitionBy("pb")
      .parquet(s"$dir/index")
    sh.unpersist(blocking = false)
    dir
  }

  /** Fold a landed batch into the stored band index (the
    * [[GramIndexLayout.append]] lifecycle step): new postings append
    * into the existing pb directories, the shingle projection
    * appends; no sidecar to refresh (MinHash anchors are not
    * rarity-ranked).
    */
  def append(docs: DataFrame, textCol: String, idCol: String, dir: String,
      nBuckets0: Int = 0): String = {
    val nBuckets =
      if (nBuckets0 > 0) nBuckets0 else LayoutMeta.readNBuckets(dir)
    val sh = Dedup.minhashPrep(docs, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.write.mode("append").parquet(s"$dir/shingles")
    Dedup.minhashBandRows(sh)
      .withColumn("pb", pmod(col("bucket"), lit(nBuckets)).cast("int"))
      .repartition(col("pb"))
      .sortWithinPartitions(col("band"), col("bucket"))
      .write.mode("append").partitionBy("pb")
      .parquet(s"$dir/index")
    sh.unpersist(blocking = false)
    dir
  }

  /** Stored form of `Dedup.incrementalMinhash`: flag incoming docs
    * that near-duplicate the indexed corpus at Jaccard ≥ `threshold`.
    * Only the batch computes signatures; the batch's band-key
    * partition set (≤ nBuckets ints — bounded driver state) prunes
    * the stored index at the directory level; candidates verify on
    * exact shingle sets from the layout.
    */
  def probe(spark: SparkSession, dir: String, incoming: DataFrame,
      textCol: String, idCol: String, threshold: Double,
      nBuckets0: Int = 0): DataFrame = {
    val nBuckets =
      if (nBuckets0 > 0) nBuckets0 else LayoutMeta.readNBuckets(dir)
    val shI = Dedup.minhashPrep(incoming, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bI = Dedup.minhashBandRows(shI)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pbs = bI.select(pmod(col("bucket"), lit(nBuckets)).cast("int")
        .as("pb")).distinct().collect().map(_.getInt(0)).toSeq
    val stored = spark.read.parquet(s"$dir/index")
      .filter(col("pb").isin(pbs: _*)).drop("pb")
    val pairs = bI.as("x")
      .join(stored.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket"))
      .select(col("x.id").as("id"), col("y.id").as("hid"))
      .distinct()
    val verified = pairs
      .join(shI.select(col("id"), col("sh").as("sh_i")), "id")
      .join(spark.read.parquet(s"$dir/shingles")
        .select(col("id").as("hid"), col("sh").as("sh_h")), "hid")
      .select(col("id"),
        Dedup.jaccardKernel(col("sh_i"), col("sh_h")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_matches"), max(col("jaccard")).as("best_jaccard"))
    graft.pipeline.Similarity.cacheAndRelease(verified, Seq(shI, bI))
  }

  /** Pair-level stored probe — `Dedup.incrementalMinhashPairs` against
    * the LANDED index: every verified pair involving the batch, both
    * batch×stored (directory-pruned by the batch's band-key pb set)
    * and batch×batch (the batch dedupes internally on arrival).
    * Stored-internal pairs are deliberately absent — they were found
    * when those docs arrived. Returns (a, b) with a < b; feeds
    * [[LabelStoreLayout.fold]] in the continuous-clustering loop
    * ([[graft.streaming.ClusterStream]]).
    */
  def probePairs(spark: SparkSession, dir: String, incoming: DataFrame,
      textCol: String, idCol: String, threshold: Double,
      nBuckets0: Int = 0): DataFrame = {
    val nBuckets =
      if (nBuckets0 > 0) nBuckets0 else LayoutMeta.readNBuckets(dir)
    val shI = Dedup.minhashPrep(incoming, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bI = Dedup.minhashBandRows(shI)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pbs = bI.select(pmod(col("bucket"), lit(nBuckets)).cast("int")
        .as("pb")).distinct().collect().map(_.getInt(0)).toSeq
    val stored = spark.read.parquet(s"$dir/index")
      .filter(col("pb").isin(pbs: _*)).drop("pb")
    // shared candidate + verify shape (Dedup.bandCandidates /
    // verifyBandPairs): the a≠b guard and trailing distinct make the
    // output row-identical even when the batch's own postings are
    // already in the store (replayed epoch landed its append before
    // crashing) — self-collisions drop, duplicate shingle rows dedup
    val verified = Dedup.verifyBandPairs(
      Dedup.bandCandidates(bI, stored),
      shI.union(spark.read.parquet(s"$dir/shingles")), threshold)
    graft.pipeline.Similarity.cacheAndRelease(verified, Seq(shI, bI))
  }

  // one stored index per (source dir, split) per JVM — the
  // PartitionedLayout/GramIndexLayout memoization pattern
  private val layouts = TrieMap.empty[String, String]

  /** The documents history band index (doc_id % 3 != 0 — q76's split)
    * for a scale-factor dir, built on first use per JVM.
    */
  def documentsHistory(spark: SparkSession, dir: String): String =
    layouts.getOrElseUpdate(s"$dir/documents-bands", {
      val out = Files.createTempDirectory("graft-bandindex-").toString
      write(graft.Tables(spark, dir, "documents")
          .filter(col("doc_id") % 3 =!= 0),
        "text", "doc_id", out)
    })
}
