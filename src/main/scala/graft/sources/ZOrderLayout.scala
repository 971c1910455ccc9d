package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional extension
  * of Q2's sort-key layout. A lexicographic sort (PartitionedLayout,
  * the MergeTree ORDER BY analog) gives row-group skipping only on the
  * sort PREFIX: a predicate on the second dimension alone scans
  * everything. Interleaving the bits of two bucketed dimensions into
  * one sort key makes row groups cluster in BOTH dimensions at once,
  * so min/max stats skip groups for either predicate — the standard
  * lakehouse layout for two-filter tables (time × user, time ×
  * symbol), at the cost of somewhat coarser skipping per single
  * dimension than a dedicated sort.
  *
  * The layout is write-side only: readers see the same rows and
  * schema, every query result is layout-invariant (ZOrderSpec pins
  * equality), and the skipping claim is pinned by counting row groups
  * whose min/max stats intersect a secondary-dimension predicate —
  * z-ordered files must touch strictly fewer than ts-sorted files.
  */
object ZOrderLayout {

  /** Bits interleaved per dimension. 2×16 = 32-bit Morton codes:
    * 65k buckets per dimension is plenty of resolution for row-group
    * clustering (a row group holds thousands of rows regardless).
    */
  val BitsPerDim = 16

  /** Morton interleave of two bucketed dimensions, each SATURATED into
    * [0, 2^16): out-of-range values clamp to the nearest bound (a
    * bitmask would wrap 65536 → bucket 0, silently scrambling the
    * clustering; saturation keeps the code monotone so locality only
    * coarsens at the extremes). Bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Pure integer Column arithmetic —
    * codegen'd, map-side.
    */
  def morton(a: Column, b: Column): Column = {
    val mask = (1L << BitsPerDim) - 1
    val ca = least(greatest(a, lit(0L)), lit(mask))
    val cb = least(greatest(b, lit(0L)), lit(mask))
    (0 until BitsPerDim).map { i =>
      shiftleft(shiftright(ca, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(cb, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** JVM mirror for tests. */
  def mortonJvm(a: Long, b: Long): Long = {
    val mask = (1L << BitsPerDim) - 1
    val ca = math.min(math.max(a, 0L), mask)
    val cb = math.min(math.max(b, 0L), mask)
    var out = 0L
    var i = 0
    while (i < BitsPerDim) {
      out |= ((ca >> i) & 1L) << (2 * i)
      out |= ((cb >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  /** Land `df` clustered on morton(dimA, dimB): global range
    * repartition on the code (so files hold disjoint code ranges —
    * the cross-file analog of sortWithinPartitions), then sorted
    * within partitions. `rowGroupBytes` bounds parquet row-group size;
    * the default is parquet's standard 128 MB — tests pass a tiny
    * value to get many groups from small data, production keeps the
    * default (smaller groups mean finer skipping but metadata and
    * per-group overhead grow).
    */
  def write(df: DataFrame, dimA: Column, dimB: Column, outDir: String,
      files: Int = 8, rowGroupBytes: Int = 128 * 1024 * 1024): String = {
    df.withColumn("_z", morton(dimA, dimB))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toLong)
      .parquet(outDir)
    outDir
  }

  /** Row groups whose [min,max] footer stats for `column` intersect
    * [lo, hi] — the measurable form of the skipping claim: a reader
    * with predicate `column BETWEEN lo AND hi` must open exactly the
    * candidate groups. Returns (candidates, total). Shared by
    * ZOrderSpec's assertion and Bench's archived skipping ratio.
    */
  def candidateGroups(dir: String, column: String, lo: Long, hi: Long): (Int, Int) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val files = try listing.iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    finally listing.close()
    var total = 0
    var candidates = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString), conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          total += 1
          val stats: org.apache.parquet.column.statistics.Statistics[_] =
            block.getColumns.asScala
              .find(_.getPath.toDotString == column).get.getStatistics
          val (mn, mx) = (stats.genericGetMin.asInstanceOf[Number].longValue(),
            stats.genericGetMax.asInstanceOf[Number].longValue())
          if (mn <= hi && mx >= lo) candidates += 1
        }
      } finally reader.close()
    }
    (candidates, total)
  }

  // one z-ordered copy per (source dir) per JVM, like
  // PartitionedLayout.events
  private val layouts = scala.collection.concurrent.TrieMap.empty[String, String]

  /** The events table z-ordered on (utc day, user_id) — the layout a
    * time × user two-filter workload wants (built on first use per
    * scale factor).
    */
  def events(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val root = layouts.getOrElseUpdate(s"$dir/events", {
      val out = java.nio.file.Files
        .createTempDirectory("graft-zorder-events-").toString
      write(graft.Tables(spark, dir, "events"),
        expr("ts_ns div 86400000000000"), col("user_id"), out)
    })
    spark.read.parquet(root)
  }
}
