package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.collection.concurrent.TrieMap

/** Q1/Q2: the write-side layout the reference's ClickHouse DDL
  * declares (reference examples/binance.sql:14-16 — `PARTITION BY
  * toYYYYMMDD(eventTime) ORDER BY (eventTime, symbol, tradeTime)`),
  * expressed Spark-native:
  *
  *  - date partition → `partitionBy(p_date)` directory layout; a
  *    p_date predicate prunes whole partitions before any IO
  *    (Catalyst PartitionFilters);
  *  - sort key → `sortWithinPartitions(...)`; parquet row-group
  *    min/max stats then skip pages for range predicates on the sort
  *    prefix (the MergeTree granule analog);
  *  - `repartition(p_date)` before the write so each partition is
  *    written by one task — few large files instead of
  *    tasks × partitions fragments (the 100 TB file-count concern).
  */
object PartitionedLayout {

  /** Land `df` date-partitioned by `tsCol` and sorted within each
    * partition by (tsCol, sortCols...). Returns the layout root.
    */
  def write(df: DataFrame, tsCol: String, sortCols: Seq[String],
      outDir: String): String = {
    // UTC calendar day derived from the epoch instant (tz-independent
    // arithmetic), not date_format — so the layout doesn't shift if a
    // caller runs with a non-UTC session timezone (ADVICE r2 #5).
    val utcDays = floor(unix_millis(col(tsCol)) / lit(86400000L)).cast("int")
    val pDate = date_format(date_add(to_date(lit("1970-01-01")), utcDays),
      "yyyyMMdd")
    df.withColumn("p_date", pDate)
      .repartition(col("p_date"))
      .sortWithinPartitions(col(tsCol) +: sortCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy("p_date")
      .parquet(outDir)
    outDir
  }

  // one partitioned copy per (source dir, table) per JVM — queries and
  // bench share it instead of rewriting per call
  private val layouts = TrieMap.empty[String, String]

  /** The events table in its partitioned/sorted layout (built on first
    * use per scale factor).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val root = layouts.getOrElseUpdate(s"$dir/events", {
      val out = Files.createTempDirectory("graft-layout-events-").toString
      write(graft.Tables(spark, dir, "events"), "ts", Seq("event_type"), out)
    })
    // Explicit schema keeps p_date a STRING partition column: without
    // it, partition-type inference reads yyyyMMdd as IntegerType and
    // string comparisons prune only via fragile cast-unwrapping
    // (ADVICE r2 #5).
    val schema = graft.Tables(spark, dir, "events").schema
      .add("p_date", org.apache.spark.sql.types.StringType)
    spark.read.schema(schema).parquet(root)
  }

  /** Retention expiry — the ClickHouse `TTL ... DELETE` analog over
    * the date-partitioned layout: whole p_date partitions strictly
    * older than the cutoff are dropped as directories. Partition-level
    * deletion never reads or rewrites row data, so expiring any
    * amount of history is O(partitions dropped) metadata work — the
    * reason retention policy belongs to the layout, not to a DELETE
    * query (which at 100 TB would rewrite every surviving file).
    * Returns the dropped partition values. Maintenance-path only,
    * like part compaction.
    */
  def expire(root: String, beforeYyyyMmDd: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(root))
    val parts = try listing.iterator().asScala.toSeq finally listing.close()
    val dropped = parts
      .filter(p => p.getFileName.toString.startsWith("p_date="))
      .filter(p => p.getFileName.toString.stripPrefix("p_date=") < beforeYyyyMmDd)
    dropped.foreach(graft.streaming.Parts.deleteTree)
    dropped.map(_.getFileName.toString.stripPrefix("p_date="))
      .sorted
  }
}
