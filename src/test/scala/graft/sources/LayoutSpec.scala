package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Q1/Q2 write-layout invariants: partition pruning reaches the scan,
  * data is sorted within partitions, results survive the layout.
  */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("p_date predicate shows up as a partition filter, not a data filter") {
    val df = PartitionedLayout.events(spark, sf)
      .filter(col("p_date") === "20240105")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("p_date"), physical.take(2000))
    // the partition column must not appear in PushedFilters (it never
    // reaches row groups — whole directories are skipped instead)
    val scanLine = physical.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("isnotnull(p_date"), scanLine)
  }

  test("pruned scan reads only the selected partition's files") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val all = PartitionedLayout.events(spark, sf)
    def scan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
    val allParts = scan(all).selectedPartitions.partitionCount
    val one = scan(all.filter(col("p_date") === "20240105")).selectedPartitions
    assert(one.partitionCount == 1,
      s"expected 1 partition, scanned ${one.partitionCount} of $allParts")
    assert(allParts > 1)
    assert(one.toPartitionArray
      .forall(_.filePath.toString.contains("p_date=20240105")))
  }

  test("rows are sorted by ts within each landed file") {
    val df = PartitionedLayout.events(spark, sf)
    import spark.implicits._
    val unsortedFiles = df
      .select(input_file_name().as("f"), col("ts").cast("long").as("t"))
      .groupBy(col("f"))
      .agg(collect_list(col("t")).as("ts"))
      .as[(String, Seq[Long])]
      .collect()
      .filter { case (_, ts) => ts != ts.sorted }
    assert(unsortedFiles.isEmpty,
      s"files with unsorted ts: ${unsortedFiles.map(_._1).mkString(",")}")
  }

  test("layout round-trips every row (count and checksum)") {
    val orig = graft.Tables(spark, sf, "events")
    val landed = PartitionedLayout.events(spark, sf)
    assert(landed.count() == orig.count())
    def chk(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("event_id")), sum(unix_millis(col("ts"))))
        .collect()(0).toSeq
    assert(chk(landed) == chk(orig))
  }
}
