package graft.streaming

import graft.{SparkSpec, Tables}
import graft.sources.PartitionedLayout
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Maintenance-path operations over the landed tables: raw-part
  * compaction preserves the row multiset while consolidating files,
  * and partition expiry drops exactly the out-of-retention dates
  * without touching surviving rows.
  */
class MaintenanceSpec extends SparkSpec {

  private def parquetFiles(dir: String): Int = {
    val s = Files.walk(Paths.get(dir))
    try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
    finally s.close()
  }

  test("landing compaction preserves rows and consolidates parts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-").resolve("t").toString
    // many small parts: 6 micro-batches x 2 writers
    for (b <- 0 until 6)
      LandingIngest.sinkBatch(
        Seq.tabulate(50)(i => (b * 100 + i, s"v$b-$i")).toDF("id", "s"),
        b, dir, numWriters = 2)
    val before = spark.read.parquet(dir).drop("p_batch").collect().toSet
    val filesBefore = parquetFiles(dir)

    LandingIngest.compact(spark, dir, files = 2)
    val after = spark.read.parquet(dir).drop("p_batch").collect().toSet
    assert(after == before, "compaction changed the row multiset")
    assert(parquetFiles(dir) < filesBefore,
      s"expected fewer files after compaction ($filesBefore -> ${parquetFiles(dir)})")
    val parts = spark.read.parquet(dir).select("p_batch").distinct().count()
    assert(parts == 1L, "compaction left multiple parts")
  }

  test("partition expiry drops exactly the out-of-retention dates") {
    val out = Files.createTempDirectory("graft-expire-").toString
    PartitionedLayout.write(
      Tables(spark, "/root/testdata/sf0.001", "events"),
      "ts", Seq("event_type"), out)
    val allDates = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("p_date="))
      .map(_.stripPrefix("p_date=")).toSeq.sorted
    assert(allDates.size >= 3, s"need several partitions: $allDates")

    val cutoff = allDates(2) // keep from the 3rd date on
    val keepRows = spark.read.parquet(out)
      .filter(col("p_date") >= cutoff).count()
    val dropped = PartitionedLayout.expire(out, cutoff)
    assert(dropped == allDates.take(2),
      s"expected ${allDates.take(2)}, dropped $dropped")
    // survivors untouched, readable, and complete
    val remaining = spark.read.parquet(out)
    assert(remaining.count() == keepRows)
    assert(remaining.select("p_date").distinct().count() ==
      (allDates.size - 2).toLong)
  }
}
