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
    val before = spark.read.parquet(dir).drop("p_batch").collect()
      .map(_.toString).sorted.toSeq
    val filesBefore = parquetFiles(dir)

    LandingIngest.compact(spark, dir, files = 2)
    // sorted-multiset compare: a Set would mask duplicated rows
    val after = spark.read.parquet(dir).drop("p_batch").collect()
      .map(_.toString).sorted.toSeq
    assert(after == before, "compaction changed the row multiset")
    assert(parquetFiles(dir) < filesBefore,
      s"expected fewer files after compaction ($filesBefore -> ${parquetFiles(dir)})")
    val parts = spark.read.parquet(dir).select("p_batch").distinct().count()
    assert(parts == 1L, "compaction left multiple parts")
  }

  test("swapIn recovers from crashed prior swaps") {
    def mk(p: java.nio.file.Path, marker: String): Unit = {
      Files.createDirectories(p)
      Files.writeString(p.resolve("marker"), marker)
    }
    def markerOf(p: java.nio.file.Path): String =
      Files.readString(p.resolve("marker"))
    val base = Files.createTempDirectory("graft-swap-")
    val live = base.resolve("t")

    // crash state A: stale .swap-old left beside a live dir — the next
    // swap must clean it up and succeed, not fail on a non-empty target
    mk(live, "v1")
    mk(base.resolve("t.swap-old"), "stale")
    Parts.swapIn(live.toString, tmp => mk(Paths.get(tmp), "v2"))
    assert(markerOf(live) == "v2")
    assert(!Files.exists(base.resolve("t.swap-old")))

    // crash state B: interrupted between the two moves — live missing,
    // old holds the data; the next swap restores it, then replaces it
    Files.move(live, base.resolve("t.swap-old"))
    mk(base.resolve("t.swap-tmp"), "garbage")
    Parts.swapIn(live.toString, tmp => mk(Paths.get(tmp), "v3"))
    assert(markerOf(live) == "v3")
    assert(!Files.exists(base.resolve("t.swap-old")) &&
      !Files.exists(base.resolve("t.swap-tmp")))
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
