package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only probe: cached-plan partitioning under
  * canChangeCachedPlanOutputPartitioning (not a query).
  */
object DevTlc {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val conf = if (args.length > 1) args(1) else "true"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        conf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents")
    val sh = graft.operators.FanOut(docs)
      .select(col("doc_id").as("id"),
        graft.pipeline.TextOps.shinglesKernel(3)(
          graft.pipeline.TextOps.words(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    println("sh count = " + sh.count())
    println("sh cache read partitions = " + sh.rdd.getNumPartitions)
    val tok = sh.select(col("id"), explode(col("toks")).as("tokS"))
      .select(col("id"), xxhash64(col("tokS")).as("tok"))
    val t0 = System.nanoTime()
    val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val dict = dfreq.orderBy(col("tok")).limit(8000001).collect()
    println(f"dict ${dict.length} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val c = tok.join(
      tok.select(col("tok")).distinct().limit(2000000), Seq("tok"))
      .count()
    println(f"cand-ish join $c in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
