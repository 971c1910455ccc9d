package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only phase profiler for the optimization round — NOT part of the
  * driver contract; run via scripts/run.sh graft.DevProf <sfDir> <what>.
  */
object DevProf {
  def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val what = if (args.length > 1) args(1) else "q110"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{Dedup, Similarity}
    def cleanup(): Unit = {
      Similarity.releaseResult()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    what match {
      case "q110" =>
        for (rep <- 1 to 3) {
          val docs = Tables(spark, dir, "documents")
          val history = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
          val incoming = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
          graft.functions.GraftFunctions.register(spark)
          val shH = Dedup.minhashPrep(history, "text", "doc_id")
            .persist(StorageLevel.MEMORY_AND_DISK)
          val bH = Dedup.minhashBandRows(shH)
            .persist(StorageLevel.MEMORY_AND_DISK)
          val shI = Dedup.minhashPrep(incoming, "text", "doc_id")
            .persist(StorageLevel.MEMORY_AND_DISK)
          val bI = Dedup.minhashBandRows(shI)
            .persist(StorageLevel.MEMORY_AND_DISK)
          t(s"rep$rep counts") { bH.count(); bI.count() }
          val histPairs = t(s"rep$rep histPairs")(Dedup.verifyBandPairs(
            bH.as("x").join(bH.as("y"),
              col("x.band") === col("y.band") &&
                col("x.bucket") === col("y.bucket") &&
                col("x.id") < col("y.id"))
              .select(col("x.id").as("a"), col("y.id").as("b")).distinct(),
            shH, 0.5).persist(StorageLevel.MEMORY_AND_DISK))
          t(s"rep$rep histPairs count")(histPairs.count())
          val stored = t(s"rep$rep CC(histPairs)")(
            Dedup.connectedComponents(histPairs, "a", "b"))
          val newPairs = t(s"rep$rep newPairs")(Dedup.verifyBandPairs(
            Dedup.bandCandidates(bI, bH), shH.union(shI), 0.5)
            .persist(StorageLevel.MEMORY_AND_DISK))
          t(s"rep$rep newPairs count")(newPairs.count())
          val out = t(s"rep$rep incrComponents")(
            Dedup.incrementalComponents(stored, newPairs, "a", "b"))
          t(s"rep$rep final noop")(
            out.select(col("node").as("doc_id"), col("canon").as("canon_id"))
              .orderBy(col("doc_id"))
              .write.format("noop").mode("overwrite").save())
          cleanup()
        }
      case name =>
        // time any registered query end-to-end, n reps
        val q = SparkEntry.registry.find(_.name.startsWith(name)).get
        for (rep <- 1 to 3) {
          t(s"rep$rep ${q.name}")(
            q.fn(spark, dir).write.format("noop").mode("overwrite").save())
          cleanup()
        }
    }
    spark.stop()
  }
}
