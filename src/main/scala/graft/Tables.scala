package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver's parquet testdata tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * API takes a directory so every query is scale-factor agnostic and
  * the physical layout can be swapped without touching query code.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
