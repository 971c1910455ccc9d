package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-shaping operators for the 100 TB checklist items the query
  * surface itself doesn't force: bucketing for exchange-free
  * co-located joins, and key salting for skew. Both are pure plan
  * shaping — results are identical to the naive join (ShuffleSpec
  * proves it), only the physical distribution changes.
  */
object Shuffle {

  /** Land two tables bucketed by their join keys so the join compiles
    * WITHOUT a shuffle on either side (bucketed scan → sort-merge join
    * over co-located buckets; ShuffleSpec pins the no-Exchange plan).
    * This is the write-side investment that amortizes every later join
    * on the same key — at 100 TB the difference between re-shuffling
    * the fact table per query and never shuffling it.
    */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", s"${spark.conf.get("spark.sql.warehouse.dir")}/$table")
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for a skewed key: the skewed (fact) side gets a
    * per-row salt in [0, salts); the small side is replicated across
    * every salt; the join runs on (key, salt) so one hot key spreads
    * over `salts` reducers. The salt derives from a hash of the whole
    * fact row (deterministic — no rand()), and is dropped before
    * returning: the result set is exactly the unsalted join's.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "inputs must not already have a _salt column")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
