package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Events, Pipeline, Q, Relational, Transcode, TranscodeE2E}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a [[graft.queries.Q]]
  * in one of the module `all` lists below; `queries`/`oracleSql` are derived
  * so a query and its oracle can never drift apart structurally.
  */
object SparkEntry {

  /** All verifiable queries, in stable order. */
  def registry: Seq[Q] = {
    val all = Relational.all ++ Events.all ++ Transcode.all ++
      TranscodeE2E.all ++ Pipeline.all
    // a duplicate name would silently shadow a query in the queries/
    // oracleSql maps — fail loudly instead
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql.trim }.toMap
}
