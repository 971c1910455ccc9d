package graft.streaming

import java.sql.{Connection, DriverManager, SQLException}

import graft.SparkSpec

/** The JDBC rollup twin of RollupSink: additive MERGE application
  * with a ledger for exactly-once replay, against embedded Derby.
  * Values are binary-exact fractions so cross-batch addition order
  * can't perturb equality checks.
  */
class JdbcRollupSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:jdbcrollup;create=true"
  private val keys = Seq("source", "day")
  private val vals = Seq("amount")

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }
  private def fresh(table: String): Unit = withConn { c =>
    val st = c.createStatement()
    for (t <- Seq(table, s"${table}_batches"))
      try st.execute(s"DROP TABLE $t") catch { case _: SQLException => () }
    JdbcRollup.ddl(table,
      Seq("source" -> "VARCHAR(32)", "day" -> "INTEGER"), vals)
      .foreach(st.execute)
    st.close()
  }
  private def snapshot(table: String): Map[(String, Int), (Long, Double)] =
    withConn { c =>
      val rs = c.createStatement().executeQuery(
        s"SELECT source, day, n, sum_amount FROM $table")
      val b = scala.collection.mutable.Map.empty[(String, Int), (Long, Double)]
      while (rs.next())
        b((rs.getString(1), rs.getInt(2))) = (rs.getLong(3), rs.getDouble(4))
      b.toMap
    }

  test("batches fold additively; a new key inserts, a seen key merges") {
    fresh("r_add")
    val pool = new JdbcSink.Pool(url, 1)
    assert(JdbcRollup.applyBatch(pool, "r_add", keys, vals, "b1", Iterator(
      Seq[Any]("web", 1, 2L, 1.5), Seq[Any]("api", 1, 1L, 0.25))))
    assert(JdbcRollup.applyBatch(pool, "r_add", keys, vals, "b2", Iterator(
      Seq[Any]("web", 1, 3L, 2.5), Seq[Any]("web", 2, 1L, 4.0))))
    assert(snapshot("r_add") === Map(
      ("web", 1) -> (5L, 4.0), ("api", 1) -> (1L, 0.25),
      ("web", 2) -> (1L, 4.0)))
    pool.close()
  }

  test("replaying a batch key is a committed no-op (exactly-once)") {
    fresh("r_replay")
    val pool = new JdbcSink.Pool(url, 1)
    def deliver(): Boolean = JdbcRollup.applyBatch(pool, "r_replay", keys,
      vals, "epoch-3", Iterator(Seq[Any]("web", 1, 2L, 1.5)))
    assert(deliver() === true)
    assert(deliver() === false)
    assert(deliver() === false)
    assert(snapshot("r_replay") === Map(("web", 1) -> (2L, 1.5)))
    pool.close()
  }

  test("a mid-batch failure rolls back the data AND the ledger claim") {
    fresh("r_atomic")
    val pool = new JdbcSink.Pool(url, 1)
    // second row violates NOT NULL day — whole tx must vanish,
    // including the b1 ledger claim, so the retry applies cleanly
    intercept[SQLException] {
      JdbcRollup.applyBatch(pool, "r_atomic", keys, vals, "b1", Iterator(
        Seq[Any]("web", 1, 2L, 1.5), Seq[Any]("api", null, 1L, 0.25)))
    }
    assert(snapshot("r_atomic").isEmpty)
    // the claim rolled back with the data: the RETRY of b1 succeeds
    assert(JdbcRollup.applyBatch(pool, "r_atomic", keys, vals, "b1",
      Iterator(Seq[Any]("web", 1, 2L, 1.5))))
    assert(snapshot("r_atomic") === Map(("web", 1) -> (2L, 1.5)))
    pool.close()
  }

  test("streaming foreachBatch rollup equals the batch groupBy; replay converges") {
    fresh("r_stream")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Int, Double)]
    val sq = ms.toDF().toDF("source", "day", "amount").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        JdbcRollup.sinkBatch(df, id, url, "r_stream", keys, vals)
        // crash-replay of the same epoch inside the same run: the
        // ledger absorbs it
        JdbcRollup.sinkBatch(df, id, url, "r_stream", keys, vals)
      }
      .start()
    val data = Seq(("web", 1, 1.5), ("web", 1, 2.5), ("api", 1, 0.25),
      ("web", 2, 4.0), ("api", 1, 0.75))
    try {
      ms.addData(data.take(3): _*)
      sq.processAllAvailable()
      ms.addData(data.drop(3): _*)
      sq.processAllAvailable()
    } finally sq.stop()
    val expected = data.groupBy(d => (d._1, d._2)).map { case (k, g) =>
      k -> (g.size.toLong, g.map(_._3).sum)
    }
    assert(snapshot("r_stream") === expected)
    // and it matches the parquet RollupSink merge-on-read contract
    val viaSpark = data.toDF("source", "day", "amount")
      .groupBy($"source", $"day")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"amount").as("sum_amount"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(snapshot("r_stream") === viaSpark)
  }
}
