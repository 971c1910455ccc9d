package graft.streaming

import java.sql.SQLException

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained rollup INTO a SQL engine — the JDBC twin
  * of [[RollupSink]] (whose parquet parts emulate ClickHouse's
  * SummingMergeTree merge-on-read). A SQL engine folds in place
  * instead of deferring the merge: each micro-batch's per-key partial
  * aggregate applies as one transaction of MERGE statements
  * (matched → `n = n + ?, sum_v = sum_v + ?`; not matched → INSERT),
  * so readers see the final rollup with no merge-on-read step.
  *
  * Exactly-once replay: additive application is NOT naturally
  * idempotent (a replayed MERGE would double-add — unlike
  * [[JdbcSink.writeBatch]]'s delete-and-insert, there is no
  * per-batch partition to overwrite), so a batch LEDGER table claims
  * the batch key INSIDE the same transaction that applies the
  * partials. A replayed batch hits the ledger's primary key, rolls
  * back, and reports already-applied; a batch that fails mid-apply
  * rolls back the claim with the data, so the retry starts clean.
  * This is the standard transactional-outbox dual: state change and
  * applied-marker commit atomically or not at all.
  *
  * Scale shape: the per-key partial aggregate IS the distributed work
  * (map-side combine + one shuffle on the rollup keys — rollup
  * cardinality is small by design); the SQL application is
  * O(distinct keys in the batch) through a single connection, the
  * same boundary the reference's writer sits at. On ClickHouse
  * itself you would plain-INSERT partials into a SummingMergeTree
  * (the engine merges); the MERGE path serves ANSI engines — Derby
  * exercises it in JdbcRollupSpec.
  */
object JdbcRollup {

  /** One-row MERGE: match on the rollup keys, add the partial counts,
    * insert when new. `dual` is the engine's one-row table (Derby/DB2
    * SYSIBM.SYSDUMMY1, Oracle DUAL); engines that allow a bare VALUES
    * source can pass their idiom instead.
    */
  def mergeSql(table: String, keys: Seq[String], values: Seq[String],
      dual: String = "SYSIBM.SYSDUMMY1"): String = {
    val sums = "n" +: values.map(v => s"sum_$v")
    val on = keys.map(k => s"$table.$k = ?").mkString(" AND ")
    val upd = sums.map(s => s"$s = $s + ?").mkString(", ")
    val insCols = (keys ++ sums).mkString(", ")
    val insVals = (keys ++ sums).map(_ => "?").mkString(", ")
    s"MERGE INTO $table USING $dual ON $on " +
      s"WHEN MATCHED THEN UPDATE SET $upd " +
      s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)"
  }

  /** DDL for the rollup target + its ledger. */
  def ddl(table: String, keyCols: Seq[(String, String)],
      values: Seq[String]): Seq[String] = Seq(
    s"CREATE TABLE $table (" +
      keyCols.map { case (k, t) => s"$k $t NOT NULL" }.mkString(", ") +
      s", n BIGINT NOT NULL, " +
      values.map(v => s"sum_$v DOUBLE NOT NULL").mkString(", ") + ")",
    s"CREATE TABLE ${table}_batches (batch_key VARCHAR(64) NOT NULL PRIMARY KEY)")

  /** Apply one batch's partial rows (each = key values ++ (n +: sum
    * values)) in ONE transaction with the ledger claim. Returns true
    * if applied, false if the ledger says this batch already landed.
    * Error semantics match [[JdbcSink.writeBatch]]: any failure rolls
    * back (claim included) and releases; a commit failure discards
    * the connection.
    */
  def applyBatch(pool: JdbcSink.Pool, table: String, keys: Seq[String],
      values: Seq[String], batchKey: String,
      rows: Iterator[Seq[Any]], dual: String = "SYSIBM.SYSDUMMY1"): Boolean = {
    val conn = pool.get()
    var committed = false
    var alreadyApplied = false
    try {
      conn.setAutoCommit(false)
      val claim = conn.prepareStatement(
        s"INSERT INTO ${table}_batches (batch_key) VALUES (?)")
      try {
        claim.setString(1, batchKey)
        claim.executeUpdate()
      } catch {
        // ANSI SQLState 23505: the ledger already holds this key —
        // the batch landed in a previous (committed) delivery
        case e: SQLException if e.getSQLState == "23505" =>
          alreadyApplied = true
      } finally claim.close()
      if (alreadyApplied) {
        conn.rollback()
        pool.release(conn)
        false
      } else {
        val nSums = 1 + values.length
        val stmt = conn.prepareStatement(mergeSql(table, keys, values, dual))
        try {
          rows.foreach { row =>
            require(row.length == keys.length + nSums,
              s"row arity ${row.length} != keys ${keys.length} + $nSums")
            var p = 1
            // ON params: keys
            keys.indices.foreach { i =>
              stmt.setObject(p, row(i).asInstanceOf[AnyRef]); p += 1 }
            // UPDATE params: n + sums
            (0 until nSums).foreach { i =>
              stmt.setObject(p, row(keys.length + i).asInstanceOf[AnyRef]); p += 1 }
            // INSERT params: keys + n + sums
            row.foreach { v =>
              stmt.setObject(p, v.asInstanceOf[AnyRef]); p += 1 }
            stmt.executeUpdate()
          }
        } finally stmt.close()
        try {
          conn.commit()
          committed = true
        } catch {
          case e: Exception =>
            pool.discard(conn)
            throw e
        }
        pool.release(conn)
        true
      }
    } catch {
      case e: Exception if !committed =>
        if (!conn.isClosed) {
          try conn.rollback() catch { case _: Exception => () }
          pool.release(conn)
        }
        throw e
    }
  }

  /** foreachBatch entry: aggregate the micro-batch per key (the
    * distributed half — map-side combine + one keyed shuffle), then
    * apply each post-shuffle PARTITION of the partial frame through
    * its own connection/tx with ledger key `"<batchId>:<pid>"` — the
    * same unit of atomicity/replay as [[JdbcSink.sinkBatch]], and no
    * single-task funnel when the rollup cardinality is large (the
    * groupBy hash-partitions keys, so partitions apply disjoint key
    * sets and never contend on rows).
    */
  def sinkBatch(df: DataFrame, batchId: Long, url: String, table: String,
      keys: Seq[String], values: Seq[String]): Unit = {
    val partial = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        values.map(c => sum(col(c)).as(s"sum_$c")): _*)
      .select((keys ++ ("n" +: values.map(v => s"sum_$v"))).map(col): _*)
    val (ks, vs) = (keys, values)
    partial.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val pool = new JdbcSink.Pool(url, 1)
        try applyBatch(pool, table, ks, vs, s"$batchId:$pid",
          it.map(_.toSeq))
        finally pool.close()
      }
    }
  }
}
