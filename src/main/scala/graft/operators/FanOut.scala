package graft.operators

import org.apache.spark.sql.DataFrame

/** Minimum-parallelism guard ahead of expensive per-row kernel stages
  * (signature hashing, shingling, media decode).
  *
  * At 100 TB a scan yields thousands of input splits and this guard is
  * a no-op. But a small table often lands as a single parquet file
  * with ONE row group — and a row group is the vectorized reader's
  * indivisible unit, so `maxPartitionBytes` byte-range splitting still
  * hands every row to one task. Any CPU-heavy kernel downstream then
  * runs single-threaded no matter how many cores the cluster has,
  * while the other N-1 executors idle: the classic small-stage
  * inflation problem (the inverse of AQE's partition coalescing).
  *
  * The guard widens only such degenerate inputs — fewer planned
  * partitions than the session's default parallelism — to
  * `defaultParallelism`. The round-robin shuffle it introduces moves
  * exactly the rows the kernel stage was about to serialize onto one
  * core, so it pays row-size bytes once to unlock an N-way stage; for
  * healthy inputs (the 100 TB case) no shuffle is ever added.
  *
  * Do NOT use this ahead of plain aggregations or joins: those get
  * their parallelism from the post-shuffle stage, and a pre-shuffle
  * here would defeat map-side partial aggregation. It is for stages
  * whose cost is per-row compute BEFORE the first natural shuffle.
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Scan-only lineage: building the RDD plans input splits but runs
    // no job (there is no exchange to materialize), so this inspects
    // the planned partitioning, not data.
    val planned = df.rdd.getNumPartitions
    if (planned >= target) df else df.repartition(target)
  }
}
