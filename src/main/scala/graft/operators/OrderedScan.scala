package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable ordered-scan operators: running totals and consecutive
  * deltas over a per-key total order, WITHOUT a per-key single-task
  * window.
  *
  * A plain `Window.partitionBy(key).orderBy(ord)` puts every row of a
  * key in ONE task — fine when keys are plentiful (per-customer,
  * per-query windows), a serial bottleneck when the key is
  * low-cardinality (per-language running budget, per-event-type lag:
  * 5 keys ⇒ 5 tasks regardless of cluster size). These operators use
  * the textbook two-level decomposition instead:
  *
  *  1. rows are assigned a coarse `bucket` that is monotone in the
  *     order (rows of bucket i all precede bucket i+1 within a key);
  *  2. the heavy window runs per (key, bucket) — parallelism is
  *     keys × buckets, each task touching one bucket's rows;
  *  3. a second, TINY window over the per-bucket summaries (one row
  *     per (key, bucket)) stitches bucket boundaries: prefix offsets
  *     for running totals, boundary pairs for deltas.
  *
  * Results are bit-identical to the single-window form (OrderedScanSpec
  * proves it on the test tables; the driver oracles pin it end-to-end).
  *
  * The bucket expression is caller-chosen (e.g. `floor(doc_id/1000)`,
  * `floor(ts_ns/1hour)`): it only affects parallelism, never results.
  */
object OrderedScan {

  /** Running per-key total of `value` in `ord` order (inclusive of the
    * current row), decomposed as: within-bucket running sum + the sum
    * of all earlier buckets of the same key.
    *
    * Equivalent single-window form:
    * `sum(value).over(Window.partitionBy(key).orderBy(ord))` with
    * rows-unbounded-preceding — same result, keys× parallelism.
    */
  def runningTotal(df: DataFrame, key: Column, ord: Seq[Column],
      value: Column, bucket: Column, as: String): DataFrame = {
    val in = df.withColumn("_os_bucket", bucket)
      .withColumn("_os_v", value)
    val within = Window.partitionBy(key, col("_os_bucket"))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRun = in.withColumn("_os_within", sum(col("_os_v")).over(within))
    // one row per (key, bucket): total value. The stitch window runs
    // over THESE — thousands of rows, not the data. Freshly-named key
    // and bucket columns keep the rejoin free of self-join ambiguity.
    val totals = in.groupBy(key.as("_os_key"), col("_os_bucket").as("_os_kb"))
      .agg(sum(col("_os_v")).as("_os_total"))
    val stitch = Window.partitionBy(col("_os_key")).orderBy(col("_os_kb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_os_offset", sum(col("_os_total")).over(stitch))
      .drop("_os_total")
    withRun
      .join(offsets,
        key === col("_os_key") && col("_os_bucket") === col("_os_kb"))
      .withColumn(as, col("_os_within") + coalesce(col("_os_offset"), lit(0L)))
      .drop("_os_key", "_os_kb", "_os_bucket", "_os_v", "_os_within", "_os_offset")
  }

  /** Per-key delta between each row's `ord` head column and its
    * predecessor's in (ord, tiebreak) order: returns the input with a
    * `prev` column (`as`) — null for each key's first row — like
    * `lag(ordHead).over(Window.partitionBy(key).orderBy(ordHead, tiebreak))`
    * but bucket-parallel. Within a bucket the lag is local; each
    * bucket's first row takes the previous non-empty bucket's last
    * value, delivered by a lag over per-bucket summaries.
    */
  def laggedHead(df: DataFrame, key: Column, ordHead: Column,
      tiebreak: Column, bucket: Column, as: String): DataFrame = {
    val in = df.withColumn("_os_bucket", bucket)
    val within = Window.partitionBy(key, col("_os_bucket"))
      .orderBy(ordHead, tiebreak)
    val withLag = in.withColumn("_os_lag", lag(ordHead, 1).over(within))
    // per-bucket last value in order = max of (ordHead, tiebreak)
    val summaries = in.groupBy(key.as("_os_key"), col("_os_bucket").as("_os_kb"))
      .agg(max(struct(ordHead.as("h"), tiebreak.as("t"))).as("_os_last"))
    val stitch = Window.partitionBy(col("_os_key")).orderBy(col("_os_kb"))
    val boundary = summaries
      .withColumn("_os_prev_last", lag(col("_os_last.h"), 1).over(stitch))
      .drop("_os_last")
    withLag
      .join(boundary,
        key === col("_os_key") && col("_os_bucket") === col("_os_kb"))
      .withColumn(as, coalesce(col("_os_lag"), col("_os_prev_last")))
      .drop("_os_key", "_os_kb", "_os_bucket", "_os_lag", "_os_prev_last")
  }
}
