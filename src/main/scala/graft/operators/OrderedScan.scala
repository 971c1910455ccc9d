package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** Rolling frame aggregate — per-key sliding sum/count of the last
    * `k` rows (ROWS k-1 PRECEDING .. CURRENT ROW) in (ordHead,
    * tiebreak) order, bucket-parallel. Adds `asSum` (sum of `value`
    * over the frame) and `asN` (frame size; < k only near the key's
    * first rows). `value` must be integral (LongType) so frame sums
    * are order-independent-exact — the caller converts doubles to
    * fixed-point first (FP sums would tie results to summation order,
    * which sliding-window engines don't guarantee).
    *
    * Decomposition: sliding frames cross bucket boundaries, and a
    * sparse bucket (< k rows) can make a frame span SEVERAL buckets —
    * so buckets are first coalesced, per key, into GROUPS holding at
    * least k rows each (a greedy walk over the per-(key, bucket)
    * counts — summary-level data, keys × buckets rows, never the
    * table). Every frame then spans at most one group boundary, and
    * replicating each group's last k rows into the next group as
    * non-owner context makes the per-(key, group) local window exact:
    * context rows sort ahead of the group's own rows, complete every
    * frame, and are dropped after. Shuffle volume: rows × 1 for the
    * window + k rows per group of replication; parallelism is
    * keys × groups.
    */
  def rollingSum(df: DataFrame, key: Column, ordHead: Column,
      tiebreak: Column, value: Column, k: Int, bucket: Column,
      asSum: String, asN: String): DataFrame = {
    require(k >= 1)
    val in = df.withColumn("_os_bucket", bucket.cast("long"))
      .withColumn("_os_v", value.cast("long"))

    // group assignment: greedy walk over per-(key,bucket) counts —
    // close a group once it holds >= k rows. Summary-level work.
    val assignGroups = udf { (bc: Seq[Row]) =>
      val sorted = bc.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val out = Seq.newBuilder[(Long, Long)]
      var grp = 0L
      var acc = 0L
      sorted.foreach { case (b, n) =>
        if (acc >= k) { grp += 1; acc = 0L }
        out += ((b, grp))
        acc += n
      }
      out.result()
    }
    val bucketCounts = in.groupBy(key.as("_os_key"), col("_os_bucket").as("_os_kb"))
      .agg(count(lit(1)).as("_os_n"))
    val grpMap = bucketCounts
      .groupBy(col("_os_key"))
      .agg(collect_list(struct(col("_os_kb"), col("_os_n"))).as("_os_bc"))
      .select(col("_os_key"),
        explode(assignGroups(col("_os_bc"))).as("_os_bg"))
      .select(col("_os_key"), col("_os_bg._1").as("_os_kb"),
        col("_os_bg._2").as("_os_grp"))

    val own = in.join(broadcast(grpMap),
        key === col("_os_key") && col("_os_bucket") === col("_os_kb"))
      .drop("_os_key", "_os_kb")
      .withColumn("_os_owner", lit(true))

    // context: each group's last k rows, replicated to the next group
    val lastW = Window.partitionBy(key, col("_os_grp"))
      .orderBy(ordHead.desc, tiebreak.desc)
    val context = own
      .withColumn("_os_rn", row_number().over(lastW))
      .filter(col("_os_rn") <= k)
      .drop("_os_rn")
      .withColumn("_os_grp", col("_os_grp") + 1)
      .withColumn("_os_owner", lit(false))

    val frame = Window.partitionBy(key, col("_os_grp"))
      .orderBy(ordHead, tiebreak)
      .rowsBetween(-(k - 1), Window.currentRow)
    own.unionByName(context)
      .withColumn(asSum, sum(col("_os_v")).over(frame))
      .withColumn(asN, count(lit(1)).over(frame))
      .filter(col("_os_owner"))
      .drop("_os_bucket", "_os_v", "_os_grp", "_os_owner")
  }

  /** Per-key bottom-k rows in ascending (ord, tiebreak) order, with
    * each kept row's per-key rank attached as `as` — WITHOUT sorting
    * any key's full row set. `bucket` must be monotone in `ord`
    * within a key (e.g. `h div 2^53` for a uniform 60-bit hash).
    *
    * Decomposition: per-(key, bucket) counts (one aggregate over the
    * data, summary-sized output) get a TINY stitch window computing
    * each bucket's preceding-rows count; a bucket can host a rank ≤ k
    * row only if that prefix count is < k, so all other buckets are
    * pruned BEFORE any sort. The heavy row_number window then runs
    * only over surviving buckets' rows — for a uniform hash order
    * that is ~one bucket (≈ rows/buckets of them) per key, however
    * large the key grows; global rank = local row_number + the
    * bucket's prefix count. The pruning join is against the
    * summary-sized survivor list on (key, bucket) — keyed, never
    * broadcast-hinted (keys may be high-cardinality; AQE broadcasts
    * when it is in fact small).
    *
    * This is the engine under the bottom-k sketches (q121 KMV
    * distinct, q122 deterministic-sample quantiles): a full per-key
    * sort of N rows to keep 64 of them would be exactly the
    * "window over everything" anti-pattern this object exists to
    * avoid.
    */
  def bottomK(df: DataFrame, key: Column, ord: Column, tiebreak: Column,
      bucket: Column, k: Int, as: String): DataFrame = {
    require(k >= 1, s"bottomK needs k >= 1, got $k")
    val in = df.withColumn("_os_bucket", bucket.cast("long"))
    val counts = in
      .groupBy(key.as("_os_key"), col("_os_bucket").as("_os_kb"))
      .agg(count(lit(1)).as("_os_n"))
    val stitch = Window.partitionBy(col("_os_key")).orderBy(col("_os_kb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val live = counts
      .withColumn("_os_before",
        coalesce(sum(col("_os_n")).over(stitch), lit(0L)))
      .filter(col("_os_before") < k)
      .select(col("_os_key"), col("_os_kb"), col("_os_before"))
    val w = Window.partitionBy(key, col("_os_bucket"))
      .orderBy(ord, tiebreak)
    in.join(live,
        key === col("_os_key") && col("_os_bucket") === col("_os_kb"))
      .withColumn(as,
        row_number().over(w).cast("long") + col("_os_before"))
      .filter(col(as) <= k)
      .drop("_os_key", "_os_kb", "_os_bucket", "_os_before")
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
