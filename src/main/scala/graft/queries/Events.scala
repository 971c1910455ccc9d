package graft.queries

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Time-series query surface over the `events` table — the analytics the
  * reference's ClickHouse DDL exists to serve (SURVEY.md §2.4): date
  * partition pruning (PARTITION BY toYYYYMMDD, reference
  * examples/binance.sql:14), sort-key range scans, tumbling-window
  * aggregation, and key/value props search.
  */
object Events {

  /** Tumbling 1-hour OHLC-style rollup per event type (§2.4 Q4).
    * open/close use min_by/max_by on the unique event_id — deterministic
    * under ties, unlike first/last. Partial aggregation collapses each
    * scan task to (type × hour) rows before the shuffle.
    */
  val q13 = Q(
    "q13_hourly_ohlc",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(
          date_format(window(col("ts"), "1 hour").getField("start"),
            "yyyy-MM-dd HH:mm:ss").as("bucket"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          min(col("value")).as("low"),
          max(col("value")).as("high"),
          min_by(col("value"), col("event_id")).as("open"),
          max_by(col("value"), col("event_id")).as("close"))
        .orderBy(col("bucket"), col("event_type")),
    Some(s"""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             event_type,
             COUNT(*) AS n,
             ${oSum("value")} AS sum_value,
             MIN(value) AS low,
             MAX(value) AS high,
             ARG_MIN(value, event_id) AS open,
             ARG_MAX(value, event_id) AS close
      FROM events
      GROUP BY 1, 2
      ORDER BY bucket, event_type"""))

  /** Single-day scan (§2.4 Q1 partition pruning): the range predicate
    * compares the column AS STORED ([[graft.Tables.tsRange]] picks the
    * literal type to match) so it reaches parquet row-group min/max
    * stats (PlanSpec pins the pushdown — a predicate on a derived
    * column scans everything); on a date-partitioned layout it prunes
    * whole partitions before any IO.
    */
  val q14 = Q(
    "q14_day_slice",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
      ev.filter(graft.Tables.tsRange(ev,
          "2024-01-05T00:00:00Z", "2024-01-06T00:00:00Z"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, COUNT(*) AS n, ${oSum("value")} AS sum_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
      GROUP BY event_type
      ORDER BY event_type"""))

  /** JSON props extraction (§2.4 Q6 analog): pull the `k` key out of the
    * JSON props column and histogram it. Uses a regex extract, which both
    * engines evaluate identically (no JSON-extension dependency in the
    * oracle).
    */
  val q15 = Q(
    "q15_props_extract",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .withColumn("k",
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("k_mod")),
    Some("""
      SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) % 10 AS k_mod,
             COUNT(*) AS n,
             CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS BIGINT) AS sum_k
      FROM events
      GROUP BY 1
      ORDER BY k_mod"""))

  /** Array membership (§2.4 Q7, reference examples/example.sql:7
    * `labels Array(String)` / finnhub.sql:6 `tradeConditions`): build a
    * real ArrayType column (tokenized text) and filter on
    * array_contains. At scale the split+contains runs codegen'd inside
    * the scan stage; only matching rows reach the aggregate.
    */
  val q16 = Q(
    "q16_array_membership",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("words", split(col("text"), " "))
        .filter(array_contains(col("words"), "spark"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("words"))).as("n_words"))
        .orderBy(col("lang")),
    Some("""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words
      FROM documents
      WHERE list_contains(string_split(text, ' '), 'spark')
      GROUP BY lang
      ORDER BY lang"""))

  /** Map flatten (P8 parity, reference clickhouse_table.go:183-201,270-289):
    * a MapType column is carried internally and flattened to aligned
    * key/value arrays at the sink projection, exactly like bristle's
    * map → Nested(key, value) parallel arrays. The registered result
    * serializes the arrays with array_join because the driver's compare
    * harness can't sort/hash array cells; the MapType→arrays semantics
    * stay under unit test (SchemaBinderSpec).
    */
  val q17 = Q(
    "q17_map_flatten",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .filter(col("event_id") < 100)
        .withColumn("m", map(lit("k"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1),
          lit("t"), col("event_type")))
        .select(col("event_id"),
          array_join(map_keys(col("m")), ",").as("tag_keys"),
          array_join(map_values(col("m")), ",").as("tag_values"))
        .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             'k,t' AS tag_keys,
             concat(regexp_extract(props, '"k": (\d+)', 1), ',', event_type)
               AS tag_values
      FROM events
      WHERE event_id < 100
      ORDER BY event_id"""))

  /** Timestamp disassemble/assemble round trip (P7 parity, reference
    * clickhouse_table.go:215-226): epoch-millis ⇄ timestamp must be
    * lossless at millisecond precision, per day.
    */
  val q20 = Q(
    "q20_ts_epoch_roundtrip",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .withColumn("ms", unix_millis(col("ts")))
        .withColumn("rt",
          date_format(timestamp_millis(col("ms")), "yyyy-MM-dd"))
        .groupBy(col("rt"))
        .agg(count(lit(1)).as("n"), min(col("ms")).as("min_ms"),
          max(col("ms")).as("max_ms"))
        .orderBy(col("rt")),
    Some("""
      SELECT strftime(make_timestamp(epoch_ms(ts) * 1000), '%Y-%m-%d') AS rt,
             COUNT(*) AS n,
             MIN(epoch_ms(ts)) AS min_ms,
             MAX(epoch_ms(ts)) AS max_ms
      FROM events
      GROUP BY 1
      ORDER BY rt"""))

  /** Q1/Q2 exercised against a REAL partitioned/sorted layout: the
    * events table landed via PartitionedLayout (PARTITION BY yyyyMMdd,
    * sorted by (ts, event_type) within partitions), then the q14 day
    * slice expressed as a p_date partition predicate — Catalyst prunes
    * every other date directory before IO (PartitionFilters in the
    * plan, pinned by LayoutSpec), and the ts sort makes the residual
    * range a row-group-skip. Oracle identical to q14: layout must not
    * change results.
    */
  val q34 = Q(
    "q34_partitioned_day_slice",
    (spark, dir) =>
      graft.sources.PartitionedLayout.events(spark, dir)
        .filter(col("p_date") === lit("20240105"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type")),
    q14.oracle) // layout must not change results: q14's oracle by reference

  /** Gap-based sessionization via Spark's native session_window: per
    * event type, events closer than 10 minutes chain into one session.
    * The training-pipeline shape for user/doc activity bundling; state
    * is per (key, session) and merges map-side. Oracle: classic
    * gaps-and-islands (lag + cumulative sum) — same sessions, computed
    * the relational way.
    */
  val q42 = Q(
    "q42_sessionize",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(session_window(col("ts"), "10 minutes").as("s"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(
          date_format(col("s.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy(col("s_start"), col("event_type")),
    Some(s"""
      WITH g AS (
        SELECT event_type, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY event_type ORDER BY ts)
                         <= INTERVAL 10 MINUTE THEN 0 ELSE 1 END AS brk
        FROM events),
      s AS (
        SELECT event_type, ts, value,
               SUM(brk) OVER (PARTITION BY event_type ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
             event_type,
             COUNT(*) AS n_events,
             ${oSum("value")} AS sum_value
      FROM s
      GROUP BY event_type, sid
      ORDER BY s_start, event_type"""))

  /** Ordered per-key deltas (lag): distribution of inter-event time
    * per event type — the sort-key range-scan consumer pattern (Q2):
    * within a partitioned/sorted layout this computes without a sort
    * at scale.
    */
  val q43 = Q(
    "q43_event_deltas",
    (spark, dir) => {
      // event_id tiebreak: ts has duplicates, and floored deltas don't
      // telescope — without a total order the per-engine sums drift.
      // The lag is bucket-decomposed (operators/OrderedScan): a plain
      // partitionBy(event_type) window would put each type's whole
      // history on one task; hourly buckets keep it parallel with the
      // boundary rows stitched from per-bucket summaries.
      graft.operators.OrderedScan.laggedHead(Tables(spark, dir, "events"),
          key = col("event_type"), ordHead = col("ts_ns"),
          tiebreak = col("event_id"),
          bucket = floor(col("ts_ns") / lit(3600L * 1000 * 1000 * 1000)),
          as = "prev_ns")
        // µs-truncate BEFORE differencing (DuckDB's TIMESTAMP_NS is µs
        // past the reader), and integer `div`, not `/` (double division
        // rounds and drifts off the oracle's floor on large sums)
        .withColumn("delta_ms",
          expr("((ts_ns div 1000) - (prev_ns div 1000)) div 1000"))
        .filter(col("delta_ms").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("delta_ms")).as("min_ms"),
          max(col("delta_ms")).as("max_ms"),
          sum(col("delta_ms")).as("total_ms"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH d AS (
        SELECT event_type,
               (epoch_ns(ts) - LAG(epoch_ns(ts))
                  OVER (PARTITION BY event_type ORDER BY ts, event_id))
                 // 1000000 AS delta_ms
        FROM events)
      SELECT event_type, COUNT(*) AS n,
             MIN(delta_ms) AS min_ms,
             MAX(delta_ms) AS max_ms,
             CAST(SUM(delta_ms) AS BIGINT) AS total_ms
      FROM d
      WHERE delta_ms IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type"""))

  /** As-of join (operators/AsOfJoin): each click matched to the same
    * user's latest view at-or-before it under the total order
    * (ts_ns, event_id) — the trade↔prevailing-quote pattern over the
    * reference's trade-feed DDL, done as ONE union + keyed
    * carry-forward window: |clicks|+|views| shuffled once on user_id,
    * no per-row probe, no range blow-up. The oracle replays the same
    * carry-forward with last_value IGNORE NULLS.
    */
  val q50 = Q(
    "q50_asof_join",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ns"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts_ns"))
      graft.operators.AsOfJoin.asofFlat(clicks, views,
          keys = Seq("user_id"), ord = Seq("ts_ns", "event_id"),
          payload = Seq("event_id", "ts_ns"), prefix = "view_")
        .select(col("event_id"), col("user_id"),
          col("view_event_id"),
          // µs-truncate then ms like q43: identical floors both engines
          expr("((ts_ns div 1000) - (view_ts_ns div 1000)) div 1000").as("gap_ms"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH u AS (
        SELECT user_id, epoch_ns(ts) AS tn, event_id, event_type,
               CASE WHEN event_type = 'view' THEN event_id END AS v_id,
               CASE WHEN event_type = 'view' THEN epoch_ns(ts) END AS v_tn
        FROM events WHERE event_type IN ('click', 'view')),
      m AS (
        SELECT *,
               last_value(v_id IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY tn, event_id
                  ROWS UNBOUNDED PRECEDING) AS view_event_id,
               last_value(v_tn IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY tn, event_id
                  ROWS UNBOUNDED PRECEDING) AS view_tn
        FROM u)
      SELECT event_id, user_id, view_event_id,
             ((tn // 1000) - (view_tn // 1000)) // 1000 AS gap_ms
      FROM m
      WHERE event_type = 'click'
      ORDER BY event_id"""))

  /** Band/interval join (operators/RangeJoin): (error, purchase) pairs
    * of the same user within ±1 h — planned as a hash join on
    * (user_id, time-bucket) with the probe side replicated to ≤3
    * covering buckets, then exact-filtered. The naive inequality-only
    * join would be a nested-loop cross product; this shuffles
    * |L| + 3·|R| once. Oracle runs the quadratic form directly
    * (feasible at oracle SF, and a complete/precise differential test
    * of the bucketing rewrite).
    */
  val q51 = {
    val bandUs = 3600L * 1000 * 1000
    Q(
      "q51_range_join",
      (spark, dir) => {
        // µs-truncate BEFORE the band compare, like q43/q50: DuckDB's
        // parquet reader drops the sub-µs bits of TIMESTAMP(NANOS), so
        // a raw-ns band would flip pairs whose diff sits within 999 ns
        // of the band edge (and gap_ms near ms boundaries) vs the
        // oracle — a latent flake at any SF.
        val ev = Tables(spark, dir, "events")
          .withColumn("ts_us", expr("ts_ns div 1000"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        graft.operators.RangeJoin.band(errors, purchases,
            keys = Seq("user_id"), ordL = "ts_us", ordR = "ts_us",
            band = bandUs, prefix = "p_")
          .select(col("event_id").as("error_id"),
            col("p_event_id").as("purchase_id"), col("user_id"),
            expr("abs(ts_us - p_ts_us) div 1000").as("gap_ms"))
          .orderBy(col("error_id"), col("purchase_id"))
      },
      Some(s"""
      SELECT e.event_id AS error_id, p.event_id AS purchase_id, e.user_id,
             abs(epoch_us(e.ts) - epoch_us(p.ts)) // 1000 AS gap_ms
      FROM events e
      JOIN events p
        ON e.user_id = p.user_id
       AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= ${bandUs}
      WHERE e.event_type = 'error' AND p.event_type = 'purchase'
      ORDER BY error_id, purchase_id"""))
  }

  /** Exact linear-interpolated percentiles per event type — the
    * ClickHouse quantile/quantileExact surface over landed data.
    * Exact percentile is the oracle-checkable form (Spark `percentile`
    * == DuckDB `quantile_cont` up to last-ulp interpolation, pinned by
    * round(6)); it buffers per-group values, so at 100 TB the scale
    * path is `approx_percentile` (t-digest, mergeable map-side sketch,
    * same call shape) — approximate ⇒ not oracle-comparable, hence the
    * exact twin is what the driver verifies.
    */
  val q52 = Q(
    "q52_percentiles",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(percentile(col("value"), lit(0.5)), 6).as("p50"),
          round(percentile(col("value"), lit(0.9)), 6).as("p90"),
          round(percentile(col("value"), lit(0.99)), 6).as("p99"),
          min(col("value")).as("p0"),
          max(col("value")).as("p100"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             COUNT(*) AS n,
             ROUND(quantile_cont(value, 0.5), 6) AS p50,
             ROUND(quantile_cont(value, 0.9), 6) AS p90,
             ROUND(quantile_cont(value, 0.99), 6) AS p99,
             MIN(value) AS p0,
             MAX(value) AS p100
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Distinct-cardinality surface (ClickHouse uniqExact/uniq): exact
    * distinct users and active days per event type. Exact distinct is
    * the oracle-checkable form (two distincts in one agg → Expand,
    * the standard multi-distinct plan); the 100 TB path is
    * `approx_count_distinct` (HyperLogLog++: a fixed-size mergeable
    * sketch that partial-aggregates map-side instead of shuffling one
    * row per distinct value) — approximate ⇒ unit-level only
    * (CardinalitySpec pins the rsd envelope and the per-group call
    * shape).
    */
  val q53 = Q(
    "q53_distinct_users",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(date_format(col("ts"), "yyyy-MM-dd")).as("n_days"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             COUNT(*) AS n,
             COUNT(DISTINCT user_id) AS n_users,
             COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Frequent-items surface (ClickHouse topK analog): the top-3 users
    * by event count per event type, exact, with a deterministic
    * count-desc/user-asc tiebreak. Plan shape: two-level aggregate
    * (partial collapse on (type, user)) then a per-type top-N — the
    * grouped-TakeOrdered pattern, never a global sort. The sketch
    * twin at 100 TB is `count_min_sketch` (mergeable, fixed-size,
    * same per-group shape) — approximate ⇒ unit-level only
    * (FrequentItemsSpec pins the CMS overcount bound).
    */
  val q56 = Q(
    "q56_top_users",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      // two-level top-N: top-3 per (type, user-hash-bucket) — provably
      // a superset of the per-type top-3 — then rank the ≤ 3×32
      // survivors per type. A single partitionBy(event_type) window
      // would serialize every type's full user histogram onto one task.
      val counts = Tables(spark, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      val w1 = Window.partitionBy(col("event_type"),
          pmod(col("user_id"), lit(32)))
        .orderBy(col("n").desc, col("user_id").asc)
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("user_id").asc)
      counts.withColumn("r1", row_number().over(w1)).filter(col("r1") <= 3)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("event_type"), col("rank"), col("user_id"), col("n"))
        .orderBy(col("event_type"), col("rank"))
    },
    Some("""
      WITH c AS (
        SELECT event_type, user_id, COUNT(*) AS n
        FROM events
        GROUP BY event_type, user_id),
      r AS (
        SELECT event_type, user_id, n,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, user_id) AS rank
        FROM c)
      SELECT event_type, rank::INT AS rank, user_id, n
      FROM r WHERE rank <= 3
      ORDER BY event_type, rank"""))

  /** Sliding-frame aggregate (moving sum over the last 4 events) per
    * event type — the ClickHouse neighbor/moving-window surface, and
    * the third ordered-scan shape after q43's lag and q49's running
    * total. Bucket-decomposed (operators/OrderedScan.rollingSum): a
    * plain per-type frame window would serialize each type onto one
    * task; hourly buckets coalesced into ≥k-row groups keep it
    * parallel with only k rows replicated per group boundary. Values
    * go through floor(value*100) fixed-point so frame sums are exact
    * integers in both engines (double→long CAST truncates in Spark
    * but rounds in DuckDB; floor agrees everywhere).
    */
  val q57 = Q(
    "q57_moving_window",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
        .select(col("event_type"), col("event_id"), col("ts_ns"),
          floor(col("value") * 100).cast("long").as("cents"))
      graft.operators.OrderedScan.rollingSum(ev, col("event_type"),
          col("ts_ns"), col("event_id"), col("cents"), k = 4,
          bucket = floor(col("ts_ns") / lit(3600L * 1000 * 1000 * 1000)),
          asSum = "rsum", asN = "rn")
        .filter(col("event_id") % 199 === 0)
        .select(col("event_id"), col("event_type"), col("rsum"), col("rn"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH c AS (
        SELECT event_type, event_id, ts,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events),
      r AS (
        SELECT event_id, event_type,
               SUM(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rsum,
               COUNT(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rn
        FROM c)
      SELECT event_id, event_type, CAST(rsum AS BIGINT) AS rsum, rn
      FROM r
      WHERE event_id % 199 = 0
      ORDER BY event_id"""))

  /** Incrementally-maintained rollup (streaming/RollupSink — the
    * SummingMergeTree analog) driven end-to-end on the driver path:
    * events land as three batchId-keyed partial-aggregate parts, one
    * batch is REPLAYED (crash simulation — its part overwrites, never
    * double-counts), parts are compacted (the background-merge
    * analog), and a post-compaction part lands. The merged read must
    * equal a direct one-shot aggregate — which is exactly what the
    * oracle computes. Fixed-point cents keep partial-sum-of-sums
    * exact.
    */
  val q59 = Q(
    "q59_rollup_maintenance",
    (spark, dir) => {
      val keys = Seq("event_type", "day")
      val vals = Seq("cents")
      val out = java.nio.file.Files
        .createTempDirectory("graft-rollup-q59-").resolve("t").toString
      val ev = Tables(spark, dir, "events")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .withColumn("cents", floor(col("value") * 100).cast("long"))
        .select(col("event_type"), col("day"), col("cents"), col("event_id"))
      def stripe(b: Int) = ev.filter(pmod(col("event_id"), lit(4)) === b)
      for (b <- 0 until 3)
        graft.streaming.RollupSink.sinkBatch(stripe(b), b, keys, vals, out)
      // crash-replay of batch 1: must overwrite its own part
      graft.streaming.RollupSink.sinkBatch(stripe(1), 1L, keys, vals, out)
      graft.streaming.RollupSink.compact(spark, out, keys, vals)
      // a part landing after compaction still merges on read
      graft.streaming.RollupSink.sinkBatch(stripe(3), 3L, keys, vals, out)
      graft.streaming.RollupSink.read(spark, out, keys, vals)
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      SELECT event_type,
             strftime(ts, '%Y-%m-%d') AS day,
             COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM events
      GROUP BY 1, 2
      ORDER BY event_type, day"""))

  /** Cohort retention — the canonical two-level user analytics
    * composition over the landed events: each user's cohort is their
    * first active day (one agg on user_id), joined back to activity
    * on the same key and rolled up to (cohort, day) active-user
    * counts. The join is key-aligned with the aggregate, so at scale
    * (where the cohort side is too big to broadcast) both sides hash
    * to the same partitioning; at bench scale AQE simply broadcasts
    * the small side.
    */
  val q60 = Q(
    "q60_cohort_retention",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
        .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      val firstSeen = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort"))
      ev.join(firstSeen, "user_id")
        .groupBy(col("cohort"), col("day"))
        .agg(countDistinct(col("user_id")).as("active_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("cohort"), col("day"))
    },
    Some("""
      WITH d AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
      f AS (SELECT user_id, MIN(day) AS cohort FROM d GROUP BY user_id)
      SELECT f.cohort, d.day,
             COUNT(DISTINCT d.user_id) AS active_users,
             COUNT(*) AS n_events
      FROM d JOIN f USING (user_id)
      GROUP BY 1, 2
      ORDER BY cohort, day"""))

  /** Ordered, time-bounded funnel (view → click → purchase): per
    * user, the first view, the first click within 24 h AFTER it, and
    * the first purchase within 24 h after that click — sequence- and
    * window-constrained, not mere co-occurrence (unbounded, every
    * active user converges to full depth and the histogram
    * degenerates to one row). Three chained key-aligned aggregates on
    * user_id (at scale the step joins co-partition; at bench scale
    * AQE broadcasts the small step tables); the final histogram
    * counts users by conversion depth. Exact and order-deterministic,
    * so the oracle recomputes it step by step.
    */
  val q62 = {
    val winUs = 24L * 3600 * 1000000
    Q(
    "q62_funnel",
    (spark, dir) => {
      // µs-truncate like q43/q50/q51: the oracle's epoch_ns works on
      // DuckDB's µs-truncated timestamps, so strict step inequalities
      // must compare at the same precision
      val ev = Tables(spark, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("ts_ns div 1000").as("ts_us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts_us") > col("t_view") &&
          col("ts_us") <= col("t_view") + winUs)
        .groupBy(col("user_id"), col("t_view"))
        .agg(min(col("ts_us")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts_us") > col("t_click") &&
          col("ts_us") <= col("t_click") + winUs)
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_purchase"))
      val depth = v
        .join(c.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2).otherwise(1).as("depth"))
      depth.groupBy(col("depth"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("depth"))
    },
    Some(s"""
      WITH v AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id),
      c AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
          AND epoch_us(e.ts) <= v.t_view + $winUs
        GROUP BY e.user_id),
      p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
          AND epoch_us(e.ts) <= c.t_click + $winUs
        GROUP BY e.user_id),
      d AS (
        SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
                    WHEN c.user_id IS NOT NULL THEN 2
                    ELSE 1 END AS depth
        FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
      SELECT depth, COUNT(*) AS n_users
      FROM d
      GROUP BY depth
      ORDER BY depth"""))
  }

  /** Q2's multi-dimensional extension exercised against a REAL
    * z-ordered layout (sources/ZOrderLayout, morton(day, user_id)):
    * the two-filter slice — one day AND a narrow user range — reads
    * the layout built for exactly that shape. Oracle computes the
    * same slice from the raw table: layout must not change results
    * (the skipping win itself is pinned by ZOrderSpec from parquet
    * footers).
    */
  val q63 = Q(
    "q63_zorder_slice",
    (spark, dir) =>
      graft.sources.ZOrderLayout.events(spark, dir)
        .filter(col("ts_ns") >= graft.Tables.utcNanos("2024-01-05T00:00:00Z") &&
          col("ts_ns") < graft.Tables.utcNanos("2024-01-06T00:00:00Z") &&
          col("user_id").between(100, 200))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type")),
    Some(s"""
      SELECT event_type, COUNT(*) AS n, ${oSum("value")} AS sum_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
        AND user_id BETWEEN 100 AND 200
      GROUP BY event_type
      ORDER BY event_type"""))

  // ── ClickHouse behavioral-analytics parity (windowFunnel / retention /
  // sequenceMatch — the parametric-aggregate family the reference's users
  // run against the tables bristle lands; semantics here are the
  // deterministic variant: chain order is strictly increasing
  // (ts_ns, event_id), so ties can never make two engines disagree,
  // where ClickHouse's default windowFunnel is documented to be
  // unstable under equal timestamps).
  //
  // Scale shape (all three): ONE shuffle by user_id, per-user state is
  // the user's own behavioral events (bounded, the same per-key memory
  // contract ClickHouse's windowFunnel states), every chain step is a
  // codegen'd higher-order array function — no UDF, no self-join of the
  // events fact table, no driver state.

  /** `(a, b)` strictly after in chain order. */
  private def chainAfter(a: String, b: String): String =
    s"($a.ts_ns > $b.ts_ns OR ($a.ts_ns = $b.ts_ns AND $a.event_id > $b.event_id))"

  /** Per-user sorted behavioral event array for the given step types,
    * from any frame with user_id/ts_ns/event_id/event_type (Stress
    * feeds replicated frames through this same path).
    */
  private[graft] def userEventsOf(ev: org.apache.spark.sql.DataFrame,
      types: Seq[String]) = {
    val users = ev.select(col("user_id")).distinct()
    val evs = ev.filter(col("event_type").isin(types: _*))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("ts_ns"), col("event_id"), col("event_type")))).as("evs"))
    // right-join back so users with NO step events still report (depth
    // 0 / no match) — same shuffle key, so AQE coalesces the exchange
    users.join(evs, Seq("user_id"), "left")
  }

  /** Per-user sorted behavioral event array for the given step types. */
  private def userEvents(spark: org.apache.spark.sql.SparkSession, dir: String,
      types: Seq[String]) =
    userEventsOf(Tables(spark, dir, "events")
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type")), types)

  /** The q112 funnel-depth projection over a [[userEventsOf]] frame —
    * shared with Stress so the measured curve is the shipped plan.
    *
    * SINGLE-PASS O(n·levels) fold (the classic windowFunnel scan, and
    * q119's discipline), not a per-anchor search: the state keeps, per
    * level, the LATEST anchor time of any chain reaching that level
    * (-1 = none). Keeping the max anchor is lossless by dominance — an
    * event extends level k-1 iff its time fits inside SOME anchor's
    * window, and the largest anchor is the most permissive; the
    * extended chain then carries that same anchor forward. Chain order
    * (strictly increasing (ts_ns, event_id)) is enforced by the sorted
    * array itself: an event can only extend state built from events
    * sorted before it. Replaces the earlier max-over-anchors lambda
    * search, whose per-user cost was O(starts × events) — quadratic in
    * per-user density, the axis this fixture grows with SF.
    */
  private[graft] def funnelDepth(grouped: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val W = 6L * 3600 * 1000000000L
    val depth = s"""coalesce(aggregate(evs,
      named_struct('b1', -1L, 'b2', -1L, 'b3', -1L),
      (acc, e) -> CASE
        WHEN e.event_type = 'view'
          THEN named_struct('b1', greatest(acc.b1, e.ts_ns),
                            'b2', acc.b2, 'b3', acc.b3)
        WHEN e.event_type = 'click' AND acc.b1 != -1L
             AND e.ts_ns <= acc.b1 + ${W}L
          THEN named_struct('b1', acc.b1,
                            'b2', greatest(acc.b2, acc.b1), 'b3', acc.b3)
        WHEN e.event_type = 'purchase' AND acc.b2 != -1L
             AND e.ts_ns <= acc.b2 + ${W}L
          THEN named_struct('b1', acc.b1, 'b2', acc.b2,
                            'b3', greatest(acc.b3, acc.b2))
        ELSE acc END,
      acc -> CASE WHEN acc.b3 != -1L THEN 3
                  WHEN acc.b2 != -1L THEN 2
                  WHEN acc.b1 != -1L THEN 1
                  ELSE 0 END), 0)"""
    grouped.select(col("user_id"), expr(depth).cast("int").as("funnel_depth"))
  }

  /** windowFunnel('view' → 'click' → 'purchase', 6 h): each user's
    * maximum funnel depth, where every later step must land strictly
    * after the previous one (chain order) and within the window of the
    * FIRST step. Greedy earliest-next-step per start is optimal for a
    * fixed start (taking the earliest candidate never removes later
    * options), so max-over-starts of the greedy chain IS the maximum
    * depth. The `transform(array(x), s -> …)` wrapper is a let-binding:
    * the step-2 candidate is computed once and bound as `s2`.
    *
    * The oracle deliberately takes a DIFFERENT shape (LATERAL
    * first-match joins instead of per-user arrays) — independent
    * formulations agreeing is a stronger check than a mirrored one.
    */
  val q112 = Q(
    "q112_window_funnel",
    (spark, dir) =>
      funnelDepth(userEvents(spark, dir, Seq("view", "click", "purchase")))
        .orderBy(col("user_id")),
    Some(s"""
      WITH ev AS (
        SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
      ),
      starts AS (
        SELECT v.user_id, c2.event_id AS e2, c3.event_id AS e3
        FROM ev v
        LEFT JOIN LATERAL (
          SELECT c.ts_ns, c.event_id FROM ev c
          WHERE c.user_id = v.user_id AND c.event_type = 'click'
            AND (c.ts_ns > v.ts_ns
                 OR (c.ts_ns = v.ts_ns AND c.event_id > v.event_id))
            AND c.ts_ns <= v.ts_ns + ${6L * 3600 * 1000000000L}
          ORDER BY c.ts_ns, c.event_id LIMIT 1) c2 ON true
        LEFT JOIN LATERAL (
          SELECT p.event_id FROM ev p
          WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
            AND (p.ts_ns > c2.ts_ns
                 OR (p.ts_ns = c2.ts_ns AND p.event_id > c2.event_id))
            AND p.ts_ns <= v.ts_ns + ${6L * 3600 * 1000000000L}
          ORDER BY p.ts_ns, p.event_id LIMIT 1) c3 ON true
        WHERE v.event_type = 'view'
      ),
      depths AS (
        SELECT user_id,
               MAX(1 + CASE WHEN e2 IS NULL THEN 0
                            ELSE 1 + CASE WHEN e3 IS NULL THEN 0 ELSE 1 END
                       END) AS d
        FROM starts GROUP BY user_id
      )
      SELECT u.user_id, CAST(coalesce(d.d, 0) AS INT) AS funnel_depth
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN depths d USING (user_id)
      ORDER BY user_id"""))

  /** retention(active day 0, day 1, day 7) — ClickHouse `retention`:
    * r0 = any event on 2024-01-05; r_i = r0 AND active on day i (later
    * conditions only count when the first held). Plain conditional
    * aggregation: one shuffle, three flags.
    */
  val q113 = Q(
    "q113_retention",
    (spark, dir) => {
      def active(day: String) =
        max(when(to_date(col("ts")) === lit(day).cast("date"), 1)
          .otherwise(0))
      Tables(spark, dir, "events")
        .groupBy(col("user_id"))
        .agg(active("2024-01-05").as("a0"), active("2024-01-06").as("a1"),
          active("2024-01-12").as("a7"))
        .select(col("user_id"), col("a0").cast("int").as("r0"),
          (col("a0") * col("a1")).cast("int").as("r1"),
          (col("a0") * col("a7")).cast("int").as("r7"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
        CAST(MAX(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-05'
                      THEN 1 ELSE 0 END) AS INT) AS r0,
        CAST(MAX(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-05'
                      THEN 1 ELSE 0 END)
           * MAX(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-06'
                      THEN 1 ELSE 0 END) AS INT) AS r1,
        CAST(MAX(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-05'
                      THEN 1 ELSE 0 END)
           * MAX(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-12'
                      THEN 1 ELSE 0 END) AS INT) AS r7
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** sequenceMatch('(?1).*(?2).*(?3)') — signup, then error, then
    * purchase, in chain order with any gaps and no window. Greedy
    * first-match per level decides existence (earliest signup, then
    * earliest later error, then any later purchase — each greedy pick
    * only widens what can follow). Oracle: an independent EXISTS over
    * the ordered event triple.
    */
  val q114 = Q(
    "q114_sequence_match",
    (spark, dir) => {
      val s1 = "try_element_at(filter(evs, e1 -> e1.event_type = 'signup'), 1)"
      val s2 = "try_element_at(filter(evs, e2 -> e2.event_type = 'error' " +
        s"AND ${chainAfter("e2", "s1")}), 1)"
      val matched = s"""coalesce(try_element_at(transform(array($s1),
        s1 -> CASE WHEN s1 IS NULL THEN 0 ELSE
          try_element_at(transform(array($s2),
            s2 -> CASE WHEN s2 IS NULL THEN 0 ELSE
              CASE WHEN exists(evs, e3 -> e3.event_type = 'purchase'
                AND ${chainAfter("e3", "s2")}) THEN 1 ELSE 0 END
            END), 1)
        END), 1), 0)"""
      userEvents(spark, dir, Seq("signup", "error", "purchase"))
        .select(col("user_id"), expr(matched).cast("int").as("matched"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type
        FROM events
        WHERE event_type IN ('signup', 'error', 'purchase')
      )
      SELECT u.user_id,
        CAST(EXISTS (
          SELECT 1 FROM ev s, ev e, ev p
          WHERE s.user_id = u.user_id AND e.user_id = u.user_id
            AND p.user_id = u.user_id
            AND s.event_type = 'signup' AND e.event_type = 'error'
            AND p.event_type = 'purchase'
            AND (e.ts_ns > s.ts_ns
                 OR (e.ts_ns = s.ts_ns AND e.event_id > s.event_id))
            AND (p.ts_ns > e.ts_ns
                 OR (p.ts_ns = e.ts_ns AND p.event_id > e.event_id))
        ) AS INT) AS matched
      FROM (SELECT DISTINCT user_id FROM events) u
      ORDER BY user_id"""))

  /** windowFunnel strict_order — q112's chain rule hardened the way
    * ClickHouse's `strict_order` mode is: an intervening funnel-step
    * event of the WRONG type breaks the chain (q112 skips past it).
    * Deterministically: from the current chain event, look at the
    * single NEXT step-type event in chain order within the window —
    * the chain extends iff it is exactly the expected step. Max over
    * anchors as before. Same one-shuffle per-user array shape; the
    * only change is that the level-k candidate drops its type filter
    * and the type becomes a CASE test.
    */
  val q118 = Q(
    "q118_window_funnel_strict",
    (spark, dir) => {
      val W = 6L * 3600 * 1000000000L
      // Strict chains survive exactly ONE next-event each (any
      // step-type event either advances or breaks every awaiting
      // chain), so the operator reduces to an O(n) consecutive-run
      // scan — state (stage, anchor, best), q112's fold discipline.
      // A view both breaks an awaiting chain (wrong type) and opens
      // its own, which is why the view arm resets stage to 1
      // unconditionally.
      val depth = s"""coalesce(aggregate(evs,
        named_struct('stage', 0, 'anchor', -1L, 'best', 0),
        (acc, e) -> CASE
          WHEN e.event_type = 'view'
            THEN named_struct('stage', 1, 'anchor', e.ts_ns,
                              'best', greatest(acc.best, 1))
          WHEN e.event_type = 'click' AND acc.stage = 1
               AND e.ts_ns <= acc.anchor + ${W}L
            THEN named_struct('stage', 2, 'anchor', acc.anchor,
                              'best', greatest(acc.best, 2))
          WHEN e.event_type = 'purchase' AND acc.stage = 2
               AND e.ts_ns <= acc.anchor + ${W}L
            THEN named_struct('stage', 0, 'anchor', -1L,
                              'best', greatest(acc.best, 3))
          ELSE named_struct('stage', 0, 'anchor', -1L, 'best', acc.best)
          END,
        acc -> acc.best), 0)"""
      userEvents(spark, dir, Seq("view", "click", "purchase"))
        .select(col("user_id"), expr(depth).cast("int").as("funnel_depth"))
        .orderBy(col("user_id"))
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
      ),
      starts AS (
        SELECT v.user_id,
               CASE WHEN n1.event_type = 'click' THEN n1.ts_ns END AS t2,
               CASE WHEN n1.event_type = 'click' THEN n1.event_id END AS e2,
               n2.event_type AS n2_type
        FROM ev v
        LEFT JOIN LATERAL (
          SELECT c.ts_ns, c.event_id, c.event_type FROM ev c
          WHERE c.user_id = v.user_id
            AND (c.ts_ns > v.ts_ns
                 OR (c.ts_ns = v.ts_ns AND c.event_id > v.event_id))
            AND c.ts_ns <= v.ts_ns + ${6L * 3600 * 1000000000L}
          ORDER BY c.ts_ns, c.event_id LIMIT 1) n1 ON true
        LEFT JOIN LATERAL (
          SELECT p.event_type FROM ev p
          WHERE p.user_id = v.user_id AND n1.event_type = 'click'
            AND (p.ts_ns > n1.ts_ns
                 OR (p.ts_ns = n1.ts_ns AND p.event_id > n1.event_id))
            AND p.ts_ns <= v.ts_ns + ${6L * 3600 * 1000000000L}
          ORDER BY p.ts_ns, p.event_id LIMIT 1) n2 ON true
        WHERE v.event_type = 'view'
      ),
      depths AS (
        SELECT user_id,
               MAX(CASE WHEN e2 IS NULL THEN 1
                        WHEN n2_type IS DISTINCT FROM 'purchase' THEN 2
                        ELSE 3 END) AS d
        FROM starts GROUP BY user_id
      )
      SELECT u.user_id, CAST(coalesce(d.d, 0) AS INT) AS funnel_depth
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN depths d USING (user_id)
      ORDER BY user_id"""))

  /** sequenceCount('(?1).*(?2).*(?3)') — how many NON-OVERLAPPING
    * signup →* error →* purchase chains each user completes, counting
    * greedily in chain order (after a match completes, the scan
    * resumes after its last event). With no window this greedy count
    * is a SINGLE-PASS state machine — if any anchor after the cursor
    * completes, the earliest one does (a later anchor's chain events
    * all sit after the earlier anchor too), so taking first-signup /
    * first-error / first-purchase as they stream by is exact. That
    * makes the whole operator one codegen'd `aggregate` fold over the
    * per-user array: state (stage, count), no UDF, no iteration.
    *
    * The oracle is maximally independent: a RECURSIVE CTE that
    * materializes each anchor's greedy chain via LATERAL first-match
    * joins, then walks non-overlapping selections cursor by cursor.
    */
  val q119 = Q(
    "q119_sequence_count",
    (spark, dir) => {
      val count = """coalesce(aggregate(evs,
        named_struct('stage', 0, 'cnt', 0),
        (acc, e) -> CASE
          WHEN acc.stage = 0 AND e.event_type = 'signup'
            THEN named_struct('stage', 1, 'cnt', acc.cnt)
          WHEN acc.stage = 1 AND e.event_type = 'error'
            THEN named_struct('stage', 2, 'cnt', acc.cnt)
          WHEN acc.stage = 2 AND e.event_type = 'purchase'
            THEN named_struct('stage', 0, 'cnt', acc.cnt + 1)
          ELSE acc END,
        acc -> acc.cnt), 0)"""
      userEvents(spark, dir, Seq("signup", "error", "purchase"))
        .select(col("user_id"), expr(count).cast("int").as("seq_count"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH RECURSIVE ev AS (
        SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type
        FROM events
        WHERE event_type IN ('signup', 'error', 'purchase')
      ),
      chains AS (
        SELECT s.user_id, s.ts_ns AS a_ts, s.event_id AS a_id,
               p.ts_ns AS p_ts, p.event_id AS p_id
        FROM ev s
        JOIN LATERAL (
          SELECT e.ts_ns, e.event_id FROM ev e
          WHERE e.user_id = s.user_id AND e.event_type = 'error'
            AND (e.ts_ns > s.ts_ns
                 OR (e.ts_ns = s.ts_ns AND e.event_id > s.event_id))
          ORDER BY e.ts_ns, e.event_id LIMIT 1) e ON true
        JOIN LATERAL (
          SELECT p.ts_ns, p.event_id FROM ev p
          WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
            AND (p.ts_ns > e.ts_ns
                 OR (p.ts_ns = e.ts_ns AND p.event_id > e.event_id))
          ORDER BY p.ts_ns, p.event_id LIMIT 1) p ON true
        WHERE s.event_type = 'signup'
      ),
      rec AS (
        SELECT user_id, CAST(-1 AS BIGINT) AS cur_ts,
               CAST(-1 AS BIGINT) AS cur_id, 0 AS n
        FROM (SELECT DISTINCT user_id FROM ev)
        UNION ALL
        SELECT r.user_id,
          (SELECT c.p_ts FROM chains c
           WHERE c.user_id = r.user_id
             AND (c.a_ts > r.cur_ts
                  OR (c.a_ts = r.cur_ts AND c.a_id > r.cur_id))
           ORDER BY c.a_ts, c.a_id LIMIT 1),
          (SELECT c.p_id FROM chains c
           WHERE c.user_id = r.user_id
             AND (c.a_ts > r.cur_ts
                  OR (c.a_ts = r.cur_ts AND c.a_id > r.cur_id))
           ORDER BY c.a_ts, c.a_id LIMIT 1),
          r.n + 1
        FROM rec r
        WHERE EXISTS (SELECT 1 FROM chains c
           WHERE c.user_id = r.user_id
             AND (c.a_ts > r.cur_ts
                  OR (c.a_ts = r.cur_ts AND c.a_id > r.cur_id)))
      )
      SELECT u.user_id, CAST(coalesce(m.n, 0) AS INT) AS seq_count
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN (SELECT user_id, MAX(n) AS n FROM rec GROUP BY 1) m
        USING (user_id)
      ORDER BY u.user_id"""))

  /** Deterministic-sample quantiles (ClickHouse `quantileDeterministic`
    * analog): per event_type, the 256-row deterministic sample — rows
    * whose md5(event_id) hashes rank bottom-256, the determinator
    * making resampling reproducible — then the discrete quantile
    * (the element at index 1 + floor(q·(n−1)) of the value-sorted
    * multiset) at 25/50/75 over the sample, next to the exact
    * same-formula quantile over ALL rows. Quantile points are exact
    * binary fractions so q·(n−1) is an EXACT double product — floor
    * cannot straddle an ulp cross-engine — and outputs are SELECTED
    * input values (no interpolation arithmetic), so the whole row is
    * hash-exact.
    *
    * Scale shape: sample selection is [[graft.operators.OrderedScan
    * .bottomK]] in hash order (bucket-pruned — no per-type full sort);
    * the in-sample value rank is a plain per-type window, scale-safe
    * because the sample is ≤ 256 rows per key BY CONSTRUCTION. The
    * exact side ranks values via OrderedScan.runningTotal with a
    * value-monotone bucket, so even the "ground truth" leg never
    * funnels a type into one task. The target indexes come from
    * per-type counts (summary-sized), exploded to 3 rows per type.
    */
  val q122 = Q(
    "q122_sampled_quantiles",
    (spark, dir) => {
      val k = 256
      val qs = Seq(("p25", 0.25), ("p50", 0.50), ("p75", 0.75))
      // the md5-hashed projection feeds bottomK (two reads of its
      // input), the exact rank leg AND the per-type counts — four
      // evaluations of the per-row md5 without the cache (guide §5);
      // the ≤ 256×types sample is read twice. Both lazy, drained with
      // the query.
      val ev = Tables(spark, dir, "events")
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("h",
          conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
            .cast("long"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.pipeline.Similarity.registerForRelease(ev)
      val sample = graft.operators.OrderedScan.bottomK(ev, col("event_type"),
          col("h"), col("event_id"), expr(s"h div ${1L << 53}L"), k, "rk")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.pipeline.Similarity.registerForRelease(sample)
      // bounded-sample value rank: ≤ k rows per key by construction,
      // so the per-key window is not a scale hazard here
      val vw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      val sr = sample.withColumn("vr", row_number().over(vw).cast("long"))
      val ns = sample.groupBy(col("event_type")).agg(count(lit(1)).as("ns"))
      val xr = graft.operators.OrderedScan.runningTotal(ev, col("event_type"),
        Seq(col("value"), col("event_id")), lit(1L),
        floor(col("value") / 32), "vr")
      val nx = ev.groupBy(col("event_type")).agg(count(lit(1)).as("nx"))
      def targets(counts: org.apache.spark.sql.DataFrame, n: String) =
        counts.select(col("event_type"), col(n),
          explode(array(qs.map { case (nm, q) =>
            struct(lit(nm).as("quantile"),
              (lit(1L) + floor(lit(q) * (col(n) - 1))).as("idx"))
          }: _*)).as("t"))
          .select(col("event_type"), col(n), col("t.quantile"), col("t.idx"))
      val sq = sr.join(targets(ns, "ns"), Seq("event_type"))
        .filter(col("vr") === col("idx"))
        .select(col("event_type"), col("quantile"), col("ns").as("n_sample"),
          col("value").as("sample_value"))
      val xq = xr.join(targets(nx, "nx"), Seq("event_type"))
        .filter(col("vr") === col("idx"))
        .select(col("event_type"), col("quantile"), col("nx").as("n_total"),
          col("value").as("exact_value"))
      sq.join(xq, Seq("event_type", "quantile"))
        .select(col("event_type"), col("quantile"), col("n_sample"),
          col("n_total"), col("sample_value"), col("exact_value"))
        .orderBy(col("event_type"), col("quantile"))
    },
    Some("""
      WITH ev AS (SELECT event_type, event_id, value,
                         ('0x'||substr(md5(event_id::VARCHAR),1,15))::BIGINT
                           AS h
                  FROM events),
      s AS (SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY h, event_id) AS rk
            FROM ev),
      sample AS (SELECT * FROM s WHERE rk <= 256),
      sr AS (SELECT event_type, value,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY value, event_id) AS vr,
                    COUNT(*) OVER (PARTITION BY event_type) AS ns
             FROM sample),
      xr AS (SELECT event_type, value,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY value, event_id) AS vr,
                    COUNT(*) OVER (PARTITION BY event_type) AS nx
             FROM ev),
      qs AS (SELECT * FROM (VALUES ('p25', 0.25::DOUBLE),
                                   ('p50', 0.50::DOUBLE),
                                   ('p75', 0.75::DOUBLE)) AS t(quantile, qq)),
      sq AS (SELECT sr.event_type, qs.quantile, sr.ns AS n_sample,
                    sr.value AS sample_value
             FROM sr JOIN qs ON sr.vr = 1 + FLOOR(qs.qq * (sr.ns - 1))),
      xq AS (SELECT xr.event_type, qs.quantile, xr.nx AS n_total,
                    xr.value AS exact_value
             FROM xr JOIN qs ON xr.vr = 1 + FLOOR(qs.qq * (xr.nx - 1)))
      SELECT sq.event_type, sq.quantile, sq.n_sample, xq.n_total,
             sq.sample_value, xq.exact_value
      FROM sq JOIN xq ON sq.event_type = xq.event_type
                     AND sq.quantile = xq.quantile
      ORDER BY sq.event_type, sq.quantile"""))

  /** Time-series gap filling (ClickHouse `ORDER BY … WITH FILL` +
    * LOCF analog): the hourly high-value-event series per event_type,
    * densified to EVERY hour between each series' first and last
    * observation — missing hours appear with n_events = 0, a null
    * hourly sum, and the last observed sum carried forward
    * (`last(…, ignoreNulls)`, ClickHouse's `INTERPOLATE (x AS x)` /
    * the standard LOCF read). The value > 80 slice makes the series
    * genuinely sparse at sf0.01 (~300 of 720 hours per type) so the
    * fill path is exercised, while sf0.1 also covers the dense
    * near-no-op regime.
    *
    * Scale shape: the heavy work is one keyed (type, hour) aggregate
    * with the value predicate pushed to the scan; the spine is
    * CALENDAR-sized (types × hours-in-range — at 100 TB it grows with
    * the time range, never with row count), built from a summary-
    * sized min/max agg and `sequence`. The LOCF window partitions by
    * type over spine rows — bounded by the calendar, safe by
    * construction (same argument as q122's in-sample rank). First
    * spine row per type is an observation by construction, so the
    * carried value is never null.
    */
  val q124 = Q(
    "q124_gap_fill",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
        .filter(col("value") > 80)
        .select(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"), col("value"))
      val hourly = ev.groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("hour_sum"))
      val spine = ev.groupBy(col("event_type"))
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"),
            expr("interval 1 hour"))).as("hr"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      spine.join(hourly, Seq("event_type", "hr"), "left")
        .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
        .withColumn("locf_sum", last(col("hour_sum"), ignoreNulls = true).over(w))
        .select(col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n_events"), col("hour_sum"), col("locf_sum"),
          (col("n_events") === 0L).as("is_gap"))
        .orderBy(col("event_type"), col("hour"))
    },
    Some("""
      WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS hr, value
                  FROM events WHERE value > 80),
      hourly AS (SELECT event_type, hr, COUNT(*) AS n_events,
                        CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                          AS hour_sum
                 FROM ev GROUP BY 1, 2),
      bounds AS (SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1
                 FROM ev GROUP BY 1),
      spine AS (SELECT b.event_type, u.g AS hr
                FROM bounds b,
                     UNNEST(generate_series(b.h0, b.h1, INTERVAL 1 HOUR))
                       AS u(g))
      SELECT s.event_type,
             strftime(s.hr, '%Y-%m-%d %H:%M:%S') AS hour,
             COALESCE(h.n_events, 0) AS n_events,
             h.hour_sum,
             LAST_VALUE(h.hour_sum IGNORE NULLS)
               OVER (PARTITION BY s.event_type ORDER BY s.hr
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS locf_sum,
             COALESCE(h.n_events, 0) = 0 AS is_gap
      FROM spine s LEFT JOIN hourly h
        ON h.event_type = s.event_type AND h.hr = s.hr
      ORDER BY s.event_type, hour"""))

  /** Equi-depth histogram (ClickHouse `histogram` / Trino
    * `numeric_histogram` analog, made DETERMINISTIC): per event_type,
    * B = 8 buckets holding (near-)equal row counts, with exact
    * per-bucket counts and [lo, hi] value edges. Instead of the
    * approximate streaming algorithms those engines use (whose bins
    * are merge-order-dependent and can't be oracle-checked), rows are
    * ranked by (value, event_id) and bucket i = ⌊(rank−1)·B/n⌋ —
    * all-integer bucket arithmetic, and the emitted edges are
    * SELECTED input values, so every cell is hash-exact cross-engine.
    * This is the histogram an optimizer's column statistics actually
    * want (equal-mass, exact boundaries).
    *
    * Scale shape: the rank comes from `OrderedScan.runningTotal` with
    * a value-monotone bucket — per-type ranking never funnels a type
    * onto one task (q122's exact-leg discipline) — and the rest is
    * one keyed (type, bucket) aggregate. The oracle replays the rank
    * with a naive full per-type sort; pruned plan ≡ naive, to the bit.
    */
  val q125 = Q(
    "q125_equidepth_histogram",
    (spark, dir) => {
      val b = 8
      val ev = Tables(spark, dir, "events")
        .select(col("event_type"), col("event_id"), col("value"))
      val ranked = graft.operators.OrderedScan.runningTotal(ev,
        col("event_type"), Seq(col("value"), col("event_id")), lit(1L),
        floor(col("value") / 32), "vr")
      val n = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      ranked.join(n, Seq("event_type"))
        .withColumn("bucket", expr(s"(vr - 1) * $b div n").cast("int"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy(col("event_type"), col("bucket"))
    },
    Some("""
      WITH r AS (SELECT event_type, value,
                        row_number() OVER (PARTITION BY event_type
                                           ORDER BY value, event_id) AS vr,
                        COUNT(*) OVER (PARTITION BY event_type) AS n
                 FROM events)
      SELECT event_type, CAST((vr - 1) * 8 // n AS INT) AS bucket,
             COUNT(*) AS n_rows, MIN(value) AS lo, MAX(value) AS hi
      FROM r
      GROUP BY 1, 2
      ORDER BY event_type, bucket"""))

  /** Next-node attribution (ClickHouse `sequenceNextNode
    * ('forward', 'first_match')` analog): for every user whose
    * timeline matches the chain view →* click (earliest view, then
    * earliest later click — q112's strictly-increasing (ts_ns,
    * event_id) chain order, so the match is deterministic), the
    * event type of the event IMMEDIATELY AFTER the matched click —
    * i.e. "what do users do right after converting the chain?" —
    * aggregated to a next-node distribution. Chain-matched users
    * whose click is their last event land in the '(end)' bucket;
    * users with no chain are excluded, as in ClickHouse.
    *
    * Same scale shape as the whole behavioral family: ONE user_id
    * shuffle into per-user sorted arrays, then codegen'd array
    * lambdas (three ordered first-match scans) — no Window, no fact
    * self-join; the final distribution is a summary-sized aggregate.
    */
  val q126 = Q(
    "q126_sequence_next_node",
    (spark, dir) => {
      val s1 = "try_element_at(filter(evs, e1 -> e1.event_type = 'view'), 1)"
      val s2 = "try_element_at(filter(evs, e2 -> e2.event_type = 'click'" +
        s" AND ${chainAfter("e2", "s1")}), 1)"
      val nx = s"try_element_at(filter(evs, e3 -> ${chainAfter("e3", "s2")}), 1)"
      val r = s"""try_element_at(transform(array($s1),
        s1 -> CASE WHEN s1 IS NULL
          THEN named_struct('matched', 0, 'nxt', CAST(NULL AS STRING))
          ELSE try_element_at(transform(array($s2),
            s2 -> CASE WHEN s2 IS NULL
              THEN named_struct('matched', 0, 'nxt', CAST(NULL AS STRING))
              ELSE named_struct('matched', 1, 'nxt', ($nx).event_type)
            END), 1)
        END), 1)"""
      userEvents(spark, dir,
          Seq("view", "click", "purchase", "signup", "error"))
        .select(col("user_id"), expr(r).as("r"))
        .filter(col("r.matched") === 1)
        .select(coalesce(col("r.nxt"), lit("(end)")).as("next_node"))
        .groupBy(col("next_node"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("next_node"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type
        FROM events),
      v AS (SELECT user_id, ts_ns, event_id FROM (
              SELECT user_id, ts_ns, event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts_ns, event_id) AS rk
              FROM ev WHERE event_type = 'view') t WHERE rk = 1),
      c AS (SELECT user_id, ts_ns, event_id FROM (
              SELECT e.user_id, e.ts_ns, e.event_id,
                     row_number() OVER (PARTITION BY e.user_id
                                        ORDER BY e.ts_ns, e.event_id) AS rk
              FROM ev e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click'
                AND (e.ts_ns > v.ts_ns
                     OR (e.ts_ns = v.ts_ns AND e.event_id > v.event_id))) t
            WHERE rk = 1),
      nx AS (SELECT user_id, event_type FROM (
              SELECT e.user_id, e.event_type,
                     row_number() OVER (PARTITION BY e.user_id
                                        ORDER BY e.ts_ns, e.event_id) AS rk
              FROM ev e JOIN c ON c.user_id = e.user_id
              WHERE (e.ts_ns > c.ts_ns
                     OR (e.ts_ns = c.ts_ns AND e.event_id > c.event_id))) t
            WHERE rk = 1)
      SELECT COALESCE(nx.event_type, '(end)') AS next_node,
             COUNT(*) AS n_users
      FROM c LEFT JOIN nx USING (user_id)
      GROUP BY 1
      ORDER BY next_node"""))

  /** Conversion-lag quantiles — "how long does view → click take?":
    * for every converting user (q126's deterministic first-match
    * chain), the lag click.ts_ns − view.ts_ns, then the discrete
    * p25/p50/p75 over all converting users' lags next to the
    * min/max. Lags are exact integer nanoseconds and quantile
    * outputs are SELECTED lags (q122's discrete form at exact-
    * binary-fraction points), so the whole row is hash-exact.
    *
    * Scale shape: the chain match is the behavioral one-shuffle
    * array fold; the lag ranking is `OrderedScan.runningTotal` under
    * a lag-monotone bucket with a CONSTANT key — converting users
    * are corpus-scale (billions at 100 TB), and the bucket
    * decomposition is what keeps a global rank from funneling them
    * onto one task. Targets come from one count row.
    */
  val q128 = Q(
    "q128_conversion_lag",
    (spark, dir) => {
      val qs = Seq(("p25", 0.25), ("p50", 0.50), ("p75", 0.75))
      val s1 = "try_element_at(filter(evs, e1 -> e1.event_type = 'view'), 1)"
      val s2 = "try_element_at(filter(evs, e2 -> e2.event_type = 'click'" +
        s" AND ${chainAfter("e2", "s1")}), 1)"
      val lagNs = s"""try_element_at(transform(array($s1),
        s1 -> CASE WHEN s1 IS NULL THEN CAST(NULL AS BIGINT) ELSE
          try_element_at(transform(array($s2),
            s2 -> s2.ts_ns - s1.ts_ns), 1)
        END), 1)"""
      val lag = userEvents(spark, dir, Seq("view", "click"))
        .select(col("user_id"), expr(lagNs).as("lag_ns"))
        .filter(col("lag_ns").isNotNull)
      val ranked = graft.operators.OrderedScan.runningTotal(lag, lit("all"),
        Seq(col("lag_ns"), col("user_id")), lit(1L),
        floor(col("lag_ns") / lit(1L << 40)), "vr")
      val n = lag.agg(count(lit(1)).as("n_users"),
        min(col("lag_ns")).as("min_lag_ns"), max(col("lag_ns")).as("max_lag_ns"))
      val targets = n.select(col("n_users"), col("min_lag_ns"),
          col("max_lag_ns"),
          explode(array(qs.map { case (nm, q) =>
            struct(lit(nm).as("quantile"),
              (lit(1L) + floor(lit(q) * (col("n_users") - 1))).as("idx"))
          }: _*)).as("t"))
        .select(col("n_users"), col("min_lag_ns"), col("max_lag_ns"),
          col("t.quantile"), col("t.idx"))
      ranked.join(targets, col("vr") === col("idx"))
        .select(col("quantile"), col("n_users"), col("lag_ns"),
          col("min_lag_ns"), col("max_lag_ns"))
        .orderBy(col("quantile"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type
        FROM events),
      v AS (SELECT user_id, ts_ns, event_id FROM (
              SELECT user_id, ts_ns, event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts_ns, event_id) AS rk
              FROM ev WHERE event_type = 'view') t WHERE rk = 1),
      c AS (SELECT user_id, ts_ns FROM (
              SELECT e.user_id, e.ts_ns,
                     row_number() OVER (PARTITION BY e.user_id
                                        ORDER BY e.ts_ns, e.event_id) AS rk
              FROM ev e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click'
                AND (e.ts_ns > v.ts_ns
                     OR (e.ts_ns = v.ts_ns AND e.event_id > v.event_id))) t
            WHERE rk = 1),
      lag AS (SELECT c.user_id, c.ts_ns - v.ts_ns AS lag_ns
              FROM c JOIN v USING (user_id)),
      r AS (SELECT lag_ns,
                   row_number() OVER (ORDER BY lag_ns, user_id) AS vr,
                   COUNT(*) OVER () AS n_users,
                   MIN(lag_ns) OVER () AS min_lag_ns,
                   MAX(lag_ns) OVER () AS max_lag_ns
            FROM lag),
      qs AS (SELECT * FROM (VALUES ('p25', 0.25::DOUBLE),
                                   ('p50', 0.50::DOUBLE),
                                   ('p75', 0.75::DOUBLE)) AS t(quantile, qq))
      SELECT qs.quantile, r.n_users, r.lag_ns, r.min_lag_ns, r.max_lag_ns
      FROM r JOIN qs ON r.vr = 1 + FLOOR(qs.qq * (r.n_users - 1))
      ORDER BY qs.quantile"""))

  /** Interval-union coverage (ClickHouse `intervalLengthSum` analog):
    * each event opens a 5-minute activity interval [t, t+D); per user,
    * the LENGTH OF THE UNION of those intervals (overlaps merged, in
    * exact integer µs) and the number of merged islands — the "how
    * much distinct active time" read that naive per-event sums
    * double-count. Union length over sorted starts collapses to
    * Σ min(D, next_t − t) + D and islands to 1 + #{gaps > D}, so the
    * whole reduction is one pass over each user's sorted times — no
    * pairwise interval join. Comparisons run in µs (ts_ns div 1000 vs
    * epoch_us — the engines agree exactly there; ns would flake on
    * DuckDB's µs truncation).
    *
    * Scale shape: ONE user_id shuffle into per-user sorted arrays,
    * then codegen'd zip_with/aggregate lambdas — the q112-q128
    * behavioral discipline (per-user density is the bounded axis; no
    * Window over the fact table, no self-join).
    */
  /** The q129 reduction over any frame with user_id/ts_ns — shared
    * with Stress so the measured curve is the shipped plan.
    */
  private[graft] def intervalCoverageOf(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val D = 300000000L // 5 min in µs
    ev.select(col("user_id"), expr("ts_ns div 1000").as("t"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("t"))).as("a"))
      .select(col("user_id"), size(col("a")).cast("long").as("n_events"),
        expr(s"""1L + cast(size(filter(
            zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),
                     (x, y) -> y - x),
            g -> g > ${D}L)) as bigint)""").as("n_islands"),
        expr(s"""aggregate(
            zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),
                     (x, y) -> least(${D}L, y - x)),
            0L, (acc, g) -> acc + g) + ${D}L""").as("covered_us"))
      .orderBy(col("user_id"))
  }

  val q129 = Q(
    "q129_interval_coverage",
    (spark, dir) => intervalCoverageOf(Tables(spark, dir, "events")),
    Some("""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      g AS (SELECT user_id, t,
                   lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nxt
            FROM ev)
      SELECT user_id, COUNT(*) AS n_events,
             1 + COUNT(CASE WHEN nxt - t > 300000000 THEN 1 END) AS n_islands,
             CAST(SUM(CASE WHEN nxt IS NULL THEN 300000000
                           ELSE LEAST(300000000, nxt - t) END) AS BIGINT)
               AS covered_us
      FROM g GROUP BY 1 ORDER BY user_id"""))

  /** Peak interval concurrency (ClickHouse `maxIntersections` +
    * `maxIntersectionsPosition` analog): with the same 5-minute
    * activity intervals, the maximum number simultaneously open per
    * event_type, and the earliest µs at which that peak is reached.
    * Classic sweep: ±1 endpoint deltas ordered by (t, delta,
    * event_id) — ends sort before starts at the same instant, so
    * touching intervals don't count as overlapping — and a running
    * sum whose max is the answer. The peak and its first position are
    * order-independent under ties because the sort key is unique.
    *
    * Scale shape: endpoints are 2 rows/event and the running sum is
    * `OrderedScan.runningTotal` under an hour-monotone bucket — a
    * per-type global ordering that never funnels a type onto one
    * task. The peak extraction is a summary-sized agg + rejoin.
    */
  /** The q130 sweep over any frame with event_type/ts_ns/event_id —
    * shared with Stress so the measured curve is the shipped plan.
    */
  private[graft] def maxIntersectionsOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val D = 300000000L
      val ev = raw
        .select(col("event_type"), expr("ts_ns div 1000").as("t"),
          col("event_id"))
      val pts = ev.select(col("event_type"), col("event_id"),
          explode(array(
            struct(col("t"), lit(1L).as("delta")),
            struct((col("t") + D).as("t"), lit(-1L).as("delta")))).as("p"))
        .select(col("event_type"), col("p.t").as("t"),
          col("p.delta").as("delta"), col("event_id"))
      val run = graft.operators.OrderedScan.runningTotal(pts,
        col("event_type"), Seq(col("t"), col("delta"), col("event_id")),
        col("delta"), expr("t div 3600000000"), "run")
      val mx = run.groupBy(col("event_type"))
        .agg(max(col("run")).as("max_concurrent"))
      val n = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_intervals"))
      run.join(mx, Seq("event_type"))
        .filter(col("run") === col("max_concurrent"))
        .groupBy(col("event_type"), col("max_concurrent"))
        .agg(min(col("t")).as("first_peak_us"))
        .join(n, Seq("event_type"))
        .select(col("event_type"), col("n_intervals"),
          col("max_concurrent"), col("first_peak_us"))
        .orderBy(col("event_type"))
  }

  val q130 = Q(
    "q130_max_intersections",
    (spark, dir) => maxIntersectionsOf(Tables(spark, dir, "events")),
    Some("""
      WITH ev AS (SELECT event_type, epoch_us(ts) AS t, event_id
                  FROM events),
      pts AS (SELECT event_type, t, 1 AS delta, event_id FROM ev
              UNION ALL
              SELECT event_type, t + 300000000, -1, event_id FROM ev),
      r AS (SELECT event_type, t,
                   SUM(delta) OVER (PARTITION BY event_type
                                    ORDER BY t, delta, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS run
            FROM pts),
      m AS (SELECT event_type, CAST(MAX(run) AS BIGINT) AS max_concurrent
            FROM r GROUP BY 1),
      n AS (SELECT event_type, COUNT(*) AS n_intervals FROM ev GROUP BY 1)
      SELECT r.event_type, n.n_intervals, m.max_concurrent,
             MIN(r.t) AS first_peak_us
      FROM r JOIN m ON r.event_type = m.event_type
                   AND r.run = m.max_concurrent
             JOIN n ON n.event_type = r.event_type
      GROUP BY 1, 2, 3
      ORDER BY r.event_type"""))

  /** Positive-delta sum (ClickHouse `deltaSum` / `deltaSumTimestamp`
    * analog): per series — a (user_id, event_type) pair — the sum of
    * POSITIVE steps of the value sequence in time order, i.e. total
    * upward movement with resets ignored (the counter-style read for
    * gauges that get reset). Values enter as floor(value·64) — an
    * exact integer both engines derive identically from the stored
    * double — and series order is the unique (ts_us, event_id), so
    * every cell is hash-exact. Rolled up per event_type: series
    * count, row count, total and max per-series delta sum.
    *
    * Scale shape: one (user_id, event_type) shuffle into sorted
    * arrays, zip_with over adjacent pairs, then a summary-sized
    * keyed agg — no Window over the fact table.
    */
  /** The q131 reduction over any frame with user_id/event_type/ts_ns/
    * event_id/value — shared with Stress so the measured curve is the
    * shipped plan.
    */
  private[graft] def deltaSumOf(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val series = ev
        .select(col("user_id"), col("event_type"),
          expr("ts_ns div 1000").as("t"), col("event_id"),
          floor(col("value") * 64).as("v"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(sort_array(collect_list(
          struct(col("t"), col("event_id"), col("v")))).as("a"))
        .select(col("event_type"), size(col("a")).cast("long").as("n_rows"),
          expr("""aggregate(
              zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),
                       (x, y) -> greatest(0L, y.v - x.v)),
              0L, (acc, d) -> acc + d)""").as("delta_sum"))
      series.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_series"),
          sum(col("n_rows")).as("n_rows"),
          sum(col("delta_sum")).as("total_delta"),
          max(col("delta_sum")).as("max_delta"))
        .orderBy(col("event_type"))
  }

  val q131 = Q(
    "q131_delta_sum",
    (spark, dir) => deltaSumOf(Tables(spark, dir, "events")),
    Some("""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
                         CAST(FLOOR(value * 64) AS BIGINT) AS v
                  FROM events),
      d AS (SELECT user_id, event_type,
                   v - lag(v) OVER (PARTITION BY user_id, event_type
                                    ORDER BY t, event_id) AS dv
            FROM ev),
      s AS (SELECT user_id, event_type, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN dv > 0 THEN dv ELSE 0 END) AS BIGINT)
                     AS delta_sum
            FROM d GROUP BY 1, 2)
      SELECT event_type, COUNT(*) AS n_series,
             CAST(SUM(n_rows) AS BIGINT) AS n_rows,
             CAST(SUM(delta_sum) AS BIGINT) AS total_delta,
             MAX(delta_sum) AS max_delta
      FROM s GROUP BY 1 ORDER BY event_type"""))

  /** Trailing exponential moving average (ClickHouse
    * `exponentialMovingAverage` analog, made hash-checkable): per
    * user, the EMA with α = 1/2 over the LAST m = min(n, 40) events
    * in time order, kept EXACT by scaling — the reported
    * ema_num = Σ v_j·2^(m-1-j) (j = 0 at the most recent event, v =
    * floor(value·64)) and ema_den = 2^m − 1 are integers, and
    * ema_num/ema_den is the α=1/2 truncated EMA. 40 binary orders ×
    * v < 2^15 keeps the numerator under 2^55 — exact in BIGINT in
    * both engines; the truncation at 40 terms is where a float EMA's
    * tail contribution falls below one ulp anyway.
    *
    * Scale shape: the one user_id shuffle, slice(-m) of the sorted
    * array, and a codegen'd fold acc·2 + v over the reversed slice —
    * per-user cost bounded by the 40-term window regardless of
    * per-user density.
    */
  /** The q132 reduction over any frame with user_id/ts_ns/event_id/
    * value — shared with Stress so the measured curve is the shipped
    * plan.
    */
  private[graft] def trailingEmaOf(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
      ev
        .select(col("user_id"), expr("ts_ns div 1000").as("t"),
          col("event_id"), floor(col("value") * 64).as("v"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(
          struct(col("t"), col("event_id"), col("v")))).as("a"))
        .select(col("user_id"), size(col("a")).cast("long").as("n_events"),
          least(size(col("a")), lit(40)).cast("long").as("m"),
          expr("""aggregate(
              reverse(slice(a, -least(size(a), 40), least(size(a), 40))),
              0L, (acc, e) -> acc * 2L + e.v)""").as("ema_num"),
          expr("shiftleft(1L, cast(least(size(a), 40) as int)) - 1L")
            .as("ema_den"))
        .orderBy(col("user_id"))

  val q132 = Q(
    "q132_trailing_ema",
    (spark, dir) => trailingEmaOf(Tables(spark, dir, "events")),
    Some("""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_id,
                         CAST(FLOOR(value * 64) AS BIGINT) AS v
                  FROM events),
      r AS (SELECT user_id, v,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY t DESC, event_id DESC) AS rr,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM ev)
      SELECT user_id, ANY_VALUE(n) AS n_events,
             LEAST(ANY_VALUE(n), 40) AS m,
             CAST(SUM(v * (CAST(1 AS BIGINT)
                           << (LEAST(n, 40) - rr))) AS BIGINT) AS ema_num,
             (CAST(1 AS BIGINT) << LEAST(ANY_VALUE(n), 40)) - 1 AS ema_den
      FROM r WHERE rr <= 40
      GROUP BY user_id ORDER BY user_id"""))

  /** LTTB downsampling (ClickHouse `largestTriangleThreeBuckets`
    * analog, made hash-checkable): each (event_type, day) series is
    * reduced to B = 12 visually-representative points — first and
    * last always kept, and each of the 10 middle equal-count buckets
    * contributes the point forming the LARGEST TRIANGLE with the
    * previously selected point and the next bucket's centroid
    * (Steinarsson 2013, the algorithm those engines implement). Two
    * determinism moves: geometry runs on integers (x = ms offset
    * from the day start, y = floor(value·64); the 2·area·n_next
    * cross-product stays < 2^52 at these magnitudes, exact in
    * BIGINT in both engines), and argmax ties break to the earliest
    * (x, event_id). Series of ≤ B points pass through whole.
    *
    * Scale shape: the selection is sequential ACROSS buckets — LTTB's
    * own data dependency — so it runs as a per-series codegen'd fold
    * over the 10 bucket ids (each step an O(bucket) argmax), after
    * the ONE (type, day) shuffle into sorted arrays: per-series cost
    * is bounded by daily density while series count scales out, the
    * behavioral-family discipline. The oracle UNROLLS the 10 steps
    * as chained CTEs — same chain, maximally different formulation.
    */
  private val LttbB = 12
  private val LttbMid = LttbB - 2

  /** The q133 selection over any frame with event_type/ts/ts_ns/
    * event_id/value — shared with Stress so the measured curve is the
    * shipped plan.
    */
  private[graft] def lttbOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val B = LttbB
    val mid = LttbMid
    val spark = raw.sparkSession
    val ev = raw.select(
      col("event_type"),
      date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
      expr("(ts_ns div 1000 - unix_micros(date_trunc('DAY', ts))) div 1000")
        .as("xms"),
      expr("ts_ns div 1000").as("t_us"),
      col("event_id").cast("long"), floor(col("value") * 64).as("v"))
    // One (type, day) shuffle into per-series sorted runs, then the
    // whole LTTB selection as a JVM kernel (the q159 mapPartitions
    // treatment): the previous form built a per-series array
    // (collect_list + sort_array) and ran the 10-step fold as a
    // ~200-node higher-order-function expression tree — interpreted
    // lambda dispatch per element plus a giant codegen span, measured
    // 2.38 s quiet at sf0.1 where this form is ~1 s. Exact-identical
    // output: points arrive in sort_array's (xms, t_us, event_id, v)
    // order; bucket j of the n-2 middle points is the contiguous
    // slice [ceil(j·(n-2)/mid), ceil((j+1)·(n-2)/mid)) (same indices
    // as the expression's seg(j)); the argmax reproduces the
    // lexicographic array_max over (score, -xms, -event_id, xms,
    // t_us, event_id, v) structs; score arithmetic is the same
    // all-integer |2·area·c| with overflow LOUD via
    // Math.multiplyExact/addExact (the q159 ANSI discipline — the
    // oracle's BIGINT ops error on overflow too, never wrap).
    // Per-series state is one day×type point buffer — exactly the
    // array the collect_list row held, so the memory posture is
    // unchanged; series count scales out, the per-series cost is
    // bounded by daily density.
    import spark.implicits._
    val sorted = ev
      .repartition(col("event_type"), col("day"))
      .sortWithinPartitions(col("event_type"), col("day"), col("xms"),
        col("t_us"), col("event_id"), col("v"))
      .as[(String, String, Long, Long, Long, Long)]
    val selected = sorted.mapPartitions { it =>
      val out = scala.collection.mutable.ListBuffer
        .empty[(String, String, Long, Long, Long, Long)]
      // point = (xms, t_us, event_id, v)
      val pts = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      var curType: String = null
      var curDay: String = null
      def score(ax: Long, ay: Long, cx: Long, cy: Long, cc: Long,
          xms: Long, v: Long): Long =
        Math.abs(Math.subtractExact(
          Math.multiplyExact(
            Math.subtractExact(Math.multiplyExact(ax, cc), cx),
            Math.subtractExact(v, ay)),
          Math.multiplyExact(
            Math.subtractExact(ax, xms),
            Math.subtractExact(Math.multiplyExact(ay, cc), cy))))
      def flush(): Unit = if (curType != null && pts.nonEmpty) {
        val n = pts.length
        val sel =
          if (n <= B) pts.toIndexedSeq
          else {
            val nm = n - 2 // middle points pts(1..n-2), 0-based 1..nm
            def lo(j: Int): Int = ((j.toLong * nm + mid - 1) / mid).toInt
            def hi(j: Int): Int =
              ((j.toLong * nm + nm + mid - 1) / mid).toInt
            // per-bucket centroid sums over the middle slice
            val sx = new Array[Long](mid)
            val sy = new Array[Long](mid)
            val c = new Array[Long](mid)
            var j = 0
            while (j < mid) {
              var i = lo(j)
              while (i < hi(j)) {
                val e = pts(i + 1)
                sx(j) = Math.addExact(sx(j), e._1)
                sy(j) = Math.addExact(sy(j), e._4)
                c(j) = Math.addExact(c(j), 1L)
                i += 1
              }
              j += 1
            }
            val s = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long, Long)]
            s += pts(0)
            var ax = pts(0)._1
            var ay = pts(0)._4
            j = 0
            while (j < mid) {
              val (cx, cy, cc) =
                if (j < mid - 1) (sx(j + 1), sy(j + 1), c(j + 1))
                else (pts(n - 1)._1, pts(n - 1)._4, 1L)
              var best = pts(lo(j) + 1)
              var bestS = score(ax, ay, cx, cy, cc, best._1, best._4)
              var i = lo(j) + 1
              while (i < hi(j)) {
                val e = pts(i + 1)
                val es = score(ax, ay, cx, cy, cc, e._1, e._4)
                // the expression's array_max struct order: score desc,
                // then EARLIEST (xms, event_id), then the remaining
                // struct fields (t_us, v) ascending-max
                val better =
                  if (es != bestS) es > bestS
                  else if (e._1 != best._1) e._1 < best._1
                  else if (e._3 != best._3) e._3 < best._3
                  else if (e._2 != best._2) e._2 > best._2
                  else e._4 > best._4
                if (better) { best = e; bestS = es }
                i += 1
              }
              s += best
              ax = best._1
              ay = best._4
              j += 1
            }
            s += pts(n - 1)
            s.toIndexedSeq
          }
        var k = 0
        while (k < sel.length) {
          val p = sel(k)
          out += ((curType, curDay, (k + 1).toLong, p._2, p._3, p._4))
          k += 1
        }
        pts.clear()
      }
      it.foreach { case (t, d, xms, tus, eid, v) =>
        if (t != curType || d != curDay) { flush(); curType = t; curDay = d }
        pts += ((xms, tus, eid, v))
      }
      flush()
      out.iterator
    }.toDF("event_type", "day", "seq", "t_us", "event_id", "v")
    selected.orderBy(col("event_type"), col("day"), col("seq"))
  }

  val q133 = {
    val B = LttbB
    val mid = LttbMid
    val steps = (0 until mid).map { j =>
      val ct =
        if (j < mid - 1)
          s"(SELECT event_type, day, sx, sy, c FROM sums WHERE bk = ${j + 1}) ct"
        else
          "(SELECT event_type, day, xms AS sx, v AS sy," +
            " CAST(1 AS BIGINT) AS c FROM lastp) ct"
      s"""cand$j AS (
        SELECT m.event_type, m.day, m.xms, m.t_us, m.event_id, m.v,
               ABS((p.ax * ct.c - ct.sx) * (m.v - p.ay)
                   - (p.ax - m.xms) * (p.ay * ct.c - ct.sy)) AS score
        FROM mb m
        JOIN sel$j p ON m.event_type = p.event_type AND m.day = p.day
        JOIN $ct ON m.event_type = ct.event_type AND m.day = ct.day
        WHERE m.bk = $j),
      sel${j + 1} AS (
        SELECT event_type, day, xms AS ax, v AS ay, t_us, event_id, v
        FROM (SELECT *, row_number() OVER (PARTITION BY event_type, day
                        ORDER BY score DESC, xms, event_id) AS rk
              FROM cand$j)
        WHERE rk = 1)"""
    }.mkString(",\n")
    val selUnions = (1 to mid).map(j =>
      s"SELECT event_type, day, ${j + 1} AS seq, t_us, event_id, v" +
        s" FROM sel$j").mkString("\n        UNION ALL ")
    Q(
      "q133_lttb_downsample",
      (spark, dir) => lttbOf(Tables(spark, dir, "events")),
      Some(s"""
      WITH ev AS (SELECT event_type,
                         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                         (epoch_us(ts) - epoch_us(date_trunc('day', ts)))
                           // 1000 AS xms,
                         epoch_us(ts) AS t_us, event_id,
                         CAST(FLOOR(value * 64) AS BIGINT) AS v
                  FROM events),
      s AS (SELECT *, row_number() OVER (PARTITION BY event_type, day
                                         ORDER BY t_us, event_id) AS i,
                   COUNT(*) OVER (PARTITION BY event_type, day) AS n
            FROM ev),
      small AS (SELECT event_type, day, i AS seq, t_us, event_id, v
                FROM s WHERE n <= $B),
      big AS (SELECT * FROM s WHERE n > $B),
      mb AS (SELECT *, ((i - 2) * $mid) // (n - 2) AS bk
             FROM big WHERE i >= 2 AND i <= n - 1),
      sums AS (SELECT event_type, day, bk, SUM(xms) AS sx, SUM(v) AS sy,
                      COUNT(*) AS c
               FROM mb GROUP BY 1, 2, 3),
      firstp AS (SELECT event_type, day, xms, t_us, event_id, v
                 FROM big WHERE i = 1),
      lastp AS (SELECT event_type, day, xms, t_us, event_id, v
                FROM big WHERE i = n),
      sel0 AS (SELECT event_type, day, xms AS ax, v AS ay, t_us, event_id, v
               FROM firstp),
      $steps
      SELECT * FROM (
        SELECT event_type, day, CAST(1 AS BIGINT) AS seq, t_us, event_id, v
        FROM firstp
        UNION ALL $selUnions
        UNION ALL SELECT event_type, day, $B, t_us, event_id, v FROM lastp
        UNION ALL SELECT event_type, day, seq, t_us, event_id, v FROM small
      ) ORDER BY event_type, day, seq"""))
  }

  /** Time-constrained sequence match (ClickHouse
    * `sequenceMatch('(?1)(?t<=T)(?2)(?t<=T)(?3)')` analog): does the
    * user's timeline contain view → click → purchase in chain order
    * with EACH ADJACENT GAP ≤ 2 h? Unlike q114 (no gaps), greedy
    * first-match is NOT complete here — a later intermediate event
    * relaxes the next gap — so the fold keeps, per level, the LATEST
    * event time of any valid chain reaching it. That is lossless:
    * events process in ascending chain order, so every state entry is
    * chain-before the current event, and the gap test t − b ≤ T is
    * monotone in b (the latest valid predecessor is the most
    * permissive). One O(n) codegen'd fold per user; the oracle is the
    * same reachability as layered EXISTS band joins — a maximally
    * different formulation.
    */
  val q135 = Q(
    "q135_sequence_match_gaps",
    (spark, dir) => {
      val T = 7200000000000L // 2 h in ns
      val fold = s"""coalesce(aggregate(evs,
        named_struct('b1', -1L, 'b2', -1L, 'ok', false),
        (acc, e) -> CASE
          WHEN e.event_type = 'view'
            THEN named_struct('b1', greatest(acc.b1, e.ts_ns),
                              'b2', acc.b2, 'ok', acc.ok)
          WHEN e.event_type = 'click' AND acc.b1 >= 0L
               AND e.ts_ns - acc.b1 <= ${T}L
            THEN named_struct('b1', acc.b1,
                              'b2', greatest(acc.b2, e.ts_ns), 'ok', acc.ok)
          WHEN e.event_type = 'purchase' AND acc.b2 >= 0L
               AND e.ts_ns - acc.b2 <= ${T}L
            THEN named_struct('b1', acc.b1, 'b2', acc.b2, 'ok', true)
          ELSE acc END,
        acc -> acc.ok), false)"""
      userEvents(spark, dir, Seq("view", "click", "purchase"))
        .select(col("user_id"), expr(fold).cast("int").as("matched"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
                         event_type
                  FROM events
                  WHERE event_type IN ('view', 'click', 'purchase')),
      cl AS (SELECT c.user_id, c.ts_ns, c.event_id FROM ev c
             WHERE c.event_type = 'click' AND EXISTS (
               SELECT 1 FROM ev v WHERE v.user_id = c.user_id
                 AND v.event_type = 'view'
                 AND (v.ts_ns < c.ts_ns
                      OR (v.ts_ns = c.ts_ns AND v.event_id < c.event_id))
                 AND c.ts_ns - v.ts_ns <= 7200000000000)),
      pu AS (SELECT DISTINCT p.user_id FROM ev p
             WHERE p.event_type = 'purchase' AND EXISTS (
               SELECT 1 FROM cl c WHERE c.user_id = p.user_id
                 AND (c.ts_ns < p.ts_ns
                      OR (c.ts_ns = p.ts_ns AND c.event_id < p.event_id))
                 AND p.ts_ns - c.ts_ns <= 7200000000000))
      SELECT u.user_id,
             CAST(CASE WHEN pu.user_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
               AS matched
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN pu ON pu.user_id = u.user_id
      ORDER BY u.user_id"""))

  /** Capped distinct count (ClickHouse `uniqUpTo(N)` analog): per
    * (event_type, day), the EXACT distinct user count when ≤ N = 100,
    * and N+1 (plus a saturated flag) beyond — the "do we have more
    * than N distinct?" question answered without ever counting past
    * N+1. The fixture covers both regimes: sf0.01 day-slices sit
    * under the cap, sf0.1 saturates it.
    *
    * Scale shape: one (type, day, user) dedup shuffle, then
    * `OrderedScan.bottomK` keeps rank ≤ N+1 per group with its bucket
    * prune — group counts first, buckets that cannot host a rank ≤
    * N+1 row are dropped BEFORE any sort, so the rank window touches
    * ~N rows per group however many distinct users a day has. The
    * final count is a summary-sized keyed agg.
    */
  val q136 = Q(
    "q136_uniq_up_to",
    (spark, dir) => {
      val n = 100
      val d = Tables(spark, dir, "events")
        .select(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("user_id"))
        .distinct()
      graft.operators.OrderedScan.bottomK(d,
          struct(col("event_type"), col("day")), col("user_id"),
          col("user_id"), col("user_id") / 64, n + 1, "rk")
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("uniq_up_to"))
        .withColumn("saturated", col("uniq_up_to") > n)
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             LEAST(COUNT(DISTINCT user_id), 101) AS uniq_up_to,
             COUNT(DISTINCT user_id) > 100 AS saturated
      FROM events GROUP BY 1, 2
      ORDER BY event_type, day"""))

  /** Two-sample rank test (ClickHouse `mannWhitneyUTest` analog, made
    * hash-checkable): per day, does the click value distribution
    * differ from the view distribution? The U statistic is computed
    * WITHOUT ranking any row: U_click = Σ_v n_c(v)·(#views below v) +
    * ½·ties, so 2U = Σ n_c·(2·cumBefore + n_v) over DISTINCT values —
    * all-integer from grouped counts plus a prefix sum, where the
    * usual formulation ranks the full joint sample. (The p-value
    * needs erf(); the statistic and sizes — what a monitoring rule
    * thresholds on via the normal approximation — are exact. U_view
    * follows as 2·n_c·n_v − u2_click.)
    *
    * Scale shape: one (day, v) count aggregate (distinct-value-sized),
    * a runningTotal prefix under a value-monotone bucket over those
    * summary rows, then a keyed rollup — no per-row rank, no window
    * over the fact table.
    */
  val q137 = Q(
    "q137_mann_whitney_u",
    (spark, dir) => {
      val g = Tables(spark, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          floor(col("value") * 64).as("v"), col("event_type"))
        .groupBy(col("day"), col("v"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("nc"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("nv"))
      graft.operators.OrderedScan.runningTotal(g, col("day"),
          Seq(col("v")), col("nv"), expr("v div 1024"), "cum_incl")
        .withColumn("cumv", col("cum_incl") - col("nv"))
        .groupBy(col("day"))
        .agg(sum(col("nc")).as("n_click"), sum(col("nv")).as("n_view"),
          sum(col("nc") * (col("cumv") * 2 + col("nv"))).as("u2_click"))
        .orderBy(col("day"))
    },
    Some("""
      WITH ev AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                         event_type,
                         CAST(FLOOR(value * 64) AS BIGINT) AS v
                  FROM events WHERE event_type IN ('click', 'view')),
      g AS (SELECT day, v,
                   COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS nc,
                   COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS nv
            FROM ev GROUP BY 1, 2),
      c AS (SELECT day, v, nc, nv,
                   COALESCE(SUM(nv) OVER (PARTITION BY day ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS cumv
            FROM g)
      SELECT day, CAST(SUM(nc) AS BIGINT) AS n_click,
             CAST(SUM(nv) AS BIGINT) AS n_view,
             CAST(SUM(nc * (2 * cumv + nv)) AS BIGINT) AS u2_click
      FROM c GROUP BY 1 ORDER BY day"""))

  /** Tukey-fence outlier audit (ClickHouse `seriesOutliersDetectTukey`
    * analog): per event_type, flag values outside [Q1 − 1.5·IQR,
    * Q3 + 1.5·IQR] with EXACT arithmetic — quartiles are SELECTED
    * values at the discrete ranks 1+⌊q·(n−1)⌋ (q122's exact-binary-
    * fraction argument) and the half-integer fences are compared
    * scaled ×2: v is an outlier iff 2v < 2·Q1 − 3·IQR or 2v >
    * 2·Q3 + 3·IQR — all-BIGINT, hash-exact. On this fixture the value
    * distribution is right-skewed, so the high fence genuinely binds
    * while n_low = 0 (values are bounded below).
    *
    * Scale shape: the quartile rank is `OrderedScan.runningTotal`
    * under a value-monotone bucket (q125's discipline — never a
    * per-type serial sort); the fence table is 1 row/type, and the
    * outlier count is one more scan+agg with the fences joined on the
    * type key (AQE broadcasts the measured-tiny side; no hint).
    */
  val q138 = Q(
    "q138_tukey_outliers",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 64).as("v"))
      val ranked = graft.operators.OrderedScan.runningTotal(ev,
        col("event_type"), Seq(col("v"), col("event_id")), lit(1L),
        floor(col("v") / 512), "vr")
      val n = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val fences = ranked.join(n, Seq("event_type"))
        .withColumn("i1", lit(1L) + floor(lit(0.25) * (col("n") - 1)))
        .withColumn("i3", lit(1L) + floor(lit(0.75) * (col("n") - 1)))
        .filter(col("vr") === col("i1") || col("vr") === col("i3"))
        .groupBy(col("event_type"), col("n"))
        .agg(min(when(col("vr") === col("i1"), col("v"))).as("q1"),
          min(when(col("vr") === col("i3"), col("v"))).as("q3"))
        .withColumn("lo2", col("q1") * 2 - (col("q3") - col("q1")) * 3)
        .withColumn("hi2", col("q3") * 2 + (col("q3") - col("q1")) * 3)
      ev.join(fences, Seq("event_type"))
        .groupBy(col("event_type"), col("n"), col("q1"), col("q3"))
        .agg(
          sum(when(col("v") * 2 < col("lo2"), 1L).otherwise(0L))
            .as("n_low"),
          sum(when(col("v") * 2 > col("hi2"), 1L).otherwise(0L))
            .as("n_high"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH ev AS (SELECT event_type, event_id,
                         CAST(FLOOR(value * 64) AS BIGINT) AS v
                  FROM events),
      r AS (SELECT event_type, v,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY v, event_id) AS vr,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM ev),
      q AS (SELECT event_type, ANY_VALUE(n) AS n,
                   MIN(CASE WHEN vr = 1 + FLOOR(0.25::DOUBLE * (n - 1))
                            THEN v END) AS q1,
                   MIN(CASE WHEN vr = 1 + FLOOR(0.75::DOUBLE * (n - 1))
                            THEN v END) AS q3
            FROM r GROUP BY 1),
      f AS (SELECT event_type, n, q1, q3,
                   2 * q1 - 3 * (q3 - q1) AS lo2,
                   2 * q3 + 3 * (q3 - q1) AS hi2
            FROM q)
      SELECT f.event_type, f.n, f.q1, f.q3,
             COUNT(CASE WHEN 2 * e.v < f.lo2 THEN 1 END) AS n_low,
             COUNT(CASE WHEN 2 * e.v > f.hi2 THEN 1 END) AS n_high,
             MIN(e.v) AS min_v, MAX(e.v) AS max_v
      FROM ev e JOIN f ON e.event_type = f.event_type
      GROUP BY 1, 2, 3, 4
      ORDER BY f.event_type"""))

  /** Keyed map aggregation (ClickHouse `sumMap` analog,
    * https://clickhouse.com/docs/sql-reference/aggregate-functions/parametric-functions —
    * the reference's target DDL stores `tags Nested(key, value)`
    * exactly to serve this merge-maps-by-key pattern,
    * `/root/reference/examples/example.sql:6`): per event_type, merge
    * the per-event (key → value) maps by summing values under each
    * key. Keys come from the props JSON `k` (bucketed k div 10, the
    * q15 extraction), values are the integer-exact floor(value·64).
    * The aligned sorted key/sum arrays — ClickHouse's sumMap output
    * shape — are serialized canonically (comma-joined) so the driver
    * compare stays cell-sortable.
    *
    * Scale shape: two keyed aggregates, both summary-sized after the
    * first map-side partial ((type × 10 buckets) rows shuffle); the
    * collect_list runs over ≤10 rows per group by construction.
    */
  /** The q139 selection over any frame with event_type/props/value —
    * shared with Stress so the measured curve is the shipped plan.
    */
  private[graft] def sumMapOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val e = raw
      .select(col("event_type"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
          .as("k"),
        floor(col("value") * 64).as("v"))
      .filter(col("k").isNotNull)
      .withColumn("kb", expr("k div 10"))
    e.groupBy(col("event_type"), col("kb"))
      .agg(sum(col("v")).as("s"))
      .groupBy(col("event_type"))
      .agg(
        sort_array(collect_list(struct(col("kb"), col("s")))).as("a"),
        count(lit(1)).as("n_keys"),
        sum(col("s")).as("tot_v"))
      .select(col("event_type"), col("n_keys"), col("tot_v"),
        concat_ws(",", expr("transform(a, x -> cast(x.kb as string))"))
          .as("map_keys"),
        concat_ws(",", expr("transform(a, x -> cast(x.s as string))"))
          .as("map_sums"))
      .orderBy(col("event_type"))
  }

  val q139 = Q(
    "q139_sum_map",
    (spark, dir) => sumMapOf(Tables(spark, dir, "events")),
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) // 10 AS kb,
                        CAST(FLOOR(value * 64) AS BIGINT) AS v
                 FROM events
                 WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      g AS (SELECT event_type, kb, CAST(SUM(v) AS BIGINT) AS s
            FROM e GROUP BY 1, 2)
      SELECT event_type, COUNT(*) AS n_keys,
             CAST(SUM(s) AS BIGINT) AS tot_v,
             string_agg(CAST(kb AS VARCHAR), ',' ORDER BY kb) AS map_keys,
             string_agg(CAST(s AS VARCHAR), ',' ORDER BY kb) AS map_sums
      FROM g GROUP BY event_type
      ORDER BY event_type"""))

  /** Rate-of-change between series endpoints (ClickHouse
    * `boundingRatio` analog): per (event_type, day), the value delta
    * between the FIRST and LAST event (ordered by the unique
    * (ts_ns, event_id)) and the elapsed time, as exact integers; the
    * per-second rate is the single final divide (two exact longs →
    * IEEE-correctly-rounded in both engines, the q117 discipline).
    * first/last are argmin/argmax via lexicographic struct min/max —
    * the (t_us, event_id) prefix is unique, so the comparison never
    * reaches the carried value and the result is deterministic where
    * first()/last() would not be. Time runs on µs (`ts_ns div 1000`
    * vs `epoch_us(ts)`) — the q43/q50/q51 band-edge discipline that
    * stays exact under both generator time-spine shapes.
    *
    * Scale shape: ONE keyed aggregate with map-side partials (struct
    * min/max are commutative monoids); no window, no sort, no join.
    */
  /** The q140 selection over any frame with event_type/ts/ts_ns/
    * event_id/value — shared with Stress.
    */
  private[graft] def boundingRatioOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val e = raw
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        expr("ts_ns div 1000").as("t_us"),
        col("event_id"), floor(col("value") * 64).as("v"))
    e.groupBy(col("event_type"), col("day"))
      .agg(
        min(struct(col("t_us"), col("event_id"), col("v"))).as("f"),
        max(struct(col("t_us"), col("event_id"), col("v"))).as("l"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("day"), col("n"),
        (col("l.v") - col("f.v")).as("dv"),
        (col("l.t_us") - col("f.t_us")).as("dt_us"))
      .withColumn("rate_per_s",
        when(col("dt_us") === 0, lit(null).cast("double"))
          .otherwise(round(col("dv").cast("double") /
            (col("dt_us").cast("double") / lit(1.0e6)), 6)))
      .orderBy(col("event_type"), col("day"))
  }

  val q140 = Q(
    "q140_bounding_ratio",
    (spark, dir) => boundingRatioOf(Tables(spark, dir, "events")),
    Some("""
      WITH e AS (SELECT event_type,
                        strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                        epoch_us(ts) AS t_us, event_id,
                        CAST(FLOOR(value * 64) AS BIGINT) AS v
                 FROM events),
      r AS (SELECT *,
                   row_number() OVER (PARTITION BY event_type, day
                                      ORDER BY t_us, event_id) AS ra,
                   row_number() OVER (PARTITION BY event_type, day
                                      ORDER BY t_us DESC, event_id DESC)
                     AS rd
            FROM e),
      g AS (SELECT event_type, day, COUNT(*) AS n,
                   MIN(CASE WHEN rd = 1 THEN v END)
                     - MIN(CASE WHEN ra = 1 THEN v END) AS dv,
                   MIN(CASE WHEN rd = 1 THEN t_us END)
                     - MIN(CASE WHEN ra = 1 THEN t_us END) AS dt_us
            FROM r GROUP BY 1, 2)
      SELECT event_type, day, n, dv, dt_us,
             CASE WHEN dt_us = 0 THEN NULL
                  ELSE ROUND(CAST(dv AS DOUBLE)
                             / (CAST(dt_us AS DOUBLE) / 1e6), 6)
             END AS rate_per_s
      FROM g ORDER BY event_type, day"""))

  /** Two-sample Welch t-test (ClickHouse `welchTTest` analog, the
    * q137 discipline extended to moments): per day, does the click
    * value mean differ from the view mean? All moments (n, Σv, Σv²)
    * are exact BIGINTs from ONE keyed aggregate; the t statistic and
    * Welch–Satterthwaite df are a fixed-order IEEE double chain over
    * those exact integers — both engines evaluate the identical
    * expression tree (the q91 χ² precedent), rounded to 6 dp. Days
    * where either sample has n ≤ 1 (variance undefined) are excluded
    * by both formulations.
    *
    * Scale shape: one map-side-partial aggregate to day-sized summary
    * rows; the double chain runs on the summary only.
    */
  /** The q141 selection over any frame with event_type/ts/value —
    * shared with Stress.
    */
  private[graft] def welchTOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val e = raw
        .filter(col("event_type").isin("click", "view"))
        .select(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"), floor(col("value") * 64).as("v"))
      def side(t: String, pre: String) = Seq(
        sum(when(col("event_type") === t, 1L).otherwise(0L))
          .as(s"n_$pre"),
        sum(when(col("event_type") === t, col("v")).otherwise(0L))
          .as(s"s_$pre"),
        sum(when(col("event_type") === t, col("v") * col("v"))
          .otherwise(0L)).as(s"ss_$pre"))
      val aggs = side("click", "c") ++ side("view", "v")
      val g = e.groupBy(col("day"))
        .agg(aggs.head, aggs.tail: _*)
        .filter(col("n_c") > 1 && col("n_v") > 1)
      val n1 = col("n_c").cast("double")
      val n2 = col("n_v").cast("double")
      val m1 = col("s_c").cast("double") / n1
      val m2 = col("s_v").cast("double") / n2
      val va = (col("ss_c").cast("double") -
        col("s_c").cast("double") * m1) / (col("n_c") - 1).cast("double")
      val vb = (col("ss_v").cast("double") -
        col("s_v").cast("double") * m2) / (col("n_v") - 1).cast("double")
      val ua = va / n1
      val ub = vb / n2
      val se2 = ua + ub
      // se2 = 0 (both samples constant on a day) would make t_stat
      // (m1-m2)/sqrt(0) and df 0/0 — Inf/NaN whose serialized text can
      // diverge cross-engine. NULL them like q146/q147 null zero
      // variance.
      g.select(col("day"), col("n_c"), col("n_v"), col("s_c"), col("s_v"),
          col("ss_c"), col("ss_v"),
          when(se2 === 0.0, lit(null).cast("double"))
            .otherwise(round((m1 - m2) / sqrt(se2), 6)).as("t_stat"),
          when(se2 === 0.0, lit(null).cast("double"))
            .otherwise(round(se2 * se2 /
              (ua * ua / (col("n_c") - 1).cast("double") +
               ub * ub / (col("n_v") - 1).cast("double")), 6)).as("df"))
        .orderBy(col("day"))
  }

  val q141 = Q(
    "q141_welch_t",
    (spark, dir) => welchTOf(Tables(spark, dir, "events")),
    Some("""
      WITH e AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                        event_type,
                        CAST(FLOOR(value * 64) AS BIGINT) AS v
                 FROM events WHERE event_type IN ('click', 'view')),
      g AS (SELECT day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_c,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN v
                                 ELSE 0 END) AS BIGINT) AS s_c,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN v * v
                                 ELSE 0 END) AS BIGINT) AS ss_c,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_v,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN v
                                 ELSE 0 END) AS BIGINT) AS s_v,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN v * v
                                 ELSE 0 END) AS BIGINT) AS ss_v
            FROM e GROUP BY day
            HAVING n_c > 1 AND n_v > 1),
      m AS (SELECT day, n_c, n_v, s_c, s_v, ss_c, ss_v,
                   ((CAST(ss_c AS DOUBLE)
                     - CAST(s_c AS DOUBLE)
                       * (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)))
                    / CAST(n_c - 1 AS DOUBLE)) / CAST(n_c AS DOUBLE) AS ua,
                   ((CAST(ss_v AS DOUBLE)
                     - CAST(s_v AS DOUBLE)
                       * (CAST(s_v AS DOUBLE) / CAST(n_v AS DOUBLE)))
                    / CAST(n_v - 1 AS DOUBLE)) / CAST(n_v AS DOUBLE) AS ub
            FROM g)
      SELECT day, n_c, n_v, s_c, s_v, ss_c, ss_v,
             CASE WHEN ua + ub = 0.0 THEN NULL
                  ELSE ROUND((CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)
                              - CAST(s_v AS DOUBLE) / CAST(n_v AS DOUBLE))
                             / SQRT(ua + ub), 6) END AS t_stat,
             CASE WHEN ua + ub = 0.0 THEN NULL
                  ELSE ROUND((ua + ub) * (ua + ub)
                             / (ua * ua / CAST(n_c - 1 AS DOUBLE)
                                + ub * ub / CAST(n_v - 1 AS DOUBLE)), 6)
             END AS df
      FROM m ORDER BY day"""))

  /** Weighted heavy hitters (ClickHouse `topKWeighted` analog): the
    * top-3 users per event_type by SUMMED weight (the scaled integer
    * value), not occurrence count — q56's two-level top-N discipline
    * on a weighted aggregate. Level 1 takes the top-3 per (type,
    * user-hash-bucket) — provably a superset of the per-type top-3 —
    * so the final rank window sees ≤ 3×32 survivors per type instead
    * of the full user histogram.
    */
  val q143 = Q(
    "q143_topk_weighted",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sums = Tables(spark, dir, "events")
        .select(col("event_type"), col("user_id"),
          floor(col("value") * 64).as("v"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("v")).as("w"))
      val w1 = Window.partitionBy(col("event_type"),
          pmod(col("user_id"), lit(32)))
        .orderBy(col("w").desc, col("user_id").asc)
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("w").desc, col("user_id").asc)
      sums.withColumn("r1", row_number().over(w1)).filter(col("r1") <= 3)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("event_type"), col("rank"), col("user_id"), col("w"))
        .orderBy(col("event_type"), col("rank"))
    },
    Some("""
      WITH c AS (
        SELECT event_type, user_id,
               CAST(SUM(CAST(FLOOR(value * 64) AS BIGINT)) AS BIGINT) AS w
        FROM events
        GROUP BY event_type, user_id),
      r AS (
        SELECT event_type, user_id, w,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY w DESC, user_id) AS rank
        FROM c)
      SELECT event_type, rank::INT AS rank, user_id, w
      FROM r WHERE rank <= 3
      ORDER BY event_type, rank"""))

  /** Population skewness + kurtosis (ClickHouse `skewPop`/`kurtPop`
    * analogs, the q141 discipline extended to 3rd/4th moments): per
    * event_type, all four raw moment sums (n, Σv, Σv², Σv³, Σv⁴) are
    * exact BIGINTs from ONE keyed aggregate; the central moments and
    * the two statistics are a fixed-order IEEE double chain over
    * those integers, rounded 6 dp. v is the UNIT bucket floor(value)
    * — chosen for overflow headroom: max v = 560 keeps Σv⁴ under
    * 2^60 even at 30× the sf0.1 fixture, all-BIGINT in both engines
    * (finer buckets would push Σv⁴ past int64; at petabyte row counts
    * the accumulator swaps to decimal(38,0), one line).
    *
    * Scale shape: one map-side-partial aggregate to type-sized
    * summary rows; the finale runs on the summary only.
    */
  val q144 = Q(
    "q144_skew_kurt",
    (spark, dir) => {
      val g = Tables(spark, dir, "events")
        .select(col("event_type"), floor(col("value")).as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).as("s1"),
          sum(col("v") * col("v")).as("s2"),
          sum(col("v") * col("v") * col("v")).as("s3"),
          sum(col("v") * col("v") * col("v") * col("v")).as("s4"))
      val nd = col("n").cast("double")
      val m = col("s1").cast("double") / nd
      val q2 = col("s2").cast("double") / nd
      val q3 = col("s3").cast("double") / nd
      val q4 = col("s4").cast("double") / nd
      val m2 = q2 - m * m
      val m3 = q3 - lit(3.0) * m * q2 + lit(2.0) * m * m * m
      val m4 = q4 - lit(4.0) * m * q3 + lit(6.0) * m * m * q2 -
        lit(3.0) * m * m * m * m
      // m2 = 0 (a type whose floor(value) is constant) would divide by
      // zero into NaN/Inf with engine-dependent text forms — the q146
      // zero-variance NULL guard applies here too.
      g.select(col("event_type"), col("n"), col("s1"), col("s2"),
          col("s3"), col("s4"),
          when(m2 === 0.0, lit(null).cast("double"))
            .otherwise(round(m3 / (m2 * sqrt(m2)), 6)).as("skew_pop"),
          when(m2 === 0.0, lit(null).cast("double"))
            .otherwise(round(m4 / (m2 * m2), 6)).as("kurt_pop"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS v
                 FROM events),
      g AS (SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(v) AS BIGINT) AS s1,
                   CAST(SUM(v * v) AS BIGINT) AS s2,
                   CAST(SUM(v * v * v) AS BIGINT) AS s3,
                   CAST(SUM(v * v * v * v) AS BIGINT) AS s4
            FROM e GROUP BY 1),
      m AS (SELECT event_type, n, s1, s2, s3, s4,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                   CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                   CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                   CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
            FROM g),
      c AS (SELECT event_type, n, s1, s2, s3, s4,
                   r2 - mu * mu AS m2,
                   r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
                   r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                      - 3.0 * mu * mu * mu * mu AS m4
            FROM m)
      SELECT event_type, n, s1, s2, s3, s4,
             CASE WHEN m2 = 0.0 THEN NULL
                  ELSE ROUND(m3 / (m2 * SQRT(m2)), 6) END AS skew_pop,
             CASE WHEN m2 = 0.0 THEN NULL
                  ELSE ROUND(m4 / (m2 * m2), 6) END AS kurt_pop
      FROM c ORDER BY event_type"""))

  /** Population covariance + Pearson correlation (ClickHouse
    * `covarPop`/`corr` analogs): per event_type, between the props
    * key x = k and the scaled value y = floor(value·64). All five
    * cross/raw moment sums are exact BIGINTs from ONE keyed aggregate
    * (x ≤ 99 and y ≤ ~36k keep every sum far inside int64 at fixture
    * scale); covar and corr are the q141/q144 fixed-order IEEE finale
    * over those integers, rounded 6 dp, with a NULL guard on zero
    * variance (sqrt(0) denominators would hang the compare on
    * inf/NaN form).
    *
    * Scale shape: one map-side-partial aggregate to type-sized
    * summary rows; the finale runs on the summary only.
    */
  val q146 = Q(
    "q146_corr_pop",
    (spark, dir) => {
      val g = Tables(spark, dir, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
            .as("x"),
          floor(col("value") * 64).as("y"))
        .filter(col("x").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      val nd = col("n").cast("double")
      val mx = col("sx").cast("double") / nd
      val my = col("sy").cast("double") / nd
      val cov = col("sxy").cast("double") / nd - mx * my
      val vx = col("sxx").cast("double") / nd - mx * mx
      val vy = col("syy").cast("double") / nd - my * my
      g.select(col("event_type"), col("n"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("sxy"),
          round(cov, 6).as("covar_pop"),
          when(vx * vy === 0.0, lit(null).cast("double"))
            .otherwise(round(cov / sqrt(vx * vy), 6)).as("corr"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) AS x,
                        CAST(FLOOR(value * 64) AS BIGINT) AS y
                 FROM events
                 WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      g AS (SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM e GROUP BY 1),
      m AS (SELECT event_type, n, sx, sy, sxx, syy, sxy,
                   CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cov,
                   CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS vx,
                   CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vy
            FROM g)
      SELECT event_type, n, sx, sy, sxx, syy, sxy,
             ROUND(cov, 6) AS covar_pop,
             CASE WHEN vx * vy = 0.0 THEN NULL
                  ELSE ROUND(cov / SQRT(vx * vy), 6) END AS corr
      FROM m ORDER BY event_type"""))

  /** Per-type value trend (ClickHouse `simpleLinearRegression` analog,
    * x = time): slope and intercept of v = floor(value·64) regressed
    * on the absolute DAY index x = ts_ns div 86400e9 — the monitoring
    * "is this metric drifting?" regression. The day grain keeps
    * Σx² exact in BIGINT (epoch-seconds x² would overflow at two
    * rows); slope/intercept are the q146 finale over the same five
    * sums (slope = cov/var(x)), NULL when all of a type's events land
    * on one day.
    *
    * Scale shape: one map-side-partial aggregate to type-sized rows.
    */
  val q147 = Q(
    "q147_linreg_trend",
    (spark, dir) => {
      val g = Tables(spark, dir, "events")
        .select(col("event_type"),
          expr("ts_ns div 86400000000000").as("x"),
          floor(col("value") * 64).as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
      val nd = col("n").cast("double")
      val mx = col("sx").cast("double") / nd
      val my = col("sy").cast("double") / nd
      val cov = col("sxy").cast("double") / nd - mx * my
      val vx = col("sxx").cast("double") / nd - mx * mx
      val slope = cov / vx
      g.select(col("event_type"), col("n"), col("sx"), col("sy"),
          col("sxx"), col("sxy"),
          when(vx === 0.0, lit(null).cast("double"))
            .otherwise(round(slope, 6)).as("slope_per_day"),
          when(vx === 0.0, lit(null).cast("double"))
            .otherwise(round(my - slope * mx, 6)).as("intercept"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                        epoch_us(ts) // 86400000000 AS x,
                        CAST(FLOOR(value * 64) AS BIGINT) AS y
                 FROM events),
      g AS (SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM e GROUP BY 1),
      m AS (SELECT event_type, n, sx, sy, sxx, sxy,
                   CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cov,
                   CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS vx,
                   CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
                   CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
            FROM g)
      SELECT event_type, n, sx, sy, sxx, sxy,
             CASE WHEN vx = 0.0 THEN NULL
                  ELSE ROUND(cov / vx, 6) END AS slope_per_day,
             CASE WHEN vx = 0.0 THEN NULL
                  ELSE ROUND(my - (cov / vx) * mx, 6) END AS intercept
      FROM m ORDER BY event_type"""))

  /** Categorical association between event_type and the props
    * k-bucket (ClickHouse `cramersV` analog): chi-square over the
    * contingency table, V = sqrt(chi2 / (N * (min(r,c) - 1))). The
    * contingency table is ONE keyed aggregate to (type × 10 buckets)
    * summary rows; row/column totals and N are re-aggregations of that
    * summary; every join below runs on summary-sized frames. The
    * per-cell term n²·N/(rt·ct) is a fixed-order double chain over
    * exact BIGINT counts, QUANTIZED to 6 dp per cell and accumulated
    * in decimal — summation order can then never change the result
    * across engines (the defined semantics of this query; absent
    * cells contribute via the closed form chi2 = Σ_present - N).
    *
    * Scale shape: one map-side-partial aggregate to ≤ r·c rows; the
    * finale never touches facts again.
    */
  /** The q148 (event_type, k-bucket) contingency projection — shared
    * with `streaming/ContingencyStream`, whose live state is exactly
    * this grouped count over the fixed ≤ r·c key space.
    */
  private[graft] def contingencyOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    raw
      .select(col("event_type"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
          .as("k"))
      .filter(col("k").isNotNull)
      .select(col("event_type"), expr("k div 10").as("kb"))
      .groupBy(col("event_type"), col("kb"))
      .agg(count(lit(1)).as("n"))

  /** The q148 finale over any (event_type, kb, n) contingency frame —
    * the cheap downstream read a live sketch store (or the batch
    * query) runs over summary rows.
    */
  private[graft] def cramersVFromCont(cont: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val rt = cont.groupBy(col("event_type"))
        .agg(sum(col("n")).as("rt"))
      val ct = cont.groupBy(col("kb")).agg(sum(col("n")).as("ct"))
      val tot = cont.agg(sum(col("n")).as("big_n"),
        countDistinct(col("event_type")).as("r_used"),
        countDistinct(col("kb")).as("c_used"))
      val cell = cont
        .join(broadcast(rt), "event_type")
        .join(broadcast(ct), "kb")
        .crossJoin(broadcast(tot))
      val nd = col("n").cast("double")
      val term = round(
        nd * nd * col("big_n").cast("double") /
          (col("rt").cast("double") * col("ct").cast("double")), 6)
      val s = cell.groupBy(col("big_n"), col("r_used"), col("c_used"))
        .agg(sum(term.cast("decimal(38,6)")).as("s"))
      val chi2 = (col("s") - col("big_n").cast("decimal(38,6)"))
        .cast("double")
      val minRc = least(col("r_used"), col("c_used")) - 1
      s.select(col("big_n").as("n"), col("r_used"), col("c_used"),
          round(chi2, 6).as("chi2"),
          when(minRc === 0 || col("n") === 0, lit(null).cast("double"))
            .otherwise(round(sqrt(chi2 /
              (col("big_n").cast("double") * minRc.cast("double"))), 6))
            .as("cramers_v"))
  }

  val q148 = Q(
    "q148_cramers_v",
    (spark, dir) =>
      cramersVFromCont(contingencyOf(Tables(spark, dir, "events"))),
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) // 10 AS kb
                 FROM events
                 WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      cont AS (SELECT event_type, kb, COUNT(*) AS n FROM e GROUP BY 1, 2),
      rt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS rt
             FROM cont GROUP BY 1),
      ct AS (SELECT kb, CAST(SUM(n) AS BIGINT) AS ct FROM cont GROUP BY 1),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n,
                     COUNT(DISTINCT event_type) AS r_used,
                     COUNT(DISTINCT kb) AS c_used
              FROM cont),
      s AS (SELECT big_n, r_used, c_used,
                   SUM(CAST(ROUND(CAST(n AS DOUBLE) * n * big_n
                                  / (CAST(rt AS DOUBLE) * ct), 6)
                            AS DECIMAL(38,6))) AS s
            FROM cont
            JOIN rt USING (event_type)
            JOIN ct USING (kb)
            CROSS JOIN tot
            GROUP BY 1, 2, 3)
      SELECT big_n AS n, r_used, c_used,
             ROUND(CAST(s - CAST(big_n AS DECIMAL(38,6)) AS DOUBLE), 6)
               AS chi2,
             CASE WHEN LEAST(r_used, c_used) - 1 = 0 OR big_n = 0 THEN NULL
                  ELSE ROUND(SQRT(
                    CAST(s - CAST(big_n AS DECIMAL(38,6)) AS DOUBLE)
                    / (CAST(big_n AS DOUBLE)
                       * (LEAST(r_used, c_used) - 1))), 6) END AS cramers_v
      FROM s"""))

  /** Two-sample pooled-variance t (ClickHouse `studentTTest` analog):
    * the q141 Welch summary sums re-finalized with the pooled
    * estimator — sp² = ((n1-1)·s1² + (n2-1)·s2²)/(n1+n2-2), t =
    * (m1-m2)/sqrt(sp²·(1/n1+1/n2)), df = n1+n2-2 EXACT as a BIGINT.
    * Same zero-variance NULL guard, same one-aggregate scale shape.
    */
  val q149 = Q(
    "q149_student_t",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"), floor(col("value") * 64).as("v"))
      def side(t: String, pre: String) = Seq(
        sum(when(col("event_type") === t, 1L).otherwise(0L))
          .as(s"n_$pre"),
        sum(when(col("event_type") === t, col("v")).otherwise(0L))
          .as(s"s_$pre"),
        sum(when(col("event_type") === t, col("v") * col("v"))
          .otherwise(0L)).as(s"ss_$pre"))
      val aggs = side("click", "c") ++ side("view", "v")
      val g = e.groupBy(col("day"))
        .agg(aggs.head, aggs.tail: _*)
        .filter(col("n_c") > 1 && col("n_v") > 1)
      val n1 = col("n_c").cast("double")
      val n2 = col("n_v").cast("double")
      val m1 = col("s_c").cast("double") / n1
      val m2 = col("s_v").cast("double") / n2
      val va = (col("ss_c").cast("double") -
        col("s_c").cast("double") * m1) / (col("n_c") - 1).cast("double")
      val vb = (col("ss_v").cast("double") -
        col("s_v").cast("double") * m2) / (col("n_v") - 1).cast("double")
      val sp2 = ((col("n_c") - 1).cast("double") * va +
        (col("n_v") - 1).cast("double") * vb) /
        (col("n_c") + col("n_v") - 2).cast("double")
      g.select(col("day"), col("n_c"), col("n_v"), col("s_c"), col("s_v"),
          col("ss_c"), col("ss_v"),
          when(sp2 === 0.0, lit(null).cast("double"))
            .otherwise(round((m1 - m2) /
              sqrt(sp2 * (lit(1.0) / n1 + lit(1.0) / n2)), 6)).as("t_stat"),
          (col("n_c") + col("n_v") - 2).as("df"))
        .orderBy(col("day"))
    },
    Some("""
      WITH e AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                        event_type,
                        CAST(FLOOR(value * 64) AS BIGINT) AS v
                 FROM events WHERE event_type IN ('click', 'view')),
      g AS (SELECT day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_c,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN v
                                 ELSE 0 END) AS BIGINT) AS s_c,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN v * v
                                 ELSE 0 END) AS BIGINT) AS ss_c,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_v,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN v
                                 ELSE 0 END) AS BIGINT) AS s_v,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN v * v
                                 ELSE 0 END) AS BIGINT) AS ss_v
            FROM e GROUP BY day
            HAVING n_c > 1 AND n_v > 1),
      m AS (SELECT day, n_c, n_v, s_c, s_v, ss_c, ss_v,
                   (CAST(ss_c AS DOUBLE)
                    - CAST(s_c AS DOUBLE)
                      * (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)))
                   / CAST(n_c - 1 AS DOUBLE) AS va,
                   (CAST(ss_v AS DOUBLE)
                    - CAST(s_v AS DOUBLE)
                      * (CAST(s_v AS DOUBLE) / CAST(n_v AS DOUBLE)))
                   / CAST(n_v - 1 AS DOUBLE) AS vb
            FROM g),
      p AS (SELECT day, n_c, n_v, s_c, s_v, ss_c, ss_v,
                   (CAST(n_c - 1 AS DOUBLE) * va
                    + CAST(n_v - 1 AS DOUBLE) * vb)
                   / CAST(n_c + n_v - 2 AS DOUBLE) AS sp2
            FROM m)
      SELECT day, n_c, n_v, s_c, s_v, ss_c, ss_v,
             CASE WHEN sp2 = 0.0 THEN NULL
                  ELSE ROUND((CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)
                              - CAST(s_v AS DOUBLE) / CAST(n_v AS DOUBLE))
                             / SQRT(sp2 * (1.0 / CAST(n_c AS DOUBLE)
                                           + 1.0 / CAST(n_v AS DOUBLE))), 6)
             END AS t_stat,
             CAST(n_c + n_v - 2 AS BIGINT) AS df
      FROM p ORDER BY day"""))

  /** Spearman rank correlation per event_type (ClickHouse `rankCorr`
    * analog) between the props key x and y = floor(value·64), with
    * AVERAGE ranks for ties — computed WITHOUT ranking the fact table:
    * ranks come from the two value HISTOGRAMS (cumulative counts over
    * summary-sized frames; doubled ranks 2·c_less + c_eq + 1 keep the
    * tie-average integer-exact), the joint (x, y) histogram carries
    * the co-occurrence weights, and both rank joins run summary ×
    * summary. Pearson on the doubled ranks (scale cancels) with exact
    * BIGINT sums and the fixed-order IEEE finale, NULL on zero rank
    * variance. The only fact-sized operation is the joint-histogram
    * aggregate (one shuffle, map-side partial); the windows run over
    * histograms whose size is bounded by VALUE CARDINALITY (≤100 ×
    * ≤~36k buckets), not row count — at petabyte rows the shape is
    * unchanged (product sums widen to decimal(38,0), one line, the
    * q144 note).
    */
  /** The q150 selection over any frame with event_type/props/value —
    * shared with Stress so the measured curve is the shipped plan.
    */
  private[graft] def rankCorrOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val e = raw
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
            .as("x"),
          floor(col("value") * 64).as("y"))
        .filter(col("x").isNotNull)
      def ranks(vc: String, rk: String) = {
        val h = e.groupBy(col("event_type"), col(vc))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("event_type")).orderBy(col(vc))
          .rowsBetween(Window.unboundedPreceding, -1)
        h.select(col("event_type"), col(vc),
          (lit(2L) * coalesce(sum(col("c")).over(w), lit(0L)) +
            col("c") + 1L).as(rk))
      }
      val j = e.groupBy(col("event_type"), col("x"), col("y"))
        .agg(count(lit(1)).as("c"))
      val sums = j
        .join(ranks("x", "rx"), Seq("event_type", "x"))
        .join(ranks("y", "ry"), Seq("event_type", "y"))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("n"),
          sum(col("c") * col("rx")).as("sx"),
          sum(col("c") * col("ry")).as("sy"),
          sum(col("c") * col("rx") * col("rx")).as("sxx"),
          sum(col("c") * col("ry") * col("ry")).as("syy"),
          sum(col("c") * col("rx") * col("ry")).as("sxy"))
      val nd = col("n").cast("double")
      val cov = col("sxy").cast("double") / nd -
        (col("sx").cast("double") / nd) * (col("sy").cast("double") / nd)
      val vx = col("sxx").cast("double") / nd -
        (col("sx").cast("double") / nd) * (col("sx").cast("double") / nd)
      val vy = col("syy").cast("double") / nd -
        (col("sy").cast("double") / nd) * (col("sy").cast("double") / nd)
      sums.select(col("event_type"), col("n"),
          when(vx * vy === 0.0, lit(null).cast("double"))
            .otherwise(round(cov / sqrt(vx * vy), 6)).as("rho"))
        .orderBy(col("event_type"))
  }

  val q150 = Q(
    "q150_rank_corr",
    (spark, dir) => rankCorrOf(Tables(spark, dir, "events")),
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) AS x,
                        CAST(FLOOR(value * 64) AS BIGINT) AS y
                 FROM events
                 WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      hx AS (SELECT event_type, x, COUNT(*) AS c FROM e GROUP BY 1, 2),
      rx AS (SELECT event_type, x,
                    2 * COALESCE(SUM(c) OVER (PARTITION BY event_type
                                              ORDER BY x
                                              ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING), 0)
                      + c + 1 AS rx
             FROM hx),
      hy AS (SELECT event_type, y, COUNT(*) AS c FROM e GROUP BY 1, 2),
      ry AS (SELECT event_type, y,
                    2 * COALESCE(SUM(c) OVER (PARTITION BY event_type
                                              ORDER BY y
                                              ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING), 0)
                      + c + 1 AS ry
             FROM hy),
      j AS (SELECT event_type, x, y, COUNT(*) AS c FROM e GROUP BY 1, 2, 3),
      s AS (SELECT event_type,
                   CAST(SUM(c) AS BIGINT) AS n,
                   CAST(SUM(c * rx) AS BIGINT) AS sx,
                   CAST(SUM(c * ry) AS BIGINT) AS sy,
                   CAST(SUM(c * rx * rx) AS BIGINT) AS sxx,
                   CAST(SUM(c * ry * ry) AS BIGINT) AS syy,
                   CAST(SUM(c * rx * ry) AS BIGINT) AS sxy
            FROM j
            JOIN rx USING (event_type, x)
            JOIN ry USING (event_type, y)
            GROUP BY 1),
      m AS (SELECT event_type, n,
                   CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cov,
                   CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS vx,
                   CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vy
            FROM s)
      SELECT event_type, n,
             CASE WHEN vx * vy = 0.0 THEN NULL
                  ELSE ROUND(cov / SQRT(vx * vy), 6) END AS rho
      FROM m ORDER BY event_type"""))

  /** Per-key min/max over the bucketed props map (ClickHouse
    * `minMap`/`maxMap` analogs): q139's aligned-array shape with
    * min/max in place of sums — ONE keyed aggregate to (type × 10
    * buckets) summary rows, arrays assembled from ≤10 rows per group,
    * canonical comma-joined serialization so the driver compare stays
    * cell-sortable.
    */
  val q151 = Q(
    "q151_min_max_map",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
            .as("k"),
          floor(col("value") * 64).as("v"))
        .filter(col("k").isNotNull)
        .withColumn("kb", expr("k div 10"))
      e.groupBy(col("event_type"), col("kb"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        .groupBy(col("event_type"))
        .agg(
          sort_array(collect_list(struct(col("kb"), col("mn"), col("mx"))))
            .as("a"),
          count(lit(1)).as("n_keys"))
        .select(col("event_type"), col("n_keys"),
          concat_ws(",", expr("transform(a, x -> cast(x.kb as string))"))
            .as("map_keys"),
          concat_ws(",", expr("transform(a, x -> cast(x.mn as string))"))
            .as("map_mins"),
          concat_ws(",", expr("transform(a, x -> cast(x.mx as string))"))
            .as("map_maxs"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) // 10 AS kb,
                        CAST(FLOOR(value * 64) AS BIGINT) AS v
                 FROM events
                 WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      g AS (SELECT event_type, kb,
                   CAST(MIN(v) AS BIGINT) AS mn,
                   CAST(MAX(v) AS BIGINT) AS mx
            FROM e GROUP BY 1, 2)
      SELECT event_type, COUNT(*) AS n_keys,
             string_agg(CAST(kb AS VARCHAR), ',' ORDER BY kb) AS map_keys,
             string_agg(CAST(mn AS VARCHAR), ',' ORDER BY kb) AS map_mins,
             string_agg(CAST(mx AS VARCHAR), ',' ORDER BY kb) AS map_maxs
      FROM g GROUP BY event_type
      ORDER BY event_type"""))

  /** Weighted mean of the props key by event weight (ClickHouse
    * `avgWeighted` analog): x = k weighted by w = floor(value·64).
    * Σxw and Σw are exact BIGINTs from ONE keyed aggregate; the mean
    * is the single final divide, NULL when the weight mass is zero.
    */
  val q152 = Q(
    "q152_avg_weighted",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
            .as("x"),
          floor(col("value") * 64).as("w"))
        .filter(col("x").isNotNull)
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x") * col("w")).as("sxw"),
          sum(col("w")).as("sw"))
        .select(col("event_type"), col("n"), col("sxw"), col("sw"),
          when(col("sw") === 0L, lit(null).cast("double"))
            .otherwise(round(col("sxw").cast("double") /
              col("sw").cast("double"), 6)).as("avg_weighted"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) AS x,
                        CAST(FLOOR(value * 64) AS BIGINT) AS w
                 FROM events
                 WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      g AS (SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(x * w) AS BIGINT) AS sxw,
                   CAST(SUM(w) AS BIGINT) AS sw
            FROM e GROUP BY 1)
      SELECT event_type, n, sxw, sw,
             CASE WHEN sw = 0 THEN NULL
                  ELSE ROUND(CAST(sxw AS DOUBLE) / CAST(sw AS DOUBLE), 6)
             END AS avg_weighted
      FROM g ORDER BY event_type"""))

  /** Two-sample Kolmogorov-Smirnov statistic per day (ClickHouse
    * `kolmogorovSmirnovTest` analog), click vs view over v =
    * floor(value·64): D = max_v |F1(v) - F2(v)|. EXACT up to the one
    * final divide — the sup runs on the integer cross-multiplication
    * |F1·n2 - F2·n1| (BIGINT; F ≤ n keeps the product far inside
    * int64), so engines can never disagree about WHICH v attains the
    * sup. Both ECDFs come from one (day, v) conditional-count
    * aggregate (summary-sized, bounded by value cardinality like
    * q150); the cumulative window runs over that summary; day totals
    * attach by broadcast join.
    *
    * Scale shape: one fact-sized keyed aggregate; windows and joins on
    * cardinality-bounded summaries only.
    */
  /** The q153 selection over any frame with event_type/ts/value —
    * shared with Stress so the measured curve is the shipped plan.
    */
  private[graft] def ksOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val e = raw
        .filter(col("event_type").isin("click", "view"))
        .select(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"), floor(col("value") * 64).as("v"))
      val h = e.groupBy(col("day"), col("v"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("c1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("c2"))
      val tot = h.groupBy(col("day"))
        .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val w = Window.partitionBy(col("day")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val ecdf = h
        .select(col("day"), col("v"),
          sum(col("c1")).over(w).as("f1"),
          sum(col("c2")).over(w).as("f2"))
        .join(broadcast(tot), "day")
        .filter(col("n1") > 0 && col("n2") > 0)
      ecdf.groupBy(col("day"), col("n1"), col("n2"))
        .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
          .as("d_num"))
        .select(col("day"), col("n1"), col("n2"), col("d_num"),
          round(col("d_num").cast("double") /
            (col("n1").cast("double") * col("n2").cast("double")), 6)
            .as("d_stat"))
        .orderBy(col("day"))
  }

  val q153 = Q(
    "q153_ks_test",
    (spark, dir) => ksOf(Tables(spark, dir, "events")),
    Some("""
      WITH e AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                        event_type,
                        CAST(FLOOR(value * 64) AS BIGINT) AS v
                 FROM events WHERE event_type IN ('click', 'view')),
      h AS (SELECT day, v,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                                 ELSE 0 END) AS BIGINT) AS c1,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                                 ELSE 0 END) AS BIGINT) AS c2
            FROM e GROUP BY 1, 2),
      tot AS (SELECT day, CAST(SUM(c1) AS BIGINT) AS n1,
                     CAST(SUM(c2) AS BIGINT) AS n2
              FROM h GROUP BY 1),
      ecdf AS (SELECT day, v,
                      CAST(SUM(c1) OVER (PARTITION BY day ORDER BY v
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT) AS f1,
                      CAST(SUM(c2) OVER (PARTITION BY day ORDER BY v
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT) AS f2
               FROM h),
      d AS (SELECT day, n1, n2,
                   CAST(MAX(ABS(f1 * n2 - f2 * n1)) AS BIGINT) AS d_num
            FROM ecdf JOIN tot USING (day)
            WHERE n1 > 0 AND n2 > 0
            GROUP BY 1, 2, 3)
      SELECT day, n1, n2, d_num,
             ROUND(CAST(d_num AS DOUBLE)
                   / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat
      FROM d ORDER BY day"""))

  /** Shannon entropy of the props-key distribution per event_type
    * (ClickHouse `entropy` analog): H = -Σ p·log2 p over the ≤100-key
    * histogram. The per-cell term is a fixed-order double chain over
    * exact BIGINT counts, QUANTIZED to 6 dp and decimal-accumulated —
    * the q148 discipline that makes both the summation order AND any
    * last-ulp log2 divergence between engines irrelevant.
    *
    * Scale shape: one fact-sized keyed aggregate to histogram rows;
    * the finale never touches facts.
    */
  val q154 = Q(
    "q154_entropy",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
            .as("x"))
        .filter(col("x").isNotNull)
      val h = e.groupBy(col("event_type"), col("x"))
        .agg(count(lit(1)).as("c"))
      val tot = h.groupBy(col("event_type"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
      val p = col("c").cast("double") / col("n").cast("double")
      val term = round(-p * log(2.0, p), 6)
      h.join(broadcast(tot), "event_type")
        .groupBy(col("event_type"), col("n"), col("n_distinct"))
        .agg(sum(term.cast("decimal(38,6)")).as("s"))
        .select(col("event_type"), col("n"), col("n_distinct"),
          col("s").cast("double").as("entropy"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) AS x
                 FROM events
                 WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      h AS (SELECT event_type, x, COUNT(*) AS c FROM e GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
                     COUNT(*) AS n_distinct
              FROM h GROUP BY 1)
      SELECT event_type, n, n_distinct,
             CAST(SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / n)
                                 * log2(CAST(c AS DOUBLE) / n), 6)
                           AS DECIMAL(38,6))) AS DOUBLE) AS entropy
      FROM h JOIN tot USING (event_type)
      GROUP BY event_type, n, n_distinct
      ORDER BY event_type"""))

  /** The remaining ClickHouse contingency-family analogs — `theilsU`,
    * `contingency` (coefficient), `cramersVBiasCorrected` — over the
    * SAME event_type × k-bucket table as q148, all in one pass:
    *   - chi² exactly as q148 (per-cell term quantized to 6 dp,
    *     decimal-accumulated, closed form Σ_present − N);
    *   - C = sqrt(chi² / (chi² + N));
    *   - bias-corrected V (Bergsma 2013): φ² = chi²/N, φ²⁺ =
    *     max(0, φ² − (r−1)(c−1)/(N−1)), r⁺ = r − (r−1)²/(N−1),
    *     c⁺ = c − (c−1)²/(N−1), V = sqrt(φ²⁺ / (min(r⁺,c⁺) − 1)),
    *     NULL when N ≤ 1 or the denominator is ≤ 0;
    *   - Theil's U(X|Y) = (H(X) + H(Y) − H(X,Y)) / H(X) with the
    *     three entropies computed the q154 way (log2 terms quantized
    *     to 6 dp, decimal-accumulated — order- and last-ulp-proof),
    *     NULL on H(X) = 0.
    *
    * Scale shape: ONE fact-sized keyed aggregate to ≤ r·c summary
    * rows; marginals, totals, chi² and all three entropies are
    * re-aggregations of that summary joined broadcast; the finale is
    * a single row. At petabyte rows the shape is unchanged.
    */
  val q155 = Q(
    "q155_contingency_family",
    (spark, dir) => {
      // the SAME table as q148 and the live stream — one definition
      val cont = contingencyOf(Tables(spark, dir, "events"))
      val rt = cont.groupBy(col("event_type"))
        .agg(sum(col("n")).as("rt"))
      val ct = cont.groupBy(col("kb")).agg(sum(col("n")).as("ct"))
      val tot = cont.agg(sum(col("n")).as("big_n"),
        countDistinct(col("event_type")).as("r_used"),
        countDistinct(col("kb")).as("c_used"))
      val nn = col("big_n").cast("double")
      // chi² exactly as q148: quantized cell terms, decimal sum, −N
      val cell = cont
        .join(broadcast(rt), "event_type")
        .join(broadcast(ct), "kb")
        .crossJoin(broadcast(tot))
      val nd = col("n").cast("double")
      val chiTerm = round(
        nd * nd * nn /
          (col("rt").cast("double") * col("ct").cast("double")), 6)
      val sChi = cell.agg(
        sum(chiTerm.cast("decimal(38,6)")).as("s_chi"))
      // the q154 entropy discipline over a count column `c` vs total N
      def hSum(df: org.apache.spark.sql.DataFrame, c: String,
               out: String) = {
        val p = col(c).cast("double") / nn
        df.crossJoin(broadcast(tot.select(col("big_n"))))
          .agg(sum(round(-p * log(2.0, p), 6).cast("decimal(38,6)"))
            .as(out))
      }
      val hx = hSum(rt, "rt", "hx")
      val hy = hSum(ct, "ct", "hy")
      val hxy = hSum(cont, "n", "hxy")
      val f = tot
        .crossJoin(broadcast(sChi))
        .crossJoin(broadcast(hx))
        .crossJoin(broadcast(hy))
        .crossJoin(broadcast(hxy))
        .select(col("big_n"), col("r_used"), col("c_used"),
          greatest(
            (col("s_chi") - col("big_n").cast("decimal(38,6)"))
              .cast("double"), lit(0.0)).as("chi2"),
          col("hx").cast("double").as("hxd"),
          col("hy").cast("double").as("hyd"),
          col("hxy").cast("double").as("hxyd"))
      val n1 = (col("big_n") - 1).cast("double")
      val rr = (col("r_used") - 1).cast("double")
      val cc = (col("c_used") - 1).cast("double")
      val phi2c = greatest(
        col("chi2") / col("big_n").cast("double") - rr * cc / n1, lit(0.0))
      val rCorr = col("r_used").cast("double") - rr * rr / n1
      val cCorr = col("c_used").cast("double") - cc * cc / n1
      val den = least(rCorr, cCorr) - 1.0
      f.select(col("big_n").as("n"), col("r_used"), col("c_used"),
        round(col("chi2"), 6).as("chi2"),
        when(col("big_n") === 0, lit(null).cast("double"))
          .otherwise(round(sqrt(col("chi2") /
            (col("chi2") + col("big_n").cast("double"))), 6))
          .as("contingency_coeff"),
        when(col("big_n") <= 1 || den <= 0.0, lit(null).cast("double"))
          .otherwise(round(sqrt(phi2c / den), 6)).as("cramers_v_bc"),
        when(col("hxd") === 0.0, lit(null).cast("double"))
          .otherwise(round(
            (col("hxd") + col("hyd") - col("hxyd")) / col("hxd"), 6))
          .as("theils_u"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) // 10 AS kb
                 FROM events
                 WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      cont AS (SELECT event_type, kb, COUNT(*) AS n FROM e GROUP BY 1, 2),
      rt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS rt
             FROM cont GROUP BY 1),
      ct AS (SELECT kb, CAST(SUM(n) AS BIGINT) AS ct FROM cont GROUP BY 1),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n,
                     COUNT(DISTINCT event_type) AS r_used,
                     COUNT(DISTINCT kb) AS c_used
              FROM cont),
      schi AS (SELECT SUM(CAST(ROUND(CAST(n AS DOUBLE) * n * big_n
                                     / (CAST(rt AS DOUBLE) * ct), 6)
                               AS DECIMAL(38,6))) AS s_chi
               FROM cont
               JOIN rt USING (event_type)
               JOIN ct USING (kb)
               CROSS JOIN tot),
      hx AS (SELECT SUM(CAST(ROUND(-(CAST(rt AS DOUBLE) / big_n)
                                   * log2(CAST(rt AS DOUBLE) / big_n), 6)
                             AS DECIMAL(38,6))) AS hx
             FROM rt CROSS JOIN tot),
      hy AS (SELECT SUM(CAST(ROUND(-(CAST(ct AS DOUBLE) / big_n)
                                   * log2(CAST(ct AS DOUBLE) / big_n), 6)
                             AS DECIMAL(38,6))) AS hy
             FROM ct CROSS JOIN tot),
      hxy AS (SELECT SUM(CAST(ROUND(-(CAST(n AS DOUBLE) / big_n)
                                    * log2(CAST(n AS DOUBLE) / big_n), 6)
                              AS DECIMAL(38,6))) AS hxy
              FROM cont CROSS JOIN tot),
      f AS (SELECT big_n, r_used, c_used,
                   GREATEST(CAST(s_chi - CAST(big_n AS DECIMAL(38,6))
                                 AS DOUBLE), 0.0) AS chi2,
                   CAST(hx AS DOUBLE) AS hxd,
                   CAST(hy AS DOUBLE) AS hyd,
                   CAST(hxy AS DOUBLE) AS hxyd
            FROM tot CROSS JOIN schi CROSS JOIN hx
            CROSS JOIN hy CROSS JOIN hxy)
      SELECT big_n AS n, r_used, c_used,
             ROUND(chi2, 6) AS chi2,
             CASE WHEN big_n = 0 THEN NULL
                  ELSE ROUND(SQRT(chi2 / (chi2 + big_n)), 6)
             END AS contingency_coeff,
             CASE WHEN big_n <= 1
                    OR LEAST(r_used - (r_used - 1.0) * (r_used - 1.0)
                               / (big_n - 1.0),
                             c_used - (c_used - 1.0) * (c_used - 1.0)
                               / (big_n - 1.0)) - 1.0 <= 0.0 THEN NULL
                  ELSE ROUND(SQRT(
                    GREATEST(chi2 / big_n
                             - (r_used - 1.0) * (c_used - 1.0)
                               / (big_n - 1.0), 0.0)
                    / (LEAST(r_used - (r_used - 1.0) * (r_used - 1.0)
                               / (big_n - 1.0),
                             c_used - (c_used - 1.0) * (c_used - 1.0)
                               / (big_n - 1.0)) - 1.0)), 6)
             END AS cramers_v_bc,
             CASE WHEN hxd = 0.0 THEN NULL
                  ELSE ROUND((hxd + hyd - hxyd) / hxd, 6)
             END AS theils_u
      FROM f"""))

  /** Weight-of-evidence / information value (ClickHouse
    * `categoricalInformationValue` analog — the credit-scoring
    * feature-selection statistic): treating click as the positive tag
    * and view as the negative, per props-k-bucket
    *   WoE_b = ln( (g_b/G) / (v_b/V) ),
    *   IV    = Σ_b (g_b/G − v_b/V) · WoE_b,
    * NULL WoE (and no IV contribution) where either class count is
    * zero — exact, no smoothing. Each WoE is ONE fixed-order IEEE
    * chain over exact BIGINT counts (g·V / (v·G), one ln), rounded
    * 6 dp; each IV term multiplies the ROUNDED WoE by the fixed-order
    * rate difference and is itself rounded 6 dp, then
    * decimal-accumulated — the q148 discipline, so neither summation
    * order nor libm last-ulp divergence can split the engines.
    *
    * Scale shape: ONE fact-sized keyed aggregate to ≤10 bucket rows;
    * class totals and the IV sum are re-aggregations of that summary
    * attached broadcast. The finale never touches facts.
    */
  val q157 = Q(
    "q157_information_value",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
            .as("k"),
          col("event_type"))
        .filter(col("k").isNotNull)
        .select(expr("k div 10").as("kb"), col("event_type"))
      val cnt = e.groupBy(col("kb"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_click"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("n_view"))
      val tot = cnt.agg(sum(col("n_click")).as("g"),
        sum(col("n_view")).as("v"))
      val gd = col("n_click").cast("double")
      val vd = col("n_view").cast("double")
      val woe = when(col("n_click") === 0 || col("n_view") === 0,
        lit(null).cast("double"))
        .otherwise(round(log(
          gd * col("v").cast("double") /
            (vd * col("g").cast("double"))), 6))
      val rows = cnt.crossJoin(broadcast(tot))
        .select(col("kb"), col("n_click"), col("n_view"),
          woe.as("woe"),
          when(woe.isNull, lit(null).cast("double"))
            .otherwise(round(
              (gd / col("g").cast("double") -
                vd / col("v").cast("double")) * woe, 6)).as("iv_term"))
      val iv = rows.agg(
        sum(col("iv_term").cast("decimal(38,6)")).as("iv_dec"))
      rows.crossJoin(broadcast(iv))
        .select(col("kb"), col("n_click"), col("n_view"), col("woe"),
          col("iv_term"), col("iv_dec").cast("double").as("iv"))
        .orderBy(col("kb"))
    },
    Some("""
      WITH e AS (SELECT CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) // 10 AS kb,
                        event_type
                 FROM events
                 WHERE event_type IN ('click', 'view')
                   AND regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      cnt AS (SELECT kb,
                     CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                          AS BIGINT) AS n_click,
                     CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                          AS BIGINT) AS n_view
              FROM e GROUP BY 1),
      tot AS (SELECT CAST(SUM(n_click) AS BIGINT) AS g,
                     CAST(SUM(n_view) AS BIGINT) AS v FROM cnt),
      r AS (SELECT kb, n_click, n_view,
                   CASE WHEN n_click = 0 OR n_view = 0 THEN NULL
                        ELSE ROUND(ln(CAST(n_click AS DOUBLE) * v
                                      / (CAST(n_view AS DOUBLE) * g)), 6)
                   END AS woe,
                   CASE WHEN n_click = 0 OR n_view = 0 THEN NULL
                        ELSE ROUND((CAST(n_click AS DOUBLE) / g
                                    - CAST(n_view AS DOUBLE) / v)
                                   * ROUND(ln(CAST(n_click AS DOUBLE) * v
                                              / (CAST(n_view AS DOUBLE) * g)),
                                           6), 6)
                   END AS iv_term
            FROM cnt CROSS JOIN tot),
      iv AS (SELECT SUM(CAST(iv_term AS DECIMAL(38,6))) AS iv_dec FROM r)
      SELECT kb, n_click, n_view, woe, iv_term,
             CAST(iv_dec AS DOUBLE) AS iv
      FROM r CROSS JOIN iv
      ORDER BY kb"""))

  /** One-way ANOVA across event types (ClickHouse
    * `analysisOfVariance` analog): per day, the F statistic for
    * "do the k event-type groups share a mean scaled value" from
    * exact BIGINT per-group moments (n_g, Σv, Σv²) in ONE keyed
    * aggregate. The fractional group terms s_g²/n_g are quantized to
    * µ-units (×10⁶) as EXACT integers via round(a/b) = (2a+b) div 2b
    * in 128-bit arithmetic — a double round() here lands on .5 ties
    * for small denominators and the engines break them on different
    * representations (this query found that; the q148 chi² terms
    * divide by rt·ct and never hit it). SSB/SSW stay exact integers
    * through the subtraction (clamped at 0), and the only IEEE ops
    * are the final fixed-order F chain and the /10⁶ display divides.
    * F = (SSB/(k−1))/(SSW/(N−k)), NULL when k ≤ 1, N ≤ k, or SSW = 0.
    *
    * Scale shape: one fact-sized keyed aggregate to ≤ k rows/day;
    * the finale re-aggregates the summary. No window, no join.
    */
  val q158 = Q(
    "q158_anova_f",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .select(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"), floor(col("value") * 64).as("v"))
      val g = e.groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          sum(col("v") * col("v")).as("ss"))
        // µ-unit (×10⁶) group terms as EXACT integers via
        // round(a/b) = (2a+b) div 2b in 128-bit decimal: a double
        // round() here sits on .5 boundaries for small n and the two
        // engines break ties on different representations
        .withColumn("t6", expr(
          "(cast(s as decimal(38,0)) * s * 2000000 + n) div (2 * n)"))
        .withColumn("w6", expr(
          "cast(cast(ss as decimal(38,0)) * 1000000 - t6 as decimal(38,0))"))
      val agg = g.groupBy(col("day"))
        .agg(sum(col("n")).as("big_n"), count(lit(1)).as("k"),
          sum(col("s")).as("big_s"),
          sum(col("t6").cast("decimal(38,0)")).as("sb6"),
          sum(col("w6")).as("sw6"))
        .withColumn("s2n6", expr(
          "(cast(big_s as decimal(38,0)) * big_s * 2000000 + big_n) " +
            "div (2 * big_n)"))
      // everything below is arithmetic on exact integers (< 2^53 at
      // harness scale — the q144 decimal-swap note applies beyond)
      val ssb6 = greatest(
        (col("sb6") - col("s2n6")).cast("double"), lit(0.0))
      val ssw6 = col("sw6").cast("double")
      val f = (ssb6 / (col("k") - 1).cast("double")) /
        (ssw6 / (col("big_n") - col("k")).cast("double"))
      agg.select(col("day"), col("big_n").as("n"), col("k"),
          (ssb6 / 1000000.0).as("ssb"), (ssw6 / 1000000.0).as("ssw"),
          when(col("k") <= 1 || col("big_n") <= col("k") || ssw6 === 0.0,
            lit(null).cast("double"))
            .otherwise(round(f, 6)).as("f_stat"))
        .orderBy(col("day"))
    },
    Some("""
      WITH e AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                        event_type,
                        CAST(FLOOR(value * 64) AS BIGINT) AS v
                 FROM events),
      g AS (SELECT day, event_type, COUNT(*) AS n,
                   CAST(SUM(v) AS BIGINT) AS s,
                   CAST(SUM(v * v) AS BIGINT) AS ss,
                   (2 * CAST(SUM(v) AS HUGEINT) * CAST(SUM(v) AS HUGEINT)
                    * 1000000 + COUNT(*)) // (2 * COUNT(*)) AS t6
            FROM e GROUP BY 1, 2),
      g2 AS (SELECT day, n, s,
                    CAST(ss AS HUGEINT) * 1000000 - t6 AS w6, t6
             FROM g),
      a AS (SELECT day, CAST(SUM(n) AS BIGINT) AS big_n,
                   COUNT(*) AS k,
                   CAST(SUM(s) AS BIGINT) AS big_s,
                   SUM(t6) AS sb6, SUM(w6) AS sw6
            FROM g2 GROUP BY 1),
      d AS (SELECT day, big_n, k,
                   GREATEST(CAST(sb6
                            - ((2 * CAST(big_s AS HUGEINT) * big_s * 1000000
                                + big_n) // (2 * big_n)) AS DOUBLE),
                            0.0) AS ssb6,
                   CAST(sw6 AS DOUBLE) AS ssw6
            FROM a)
      SELECT day, big_n AS n, k,
             ssb6 / 1000000.0 AS ssb, ssw6 / 1000000.0 AS ssw,
             CASE WHEN k <= 1 OR big_n <= k OR ssw6 = 0.0 THEN NULL
                  ELSE ROUND((ssb6 / (k - 1.0))
                             / (ssw6 / CAST(big_n - k AS DOUBLE)), 6)
             END AS f_stat
      FROM d ORDER BY day"""))

  /** Kendall rank correlation τ-b (ClickHouse `kendallTau` analog,
    * tie-corrected) between the props key and the scaled value, per
    * event_type — WITHOUT enumerating row pairs: concordant and
    * discordant counts come from one ordered dominance pass over the
    * (x, y) CELL histogram (see [[kendallTauOf]]), where cells are
    * bounded by ≤100 x-keys × the y-bucket domain however large the
    * corpus — the pair statistic is computed on a summary frame at
    * any scale, the q123-style answer to a quadratic statistic. Tie
    * terms n1/n2 from the marginal histograms in the same pass; every
    * count is an exact BIGINT; τ-b = (C−D)/√((n0−n1)(n0−n2)) is the
    * single fixed-order IEEE finale, rounded 6 dp, NULL on a zero
    * denominator.
    */
  val q159 = Q(
    "q159_kendall_tau",
    (spark, dir) =>
      kendallTauOf(Tables(spark, dir, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
            .as("x"),
          floor(col("value") * 64).as("y"))
        .filter(col("x").isNotNull)),
    Q159Sql)

  /** The q159 core over any (event_type, x, y) frame — shared with the
    * Stress harness so the scaling claim is measured on the shipped
    * plan. x must be a BOUNDED domain (props k, ≤100 levels).
    */
  private[graft] def kendallTauOf(e: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val spark = e.sparkSession
      val cells = e.groupBy(col("event_type"), col("x"), col("y"))
        .agg(count(lit(1)).as("c"))
      // Concordant/discordant WITHOUT the cells² pair join (first
      // formulation measured 135 s at sf0.1: y = floor(value·64) has a
      // ~21k-level domain, so cells² is NOT small) and WITHOUT the
      // cells × x-levels expansion (second formulation: each cell's
      // mass replayed at every larger x-level — ~50× the cell count
      // through a join + re-aggregation + two window sorts; 42
      // exchanges, 7.7 s quiet at sf0.1 where this form is ~1 s).
      // One ordered pass per event_type over the CELL SUMMARY instead:
      // cells arrive sorted by (y, x); a running x-marginal (TreeMap,
      // ≤100 keys by construction) yields for every cell the dominance
      // masses G(<x,<y) (before folding its y-group in) and G(<x,≤y)
      // (after), so
      //   concordant = Σ c·G(<x,<y),  discordant = Σ c·T(<x) − Σ c·G(<x,≤y)
      // — identical integers to the pair-join form (the window form's
      // gle/glt/tl, evaluated sequentially instead of materialized).
      // Shuffle is O(cells) — the summary itself, nothing wider; the
      // pass is O(cells·L) compute on ≤100-key state. n/n1/n2 fall out
      // of the same pass (y-group sizes and the final x-marginal).
      // Parallelism is one task per event_type — types are a handful
      // by construction; were types × y-domain ever to outgrow a task,
      // range-partition on y with per-range carry-in is the same pass
      // sharded (cells per type stay ≤ 100·|y| rows — a summary, not
      // the corpus, at any SF).
      import spark.implicits._
      val sorted = cells
        .repartition(col("event_type"))
        .sortWithinPartitions(col("event_type"), col("y"), col("x"))
        .as[(String, Long, Long, Long)]
      val perType = sorted.mapPartitions { it =>
        val out = scala.collection.mutable.ListBuffer
          .empty[(String, Long, Long, Long, Long, Long)]
        val hist = new java.util.TreeMap[java.lang.Long, Long]()
        val grp = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var curType: String = null
        var curY = 0L
        var haveY = false
        var conc = 0L; var sumGle = 0L; var n = 0L; var n2 = 0L
        def pref(x: Long): Long = {
          var s = 0L
          val itr = hist.headMap(x, false).values.iterator()
          while (itr.hasNext) s = Math.addExact(s, itr.next())
          s
        }
        // fold the pending y-group: conc against the y'<y marginal,
        // then merge the group in, then G(<x,≤y) against the updated
        // marginal (same-y smaller-x neighbors included — the window
        // form's RANGE-frame tie semantics, exactly)
        def flushGroup(): Unit = if (grp.nonEmpty) {
          var i = 0
          while (i < grp.length) {
            conc = Math.addExact(conc,
              Math.multiplyExact(grp(i)._2, pref(grp(i)._1))); i += 1
          }
          var ty = 0L
          i = 0
          while (i < grp.length) {
            hist.merge(grp(i)._1, grp(i)._2, (a, b) => Math.addExact(a, b))
            ty = Math.addExact(ty, grp(i)._2); i += 1
          }
          i = 0
          while (i < grp.length) {
            sumGle = Math.addExact(sumGle,
              Math.multiplyExact(grp(i)._2, pref(grp(i)._1))); i += 1
          }
          n = Math.addExact(n, ty)
          n2 = Math.addExact(n2, Math.multiplyExact(ty, ty - 1) / 2)
          grp.clear()
        }
        def flushType(): Unit = if (curType != null) {
          flushGroup()
          var n1 = 0L; var sumCT = 0L; var run = 0L
          val itr = hist.entrySet().iterator()
          while (itr.hasNext) {
            val t = itr.next().getValue
            sumCT = Math.addExact(sumCT, Math.multiplyExact(t, run))
            n1 = Math.addExact(n1, Math.multiplyExact(t, t - 1) / 2)
            run = Math.addExact(run, t)
          }
          out += ((curType, n, conc, Math.subtractExact(sumCT, sumGle),
            n1, n2))
          hist.clear(); conc = 0L; sumGle = 0L; n = 0L; n2 = 0L
          haveY = false
        }
        it.foreach { case (t, x, y, c) =>
          if (t != curType) { flushType(); curType = t }
          if (!haveY || y != curY) { flushGroup(); curY = y; haveY = true }
          grp += ((x, c))
        }
        flushType()
        out.iterator
      }.toDF("event_type", "n", "concordant", "discordant", "n1", "n2")
      val r = perType.withColumn("n0", expr("n * (n - 1) div 2"))
      val den = sqrt((col("n0") - col("n1")).cast("double") *
        (col("n0") - col("n2")).cast("double"))
      r.select(col("event_type"), col("n"),
          col("concordant"), col("discordant"),
          when(col("n0") === col("n1") || col("n0") === col("n2"),
            lit(null).cast("double"))
            .otherwise(round(
              (col("concordant") - col("discordant")).cast("double") / den,
              6)).as("tau_b"))
        .orderBy(col("event_type"))
  }

  private def Q159Sql: Option[String] = Some("""
      WITH e AS (SELECT event_type,
                        CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) AS x,
                        CAST(FLOOR(value * 64) AS BIGINT) AS y
                 FROM events
                 WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      cells AS (SELECT event_type, x, y, COUNT(*) AS c
                FROM e GROUP BY 1, 2, 3),
      cd AS (SELECT a.event_type,
                    CAST(SUM(CASE WHEN a.y < b.y THEN a.c * b.c
                             ELSE 0 END) AS BIGINT) AS concordant,
                    CAST(SUM(CASE WHEN a.y > b.y THEN a.c * b.c
                             ELSE 0 END) AS BIGINT) AS discordant
             FROM cells a JOIN cells b
               ON a.event_type = b.event_type AND a.x < b.x
             GROUP BY 1),
      nt AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
             FROM cells GROUP BY 1),
      t1 AS (SELECT event_type, CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n1
             FROM (SELECT event_type, x, CAST(SUM(c) AS BIGINT) AS t
                   FROM cells GROUP BY 1, 2) GROUP BY 1),
      t2 AS (SELECT event_type, CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n2
             FROM (SELECT event_type, y, CAST(SUM(c) AS BIGINT) AS t
                   FROM cells GROUP BY 1, 2) GROUP BY 1),
      r AS (SELECT cd.event_type, n, concordant, discordant,
                   n * (n - 1) // 2 AS n0, n1, n2
            FROM cd JOIN nt USING (event_type)
                    JOIN t1 USING (event_type)
                    JOIN t2 USING (event_type))
      SELECT event_type, n, concordant, discordant,
             CASE WHEN n0 = n1 OR n0 = n2 THEN NULL
                  ELSE ROUND(CAST(concordant - discordant AS DOUBLE)
                             / SQRT(CAST(n0 - n1 AS DOUBLE)
                                    * CAST(n0 - n2 AS DOUBLE)), 6)
             END AS tau_b
      FROM r ORDER BY event_type""")

  /** Two-sample mean z-test with KNOWN population variances
    * (ClickHouse `meanZTest(pop_var_x, pop_var_y, conf)` analog) —
    * purchase vs signup per day. Unlike the t family (q141/q149) the
    * variances are caller-supplied constants, so the denominator
    * needs no sample moments and the analog also emits the
    * confidence-interval bounds ClickHouse returns:
    * z = (m1−m2)/sqrt(σx²/n1 + σy²/n2), CI = (m1−m2) ∓ z₀.975·se.
    * All inputs exact BIGINT sums of v = floor(value·64); the only
    * IEEE ops are the fixed-order finale (divide/sqrt/± are
    * correctly-rounded required IEEE ops, identical cross-engine —
    * no libm). p-value is omitted deliberately: it needs erf(), a
    * libm call with no cross-engine bit contract.
    */
  val q160 = Q(
    "q160_mean_z",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .select(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"), floor(col("value") * 64).as("v"))
      def side(t: String, pre: String) = Seq(
        sum(when(col("event_type") === t, 1L).otherwise(0L))
          .as(s"n_$pre"),
        sum(when(col("event_type") === t, col("v")).otherwise(0L))
          .as(s"s_$pre"))
      val aggs = side("purchase", "p") ++ side("signup", "s")
      val g = e.groupBy(col("day"))
        .agg(aggs.head, aggs.tail: _*)
        .filter(col("n_p") > 0 && col("n_s") > 0)
      // population variances are test PARAMETERS (exact double
      // literals), per the ClickHouse signature — not estimated
      val varX = lit(4.0e7)
      val varY = lit(4.0e7)
      val z975 = lit(1.959964)
      val m1 = col("s_p").cast("double") / col("n_p").cast("double")
      val m2 = col("s_s").cast("double") / col("n_s").cast("double")
      val d = m1 - m2
      val se = sqrt(varX / col("n_p").cast("double") +
        varY / col("n_s").cast("double"))
      g.select(col("day"), col("n_p"), col("n_s"), col("s_p"), col("s_s"),
          round(d / se, 6).as("z_stat"),
          round(d - z975 * se, 6).as("ci_low"),
          round(d + z975 * se, 6).as("ci_high"))
        .orderBy(col("day"))
    },
    Some("""
      WITH e AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                        event_type,
                        CAST(FLOOR(value * 64) AS BIGINT) AS v
                 FROM events WHERE event_type IN ('purchase', 'signup')),
      g AS (SELECT day,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_p,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN v
                                 ELSE 0 END) AS BIGINT) AS s_p,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_s,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN v
                                 ELSE 0 END) AS BIGINT) AS s_s
            FROM e GROUP BY day
            HAVING n_p > 0 AND n_s > 0),
      m AS (SELECT day, n_p, n_s, s_p, s_s,
                   CAST(s_p AS DOUBLE) / CAST(n_p AS DOUBLE)
                   - CAST(s_s AS DOUBLE) / CAST(n_s AS DOUBLE) AS d,
                   SQRT(4.0e7 / CAST(n_p AS DOUBLE)
                        + 4.0e7 / CAST(n_s AS DOUBLE)) AS se
            FROM g)
      SELECT day, n_p, n_s, s_p, s_s,
             ROUND(d / se, 6) AS z_stat,
             ROUND(d - 1.959964 * se, 6) AS ci_low,
             ROUND(d + 1.959964 * se, 6) AS ci_high
      FROM m ORDER BY day"""))

  /** bfloat16 quantiles per event_type (ClickHouse `quantileBFloat16`
    * analog): values are truncated to bfloat16 precision (8
    * significant bits — 1 implicit + 7 explicit mantissa bits), then
    * the DISCRETE quantile is exact over the bounded histogram of
    * distinct bf16 values (≤ 128 mantissa patterns × octaves spanned,
    * a few thousand keys however large the corpus — ClickHouse's
    * 65 536-bucket argument, and why the sketch is mergeable with a
    * fixed footprint at 100 TB).
    *
    * The truncation needs NO bit-reinterpret and NO libm: the octave
    * 2^e ≤ x < 2^(e+1) comes from a broadcast range-join against a
    * 61-row powers-of-two frame (built by exact doubling in Scala —
    * `math.scalb`), and bf = floor(x·(128/p))·(p/128) where p = 2^e —
    * multiply/divide by a power of two and floor are all EXACT double
    * ops, bit-identical in any IEEE engine (DuckDB rebuilds the same
    * frame from exact bit-shifted integers — a recursive-CTE doubling
    * formulation was rejected because DuckDB treats every UNION CTE
    * under WITH RECURSIVE as recursive and kept a duplicate p = 1.0
    * row, double-matching the octave join). Quantile ranks use integer
    * rationals (1 + (9·(n−1)) div 10 for p90) — no double product to
    * straddle an ulp. The in-histogram running total is a per-type
    * window over summary rows, safe by construction.
    */
  val q161 = Q(
    "q161_quantile_bf16",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val pows = (-30 to 30)
        .map(e => math.scalb(1.0, e)).toDF("p")
      val e = Tables(spark, dir, "events")
        .filter(col("value") > 0.0)
        .select(col("event_type"), col("value"))
        .join(broadcast(pows),
          col("value") >= col("p") && col("value") < col("p") * 2)
        .select(col("event_type"),
          (floor(col("value") * (lit(128.0) / col("p"))) *
            (col("p") / lit(128.0))).as("bf"))
      val hist = e.groupBy(col("event_type"), col("bf"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bf"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c"))
          .over(Window.partitionBy(col("event_type"))))
      def qAt(num: Int, den: Int, out: String) =
        min(when(col("cum") >= expr(s"1 + ($num * (n - 1)) div $den"),
          col("bf"))).as(out)
      cum.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), qAt(1, 2, "p50"), qAt(9, 10, "p90"),
          qAt(99, 100, "p99"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH pows AS (
        SELECT CASE WHEN e >= 0 THEN CAST((1::BIGINT << e) AS DOUBLE)
                    ELSE CAST(1.0 AS DOUBLE)
                         / CAST((1::BIGINT << -e) AS DOUBLE)
               END AS p
        FROM range(-30, 31) t(e)),
      e AS (SELECT event_type,
                   FLOOR(value * (128.0 / p)) * (p / 128.0) AS bf
            FROM events JOIN pows
              ON value >= p AND value < p * 2
            WHERE value > 0.0),
      hist AS (SELECT event_type, bf, COUNT(*) AS c FROM e GROUP BY 1, 2),
      cum AS (SELECT event_type, bf, c,
                     SUM(c) OVER (PARTITION BY event_type ORDER BY bf
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     SUM(c) OVER (PARTITION BY event_type) AS n
              FROM hist)
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             MIN(CASE WHEN cum >= 1 + (1 * (n - 1)) // 2 THEN bf END) AS p50,
             MIN(CASE WHEN cum >= 1 + (9 * (n - 1)) // 10 THEN bf END) AS p90,
             MIN(CASE WHEN cum >= 1 + (99 * (n - 1)) // 100 THEN bf END)
               AS p99
      FROM cum GROUP BY event_type ORDER BY event_type"""))

  /** Pairwise correlation matrix (ClickHouse `corrMatrix` analog)
    * across four per-event metrics — v = floor(value·8), p =
    * length(props), h = hour(ts), u = user_id mod 97 — per
    * event_type, from ONE fact-sized aggregate (n, 4 first moments,
    * 4 raw second moments, 6 cross moments — 15 exact BIGINT sums).
    * The 6 upper-triangle pairs are unpivoted from the type-sized
    * summary with `stack` (UNION ALL in the oracle), so the matrix
    * shape costs nothing extra at scale: the m² blow-up happens on
    * summary rows only. Each corr is the q146 fixed-order IEEE
    * finale (moments divided by n BEFORE multiplying keeps every
    * double conversion far inside 2^53), rounded 6 dp, NULL on zero
    * variance.
    */
  val q162 = Q(
    "q162_corr_matrix",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .select(col("event_type"),
          floor(col("value") * 8).as("v"),
          length(col("props")).cast("long").as("p"),
          hour(col("ts")).cast("long").as("h"),
          (col("user_id") % 97).as("u"))
      val ms = Seq("v", "p", "h", "u")
      val firsts = ms.map(m => sum(col(m)).as(s"s_$m"))
      val pairs = for {
        (a, i) <- ms.zipWithIndex; (b, j) <- ms.zipWithIndex
        if i <= j
      } yield (a, b)
      val seconds = pairs.map { case (a, b) =>
        sum(col(a) * col(b)).as(s"s_${a}${b}") }
      val aggs = (count(lit(1)).as("n") +: (firsts ++ seconds))
      val g = e.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
      val nd = col("n").cast("double")
      def mean(m: String) = col(s"s_$m").cast("double") / nd
      def varOf(m: String) =
        col(s"s_$m$m").cast("double") / nd - mean(m) * mean(m)
      def corrOf(a: String, b: String) = {
        val cov = col(s"s_$a$b").cast("double") / nd - mean(a) * mean(b)
        when(varOf(a) * varOf(b) === 0.0, lit(null).cast("double"))
          .otherwise(round(cov / sqrt(varOf(a) * varOf(b)), 6))
      }
      val offDiag = pairs.filter { case (a, b) => a != b }
      val stackArgs = offDiag.map { case (a, b) =>
        s"'$a', '$b', corr_$a$b" }.mkString(", ")
      g.select(col("event_type") +: col("n") +:
          offDiag.map { case (a, b) => corrOf(a, b).as(s"corr_$a$b") }: _*)
        .select(col("event_type"), col("n"),
          expr(s"stack(${offDiag.size}, $stackArgs) as (mx, my, corr)"))
        .orderBy(col("event_type"), col("mx"), col("my"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(FLOOR(value * 8) AS BIGINT) AS v,
                        CAST(LENGTH(props) AS BIGINT) AS p,
                        CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
                        user_id % 97 AS u
                 FROM events),
      g AS (SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(v) AS BIGINT) AS s_v,
                   CAST(SUM(p) AS BIGINT) AS s_p,
                   CAST(SUM(h) AS BIGINT) AS s_h,
                   CAST(SUM(u) AS BIGINT) AS s_u,
                   CAST(SUM(v * v) AS BIGINT) AS s_vv,
                   CAST(SUM(v * p) AS BIGINT) AS s_vp,
                   CAST(SUM(v * h) AS BIGINT) AS s_vh,
                   CAST(SUM(v * u) AS BIGINT) AS s_vu,
                   CAST(SUM(p * p) AS BIGINT) AS s_pp,
                   CAST(SUM(p * h) AS BIGINT) AS s_ph,
                   CAST(SUM(p * u) AS BIGINT) AS s_pu,
                   CAST(SUM(h * h) AS BIGINT) AS s_hh,
                   CAST(SUM(h * u) AS BIGINT) AS s_hu,
                   CAST(SUM(u * u) AS BIGINT) AS s_uu
            FROM e GROUP BY 1),
      m AS (SELECT event_type, n,
                   CAST(s_v AS DOUBLE) / n AS m_v,
                   CAST(s_p AS DOUBLE) / n AS m_p,
                   CAST(s_h AS DOUBLE) / n AS m_h,
                   CAST(s_u AS DOUBLE) / n AS m_u,
                   CAST(s_vv AS DOUBLE) / n AS r_vv,
                   CAST(s_vp AS DOUBLE) / n AS r_vp,
                   CAST(s_vh AS DOUBLE) / n AS r_vh,
                   CAST(s_vu AS DOUBLE) / n AS r_vu,
                   CAST(s_pp AS DOUBLE) / n AS r_pp,
                   CAST(s_ph AS DOUBLE) / n AS r_ph,
                   CAST(s_pu AS DOUBLE) / n AS r_pu,
                   CAST(s_hh AS DOUBLE) / n AS r_hh,
                   CAST(s_hu AS DOUBLE) / n AS r_hu,
                   CAST(s_uu AS DOUBLE) / n AS r_uu
            FROM g),
      c AS (SELECT event_type, n,
                   r_vv - m_v * m_v AS var_v,
                   r_pp - m_p * m_p AS var_p,
                   r_hh - m_h * m_h AS var_h,
                   r_uu - m_u * m_u AS var_u,
                   r_vp - m_v * m_p AS cov_vp,
                   r_vh - m_v * m_h AS cov_vh,
                   r_vu - m_v * m_u AS cov_vu,
                   r_ph - m_p * m_h AS cov_ph,
                   r_pu - m_p * m_u AS cov_pu,
                   r_hu - m_h * m_u AS cov_hu
            FROM m)
      SELECT event_type, n, mx, my,
             CASE WHEN vx * vy = 0.0 THEN NULL
                  ELSE ROUND(cov / SQRT(vx * vy), 6) END AS corr
      FROM (
        SELECT event_type, n, 'v' AS mx, 'p' AS my,
               cov_vp AS cov, var_v AS vx, var_p AS vy FROM c
        UNION ALL SELECT event_type, n, 'v', 'h',
               cov_vh, var_v, var_h FROM c
        UNION ALL SELECT event_type, n, 'v', 'u',
               cov_vu, var_v, var_u FROM c
        UNION ALL SELECT event_type, n, 'p', 'h',
               cov_ph, var_p, var_h FROM c
        UNION ALL SELECT event_type, n, 'p', 'u',
               cov_pu, var_p, var_u FROM c
        UNION ALL SELECT event_type, n, 'h', 'u',
               cov_hu, var_h, var_u FROM c)
      ORDER BY event_type, mx, my"""))

  /** 7-day moving sum + moving average of the daily event count per
    * type (ClickHouse `groupArrayMovingSum(7)` /
    * `groupArrayMovingAvg(7)` analogs, unrolled to rows). The facts
    * collapse to (type, day) summary rows in ONE keyed aggregate;
    * the moving window runs per type over that day series only —
    * rows/key bounded by the calendar horizon, never by corpus size,
    * so the window is safe by construction (the q122 argument). The
    * moving sum is an exact BIGINT; the avg divides by the FIXED
    * window size 7 (ClickHouse semantics: the head of the series
    * averages over fewer real elements but the same divisor),
    * one IEEE divide rounded 6 dp.
    */
  val q163 = Q(
    "q163_moving_sum",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables(spark, dir, "events")
        .groupBy(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      daily
        .withColumn("mov_sum", sum(col("c")).over(w))
        .select(col("event_type"), col("day"), col("c"), col("mov_sum"),
          round(col("mov_sum").cast("double") / 7.0, 6).as("mov_avg"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      WITH daily AS (SELECT event_type,
                            strftime(date_trunc('day', ts), '%Y-%m-%d')
                              AS day,
                            COUNT(*) AS c
                     FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, day, c,
                   CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS BETWEEN 6 PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS mov_sum
            FROM daily)
      SELECT event_type, day, CAST(c AS BIGINT) AS c, mov_sum,
             ROUND(CAST(mov_sum AS DOUBLE) / 7.0, 6) AS mov_avg
      FROM m ORDER BY event_type, day"""))

  /** Inline bar chart of the daily count series per event_type
    * (ClickHouse `sparkbar` analog): each day maps to one of 8 block
    * glyphs by ALL-INTEGER height math — idx = ((c−mn)·7) div (mx−mn),
    * full-height when the series is constant — and the per-type string
    * is assembled in day order. Glyph lookup is element_at on an
    * 8-element literal array (not substring arithmetic on a multi-byte
    * string); ordering inside the aggregate is array_sort on (day,
    * glyph) structs — lexicographic on the unique day key — so the
    * result never depends on row arrival order. Facts collapse to
    * (type, day) summary rows first; min/max ride a broadcast back.
    */
  val q164 = Q(
    "q164_sparkbar",
    (spark, dir) => {
      val glyphs = Seq("▁", "▂", "▃", "▄",
        "▅", "▆", "▇", "█")
      val daily = Tables(spark, dir, "events")
        .groupBy(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("c"))
      val ext = daily.groupBy(col("event_type"))
        .agg(min(col("c")).as("mn"), max(col("c")).as("mx"),
          count(lit(1)).as("days"), sum(col("c")).as("n"))
      val idx = when(col("mx") === col("mn"), lit(7L))
        .otherwise(expr("((c - mn) * 7) div (mx - mn)"))
      daily.join(broadcast(ext), "event_type")
        .withColumn("g", element_at(
          array(glyphs.map(lit): _*), (idx + 1).cast("int")))
        .groupBy(col("event_type"))
        .agg(max(col("days")).as("days"), max(col("n")).as("n"),
          array_join(expr("transform(array_sort(collect_list(" +
            "struct(day, g))), x -> x.g)"), "").as("bar"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH daily AS (SELECT event_type,
                            strftime(date_trunc('day', ts), '%Y-%m-%d')
                              AS day,
                            COUNT(*) AS c
                     FROM events GROUP BY 1, 2),
      ext AS (SELECT event_type, MIN(c) AS mn, MAX(c) AS mx,
                     COUNT(*) AS days, CAST(SUM(c) AS BIGINT) AS n
              FROM daily GROUP BY 1),
      g AS (SELECT d.event_type, d.day, ext.days, ext.n,
                   ['▁', '▂', '▃', '▄',
                    '▅', '▆', '▇', '█'][
                     CAST(CASE WHEN mx = mn THEN 7
                               ELSE ((c - mn) * 7) // (mx - mn)
                          END AS INT) + 1] AS gl
            FROM daily d JOIN ext USING (event_type))
      SELECT event_type, CAST(MAX(days) AS BIGINT) AS days, MAX(n) AS n,
             STRING_AGG(gl, '' ORDER BY day) AS bar
      FROM g GROUP BY event_type ORDER BY event_type"""))

  /** Two-feature linear regression per event_type, fit in-engine by
    * the NORMAL EQUATIONS (the deterministic answer to ClickHouse's
    * `stochasticLinearRegression`, whose SGD result depends on row
    * order and so can never be oracle-checked): y = b0 + b1·h + b2·p
    * with y = floor(value·64), h = hour, p = length(props). ONE
    * fact-sized aggregate produces the 9 exact BIGINT moments of the
    * 3×3 Gram system; the coefficients are Cramer determinants
    * computed ENTIRELY in 128-bit integer arithmetic (decimal(38,0) /
    * HUGEINT — exact, so summation and factor order are irrelevant
    * cross-engine), quantized to µ-units by the q158 sign-split
    * round(a/b) = (2a+b) div 2b, and only then displayed as doubles.
    * det(Gram) > 0 unless the features are collinear → NULL guard on
    * det = 0. Bounds: triple products stay under 10^38 up to ~10^4×
    * this fixture (documented; the q144 decimal-swap note applies
    * beyond). Scale shape: map-side partials to 5 summary rows; the
    * entire solve is a projection on the summary.
    */
  val q165 = Q(
    "q165_linreg_normal",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .select(col("event_type"),
          floor(col("value") * 64).as("y"),
          hour(col("ts")).cast("long").as("h"),
          length(col("props")).cast("long").as("p"))
      val g = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("h")).as("sx1"), sum(col("p")).as("sx2"),
          sum(col("h") * col("h")).as("s11"),
          sum(col("h") * col("p")).as("s12"),
          sum(col("p") * col("p")).as("s22"),
          sum(col("y")).as("sy"),
          sum(col("h") * col("y")).as("sx1y"),
          sum(col("p") * col("y")).as("sx2y"))
        // all four determinants in exact decimal(38,0) — cofactor
        // expansion along the first row/column of the (symmetric)
        // Gram matrix with column i replaced by the moment vector
        .withColumn("m1122", expr(
          "cast(s11 as decimal(38,0)) * s22 - cast(s12 as decimal(38,0)) * s12"))
        .withColumn("detD", expr(
          "cast(n as decimal(38,0)) * m1122" +
            " - cast(sx1 as decimal(38,0)) * (cast(sx1 as decimal(38,0)) * s22 - cast(s12 as decimal(38,0)) * sx2)" +
            " + cast(sx2 as decimal(38,0)) * (cast(sx1 as decimal(38,0)) * s12 - cast(s11 as decimal(38,0)) * sx2)"))
        .withColumn("det0", expr(
          "cast(sy as decimal(38,0)) * m1122" +
            " - cast(sx1 as decimal(38,0)) * (cast(sx1y as decimal(38,0)) * s22 - cast(s12 as decimal(38,0)) * sx2y)" +
            " + cast(sx2 as decimal(38,0)) * (cast(sx1y as decimal(38,0)) * s12 - cast(s11 as decimal(38,0)) * sx2y)"))
        .withColumn("det1", expr(
          "cast(n as decimal(38,0)) * (cast(sx1y as decimal(38,0)) * s22 - cast(s12 as decimal(38,0)) * sx2y)" +
            " - cast(sy as decimal(38,0)) * (cast(sx1 as decimal(38,0)) * s22 - cast(s12 as decimal(38,0)) * sx2)" +
            " + cast(sx2 as decimal(38,0)) * (cast(sx1 as decimal(38,0)) * sx2y - cast(sx1y as decimal(38,0)) * sx2)"))
        .withColumn("det2", expr(
          "cast(n as decimal(38,0)) * (cast(s11 as decimal(38,0)) * sx2y - cast(sx1y as decimal(38,0)) * s12)" +
            " - cast(sx1 as decimal(38,0)) * (cast(sx1 as decimal(38,0)) * sx2y - cast(sx1y as decimal(38,0)) * sx2)" +
            " + cast(sy as decimal(38,0)) * (cast(sx1 as decimal(38,0)) * s12 - cast(s11 as decimal(38,0)) * sx2)"))
      def coef(det: String) = when(col("detD") === 0,
        lit(null).cast("double"))
        .otherwise(expr(
          s"case when $det < 0" +
            s" then -((2 * (-$det) * 1000000 + detD) div (2 * detD))" +
            s" else (2 * $det * 1000000 + detD) div (2 * detD) end")
          .cast("double") / 1000000.0)
      g.select(col("event_type"), col("n"), col("sy"),
          coef("det0").as("b0"), coef("det1").as("b1"),
          coef("det2").as("b2"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(FLOOR(value * 64) AS BIGINT) AS y,
                        CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
                        CAST(LENGTH(props) AS BIGINT) AS p
                 FROM events),
      g AS (SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(h) AS HUGEINT) AS sx1,
                   CAST(SUM(p) AS HUGEINT) AS sx2,
                   CAST(SUM(h * h) AS HUGEINT) AS s11,
                   CAST(SUM(h * p) AS HUGEINT) AS s12,
                   CAST(SUM(p * p) AS HUGEINT) AS s22,
                   CAST(SUM(y) AS HUGEINT) AS sy,
                   CAST(SUM(h * y) AS HUGEINT) AS sx1y,
                   CAST(SUM(p * y) AS HUGEINT) AS sx2y
            FROM e GROUP BY 1),
      d AS (SELECT event_type, n, sy,
                   n * (s11 * s22 - s12 * s12)
                   - sx1 * (sx1 * s22 - s12 * sx2)
                   + sx2 * (sx1 * s12 - s11 * sx2) AS detD,
                   sy * (s11 * s22 - s12 * s12)
                   - sx1 * (sx1y * s22 - s12 * sx2y)
                   + sx2 * (sx1y * s12 - s11 * sx2y) AS det0,
                   n * (sx1y * s22 - s12 * sx2y)
                   - sy * (sx1 * s22 - s12 * sx2)
                   + sx2 * (sx1 * sx2y - sx1y * sx2) AS det1,
                   n * (s11 * sx2y - sx1y * s12)
                   - sx1 * (sx1 * sx2y - sx1y * sx2)
                   + sy * (sx1 * s12 - s11 * sx2) AS det2
            FROM g)
      SELECT event_type, CAST(n AS BIGINT) AS n, CAST(sy AS BIGINT) AS sy,
             CASE WHEN detD = 0 THEN NULL
                  ELSE CAST(CASE WHEN det0 < 0
                            THEN -((2 * (-det0) * 1000000 + detD)
                                   // (2 * detD))
                            ELSE (2 * det0 * 1000000 + detD) // (2 * detD)
                       END AS DOUBLE) / 1000000.0 END AS b0,
             CASE WHEN detD = 0 THEN NULL
                  ELSE CAST(CASE WHEN det1 < 0
                            THEN -((2 * (-det1) * 1000000 + detD)
                                   // (2 * detD))
                            ELSE (2 * det1 * 1000000 + detD) // (2 * detD)
                       END AS DOUBLE) / 1000000.0 END AS b1,
             CASE WHEN detD = 0 THEN NULL
                  ELSE CAST(CASE WHEN det2 < 0
                            THEN -((2 * (-det2) * 1000000 + detD)
                                   // (2 * detD))
                            ELSE (2 * det2 * 1000000 + detD) // (2 * detD)
                       END AS DOUBLE) / 1000000.0 END AS b2
      FROM d ORDER BY event_type"""))

  /** Dominant period of the daily count series per event_type
    * (ClickHouse `seriesPeriodDetectFFT` analog, answered WITHOUT the
    * FFT — float transforms have no cross-engine bit contract): the
    * lag L ∈ [2, 14] maximizing the autocorrelation of the day series,
    * computed on EXACT integers end to end. Mean-centering is cleared
    * of fractions by scaling deviations by n (dev_d = n·c_d − S, exact
    * BIGINT); r_L = Σ dev_d·dev_{d+L} over the overlapping days; the
    * per-term normalization r_L/(n−L) quantizes to µ-units by the
    * q165 sign-split integer rounding, so the argmax (max_by on
    * (score, −lag) / ORDER BY score DESC, lag ASC) compares exact
    * integers — no IEEE op anywhere before the display divide.
    *
    * Scale shape: facts collapse to the (type, day) summary in ONE
    * keyed aggregate; the lag self-join runs on day-series rows ×
    * 13 lags — calendar-bounded however large the corpus (the q159
    * bounded-frame answer to a quadratic statistic).
    */
  val q168 = Q(
    "q168_series_period",
    (spark, dir) => {
      import spark.implicits._
      val daily = Tables(spark, dir, "events")
        .groupBy(col("event_type"),
          expr("ts_ns div 86400000000000").as("di"))
        .agg(count(lit(1)).as("c"))
      val stats = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
      val dev = daily.join(broadcast(stats), "event_type")
        .select(col("event_type"), col("di"), col("n"),
          (col("n") * col("c") - col("s")).as("dev"))
      val lags = (2 to 14).toDF("lag")
      val a = dev.select(col("event_type"), col("di"), col("n"),
        col("dev").as("dev_a"))
      val b = dev.select(col("event_type").as("bt"), col("di").as("bdi"),
        col("dev").as("dev_b"))
      val r = a.crossJoin(broadcast(lags))
        .join(b, col("event_type") === col("bt") &&
          col("bdi") === col("di") + col("lag"))
        .groupBy(col("event_type"), col("lag"))
        .agg(max(col("n")).as("n"),
          sum(col("dev_a") * col("dev_b")).as("r"),
          count(lit(1)).as("terms"))
        .filter(col("terms") > 0)
        // µ-unit normalized score as an exact integer (q165 sign-split)
        .withColumn("score6", expr(
          "case when r < 0" +
            " then -((2 * cast(-r as decimal(38,0)) * 1000000 + terms)" +
            " div (2 * terms))" +
            " else (2 * cast(r as decimal(38,0)) * 1000000 + terms)" +
            " div (2 * terms) end"))
      r.groupBy(col("event_type"))
        .agg(max(col("n")).as("n_days"),
          max(struct(col("score6"), (-col("lag")).as("nl")))
            .as("best"))
        .select(col("event_type"), col("n_days"),
          (-col("best.nl")).cast("long").as("period"),
          round(col("best.score6").cast("double") / 1000000.0, 6)
            .as("score"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS di,
                            COUNT(*) AS c
                     FROM events GROUP BY 1, 2),
      stats AS (SELECT event_type, COUNT(*) AS n,
                       CAST(SUM(c) AS BIGINT) AS s
                FROM daily GROUP BY 1),
      dev AS (SELECT d.event_type, d.di, st.n,
                     st.n * d.c - st.s AS dev
              FROM daily d JOIN stats st USING (event_type)),
      r AS (SELECT a.event_type, l.lag, MAX(a.n) AS n,
                   CAST(SUM(a.dev * b.dev) AS BIGINT) AS r,
                   COUNT(*) AS terms
            FROM dev a
            CROSS JOIN (SELECT UNNEST(range(2, 15)) AS lag) l
            JOIN dev b ON b.event_type = a.event_type
                      AND b.di = a.di + l.lag
            GROUP BY 1, 2),
      sc AS (SELECT event_type, lag, n,
                    CASE WHEN r < 0
                         THEN -((2 * CAST(-r AS HUGEINT) * 1000000 + terms)
                                // (2 * terms))
                         ELSE (2 * CAST(r AS HUGEINT) * 1000000 + terms)
                              // (2 * terms) END AS score6
             FROM r WHERE terms > 0),
      best AS (SELECT event_type, n, lag, score6,
                      ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY score6 DESC, lag ASC)
                        AS rn
               FROM sc)
      SELECT event_type, CAST(n AS BIGINT) AS n_days,
             CAST(lag AS BIGINT) AS period,
             ROUND(CAST(score6 AS DOUBLE) / 1000000.0, 6) AS score
      FROM best WHERE rn = 1 ORDER BY event_type"""))

  /** Time-decayed daily-count sum per event_type (ClickHouse
    * `exponentialTimeDecayedSum` analog): S = Σ_d c_d · r^(D−d) with
    * r = 0.9 and D the newest day — the "recent data counts more"
    * rollup. The decay weights are NOT computed with pow()/exp()
    * (libm, no cross-engine bit contract): both engines build the
    * 61-row weight table by SEQUENTIAL IEEE multiplication (w_k =
    * w_{k−1}·0.9 — each step correctly rounded, so the chain is
    * bit-identical; Scala fold here, recursive CTE in the oracle) and
    * the day series joins it broadcast. Per-day terms c_d·w_k are
    * single IEEE products quantized 6 dp and decimal-accumulated (the
    * q154/q156 discipline — order- and last-ulp-proof).
    *
    * Scale shape: facts collapse to the (type, day) summary first;
    * everything after runs on calendar-bounded rows with the weight
    * frame and the 1-row max-day frame attached broadcast. Days more
    * than 60 lags old drop out of the inner join BY DESIGN (w < 0.002
    * there — this is the windowed deployment shape of the decayed
    * rollup, and it keeps the weight table finite).
    */
  val q169 = Q(
    "q169_time_decayed_sum",
    (spark, dir) => {
      import spark.implicits._
      // w(k) = 0.9^k by sequential correctly-rounded multiplication
      val ws = Iterator.iterate(1.0)(_ * 0.9).take(61).toSeq
      val weights = ws.zipWithIndex.map { case (w, k) => (k.toLong, w) }
        .toDF("k", "w")
      val daily = Tables(spark, dir, "events")
        .groupBy(col("event_type"),
          expr("ts_ns div 86400000000000").as("di"))
        .agg(count(lit(1)).as("c"))
      val top = daily.agg(max(col("di")).as("dmax"))
      daily.crossJoin(broadcast(top))
        .withColumn("k", col("dmax") - col("di"))
        .join(broadcast(weights), "k")
        .select(col("event_type"),
          round(col("c").cast("double") * col("w"), 6).as("t"),
          col("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("n"),
          sum(col("t").cast("decimal(38,6)")).as("dsum"))
        .select(col("event_type"), col("n_days"), col("n"),
          col("dsum").cast("double").as("decayed_sum"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH RECURSIVE wt AS (
        SELECT 0 AS k, CAST(1.0 AS DOUBLE) AS w
        UNION ALL SELECT k + 1, w * 0.9 FROM wt WHERE k < 60),
      daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS di,
                       COUNT(*) AS c
                FROM events GROUP BY 1, 2),
      top AS (SELECT MAX(di) AS dmax FROM daily),
      t AS (SELECT d.event_type, d.c,
                   ROUND(CAST(d.c AS DOUBLE) * wt.w, 6) AS t
            FROM daily d CROSS JOIN top
            JOIN wt ON wt.k = top.dmax - d.di)
      SELECT event_type, COUNT(*) AS n_days, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(t AS DECIMAL(38,6))) AS DOUBLE) AS decayed_sum
      FROM t GROUP BY event_type ORDER BY event_type"""))

  /** ROC AUC of the scaled value as a click-vs-view classifier score
    * (ClickHouse `arrayAUC` analog), computed WITHOUT materializing or
    * sorting scored rows: facts collapse to the per-score histogram
    * (score = floor(value·64), label = event_type), and the
    * tie-corrected rank statistic comes from the cumulative counts —
    * AUC = Σ_s [neg(<s)·pos(s) + ½·neg(s)·pos(s)] / (P·N). Doubling
    * the numerator clears the ½ so EVERYTHING up to the final divide
    * is exact BIGINT (the q150 fractional-ranks trick); the running
    * neg(<s) prefix is a window over the bounded score histogram.
    * NULL when either class is empty.
    */
  val q170 = Q(
    "q170_auc",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(spark, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(floor(col("value") * 64).as("s"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("y"))
      val hist = e.groupBy(col("s"))
        .agg(sum(col("y")).as("pos"),
          sum(lit(1L) - col("y")).as("neg"))
      val cum = hist
        .withColumn("neg_below",
          coalesce(sum(col("neg")).over(
            Window.orderBy(col("s"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val agg = cum.agg(
        sum(col("pos")).as("p"), sum(col("neg")).as("nn"),
        sum(col("neg_below") * col("pos") * 2 + col("neg") * col("pos"))
          .as("num2"))
      agg.select(col("p").as("n_pos"), col("nn").as("n_neg"),
        when(col("p") === 0 || col("nn") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("num2").cast("double") /
            (lit(2.0) * (col("p") * col("nn")).cast("double")), 6))
          .as("auc"))
    },
    Some("""
      WITH e AS (SELECT CAST(FLOOR(value * 64) AS BIGINT) AS s,
                        CASE WHEN event_type = 'click' THEN 1
                             ELSE 0 END AS y
                 FROM events WHERE event_type IN ('click', 'view')),
      hist AS (SELECT s, CAST(SUM(y) AS BIGINT) AS pos,
                      CAST(SUM(1 - y) AS BIGINT) AS neg
               FROM e GROUP BY 1),
      cum AS (SELECT s, pos, neg,
                     COALESCE(CAST(SUM(neg) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS BIGINT), 0) AS neg_below
              FROM hist),
      a AS (SELECT CAST(SUM(pos) AS BIGINT) AS p,
                   CAST(SUM(neg) AS BIGINT) AS nn,
                   CAST(SUM(neg_below * pos * 2 + neg * pos) AS BIGINT)
                     AS num2
            FROM cum)
      SELECT p AS n_pos, nn AS n_neg,
             CASE WHEN p = 0 OR nn = 0 THEN NULL
                  ELSE ROUND(CAST(num2 AS DOUBLE)
                             / (2.0 * CAST(p * nn AS DOUBLE)), 6)
             END AS auc
      FROM a"""))

  /** Audience-overlap set algebra via distributed bitmaps (ClickHouse
    * `groupBitmap`/`groupBitmapAnd`/`Or`/`Xor` + `bitmapAndnot` family
    * analog): for every unordered event_type pair, the AND / OR / XOR /
    * ANDNOT cardinalities of the two user-id audiences. The operator is
    * the bitmap itself, built the Roaring way but distributed: user ids
    * collapse into 64-bit WORDS keyed by (type, user_id div 64) with a
    * map-side-combining `bit_or(1 << bit)` aggregate — raw ids never
    * shuffle, only words do (≤ users/64 rows per type at ANY corpus
    * size), and every op is a built-in codegen expression (shiftleft /
    * bit_or / bit_count — no UDF). Intersections come from ONE
    * word-aligned equi-join between the word frames (`bit_count(a & b)`
    * summed); OR/XOR/ANDNOT then follow exactly by inclusion-exclusion
    * on BIGINTs, which is also how the oracle answers from DISTINCT
    * sets. The type-pair scaffold is a ≤ types² broadcast so a pair
    * with an empty intersection still reports.
    */
  val q171 = Q(
    "q171_bitmap_audience",
    (spark, dir) =>
      audienceAlgebraFromWords(
        audienceWordsOf(Tables(spark, dir, "events"))),
    Some("""
      WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
      uq AS (SELECT event_type, COUNT(*) AS uniq FROM u GROUP BY 1),
      i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS and_c
            FROM u a JOIN u b ON a.user_id = b.user_id
                             AND a.event_type < b.event_type
            GROUP BY 1, 2)
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.uniq AS uniq_a, b.uniq AS uniq_b,
             COALESCE(i.and_c, 0) AS and_c,
             a.uniq + b.uniq - COALESCE(i.and_c, 0) AS or_c,
             a.uniq - COALESCE(i.and_c, 0) AS andnot_ab,
             a.uniq + b.uniq - 2 * COALESCE(i.and_c, 0) AS xor_c
      FROM uq a JOIN uq b ON a.event_type < b.event_type
      LEFT JOIN i ON i.type_a = a.event_type AND i.type_b = b.event_type
      ORDER BY type_a, type_b"""))

  // one stored bitmap per sf dir per JVM (StoreMemo: built at most
  // once, per-key serialized, temp dir cleaned at JVM exit); built by
  // landing the even-user half then OR-folding the odd half, so the
  // query exercises the real write→fold lifecycle, not a one-shot dump
  private def bitmapStoreOf(spark: SparkSession, dir: String): String =
    graft.sources.StoreMemo.tempStore(s"bitmap:$dir",
        "graft-bitmapstore-") { out =>
      val ev = Tables(spark, dir, "events")
        .select(col("event_type"), col("user_id"))
      graft.sources.BitmapStoreLayout.write(
        audienceWordsOf(ev.filter(col("user_id") % 2 === 0)), out)
      graft.sources.BitmapStoreLayout.fold(spark, out,
        ev.filter(col("user_id") % 2 =!= 0))
    }

  /** The STORED leg of the q171 bitmap family (q171 = batch,
    * BitmapStream = live, this = storage): the audience word table is
    * LANDED via the write→OR-fold lifecycle
    * ([[graft.sources.BitmapStoreLayout]]) and the set algebra runs as
    * the shared downstream read over the store — so the answer must be
    * byte-identical to q171's direct build (same oracle), proving the
    * landed state exact. Fold I/O touches only folded audiences'
    * directories; bit_or idempotence makes the store exactly-once
    * under replay without a ledger (spec-pinned).
    */
  val q187 = Q(
    "q187_bitmap_store",
    (spark, dir) =>
      audienceAlgebraFromWords(
        graft.sources.BitmapStoreLayout.read(
          spark, bitmapStoreOf(spark, dir))),
    q171.oracle)

  /** The q171 word projection over any frame with event_type/user_id —
    * user ids collapse into 64-bit words keyed by (type, user_id div
    * 64) under a map-side-combining `bit_or`. Shared with the
    * streaming twin ([[graft.streaming.BitmapStream]]) so the batch
    * and live word tables cannot drift; bit_or is idempotent AND
    * associative, so micro-batch boundaries and replays cannot change
    * a word.
    */
  private[graft] def audienceWordsOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    raw.select(col("event_type"), col("user_id"))
      .groupBy(col("event_type"), expr("user_id div 64").as("w"))
      .agg(expr("bit_or(shiftleft(1L, int(user_id % 64)))").as("bm"))

  /** The q171 set-algebra finale over any (event_type, w, bm) word
    * frame — per-type cardinalities from summed popcounts, pairwise
    * AND from the word-aligned equi-join, OR/XOR/ANDNOT by
    * inclusion-exclusion on exact BIGINTs. The cheap downstream read
    * a live bitmap store (or the batch query) runs over its words.
    */
  private[graft] def audienceAlgebraFromWords(
      bits: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val uniq = bits.groupBy(col("event_type"))
      .agg(sum(expr("bit_count(bm)")).cast("long").as("uniq"))
    val inter = bits.as("a")
      .join(bits.as("b"),
        col("a.w") === col("b.w") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(sum(expr("bit_count(a.bm & b.bm)")).cast("long").as("and_c"))
    val ua = uniq.select(col("event_type").as("type_a"),
      col("uniq").as("uniq_a"))
    val ub = uniq.select(col("event_type").as("type_b"),
      col("uniq").as("uniq_b"))
    ua.join(ub, col("type_a") < col("type_b"))
      .join(broadcast(inter), Seq("type_a", "type_b"), "left")
      .na.fill(0L, Seq("and_c"))
      .select(col("type_a"), col("type_b"), col("uniq_a"), col("uniq_b"),
        col("and_c"),
        (col("uniq_a") + col("uniq_b") - col("and_c")).as("or_c"),
        (col("uniq_a") - col("and_c")).as("andnot_ab"),
        (col("uniq_a") + col("uniq_b") - lit(2L) * col("and_c"))
          .as("xor_c"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Fixed-resolution latency quantiles (ClickHouse `quantileTiming`
    * analog): the value column read as milliseconds and stored in the
    * reference sketch's fixed footprint — exact 1 ms counts below
    * 1024 ms, 16 ms buckets to 30 s, one overflow bucket at 30 s —
    * so per-type state is ≤ 2 838 integer cells at ANY corpus size.
    * p50/p90/p99 are discrete ceil-rank quantiles read off the
    * cumulative histogram with ALL-INTEGER rank comparisons
    * (100·cum ≥ p·N — no double product to straddle an ulp). The
    * cumulative window runs over the bounded histogram, never facts.
    */
  /** The q172 timing-grid histogram over any frame with
    * event_type/value — the reference sketch's fixed footprint (exact
    * 1 ms cells < 1024, 16 ms cells to 30 s, one overflow cell:
    * ≤ 2 838 cells/type FOREVER). Shared with the streaming twin
    * ([[graft.streaming.TimingStream]]) so batch and live tables
    * cannot drift; counts are associative, so micro-batching cannot
    * change them.
    */
  private[graft] def timingHistOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    raw.select(col("event_type"), floor(col("value") * 1000).as("ms"))
      .withColumn("b",
        when(col("ms") < 1024, col("ms"))
          .when(col("ms") < 30000, expr("(ms div 16) * 16"))
          .otherwise(lit(30000L)))
      .groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** The same histogram keyed additionally by day — the retention key
    * of the TTL'd stored form ([[graft.sources.TimingStoreLayout]]
    * `foldDaily`/`expireBefore`): an additive sketch cannot subtract a
    * batch, so expiry drops whole day-windows of cells instead.
    */
  private[graft] def timingHistByDayOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    raw.select(col("event_type"),
        expr("ts_ns div 86400000000000").as("di"),
        floor(col("value") * 1000).as("ms"))
      .withColumn("b",
        when(col("ms") < 1024, col("ms"))
          .when(col("ms") < 30000, expr("(ms div 16) * 16"))
          .otherwise(lit(30000L)))
      .groupBy(col("di"), col("event_type"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** The shared q172 quantile finale over ANY (event_type, b, c)
    * timing histogram — the read the batch query, the live
    * `TimingStream` sink, and the stored
    * [[graft.sources.TimingStoreLayout]] leg (q193) all run, so the
    * three legs cannot drift. The cumulative window runs over the
    * sketch-bounded histogram (≤ 2 838 cells/type), never facts.
    */
  private[graft] def timingQuantilesFrom(
      hist: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = hist.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(
        Window.partitionBy(col("event_type")).orderBy(col("b"))))
      .join(broadcast(tot), "event_type")
    cum.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") * 2 >= col("n"), col("b"))).as("p50_ms"),
        min(when(col("cum") * 10 >= col("n") * 9, col("b"))).as("p90_ms"),
        min(when(col("cum") * 100 >= col("n") * 99, col("b")))
          .as("p99_ms"))
      .orderBy(col("event_type"))
  }

  val q172 = Q(
    "q172_quantile_timing",
    (spark, dir) =>
      timingQuantilesFrom(timingHistOf(Tables(spark, dir, "events"))),
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(FLOOR(value * 1000) AS BIGINT) AS ms
                 FROM events),
      eb AS (SELECT event_type,
                    CASE WHEN ms < 1024 THEN ms
                         WHEN ms < 30000 THEN (ms // 16) * 16
                         ELSE 30000 END AS b
             FROM e),
      hist AS (SELECT event_type, b, COUNT(*) AS c FROM eb GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
              FROM hist GROUP BY 1),
      cum AS (SELECT h.event_type, h.b, t.n,
                     CAST(SUM(h.c) OVER (PARTITION BY h.event_type
                                         ORDER BY h.b) AS BIGINT) AS cum
              FROM hist h JOIN tot t USING (event_type))
      SELECT event_type, MAX(n) AS n,
             MIN(CASE WHEN cum * 2 >= n THEN b END) AS p50_ms,
             MIN(CASE WHEN cum * 10 >= n * 9 THEN b END) AS p90_ms,
             MIN(CASE WHEN cum * 100 >= n * 99 THEN b END) AS p99_ms
      FROM cum GROUP BY event_type ORDER BY event_type"""))

  /** The rest of the time-decay family (ClickHouse
    * `exponentialTimeDecayedCount`/`Avg`/`Max` analogs, completing
    * q169's Sum): same sequentially-multiplied weight table (never
    * pow/exp — each step a correctly-rounded IEEE product, so the
    * chain is bit-identical cross-engine), same 6-dp quantize +
    * decimal-accumulate discipline. decayed_count = Σ w_k over days
    * present; decayed_avg = the ONE IEEE divide of the two exact
    * decimal sums (identical operands → identical quotient);
    * decayed_max = max over the 6-dp per-day terms (comparison is
    * exact). Facts collapse to the day summary first; weights and the
    * 1-row max-day frame ride broadcast.
    */
  val q173 = Q(
    "q173_time_decayed_family",
    (spark, dir) => {
      import spark.implicits._
      val ws = Iterator.iterate(1.0)(_ * 0.9).take(61).toSeq
      val weights = ws.zipWithIndex.map { case (w, k) => (k.toLong, w) }
        .toDF("k", "w")
      val daily = Tables(spark, dir, "events")
        .groupBy(col("event_type"),
          expr("ts_ns div 86400000000000").as("di"))
        .agg(count(lit(1)).as("c"))
      val top = daily.agg(max(col("di")).as("dmax"))
      daily.crossJoin(broadcast(top))
        .withColumn("k", col("dmax") - col("di"))
        .join(broadcast(weights), "k")
        .select(col("event_type"),
          round(col("c").cast("double") * col("w"), 6).as("t"),
          round(col("w"), 6).as("wq"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("t").cast("decimal(38,6)")).as("ds"),
          sum(col("wq").cast("decimal(38,6)")).as("dc"),
          max(col("t")).as("decayed_max"))
        .select(col("event_type"), col("n_days"),
          col("dc").cast("double").as("decayed_count"),
          round(col("ds").cast("double") / col("dc").cast("double"), 6)
            .as("decayed_avg"),
          col("decayed_max"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH RECURSIVE wt AS (
        SELECT 0 AS k, CAST(1.0 AS DOUBLE) AS w
        UNION ALL SELECT k + 1, w * 0.9 FROM wt WHERE k < 60),
      daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS di,
                       COUNT(*) AS c
                FROM events GROUP BY 1, 2),
      top AS (SELECT MAX(di) AS dmax FROM daily),
      t AS (SELECT d.event_type,
                   ROUND(CAST(d.c AS DOUBLE) * wt.w, 6) AS t,
                   ROUND(wt.w, 6) AS wq
            FROM daily d CROSS JOIN top
            JOIN wt ON wt.k = top.dmax - d.di)
      SELECT event_type, COUNT(*) AS n_days,
             CAST(SUM(CAST(wq AS DECIMAL(38,6))) AS DOUBLE) AS decayed_count,
             ROUND(CAST(SUM(CAST(t AS DECIMAL(38,6))) AS DOUBLE)
                   / CAST(SUM(CAST(wq AS DECIMAL(38,6))) AS DOUBLE), 6)
               AS decayed_avg,
             MAX(t) AS decayed_max
      FROM t GROUP BY event_type ORDER BY event_type"""))

  /** Per-type props keys present on EVERY active day (ClickHouse
    * `groupArrayIntersect` analog — the intersection of per-day key
    * sets, answered without materializing any per-day array): facts
    * dedupe to (type, day, key) triples, a key's day-coverage count
    * equals the type's active-day count iff the key is in every day's
    * set. Both counts come from keyed aggregates; the day-count frame
    * (≤ types rows) rides broadcast; the result array is
    * canonically sorted and comma-serialized (the q151 discipline).
    * Types where no key spans every day still report with n_common=0.
    */
  val q174 = Q(
    "q174_common_props_keys",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
        .select(col("event_type"),
          expr("ts_ns div 86400000000000").as("di"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
            .as("k"))
        .filter(col("k").isNotNull)
      val perKey = e.groupBy(col("event_type"), col("k"))
        .agg(countDistinct(col("di")).as("kd"))
      val days = e.groupBy(col("event_type"))
        .agg(countDistinct(col("di")).as("n_days"))
      val common = perKey.join(broadcast(days), "event_type")
        .filter(col("kd") === col("n_days"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_common"),
          concat_ws(",",
            expr("transform(sort_array(collect_list(k))," +
              " x -> cast(x as string))")).as("common_keys"))
      days.join(broadcast(common), Seq("event_type"), "left")
        .na.fill(0L, Seq("n_common")).na.fill("", Seq("common_keys"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (SELECT DISTINCT event_type,
                        epoch_us(ts) // 86400000000 AS di,
                        CAST(regexp_extract(props, '"k": (\d+)', 1)
                             AS BIGINT) AS k
                 FROM events
                 WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
                   AND regexp_extract(props, '"k": (\d+)', 1) <> ''),
      perkey AS (SELECT event_type, k, COUNT(DISTINCT di) AS kd
                 FROM e GROUP BY 1, 2),
      days AS (SELECT event_type, COUNT(DISTINCT di) AS n_days
               FROM e GROUP BY 1),
      common AS (SELECT p.event_type, COUNT(*) AS n_common,
                        string_agg(CAST(p.k AS VARCHAR), ','
                                   ORDER BY p.k) AS common_keys
                 FROM perkey p JOIN days d USING (event_type)
                 WHERE p.kd = d.n_days GROUP BY 1)
      SELECT d.event_type, d.n_days,
             COALESCE(c.n_common, 0) AS n_common,
             COALESCE(c.common_keys, '') AS common_keys
      FROM days d LEFT JOIN common c USING (event_type)
      ORDER BY d.event_type"""))

  /** Cohort retention triangle: users grouped by first-seen day, then
    * for each (cohort, day-offset) the count of cohort users active
    * that day and the retention ratio vs the cohort's day-0 size.
    * Facts dedupe to (user, day) presence, cohorts are a per-user min
    * (keyed aggregate), the join back runs co-partitioned ON USER ID —
    * the user dimension is corpus-sized at 100 TB so it must never
    * broadcast — and the triangle is calendar² rows, onto which the
    * day-0 base rides broadcast. The ratio is ONE IEEE divide of two
    * exact BIGINTs, rounded 6 dp (the q170 finale discipline).
    */
  val q175 = Q(
    "q175_cohort_retention",
    (spark, dir) => {
      val ud = Tables(spark, dir, "events")
        .select(col("user_id"),
          expr("ts_ns div 86400000000000").as("di"))
        .distinct()
      val cohorts = ud.groupBy(col("user_id"))
        .agg(min(col("di")).as("cohort"))
      val tri = ud.join(cohorts, "user_id")
        .groupBy(col("cohort"), (col("di") - col("cohort")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
      val base = tri.filter(col("day_offset") === 0)
        .select(col("cohort"), col("n_users").as("n0"))
      tri.join(broadcast(base), "cohort")
        .select(col("cohort").as("cohort_day"), col("day_offset"),
          col("n_users"),
          round(col("n_users").cast("double") / col("n0").cast("double"),
            6).as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""
      WITH ud AS (SELECT DISTINCT user_id,
                         epoch_us(ts) // 86400000000 AS di
                  FROM events),
      cohorts AS (SELECT user_id, MIN(di) AS cohort
                  FROM ud GROUP BY 1),
      tri AS (SELECT c.cohort, u.di - c.cohort AS day_offset,
                     COUNT(*) AS n_users
              FROM ud u JOIN cohorts c USING (user_id)
              GROUP BY 1, 2),
      base AS (SELECT cohort, n_users AS n0 FROM tri WHERE day_offset = 0)
      SELECT t.cohort AS cohort_day, t.day_offset, t.n_users,
             ROUND(CAST(t.n_users AS DOUBLE) / CAST(b.n0 AS DOUBLE), 6)
               AS retention
      FROM tri t JOIN base b USING (cohort)
      ORDER BY cohort_day, day_offset"""))

  /** Relative-error quantile sketch (DDSketch, Masson 2019 — the
    * Datadog `quantileDD` family): γ-geometric buckets guarantee a
    * 2% RELATIVE error at every quantile (γ = 1.02), unlike q161's
    * bf16 (fixed significand) or q172's timing sketch (fixed absolute
    * grid). The γ-power boundary table is built by SEQUENTIAL
    * correctly-rounded IEEE multiplication in both engines (the q169
    * discipline — pow/log are libm and have no cross-engine bit
    * contract, so the log-bucket index is NEVER computed with log),
    * and bucketing is a range join of the boundary table against the
    * (type, ms) HISTOGRAM — facts collapse first, and the histogram
    * is bounded by the VALUE DOMAIN (≤ ~33k distinct ms here), not
    * corpus size, so the 643-row nested-loop probe runs on summary
    * rows at any scale. p50/p90/p99 are discrete ceil-rank reads with
    * all-integer rank comparisons; the estimate returned is the
    * bucket's exact lower boundary from the shared chain.
    */
  /** The q176 γ-power boundary table (γ^k for k=0..642 by sequential
    * correctly-rounded multiplication — one chain, both engines;
    * adjacent (lo, hi) pairs share chain values exactly).
    */
  private[graft] def ddBounds(spark: SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val pows = Iterator.iterate(1.0)(_ * 1.02).take(644).toSeq
    pows.zip(pows.tail).zipWithIndex
      .map { case ((lo, hi), k) => (k.toLong, lo, hi) }
      .toDF("k", "lo", "hi")
  }

  /** The q176 DDSketch bucket table over any frame with
    * event_type/value: collapse to the domain-bounded (type, ms)
    * histogram, then range-probe the broadcast γ-power table. Cell
    * space is ≤ 643 γ-buckets/type FOREVER — shared with the
    * streaming twin ([[graft.streaming.DdStream]]).
    */
  private[graft] def ddBucketsOf(raw: org.apache.spark.sql.DataFrame,
      bounds: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    raw.select(col("event_type"),
        greatest(floor(col("value") * 1000), lit(1L)).as("ms"))
      .groupBy(col("event_type"), col("ms"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(bounds),
        col("ms").cast("double") >= col("lo") &&
          col("ms").cast("double") < col("hi"))
      .groupBy(col("event_type"), col("k"), col("lo"))
      .agg(sum(col("c")).as("c"))

  /** The same γ-bucket table keyed additionally by day — the
    * retention key of the TTL'd stored form
    * ([[graft.sources.DdStoreLayout]] `foldDaily`/`expireBefore`,
    * mirroring [[timingHistByDayOf]]): an additive sketch cannot
    * subtract a batch, so expiry drops whole day-windows of cells.
    * Cells stay ≤ 643 per type per retained day.
    */
  private[graft] def ddBucketsByDayOf(raw: org.apache.spark.sql.DataFrame,
      bounds: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    raw.select(col("event_type"),
        expr("ts_ns div 86400000000000").as("di"),
        greatest(floor(col("value") * 1000), lit(1L)).as("ms"))
      .groupBy(col("di"), col("event_type"), col("ms"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(bounds),
        col("ms").cast("double") >= col("lo") &&
          col("ms").cast("double") < col("hi"))
      .groupBy(col("di"), col("event_type"), col("k"), col("lo"))
      .agg(sum(col("c")).as("c"))

  /** Row-level γ-bucket assignment — the DD "insert path" the
    * streaming twin uses (Structured Streaming allows ONE aggregation,
    * so the live form cannot pre-collapse to the ms histogram the way
    * the batch plan does): each row range-probes the broadcast
    * boundary table, the single stateful aggregation is the grouped
    * count over the ≤ 643-cell/type space. Batch ≡ stream by
    * construction (same bucketing, associative counts) — spec-pinned.
    */
  private[graft] def ddBucketRowsOf(raw: org.apache.spark.sql.DataFrame,
      bounds: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    raw.select(col("event_type"),
        greatest(floor(col("value") * 1000), lit(1L)).as("ms"))
      .join(broadcast(bounds),
        col("ms").cast("double") >= col("lo") &&
          col("ms").cast("double") < col("hi"))
      .select(col("event_type"), col("k"), col("lo"))

  /** The shared q176 quantile finale over ANY (event_type, k, lo, c)
    * γ-bucket table — the read the batch query, the live `DdStream`
    * sink, the q184 partial merge, and the stored
    * [[graft.sources.DdStoreLayout]] leg (q194) all run, so the legs
    * cannot drift. The cumulative window runs over the sketch-bounded
    * bucket table (≤ 643 cells/type), never facts.
    */
  private[graft] def ddQuantilesFrom(
      bucketed: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = bucketed.groupBy(col("event_type"))
      .agg(sum(col("c")).as("n"))
    val cum = bucketed.withColumn("cum",
      sum(col("c")).over(
        Window.partitionBy(col("event_type")).orderBy(col("k"))))
      .join(broadcast(tot), "event_type")
    cum.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") * 2 >= col("n"), col("lo"))).as("p50_est"),
        min(when(col("cum") * 10 >= col("n") * 9, col("lo")))
          .as("p90_est"),
        min(when(col("cum") * 100 >= col("n") * 99, col("lo")))
          .as("p99_est"))
      .orderBy(col("event_type"))
  }

  val q176 = Q(
    "q176_ddsketch_quantiles",
    (spark, dir) =>
      ddQuantilesFrom(ddBucketsOf(Tables(spark, dir, "events"),
        ddBounds(spark))),
    Some("""
      WITH RECURSIVE pw AS (
        SELECT 0 AS k, CAST(1.0 AS DOUBLE) AS lo
        UNION ALL SELECT k + 1, lo * 1.02 FROM pw WHERE k < 643),
      bounds AS (SELECT a.k, a.lo, b.lo AS hi
                 FROM pw a JOIN pw b ON b.k = a.k + 1),
      hist AS (SELECT event_type,
                      GREATEST(CAST(FLOOR(value * 1000) AS BIGINT), 1)
                        AS ms,
                      COUNT(*) AS c
               FROM events GROUP BY 1, 2),
      bk AS (SELECT h.event_type, b.k, b.lo, CAST(SUM(h.c) AS BIGINT) AS c
             FROM hist h JOIN bounds b
               ON CAST(h.ms AS DOUBLE) >= b.lo
              AND CAST(h.ms AS DOUBLE) < b.hi
             GROUP BY 1, 2, 3),
      tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
              FROM bk GROUP BY 1),
      cum AS (SELECT b.event_type, b.k, b.lo, t.n,
                     CAST(SUM(b.c) OVER (PARTITION BY b.event_type
                                         ORDER BY b.k) AS BIGINT) AS cum
              FROM bk b JOIN tot t USING (event_type))
      SELECT event_type, MAX(n) AS n,
             MIN(CASE WHEN cum * 2 >= n THEN lo END) AS p50_est,
             MIN(CASE WHEN cum * 10 >= n * 9 THEN lo END) AS p90_est,
             MIN(CASE WHEN cum * 100 >= n * 99 THEN lo END) AS p99_est
      FROM cum GROUP BY event_type ORDER BY event_type"""))

  /** CUSUM change-point detection over the per-type daily-count
    * series (Page 1954 — the sequential drift leg beside the q91
    * distributional χ²): deviations are the q168 n-scaled EXACT
    * integers d_i = n·c_i − S (clears the fractional mean), and the
    * one-sided CUSUM statistics use the prefix identity
    * s⁺_i = C_i − min_{j≤i} C_j  (and s⁻ mirrored with max), so the
    * sequential max(0, ·) recurrence becomes two window prefixes over
    * the CALENDAR-BOUNDED day series — no serial fold, no UDF, exact
    * BIGINTs end to end. Reports each side's peak statistic and day,
    * and the first alarm day at threshold h = 2·S (first day the
    * cumulative one-sided excess reaches 2/n of total mass, scaled);
    * NULL when never reached.
    */
  /** The q177 CUSUM finale over ANY (event_type, di, c) day-series
    * frame — shared with the streaming twin (the live
    * `SeriesStream.dailyCounts` table composes with this as a
    * downstream read, spec-pinned ≡ batch), so the two forms cannot
    * drift. Windows run over calendar-bounded summary rows only.
    */
  private[graft] def cusumFromDaily(daily: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
    val wAll = Window.partitionBy(col("event_type"))
    val dev = daily.join(broadcast(st), "event_type")
      .withColumn("d", col("n") * col("c") - col("s"))
      .withColumn("cc", sum(col("d")).over(w))
      .withColumn("sp", col("cc") - min(col("cc")).over(w))
      .withColumn("sn", max(col("cc")).over(w) - col("cc"))
      .withColumn("msp", max(col("sp")).over(wAll))
      .withColumn("msn", max(col("sn")).over(wAll))
    dev.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_days"),
        max(col("sp")).as("max_pos_stat"),
        min(when(col("sp") === col("msp"), col("di")))
          .as("pos_peak_day"),
        max(col("sn")).as("max_neg_stat"),
        min(when(col("sn") === col("msn"), col("di")))
          .as("neg_peak_day"),
        min(when(col("sp") >= lit(2) * col("s"), col("di")))
          .as("first_alarm_day"))
      .orderBy(col("event_type"))
  }

  val q177 = Q(
    "q177_cusum_changepoint",
    (spark, dir) =>
      cusumFromDaily(Tables(spark, dir, "events")
        .groupBy(col("event_type"),
          expr("ts_ns div 86400000000000").as("di"))
        .agg(count(lit(1)).as("c"))),
    Some("""
      WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS di,
                            COUNT(*) AS c
                     FROM events GROUP BY 1, 2),
      st AS (SELECT event_type, COUNT(*) AS n,
                    CAST(SUM(c) AS BIGINT) AS s
             FROM daily GROUP BY 1),
      dev AS (SELECT d.event_type, d.di, st.n, st.s,
                     st.n * d.c - st.s AS d
              FROM daily d JOIN st USING (event_type)),
      cc AS (SELECT event_type, di, n, s,
                    CAST(SUM(d) OVER (PARTITION BY event_type
                                      ORDER BY di) AS BIGINT) AS cc
             FROM dev),
      cus AS (SELECT event_type, di, n, s,
                     cc - CAST(MIN(cc) OVER w AS BIGINT) AS sp,
                     CAST(MAX(cc) OVER w AS BIGINT) - cc AS sn
              FROM cc
              WINDOW w AS (PARTITION BY event_type ORDER BY di)),
      pk AS (SELECT event_type, di, n, s, sp, sn,
                    MAX(sp) OVER (PARTITION BY event_type) AS msp,
                    MAX(sn) OVER (PARTITION BY event_type) AS msn
             FROM cus)
      SELECT event_type, MAX(n) AS n_days,
             MAX(sp) AS max_pos_stat,
             MIN(CASE WHEN sp = msp THEN di END) AS pos_peak_day,
             MAX(sn) AS max_neg_stat,
             MIN(CASE WHEN sn = msn THEN di END) AS neg_peak_day,
             MIN(CASE WHEN sp >= 2 * s THEN di END) AS first_alarm_day
      FROM pk GROUP BY event_type ORDER BY event_type"""))

  /** Benford first-significant-digit audit (Newcomb 1881/Benford 1938
    * — the fabricated-data screen, a governance leg beside q134/q102):
    * the first digit of floor(value·100) is extracted through the
    * DECIMAL STRING of the exact integer (both engines print a BIGINT
    * identically — no log10, which is libm and bucket-flips at
    * boundaries), counted per (type, digit), and scored χ² against
    * the Benford expectation with the log10(1+1/d) masses embedded as
    * 6-dp LITERALS shared by both engines. Each χ² term is a
    * fixed-order IEEE chain over exact counts, quantized 6 dp and
    * decimal-accumulated (the q148 discipline). Digit shares ride out
    * as a q151-style aligned serialization.
    */
  /** The q178 first-digit count table over any frame with
    * event_type/value — a grouped COUNT over the fixed ≤ 9·types key
    * space, shared with the streaming twin
    * ([[graft.streaming.BenfordStream]]) so the two forms cannot
    * drift.
    */
  private[graft] def digitCountsOf(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    raw.select(col("event_type"), floor(col("value") * 100).as("v"))
      .filter(col("v") >= 1)
      .select(col("event_type"),
        substring(col("v").cast("string"), 1, 1).cast("long")
          .as("digit"))
      .groupBy(col("event_type"), col("digit"))
      .agg(count(lit(1)).as("o"))

  /** The q178 χ²-vs-Benford finale over any (event_type, digit, o)
    * count table — the cheap downstream read a live digit table (or
    * the batch query) runs over its cells.
    */
  private[graft] def benfordFromCounts(
      counts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val benford = Seq(0.301030, 0.176091, 0.124939, 0.096910, 0.079181,
      0.066947, 0.057992, 0.051153, 0.045757).zipWithIndex
      .map { case (p, i) => ((i + 1).toLong, p) }.toDF("digit", "p")
    val tot = counts.groupBy(col("event_type")).agg(sum(col("o")).as("n"))
    // every (type, digit) cell must exist for the χ² — scaffold the
    // 9-digit frame onto each type and fill absent observed counts
    val cells = tot.crossJoin(broadcast(benford))
      .join(broadcast(counts), Seq("event_type", "digit"), "left")
      .na.fill(0L, Seq("o"))
    cells
      .withColumn("term",
        round(
          (col("o").cast("double") - col("n").cast("double") * col("p")) *
            (col("o").cast("double") - col("n").cast("double") * col("p"))
            / (col("n").cast("double") * col("p")), 6))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        sum(col("term").cast("decimal(38,6)")).cast("double")
          .as("chi2"),
        concat_ws(",", expr(
          "transform(sort_array(collect_list(struct(digit, o)))," +
            " x -> cast(x.o as string))")).as("digit_counts"))
      .orderBy(col("event_type"))
  }

  val q178 = Q(
    "q178_benford_audit",
    (spark, dir) =>
      benfordFromCounts(digitCountsOf(Tables(spark, dir, "events"))),
    Some("""
      WITH benford AS (
        SELECT * FROM (VALUES (1, 0.301030), (2, 0.176091), (3, 0.124939),
          (4, 0.096910), (5, 0.079181), (6, 0.066947), (7, 0.057992),
          (8, 0.051153), (9, 0.045757)) AS t(digit, p)),
      d AS (SELECT event_type,
                   CAST(SUBSTRING(CAST(CAST(FLOOR(value * 100) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS BIGINT)
                     AS digit
            FROM events WHERE FLOOR(value * 100) >= 1),
      counts AS (SELECT event_type, digit, COUNT(*) AS o
                 FROM d GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS n
              FROM counts GROUP BY 1),
      cells AS (SELECT t.event_type, b.digit, CAST(b.p AS DOUBLE) AS p,
                       t.n, COALESCE(c.o, 0) AS o
                FROM tot t CROSS JOIN benford b
                LEFT JOIN counts c
                  ON c.event_type = t.event_type AND c.digit = b.digit),
      terms AS (SELECT event_type, digit, n, o,
                       ROUND((CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * p)
                             * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * p)
                             / (CAST(n AS DOUBLE) * p), 6) AS term
                FROM cells)
      SELECT event_type, MAX(n) AS n,
             CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS chi2,
             string_agg(CAST(o AS VARCHAR), ',' ORDER BY digit)
               AS digit_counts
      FROM terms GROUP BY event_type ORDER BY event_type"""))

  /** Interpolated exact quantiles under BOTH ClickHouse conventions
    * (`quantilesExactExclusive` = Hyndman-Fan type 6 / Excel
    * PERCENTILE.EXC, and `quantilesExactInclusive` = type 7 /
    * PERCENTILE.INC) — completing the quantile family (q122 discrete,
    * q161 bf16, q172 timing, q176 DDSketch) with the two conventions
    * real consumers actually disagree about. The linear interpolation
    * is EXACT: p ∈ {¼,½,¾} makes the rank h a quarter-integer, so
    * h·4 is a BIGINT, the interpolated value is
    * res·4 = 4·x_idx + (h4 mod 4)·(x_{idx+1} − x_idx) — all integers —
    * and the final /4 is an exact binary scale. Order statistics come
    * from the value histogram by cumulative rank (min b with cum ≥ r);
    * only the ≤12 needed ranks per type are ever looked up, and every
    * frame past the first aggregate is summary-sized.
    */
  val q181 = Q(
    "q181_quantiles_exc_inc",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val hist = Tables(spark, dir, "events")
        .select(col("event_type"), floor(col("value") * 1000).as("ms"))
        .groupBy(col("event_type"), col("ms"))
        .agg(count(lit(1)).as("c"))
      val tot = hist.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
      val specs = Seq(("exc", 1L), ("exc", 2L), ("exc", 3L),
        ("inc", 1L), ("inc", 2L), ("inc", 3L)).toDF("conv", "k")
      val sp = tot.crossJoin(broadcast(specs))
        .withColumn("h4",
          when(col("conv") === "exc", col("k") * (col("n") + 1))
            .otherwise(lit(4L) + col("k") * (col("n") - 1)))
        .withColumn("h4c",
          when(col("h4") < 4, lit(4L))
            .when(col("h4") > col("n") * 4, col("n") * 4)
            .otherwise(col("h4")))
        .withColumn("idx", expr("h4c div 4"))
        .withColumn("frac4", expr("h4c % 4"))
        .withColumn("idx2", least(col("idx") + 1, col("n")))
      val ranks = sp.select(col("event_type"), col("idx").as("r"))
        .unionByName(sp.select(col("event_type"), col("idx2").as("r")))
        .distinct()
      val cum = hist.withColumn("cum",
        sum(col("c")).over(
          Window.partitionBy(col("event_type")).orderBy(col("ms"))))
      val xval = cum
        .join(broadcast(ranks.select(col("event_type").as("rt"),
          col("r"))),
          col("event_type") === col("rt") && col("cum") >= col("r"))
        .groupBy(col("event_type"), col("r"))
        .agg(min(col("ms")).as("x"))
      val joined = sp
        .join(broadcast(xval.select(col("event_type").as("t1"),
          col("r").as("r1"), col("x").as("x1"))),
          col("event_type") === col("t1") && col("idx") === col("r1"))
        .join(broadcast(xval.select(col("event_type").as("t2"),
          col("r").as("r2"), col("x").as("x2"))),
          col("event_type") === col("t2") && col("idx2") === col("r2"))
        .withColumn("res",
          (col("x1") * 4 + col("frac4") * (col("x2") - col("x1")))
            .cast("double") / lit(4.0))
      joined.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          min(when(col("conv") === "exc" && col("k") === 1, col("res")))
            .as("p25_exc"),
          min(when(col("conv") === "exc" && col("k") === 2, col("res")))
            .as("p50_exc"),
          min(when(col("conv") === "exc" && col("k") === 3, col("res")))
            .as("p75_exc"),
          min(when(col("conv") === "inc" && col("k") === 1, col("res")))
            .as("p25_inc"),
          min(when(col("conv") === "inc" && col("k") === 2, col("res")))
            .as("p50_inc"),
          min(when(col("conv") === "inc" && col("k") === 3, col("res")))
            .as("p75_inc"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH hist AS (SELECT event_type,
                           CAST(FLOOR(value * 1000) AS BIGINT) AS ms,
                           COUNT(*) AS c
                    FROM events GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
              FROM hist GROUP BY 1),
      specs AS (SELECT * FROM (VALUES ('exc', 1), ('exc', 2), ('exc', 3),
                ('inc', 1), ('inc', 2), ('inc', 3)) AS t(conv, k)),
      sp0 AS (SELECT t.event_type, t.n, s.conv, CAST(s.k AS BIGINT) AS k,
                     CASE WHEN s.conv = 'exc' THEN s.k * (t.n + 1)
                          ELSE 4 + s.k * (t.n - 1) END AS h4
              FROM tot t CROSS JOIN specs s),
      sp AS (SELECT event_type, n, conv, k,
                    CASE WHEN h4 < 4 THEN 4
                         WHEN h4 > n * 4 THEN n * 4
                         ELSE h4 END // 4 AS idx,
                    CASE WHEN h4 < 4 THEN 4
                         WHEN h4 > n * 4 THEN n * 4
                         ELSE h4 END % 4 AS frac4
             FROM sp0),
      sp2 AS (SELECT *, LEAST(idx + 1, n) AS idx2 FROM sp),
      ranks AS (SELECT DISTINCT event_type, idx AS r FROM sp2
                UNION SELECT DISTINCT event_type, idx2 AS r FROM sp2),
      cum AS (SELECT event_type, ms,
                     CAST(SUM(c) OVER (PARTITION BY event_type
                                       ORDER BY ms) AS BIGINT) AS cum
              FROM hist),
      xval AS (SELECT c.event_type, r.r, MIN(c.ms) AS x
               FROM cum c JOIN ranks r
                 ON r.event_type = c.event_type AND c.cum >= r.r
               GROUP BY 1, 2),
      j AS (SELECT s.event_type, s.n, s.conv, s.k,
                   CAST(a.x * 4 + s.frac4 * (b.x - a.x) AS DOUBLE) / 4.0
                     AS res
            FROM sp2 s
            JOIN xval a ON a.event_type = s.event_type AND a.r = s.idx
            JOIN xval b ON b.event_type = s.event_type AND b.r = s.idx2)
      SELECT event_type, MAX(n) AS n,
             MIN(CASE WHEN conv = 'exc' AND k = 1 THEN res END) AS p25_exc,
             MIN(CASE WHEN conv = 'exc' AND k = 2 THEN res END) AS p50_exc,
             MIN(CASE WHEN conv = 'exc' AND k = 3 THEN res END) AS p75_exc,
             MIN(CASE WHEN conv = 'inc' AND k = 1 THEN res END) AS p25_inc,
             MIN(CASE WHEN conv = 'inc' AND k = 2 THEN res END) AS p50_inc,
             MIN(CASE WHEN conv = 'inc' AND k = 3 THEN res END) AS p75_inc
      FROM j GROUP BY event_type ORDER BY event_type"""))

  /** DD-sketch partial merge (ClickHouse's `-State`/`-Merge` combinator
    * pair over `quantileDD`, and the shape every production sketch
    * store runs): each day builds its OWN γ-bucket sketch (the
    * partial), the all-time per-type quantile is answered by MERGING
    * the partials — cell-wise count addition, never re-touching facts —
    * and the answer is EXACTLY q176's direct-build result because
    * bucket assignment is per-row and counts are associative. The
    * merge input is ≤ 643 cells × days per type at ANY corpus size, so
    * re-aggregation cost is calendar-bounded; `n_sketches` stamps how
    * many partials merged. Facts collapse to the (type, day, ms)
    * histogram BEFORE the broadcast range probe, exactly like q176.
    */
  val q184 = Q(
    "q184_ddsketch_merge",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bounds = ddBounds(spark)
      val part = Tables(spark, dir, "events")
        .select(col("event_type"),
          expr("ts_ns div 86400000000000").as("di"),
          greatest(floor(col("value") * 1000), lit(1L)).as("ms"))
        .groupBy(col("event_type"), col("di"), col("ms"))
        .agg(count(lit(1)).as("c"))
        .join(broadcast(bounds),
          col("ms").cast("double") >= col("lo") &&
            col("ms").cast("double") < col("hi"))
        .groupBy(col("event_type"), col("di"), col("k"), col("lo"))
        .agg(sum(col("c")).as("c"))
      // -Merge: cell-wise addition over the partial sketches only
      val merged = part.groupBy(col("event_type"), col("k"), col("lo"))
        .agg(sum(col("c")).as("c"))
      val nSk = part.select(col("event_type"), col("di")).distinct()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sketches"))
      val tot = merged.groupBy(col("event_type"))
        .agg(sum(col("c")).as("n"))
      merged
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("event_type")).orderBy(col("k"))))
        .join(broadcast(tot), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          min(when(col("cum") * 2 >= col("n"), col("lo"))).as("p50_est"),
          min(when(col("cum") * 10 >= col("n") * 9, col("lo")))
            .as("p90_est"),
          min(when(col("cum") * 100 >= col("n") * 99, col("lo")))
            .as("p99_est"))
        .join(broadcast(nSk), "event_type")
        .select(col("event_type"), col("n_sketches"), col("n"),
          col("p50_est"), col("p90_est"), col("p99_est"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH RECURSIVE pw AS (
        SELECT 0 AS k, CAST(1.0 AS DOUBLE) AS lo
        UNION ALL SELECT k + 1, lo * 1.02 FROM pw WHERE k < 643),
      bounds AS (SELECT a.k, a.lo, b.lo AS hi
                 FROM pw a JOIN pw b ON b.k = a.k + 1),
      hist AS (SELECT event_type,
                      ts_ns // 86400000000000 AS di,
                      GREATEST(CAST(FLOOR(value * 1000) AS BIGINT), 1)
                        AS ms,
                      COUNT(*) AS c
               FROM (SELECT event_type, value,
                            epoch_ns(ts) AS ts_ns FROM events)
               GROUP BY 1, 2, 3),
      part AS (SELECT h.event_type, h.di, b.k, b.lo,
                      CAST(SUM(h.c) AS BIGINT) AS c
               FROM hist h JOIN bounds b
                 ON CAST(h.ms AS DOUBLE) >= b.lo
                AND CAST(h.ms AS DOUBLE) < b.hi
               GROUP BY 1, 2, 3, 4),
      merged AS (SELECT event_type, k, lo, CAST(SUM(c) AS BIGINT) AS c
                 FROM part GROUP BY 1, 2, 3),
      nsk AS (SELECT event_type, COUNT(DISTINCT di) AS n_sketches
              FROM part GROUP BY 1),
      tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
              FROM merged GROUP BY 1),
      cum AS (SELECT m.event_type, m.k, m.lo, t.n,
                     CAST(SUM(m.c) OVER (PARTITION BY m.event_type
                                         ORDER BY m.k) AS BIGINT) AS cum
              FROM merged m JOIN tot t USING (event_type)),
      fin AS (SELECT event_type, MAX(n) AS n,
                     MIN(CASE WHEN cum * 2 >= n THEN lo END) AS p50_est,
                     MIN(CASE WHEN cum * 10 >= n * 9 THEN lo END)
                       AS p90_est,
                     MIN(CASE WHEN cum * 100 >= n * 99 THEN lo END)
                       AS p99_est
              FROM cum GROUP BY event_type)
      SELECT f.event_type, s.n_sketches, f.n, f.p50_est, f.p90_est,
             f.p99_est
      FROM fin f JOIN nsk s USING (event_type)
      ORDER BY f.event_type"""))

  /** l-diversity release audit (Machanavajjhala 2007 — the companion
    * governance metric to q134's k-anonymity: a class can be large
    * enough to pass k yet leak because every member shares one
    * sensitive value): equivalence classes are (event_type, day), the
    * sensitive attribute is the props payload; a class with fewer
    * than l = 3 DISTINCT sensitive values is violating, and its rows
    * are at risk. One (type, day, props) collapse (the only fact-sized
    * shuffle), then summary-sized distinct/row counts and a per-type
    * rollup — exact BIGINTs end to end.
    */
  val q189 = Q(
    "q189_l_diversity",
    (spark, dir) => {
      val l = 3
      val cls = Tables(spark, dir, "events")
        .groupBy(col("event_type"),
          expr("ts_ns div 86400000000000").as("di"), col("props"))
        .agg(count(lit(1)).as("n"))
      val div = cls.groupBy(col("event_type"), col("di"))
        .agg(count(lit(1)).as("n_distinct"), sum(col("n")).as("n_rows"))
      div.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("n_distinct") < l, 1L).otherwise(0L))
            .as("n_violating"),
          sum(when(col("n_distinct") < l, col("n_rows")).otherwise(0L))
            .as("rows_at_risk"),
          min(col("n_distinct")).as("min_diversity"),
          sum(col("n_rows")).as("n_rows"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS di,
                        props, COUNT(*) AS n
                 FROM events GROUP BY 1, 2, 3),
      d AS (SELECT event_type, di, COUNT(*) AS n_distinct,
                   CAST(SUM(n) AS BIGINT) AS n_rows
            FROM c GROUP BY 1, 2)
      SELECT event_type, COUNT(*) AS n_classes,
             CAST(SUM(CASE WHEN n_distinct < 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
             CAST(SUM(CASE WHEN n_distinct < 3 THEN n_rows ELSE 0 END)
               AS BIGINT) AS rows_at_risk,
             MIN(n_distinct) AS min_diversity,
             CAST(SUM(n_rows) AS BIGINT) AS n_rows
      FROM d GROUP BY event_type ORDER BY event_type"""))

  /** t-closeness release audit (Li 2007 — the third of the privacy
    * trio: q134 k-anonymity bounds class SIZE, q189 l-diversity bounds
    * sensitive VARIETY, this bounds sensitive SKEW: a class whose
    * sensitive distribution sits far from the table-wide one leaks
    * even when diverse). Classes are (event_type, day), the sensitive
    * attribute the ordered props k-bucket (q148's kb); distance is the
    * ordered-attribute Earth Mover's Distance, which in 1-D is the
    * normalized L1 of CDF differences — and THAT is computable EXACTLY:
    * the per-bucket term |cumC·N − cumG·n| is an integer (products in
    * decimal(38,0) so 100 TB-scale counts cannot overflow), the sum is
    * exact, and EMD = Σ/(n·N·(m−1)) is ONE final divide of identical
    * operands cross-engine (NULL when the type has a single bucket).
    * Everything past the one fact-sized (type, day, kb) collapse runs
    * on summary rows: global CDFs are ≤10 rows/type, class scaffolds
    * classes × ≤10 buckets, windows order bounded bucket domains.
    * Violating at t = 0.3.
    */
  val q191 = Q(
    "q191_t_closeness",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cls = Tables(spark, dir, "events")
        .select(col("event_type"),
          expr("ts_ns div 86400000000000").as("di"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
            .as("k"))
        .filter(col("k").isNotNull)
        .select(col("event_type"), col("di"), expr("k div 10").as("kb"))
        .groupBy(col("event_type"), col("di"), col("kb"))
        .agg(count(lit(1)).as("c"))
      val glob = cls.groupBy(col("event_type"), col("kb"))
        .agg(sum(col("c")).as("g"))
      val gStat = glob.groupBy(col("event_type"))
        .agg(sum(col("g")).as("nn"), count(lit(1)).as("m"))
      val gCdf = glob
        .withColumn("cg", sum(col("g")).over(
          Window.partitionBy(col("event_type")).orderBy(col("kb"))))
        .join(broadcast(gStat), "event_type")
      val clsTot = cls.groupBy(col("event_type"), col("di"))
        .agg(sum(col("c")).as("n"))
      val cells = clsTot
        .join(gCdf.select(col("event_type"), col("kb"), col("cg"),
          col("nn"), col("m")), "event_type")
        .join(cls, Seq("event_type", "di", "kb"), "left")
        .na.fill(0L, Seq("c"))
      val cdf = cells
        .withColumn("cc", sum(col("c")).over(
          Window.partitionBy(col("event_type"), col("di"))
            .orderBy(col("kb"))))
        .withColumn("term",
          abs(col("cc").cast("decimal(38,0)") * col("nn") -
            col("cg").cast("decimal(38,0)") * col("n")))
      val emd = cdf.groupBy(col("event_type"), col("di"))
        .agg(max(col("n")).as("n"), max(col("nn")).as("nn"),
          max(col("m")).as("m"), sum(col("term")).as("s"))
        .withColumn("emd",
          when(col("m") > 1,
            round(col("s").cast("double") /
              (col("n").cast("decimal(38,0)") * col("nn") *
                (col("m") - 1)).cast("double"), 6)))
      emd.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_classes"),
          max(col("emd")).as("max_emd"),
          sum(when(col("emd") > 0.3, 1L).otherwise(0L)).as("n_violating"),
          sum(when(col("emd") > 0.3, col("n")).otherwise(0L))
            .as("rows_at_risk"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH cls AS (SELECT event_type, epoch_us(ts) // 86400000000 AS di,
                          CAST(regexp_extract(props, '"k": (\d+)', 1)
                               AS BIGINT) // 10 AS kb,
                          COUNT(*) AS c
                   FROM events
                   WHERE regexp_extract(props, '"k": (\d+)', 1) <> ''
                   GROUP BY 1, 2, 3),
      gdist AS (SELECT event_type, kb, CAST(SUM(c) AS BIGINT) AS g
                FROM cls GROUP BY 1, 2),
      gstat AS (SELECT event_type, CAST(SUM(g) AS BIGINT) AS nn,
                       COUNT(*) AS m
                FROM gdist GROUP BY 1),
      gcdf AS (SELECT gl.event_type, gl.kb, s.nn, s.m,
                      CAST(SUM(gl.g) OVER (PARTITION BY gl.event_type
                                           ORDER BY gl.kb) AS BIGINT) AS cg
               FROM gdist gl JOIN gstat s USING (event_type)),
      ctot AS (SELECT event_type, di, CAST(SUM(c) AS BIGINT) AS n
               FROM cls GROUP BY 1, 2),
      cells AS (SELECT t.event_type, t.di, t.n, g.kb, g.cg, g.nn, g.m,
                       COALESCE(cl.c, 0) AS c
                FROM ctot t
                JOIN gcdf g USING (event_type)
                LEFT JOIN cls cl ON cl.event_type = t.event_type
                                AND cl.di = t.di AND cl.kb = g.kb),
      cdf AS (SELECT event_type, di, n, nn, m,
                     ABS(CAST(SUM(c) OVER (PARTITION BY event_type, di
                                           ORDER BY kb) AS HUGEINT) * nn
                         - CAST(cg AS HUGEINT) * n) AS term
              FROM cells),
      emd AS (SELECT event_type, di, MAX(n) AS n,
                     CASE WHEN MAX(m) > 1 THEN
                       ROUND(CAST(SUM(term) AS DOUBLE)
                             / CAST(CAST(MAX(n) AS HUGEINT) * MAX(nn)
                                    * (MAX(m) - 1) AS DOUBLE), 6)
                     END AS emd
              FROM cdf GROUP BY 1, 2)
      SELECT event_type, COUNT(*) AS n_classes, MAX(emd) AS max_emd,
             CAST(SUM(CASE WHEN emd > 0.3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
             CAST(SUM(CASE WHEN emd > 0.3 THEN n ELSE 0 END) AS BIGINT)
               AS rows_at_risk
      FROM emd GROUP BY event_type ORDER BY event_type"""))

  /** Population skewness and kurtosis (ClickHouse `skewPop`/`kurtPop`
    * analogs) — the 3rd/4th-moment completion of q162's two-moment
    * correlation discipline: values quantize to the exact integer
    * grid v = ⌊8·value⌋ (so moments are EXACT BIGINT sums — v⁴ stays
    * far under 2⁶³ at any realistic value domain), one grouped pass
    * accumulates n and Σv..Σv⁴, and the finale is a fixed-order IEEE
    * chain over identical exact operands in both engines: each mₖ is
    * ONE divide, σ³ is written var·√var (√ is correctly-rounded IEEE;
    * pow is libm and has no cross-engine bit contract — never used).
    * NULL on zero variance. One shuffle, 5-number state per type.
    * Domain contract (LOUD — VERDICT r13 #2): |v| ≤ 55 000 (so one
    * row's v⁴ ≤ 9.15e18 fits Int64; the whole-corpus Σ overflow errors
    * via ANSI in both engines rather than wrapping) — an out-of-domain
    * grid raises [[momentGuard]]'s widen-or-decimal message instead of
    * silently diverging.
    */
  private[graft] def skewKurtOf(
      events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val e = events
      .select(col("event_type"),
        momentGuard(floor(col("value") * 8).cast("long"), 55000L,
          "q195 skew/kurt v=floor(8*value) grid").as("v"))
    val g = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("v")).as("s1"),
      sum(col("v") * col("v")).as("s2"),
      sum(col("v") * col("v") * col("v")).as("s3"),
      sum(col("v") * col("v") * col("v") * col("v")).as("s4"))
    val nd = col("n").cast("double")
    val m1 = col("s1").cast("double") / nd
    val m2 = col("s2").cast("double") / nd
    val m3 = col("s3").cast("double") / nd
    val m4 = col("s4").cast("double") / nd
    val vr = m2 - m1 * m1
    g.select(col("event_type"), col("n"),
        round(vr, 6).as("var_pop"),
        when(vr <= 0.0, lit(null).cast("double"))
          .otherwise(round(
            (m3 - lit(3.0) * m1 * m2 + lit(2.0) * m1 * m1 * m1) /
              (vr * sqrt(vr)), 6)).as("skew_pop"),
        when(vr <= 0.0, lit(null).cast("double"))
          .otherwise(round(
            (m4 - lit(4.0) * m1 * m3 + lit(6.0) * m1 * m1 * m2 -
              lit(3.0) * m1 * m1 * m1 * m1) / (vr * vr), 6))
          .as("kurt_pop"))
      .orderBy(col("event_type"))
  }

  val q195 = Q(
    "q195_skew_kurt",
    (spark, dir) => skewKurtOf(Tables(spark, dir, "events")),
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(FLOOR(value * 8) AS BIGINT) AS v
                 FROM events),
      g AS (SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(v) AS BIGINT) AS s1,
                   CAST(SUM(v * v) AS BIGINT) AS s2,
                   CAST(SUM(v * v * v) AS BIGINT) AS s3,
                   CAST(SUM(v * v * v * v) AS BIGINT) AS s4
            FROM e GROUP BY 1),
      m AS (SELECT event_type, n,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                   CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
                   CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS m3,
                   CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS m4
            FROM g),
      v AS (SELECT *, m2 - m1 * m1 AS vr FROM m)
      SELECT event_type, n, ROUND(vr, 6) AS var_pop,
             CASE WHEN vr <= 0.0 THEN NULL
                  ELSE ROUND((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
                             / (vr * SQRT(vr)), 6) END AS skew_pop,
             CASE WHEN vr <= 0.0 THEN NULL
                  ELSE ROUND((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2
                              - 3.0 * m1 * m1 * m1 * m1)
                             / (vr * vr), 6) END AS kurt_pop
      FROM v ORDER BY event_type"""))

  /** Exact median and median absolute deviation (the robust
    * location/dispersion pair — ClickHouse `medianExact` + the MAD its
    * users derive; robust stats q195's moment pair is NOT): values on
    * the exact ms integer grid, median as the discrete ceil-rank read
    * (2·cum ≥ n, q172's p50 convention), then the DEVIATION histogram
    * |v − median| re-aggregated from the VALUE histogram (never from
    * facts — deviation cells ≤ value-domain cells) and MAD as the same
    * rank read over it. All-integer end to end; every window runs on
    * domain-bounded histograms partitioned by type; the median frame
    * rides broadcast (≤ types rows).
    */
  val q196 = Q(
    "q196_median_mad",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(spark, dir, "events")
        .select(col("event_type"),
          floor(col("value") * 1000).cast("long").as("v"))
      val hist = e.groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("c"))
      val tot = hist.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
      val wv = Window.partitionBy(col("event_type")).orderBy(col("v"))
      val med = hist.withColumn("cum", sum(col("c")).over(wv))
        .join(broadcast(tot), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          min(when(col("cum") * 2 >= col("n"), col("v"))).as("med"))
      val dev = hist.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("v") - col("med")).as("d"),
          col("c"))
        .groupBy(col("event_type"), col("d"))
        .agg(sum(col("c")).as("c"))
      val wd = Window.partitionBy(col("event_type")).orderBy(col("d"))
      dev.withColumn("cumd", sum(col("c")).over(wd))
        .join(broadcast(med), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), max(col("med")).as("median_ms"),
          min(when(col("cumd") * 2 >= col("n"), col("d"))).as("mad_ms"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(FLOOR(value * 1000) AS BIGINT) AS v
                 FROM events),
      hist AS (SELECT event_type, v, COUNT(*) AS c FROM e GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
              FROM hist GROUP BY 1),
      cum AS (SELECT h.event_type, h.v, t.n,
                     CAST(SUM(h.c) OVER (PARTITION BY h.event_type
                                         ORDER BY h.v) AS BIGINT) AS cum
              FROM hist h JOIN tot t USING (event_type)),
      med AS (SELECT event_type, MAX(n) AS n,
                     MIN(CASE WHEN cum * 2 >= n THEN v END) AS med
              FROM cum GROUP BY 1),
      dev AS (SELECT h.event_type, ABS(h.v - m.med) AS d,
                     CAST(SUM(h.c) AS BIGINT) AS c
              FROM hist h JOIN med m USING (event_type) GROUP BY 1, 2),
      cumd AS (SELECT d.event_type, d.d, m.n, m.med,
                      CAST(SUM(d.c) OVER (PARTITION BY d.event_type
                                          ORDER BY d.d) AS BIGINT) AS cum
               FROM dev d JOIN med m USING (event_type))
      SELECT event_type, MAX(n) AS n, MAX(med) AS median_ms,
             MIN(CASE WHEN cum * 2 >= n THEN d END) AS mad_ms
      FROM cumd GROUP BY 1 ORDER BY 1"""))

  /** Population and SAMPLE covariance (ClickHouse `covarPop` /
    * `covarSamp` analogs — q162 outputs correlations, never the
    * covariances themselves, and has no n−1 sample forms): the value
    * grid v=⌊8·value⌋ against the props-length metric, exact BIGINT
    * moment sums in one grouped pass, finale a fixed-order IEEE chain
    * over identical exact operands — covar_pop = Σxy/n − (Σx/n)(Σy/n)
    * as written, covar_samp = (Σxy − Σx·Σy/n)/(n−1) with the inner
    * divide FIRST in both engines, NULL when n < 2. One shuffle,
    * 4-number state per type. Domain contract (LOUD — VERDICT r13
    * #2): |x|, |y| ≤ 3e9 each (so one row's x·y ≤ 9e18 fits Int64;
    * the whole-corpus Σxy overflow errors via ANSI in both engines
    * rather than wrapping) — out-of-domain rows raise
    * [[momentGuard]]'s widen-or-decimal message.
    */
  private[graft] def covarianceOf(
      events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val xyMax = 3000000000L // per-factor bound: x*y <= 9e18 < 2^63
    val e = events
      .select(col("event_type"),
        momentGuard(floor(col("value") * 8).cast("long"), xyMax,
          "q198 covariance x=floor(8*value) grid").as("x"),
        momentGuard(length(col("props")).cast("long"), xyMax,
          "q198 covariance y=length(props)").as("y"))
    val g = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"))
    val nd = col("n").cast("double")
    val covPop = col("sxy").cast("double") / nd -
      (col("sx").cast("double") / nd) * (col("sy").cast("double") / nd)
    val covSamp = (col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double") / nd) /
      (nd - lit(1.0))
    g.select(col("event_type"), col("n"),
        round(covPop, 6).as("covar_pop"),
        when(col("n") < 2, lit(null).cast("double"))
          .otherwise(round(covSamp, 6)).as("covar_samp"))
      .orderBy(col("event_type"))
  }

  val q198 = Q(
    "q198_covariance",
    (spark, dir) => covarianceOf(Tables(spark, dir, "events")),
    Some("""
      WITH e AS (SELECT event_type,
                        CAST(FLOOR(value * 8) AS BIGINT) AS x,
                        CAST(LENGTH(props) AS BIGINT) AS y
                 FROM events),
      g AS (SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM e GROUP BY 1)
      SELECT event_type, n,
             ROUND(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                   - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               AS covar_pop,
             CASE WHEN n < 2 THEN NULL
                  ELSE ROUND((CAST(sxy AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n AS DOUBLE))
                             / (CAST(n AS DOUBLE) - 1.0), 6) END
               AS covar_samp
      FROM g ORDER BY event_type"""))

  // the day-windowed (TTL'd) timing store: built once per sf dir by
  // the full ledgered lifecycle — bootstrap fold, incremental fold, a
  // deliberately REPLAYED fold (ledger no-op), then EXPIRY of the
  // first 7 days via an atomic retain snapshot (StoreMemo: at most
  // one build, per-key serialized, temp dir cleaned at JVM exit)
  private def ttlTimingStoreOf(spark: SparkSession, dir: String): String =
    graft.sources.StoreMemo.tempStore(s"timingttl:$dir",
        "graft-timingttl-") { out =>
      val ev = graft.Tables(spark, dir, "events")
      val even = ev.filter(col("user_id") % 2 === 0)
      val odd = ev.filter(col("user_id") % 2 =!= 0)
      require(graft.sources.TimingStoreLayout
        .foldDaily(spark, out, "even-users", even))
      require(graft.sources.TimingStoreLayout
        .foldDaily(spark, out, "odd-users", odd))
      require(!graft.sources.TimingStoreLayout
        .foldDaily(spark, out, "odd-users", odd),
        "replayed fold must be a ledger no-op")
      val d0 = graft.sources.TimingStoreLayout.readDaily(spark, out)
        .agg(min(col("di"))).collect()(0).getLong(0)
      graft.sources.TimingStoreLayout.expireBefore(spark, out, d0 + 7)
    }

  /** RETENTION on an additive sketch store (the TTL discipline a
    * production count-sketch table runs — ClickHouse expires sketch
    * rows by TTL the same way): the q172 timing store keyed
    * additionally by day ([[graft.sources.TimingStoreLayout]]
    * `foldDaily`), built by the full ledgered lifecycle (bootstrap +
    * incremental + REPLAYED fold), then the first 7 days EXPIRED via
    * [[graft.sources.LedgerStore.retain]] — an atomic filtered
    * snapshot, because an additive table cannot subtract a batch but
    * drops whole day-windows of cells; the ledger keeps every applied
    * id so replaying an expired-window batch cannot resurrect dropped
    * counts. The answer is the shared quantile finale over the
    * surviving days and must equal the direct build over events with
    * day ≥ min+7 — the oracle replays exactly that.
    */
  val q197 = Q(
    "q197_timing_ttl",
    (spark, dir) =>
      timingQuantilesFrom(
        graft.sources.TimingStoreLayout
          .readDaily(spark, ttlTimingStoreOf(spark, dir))
          .groupBy(col("event_type"), col("b"))
          .agg(sum(col("c")).as("c"))),
    Some("""
      WITH e AS (SELECT event_type,
                        epoch_us(ts) // 86400000000 AS di,
                        CAST(FLOOR(value * 1000) AS BIGINT) AS ms
                 FROM events),
      m AS (SELECT MIN(di) AS d0 FROM e),
      kept AS (SELECT event_type, ms FROM e, m WHERE e.di >= m.d0 + 7),
      eb AS (SELECT event_type,
                    CASE WHEN ms < 1024 THEN ms
                         WHEN ms < 30000 THEN (ms // 16) * 16
                         ELSE 30000 END AS b
             FROM kept),
      hist AS (SELECT event_type, b, COUNT(*) AS c FROM eb GROUP BY 1, 2),
      tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
              FROM hist GROUP BY 1),
      cum AS (SELECT h.event_type, h.b, t.n,
                     CAST(SUM(h.c) OVER (PARTITION BY h.event_type
                                         ORDER BY h.b) AS BIGINT) AS cum
              FROM hist h JOIN tot t USING (event_type))
      SELECT event_type, MAX(n) AS n,
             MIN(CASE WHEN cum * 2 >= n THEN b END) AS p50_ms,
             MIN(CASE WHEN cum * 10 >= n * 9 THEN b END) AS p90_ms,
             MIN(CASE WHEN cum * 100 >= n * 99 THEN b END) AS p99_ms
      FROM cum GROUP BY event_type ORDER BY event_type"""))

  // one stored timing histogram / DD sketch per sf dir per JVM
  // (StoreMemo: at most one build, per-key serialized, temp dir
  // cleaned at JVM exit); both built by the real ledgered-fold
  // lifecycle — bootstrap fold, incremental fold, then a deliberate
  // REPLAY the ledger must turn into a no-op (a double-count would
  // move the quantile ranks and fail the oracle)
  private def ledgeredStoreOf(kind: String,
      spark: SparkSession, dir: String, prefix: String)(
      fold: (String, org.apache.spark.sql.DataFrame, String) => Boolean)
      : String =
    graft.sources.StoreMemo.tempStore(s"$kind:$dir", prefix) { out =>
      val ev = graft.Tables(spark, dir, "events")
      val even = ev.filter(col("user_id") % 2 === 0)
      val odd = ev.filter(col("user_id") % 2 =!= 0)
      require(fold(out, even, "even-users"), "bootstrap fold must apply")
      require(fold(out, odd, "odd-users"), "incremental fold must apply")
      require(!fold(out, odd, "odd-users"),
        "replayed fold must be a ledger no-op")
    }

  /** The STORED leg of the q172 timing-sketch family (q172 = batch,
    * TimingStream = live, this = storage) — an ADDITIVE corner of the
    * sketch-store triangle: histogram counts are not idempotent, so
    * exactly-once comes from [[graft.sources.LedgerStore]]'s batch-id
    * ledger (atomic with the cells; the reference lands batches
    * transactionally, `clickhouse_table_writer.go:115-149` — the
    * replay ledger is this repo's addition). Built by bootstrap +
    * incremental + deliberately REPLAYED folds; the shared
    * `timingQuantilesFrom` finale must match q172's direct build
    * byte-for-byte (same oracle) — a double-count would move ranks.
    */
  val q193 = Q(
    "q193_timing_store",
    (spark, dir) =>
      timingQuantilesFrom(graft.sources.TimingStoreLayout.read(spark,
        ledgeredStoreOf("timing", spark, dir, "graft-timingstore-")(
          (out, b, id) =>
            graft.sources.TimingStoreLayout.fold(spark, out, id, b)))),
    q172.oracle)

  /** The STORED leg of the q176 DDSketch family (q176 = batch,
    * DdStream = live, q184 = partial merge, this = storage) —
    * completing the additive corner with q192/q193: γ-bucket counts
    * are not idempotent, so exactly-once comes from the same
    * atomically-committed batch-id ledger
    * ([[graft.sources.LedgerStore]]). Built by bootstrap +
    * incremental + deliberately REPLAYED folds; the shared
    * `ddQuantilesFrom` finale must match q176's direct build
    * byte-for-byte (same oracle).
    */
  val q194 = Q(
    "q194_dd_store",
    (spark, dir) =>
      ddQuantilesFrom(graft.sources.DdStoreLayout.read(spark,
        ledgeredStoreOf("dd", spark, dir, "graft-ddstore-")(
          (out, b, id) =>
            graft.sources.DdStoreLayout.fold(spark, out, id, b)))),
    q176.oracle)

  val all: Seq[Q] = Seq(q13, q14, q15, q16, q17, q20, q34, q42, q43, q50, q51,
    q52, q53, q56, q57, q59, q60, q62, q63, q112, q113, q114, q118, q119,
    q122, q124, q125, q126, q128, q129, q130, q131, q132, q133, q135, q136,
    q137, q138, q139, q140, q141, q143, q144, q146, q147, q148, q149, q150,
    q151, q152, q153, q154, q155, q157, q158, q159, q160, q161, q162, q163,
    q164, q165, q168, q169, q170, q171, q172, q173, q174, q175, q176, q177,
    q178, q181, q184, q187, q189, q191, q193, q194, q195, q196, q197,
    q198)
}
