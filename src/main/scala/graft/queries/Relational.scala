package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Relational query surface over the TPC-H-ish tables.
  *
  * bristle itself has no query language (SURVEY.md §2.5) — these are the
  * ClickHouse-side analytics its landed tables exist to serve, expressed
  * with the stock DataFrame API so Catalyst provides pushdown, pruning,
  * partial aggregation and join planning for free.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: scan-heavy group-aggregate.
    * At scale: partial (map-side) aggregation collapses 100 TB to a
    * handful of groups before the shuffle; only the 4-ish group keys
    * cross the wire.
    */
  val q01 = Q(
    "q01_pricing_summary",
    (spark, dir) => {
      val l = Tables(spark, dir, "lineitem")
      l.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${oSum("l_quantity")} AS sum_qty,
             ${oSum("l_extendedprice")} AS sum_base_price,
             ${oSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${oSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
             ${oAvg("l_quantity")} AS avg_qty,
             ${oAvg("l_extendedprice")} AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Selective scan: range + inequality predicates and a narrow
    * projection. Both must reach the parquet reader (`PushedFilters`,
    * `ReadSchema`) — at 100 TB this is the difference between reading
    * two columns of a few files and reading everything.
    */
  val q02 = Q(
    "q02_filter_project",
    (spark, dir) => {
      Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-07-01").cast("timestamp") &&
          col("l_discount") > lit(0.08) && col("l_quantity") < lit(10))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-07-01'
        AND l_discount > 0.08 AND l_quantity < 10
      ORDER BY l_orderkey, l_linenumber"""))

  /** Multi-way join + aggregate: revenue per nation.
    * Shape at scale: lineitem⋈orders is the one real shuffle; customer,
    * nation, region are broadcast (dims are tiny relative to facts), so
    * no fact table is ever re-partitioned for them.
    */
  val q03 = Q(
    "q03_join_revenue_per_nation",
    (spark, dir) => {
      val l = Tables(spark, dir, "lineitem")
      val o = Tables(spark, dir, "orders")
      val c = broadcast(Tables(spark, dir, "customer"))
      val n = broadcast(Tables(spark, dir, "nation"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },
    Some(s"""
      SELECT n_name,
             ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name"""))

  /** Global top-N: sort + limit. Spark executes as TakeOrderedAndProject —
    * each partition keeps N rows, the driver merges; no global sort of
    * 100 TB ever happens.
    */
  val q04 = Q(
    "q04_top_orders",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .limit(10),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d') AS o_date
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 10"""))

  /** Each customer's single largest order. Expressed as max_by over a
    * (totalprice, -orderkey) ordering struct rather than a row_number
    * window: the window form shuffles and sorts the whole orders table
    * with no partial aggregation, while max_by collapses map-side to
    * one row per customer before the shuffle — at 100 TB only the
    * per-customer winners cross the wire. Tiebreak (-orderkey ⇒ lowest
    * orderkey wins) matches the window ordering exactly.
    */
  val q05 = Q(
    "q05_top_order_per_customer",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max_by(
          struct(col("o_orderkey"), col("o_totalprice")),
          struct(col("o_totalprice"), (-col("o_orderkey")).as("neg")))
          .as("top"))
        .select(col("o_custkey"), col("top.o_orderkey").as("o_orderkey"),
          col("top.o_totalprice").as("o_totalprice"))
        .orderBy(col("o_custkey")),
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) t
      WHERE rn = 1
      ORDER BY o_custkey"""))

  /** Set operation: customers active in 1995 but not in 1997 (EXCEPT
    * is a distinct-based shuffle; both inputs pre-deduped map-side).
    */
  val q06 = Q(
    "q06_setop_active_custkeys",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      def in(year: Int) = o
        .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      in(1995).except(in(1997)).orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
      EXCEPT
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      ORDER BY o_custkey"""))

  /** Exact distinct aggregation: suppliers per part (expands to a
    * two-phase distinct: partial dedup before the shuffle).
    */
  val q07 = Q(
    "q07_distinct_suppliers_per_part",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("n_lines"))
        .filter(col("n_supp") >= 2)
        .orderBy(col("l_partkey")),
    Some("""
      SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(*) AS n_lines
      FROM lineitem
      GROUP BY l_partkey
      HAVING COUNT(DISTINCT l_suppkey) >= 2
      ORDER BY l_partkey"""))

  /** ROLLUP hierarchy totals (region → nation → grand total); subtotal
    * rows labelled 'ALL' so the oracle comparison has no NULL-ordering
    * ambiguity between engines.
    */
  val q08 = Q(
    "q08_rollup_revenue",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val c = broadcast(Tables(spark, dir, "customer"))
      val n = broadcast(Tables(spark, dir, "nation"))
      val r = broadcast(Tables(spark, dir, "region"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("revenue"), col("n_orders"))
        .orderBy(col("region"), col("nation"))
    },
    Some(s"""
      SELECT COALESCE(r_name, 'ALL') AS region,
             COALESCE(n_name, 'ALL') AS nation,
             ${oSum("o_totalprice")} AS revenue,
             COUNT(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY region, nation"""))

  /** Semi join: customers with at least one finished order (Spark
    * left_semi — probe side never materializes order columns).
    */
  val q09 = Q(
    "q09_semi_customers_with_f_orders",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders")
        .filter(col("o_orderstatus") === lit("F"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  /** Anti join: customers that never ordered. The probe side is
    * pre-collapsed to distinct custkeys so the shuffle moves one row
    * per customer instead of every order (partial dedup happens
    * map-side); the anti-join result is identical.
    */
  val q10 = Q(
    "q10_anti_customers_without_orders",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders").select(col("o_custkey")).distinct()
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  /** Scalar subquery: orders 1.5× above the global mean. The mean is
    * computed with the deterministic decimal path and broadcast as a
    * one-row cross join, so both engines compare against bit-identical
    * thresholds.
    */
  val q11 = Q(
    "q11_orders_above_avg",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val avgDf = o.agg(davg(col("o_totalprice")).as("avg_price"))
      o.crossJoin(broadcast(avgDf))
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 1.5 * (SELECT ${oAvg("o_totalprice")} FROM orders)
      ORDER BY o_orderkey"""))

  /** Enum decode + group (SURVEY §2.4 Q5): priority string → stable
    * numeric code, mirroring bristle's Enum8 numeric storage
    * (reference clickhouse_table.go:153-160).
    */
  val q12 = Q(
    "q12_enum_priority_histogram",
    (spark, dir) => {
      val code = expr("""CASE o_orderpriority
        WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
        WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 ELSE 0 END""")
        .cast("tinyint")
      Tables(spark, dir, "orders")
        .withColumn("priority_code", code)
        .groupBy(col("priority_code"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("priority_code"))
    },
    Some(s"""
      SELECT CAST(CASE o_orderpriority
               WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
               WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
               WHEN '5-LOW' THEN 5 ELSE 0 END AS TINYINT) AS priority_code,
             COUNT(*) AS n_orders,
             ${oSum("o_totalprice")} AS revenue
      FROM orders
      GROUP BY 1
      ORDER BY priority_code"""))

  /** Full outer join with coalesced keys: customers and their order
    * stats, keeping customers without orders AND (if any) orphan
    * orders — the reconciliation shape. Dims stay broadcastable; the
    * outer side streams.
    */
  val q45 = Q(
    "q45_full_outer",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val o = Tables(spark, dir, "orders")
        .join(Tables(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_orders"))
      c.join(o, Seq("nk"), "full_outer")
        .select(col("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("nk"))
    },
    Some("""
      WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                 FROM customer GROUP BY 1),
      o AS (SELECT c_nationkey AS nk, COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1)
      SELECT COALESCE(c.nk, o.nk) AS nk,
             COALESCE(n_cust, 0) AS n_cust,
             COALESCE(n_orders, 0) AS n_orders
      FROM c FULL OUTER JOIN o ON c.nk = o.nk
      ORDER BY nk"""))

  /** GROUPING SETS beyond q08's rollup: independent slices (by
    * orderpriority, by orderstatus, grand total) in one pass —
    * expand-then-aggregate, partial aggregation per set.
    */
  val q46 = Q(
    "q46_grouping_sets",
    (spark, dir) => {
      Tables(spark, dir, "orders").createOrReplaceTempView("orders_gs")
      spark.sql(s"""
        SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY pri, status""")
    },
    Some(s"""
      SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
             COALESCE(o_orderstatus, 'ALL') AS status,
             COUNT(*) AS n,
             ${oSum("o_totalprice")} AS revenue
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      ORDER BY pri, status"""))

  /** Correlated EXISTS subquery: parts with at least one open-order
    * lineitem — Catalyst decorrelates to a semi join (same physical
    * shape as q09, arrived at through the subquery surface).
    */
  val q47 = Q(
    "q47_exists_subquery",
    (spark, dir) => {
      Tables(spark, dir, "part").createOrReplaceTempView("part_ex")
      Tables(spark, dir, "lineitem").createOrReplaceTempView("lineitem_ex")
      spark.sql("""
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part_ex p
        WHERE EXISTS (SELECT 1 FROM lineitem_ex l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
        GROUP BY p_brand
        ORDER BY p_brand""")
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n_parts
      FROM part p
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
      GROUP BY p_brand
      ORDER BY p_brand"""))

  /** Skew-salted join, driver-verified: revenue per customer segment
    * through Shuffle.saltedJoin — the salt must be invisible in the
    * result, so the oracle is the PLAIN join's SQL. At 100 TB this is
    * the shape for a hot-key fact join AQE can't fully split.
    */
  val q44 = Q(
    "q44_salted_join",
    (spark, dir) => {
      val orders = Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
      val customer = Tables(spark, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.operators.Shuffle.saltedJoin(orders, customer, "o_custkey", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some(s"""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             ${oSum("o_totalprice")} AS revenue
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** Exact weighted quantiles (ClickHouse `quantileExactWeighted`
    * analog): per return flag, the smallest extended price whose
    * cumulative quantity weight reaches ⌈q·W⌉ at q = 25/50/75% —
    * "the price below which a quarter/half/three quarters of the
    * SHIPPED UNITS sit", the weighted read a pricing analyst wants
    * where the unweighted quantile would count a 1-unit line the
    * same as a 50-unit line. All thresholds are INTEGER arithmetic
    * ((k·W + 3) div 4 — quantities are integral in this data), and
    * outputs are selected input prices, so every cell is hash-exact.
    *
    * Scale shape: the cumulative weight comes from
    * `OrderedScan.runningTotal` with a price-monotone bucket (per-
    * flag ranking never funnels a flag onto one task); selection is
    * a keyed join against the summary-sized target table plus one
    * min-struct aggregate (map-side partial). The oracle replays the
    * cumulative sum with a naive full per-flag window — pruned ≡
    * naive to the bit.
    */
  val q127 = Q(
    "q127_weighted_quantiles",
    (spark, dir) => {
      // the projection feeds runningTotal (two reads: within-bucket
      // window + per-bucket totals) AND the target weights — three
      // lineitem scans without the cache (guide §5); lazy, drained
      // with the query
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice").as("price"),
          col("l_quantity").cast("long").as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.pipeline.Similarity.registerForRelease(li)
      val ranked = graft.operators.OrderedScan.runningTotal(li, col("flag"),
        Seq(col("price"), col("l_orderkey"), col("l_linenumber")), col("w"),
        floor(col("price") / 5000), "cw")
      val targets = li.groupBy(col("flag")).agg(sum(col("w")).as("tw"))
        .select(col("flag"), col("tw"),
          explode(expr("transform(array(1, 2, 3), k -> " +
            "named_struct('quantile', concat('p', k * 25), " +
            "'t', (tw * k + 3) div 4))")).as("tg"))
        .select(col("flag"), col("tw"), col("tg.quantile"), col("tg.t"))
      ranked.join(targets, Seq("flag"))
        .filter(col("cw") >= col("t"))
        .groupBy(col("flag"), col("quantile"))
        .agg(min(struct(col("cw"), col("price"))).as("m"),
          max(col("tw")).as("total_weight"))
        .select(col("flag"), col("quantile"), col("m.price").as("value"),
          col("total_weight"))
        .orderBy(col("flag"), col("quantile"))
    },
    Some("""
      WITH li AS (SELECT l_returnflag AS flag, l_orderkey, l_linenumber,
                         l_extendedprice AS price,
                         CAST(l_quantity AS BIGINT) AS w
                  FROM lineitem),
      r AS (SELECT flag, price, w,
                   SUM(w) OVER (PARTITION BY flag
                                ORDER BY price, l_orderkey, l_linenumber
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cw
            FROM li),
      tot AS (SELECT flag, CAST(SUM(w) AS BIGINT) AS tw FROM li GROUP BY 1),
      tg AS (SELECT flag, tw, 'p' || (k * 25) AS quantile,
                    (tw * k + 3) // 4 AS t
             FROM tot, UNNEST([1, 2, 3]) AS u(k)),
      sel AS (SELECT tg.flag, tg.quantile, tg.tw, MIN(r.cw) AS mcw
              FROM tg JOIN r ON r.flag = tg.flag AND r.cw >= tg.t
              GROUP BY 1, 2, 3)
      SELECT sel.flag, sel.quantile, r.price AS value,
             sel.tw AS total_weight
      FROM sel JOIN r ON r.flag = sel.flag AND r.cw = sel.mcw
      ORDER BY sel.flag, sel.quantile"""))

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q44, q45, q46, q47, q127)
}
