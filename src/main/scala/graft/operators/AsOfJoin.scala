package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row of
  * the same key at-or-before it in a caller-supplied total order — the
  * trade↔quote pattern over the reference's trade-feed tables
  * (/root/reference/examples/binance.sql:1-16, finnhub.sql:1-10: a
  * trade's prevailing quote/state is whatever landed last at its
  * timestamp).
  *
  * Spark has no native as-of join; the scalable composition is
  * union + keyed carry-forward window:
  *
  *   1. tag both inputs and union them on (keys, ord, payload);
  *   2. one window per key, ordered by `ord`, frame
  *      unbounded-preceding..current-row, carrying
  *      `last(right payload, ignoreNulls)` forward;
  *   3. keep left rows; the carried value IS the as-of match.
  *
  * One shuffle (on the keys), no per-left-row probe, no range
  * explosion — shuffle volume is |left| + |right| exactly once. Keys
  * are per-user/per-symbol (high cardinality), so the window
  * parallelizes; for a low-cardinality key compose with the
  * OrderedScan bucket decomposition instead.
  *
  * Tie semantics are the caller's: `ord` must totally order the
  * unioned rows within a key (include a unique tiebreak column, e.g.
  * event_id). A right row equal to a left row in `ord` is impossible
  * under a total order, so "at-or-before" and "strictly-before" are
  * the same thing — whichever the caller encodes in the tiebreak.
  */
object AsOfJoin {

  /** @param keys     equality-join columns, present in both inputs
    * @param ord      ordering columns present in both inputs; must be a
    *                 total order within a key across BOTH inputs
    * @param payload  right-side columns to carry onto matching left rows
    * @param as       name of the output struct column holding the match
    *                 (null when no right row precedes the left row)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      ord: Seq[String], payload: Seq[String], as: String): DataFrame = {
    val pStruct = struct(payload.map(col): _*)
    val pType = right.select(pStruct).schema.head.dataType
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType

    val common = (keys ++ ord).map(col)
    val l = left.select(common :+
      lit(null).cast(pType).as("_aj_p") :+ lStruct.as("_aj_l"): _*)
    val r = right.select(common :+
      pStruct.as("_aj_p") :+ lit(null).cast(lType).as("_aj_l"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(as, last(col("_aj_p"), ignoreNulls = true).over(w))
      .filter(col("_aj_l").isNotNull)
      .select((leftCols.map(c => col(s"_aj_l.$c").as(c)) :+ col(as)): _*)
  }

  /** Convenience for the common "latest right value" shape: returns
    * left columns plus each payload column flattened as `prefix_col`.
    */
  def asofFlat(left: DataFrame, right: DataFrame, keys: Seq[String],
      ord: Seq[String], payload: Seq[String], prefix: String): DataFrame = {
    val joined = asof(left, right, keys, ord, payload, "_aj_m")
    joined.select(left.columns.map(col).toSeq ++
      payload.map(p => col(s"_aj_m.$p").as(s"$prefix$p")): _*)
  }

  /** Staleness-bounded as-of: like [[asof]], but a match whose order
    * head trails the left row's by more than `tolerance` is nulled —
    * the "prevailing quote no older than X" rule trade pipelines
    * apply so a symbol that went quiet doesn't pin a stale quote to
    * every later trade. Same single-shuffle plan; the bound is a
    * post-window predicate, not a join condition. `ord.head` must be
    * numeric and included in `payload` (the match's own timestamp is
    * what the bound compares against).
    */
  def asofWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      ord: Seq[String], payload: Seq[String], as: String,
      tolerance: Long): DataFrame = {
    val ordHead = ord.head
    require(payload.contains(ordHead),
      s"payload must include the order head '$ordHead' for the staleness bound")
    asof(left, right, keys, ord, payload, as)
      .withColumn(as,
        when(col(ordHead) - col(s"$as.$ordHead") <= tolerance, col(as)))
  }
}
