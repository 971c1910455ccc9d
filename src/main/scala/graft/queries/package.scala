package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {

  /** One verifiable query: a Spark DataFrame program plus (when SQL can
    * express the same semantics) a DuckDB oracle statement run by the
    * driver against the same parquet tables. Column names/order and row
    * order must match the oracle exactly.
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Above 2^53 a double's spacing exceeds 1, and the double→decimal
    * conversion behind [[dsum]] is only PROVEN bit-identical to the
    * oracle's below that magnitude (q144 chose unit buckets for exactly
    * this reason). The guard turns a silent cross-engine drift into a
    * loud per-row error: widen to an exact decimal source first.
    */
  val dsumExactMax: Double = 9007199254740992.0 // 2^53

  /** Sum doubles exactly and deterministically across engines: accumulate
    * in decimal (associative, order-independent), convert to double once.
    * A plain double sum is order-dependent and would hash-mismatch the
    * oracle, whose partial-aggregation order differs from Spark's.
    * Scale 6 covers every derived value in the testdata (prices are 2 dp,
    * price*(1-disc)*(1+tax) is 6 dp), so the cast never rounds near a
    * decimal midpoint. Inputs past [[dsumExactMax]] raise instead of
    * converting (one codegen'd compare per row; NULLs pass through to
    * the sum's usual NULL handling).
    */
  def dsum(c: Column): Column =
    sum(when(c.isNull || abs(c) <= dsumExactMax, c)
      .otherwise(raise_error(concat(
        lit("dsum: |value| > 2^53 ("), c.cast("string"),
        lit(") — double->decimal parity unproven past that bound; " +
          "use an exact decimal source"))))
      .cast("decimal(38,6)")).cast("double")

  /** Order-stable mean built on [[dsum]]. The count-0 guard turns the
    * degenerate all-NULL/empty group into NULL (the oracle's answer)
    * instead of an ANSI DIVIDE_BY_ZERO.
    */
  def davg(c: Column): Column =
    dsum(c) / when(count(c) =!= 0L, count(c))

  /** Loud domain guard for the exact Int64 moment sums (the [[dsum]]
    * precedent applied to the 3rd/4th-moment and cross-moment
    * queries): per-row |c| must stay at or under `maxAbs`, chosen so
    * the row's own power/product term fits Int64 — past it the query
    * RAISES with a message naming the fix instead of drifting from the
    * oracle (one codegen'd compare per row; NULLs pass through).
    * Whole-corpus sum overflow is loud separately: ANSI mode (Spark 4
    * default, and DuckDB's HUGEINT-sum + BIGINT cast) errors rather
    * than wraps — this guard makes the DOMAIN contract explicit and
    * self-describing at the row that breaks it.
    */
  def momentGuard(c: Column, maxAbs: Long, what: String): Column =
    when(c.isNull || abs(c) <= maxAbs, c)
      .otherwise(raise_error(concat(
        lit(s"$what: |term| > $maxAbs ("), c.cast("string"),
        lit(") — exact Int64 moment sums unproven past that bound; " +
          "widen to a coarser grid or decimal moment sums"))))

  /** DuckDB spelling of [[dsum]]. */
  def oSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE)"

  /** DuckDB spelling of [[davg]]. */
  def oAvg(expr: String): String = s"${oSum(expr)} / COUNT($expr)"
}
