package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band/interval) joins without the quadratic blow-up.
  *
  * A naive `a.join(b, abs(a.t - b.t) <= band)` has no equality
  * conjunct, so Spark plans BroadcastNestedLoopJoin — |A|×|B| work,
  * dead at scale. The standard fix is interval bucketing:
  *
  *   - left rows land in bucket floor(t / w);
  *   - right rows are replicated to every bucket their window
  *     [t-band, t+band] overlaps — with w = band that is at most 3
  *     buckets (2 when band divides w), a small constant;
  *   - a hash join on (keys, bucket) produces candidates; the exact
  *     range predicate then filters them.
  *
  * Every true pair shares the left row's bucket (the right window
  * covers it), so the rewrite is complete; the exact filter makes it
  * precise. Shuffle volume is |L| + c·|R|, c ≤ 3 — the same
  * bucket-join shape the near-dup operators use.
  */
object RangeJoin {

  /** Band join: pairs (l, r) with same `keys` and
    * |l.ordL - r.ordR| <= band. Returns left columns plus right
    * columns renamed `prefix<col>`. `band` and the ord columns share a
    * unit (e.g. nanos); bucket width = band. Ord values must be
    * non-negative longs (epoch times are): bucketing uses integer
    * `div`, because double division visibly loses ulps at epoch-nanos
    * magnitude (2^53 < 1e18) and would misplace bucket edges.
    */
  def band(left: DataFrame, right: DataFrame, keys: Seq[String],
      ordL: String, ordR: String, band: Long, prefix: String): DataFrame = {
    require(band > 0, "band must be positive")
    val l = left.withColumn("_rj_b", expr(s"$ordL div ${band}L"))
    // right row at t reaches buckets of [t-band, t+band]
    val r = right.withColumn("_rj_b",
      explode(sequence(expr(s"($ordR - ${band}L) div ${band}L"),
        expr(s"($ordR + ${band}L) div ${band}L"))))
    val joinCols = keys :+ "_rj_b"
    val renamedR = right.columns.foldLeft(r) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, s"$prefix$c")
    }
    l.join(renamedR, joinCols)
      .filter(abs(col(ordL) - col(s"$prefix$ordR")) <= band)
      .drop("_rj_b")
  }
}
