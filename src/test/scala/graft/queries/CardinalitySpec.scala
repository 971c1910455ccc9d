package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The approximate twin of q53's exact distinct counts: at 100 TB
  * `countDistinct` shuffles one row per distinct value, while
  * `approx_count_distinct` (HyperLogLog++) partial-aggregates a
  * fixed-size mergeable sketch map-side. The driver verifies the
  * exact form; this spec pins the approximate form's contract — same
  * per-group call shape, estimates inside the configured error
  * envelope, deterministic across runs.
  */
class CardinalitySpec extends SparkSpec {

  private def corpus = spark.range(0, 200000)
    .select((col("id") % 7).cast("string").as("event_type"),
      (col("id") % 4831).as("user_id"))

  test("approx_count_distinct tracks exact within the rsd envelope") {
    val rsd = 0.02
    val rows = corpus
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), rsd).as("approx"))
      .collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      // 5-sigma envelope of the configured relative standard deviation
      assert(math.abs(approx - exact) / exact <= 5 * rsd,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("estimates are deterministic across evaluations") {
    val a = corpus.agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    val b = corpus.agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    assert(a == b)
  }
}
