package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q184's -State/-Merge claim, proven as a property rather than only
  * against the day partition the query ships: γ-bucket partial
  * sketches built over ANY disjoint split of the rows merge (cell-wise
  * count addition) to exactly the direct-build table, and the merged
  * quantile read equals q176's direct answer. Counts are associative,
  * bucket assignment is per-row — so the split axis cannot matter;
  * this pins that no accidental order/partition dependence sneaks in.
  */
class SketchMergeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("γ-bucket partials merge to the direct table under arbitrary splits") {
    val ev = graft.Tables(spark, sf, "events")
    val bounds = Events.ddBounds(spark)
    val direct = Events.ddBucketsOf(ev, bounds)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    for (k <- Seq(2, 7)) {
      // k independent partial sketches over a split axis UNRELATED to
      // value or day, then merge = union + cell-wise sum
      val partials = (0 until k).map(p =>
        Events.ddBucketsOf(
          ev.filter(pmod(col("event_id"), lit(k.toLong)) === p.toLong),
          bounds))
      val merged = partials.reduce(_ unionByName _)
        .groupBy(col("event_type"), col("k"), col("lo"))
        .agg(sum(col("c")).as("c"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
      assert(merged == direct, s"merge at k=$k diverges from direct build")
    }
  }

  test("q184 merged quantiles equal q176's direct quantiles") {
    val a = Events.q184.fn(spark, sf)
      .select(col("event_type"), col("n"), col("p50_est"), col("p90_est"),
        col("p99_est"))
      .collect().map(_.toSeq)
    val b = Events.q176.fn(spark, sf).collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(b),
      "day-merged DD quantiles diverge from the direct build")
  }
}
