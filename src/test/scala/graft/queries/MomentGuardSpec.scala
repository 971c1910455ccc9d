package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exact-moment domain guards (VERDICT r13 #2): q195's Σv³/Σv⁴ and
  * q198's Σxy are exact BIGINT sums whose cross-engine parity is only
  * proven while every per-row term fits Int64 — an out-of-domain frame
  * must RAISE the widen-or-decimal message, never silently diverge
  * from the oracle. In-domain frames are untouched (the 3-SF hash
  * gates pin the values; here we pin that the guard is value-neutral).
  */
class MomentGuardSpec extends SparkSpec {

  import spark.implicits._

  private def frame(values: Double*) =
    values.zipWithIndex.map { case (v, i) =>
      ("t", v, s"props-$i")
    }.toDF("event_type", "value", "props")

  test("q195's v-grid guard fires loudly past |v| = 55000 with the " +
      "widen-or-decimal message") {
    // v = floor(8 * 12500.0) = 100000 > 55000 — one row's v^4 would
    // already be unprovable territory
    val e = intercept[Exception] {
      Events.skewKurtOf(frame(1.0, 12500.0)).collect()
    }
    val msg = e.getMessage + Option(e.getCause).fold("")(_.getMessage)
    assert(msg.contains("q195") && msg.contains("widen"),
      s"guard message must name the query and the fix: $msg")
  }

  test("q198's x/y guards fire loudly past 3e9 per factor") {
    // x = floor(8 * 5e8) = 4e9 > 3e9
    val e = intercept[Exception] {
      Events.covarianceOf(frame(1.0, 5.0e8)).collect()
    }
    val msg = e.getMessage + Option(e.getCause).fold("")(_.getMessage)
    assert(msg.contains("q198") && msg.contains("widen"),
      s"guard message must name the query and the fix: $msg")
  }

  test("in-domain frames pass the guards value-unchanged (NULLs " +
      "included) — the guard is a contract, not a transform") {
    val df = Seq(("t", Some(2.5), "pp"), ("t", Some(0.5), "p"),
        ("t", None, "q"), ("u", Some(1.0), "r"))
      .toDF("event_type", "value", "props")
    val sk = Events.skewKurtOf(df).collect()
    assert(sk.map(_.getString(0)).toSeq == Seq("t", "u"))
    assert(sk(0).getLong(1) == 3L, "NULL values still count rows")
    val cv = Events.covarianceOf(df).collect()
    assert(cv.map(_.getString(0)).toSeq == Seq("t", "u"))
    // u has n = 1 -> covar_samp NULL by the n < 2 guard
    assert(cv(1).isNullAt(3))
  }
}
