package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the [[graft.queries.dsum]] exactness-bound guard (VERDICT r11
  * #5): below 2^53 the double→decimal accumulation is the proven-exact
  * path and must keep working bit-for-bit; above it the conversion's
  * cross-engine parity is unproven, so the guard must raise instead of
  * silently converting.
  */
class DsumSpec extends SparkSpec {
  import spark.implicits._

  test("dsum below the 2^53 bound stays exact (boundary included)") {
    val vs = Seq(0.25, -1.5, graft.queries.dsumExactMax, -graft.queries.dsumExactMax)
    val out = vs.toDF("v").agg(dsum(col("v")).as("s")).collect()(0).getDouble(0)
    assert(out == 0.25 - 1.5) // the two 2^53 endpoints cancel exactly
  }

  test("dsum passes NULLs through to SUM semantics") {
    val out = Seq[Option[Double]](Some(1.5), None, Some(2.5)).toDF("v")
      .agg(dsum(col("v")).as("s")).collect()(0).getDouble(0)
    assert(out == 4.0)
    val allNull = Seq[Option[Double]](None, None).toDF("v")
      .agg(dsum(col("v")).as("s")).collect()(0)
    assert(allNull.isNullAt(0))
  }

  test("dsum above the 2^53 bound raises instead of silently converting") {
    val past = graft.queries.dsumExactMax * 2.0
    val e = intercept[Exception] {
      Seq(1.0, past).toDF("v").agg(dsum(col("v")).as("s")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dsum")), s"unexpected error: $e")
  }
}
