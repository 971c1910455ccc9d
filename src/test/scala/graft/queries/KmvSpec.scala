package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the KMV/theta-sketch algebra under q121/q123. The driver
  * oracles already differential-test the full queries; these pin the
  * two THEOREMS the queries rely on, on adversarial synthetic sets
  * where the fixture corpus might not exercise the edge:
  *
  *  - merge identity (Beyer et al. 2007): the bottom-k of A ∪ B as
  *    hash sets equals the bottom-k of (K_A ∪ K_B) — sketches merge
  *    without revisiting the data, which is the whole reason q123 can
  *    price a pairwise matrix at sketch cost; and
  *  - unsaturated exactness: a merged sketch with n < k rows means
  *    both inputs were enumerated in full, so the union AND
  *    intersection "estimates" are exact counts.
  */
class KmvSpec extends SparkSpec {

  test("KMV merge: bottom-k of sketch union == bottom-k of full union") {
    import spark.implicits._
    val k = 8
    // overlapping sets with adversarial shape: A's smallest hashes all
    // BELOW B's (so the merged bottom-k is A-dominated), plus a shared
    // band — the case where a naive "concatenate and hope" merge that
    // ignored set semantics would double-count shared hashes
    val a = (1L to 40L).map(x => ("a", x * 3)) // 3,6,...,120
    val b = (1L to 40L).map(x => ("b", x * 3 + 300)) ++
      Seq(6L, 12L, 24L).map(("b", _)) // shared band below 300
    val full = (a ++ b).toDF("src", "h")
    def bottom(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(col("h")).distinct()
        .orderBy(col("h")).limit(k).as[Long].collect().toSeq
    val kA = bottom(full.filter(col("src") === "a"))
    val kB = bottom(full.filter(col("src") === "b"))
    val mergedFromSketches = (kA ++ kB).distinct.sorted.take(k)
    val mergedFromData = bottom(full)
    assert(mergedFromSketches == mergedFromData)
    // and the k-th min (the estimator's h_k) agrees
    assert(mergedFromSketches.last == mergedFromData.last)
  }

  test("q123 on a micro-corpus: unsaturated pairs report exact set sizes") {
    import spark.implicits._
    // two sources with < 64 distinct shingles each: every estimate
    // column must equal its exact twin, to the bit
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s1"),
      (2L, "alpha beta gamma eta theta iota", "s2"),
      (3L, "kappa lambda mu nu xi omicron", "s2"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("kmvspec-").toString
    try {
      docs.write.parquet(s"$dir/documents.parquet")
      val out = Pipeline.all.find(_.name == "q123_kmv_setops").get
        .fn(spark, dir).collect()
      assert(out.length == 1)
      val r = out.head
      assert(r.getAs[Long]("n_sketch") < 64)
      assert(r.getAs[Double]("union_est") ==
        r.getAs[Long]("n_union_exact").toDouble)
      assert(r.getAs[Double]("inter_est") ==
        r.getAs[Long]("n_inter_exact").toDouble)
      // shared shingles between s1 and s2: "alpha beta gamma",
      // "beta gamma" is 2-gram — with 3-gram shingles the shared set
      // is exactly {"alpha beta gamma"} => intersection 1
      assert(r.getAs[Long]("n_inter_exact") == 1L)
    } finally graft.streaming.Parts.deleteTree(
      java.nio.file.Paths.get(dir))
  }
}
