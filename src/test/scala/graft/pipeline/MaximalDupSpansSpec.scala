package graft.pipeline

import graft.SparkSpec

/** Dedup.maximalDupSpans vs a brute-force reference: enumerate every
  * sliding window, mark those appearing in ≥2 distinct docs, merge
  * overlapping ranges per doc. Covers planted shared runs, offset
  * shifts, multiple disjoint spans, within-doc-only repetition (must
  * NOT flag), sub-window docs, and seeded random corpora.
  */
class MaximalDupSpansSpec extends SparkSpec {

  private val W = 4

  private case class Row(docId: Long, nWords: Long, nSpans: Long,
      dupWords: Long, maxSpan: Long, dupFrac: Double)

  /** Brute-force ground truth (same split semantics as TextOps.words:
    * Spark `split(text, " ")` keeps trailing empties → split(" ", -1)).
    */
  private def truth(docs: Seq[(Long, String)]): Map[Long, Row] = {
    val words = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val wins = words.collect { case (id, ws) if ws.length >= W =>
      id -> (0 to ws.length - W).map(p => p -> ws.slice(p, p + W).mkString(" "))
    }
    val owners = wins.flatMap { case (id, s) => s.map { case (_, sp) => (sp, id) } }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    wins.flatMap { case (id, s) =>
      val hitPos = s.collect {
        case (p, sp) if (owners(sp) - id).nonEmpty => p
      }.sorted
      if (hitPos.isEmpty) None else {
        // merge overlapping [p, p+W-1] ranges
        val islands = hitPos.foldLeft(List.empty[(Int, Int)]) {
          case (acc, p) =>
            val e = p + W - 1
            acc match {
              case (s0, e0) :: rest if p <= e0 => (s0, math.max(e0, e)) :: rest
              case _ => (p, e) :: acc
            }
        }.reverse
        val lens = islands.map { case (s0, e0) => (e0 - s0 + 1).toLong }
        val nw = words.toMap.apply(id).length.toLong
        Some(id -> Row(id, nw, islands.size.toLong, lens.sum, lens.max,
          lens.sum.toDouble / nw))
      }
    }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, Row] = {
    import spark.implicits._
    Dedup.maximalDupSpans(docs.toDF("doc_id", "text"), "text", "doc_id", W)
      .collect()
      .map(r => r.getLong(0) -> Row(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
  }

  private def check(docs: Seq[(Long, String)]): Unit =
    assert(run(docs) == truth(docs))

  private def soup(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)("w" + rnd.nextInt(100000))
  }

  test("planted shared run is found at its exact maximal extent") {
    val shared = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa") // 10 words ⇒ span_words = 10
    val d1 = (soup(1, 5) ++ shared ++ soup(2, 5)).mkString(" ")
    val d2 = (soup(3, 12) ++ shared ++ soup(4, 3)).mkString(" ")
    val out = run(Seq(1L -> d1, 2L -> d2))
    assert(out(1L).maxSpan == 10 && out(2L).maxSpan == 10)
    assert(out(1L).nSpans == 1 && out(1L).dupWords == 10)
    check(Seq(1L -> d1, 2L -> d2))
  }

  test("two disjoint shared runs in one doc stay two spans") {
    val s1 = Seq("a1", "a2", "a3", "a4", "a5")
    val s2 = Seq("b1", "b2", "b3", "b4", "b5", "b6")
    val d1 = (s1 ++ soup(5, 8) ++ s2).mkString(" ")
    val d2 = (soup(6, 4) ++ s1 ++ soup(7, 9)).mkString(" ")
    val d3 = (s2 ++ soup(8, 7)).mkString(" ")
    val out = run(Seq(1L -> d1, 2L -> d2, 3L -> d3))
    assert(out(1L).nSpans == 2 && out(1L).dupWords == 11 &&
      out(1L).maxSpan == 6)
    check(Seq(1L -> d1, 2L -> d2, 3L -> d3))
  }

  test("within-doc-only repetition is NOT a duplicated span") {
    val rep = Seq("r1", "r2", "r3", "r4")
    val d1 = (rep ++ soup(9, 6) ++ rep).mkString(" ")
    val d2 = soup(10, 20).mkString(" ")
    assert(run(Seq(1L -> d1, 2L -> d2)).isEmpty)
  }

  test("docs shorter than the window are ignored") {
    val d1 = "x y z" // 3 words < W
    val d2 = "x y z"
    assert(run(Seq(1L -> d1, 2L -> d2)).isEmpty)
  }

  test("identical docs are one full-length span each") {
    val t = soup(11, 15).mkString(" ")
    val out = run(Seq(1L -> t, 2L -> t))
    assert(out(1L) == Row(1L, 15, 1, 15, 15, 1.0))
    assert(out(2L).dupFrac == 1.0)
  }

  test("seeded random corpora with planted overlaps match brute force") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 3) {
      val frags = Seq.fill(6)(soup(1000 + trial * 10 + rnd.nextInt(8), 6))
      val docs = (0 until 12).map { i =>
        val parts = Seq.fill(4)(
          if (rnd.nextBoolean()) frags(rnd.nextInt(frags.size))
          else soup(2000 + trial * 100 + i * 10 + rnd.nextInt(5), 6))
        i.toLong -> parts.flatten.mkString(" ")
      }
      check(docs)
    }
  }
}
