package graft.pipeline

import graft.SparkSpec

/** Dedup.connectedComponents vs brute-force union-find on adversarial
  * graph shapes: long chains (the path-halving stress), stars, cliques,
  * and seeded random graphs. Exactness is the contract — labels must
  * equal the component minimum for every node, every time.
  */
class ConnectedComponentsSpec extends SparkSpec {

  /** Brute-force union-find ground truth. */
  private def truth(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical = min of component: union-by-min keeps roots minimal
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    Dedup.connectedComponents(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def check(pairs: Seq[(Long, Long)]): Unit =
    assert(run(pairs) == truth(pairs))

  test("long chain collapses to its minimum (path-halving stress)") {
    check((0L until 200L).map(i => (i, i + 1)))
  }

  test("chain given in worst-case (descending) edge order") {
    check((0L until 100L).map(i => (i, i + 1)).reverse)
  }

  test("stars, cliques, and singleton pairs") {
    val star = (1L to 20L).map(i => (100L, 100L + i))
    val clique = for (i <- 0 to 5; j <- i + 1 to 5) yield (500L + i, 500L + j)
    val lone = Seq((900L, 901L))
    check(star ++ clique ++ lone)
  }

  test("seeded random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 3) {
      val n = 150
      val pairs = Seq.fill(120)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      check(pairs)
    }
  }
}
