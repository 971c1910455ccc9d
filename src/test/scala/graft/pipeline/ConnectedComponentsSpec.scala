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

  // ---- incrementalComponents: stored labels + batch pairs must equal
  // a from-scratch run over the union, on every merge topology ----

  private def runIncr(hist: Seq[(Long, Long)],
      batch: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val stored = Dedup.connectedComponents(hist.toDF("a", "b"), "a", "b")
    Dedup.incrementalComponents(stored, batch.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def checkIncr(hist: Seq[(Long, Long)],
      batch: Seq[(Long, Long)]): Unit =
    assert(runIncr(hist, batch) == truth(hist ++ batch))

  test("incremental: new pair merges two stored components") {
    checkIncr(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq((3L, 10L)))
  }

  test("incremental: untouched components pass through unchanged") {
    val hist = Seq((1L, 2L), (10L, 11L), (20L, 21L), (21L, 22L))
    val out = runIncr(hist, Seq((1L, 30L)))
    assert(out == truth(hist ++ Seq((1L, 30L))))
    // the untouched components kept their labels
    assert(out(11L) == 10L && out(22L) == 20L)
  }

  test("incremental: batch introduces entirely new nodes") {
    checkIncr(Seq((1L, 2L)), Seq((100L, 101L), (101L, 102L)))
  }

  test("incremental: batch pair inside one stored component is a no-op") {
    checkIncr(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq((1L, 4L)))
  }

  test("incremental: chain of merges across many stored components") {
    val hist = (0 until 10).map(i => (i * 10L, i * 10L + 1))
    val batch = (0 until 9).map(i => (i * 10L + 1, (i + 1) * 10L))
    checkIncr(hist, batch)
  }

  test("incremental: empty batch returns stored labels verbatim") {
    val hist = Seq((1L, 2L), (10L, 11L))
    assert(runIncr(hist, Seq.empty) == truth(hist))
  }

  test("incremental: seeded random splits match a from-scratch run") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 3) {
      val n = 120
      val all = Seq.fill(100)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (hist, batch) = all.partition(_ => rnd.nextBoolean())
      checkIncr(hist, batch)
    }
  }
}
