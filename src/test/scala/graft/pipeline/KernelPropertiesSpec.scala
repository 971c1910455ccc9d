package graft.pipeline

import graft.sources.ZOrderLayout
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven properties over the PURE kernel functions — the
  * driver-side complement to PipelineSpec's Spark-plan equality tests.
  * No SparkSession: these functions are deterministic JVM code, so
  * ScalaCheck can hammer them with hundreds of adversarial inputs per
  * run at unit-test cost.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("morton code is invertible inside the clamp range") {
    val coord = Gen.chooseNum(0L, (1L << ZOrderLayout.BitsPerDim) - 1)
    check("morton-inverse", Prop.forAll(coord, coord) { (a, b) =>
      val m = ZOrderLayout.mortonJvm(a, b)
      var (ra, rb) = (0L, 0L)
      (0 until ZOrderLayout.BitsPerDim).foreach { i =>
        ra |= ((m >> (2 * i)) & 1L) << i
        rb |= ((m >> (2 * i + 1)) & 1L) << i
      }
      ra == a && rb == b
    })
  }

  test("morton saturates out-of-range inputs instead of wrapping") {
    val any = Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4)
    val mask = (1L << ZOrderLayout.BitsPerDim) - 1
    check("morton-clamp", Prop.forAll(any, any) { (a, b) =>
      val clamped = ZOrderLayout.mortonJvm(
        math.min(math.max(a, 0L), mask), math.min(math.max(b, 0L), mask))
      ZOrderLayout.mortonJvm(a, b) == clamped
    })
  }

  test("dot product is symmetric and self-dot is non-negative") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-1e6, 1e6)).map(_.toArray)
    check("dot-sym", Prop.forAll(vec, vec) { (a, b) =>
      // per-element multiply commutes and the accumulation order is
      // shared, so IEEE equality (not approximation) must hold
      Similarity.dotJvm(a, b) == Similarity.dotJvm(b, a) &&
        Similarity.dotJvm(a, a) >= 0.0
    })
  }

  test("scrub pattern counts exactly the word-level occurrences") {
    val terms = Seq("alpha", "beta", "gamma")
    val word = Gen.oneOf(Gen.oneOf(terms),
      Gen.oneOf("alphas", "xbeta", "delta", "gammagamma", "x", "42"))
    val doc = Gen.listOf(word)
    val re = TextOps.scrubPattern(terms).r
    check("scrub-count", Prop.forAll(doc) { ws =>
      val text = ws.mkString(" ")
      re.findAllIn(text).size == ws.count(terms.contains(_))
    })
  }

  test("sliding chunks: full coverage, stride-exact starts, reconstruction") {
    val word = Gen.identifier.map(_.take(5)).suchThat(_.nonEmpty)
    val params = for {
      w <- Gen.chooseNum(1, 12)
      s <- Gen.chooseNum(1, w) // s <= w: no word may be skipped
      ws <- Gen.listOf(word)
    } yield (w, s, ws)
    // the ==> guard discards shrink candidates outside the operator's
    // contract (w >= s >= 1) — ScalaCheck shrinks past generator bounds
    check("chunks", Prop.forAll(params) { case (w, s, ws) =>
      (w >= 1 && s >= 1 && s <= w) ==> {
      val chunks = TextOps.slidingChunksJvm(ws, w, s)
      if (ws.isEmpty) chunks.isEmpty
      else {
        val split = chunks.map(_.split(" ").toSeq)
        val starts = split.indices.map(_ * s)
        // each chunk is exactly the slice [start, start+w)
        val exact = split.indices.forall(i =>
          split(i) == ws.slice(starts(i), starts(i) + w))
        // stitching first s words of each chunk (+ last chunk's tail)
        // rebuilds the document — nothing lost, nothing duplicated
        val rebuilt = (split.init.flatMap(_.take(s)) ++ split.last).toSeq
        exact && chunks.length == (ws.length - 1) / s + 1 &&
          rebuilt == ws
      }
      }
    })
  }
}
