package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven properties over the pure bounded-ledger state
  * machine (the r14 core change — no SparkSession needed): whatever
  * the id mix and window size, an applied id inside the protection
  * contract is always refused on replay, the state never grows past
  * the window, and the watermark covers every numeric-tailed id ever
  * applied.
  */
class LedgerStateSpec extends AnyFunSuite {

  import LedgerStore.{LedgerState, seqOf}
  import LedgerStore.{Fresh, ReplayInWindow, BelowWatermark}

  private val empty = LedgerState(None, Vector.empty)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("seqOf: trailing digit run when it fits a Long, else none") {
    assert(seqOf("42") == Some(42L))
    assert(seqOf("cm-micro-7") == Some(7L))
    assert(seqOf("b0") == Some(0L))
    assert(seqOf("even-users").isEmpty)
    assert(seqOf("").isEmpty)
    assert(seqOf("x99999999999999999999").isEmpty, "overflow digits -> none")
    assert(seqOf("v1-final").isEmpty)
  }

  private val numericIds: Gen[List[String]] =
    for {
      n <- Gen.choose(1, 60)
      start <- Gen.choose(0L, 1000L)
      prefix <- Gen.oneOf("", "m-", "cm-micro-")
    } yield (start until start + n).map(i => s"$prefix$i").toList

  test("monotonic numeric sequences: every applied id is refused on " +
      "replay forever (watermark), at any window size; the state " +
      "never grows past the window") {
    check("numeric-replay", Prop.forAll(numericIds,
        Gen.choose(1, 8)) { (ids, window) =>
      val freshAccepted = ids.foldLeft((empty, true)) {
        case ((s, ok), id) =>
          (s.add(id, window), ok && !s.isApplied(id))
      }
      val (st, allFresh) = freshAccepted
      allFresh &&
        ids.forall(st.isApplied) &&
        st.recent.size <= window
    })
  }

  private val wordIds: Gen[List[String]] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.pick(n, List("alpha", "beta", "gamma", "delta",
        "even-users", "odd-users")).map(_.toList))

  test("non-numeric ids: the last `window` applied stay refused on " +
      "replay; the state never exceeds the window") {
    check("word-window", Prop.forAll(wordIds,
        Gen.choose(1, 8)) { (ids, window) =>
      val st = ids.foldLeft(empty)((s, id) => s.add(id, window))
      ids.takeRight(window).forall(st.isApplied) &&
        st.recent.size <= window
    })
  }

  test("three-way check: in-window ids classify ReplayInWindow, " +
      "aged-out or never-applied below-watermark numeric ids classify " +
      "BelowWatermark (the LOUD arm), above-watermark ids Fresh") {
    check("three-way", Prop.forAll(numericIds,
        Gen.choose(1, 8)) { (ids, window) =>
      val st = ids.foldLeft(empty)((s, id) => s.add(id, window))
      val inWindow = st.recent
      val agedOut = ids.filterNot(inWindow.contains)
      val prefix = ids.head.takeWhile(!_.isDigit)
      val hw = st.hw.get
      inWindow.forall(st.check(_) == ReplayInWindow) &&
        agedOut.forall(st.check(_) == BelowWatermark) &&
        st.check(s"$prefix${hw + 1}") == Fresh
    })
    // the reset case pinned directly: a sequence that restarts at 0
    // against a watermark classifies BelowWatermark, never Fresh
    val st = (10 to 15).foldLeft(empty)((s, i) => s.add(s"b$i", 4))
    assert(st.check("b0") == BelowWatermark)
    assert(st.check("b10") == BelowWatermark, "aged-out genuine replay")
    assert(st.check("b15") == ReplayInWindow)
    assert(st.check("b16") == Fresh)
    assert(st.check("manual-id") == Fresh,
      "non-numeric ids never hit the watermark arm")
  }

  test("mixed ids: the watermark is the max numeric tail ever " +
      "applied; above-watermark fresh ids are accepted, the " +
      "watermark id itself is refused") {
    check("mixed-watermark", Prop.forAll(numericIds, wordIds,
        Gen.choose(1, 6)) { (nums, words, window) =>
      val mixed = nums.zipAll(words, "", "").flatMap {
        case (a, b) => Seq(a, b).filter(_.nonEmpty)
      }
      val st = mixed.foldLeft(empty)((s, id) => s.add(id, window))
      val hw = nums.flatMap(seqOf).maxOption
      val prefix = nums.head.takeWhile(!_.isDigit)
      st.hw == hw && hw.forall { h =>
        !st.isApplied(s"$prefix${h + 1}") && st.isApplied(s"$prefix$h")
      }
    })
  }
}
