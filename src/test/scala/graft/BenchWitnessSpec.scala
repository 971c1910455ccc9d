package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the per-axis witness contracts (VERDICT r15 #1: the bench
  * record's credibility rests on these stamps — their floor/cap,
  * failed-read propagation, and merge rules are invariants, not
  * implementation detail).
  */
class BenchWitnessSpec extends AnyFunSuite {
  import BenchWitness._

  test("extCores subtracts self work exactly and floors at zero") {
    // 400 busy jiffies over 2 s, 300 of them ours -> 1 jiffy/cs of
    // external work = 0.5 external cores
    val b = Jif(busy = 1000, self = 500, steal = 0)
    val a = Jif(busy = 1400, self = 800, steal = 0)
    assert(math.abs(extCores(b, a, 2.0) - 0.5) < 1e-9)
    // self can out-count total on jiffy-granularity windows (the two
    // files are read at slightly different instants): floor, not
    // negative
    val a2 = Jif(busy = 1010, self = 520, steal = 0)
    assert(extCores(b, a2, 1.0) == 0.0)
  }

  test("stealCores converts jiffies to cores over the window") {
    val b = Jif(0, 0, 100)
    val a = Jif(0, 0, 150) // 50 stolen jiffies = 0.5 core-seconds
    assert(math.abs(stealCores(b, a, 2.0) - 0.25) < 1e-9)
    assert(stealCores(b, a, 0.0) == -1.0)
  }

  test("failed /proc reads propagate as -1, never as a reading") {
    val ok = Jif(100, 50, 10)
    val bad = Jif(-1, -1, -1)
    assert(extCores(bad, ok, 1.0) == -1.0)
    assert(extCores(ok, bad, 1.0) == -1.0)
    assert(stealCores(bad, ok, 1.0) == -1.0)
    assert(psiStall(-1L, 100L, 1.0) == -1.0)
    assert(psiStall(100L, -1L, 1.0) == -1.0)
    assert(gcFrac(-1L, 100L, 1.0) == -1.0)
  }

  test("psiStall is the stall fraction of the window, capped at 1.0") {
    // 500 ms of stall over a 2 s window = 0.25
    assert(math.abs(psiStall(0L, 500000L, 2.0) - 0.25) < 1e-9)
    // accounting skew can push delta past wall: cap, don't exceed
    assert(psiStall(0L, 3000000L, 2.0) == 1.0)
    assert(psiStall(100L, 100L, 2.0) == 0.0)
  }

  test("gcFrac is the GC fraction of the window, capped at 1.0") {
    // 300 ms of GC over a 2 s window = 0.15 (exactly the retry gate)
    assert(math.abs(gcFrac(1000L, 1300L, 2.0) - 0.15) < 1e-9)
    assert(gcFrac(0L, 5000L, 2.0) == 1.0)
  }

  test("quietest keeps the quieter valid reading; -1 loses to any reading") {
    assert(quietest(0.3, 0.1) == 0.1)
    assert(quietest(0.1, 0.3) == 0.1)
    // a failed read must not certify a tainted window as quiet
    assert(quietest(-1.0, 0.4) == 0.4)
    assert(quietest(0.4, -1.0) == 0.4)
    assert(quietest(-1.0, -1.0) == -1.0)
  }

  test("the live readers produce coherent snapshots on this box") {
    // not a timing assertion — just that the readers parse /proc and
    // the MXBean on the boxes the bench actually runs on. A box
    // without /proc (macOS dev machine) CANCELS rather than fails —
    // the reader's contract there is the -1 propagation, pinned above
    val j = cpuJiffies()
    assume(j.busy >= 0, "no readable /proc/stat on this box")
    assert(j.busy > 0 && j.self >= 0 && j.steal >= 0)
    assert(j.busy >= j.self, "total busy can never trail own jiffies")
    val (io, mem, cpu) = psiTotals()
    // PSI may be absent (-1) on exotic kernels, but a present reading
    // is a non-negative cumulative total
    for (v <- Seq(io, mem, cpu)) assert(v >= -1)
    assert(gcMillis() >= 0)
  }
}
