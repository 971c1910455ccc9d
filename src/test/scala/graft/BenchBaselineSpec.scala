package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the self-baseline adjudication contracts (VERDICT r16 #1):
  * parse tolerance, the over-band rule's floor and absolute slack, the
  * min-merge invariant (a noisy capture can never RAISE the recorded
  * quiet floor), and the heap-band check (VERDICT r16 #2). Harness
  * invariants get specs, not comments — the BenchWitness/BenchRecord
  * precedent.
  */
class BenchBaselineSpec extends AnyFunSuite {
  import BenchBaseline._

  test("parse reads a flat vector and normalizes keys to qNN") {
    val m = parse("""{"q01":0.55,"110":6.42,"q75":0.26}""")
    assert(m == Map("q01" -> 0.55, "q110" -> 6.42, "q75" -> 0.26))
  }

  test("parse skips malformed values instead of failing the capture") {
    // a corrupt value degrades to fewer entries, never to a crash
    val m = parse("""{"q01":0.5,"q02":1e999e9,"q03":2.0}""")
    assert(m.get("q01").contains(0.5) && m.get("q03").contains(2.0))
  }

  test("load of a missing file is empty (over_band simply inactive)") {
    assert(load("/nonexistent/bench_baseline.json").isEmpty)
  }

  test("over-band rule: gate ratio over a floored baseline") {
    // the r16 driver slots, against my quiet baseline: all must flag
    assert(overBand(kept = 26.0, base = 6.4, gate = 2.0)) // q110
    assert(overBand(kept = 5.5, base = 0.63, gate = 2.0)) // q102
    assert(overBand(kept = 1.8, base = 0.26, gate = 2.0)) // q75
    // in-band slots must not
    assert(!overBand(kept = 8.9, base = 6.4, gate = 2.0))
    assert(!overBand(kept = 0.30, base = 0.26, gate = 2.0))
  }

  test("over-band slack keeps sub-0.1 s flutter out of the record") {
    // a 20 ms slot reading 60 ms is 3x its baseline but only 40 ms
    // over it — timer/JIT flutter, not contention evidence
    assert(!overBand(kept = 0.06, base = 0.02, gate = 2.0))
    // the floor: a 5 ms baseline is treated as 20 ms, so 150 ms kept
    // clears both the ratio (vs floored base) and the 100 ms slack
    assert(overBand(kept = 0.15, base = 0.005, gate = 2.0))
  }

  test("over-band disabled by gate <= 0 or a non-positive baseline") {
    assert(!overBand(kept = 26.0, base = 6.4, gate = 0.0))
    assert(!overBand(kept = 26.0, base = 0.0, gate = 2.0))
    assert(!overBand(kept = 26.0, base = -1.0, gate = 2.0))
  }

  test("ratio floors the baseline at 20 ms") {
    assert(math.abs(ratio(0.2, 0.005) - 10.0) < 1e-9)
    assert(math.abs(ratio(12.8, 6.4) - 2.0) < 1e-9)
  }

  test("merged only ever lowers an entry; new queries enter as-is") {
    val base = Map("q01" -> 0.50, "q02" -> 1.00)
    val m = merged(base, Seq("q01" -> 0.40, "q02" -> 3.00, "q03" -> 0.70))
    assert(m("q01") == 0.40) // quieter reading lowers the floor
    assert(m("q02") == 1.00) // a noisy capture cannot raise it
    assert(m("q03") == 0.70) // first reading seeds a new entry
  }

  test("render/parse round-trip through the on-disk form") {
    val m = Map("q110" -> 6.421, "q01" -> 0.5554)
    val text = render(m, cpus = 32)
    val back = parse(text)
    assert(math.abs(back("q110") - 6.421) < 1e-9)
    assert(math.abs(back("q01") - 0.555) < 1e-9) // 3 dp on disk
    // the box fingerprint rides in the same file, invisible to parse
    assert(!back.contains("_cpus") && boxCpus(text).contains(32))
  }

  test("write/load round-trip and min-merge across captures") {
    val dir = java.nio.file.Files.createTempDirectory("graft-baseline-")
    val path = dir.resolve("bench_baseline_sfX.json").toString
    try {
      write(path, Map("q01" -> 0.50, "q02" -> 1.20), cpus = 32)
      val first = load(path)
      assert(first == Map("q01" -> 0.50, "q02" -> 1.20))
      write(path, merged(first, Seq("q01" -> 0.45, "q02" -> 9.99)),
        cpus = 32)
      assert(load(path) == Map("q01" -> 0.45, "q02" -> 1.20))
    } finally graft.streaming.Parts.deleteTree(dir)
  }

  test("loadForBox enforces the per-box contract via the cpu count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-baseline-")
    val path = dir.resolve("bench_baseline_sfX.json").toString
    val warns = scala.collection.mutable.Buffer[String]()
    try {
      write(path, Map("q01" -> 0.50), cpus = 32)
      // same box: floors load, no warning
      assert(loadForBox(path, 32, warns += _) == Map("q01" -> 0.50))
      assert(warns.isEmpty)
      // a different parallelism class must NOT adjudicate against
      // this box's floors: empty (over_band inactive) + a loud warn
      assert(loadForBox(path, 8, warns += _).isEmpty)
      assert(warns.exists(_.contains("32-cpu")))
      // a pre-r17 vector without the fingerprint loads as before
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        """{"q01":0.50}""".getBytes("UTF-8"))
      assert(loadForBox(path, 8, warns += _) == Map("q01" -> 0.50))
      // missing file: empty, no warning (just like load)
      assert(loadForBox(path + ".nope", 32, warns += _).isEmpty)
    } finally graft.streaming.Parts.deleteTree(dir)
  }

  test("resolvePath keys the default file by the SF directory name") {
    val p = resolvePath("/root/testdata/sf0.1")
    assert(p.endsWith("scripts/bench_baseline_sf0.1.json"))
    // and resolves against the repo root (where scripts/ lives), not
    // the caller's cwd — the driver does not cd into the repo
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(p).getParent))
  }

  test("heap band: >1.5x the documented capture heap is out of band") {
    assert(heapInBand(15.9, 16.0))
    assert(heapInBand(24.0, 16.0)) // exactly 1.5x still in band
    assert(!heapInBand(89.0, 16.0)) // the r16 driver capture
    assert(heapInBand(89.0, 0.0)) // band <= 0 disables the check
  }
}
