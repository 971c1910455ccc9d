package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-record degradation ladder (VERDICT r11 #2 + ADVICE
  * r11 #3): every rung must keep the one stdout line under the
  * harness's ~1950-char capture, the next growth wave (a 160-query
  * surface) must fit with real slack, and an overflow of even the last
  * rung must WARN instead of silently printing a decapitated record.
  */
class BenchRecordSpec extends AnyFunSuite {

  /** Synthetic surface shaped like the real one: qNN_snake_names with
    * 1-3 digit numbers and two-digit-second values (worst-ish widths).
    */
  private def surface(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%02d_some_operator_name", (i % 37) + 0.87))

  private def choose(results: Seq[(String, Double)],
      warnings: StringBuilder = new StringBuilder): String =
    BenchRecord.choose(results, failedJson = "[]",
      total = results.map(_._2).sum,
      // the r16 fixed block at its real widths: five throughput legs
      // (each with its kept-rep ext/steal witness), ratio, rtt pair,
      // store_build1 (8 stores) + build_method marker
      fixed = ""","ingest":{"rows_per_sec":671234,"ext":0.31,"steal":0.04},""" +
        """"wire_ingest":{"rows_per_sec":1130000,"ext":0.02,"steal":0.11},""" +
        """"grpc_ingest":{"rows_per_sec":668000,"ext":0.03,"steal":0.02},""" +
        """"grpc_unary":{"rows_per_sec":852000,"ext":0.01,"steal":0.05},""" +
        """"jdbc_ingest":{"rows_per_sec":55000,"ext":0.24,"steal":0.03},""" +
        """"grpc_wire_ratio":0.59,""" +
        """"wire_rtt_ms":0.094,"grpc_rtt_ms":0.285,""" +
        """"store_build1":{"106":8.94,"187":7.63,"188":3.73,"190":8.08,""" +
        """"192":2.94,"193":2.06,"194":2.53,"197":2.87},""" +
        """"build_method":"single1"""",
      extras = ""","zorder":[6,53,53,53],"landed":{"q01":[1.86,0.42],""" +
        """"q03":[1.90,0.55],"q13":[0.80,0.30],"q14":[0.40,0.10],""" +
        """"q34":[0.40,0.20]}""",
      // the r16 tail at its real widths: the six witness maxima, the
      // burst-window marker, and the capture-environment stamps
      tail = ""","load1":0.26,"ext_max":0.41,"io_psi":0.00,""" +
        """"mem_psi":0.00,"cpu_psi":0.04,"steal":0.21,"gc_frac":0.06,""" +
        """"ext_win":1.5,"reps":1,"harness":"run.sh","heap_gb":16.00,""" +
        """"sf":"/root/testdata/sf0.1"""",
      warn = m => { warnings ++= m; () })

  test("the current 147-query surface fits (some rung) under the cap") {
    val r = choose(surface(147))
    assert(r.length <= BenchRecord.MaxChars)
    assert(r.startsWith("{\"metric\":\"total\""))
    assert(r.contains("\"ext_max\":0.41"))
    assert(r.contains("\"grpc_wire_ratio\":0.59"))
  }

  test("a 160-query surface fits with >= 100 chars of slack") {
    val r = choose(surface(160))
    assert(r.length <= BenchRecord.MaxChars - 100,
      s"record is ${r.length} chars; need <= ${BenchRecord.MaxChars - 100}")
  }

  test("the current 166-query surface and the next wave (175) keep slack") {
    for (n <- Seq(166, 175)) {
      val r = choose(surface(n))
      assert(r.length <= BenchRecord.MaxChars - 100,
        s"$n-query record is ${r.length} chars; " +
          s"need <= ${BenchRecord.MaxChars - 100}")
    }
  }

  test("every query keeps a number in the artifact through 250 queries") {
    // the registry-ordered value-array rung must engage before any
    // query is dropped: full per-query coverage (a value per query,
    // no q_dropped) has to survive well past the current 198 surface —
    // 198 is the frozen surface of record and must fit with the FULL
    // r16 fixed/tail widths
    for (n <- Seq(175, 198, 250)) {
      val r = choose(surface(n))
      assert(r.length <= BenchRecord.MaxChars - 100, s"n=$n len ${r.length}")
      assert(!r.contains("\"q_dropped\":"), s"n=$n dropped queries:\n$r")
      if (r.contains("\"queries\":{\"v\":[")) {
        // array rung: exactly n values, registry order preserved
        val vals = r.substring(r.indexOf("{\"v\":[") + 6,
          r.indexOf("]}", r.indexOf("{\"v\":[")))
        assert(vals.split(',').length == n, s"n=$n value count")
      }
    }
  }

  test("leg witnesses survive at the frozen 198 surface, strip at 250") {
    // the per-leg ext/steal stamps are evidence and must ride the
    // record at the REAL surface; at pressure they yield to per-query
    // coverage (rung 6) instead of queries getting dropped
    val r198 = choose(surface(198))
    assert(r198.contains(""""ingest":{"rows_per_sec":671234,"ext":0.31"""),
      s"leg witness missing at 198:\n$r198")
    val r250 = choose(surface(250))
    assert(r250.contains(""""ingest":{"rows_per_sec":671234}"""),
      s"leg witness not stripped at 250:\n$r250")
    assert(!r250.contains("\"q_dropped\":"))
    // the tail's capture-wide witness keys must survive the strip —
    // the regex targets only the legs' ",ext"/",steal" pairs
    assert(r250.contains("\"ext_max\":"))
    assert(r250.contains("\"steal\":0.21"))
  }

  test("a small surface stays on the verbose rung: 2 dp + extras, no warning") {
    val w = new StringBuilder
    val r = choose(surface(20), w)
    assert(r.contains("\"zorder\":"))
    assert(r.contains("\"q01\":"))
    assert(w.isEmpty)
  }

  test("rungs strip prefixes before dropping queries; drops are marked") {
    // find the first size where queries get dropped, and check the
    // q_dropped marker plus warning appear — and that at 200 queries
    // stripped keys (rung 4) are tried before dropping
    val w200 = new StringBuilder
    val r200 = choose(surface(200), w200)
    assert(r200.length <= BenchRecord.MaxChars)
    if (r200.contains("\"q_dropped\":")) assert(w200.nonEmpty)
    val w400 = new StringBuilder
    val r400 = choose(surface(400), w400)
    assert(r400.length <= BenchRecord.MaxChars)
    assert(r400.contains("\"q_dropped\":370"))
    assert(w400.nonEmpty)
  }

  test("every rung emits valid JSON with the fixed blocks intact") {
    for (n <- Seq(10, 147, 160, 200, 400)) {
      val r = choose(surface(n))
      // cheap structural checks (no JSON lib on the test classpath):
      // balanced braces, the trailing sf key, one top-level object
      assert(r.count(_ == '{') == r.count(_ == '}'), s"n=$n braces")
      assert(r.endsWith("\"sf\":\"/root/testdata/sf0.1\"}"), s"n=$n tail")
      assert(r.contains("\"failed\":[]"), s"n=$n failed")
    }
  }

  private def chooseWithTail(tail: String,
      warnings: StringBuilder): String =
    BenchRecord.choose(surface(198), failedJson = "[]", total = 230.0,
      fixed = ""","ingest":{"rows_per_sec":671234,"ext":0.31,"steal":0.94},""" +
        """"wire_ingest":{"rows_per_sec":1130000,"ext":0.02,"steal":0.81},""" +
        """"grpc_ingest":{"rows_per_sec":668000,"ext":0.03,"steal":0.72},""" +
        """"grpc_unary":{"rows_per_sec":852000,"ext":0.01,"steal":0.65},""" +
        """"jdbc_ingest":{"rows_per_sec":55000,"ext":0.24,"steal":0.43},""" +
        """"grpc_wire_ratio":0.59,""" +
        """"wire_rtt_ms":0.094,"grpc_rtt_ms":0.285,""" +
        """"store_build1":{"106":8.94,"187":7.63,"188":3.73,"190":8.08,""" +
        """"192":2.94,"193":2.06,"194":2.53,"197":2.87},""" +
        """"build_method":"single1"""",
      extras = ""","zorder":[6,53,53,53],"landed":{"q01":[1.86,0.42],""" +
        """"q03":[1.90,0.55],"q13":[0.80,0.30],"q14":[0.40,0.10],""" +
        """"q34":[0.40,0.20]}""",
      tail = tail,
      warn = m => { warnings ++= m; () })

  test("an r16-driver-shaped inflated tail keeps full per-query coverage") {
    // the realistic bad capture (the shape BENCH_r16 actually
    // shipped, plus the new evidence keys at observed sizes): all six
    // maxima, a few ext_top/ext_self entries, six over_band stamps +
    // overflow count, out-of-band heap, fork harness — per-query
    // coverage must survive (no top-30/q_dropped fallback)
    val tail =
      ""","load1":0.40,"ext_max":0.28,"io_psi":0.00,"mem_psi":0.00,""" +
        """"cpu_psi":0.07,"steal":0.37,"gc_frac":0.07,""" +
        """"ext_top":{"48":0.28,"41":0.26},""" +
        """"ext_self":{"hum":0.01,"48":0.28,"41":0.26},""" +
        """"over_band":{"110":4.02,"102":8.73,"76":5.19,"75":6.92,""" +
        """"130":2.25,"65":2.43},"over_band_n":11,""" +
        """"ext_win":1.5,"reps":4,"harness":"fork","heap_gb":89.00,""" +
        """"heap_band":false,"sf":"/root/testdata/sf0.1""""
    val w = new StringBuilder
    val r = chooseWithTail(tail, w)
    assert(r.length <= BenchRecord.MaxChars)
    assert(!r.contains("\"q_dropped\":"),
      s"realistic inflated tail fell to q_dropped (${r.length} chars)")
    assert(r.contains("\"over_band\":") && r.contains("\"heap_band\""))
  }

  test("the every-vector-at-cap torture tail keeps all evidence keys") {
    // all five vectors at their caps at once + both overflow counts:
    // beyond any full rung by construction — the ladder may fall to
    // the top-30 fallback, but every evidence key must ride along
    // (the full per-query map is on stderr) and the record must stay
    // under the cap with the fallback marked
    val tail =
      ""","load1":6.52,"ext_max":1.58,"io_psi":0.12,"mem_psi":0.08,""" +
        """"cpu_psi":0.44,"steal":1.57,"gc_frac":0.21,""" +
        """"ext_top":{"110":1.58,"111":1.44,"159":1.31,"85":1.20},""" +
        """"ext_self":{"hum":0.05,"48":1.58,"41":1.44,"33":0.79,""" +
        """"35":0.54,"100":0.48,"64":0.41,"24":0.38,"159":0.31},""" +
        """"ext_self_n":14,""" +
        """"psi_top":{"110":0.12,"24":0.11,"37":0.11,"55":0.10},""" +
        """"cpu_top":{"110":0.44,"159":0.41,"111":0.38,"85":0.33},""" +
        """"gc_top":{"93":0.21,"95":0.19,"88":0.17,"167":0.16},""" +
        """"over_band":{"110":4.02,"102":8.73,"76":5.19,"75":6.92,""" +
        """"130":2.25,"65":2.43},"over_band_n":24,""" +
        """"ext_win":1.5,"reps":11,"harness":"fork","heap_gb":89.00,""" +
        """"heap_band":false,"sf":"/root/testdata/sf0.1""""
    val w = new StringBuilder
    val r = chooseWithTail(tail, w)
    assert(r.length <= BenchRecord.MaxChars)
    for (k <- Seq("\"over_band\":", "\"over_band_n\":", "\"ext_self_n\":",
        "\"cpu_top\":", "\"gc_top\":", "\"heap_band\""))
      assert(r.contains(k), s"evidence key $k lost")
    if (r.contains("\"q_dropped\":")) assert(w.nonEmpty)
  }

  test("harnessOf separates run.sh from an sbt-forked bare-class JVM") {
    // run.sh: declares itself via -Dgraft.harness (a bare-class
    // command is NOT enough — sbt's fork carries the same one, and
    // the JVM expands the -cp wildcard before java.class.path is set,
    // so no JVM-side artifact disambiguates; the r16 driver capture,
    // sbt-forked at 89 g, stamped "run.sh" under the command-only rule)
    assert(BenchRecord.harnessOf("graft.Bench", Some("run.sh"))
      == "run.sh")
    // sbt `run / fork := true`: SAME bare class, no marker
    assert(BenchRecord.harnessOf("graft.Bench", None) == "fork")
    // a present-but-blank marker must not stamp an empty harness
    assert(BenchRecord.harnessOf("graft.Bench", Some(" ")) == "fork")
    // in-process sbt launcher (no fork): command is sbt's own main
    assert(BenchRecord.harnessOf(
      "xsbt.boot.Boot -batch runMain graft.Bench", None) == "sbt")
    assert(BenchRecord.harnessOf("some.other.Main", None) == "other")
  }
}
