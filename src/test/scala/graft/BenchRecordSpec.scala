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

  /** Values at the REAL capture's widths (BENCH_r17: 197 of 198 slots
    * print 3 chars at 1 dp) — the rung-fitting tests for the actual
    * 198-surface behavior must not be skewed by synthetic 2-digit
    * seconds.
    */
  private def realSurface(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%02d_some_operator_name", (i % 9) / 10.0 + 0.27))

  // the r16 fixed block at its real widths: five throughput legs
  // (each with its kept-rep ext/steal witness), ratio, rtt pair
  private val realFixed =
    ""","ingest":{"rows_per_sec":671234,"ext":0.31,"steal":0.04},""" +
      """"wire_ingest":{"rows_per_sec":1130000,"ext":0.02,"steal":0.11},""" +
      """"grpc_ingest":{"rows_per_sec":668000,"ext":0.03,"steal":0.02},""" +
      """"grpc_unary":{"rows_per_sec":852000,"ext":0.01,"steal":0.05},""" +
      """"jdbc_ingest":{"rows_per_sec":55000,"ext":0.24,"steal":0.03},""" +
      """"grpc_wire_ratio":0.59,""" +
      """"wire_rtt_ms":0.094,"grpc_rtt_ms":0.285"""
  private val realExtras =
    ""","zorder":[6,53,53,53],"landed":{"q01":[1.86,0.42],""" +
      """"q03":[1.90,0.55],"q13":[0.80,0.30],"q14":[0.40,0.10],""" +
      """"q34":[0.40,0.20]}"""
  // store_build1 now rides the witness block (VERDICT r17 #4: named
  // per-query keys outrank the witness vectors on the contract line)
  private val realWitness =
    ""","store_build1":{"106":8.94,"187":7.63,"188":3.73,"190":8.08,""" +
      """"192":2.94,"193":2.06,"194":2.53,"197":2.87},""" +
      """"build_method":"single1""""

  private def choose(results: Seq[(String, Double)],
      warnings: StringBuilder = new StringBuilder): String =
    BenchRecord.choose(results, failedJson = "[]",
      total = results.map(_._2).sum,
      fixed = realFixed,
      extras = realExtras,
      witness = realWitness,
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

  test("leg witnesses survive at the frozen 198 surface, strip under pressure") {
    // the per-leg ext/steal stamps are evidence and must ride the
    // record at the REAL surface; at pressure they yield to per-query
    // coverage (the compact-fixed rung) instead of queries dropping
    val r198 = choose(surface(198))
    assert(r198.contains(""""ingest":{"rows_per_sec":671234,"ext":0.31"""),
      s"leg witness missing at 198:\n$r198")
    // find the first surface size whose record needed the strip: it
    // must exist (the compact-fixed rung engages before the top-30
    // fallback), keep full per-query coverage, and keep the tail's
    // capture-wide witness keys (the regex targets only the legs'
    // ",ext"/",steal" pairs)
    val stripN = (200 to 430).find(n =>
      choose(surface(n)).contains(""""ingest":{"rows_per_sec":671234}"""))
    assert(stripN.nonEmpty, "no surface size engaged the compact-fixed rung")
    val r = choose(surface(stripN.get))
    assert(!r.contains("\"q_dropped\":"),
      s"strip engaged only at the drop fallback (n=${stripN.get})")
    assert(r.contains("\"ext_max\":"))
    assert(r.contains("\"steal\":0.21"))
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

  private def chooseWithWitness(witness: String, tail: String,
      warnings: StringBuilder, n: Int = 198): String =
    BenchRecord.choose(realSurface(n), failedJson = "[]", total = 230.0,
      fixed = ""","ingest":{"rows_per_sec":671234,"ext":0.31,"steal":0.94},""" +
        """"wire_ingest":{"rows_per_sec":1130000,"ext":0.02,"steal":0.81},""" +
        """"grpc_ingest":{"rows_per_sec":668000,"ext":0.03,"steal":0.72},""" +
        """"grpc_unary":{"rows_per_sec":852000,"ext":0.01,"steal":0.65},""" +
        """"jdbc_ingest":{"rows_per_sec":55000,"ext":0.24,"steal":0.43},""" +
        """"grpc_wire_ratio":0.59,""" +
        """"wire_rtt_ms":0.094,"grpc_rtt_ms":0.285"""",
      extras = realExtras,
      witness = witness,
      tail = tail,
      warn = m => { warnings ++= m; () })

  test("an r16-driver-shaped inflated capture keeps full per-query coverage") {
    // the realistic bad capture (the shape BENCH_r16 actually
    // shipped, plus the evidence keys at observed sizes): all six
    // maxima in the tail, a few ext_top/ext_self entries, six
    // over_band stamps + overflow count in the witness block,
    // out-of-band heap, fork harness — per-query coverage must
    // survive (no top-30/q_dropped fallback) and the witness evidence
    // must still ride the (value-array) record
    val witness =
      ""","ext_top":{"48":0.28,"41":0.26},""" +
        """"ext_self":{"hum":0.01,"48":0.28,"41":0.26},""" +
        """"over_band":{"110":4.02,"102":8.73,"76":5.19,"75":6.92,""" +
        """"130":2.25,"65":2.43},"over_band_n":11""" + realWitness
    val tail =
      ""","load1":0.40,"ext_max":0.28,"io_psi":0.00,"mem_psi":0.00,""" +
        """"cpu_psi":0.07,"steal":0.37,"gc_frac":0.07,""" +
        """"ext_win":1.5,"reps":4,"harness":"fork","heap_gb":89.00,""" +
        """"heap_band":false,"sf":"/root/testdata/sf0.1""""
    val w = new StringBuilder
    val r = chooseWithWitness(witness, tail, w)
    assert(r.length <= BenchRecord.MaxChars)
    assert(!r.contains("\"q_dropped\":"),
      s"realistic inflated capture fell to q_dropped (${r.length} chars)")
    assert(r.contains("\"over_band\":") && r.contains("\"heap_band\""))
  }

  test("the every-vector-at-cap torture witness keeps all evidence keys") {
    // all five vectors at their caps at once + both overflow counts:
    // beyond any full rung by construction — the ladder may fall to
    // the top-30 fallback, but every evidence key must ride along
    // (the full per-query map is on stderr) and the record must stay
    // under the cap with the fallback marked
    val witness =
      ""","ext_top":{"110":1.58,"111":1.44,"159":1.31,"85":1.20},""" +
        """"ext_self":{"hum":0.05,"48":1.58,"41":1.44,"33":0.79,""" +
        """"35":0.54,"100":0.48,"64":0.41,"24":0.38,"159":0.31},""" +
        """"ext_self_n":14,""" +
        """"psi_top":{"110":0.12,"24":0.11,"37":0.11,"55":0.10},""" +
        """"cpu_top":{"110":0.44,"159":0.41,"111":0.38,"85":0.33},""" +
        """"gc_top":{"93":0.21,"95":0.19,"88":0.17,"167":0.16},""" +
        """"over_band":{"110":4.02,"102":8.73,"76":5.19,"75":6.92,""" +
        """"130":2.25,"65":2.43},"over_band_n":24""" + realWitness
    val tail =
      ""","load1":6.52,"ext_max":1.58,"io_psi":0.12,"mem_psi":0.08,""" +
        """"cpu_psi":0.44,"steal":1.57,"gc_frac":0.21,""" +
        """"ext_win":1.5,"reps":11,"harness":"fork","heap_gb":89.00,""" +
        """"heap_band":false,"sf":"/root/testdata/sf0.1""""
    val w = new StringBuilder
    // a 400-query surface pushes even the value-array rungs past the
    // cap, forcing the top-30 fallback — which must carry the witness
    // evidence (on exactly the captures where it matters most)
    val r = chooseWithWitness(witness, tail, w, n = 400)
    assert(r.length <= BenchRecord.MaxChars)
    assert(r.contains("\"q_dropped\":"), s"expected fallback (${r.length})")
    assert(w.nonEmpty)
    for (k <- Seq("\"over_band\":", "\"over_band_n\":", "\"ext_self_n\":",
        "\"cpu_top\":", "\"gc_top\":", "\"heap_band\""))
      assert(r.contains(k), s"evidence key $k lost in fallback")
    // at the REAL 198 surface the same torture witness must keep
    // per-query coverage (value-array rung) AND the evidence
    val w198 = new StringBuilder
    val r198 = chooseWithWitness(witness, tail, w198)
    assert(r198.length <= BenchRecord.MaxChars)
    assert(!r198.contains("\"q_dropped\":"),
      s"198-surface torture witness dropped queries (${r198.length})")
  }

  test("witness vectors yield before named per-query keys do") {
    // a surface small enough that named 1-dp keys fit WITHOUT the
    // witness block but not with it: the ladder must print named keys
    // and drop the witness vectors (they live in the sidecar/stderr),
    // never the reverse (VERDICT r17 #4)
    val witness = ("," + (1 to 40).map(i =>
      s""""w$i":{"110":4.02,"102":8.73,"76":5.19}""").mkString(","))
    val w = new StringBuilder
    val r = chooseWithWitness(witness, ""","sf":"/x"""", w, n = 60)
    assert(r.length <= BenchRecord.MaxChars)
    assert(r.contains("\"01\":") || r.contains("\"q01\":"),
      s"named keys lost while witness vectors rode:\n$r")
    assert(!r.contains("\"w1\":"),
      "witness vectors survived at the cost of named keys")
    assert(!r.contains("\"queries\":{\"v\":["),
      "fell to the nameless value array while dropping the witness " +
        "would have kept named keys")
  }

  test("sidecar carries every query by FULL name at 3 dp") {
    val sc = BenchRecord.sidecar(surface(198), "[]", 230.0, 32,
      realFixed, realExtras, realWitness,
      ""","load1":0.26,"sf":"/root/testdata/sf0.1"""")
    assert(sc.contains("\"q01_some_operator_name\":1.870"))
    assert(sc.contains("\"q198_some_operator_name\":"))
    assert(sc.contains("\"cpus\":32"))
    assert(sc.contains("\"store_build1\":"))
    assert(sc.count(_ == '{') == sc.count(_ == '}'))
    assert(sc.startsWith("{\"metric\":\"total\""))
    assert(sc.endsWith("\"sf\":\"/root/testdata/sf0.1\"}"))
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
