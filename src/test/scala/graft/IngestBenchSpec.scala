package graft

/** IngestBench smoke: the throughput path lands exactly the rows it
  * was fed (the values themselves are q25-oracle-verified through the
  * same encode→decode→bind→transcode code).
  */
class IngestBenchSpec extends SparkSpec {
  test("lands exactly n rows and reports a positive wall time") {
    val (rows, sec) = IngestBench.run(spark, rows = 2000L, msgsPerFrame = 16)
    assert(rows == 2000L)
    assert(sec > 0.0)
  }
}
