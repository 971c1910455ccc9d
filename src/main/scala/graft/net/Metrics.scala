package graft.net

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import scala.jdk.CollectionConverters._

/** Process-wide metrics registry with Prometheus text exposition —
  * the observability surface the reference gets from
  * `grpc_prometheus` + `promhttp` (reference `debug_server.go:45-47`,
  * `ingest_service.go:57-62`). Counters are `LongAdder` (write-hot,
  * contention-free); gauges are pull-time callbacks so queue depths
  * and permit counts are read at scrape time, not sampled.
  *
  * Label handling is deliberately minimal: a metric is keyed by
  * `name{label="value",...}` rendered eagerly at registration — the
  * cardinality discipline (few, bounded label values: message type,
  * result code) is the caller's job, same as any Prometheus client.
  */
final class Metrics {
  private val counters = new ConcurrentHashMap[String, LongAdder]()
  private val gauges = new ConcurrentHashMap[String, () => Double]()
  private val helps = new ConcurrentHashMap[String, String]()

  private def key(name: String, labels: Seq[(String, String)]): String =
    if (labels.isEmpty) name
    else labels.map { case (k, v) =>
      s"""$k="${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    }.mkString(s"$name{", ",", "}")

  def help(name: String, text: String): Unit = { helps.put(name, text); () }

  def counter(name: String, labels: (String, String)*): LongAdder =
    counters.computeIfAbsent(key(name, labels), _ => new LongAdder)

  def inc(name: String, labels: (String, String)*): Unit =
    counter(name, labels: _*).increment()

  def add(name: String, delta: Long, labels: (String, String)*): Unit =
    counter(name, labels: _*).add(delta)

  def gauge(name: String, labels: (String, String)*)(read: => Double): Unit = {
    gauges.put(key(name, labels), () => read); ()
  }

  def counterValue(name: String, labels: (String, String)*): Long = {
    val a = counters.get(key(name, labels))
    if (a == null) 0L else a.sum()
  }

  /** Prometheus text format 0.0.4: `# HELP` (when registered) + one
    * sample per series, sorted for a stable scrape.
    */
  def render(): String = {
    val sb = new StringBuilder
    val emitted = scala.collection.mutable.Set.empty[String]
    def base(k: String): String = k.indexOf('{') match {
      case -1 => k
      case i => k.substring(0, i)
    }
    def emitHelp(k: String, kind: String): Unit = {
      val b = base(k)
      if (emitted.add(b)) {
        val h = helps.get(b)
        if (h != null) sb.append(s"# HELP $b $h\n")
        sb.append(s"# TYPE $b $kind\n")
      }
    }
    counters.asScala.toSeq.sortBy(_._1).foreach { case (k, v) =>
      emitHelp(k, "counter")
      sb.append(k).append(' ').append(v.sum()).append('\n')
    }
    gauges.asScala.toSeq.sortBy(_._1).foreach { case (k, f) =>
      emitHelp(k, "gauge")
      val v = f()
      val s = if (v == v.toLong.toDouble) v.toLong.toString else v.toString
      sb.append(k).append(' ').append(s).append('\n')
    }
    sb.toString
  }
}

object Metrics {
  /** The default process registry (the reference's implicit
    * prometheus default registry).
    */
  val default: Metrics = new Metrics
}
