package graft.sources

/** Per-JVM memoization for the one-time TEMP-DIR store builds behind
  * the stored-leg queries (q106/q187/q188/q190/q192–q194/q197):
  * `TrieMap.getOrElseUpdate` is NOT atomic for side-effecting
  * builders — two threads evaluating the same key concurrently would
  * each build a full store with one silently discarded, and the loser
  * the single-writer [[LedgerStore]] lock would instead fail LOUDLY
  * (ADVICE r13). Builds therefore serialize on a per-key monitor with
  * a re-check inside it (distinct keys still build concurrently), and
  * every created temp directory registers for deletion at JVM
  * shutdown so Verify/Bench/test runs stop accumulating /tmp state.
  */
object StoreMemo {

  private val dirs =
    new scala.collection.concurrent.TrieMap[String, String]()
  // TrieMap.getOrElseUpdate stores exactly one value per key (CAS
  // inside), so every caller sees the same monitor even if the
  // side-effect-free `new Object` races
  private val locks =
    new scala.collection.concurrent.TrieMap[String, Object]()
  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(
      () => created.forEach { d =>
        try graft.streaming.Parts.deleteTree(java.nio.file.Paths.get(d))
        catch { case _: Throwable => () }
      },
      "graft-storememo-cleanup"))

  /** The memoized store directory for `key`, building it AT MOST ONCE
    * per JVM. `build` receives a fresh temp directory (prefix-named,
    * shutdown-registered) and must leave it committed.
    */
  def tempStore(key: String, prefix: String)(
      build: String => Unit): String = {
    val lock = locks.getOrElseUpdate(key, new Object)
    lock.synchronized {
      dirs.get(key) match {
        case Some(d) => d
        case None =>
          hookInstalled
          val out =
            java.nio.file.Files.createTempDirectory(prefix).toString
          created.add(out)
          build(out)
          dirs.put(key, out)
          out
      }
    }
  }
}
