package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Part-directory maintenance shared by the landed-table sinks: an
  * atomic replace-on-swap (write the replacement beside the live dir,
  * then two ATOMIC_MOVEs) and recursive deletion. Maintenance-path
  * operations — callers must not race an active writer, the same rule
  * a MergeTree background merge enforces with part locks.
  */
object Parts {

  /** Build a replacement for `dir` (the callback writes it at the
    * given temp path) and swap it in atomically. Crash-safe across
    * retries: a stale `.swap-tmp` is garbage from an interrupted
    * build; a missing live dir with `.swap-old` present means a crash
    * hit between the two moves — the old data is restored before
    * proceeding, so a re-run always starts from a live table instead
    * of failing on leftovers (or worse, leaving no table at all).
    */
  def swapIn(dir: String, writeReplacement: String => Unit): Unit = {
    val live = Paths.get(dir)
    val tmp = live.resolveSibling(live.getFileName.toString + ".swap-tmp")
    val old = live.resolveSibling(live.getFileName.toString + ".swap-old")
    deleteTree(tmp)
    if (!Files.exists(live) && Files.exists(old))
      Files.move(old, live, StandardCopyOption.ATOMIC_MOVE)
    deleteTree(old)
    writeReplacement(tmp.toString)
    Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    deleteTree(old)
  }

  def deleteTree(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      val entries = try walk.iterator().asScala.toSeq finally walk.close()
      entries.sortBy(-_.getNameCount).foreach(f => Files.deleteIfExists(f))
    }
  }
}
