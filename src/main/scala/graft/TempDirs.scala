package graft

import java.nio.file.{Files, Path}

/** Temp workspace directories for operator harnesses (stream sink runs,
  * store-maintenance scratch stores). Every dir created here is removed
  * recursively by a single JVM shutdown hook, so repeated bench + verify
  * invocations in one process don't accumulate orphaned parquet/state
  * dirs under /tmp (round-5 ADVICE item 4). Deletion happens at exit —
  * not eagerly — because several harnesses hand the path to a streaming
  * query whose sink outlives the operator call.
  */
object TempDirs {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { root =>
      try {
        Files
          .walk(root)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { try Files.deleteIfExists(p) catch { case _: Throwable => () } })
      } catch { case _: Throwable => () }
    }
  }))

  /** Create a fresh temp dir registered for exit-time recursive delete. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  /** Eagerly delete (and unregister) every registered dir whose NAME
    * contains `marker`. Bench calls this with `"_run_"` between queries:
    * per-run streaming dirs (sink + checkpoint + state, created fresh on
    * EVERY invocation, never cached) otherwise accumulate for the whole
    * bench process — hundreds of dirty-page-heavy dirs whose writeback
    * contends with later queries' state stores (the round-9/round-14
    * streaming-bench variance mode, SCALING.md). Cache-backing dirs
    * (staged inputs, prebuilt stores) use other prefixes and are never
    * touched. Returns the number of dirs removed.
    */
  def sweepMatching(marker: String): Int = {
    var n = 0
    val it = created.iterator()
    while (it.hasNext) {
      val root = it.next()
      if (root.getFileName.toString.contains(marker)) {
        try {
          Files
            .walk(root)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { try Files.deleteIfExists(p) catch { case _: Throwable => () } })
        } catch { case _: Throwable => () }
        it.remove()
        n += 1
      }
    }
    n
  }
}
