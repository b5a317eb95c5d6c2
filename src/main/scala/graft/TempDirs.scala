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
}
