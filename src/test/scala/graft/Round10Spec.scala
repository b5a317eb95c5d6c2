package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 additions. Headline: the OCC commit lock moved from an
  * mtime-staleness takeover protocol (two waiters could both judge the
  * lock stale, leapfrog each other's fresh locks, and BOTH enter the
  * critical section — exactly the lost update commitIfCurrent exists to
  * prevent) to an OS [[java.nio.channels.FileLock]]: a crashed holder's
  * lock dies with its process, and a live-but-paused holder's lock can
  * never be stolen. These tests pin the two ends of that contract that
  * the round-9 racing test never exercised.
  */
class SnapshotLockSpec extends AnyFunSuite {
  import graft.sources.SnapshotStore

  test("crashed holder: a leftover _COMMIT_LOCK file is inert — no takeover wait, commit proceeds") {
    val root = TempDirs.create("graft_lock_crash_") + "/store"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    // simulate a writer that died after creating the lock FILE: the OS
    // lock it held was released by the kernel; only the inode remains
    java.nio.file.Files.createFile(java.nio.file.Paths.get(root, "_COMMIT_LOCK"))
    val t0 = System.currentTimeMillis()
    assert(SnapshotStore.commitIfCurrent(root, None, 1L))
    // under the old protocol this path slept lockTimeoutMs before the
    // staleness takeover; with an OS lock it is immediate
    assert(System.currentTimeMillis() - t0 < 5000)
    assert(SnapshotStore.currentVersion(root).contains(1L))
  }

  test("live holder is never stolen: a waiter times out OUTSIDE the critical section") {
    val root = TempDirs.create("graft_lock_hold_") + "/store"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    assert(SnapshotStore.commitIfCurrent(root, None, 1L))
    // a holder paused mid-commit (GC stall / debugger): model it by
    // holding the OS lock through an independent channel
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(root, "_COMMIT_LOCK"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE
    )
    val held = ch.lock()
    try {
      val ex = intercept[IllegalStateException] {
        SnapshotStore.commitIfCurrent(root, Some(1L), 2L, lockTimeoutMs = 300L)
      }
      assert(ex.getMessage.contains("commit lock"))
      // the paused holder's world is intact: no commit happened under it
      assert(SnapshotStore.currentVersion(root).contains(1L))
    } finally { held.release(); ch.close() }
    // once the holder releases, the same commit goes through
    assert(SnapshotStore.commitIfCurrent(root, Some(1L), 2L))
    assert(SnapshotStore.currentVersion(root).contains(2L))
  }
}
