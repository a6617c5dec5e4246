package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Scratch-directory hygiene for operators that need a temp directory
  * (the S9 layout round-trip, streaming checkpoints, sketch
  * persistence). Two lifecycles:
  *
  *  - [[dir]] — create a temp dir registered for deletion at JVM exit.
  *    For dirs a still-lazy DataFrame reads from (deleting eagerly
  *    would break the caller's plan); the hook keeps a long-lived
  *    bench/verify host's /tmp flat across runs.
  *  - [[delete]] — eager recursive delete, for dirs whose contents
  *    have already been consumed (a collected memory sink's
  *    checkpoint, a localCheckpoint'ed read-back).
  *
  * One shutdown hook total (registered on first use), not one per dir:
  * hooks are never unregistered, so a per-dir hook would leak a thread
  * registration per query invocation on a long-lived host.
  */
object Scratch {

  private val pending = ConcurrentHashMap.newKeySet[Path]()

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      pending.forEach(p => deleteRecursively(p))))
  }

  /** Temp dir deleted at JVM exit (if still present). */
  def dir(prefix: String): Path = {
    hook
    val p = Files.createTempDirectory(prefix)
    pending.add(p)
    p
  }

  /** Eager recursive delete; also deregisters the exit-time cleanup. */
  def delete(p: Path): Unit = {
    pending.remove(p)
    deleteRecursively(p)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      // deepest-first walk; best-effort (a vanished file is fine). The
      // walk stream holds open directory handles — close it explicitly,
      // or a long-lived bench/verify host leaks a descriptor per delete.
      val s = Files.walk(p)
      try {
        s.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => try Files.deleteIfExists(f) catch {
            case _: java.io.IOException => ()
          })
      } finally s.close()
    }
}
