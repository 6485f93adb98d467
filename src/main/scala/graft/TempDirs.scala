package graft

import java.nio.file.{Files, Path}

/** Process-scoped scratch directories that actually get reaped.
  *
  * Gate queries with a persisted-index lifecycle (q74/q81), the bench
  * warm-up, and StoreBench all need a throwaway directory; bare
  * `Files.createTempDirectory` leaked them (r06 verdict finding 1 —
  * repeated correctness+bench+scale runs accumulated gigabytes under
  * /tmp). Every scratch dir is registered here and deleted recursively
  * by a single JVM shutdown hook; [[deleteAll]] is also callable
  * directly (tests, long-lived sessions).
  */
object TempDirs {
  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Create a scratch dir under java.io.tmpdir, reaped at JVM exit. */
  def scratch(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    register(p)
    p.toString
  }

  /** Register an existing dir for shutdown deletion. */
  def register(p: Path): Unit = {
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteAll(),
        "graft-tempdir-reaper"))
    registered.add(p)
  }

  /** Delete every registered dir now (idempotent; also the hook body). */
  def deleteAll(): Unit = {
    var p = registered.poll()
    while (p != null) {
      deleteRecursively(p)
      p = registered.poll()
    }
  }

  /** How many dirs are currently registered and not yet reaped. */
  def pending: Int = registered.size()

  private def deleteRecursively(p: Path): Unit =
    try {
      // NOFOLLOW: a symlink to a directory outside the scratch tree must
      // be deleted as a link, never descended into (walkFileTree's
      // default no-follow semantics).
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively(_))
        finally children.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: java.io.IOException => () } // best-effort reaping
}
