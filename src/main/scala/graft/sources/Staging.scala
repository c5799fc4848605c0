package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

/** Staging-directory manager for the sources/sinks that round-trip a table
  * through local files (JSON/ORC/binary-file/partitioned demos, streaming
  * file sources). Two disciplines, both cleaned up:
  *
  *  - [[once]] — a FIXED path per (tag, key), emptied and rewritten on the
  *    first use in a JVM, memoized afterwards: re-runs overwrite instead of
  *    accumulating a fresh copy of the table per invocation, and a second
  *    query sharing the same staged relation reuses it for free.
  *  - [[fresh]] — a unique dir per call, for streaming sources whose
  *    contents evolve during the run (data files + drain sentinels) and so
  *    must never be reused.
  *
  * Every dir from either path is registered and deleted recursively by a
  * JVM shutdown hook, so bench/verify runs leave nothing behind (the
  * round-3 ADVICE leak: per-invocation temp dirs holding full table
  * copies, never deleted).
  */
object Staging {

  private val registered = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[Path, java.lang.Boolean]())
  private val stagedOnce = new ConcurrentHashMap[(String, String), String]()

  sys.addShutdownHook {
    registered.forEach(deleteRecursively(_))
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally s.close()
    }

  private def register(p: Path): Path = { registered.add(p); p }

  /** One token per JVM: concurrent graft processes (bench + verify, forked
    * test JVMs) must not share staged dirs — a fixed cross-process name
    * would let one process's delete-then-rewrite race another's read. */
  private val jvmToken = java.lang.Long.toHexString(
    java.lang.ProcessHandle.current().pid())

  /** The fixed (within this JVM), emptied staging dir for (tag, key) —
    * stable name per process so a re-stage within a run overwrites instead
    * of accumulating. The key itself (sanitized) is part of the name, so
    * distinct keys can never collide the way a bare 32-bit hash could; the
    * hash is kept only to disambiguate keys that sanitize identically. */
  private def fixedDir(tag: String, key: String): Path = {
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(key))
    val safeKey = key.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(80)
    val p = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-stage-$jvmToken-$tag-$safeKey-$h")
    deleteRecursively(p)
    Files.createDirectories(register(p))
  }

  /** Stage once per JVM per (tag, key): the first call materializes via
    * `write` into the fixed dir; later calls reuse the staged copy. */
  def once(tag: String, key: String)(write: String => Unit): String =
    stagedOnce.computeIfAbsent((tag, key), _ => {
      val d = fixedDir(tag, key).toString
      write(d)
      d
    })

  /** A unique single-use dir (streaming sources/sentinels), cleaned at
    * JVM exit like everything else. */
  def fresh(tag: String): String =
    register(Files.createTempDirectory(s"graft-$tag")).toString
}
