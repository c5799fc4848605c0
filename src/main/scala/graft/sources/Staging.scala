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

  /** CROSS-JVM persistent staging for derived relations whose build is a
    * one-time cost per FIXTURE, not per process — the qad/qb2 shape: the
    * shared shingle/content relation over a 100×-unique corpus costs
    * ~18 min to build and was re-paid by every fresh JVM, while the
    * derivation is a pure function of the input files. The dir name
    * carries a caller-supplied FINGERPRINT of the inputs (size + mtime),
    * so a rewritten fixture at the same path gets a fresh build, never a
    * stale read. Crash/concurrency-safe: builders write into a private
    * temp dir and atomically move it into place, readers only trust a dir
    * containing the _STAGED marker (a half-written dir from a killed
    * builder is invisible), and a lost publish race defers to the winner.
    * Deliberately NOT registered for shutdown deletion — surviving the
    * JVM is the point; the fingerprint keying makes leftovers inert. */
  def persistent(tag: String, key: String, fingerprint: String)
      (write: String => Unit): String =
    stagedOnce.computeIfAbsent((s"persist-$tag", s"$key@$fingerprint"), _ => {
      val h = Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(s"$key@$fingerprint"))
      val safeKey = key.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(80)
      val dest = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft-persist-$tag-$safeKey-$h")
      val marker = dest.resolve("_STAGED")
      if (!Files.exists(marker)) {
        val tmp = Files.createTempDirectory(
          dest.getParent, s"graft-persist-build-$jvmToken-")
        write(tmp.toString)
        Files.writeString(tmp.resolve("_STAGED"), fingerprint)
        try {
          Files.move(tmp, dest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.FileSystemException =>
            // another process published first (or a stale dir without a
            // marker is in the way): defer to a marked winner, else
            // replace the unmarked debris
            if (Files.exists(marker)) deleteRecursively(tmp)
            else {
              deleteRecursively(dest)
              Files.move(tmp, dest,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            }
        }
      }
      dest.toString
    })

  /** Size+mtime fingerprint of a fixture file or directory tree — the
    * staleness key for [[persistent]]. */
  def fingerprintOf(path: String): String = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return "absent"
    if (Files.isRegularFile(p))
      return s"${Files.size(p)}-${Files.getLastModifiedTime(p).toMillis}"
    val s = Files.walk(p)
    try {
      val acc = s.filter(Files.isRegularFile(_)).toArray.map {
        case f: Path => Files.size(f) + Files.getLastModifiedTime(f).toMillis
      }
      s"${acc.length}-${acc.sum}"
    } finally s.close()
  }
}
