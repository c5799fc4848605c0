package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for [[Staging.persistent]] — the cross-JVM,
  * fingerprint-keyed staging behind the shingle-relation parquet cache.
  * The properties that matter: build-once (the writer runs exactly once
  * per (tag, key, fingerprint), every later call reuses the published
  * dir), staleness (a CHANGED fingerprint re-builds into a different
  * dir — a rewritten fixture can never serve a stale read), and
  * publish atomicity (readers only ever see a dir with the _STAGED
  * marker; a half-written unmarked dir is replaced, not trusted). */
class StagingSpec extends AnyFunSuite {

  private def freshKey(): String =
    s"/spec/fixture-${java.util.UUID.randomUUID()}"

  test("persistent builds once and reuses the published dir") {
    val key = freshKey()
    var builds = 0
    def call(): String = Staging.persistent("spec", key, "fp1") { out =>
      builds += 1
      Files.writeString(Paths.get(out, "payload"), "v1")
    }
    val d1 = call()
    val d2 = call()
    assert(d1 == d2)
    assert(builds == 1)
    assert(Files.exists(Paths.get(d1, "_STAGED")))
    assert(Files.readString(Paths.get(d1, "payload")) == "v1")
  }

  test("a changed fingerprint re-builds into a different dir") {
    val key = freshKey()
    val d1 = Staging.persistent("spec", key, "fp-a") { out =>
      Files.writeString(Paths.get(out, "payload"), "a")
    }
    val d2 = Staging.persistent("spec", key, "fp-b") { out =>
      Files.writeString(Paths.get(out, "payload"), "b")
    }
    assert(d1 != d2, "stale dir served for a rewritten fixture")
    assert(Files.readString(Paths.get(d1, "payload")) == "a")
    assert(Files.readString(Paths.get(d2, "payload")) == "b")
  }

  test("unmarked debris at the destination is replaced, not trusted") {
    val key = freshKey()
    // compute the destination the same way persistent() does, and plant
    // a marker-less half-written dir there (a killed builder's shape)
    val h = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"$key@fp"))
    val safeKey = key.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(80)
    val dest = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-persist-spec-$safeKey-$h")
    Files.createDirectories(dest)
    Files.writeString(dest.resolve("payload"), "HALF-WRITTEN")
    val d = Staging.persistent("spec", key, "fp") { out =>
      Files.writeString(Paths.get(out, "payload"), "rebuilt")
    }
    assert(d == dest.toString)
    assert(Files.readString(Paths.get(d, "payload")) == "rebuilt")
    assert(Files.exists(Paths.get(d, "_STAGED")))
  }

  test("fingerprintOf tracks file size and mtime") {
    val f = Files.createTempFile("graft-fp", ".bin")
    Files.writeString(f, "12345")
    val fp1 = Staging.fingerprintOf(f.toString)
    Files.writeString(f, "123456")
    val fp2 = Staging.fingerprintOf(f.toString)
    assert(fp1 != fp2)
    assert(Staging.fingerprintOf("/definitely/not/there") == "absent")
  }
}
