package graft.core

/** Filesystem helpers shared by the artifact stores (GraphCache's
  * per-JVM checkpoint tree, IndexStore's cross-JVM publish root) —
  * previously duplicated verbatim in both (r9 review). */
object Fs {

  /** Best-effort recursive delete: never throws, deletes leaves first. */
  def deleteTree(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(f => try java.nio.file.Files.deleteIfExists(f)
                        catch { case _: Throwable => () })
    } catch { case _: Throwable => () }

  /** Stable 16-hex-char fingerprint of an artifact key, appended to the
    * sanitized path segment: sanitization alone collapses keys that
    * differ only in stripped characters (`…|/data/x-1` and
    * `…|/data/x_1` mapped to ONE path and overwrote each other — r9
    * review); the fingerprint keeps distinct keys on distinct paths
    * while staying deterministic across JVMs (the cross-JVM publish
    * contract). 8 digest bytes (r9 advice — 4 left a ~2⁻³² chance of
    * two sanitization-colliding keys ALSO colliding here and silently
    * serving each other's artifact; at 64 bits that failure is
    * practically impossible while the suffix stays path-friendly). */
  def keyHash(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString

  /** STALENESS fingerprint of a derived artifact's input data: a
    * 16-hex digest over every regular file under each input root —
    * (relative path, size, mtime-millis), sorted, so the fingerprint
    * is deterministic across JVMs and changes whenever any input file
    * is added, removed, resized, or rewritten. This is what lets a
    * cross-JVM artifact store (GraphCache/ModelCache shared trees)
    * serve a prior JVM's build ONLY while the corpus it was derived
    * from is byte-dated-identical — a regenerated testdata dir or a
    * production re-ingest lands on a fresh fingerprint and the stale
    * entry is simply never addressed again. Absent inputs fingerprint
    * as their own marker (the artifact of an absent input is itself a
    * build-time error — but the KEY must still be deterministic).
    *
    * KNOWN LIMIT (r10 advice, deliberate): a corpus deployed with
    * PRESERVED timestamps (`rsync -a`, `cp -p`, tar) whose content
    * changed but whose every file kept its exact size AND mtime
    * fingerprints as unchanged. Content hashing would close that hole
    * at the price of reading the full corpus per fingerprint call —
    * at the 100 TB design point that is a corpus scan per bench row,
    * which defeats the store. Same-size-same-mtime-different-bytes
    * requires a deployment tool deliberately forging dates onto
    * altered files; operators doing that should version the corpus
    * DIRECTORY NAME (which the key also carries) instead. */
  def dataFingerprint(inputs: Seq[String]): String = {
    import scala.jdk.CollectionConverters._
    val entries = inputs.sorted.flatMap { root =>
      val p = java.nio.file.Paths.get(root)
      if (!java.nio.file.Files.exists(p)) Seq(s"$root||ABSENT")
      else if (java.nio.file.Files.isRegularFile(p))
        Seq(s"$root||${java.nio.file.Files.size(p)}|" +
          java.nio.file.Files.getLastModifiedTime(p).toMillis)
      else {
        // Files.walk holds directory handles until closed — draining
        // the iterator does NOT release them (r10 advice: handle leak
        // per call). Using closes the stream on every exit path.
        scala.util.Using.resource(java.nio.file.Files.walk(p)) { walk =>
          walk.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(f => s"$root|${p.relativize(f)}|" +
              s"${java.nio.file.Files.size(f)}|" +
              java.nio.file.Files.getLastModifiedTime(f).toMillis)
            .toSeq.sorted
        }
      }
    }
    keyHash(entries.mkString("\n"))
  }
}
