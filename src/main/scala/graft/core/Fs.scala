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

  /** Stable 8-hex-char fingerprint of an artifact key, appended to the
    * sanitized path segment: sanitization alone collapses keys that
    * differ only in stripped characters (`…|/data/x-1` and
    * `…|/data/x_1` mapped to ONE path and overwrote each other — r9
    * review); the fingerprint keeps distinct keys on distinct paths
    * while staying deterministic across JVMs (the cross-JVM publish
    * contract). */
  def keyHash(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
}
