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
}
