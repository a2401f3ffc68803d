package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Chunkers

/** S7: presigned-URL ingestion — the reference's `POST /s3` path
  * (src/api/app.py:180-226): GET the URL, sniff the MIME type from the
  * CONTENT (libmagic there; a minimal content sniffer here — never the
  * extension), dispatch to the S1/S2/S3 extractors, split into
  * 1000-line batches.
  *
  * Quirks replicated (SURVEY §7 quirk 5):
  *  - the reference's `text/plain` branch is DEAD CODE — it references
  *    `batch_count` before assignment and never calls `create_batches`
  *    (app.py:198-201), so a text/plain fetch creates a job and then
  *    crashes before batching. With `replicateTextPlainQuirk = true`
  *    (default) text/plain rows carry `n_batches = null` and status
  *    `DEAD_BRANCH`; pass false for the sane behavior (batch like the
  *    `/embed` txt path).
  *  - the unsupported-type error message claims HTML is accepted but no
  *    HTML branch exists (app.py:224) — message kept verbatim.
  *  - `file_name` is the last path segment of the URL, query string
  *    dropped (get_s3_file_name, app.py:283-289; golden-tested with the
  *    reference's own vector).
  *
  * Scale posture: the fetch runs EXECUTOR-side in `mapPartitions` (one
  * HttpClient per partition, like the embed stage's fan-out) — a
  * million presigned URLs is a million-row DataFrame, not a driver
  * loop; extraction is scan-local. `file:` URIs are served from the
  * local filesystem so tests and the Verify gate run with zero egress.
  */
object UrlFetch {

  /** One fetched document: HTTP status, sniffed MIME, extracted text
    * metrics, and the batch count (null on the dead branch / errors). */
  final case class FetchedDoc(url: String, file_name: String, status: Int,
                              mime_type: String, n_chars: Long,
                              n_batches: java.lang.Long, error: String)

  /** Last path segment, query string dropped (app.py:283-289). Null-safe
    * on opaque URIs (`mailto:` etc. have no path). */
  def s3FileName(url: String): String = {
    val path = URI.create(url).getPath
    if (path == null) return ""
    val parts = path.replaceAll("^/+", "").split("/")
    if (parts.isEmpty) "" else parts.last
  }

  private val PdfMagic = "%PDF".getBytes(StandardCharsets.US_ASCII)
  private val ZipMagic = Array[Byte](0x50, 0x4b, 0x03, 0x04)

  private def startsWith(b: Array[Byte], magic: Array[Byte]): Boolean =
    b.length >= magic.length && magic.indices.forall(i => b(i) == magic(i))

  /** Minimal libmagic stand-in over the first 1 KB (the S6 sniffing
    * convention): PDF and DOCX by magic bytes, HTML by markup prefix
    * (so HTML falls into the reference's unsupported branch exactly as
    * libmagic's text/html does), then the UTF-8-decodable → text/plain
    * rule, else application/octet-stream. */
  def sniffMime(bytes: Array[Byte]): String = {
    if (startsWith(bytes, PdfMagic)) return "application/pdf"
    if (startsWith(bytes, ZipMagic)) {
      val head = new String(bytes.take(1024), StandardCharsets.ISO_8859_1)
      return if (head.contains("word/"))
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
      else "application/zip"
    }
    // truncate BACK to a character boundary first: a multi-byte scalar
    // split at the 1 KB window edge is sniffing artifact, not binary
    var headLen = math.min(1024, bytes.length)
    if (headLen < bytes.length)
      while (headLen > 0 && !graft.core.BpeTokenizer.isCharBoundary(bytes, headLen)) headLen -= 1
    val head = java.util.Arrays.copyOfRange(bytes, 0, headLen)
    val decoded =
      try {
        StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .decode(java.nio.ByteBuffer.wrap(head)).toString
      } catch { case _: java.nio.charset.CharacterCodingException => null }
    if (decoded == null) "application/octet-stream"
    else {
      val t = decoded.trim.toLowerCase
      if (t.startsWith("<!doctype html") || t.startsWith("<html")) "text/html"
      else "text/plain"
    }
  }

  private def fetchBytes(client: HttpClient, url: String,
                         timeout: Duration): (Int, Array[Byte]) = {
    val uri = URI.create(url)
    if (uri.getScheme == "file") {
      // presigned URLs carry query strings; the filesystem path is the
      // path component alone
      val p = java.nio.file.Paths.get(uri.getPath)
      if (java.nio.file.Files.exists(p)) (200, java.nio.file.Files.readAllBytes(p))
      else (404, Array.empty[Byte])
    } else {
      val req = HttpRequest.newBuilder(uri).timeout(timeout).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      (resp.statusCode(), resp.body())
    }
  }

  /** Fetch + sniff + extract one URL's document (pure given the bytes —
    * safe under task retry). */
  def processOne(client: HttpClient, url: String, linesPerBatch: Int,
                 replicateTextPlainQuirk: Boolean,
                 timeout: Duration = Duration.ofSeconds(30)): FetchedDoc = {
    // one bad row must produce one error ROW, never a task failure:
    // even URI parsing (unencoded spaces, opaque URIs) stays inside
    // the try — the name falls back to the raw url on parse failure
    val name =
      try s3FileName(url)
      catch { case scala.util.control.NonFatal(_) => url }
    val (status, bytes) =
      try fetchBytes(client, url, timeout)
      catch {
        case scala.util.control.NonFatal(e) =>
          return FetchedDoc(url, name, -1, "", 0L, null, String.valueOf(e.getMessage))
      }
    if (status != 200)
      // app.py:226 just logs 'Failed to download file' and returns None
      return FetchedDoc(url, name, status, "", 0L, null, "Failed to download file")
    val mime = sniffMime(bytes)
    def batches(content: String): java.lang.Long =
      java.lang.Long.valueOf(Chunkers.splitFile(content, linesPerBatch).length.toLong)
    mime match {
      case "text/plain" =>
        val content = new String(bytes, StandardCharsets.UTF_8)
        if (replicateTextPlainQuirk)
          // dead branch: job created, batch_count unbound (app.py:198-201)
          FetchedDoc(url, name, 200, mime, content.length.toLong, null, "DEAD_BRANCH")
        else
          FetchedDoc(url, name, 200, mime, content.length.toLong, batches(content), "")
      case "application/pdf" =>
        val content = PdfText.extractPages(bytes)
          .map(PdfText.pageWithTrailingNewline).mkString
        FetchedDoc(url, name, 200, mime, content.length.toLong, batches(content), "")
      case "application/vnd.openxmlformats-officedocument.wordprocessingml.document" =>
        val content = DocxText.extractParagraphs(bytes).mkString("\n")
        FetchedDoc(url, name, 200, mime, content.length.toLong, batches(content), "")
      case other =>
        FetchedDoc(url, name, 400, other, 0L, null,
          "Uploaded file is not a TXT, PDF, HTML or DOCX file")
    }
  }

  /** Executor-side fetch of a URL COLUMN — the 100 TB entry point: a
    * million presigned URLs is a million-row DataFrame flowing straight
    * into `mapPartitions`, never a driver loop. One HttpClient per
    * partition; redirects followed (the reference's requests.get does —
    * presigned stores answer 307 region redirects). */
  def fetchUrlColumn(urls: org.apache.spark.sql.Dataset[String],
                     linesPerBatch: Int = 1000,
                     replicateTextPlainQuirk: Boolean = true): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls.mapPartitions { it =>
      val client = HttpClient.newBuilder()
        .followRedirects(HttpClient.Redirect.NORMAL)
        .connectTimeout(Duration.ofSeconds(30)).build()
      it.map(processOne(client, _, linesPerBatch, replicateTextPlainQuirk))
    }.toDF()
  }

  /** Convenience wrapper over [[fetchUrlColumn]] for driver-known URL
    * lists (tests, the p21 fixture query). */
  def fetchUrls(spark: SparkSession, urls: Seq[String],
                linesPerBatch: Int = 1000,
                replicateTextPlainQuirk: Boolean = true): DataFrame = {
    import spark.implicits._
    fetchUrlColumn(urls.toDF("url").as[String], linesPerBatch,
      replicateTextPlainQuirk)
  }
}
