package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.Duration
import java.util.concurrent.{Executors, TimeUnit}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Text → vector embedding stage (the reference pipeline's hot operator,
  * SURVEY.md §2.5).
  *
  * Implementations must be pure/idempotent per text so that Spark task
  * re-execution (the retry unit, reference batch retry
  * src/worker/worker.py:327-335) is safe, and must preserve input order —
  * the reference zips responses positionally (worker.py:75-76), which we
  * harden by index-tagging (SURVEY §7 quirk 7).
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Embed one API-sized batch, preserving order: result(i) belongs to
    * texts(i). */
  def embedBatch(texts: IndexedSeq[String]): IndexedSeq[Array[Float]]
  /** Texts per call (reference MAX_OPENAI_EMBEDDING_BATCH_SIZE=2048,
    * src/worker/config.py:2). */
  def maxBatchSize: Int = 2048
}

/** Deterministic local embedder for tests/benchmarks: seeds SplitMix64
  * from the MD5 of the text, draws `dim` floats, L2-normalizes. Stands in
  * for a real embedding service with zero egress while exercising the
  * identical dataflow. */
final class HashEmbedder(override val dim: Int = 64) extends Embedder {
  override def embedBatch(texts: IndexedSeq[String]): IndexedSeq[Array[Float]] =
    texts.map(embedOne)

  def embedOne(text: String): Array[Float] = {
    val md5 = MessageDigest.getInstance("MD5").digest(text.getBytes(StandardCharsets.UTF_8))
    var seed = java.nio.ByteBuffer.wrap(md5).getLong
    val v = new Array[Float](dim)
    var i = 0
    var norm = 0.0
    while (i < dim) {
      // SplitMix64 step
      seed += 0x9e3779b97f4a7c15L
      var z = seed
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      val f = ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
      v(i) = f.toFloat
      norm += f * f
      i += 1
    }
    val inv = (1.0 / math.sqrt(norm)).toFloat
    i = 0
    while (i < dim) { v(i) *= inv; i += 1 }
    v
  }
}

/** Deterministic ORACLE-RECOMPUTABLE embedder — the flagship pipeline's
  * test embedder, built so a SQL engine can recompute every component
  * exactly (the t17 ClassifierScoreExpr md5-arithmetic principle):
  *
  *   component(text, k) = (u32(md5(text ++ ":" ++ k)) mod 2001) − 1000
  *
  * where u32 is the first 4 bytes of the digest, big-endian unsigned
  * (DuckDB: `('0x' || substr(md5(t || ':' || k), 1, 8))::BIGINT`).
  * Components are exact integers in [−1000, 1000] — fixed-point with a
  * 1e-3 scale, stored as Float (integers ≤ 2^24 are exact) — so there is
  * no float rounding anywhere and the vectors hash identically across
  * engines. Like [[HashEmbedder]] it stands in for a real embedding
  * service with zero egress while exercising the identical dataflow;
  * unlike it, the p08 CORRECTNESS row can hash-check the output.
  * Consumers needing unit vectors normalize downstream. */
final class Md5Embedder(override val dim: Int = 64) extends Embedder {
  override def embedBatch(texts: IndexedSeq[String]): IndexedSeq[Array[Float]] =
    texts.map(embedOne)

  def embedOne(text: String): Array[Float] = {
    val md = MessageDigest.getInstance("MD5")
    val v = new Array[Float](dim)
    var k = 0
    while (k < dim) {
      val d = md.digest((text + ":" + k).getBytes(StandardCharsets.UTF_8))
      val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      v(k) = (u32 % 2001L - 1000L).toFloat
      md.reset()
      k += 1
    }
    v
  }
}

/** Retry/backoff wrapper: `attempts` tries with exponential backoff
  * `baseDelayMs * 2^i` (reference get_openai_embedding: 5 attempts,
  * 2^i s backoff, src/worker/worker.py:77-90). */
final class RetryingEmbedder(inner: Embedder, attempts: Int = 5,
                             baseDelayMs: Long = 1000L) extends Embedder {
  override def dim: Int = inner.dim
  override def maxBatchSize: Int = inner.maxBatchSize
  override def embedBatch(texts: IndexedSeq[String]): IndexedSeq[Array[Float]] = {
    var i = 0
    var last: Throwable = null
    while (i < attempts) {
      try return inner.embedBatch(texts)
      catch {
        case NonFatal(e) =>
          last = e
          if (i < attempts - 1 && baseDelayMs > 0)
            Thread.sleep(baseDelayMs * (1L << i))
      }
      i += 1
    }
    throw last
  }
}

/** OpenAI-compatible `/v1/embeddings` HTTP embedder over `java.net.http`.
  *
  * Matches the reference's designed throughput envelope: ≤2048 texts per
  * call (worker.py:96) fanned out over `concurrency` parallel calls per
  * partition (MAX_THREADS_OPENAI=20, worker.py:100-102). Each sub-call is
  * index-tagged so response order cannot scramble the zip. Intended for
  * real deployments; tests exercise it against a local stub server. */
final class OpenAiHttpEmbedder(baseUrl: String, model: String,
                               apiKey: String, override val dim: Int,
                               concurrency: Int = 20,
                               subBatchSize: Int = 2048,
                               timeout: Duration = Duration.ofSeconds(60)) extends Embedder {
  override def maxBatchSize: Int = subBatchSize * concurrency

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  private def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.result()
  }

  /** Minimal parser for `{"data":[{"index":i,"embedding":[...]},...]}` —
    * avoids a JSON dependency; tolerant of field order. */
  private[pipeline] def parseResponse(body: String, n: Int): IndexedSeq[Array[Float]] = {
    val out = new Array[Array[Float]](n)
    val entry = java.util.regex.Pattern.compile(
      """"index"\s*:\s*(\d+)\s*,\s*"embedding"\s*:\s*\[([^\]]*)\]|"embedding"\s*:\s*\[([^\]]*)\]\s*,\s*"index"\s*:\s*(\d+)""")
    val m = entry.matcher(body)
    while (m.find()) {
      val (idx, arr) =
        if (m.group(1) != null) (m.group(1).toInt, m.group(2))
        else (m.group(4).toInt, m.group(3))
      out(idx) = arr.split(",").map(_.trim.toFloat)
    }
    require(out.forall(_ != null), "embedding response missing indices")
    out.toIndexedSeq
  }

  private def callOnce(texts: IndexedSeq[String]): IndexedSeq[Array[Float]] = {
    val input = texts.map(t => "\"" + jsonEscape(t) + "\"").mkString("[", ",", "]")
    val payload = s"""{"model":"${jsonEscape(model)}","input":$input}"""
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/v1/embeddings"))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(payload))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"embeddings call failed: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
    parseResponse(resp.body(), texts.length)
  }

  override def embedBatch(texts: IndexedSeq[String]): IndexedSeq[Array[Float]] = {
    val subBatches = texts.grouped(subBatchSize).toIndexedSeq
    if (subBatches.lengthCompare(1) <= 0) subBatches.headOption.map(callOnce).getOrElse(IndexedSeq.empty)
    else {
      // bounded fan-out inside the Spark task, like the reference's
      // 20-thread pool per worker
      val pool = Executors.newFixedThreadPool(math.min(concurrency, subBatches.length))
      try {
        val futures = subBatches.map(b => pool.submit(() => callOnce(b)))
        futures.flatMap(_.get())
      } finally {
        pool.shutdown()
        pool.awaitTermination(timeout.toSeconds * 2, TimeUnit.SECONDS)
      }
    }
  }
}

/** HUGGING_FACE local-HTTP embedder — the dispatch leg the reference
  * DESIGNED but never shipped worker code for: the enum/validator
  * reserve it (src/api/validators.py:22 requires a
  * `hugging_face_model_name`), the k8s tree deploys a local
  * `BAAI/bge-small-en` model server
  * (kube/hugging_face_deployment.yaml:27-29), and the worker config
  * pins `HUGGING_FACE_BATCH_SIZE = 32` (src/worker/config.py:6).
  *
  * Speaks the public text-embeddings-inference convention: POST
  * `$baseUrl/embed` with `{"inputs":[...]}`, response a top-level
  * array of float arrays in request order. Sub-batches of 32 per the
  * reference's constant, sequential by default (the reference's HF
  * consumer is a single local model server fed one queue message at a
  * time — fanning 20 concurrent calls at one local GPU would just
  * queue there); `concurrency` is pluggable for a replicated serving
  * tier. Retry/backoff comes from the same [[RetryingEmbedder]]
  * envelope as the OPEN_AI leg (Routing wires it). */
final class HuggingFaceHttpEmbedder(baseUrl: String, modelName: String,
                                    override val dim: Int,
                                    concurrency: Int = 1,
                                    subBatchSize: Int = 32,
                                    timeout: Duration = Duration.ofSeconds(60)) extends Embedder {
  require(modelName.nonEmpty, "hugging_face_model_name required")
  override def maxBatchSize: Int = subBatchSize * math.max(1, concurrency)

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  private def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.result()
  }

  /** `[[0.1,0.2],[...],...]` — no nesting inside an embedding, so each
    * innermost bracket group is one vector, in request order. */
  private[pipeline] def parseResponse(body: String, n: Int): IndexedSeq[Array[Float]] = {
    val inner = java.util.regex.Pattern.compile("""\[([^\[\]]*)\]""")
    val m = inner.matcher(body)
    val out = IndexedSeq.newBuilder[Array[Float]]
    var count = 0
    while (m.find()) {
      out += m.group(1).split(",").map(_.trim.toFloat)
      count += 1
    }
    require(count == n,
      s"hugging-face response carried $count embeddings for $n inputs")
    out.result()
  }

  private def callOnce(texts: IndexedSeq[String]): IndexedSeq[Array[Float]] = {
    val inputs = texts.map(t => "\"" + jsonEscape(t) + "\"").mkString("[", ",", "]")
    val payload = s"""{"inputs":$inputs}"""
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/embed"))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(payload))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"hugging-face embed call failed: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
    parseResponse(resp.body(), texts.length)
  }

  override def embedBatch(texts: IndexedSeq[String]): IndexedSeq[Array[Float]] = {
    val subBatches = texts.grouped(subBatchSize).toIndexedSeq
    if (concurrency <= 1 || subBatches.lengthCompare(1) <= 0)
      subBatches.flatMap(callOnce)
    else {
      val pool = Executors.newFixedThreadPool(math.min(concurrency, subBatches.length))
      try {
        val futures = subBatches.map(b => pool.submit(() => callOnce(b)))
        futures.flatMap(_.get())
      } finally {
        pool.shutdown()
        pool.awaitTermination(timeout.toSeconds * 2, TimeUnit.SECONDS)
      }
    }
  }
}
