package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{IngestRequest, VectorDbConfig}

class RoutingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("E3: OPEN_AI/HUGGING_FACE/LOCAL resolve; others are permanent failures") {
    assert(Routing.embedderFor("LOCAL", dim = 8).isRight)
    assert(Routing.embedderFor("OPEN_AI", apiKey = "k").isRight)
    // HUGGING_FACE needs its model name (the validator's reserved
    // message, reference validators.py:22); with it, the leg resolves
    assert(Routing.embedderFor("HUGGING_FACE") == Left(
      "Hugging face embeddings models require a " +
        "\"hugging_face_model_name\" in the \"embeddings_metadata\""))
    assert(Routing.embedderFor("HUGGING_FACE", dim = 8,
      huggingFaceModelName = Some("BAAI/bge-small-en")).isRight)
    assert(Routing.embedderFor("COHERE") ==
      Left("Embeddings type COHERE not supported"))
  }

  test("HUGGING_FACE leg: 32-text sub-batches against a local /embed stub, " +
      "retry envelope recovers from a transient 500") {
    val posts = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures = new java.util.concurrent.atomic.AtomicInteger(1) // first call 500s
    val maxBatchSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed", (ex: HttpExchange) => {
      posts.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      // {"inputs":["a","b",...]}: the "inputs" key itself is one quoted
      // token, every text another
      val n = body.count(_ == '"') / 2 - 1
      maxBatchSeen.accumulateAndGet(n, math.max(_, _))
      if (failures.getAndDecrement() > 0) respond(ex, 500, "overloaded")
      else respond(ex, 200,
        (0 until n).map(i => s"[0.5,$i.0]").mkString("[", ",", "]"))
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val emb = Routing.embedderFor("HUGGING_FACE", baseUrl = base, dim = 2,
        huggingFaceModelName = Some("BAAI/bge-small-en"))
        .fold(e => fail(e), identity)
      // retry wrapper retries the WHOLE embedBatch, so keep the flaky
      // call to the first sub-batch window: 65 texts = 3 sub-batches
      // (32 + 32 + 1 per HUGGING_FACE_BATCH_SIZE, worker config.py:6)
      val out = new RetryingEmbedder(new HuggingFaceHttpEmbedder(
        base, "BAAI/bge-small-en", dim = 2), attempts = 5, baseDelayMs = 0)
        .embedBatch((0 until 65).map(i => s"text $i"))
      assert(out.length == 65)
      assert(out.forall(_.length == 2))
      assert(maxBatchSeen.get() == 32, "sub-batch must cap at 32")
      // 1 failed + retry replays all 3 sub-batches = 4 POSTs so far;
      // then the embedderFor-built envelope embeds 10 texts in 1 call
      assert(posts.get() == 4)
      assert(emb.embedBatch((0 until 10).map(_.toString)).length == 10)
      assert(posts.get() == 5)
    } finally server.stop(0)
  }

  test("K5: webhook config routes to webhook; DB config routes to upsert") {
    import spark.implicits._
    val webhookHits = new java.util.concurrent.atomic.AtomicInteger(0)
    val upsertHits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (ex: HttpExchange) => {
      webhookHits.incrementAndGet(); respond(ex, 200, "ok")
    })
    server.createContext("/points", (ex: HttpExchange) => {
      upsertHits.incrementAndGet(); respond(ex, 200, "ok")
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val records = (0 until 10).map(i =>
        VectorRecord(s"id$i", s"t$i", "doc", Array(1f))).toDS().coalesce(1)
      Routing.writeRecords(records,
        IngestRequest(webhookUrl = Some(s"$base/hook"), webhookKey = Some("k")), "j1")
      assert(webhookHits.get() == 1 && upsertHits.get() == 0)
      Routing.writeRecords(records,
        IngestRequest(vectorDb = Some(VectorDbConfig("QDRANT", "idx")),
          vectorDbKey = Some("k")), "j2", vectorDbBaseUrl = base)
      assert(upsertHits.get() == 1)
      intercept[IllegalArgumentException](
        Routing.writeRecords(records, IngestRequest(), "j3"))
    } finally server.stop(0)
  }

  test("S7: s3a configuration lands on the Hadoop conf") {
    Routing.configureS3a(spark, "http://minio:9000", "ak", "sk")
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") == "http://minio:9000")
    assert(hc.get("fs.s3a.path.style.access") == "true")
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
