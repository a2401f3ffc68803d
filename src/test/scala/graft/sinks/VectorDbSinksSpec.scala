package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{IngestRequest, RequestValidator, Uuid5, VectorDbConfig}
import graft.pipeline.VectorRecord

class VectorDbSinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rec = VectorRecord("ignored", "some \"text\"", "doc.txt", Array(0.5f, 1.0f))

  test("payload shapes match the reference uploader structs") {
    val pine = VectorDbSinks.Pinecone.entry(rec, "job1", 7L, 0)
    assert(pine == s"""{"id":"${Uuid5.ofParts("job1", 7L, 0)}","values":[0.5,1.0],"metadata":{"source_text":"some \\"text\\"","source_document":"doc.txt"}}""")
    val qd = VectorDbSinks.Qdrant.entry(rec, "job1", 7L, 0)
    assert(qd.contains(""""vector":[0.5,1.0]""") && qd.contains(""""payload":{"source_text""""))
    val weav = VectorDbSinks.Weaviate.entry(rec, "job1", 7L, 0)
    // quirk 6: the reference writes the misspelled property
    assert(weav.contains(""""vectoflow_id":""") && !weav.contains(""""vectorflow_id":"""))
    assert(weav.contains(""""source_data":"some \"text\""""))
    // same (job,batch,i) -> same id on every shape: idempotent upserts
    assert(pine.contains(Uuid5.ofParts("job1", 7L, 0)) && qd.contains(Uuid5.ofParts("job1", 7L, 0)))
  }

  test("unsupported DB types are rejected like the reference dispatch") {
    assert(VectorDbSinks.shapeFor("QDRANT") == VectorDbSinks.Qdrant)
    val e = intercept[IllegalArgumentException](VectorDbSinks.shapeFor("MILVUS"))
    assert(e.getMessage.contains("Unsupported vector DB type"))
  }

  test("upsert sink: 128-batching, retry, accumulator accounting") {
    import spark.implicits._
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val failures = new java.util.concurrent.atomic.AtomicInteger(1)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/points", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (failures.getAndDecrement() > 0) respond(ex, 500, "boom")
      else { received.add(body); respond(ex, 200, "ok") }
    })
    server.start()
    try {
      val records = (0 until 300).map(i =>
        VectorRecord(s"r$i", s"text$i", "doc", Array(i.toFloat))).toDS().coalesce(1)
      val up = spark.sparkContext.longAccumulator("up")
      val fail = spark.sparkContext.longAccumulator("fail")
      VectorDbSinks.upsert(records, s"http://127.0.0.1:${server.getAddress.getPort}",
        "key", VectorDbSinks.Qdrant, "job-9", attempts = 3, baseDelayMs = 1L,
        uploaded = up, failed = fail)
      // 300 records -> batches of 128/128/44; first POST failed once then retried
      assert(received.size() == 3)
      assert(up.value == 300L && fail.value == 0L)
      val bodies = {
        val it = received.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next(); b.result()
      }
      assert(bodies.forall(_.startsWith("""{"points":[""")))
    } finally server.stop(0)
  }

  test("auth headers per store: Api-Key for Pinecone/Qdrant, Bearer for Weaviate") {
    import spark.implicits._
    assert(VectorDbSinks.Pinecone.authHeader("k") == ("Api-Key", "k"))
    assert(VectorDbSinks.Qdrant.authHeader("k") == ("Api-Key", "k"))
    assert(VectorDbSinks.Weaviate.authHeader("k") == ("Authorization", "Bearer k"))
    // end-to-end: the Weaviate sink actually sends the Bearer header
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/batch/objects", (ex: HttpExchange) => {
      seen.add(ex.getRequestHeaders.getFirst("Authorization"))
      respond(ex, 200, "ok")
    })
    server.start()
    try {
      val records = Seq(rec).toDS().coalesce(1)
      VectorDbSinks.upsert(records, s"http://127.0.0.1:${server.getAddress.getPort}",
        "secret", VectorDbSinks.Weaviate, "job-w", attempts = 1)
      assert(seen.peek() == "Bearer secret")
    } finally server.stop(0)
  }

  test("DataSourceV2 writer: batched upserts, commit accounting, deterministic ids") {
    import spark.implicits._
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/points", (ex: HttpExchange) => {
      received.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      respond(ex, 200, "ok")
    })
    server.start()
    try {
      def writeOnce(): Unit = (0 until 300)
        .map(i => VectorRecord(s"r$i", s"text$i", "doc", Array(i.toFloat)))
        .toDS().toDF().coalesce(1)
        .write.format("graft.sinks.VectorDbDataSource")
        .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
        .option("apiKey", "key").option("shape", "QDRANT").option("jobId", "dsv2-job")
        .mode("append").save()
      writeOnce()
      // 300 rows -> POSTs of 128/128/44
      assert(received.size() == 3)
      val stats = VectorDbDataSource.lastCommitStats
      assert(stats.exists(s => s.uploaded == 300L && s.failed == 0L && s.tasks == 1))
      def ids(bodies: Iterable[String]): Set[String] =
        bodies.flatMap("\"id\":\"([0-9a-f-]+)\"".r.findAllMatchIn(_).map(_.group(1))).toSet
      val first = ids(scala.jdk.CollectionConverters.IteratorHasAsScala(
        received.iterator()).asScala.toList)
      assert(first.size == 300)
      received.clear()
      // re-run: identical uuid5 ids -> pure upsert overwrite, no growth
      writeOnce()
      val second = ids(scala.jdk.CollectionConverters.IteratorHasAsScala(
        received.iterator()).asScala.toList)
      assert(second == first, "re-delivery must target identical record ids")
    } finally server.stop(0)
  }

  test("chaos: a task that dies mid-upsert retries into zero duplicates " +
      "and exact ledger counts (foreachPartition sink)") {
    // the r10 stretch pin: the uuid5 idempotent-upsert DESIGN
    // (reference README.md:210) was spec-covered only on the happy
    // path — here the first task attempt POSTs its first micro-batch,
    // then dies; Spark's retry (master local[*, 2]) replays the whole
    // partition. The store, keyed by id like every real vector DB,
    // must end with exactly one row per record, and the A1-ledger
    // accumulators must count the successful attempt only.
    import spark.implicits._
    val store = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val posts = new java.util.concurrent.atomic.AtomicInteger()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/points", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      posts.incrementAndGet()
      // an UPSERT store: same id overwrites, never duplicates
      "\"id\":\"([0-9a-f-]+)\"".r.findAllMatchIn(body)
        .foreach(m => store.put(m.group(1), body))
      respond(ex, 200, "ok")
    })
    server.start()
    try {
      val records = (0 until 300).map(i =>
          VectorRecord(s"r$i", s"text$i", "doc", Array(i.toFloat)))
        .toDS().coalesce(1)
        // pipelined into the sink task: record 150 kills ATTEMPT 0
        // after the first 128-record POST already shipped
        .map { r =>
          val tc = org.apache.spark.TaskContext.get()
          if (r.id == "r150" && tc != null && tc.attemptNumber() == 0)
            throw new RuntimeException("chaos: injected task death")
          r
        }
      val up = spark.sparkContext.longAccumulator("up_chaos")
      val fail = spark.sparkContext.longAccumulator("fail_chaos")
      VectorDbSinks.upsert(records, s"http://127.0.0.1:${server.getAddress.getPort}",
        "key", VectorDbSinks.Qdrant, "job-chaos", attempts = 3,
        baseDelayMs = 1L, uploaded = up, failed = fail)
      assert(posts.get() > 3, "the first attempt must have POSTed before dying")
      assert(store.size() === 300,
        "idempotent uuid5 ids: the retry overwrites the dead attempt's rows")
      assert(up.value === 300L && fail.value === 0L,
        "ledger counts come from the successful attempt only — Spark " +
          "discards failed-attempt accumulator updates")
    } finally server.stop(0)
  }

  test("chaos: DataSourceV2 task retry — zero duplicate upserts, commit " +
      "stats count the surviving attempt only") {
    import spark.implicits._
    val store = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val posts = new java.util.concurrent.atomic.AtomicInteger()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/points", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      posts.incrementAndGet()
      "\"id\":\"([0-9a-f-]+)\"".r.findAllMatchIn(body)
        .foreach(m => store.put(m.group(1), body))
      respond(ex, 200, "ok")
    })
    server.start()
    try {
      (0 until 300)
        .map(i => VectorRecord(s"r$i", s"text$i", "doc", Array(i.toFloat)))
        .toDS()
        .coalesce(1)
        // the V2 write exec consumes this iterator IN-TASK, so the
        // throw lands mid-write after the first 128-row flush
        .map { r =>
          val tc = org.apache.spark.TaskContext.get()
          if (r.id == "r150" && tc != null && tc.attemptNumber() == 0)
            throw new RuntimeException("chaos: injected task death")
          r
        }
        .toDF()
        .write.format("graft.sinks.VectorDbDataSource")
        .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
        .option("apiKey", "key").option("shape", "QDRANT")
        .option("jobId", "dsv2-chaos")
        .mode("append").save()
      assert(posts.get() > 3, "the dead attempt must have POSTed first")
      assert(store.size() === 300,
        "uuid5(job, partition, i) is identical across attempts: the " +
          "retry targets the dead attempt's exact ids")
      val stats = VectorDbDataSource.lastCommitStats
      assert(stats.exists(s => s.uploaded == 300L && s.failed == 0L &&
        s.tasks == 1),
        s"commit must aggregate the surviving attempt only, got $stats")
    } finally server.stop(0)
  }

  test("DataSourceV2 writer rejects unknown shapes at planning time") {
    import spark.implicits._
    val df = Seq(VectorRecord("a", "t", "d", Array(1f))).toDS().toDF()
    val e = intercept[Exception] {
      df.write.format("graft.sinks.VectorDbDataSource")
        .option("url", "http://x").option("shape", "MILVUS").mode("append").save()
    }
    assert(e.getMessage.contains("Unsupported vector DB type") ||
      e.getCause != null && e.getCause.getMessage.contains("Unsupported vector DB type"))
  }

  test("request validation mirrors the reference's dispatch order") {
    val ok = IngestRequest(vectorDb = Some(VectorDbConfig("QDRANT", "idx")),
      vectorDbKey = Some("k"))
    assert(RequestValidator.validate(ok).isEmpty)
    // vector DB configured but no key and not local -> METADATA failure
    val noKey = ok.copy(vectorDbKey = None)
    assert(RequestValidator.validate(noKey).contains(RequestValidator.Metadata))
    assert(RequestValidator.validate(noKey, localVectorDb = true).isEmpty)
    // HUGGING_FACE without its model name rejected with the reference's
    // reserved message (validators.py:22); with the name it passes (r10)
    val hf = ok.copy(embeddings = graft.core.EmbeddingsConfig(embeddingsType = "HUGGING_FACE"))
    assert(RequestValidator.validate(hf).contains(RequestValidator.EmbeddingType))
    assert(RequestValidator.EmbeddingType.error.contains("hugging_face_model_name"))
    val hfNamed = ok.copy(embeddings = graft.core.EmbeddingsConfig(
      embeddingsType = "HUGGING_FACE",
      huggingFaceModelName = Some("BAAI/bge-small-en")))
    assert(RequestValidator.validate(hfNamed).isEmpty)
    // a type the worker never dispatches stays rejected
    val cohere = ok.copy(embeddings = graft.core.EmbeddingsConfig(embeddingsType = "COHERE"))
    assert(RequestValidator.validate(cohere).contains(RequestValidator.EmbeddingType))
    // webhook URL without key rejected
    val wh = ok.copy(webhookUrl = Some("http://x"), webhookKey = None)
    assert(RequestValidator.validate(wh).contains(RequestValidator.Webhook))
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
