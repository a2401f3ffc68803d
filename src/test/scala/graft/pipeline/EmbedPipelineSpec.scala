package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks

/** End-to-end pipeline tests, including the HTTP embedder and webhook
  * sink driven against a local in-JVM stub server (zero egress). */
class EmbedPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("pipeline is deterministic and ids are unique") {
    val docs = graft.Tables.documents(spark, sfDir)
    val a = EmbedPipeline.run(docs).collect().sortBy(_.id)
    val b = EmbedPipeline.run(docs).collect().sortBy(_.id)
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.id == y.id && x.vector.toSeq == y.vector.toSeq)
    }
    assert(a.map(_.id).distinct.length == a.length, "chunk ids must be unique")
    // unit norm
    val n = math.sqrt(a.head.vector.map(v => v.toDouble * v).sum)
    assert(math.abs(n - 1.0) < 1e-4)
  }

  test("Md5Embedder components are exact md5-arithmetic integers") {
    val e = new Md5Embedder(8)
    val v = e.embedOne("hello")
    // recompute component 0 by hand: u32(md5("hello:0")) % 2001 - 1000
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("hello:0".getBytes(StandardCharsets.UTF_8))
    val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    assert(v(0) == (u32 % 2001L - 1000L).toFloat)
    // every component is an integer in [-1000, 1000] — fixed-point with
    // no float rounding, the property the p08 oracle depends on
    assert(v.forall(c => c == math.rint(c) && math.abs(c) <= 1000f))
    assert(v.length == 8)
    // deterministic
    assert(e.embedOne("hello").toSeq == v.toSeq)
    assert(e.embedOne("world").toSeq != v.toSeq)
  }

  test("embed batching respects maxBatchSize and preserves order") {
    val calls = new AtomicInteger(0)
    val tiny = new Embedder {
      override val dim = 4
      override val maxBatchSize = 7
      override def embedBatch(texts: IndexedSeq[String]): IndexedSeq[Array[Float]] = {
        calls.incrementAndGet()
        assert(texts.length <= 7)
        texts.map(t => Array(t.length.toFloat, 0f, 0f, 0f))
      }
    }
    import spark.implicits._
    val chunks = (0 until 40).map(i => ChunkRow(i.toLong, "s", i, s"id$i", "x" * (i + 1))).toDS().repartition(2)
    val out = EmbedPipeline.embedStage(chunks, tiny).collect()
    assert(out.length == 40)
    out.foreach(r => assert(r.vector(0) == r.source_text.length.toFloat, "order scrambled"))
  }

  test("HTTP embedder: order-preserving parse, retry on failure, then webhook sink") {
    val failFirst = new AtomicInteger(2) // fail the first 2 embed calls
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embeddings", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (failFirst.getAndDecrement() > 0) respond(ex, 500, """{"error":"flaky"}""")
      else {
        val n = "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllIn(body.substring(body.indexOf("input"))).length
        // respond with REVERSED data order to prove index-tagged zip
        val data = (0 until n).reverse.map(i =>
          s"""{"index":$i,"embedding":[${i}.0,1.0]}""").mkString(",")
        respond(ex, 200, s"""{"data":[$data]}""")
      }
    })
    server.createContext("/webhook", (ex: HttpExchange) => {
      received.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      respond(ex, 200, "ok")
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      import spark.implicits._
      val embedder = new RetryingEmbedder(
        new OpenAiHttpEmbedder(s"http://127.0.0.1:$port", "test-model", "k", dim = 2),
        attempts = 5, baseDelayMs = 1L)
      val chunks = (0 until 10).map(i => ChunkRow(i.toLong, "doc", i, s"id$i", s"text$i")).toDS().coalesce(1)
      val out = EmbedPipeline.embedStage(chunks, embedder).collect().sortBy(_.id)
      assert(out.length == 10)
      // index i must carry embedding [i, 1] even though the server reversed order
      out.foreach { r =>
        val i = r.source_text.stripPrefix("text").toInt
        assert(r.vector.toSeq == Seq(i.toFloat, 1f), s"index tag broken for $i")
      }
      // webhook sink: 10 records, batch size 4 -> 3 POSTs
      Sinks.webhook(EmbedPipeline.embedStage(chunks, embedder),
        s"http://127.0.0.1:$port/webhook", "secret", "job-1", batchSize = 4, baseDelayMs = 1L)
      assert(received.size() == 3)
      assert(received.asScala.forall(_.contains("\"JobID\":\"job-1\"")))
    } finally server.stop(0)
  }

  test("chunk-validation semi-join keeps only service-approved rows") {
    import spark.implicits._
    val chunks = (0 until 20).map(i => ChunkRow(i.toLong, "s", i, s"id$i", s"t$i")).toDS().coalesce(1)
    // the reference webhook_test_api keeps every 2nd chunk (:60-62);
    // one partition -> batches of 6,6,6,2 -> 3+3+3+1 kept
    val kept = Sinks.validateChunks(chunks, batchSize = 6)(batch =>
      batch.zipWithIndex.collect { case (c, i) if i % 2 == 0 => c })
    assert(kept.count() == 10)
  }

  test("ledger marks jobs COMPLETED when all ids are distinct") {
    val docs = graft.Tables.documents(spark, sfDir)
    val led = EmbedPipeline.ledger(EmbedPipeline.run(docs).toDF()).collect()
    assert(led.nonEmpty)
    assert(led.forall(_.getAs[String]("job_status") == "COMPLETED"))
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private implicit class QueueOps[T](q: java.util.concurrent.ConcurrentLinkedQueue[T]) {
    def asScala: Iterator[T] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala
    }
  }
}
