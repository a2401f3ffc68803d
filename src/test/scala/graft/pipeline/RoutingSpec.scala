package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{IngestRequest, VectorDbConfig}

class RoutingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("E3: only OPEN_AI/LOCAL resolve; others are permanent failures") {
    assert(Routing.embedderFor("LOCAL", dim = 8).isRight)
    assert(Routing.embedderFor("OPEN_AI", apiKey = "k").isRight)
    val hf = Routing.embedderFor("HUGGING_FACE")
    assert(hf == Left("Embeddings type HUGGING_FACE not supported"))
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
