package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import Multimodal._

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Synthetic payload: u16 w, u16 h, u16 c, u32 duration_ms, body. */
  private def payload(w: Int, h: Int, c: Int, durMs: Long, bodyLen: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(10 + bodyLen)
    b.putShort(w.toShort).putShort(h.toShort).putShort(c.toShort).putInt(durMs.toInt)
    (0 until bodyLen).foreach(i => b.put(((i * 37 + w) & 0xff).toByte))
    b.array()
  }

  private def media = {
    import spark.implicits._
    Seq(
      MediaRow(1L, "image", payload(1920, 1080, 3, 0L, 256)),
      MediaRow(2L, "image", payload(640, 480, 3, 0L, 128)),
      MediaRow(3L, "video", payload(1280, 720, 3, 10000L, 512))).toDS()
  }

  test("decode stage: header metadata + deterministic features") {
    val decoded = decodeImages(media).collect().map(d => d.media_id -> d).toMap
    assert(decoded(1L).width == 1920 && decoded(1L).height == 1080 && decoded(1L).channels == 3)
    assert(decoded(2L).width == 640)
    assert(decoded(1L).features.length == 16)
    val again = decodeImages(media).collect().map(d => d.media_id -> d).toMap
    assert(decoded(1L).features.toSeq == again(1L).features.toSeq, "decode must be deterministic")
  }

  test("resize plan computes bounded dimensions without touching payloads") {
    val resized = resizePlan(decodeImages(media), maxSide = 512)
      .select("media_id", "out_width", "out_height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(resized(1L) == ((512, 288)))
    assert(resized(2L) == ((512, 384)))
    // never upscale
    val small = resizePlan(decodeImages(media), maxSide = 4096).collect()
      .filter(_.getAs[Long]("media_id") == 2L).head
    assert(small.getAs[Int]("out_width") == 640)
  }

  test("frame sampling explodes the clip timeline in pure Catalyst") {
    val frames = sampleFrames(media.toDF(), everyMs = 2500L)
      .filter(col("media_id") === 3L)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(frames.toSeq == Seq((0, 0L), (1, 2500L), (2, 5000L), (3, 7500L), (4, 10000L)))
  }

  test("feature records flow into the shared vector schema") {
    val recs = featureRecords(decodeImages(media))
    assert(recs.columns.toSeq == Seq("id", "media_id", "vector"))
    val ids = recs.select("id").collect().map(_.getString(0))
    assert(ids.distinct.length == 3 && ids.forall(_.length == 36))
  }
}
