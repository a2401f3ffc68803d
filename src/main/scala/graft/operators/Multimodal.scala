package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and the
  * decode / feature-extract / resize / frame-sample stages as
  * `mapPartitions` over typed rows (the JVM analogue of `mapInPandas`
  * batch UDFs — same batch shape: one partition in, an iterator of
  * decoded rows out).
  *
  * Image decode is REAL for PNG/JPEG/GIF/BMP via `javax.imageio`
  * (JDK-built-in codecs, no external jars): dimensions, channel count,
  * and a 4x4-grid mean-luminance feature vector. Payloads that are not
  * a recognized image format fall back to [[decodeImageStub]], the
  * deterministic synthetic-header stand-in (audio PCM / video frame
  * codecs are genuinely absent from this container — those stay
  * stubbed and marked).
  */
object Multimodal {

  /** One media payload row (binary + typed metadata). */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded image: dimensions plus a deterministic per-pixel-summary
    * feature vector. */
  final case class DecodedImage(media_id: Long, width: Int, height: Int,
                                channels: Int, features: Array[Float])

  /** Sampled video frame reference. */
  final case class FrameRef(media_id: Long, frame_idx: Int, ts_ms: Long)

  /** Synthetic-header fallback for payloads that are NOT a recognized
    * image format (the marked stub path for codecs the container lacks):
    * reads width/height/channels from the first 6 payload bytes
    * (big-endian u16,u16,u16) and derives a 16-dim feature vector from
    * a rolling byte hash — deterministic in the payload. */
  def decodeImageStub(r: MediaRow): DecodedImage = {
    val p = r.payload
    // poison row (truncated header): degrade to a zero record — a batch
    // must never die on one bad payload
    if (p == null || p.length < 6)
      return DecodedImage(r.media_id, 0, 0, 0, new Array[Float](16))
    def u16(i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    val (w, h, c) = (u16(0), u16(2), u16(4))
    val features = new Array[Float](16)
    var i = 6
    var acc = 0x9e3779b9
    while (i < p.length) {
      acc = acc * 31 + (p(i) & 0xff)
      features(i % 16) += ((acc & 0xffff).toFloat / 65535f)
      i += 1
    }
    DecodedImage(r.media_id, w, h, c, features)
  }

  /** PNG / JPEG / GIF / BMP magic bytes. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 'B' && p(1) == 'M'))

  /** REAL image decode via the JDK's ImageIO codecs: width/height,
    * color-model channel count, and a 16-dim feature vector = mean
    * luminance (Rec.601, [0,1]) over a 4x4 spatial grid. Non-image
    * payloads (and codec failures) fall back to the synthetic-header
    * stub so mixed batches never fail the task. */
  def decodeImage(r: MediaRow): DecodedImage = {
    val p = r.payload
    val img =
      if (p == null || !looksLikeImage(p)) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
        catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) decodeImageStub(r)
    else {
      val w = img.getWidth
      val h = img.getHeight
      val c = img.getColorModel.getNumComponents
      val sums = new Array[Double](16)
      val counts = new Array[Long](16)
      var y = 0
      while (y < h) {
        val cy = math.min(3, y * 4 / h)
        var x = 0
        while (x < w) {
          val cell = cy * 4 + math.min(3, x * 4 / w)
          val rgb = img.getRGB(x, y)
          val lum = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)) / 255.0
          sums(cell) += lum
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      val features = Array.tabulate(16)(i =>
        if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
      DecodedImage(r.media_id, w, h, c, features)
    }
  }

  /** Decode stage: one partition per task, batched iteration — the
    * mapInPandas shape. Repartition upstream to bound decoded-batch
    * memory (payloads dominate; at 100 TB size partitions by bytes,
    * `spark.sql.files.maxPartitionBytes`, not row count). */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(decodeImage))
  }

  /** Resize metadata transform: pure-Catalyst scaling of the decoded
    * dimensions (the real pixel resample would live in the same
    * mapPartitions as decode to avoid re-shipping payloads). */
  def resizePlan(decoded: Dataset[DecodedImage], maxSide: Int): DataFrame =
    decoded.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))

  /** Frame sampling: every `everyMs` milliseconds across a clip duration
    * read from the payload header (u32 at offset 6) — pure Catalyst
    * sequence explode, no payload shipped past the planning columns. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      .withColumn("duration_ms",
        (conv(hex(substring(col("payload"), 7, 4)), 16, 10)).cast("long"))
      .select(
        col("media_id"),
        posexplode(expr(s"sequence(0L, duration_ms, ${everyMs}L)")))
      .select(
        col("media_id"),
        col("pos").as("frame_idx"),
        col("col").as("ts_ms"))

  /** Embed decoded features through the shared embedding stage — media
    * and text share one vector pipeline downstream. */
  def featureRecords(decoded: Dataset[DecodedImage]): DataFrame =
    decoded.toDF()
      .select(
        graft.functions.GraftFunctions.uuid5(
          concat_ws("-", col("media_id"), col("width"), col("height"))).as("id"),
        col("media_id"), col("features").as("vector"))
}
