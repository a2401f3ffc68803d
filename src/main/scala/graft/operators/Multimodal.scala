package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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
  * deterministic synthetic-header stand-in.
  *
  * Audio decode is REAL for RIFF/WAVE PCM (8/16-bit, any channel
  * count) via a hand-rolled chunk parser — the container ships no
  * audio libs, but WAV is a public fixed layout: sample rate,
  * channels, frame count, duration, RMS/peak level, and a 16-bin RMS
  * envelope. COMPRESSED sample decode is real for IMA/DVI ADPCM
  * (format tag 0x11, 4-bit — complete public formula + two small
  * fixed tables, pinned against an independent reference decoder in
  * MultimodalSpec) AND for FLAC (round 9 — [[FlacCodec]], the full
  * bitstream: fixed/LPC prediction, partitioned Rice, CRC-8/16,
  * STREAMINFO MD5; no external tables exist to obtain, the stream is
  * self-describing); MP3/AAC/H.264 sample decode still falls to the
  * marked stubs (their Huffman/IMDCT table data is unobtainable
  * offline), though their FRAMING walks in [[CodecMeta]] are real.
  *
  * Video METADATA is REAL for MP4/ISO-BMFF via a hand-rolled box
  * walker (ftyp/moov/mvhd/trak/tkhd/mdia/hdlr are a fixed public
  * layout): duration, timescale, track count/types, and the video
  * track's pixel dimensions — enough to drive real frame-sampling
  * plans. Compressed A/V codec FRAMING is real too — MP3/ADTS frame
  * walks and H.264 SPS geometry live in [[CodecMeta]]; only sample
  * DATA decode for those codecs (Huffman/IMDCT/filterbanks, libs this
  * container lacks) falls to the marked deterministic stubs.
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

  /** Decoded audio clip: stream parameters, level stats in [0,1], and a
    * 16-bin RMS envelope over time. */
  final case class DecodedAudio(media_id: Long, sample_rate: Int, channels: Int,
                                bits: Int, n_frames: Long, duration_ms: Long,
                                rms: Double, peak: Double, envelope: Array[Float])

  /** RIFF/WAVE magic. */
  private def looksLikeWav(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Deterministic stand-in for the compressed audio codecs that
    * remain undecodable offline (MP3/OGG — external Huffman/IMDCT
    * table data; FLAC and ADPCM are REAL now) — marked STUB, mirrors
    * [[decodeImageStub]]: degrade, never fail the batch. */
  def decodeAudioStub(r: MediaRow): DecodedAudio = {
    val p = r.payload
    if (p == null || p.length < 8)
      return DecodedAudio(r.media_id, 0, 0, 0, 0L, 0L, 0.0, 0.0, new Array[Float](16))
    var acc = 0x9e3779b9
    val env = new Array[Float](16)
    var i = 0
    while (i < p.length) {
      acc = acc * 31 + (p(i) & 0xff)
      env(i % 16) = ((acc & 0xffff).toFloat / 65535f)
      i += 1
    }
    DecodedAudio(r.media_id, 8000, 1, 16, p.length.toLong, p.length.toLong * 1000 / 8000,
      0.0, 0.0, env)
  }

  /** REAL WAV/PCM decode: walks RIFF chunks for `fmt ` and `data`,
    * supports PCM (format 1) at 8-bit unsigned or 16-bit signed LE,
    * any channel count. Levels are computed over every sample
    * (channels mixed into the stats, not averaged per frame) and
    * normalized to [0,1] by the sample-format full scale; the envelope
    * is RMS over 16 equal spans of the frame axis. Non-WAV and
    * malformed payloads fall back to [[decodeAudioStub]]. */
  /** The level-stats convention shared by every decode path (PCM,
    * ADPCM, FLAC — r9 review: the loop had grown a copy per codec):
    * RMS and peak over ALL samples (channels mixed into the stats,
    * not averaged per frame), normalized to [0,1] by `fullScale`, and
    * a 16-bin RMS envelope over the frame axis. `sample(frame, ch)`
    * abstracts the storage layout (interleaved WAV words, planar FLAC
    * arrays). Frame index stays Long throughout — `frame * 16` wrapped
    * an Int at ≥ 2²⁷ samples once before. */
  private def levelStats(nFrames: Long, channels: Int, fullScale: Double,
                         sample: (Long, Int) => Long)
  : (Double, Double, Array[Float]) = {
    var sumSq = 0.0
    var peakAbs = 0L
    val envSumSq = new Array[Double](16)
    val envN = new Array[Long](16)
    var fr = 0L
    var n = 0L
    while (fr < nFrames) {
      val bin = math.min(15L, fr * 16 / nFrames).toInt
      var c = 0
      while (c < channels) {
        val v = sample(fr, c)
        val sq = (v * v).toDouble // |v| ≤ 2³¹ ⇒ v² ≤ 2⁶² — exact in Long
        sumSq += sq
        if (math.abs(v) > peakAbs) peakAbs = math.abs(v)
        envSumSq(bin) += sq
        envN(bin) += 1
        n += 1
        c += 1
      }
      fr += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n) / fullScale
    val envelope = Array.tabulate(16)(b =>
      if (envN(b) == 0) 0f
      else (math.sqrt(envSumSq(b) / envN(b)) / fullScale).toFloat)
    (rms, peakAbs / fullScale, envelope)
  }

  def decodeAudio(r: MediaRow): DecodedAudio = {
    val p = r.payload
    // REAL FLAC decode (round 9): "fLaC" magic routes to the full
    // bitstream decoder ([[FlacCodec]] — fixed/LPC prediction,
    // partitioned Rice, CRC-verified); stats then follow the same
    // conventions as the PCM path. A malformed/corrupt stream degrades
    // to the stub like every other path here — never fails the batch.
    if (p != null && p.length >= 4 &&
        p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C') {
      try {
        val f = FlacCodec.decode(p)
        val nFrames = if (f.samples.isEmpty) 0L else f.samples(0).length.toLong
        // channels are stored planar in FlacAudio
        val (rms, peak, envelope) = levelStats(nFrames, f.samples.length,
          math.pow(2.0, f.bps - 1), (fr, c) => f.samples(c)(fr.toInt).toLong)
        return DecodedAudio(r.media_id, f.sampleRate, f.channels, f.bps,
          nFrames, nFrames * 1000L / f.sampleRate, rms, peak, envelope)
      } catch { case scala.util.control.NonFatal(_) => return decodeAudioStub(r) }
    }
    if (!looksLikeWav(p)) return decodeAudioStub(r)
    def u16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) | ((p(i + 2) & 0xffL) << 16) |
        ((p(i + 3) & 0xffL) << 24)
    try {
      // the walk offset and chunk size stay Long: a size field >= 2 GiB
      // wrapped to a negative Int here, advancing the walk by <= 0 — an
      // infinite loop inside a Spark task that the NonFatal catch can
      // never interrupt. In Long the advance is always >= 8, so the walk
      // terminates on any byte pattern; an oversized/truncated data
      // chunk clamps (in Long — an Int min would re-wrap) to the bytes
      // actually present, keeping truncated-but-decodable files decodable.
      var off = 12L
      var fmtOff = -1
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= p.length && (fmtOff < 0 || dataOff < 0)) {
        val id = new String(p, off.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = u32(off.toInt + 4)
        if (id == "fmt ") fmtOff = off.toInt + 8
        else if (id == "data") {
          dataOff = off.toInt + 8
          dataLen = math.max(0L, math.min(size, (p.length - dataOff).toLong)).toInt
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        off += 8L + size + (size & 1L)
      }
      if (fmtOff < 0 || dataOff < 0) return decodeAudioStub(r)
      val audioFormat = u16(fmtOff)
      val channels = u16(fmtOff + 2)
      val sampleRate = u32(fmtOff + 4).toInt
      val blockAlign = u16(fmtOff + 12)
      val bits = u16(fmtOff + 14)
      // REAL compressed-sample decode path: IMA/DVI ADPCM (format tag
      // 0x11, 4-bit) — the one compressed audio codec whose complete
      // decode is public FORMULA + two small public tables (step sizes
      // + index deltas), no Huffman/IMDCT data to obtain. Decoded to
      // 16-bit samples, then the same stats pipeline as PCM.
      val adpcm: Array[Short] =
        if (audioFormat == 0x11 && bits == 4 && channels >= 1 &&
            blockAlign >= 4 * channels && sampleRate >= 1)
          decodeImaAdpcm(p, dataOff, dataLen, channels, blockAlign)
        else null
      if (adpcm == null &&
          (audioFormat != 1 || (bits != 8 && bits != 16) || channels < 1 || sampleRate < 1))
        return decodeAudioStub(r)
      val nSamples =
        if (adpcm != null) adpcm.length else dataLen / (bits / 8)
      val nFrames = nSamples.toLong / channels
      val fullScale = if (bits == 8) 128.0 else 32768.0
      // interleaved storage: sample index = frame·channels + channel.
      // A trailing partial frame (nSamples not a channel multiple) was
      // previously mixed into the stats sample-by-sample; the
      // frame-major walk reads only whole frames — same values for
      // every well-formed file (data size is a blockAlign multiple).
      val (rms, peak, envelope) = levelStats(nFrames, channels, fullScale,
        (fr, c) => {
          val s = (fr * channels + c).toInt
          if (adpcm != null) adpcm(s).toLong
          else if (bits == 16) u16(dataOff + s * 2).toShort.toLong
          else (p(dataOff + s) & 0xff) - 128L // 8-bit WAV is unsigned
        })
      DecodedAudio(r.media_id, sampleRate, channels, bits, nFrames,
        nFrames * 1000L / sampleRate, rms, peak, envelope)
    } catch { case scala.util.control.NonFatal(_) => decodeAudioStub(r) }
  }

  /** Audio decode stage — same mapPartitions batch shape as
    * [[decodeImages]]. */
  def decodeAudios(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(decodeAudio))
  }

  /** Minimal RIFF/WAVE PCM writer (tests + synthetic payloads):
    * interleaved 16-bit signed LE samples. */
  /** IMA/DVI ADPCM step-size table (IMA ADPCM spec / RFC 3551 §4.5.1
    * lineage — 89 entries, public fixed data). */
  private[graft] val imaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** IMA ADPCM index-adjust table (4-bit codes; sign bit ignored). */
  private val imaIndexAdj: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode IMA-ADPCM WAV `data` bytes to interleaved 16-bit samples.
    *
    * Microsoft IMA-ADPCM block layout (format tag 0x11): per channel a
    * 4-byte header (predictor int16 LE, step index u8, reserved u8) —
    * the header predictor IS the block's first output sample — then
    * 4-byte words round-robin per channel, each word carrying 8
    * nibbles, LOW nibble first. The standard nibble step: diff =
    * step>>3 (+step if bit2, +step>>1 if bit1, +step>>2 if bit0),
    * subtract when bit3 set, clamp predictor to int16 and index to
    * [0, 88]. A trailing partial block decodes its complete words
    * only (truncated-but-decodable, the RIFF-walk convention).
    * MultimodalSpec pins output against an independently written
    * reference decoder's vectors. */
  private[graft] def decodeImaAdpcm(p: Array[Byte], dataOff: Int,
      dataLen: Int, channels: Int, blockAlign: Int): Array[Short] = {
    val headerBytes = 4 * channels
    val wordsPerRound = 4 * channels
    val out = new scala.collection.mutable.ArrayBuffer[Short]()
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var blk = 0
    while (blk * blockAlign + headerBytes <= dataLen) {
      val base = dataOff + blk * blockAlign
      val blockEnd = math.min(blockAlign, dataLen - blk * blockAlign)
      var ch = 0
      while (ch < channels) {
        pred(ch) = (((p(base + ch * 4 + 1) & 0xff) << 8) |
          (p(base + ch * 4) & 0xff)).toShort.toInt
        idx(ch) = math.max(0, math.min(88, p(base + ch * 4 + 2) & 0xff))
        ch += 1
      }
      // header predictors are the first frame, interleaved
      ch = 0
      while (ch < channels) { out += pred(ch).toShort; ch += 1 }
      // data words: per round, one 4-byte word per channel = 8 frames;
      // buffer the round so output stays frame-interleaved
      val round = Array.ofDim[Short](8, channels)
      var off = headerBytes
      while (off + wordsPerRound <= blockEnd) {
        ch = 0
        while (ch < channels) {
          var b = 0
          while (b < 4) {
            val byte = p(base + off + ch * 4 + b) & 0xff
            var half = 0
            while (half < 2) {
              val nib = if (half == 0) byte & 0xf else byte >> 4
              val step = imaStep(idx(ch))
              var diff = step >> 3
              if ((nib & 4) != 0) diff += step
              if ((nib & 2) != 0) diff += step >> 1
              if ((nib & 1) != 0) diff += step >> 2
              pred(ch) = math.max(-32768, math.min(32767,
                if ((nib & 8) != 0) pred(ch) - diff else pred(ch) + diff))
              idx(ch) = math.max(0, math.min(88, idx(ch) + imaIndexAdj(nib & 7)))
              round(b * 2 + half)(ch) = pred(ch).toShort
              half += 1
            }
            b += 1
          }
          ch += 1
        }
        var f = 0
        while (f < 8) {
          ch = 0
          while (ch < channels) { out += round(f)(ch); ch += 1 }
          f += 1
        }
        off += wordsPerRound
      }
      blk += 1
    }
    out.toArray
  }

  /** IMA-ADPCM mono ENCODER — [[decodeImaAdpcm]]'s mirror, the
    * standard greedy nibble quantizer: per sample, emit the 4-bit code
    * whose decoded step best approximates the prediction error
    * (magnitude bits peeled off step, step/2, step/4), then update
    * predictor/index by DECODING that nibble, so encoder and decoder
    * state never drift. Input must fill whole blocks
    * (`(blockAlign − 4)·2 + 1` samples per block — the first sample of
    * each block rides in the header verbatim). MultimodalSpec pins the
    * encode→decode round-trip: exact length/first-samples and a ≥20 dB
    * SNR bound on a sine sweep (4-bit ADPCM's design point). */
  def encodeImaAdpcm(samples: Array[Short], blockAlign: Int): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"blockAlign=$blockAlign must be a positive multiple of 4, >= 8")
    val perBlock = (blockAlign - 4) * 2 + 1
    require(samples.nonEmpty && samples.length % perBlock == 0,
      s"need whole blocks of $perBlock samples, got ${samples.length}")
    val nBlocks = samples.length / perBlock
    val out = new Array[Byte](nBlocks * blockAlign)
    var idx = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * blockAlign
      val s0 = samples(blk * perBlock)
      out(base) = (s0 & 0xff).toByte
      out(base + 1) = ((s0 >> 8) & 0xff).toByte
      out(base + 2) = idx.toByte
      var pred = s0.toInt
      var i = 1
      while (i < perBlock) {
        val step = imaStep(idx)
        var delta = samples(blk * perBlock + i) - pred
        var nib = 0
        if (delta < 0) { nib = 8; delta = -delta }
        if (delta >= step) { nib |= 4; delta -= step }
        if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1 }
        if (delta >= (step >> 2)) nib |= 1
        // state update mirrors the decoder bit for bit
        var diff = step >> 3
        if ((nib & 4) != 0) diff += step
        if ((nib & 2) != 0) diff += step >> 1
        if ((nib & 1) != 0) diff += step >> 2
        pred = math.max(-32768, math.min(32767,
          if ((nib & 8) != 0) pred - diff else pred + diff))
        idx = math.max(0, math.min(88, idx + imaIndexAdj(nib & 7)))
        val byteOff = base + 4 + (i - 1) / 2
        if ((i - 1) % 2 == 0) out(byteOff) = (nib & 0xf).toByte
        else out(byteOff) = (out(byteOff) | ((nib & 0xf) << 4)).toByte
        i += 1
      }
      blk += 1
    }
    out
  }

  /** WAV container around IMA-ADPCM blocks (format tag 0x11) — the
    * test/fixture builder twin of [[wavPcm16]]. `blocks` is the raw
    * `data` payload (caller-built blocks of `blockAlign` bytes). */
  def wavImaAdpcm(sampleRate: Int, channels: Int, blockAlign: Int,
                  blocks: Array[Byte]): Array[Byte] = {
    val samplesPerBlock = (blockAlign - 4 * channels) * 2 / channels + 1
    val b = java.nio.ByteBuffer.allocate(48 + blocks.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(40 + blocks.length).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(20)
      .putShort(0x11).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign / math.max(1, samplesPerBlock))
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(samplesPerBlock.toShort)
    b.put("data".getBytes).putInt(blocks.length)
    b.put(blocks)
    b.array()
  }

  def wavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    b.put("data".getBytes).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  /** One fixed-width analysis window of a decoded clip: exact integer
    * sum of squared samples (16-bit PCM ⇒ each s² ≤ 2³⁰, so a window
    * would need ~2³³ samples to overflow the Long — far past any real
    * window width). */
  final case class AudioWindow(media_id: Long, sample_rate: Int, win_id: Long,
                               n_frames: Long, energy: Long)

  /** RIFF walk for the 16-bit PCM fast path (the [[decodeAudio]] walk
    * specialized: that one also serves 8-bit and computes float stats;
    * this one hands sample-exact integers to window analyses).
    * Returns (sampleRate, channels, dataOff, nSamples) or None for
    * anything that is not mono/stereo 16-bit PCM WAV. */
  private def wavPcm16Layout(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (!looksLikeWav(p)) return None
    def u16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) | ((p(i + 2) & 0xffL) << 16) |
        ((p(i + 3) & 0xffL) << 24)
    try {
      // Long walk offsets — the decodeAudio 2 GiB-size-field lesson
      var off = 12L
      var fmtOff = -1
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= p.length && (fmtOff < 0 || dataOff < 0)) {
        val id = new String(p, off.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = u32(off.toInt + 4)
        if (id == "fmt ") fmtOff = off.toInt + 8
        else if (id == "data") {
          dataOff = off.toInt + 8
          dataLen = math.max(0L, math.min(size, (p.length - dataOff).toLong)).toInt
        }
        off += 8L + size + (size & 1L)
      }
      if (fmtOff < 0 || dataOff < 0) return None
      if (u16(fmtOff) != 1 || u16(fmtOff + 14) != 16) return None
      val channels = u16(fmtOff + 2)
      val sampleRate = u32(fmtOff + 4).toInt
      if (channels < 1 || sampleRate < 1) return None
      Some((sampleRate, channels, dataOff, dataLen / 2))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-window energy extraction — the analysis stage under
    * silence/VAD segmentation: window `w` covers frames
    * [w·windowFrames, min((w+1)·windowFrames, nFrames)) and reports
    * the EXACT Σ s² over all channels (integers end to end, so an SQL
    * oracle can replay the decision bit for bit). Payloads that are
    * not decodable 16-bit PCM contribute no windows (the degrade-not-
    * fail batch convention of [[decodeAudio]]; callers wanting loud
    * failures count output media vs input media). */
  def audioWindowEnergies(media: Dataset[MediaRow],
                          windowFrames: Int): Dataset[AudioWindow] = {
    require(windowFrames >= 1, "windowFrames must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      val p = r.payload
      wavPcm16Layout(p) match {
        case None => Iterator.empty
        case Some((sampleRate, channels, dataOff, nSamples)) =>
          val nFrames = nSamples.toLong / channels
          val nWins = ((nFrames + windowFrames - 1) / windowFrames).toInt
          def s16(s: Int): Long =
            ((p(dataOff + s * 2) & 0xff) | ((p(dataOff + s * 2 + 1) & 0xff) << 8))
              .toShort.toLong
          (0 until nWins).iterator.map { w =>
            val f0 = w.toLong * windowFrames
            val f1 = math.min(f0 + windowFrames, nFrames)
            var energy = 0L
            var s = (f0 * channels).toInt
            val sEnd = (f1 * channels).toInt
            while (s < sEnd) { val v = s16(s); energy += v * v; s += 1 }
            AudioWindow(r.media_id, sampleRate, w.toLong, f1 - f0, energy)
          }
      }
    })
  }

  /** Parsed MP4 container metadata (no sample-data decode). */
  final case class VideoMeta(media_id: Long, duration_ms: Long, timescale: Long,
                             n_tracks: Int, has_video: Boolean, has_audio: Boolean,
                             width: Int, height: Int)

  /** ISO-BMFF magic: a plausible leading box whose type is `ftyp` or
    * `moov` (streaming-friendly files may lead with either). */
  private def looksLikeMp4(p: Array[Byte]): Boolean =
    p != null && p.length >= 8 && {
      val t = new String(p, 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      t == "ftyp" || t == "moov"
    }

  /** REAL MP4/ISO-BMFF metadata parse: walks the box tree (size+fourcc
    * headers; containers moov/trak/mdia recursed) for `mvhd` (v0/v1
    * timescale + duration), per-track `hdlr` (vide/soun handler types)
    * and the first video track's `tkhd` pixel dimensions (16.16 fixed
    * point). Returns null-object zeros for non-MP4 / torn payloads —
    * a batch never dies on one bad file. */
  def decodeVideoMeta(r: MediaRow): VideoMeta = {
    val p = r.payload
    val none = VideoMeta(r.media_id, 0L, 0L, 0, has_video = false, has_audio = false, 0, 0)
    if (!looksLikeMp4(p)) return none
    def u32(i: Int): Long =
      ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
        ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def fourcc(i: Int): String =
      new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var timescale = 0L
    var duration = 0L
    var nTracks = 0
    var hasVideo = false
    var hasAudio = false
    var width = 0
    var height = 0
    var trackW = 0
    var trackH = 0
    val containers = Set("moov", "trak", "mdia")
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size = u32(off)
        if (size < 8 || off + size > end) return // torn box: stop cleanly
        val typ = fourcc(off + 4)
        val body = off + 8
        typ match {
          case "mvhd" =>
            val v = p(body) & 0xff
            if (v == 1 && size >= 8 + 4 + 16 + 4 + 8) {
              timescale = u32(body + 20); duration = u64(body + 24)
            } else if (v == 0 && size >= 8 + 4 + 8 + 4 + 4) {
              timescale = u32(body + 12); duration = u32(body + 16)
            }
          case "trak" =>
            nTracks += 1; trackW = 0; trackH = 0
            walk(body, off + size.toInt)
          case "tkhd" =>
            val v = p(body) & 0xff
            val dimOff = if (v == 1) body + 88 else body + 76
            if (dimOff + 8 <= off + size) {
              trackW = (u32(dimOff) >> 16).toInt   // 16.16 fixed point
              trackH = (u32(dimOff + 4) >> 16).toInt
            }
          case "hdlr" =>
            if (body + 12 + 4 <= off + size) fourcc(body + 8) match {
              case "vide" =>
                hasVideo = true
                if (width == 0) { width = trackW; height = trackH }
              case "soun" => hasAudio = true
              case _ => ()
            }
          case t if containers(t) => walk(body, off + size.toInt)
          case _ => ()
        }
        off += size.toInt
      }
    }
    try {
      walk(0, p.length)
      if (timescale == 0) none
      else VideoMeta(r.media_id, duration * 1000L / timescale, timescale,
        nTracks, hasVideo, hasAudio, width, height)
    } catch { case scala.util.control.NonFatal(_) => none }
  }

  /** Video-metadata stage — same mapPartitions batch shape. */
  def decodeVideoMetas(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(decodeVideoMeta))
  }

  /** Minimal MP4 writer (tests + synthetic payloads): ftyp + moov with
    * one mvhd (v0) and one trak (tkhd + mdia/hdlr) per entry of
    * `tracks` = (handler fourcc e.g. "vide"/"soun", width, height). */
  def mp4Meta(timescale: Int, duration: Long,
              tracks: Seq[(String, Int, Int)]): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 1) ++ "isom".getBytes)
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0)                      // version 0 + flags
      b.putInt(0).putInt(0)            // ctime mtime
      b.putInt(timescale).putInt(duration.toInt)
      b.array()
    }
    val traks = tracks.map { case (handler, w, h) =>
      val tkhd = {
        val b = java.nio.ByteBuffer.allocate(84)
        b.putInt(0)                    // version + flags
        b.putInt(0).putInt(0)          // ctime mtime
        b.putInt(1).putInt(0)          // track id + reserved
        b.putInt(duration.toInt)
        b.position(76)                 // reserved/layer/volume/matrix
        b.putInt(w << 16).putInt(h << 16)
        b.array()
      }
      val hdlr = {
        val b = java.nio.ByteBuffer.allocate(24)
        b.putInt(0).putInt(0)          // version+flags, predefined
        b.put(handler.getBytes("US-ASCII"))
        b.array()
      }
      box("trak", box("tkhd", tkhd) ++ box("mdia", box("hdlr", hdlr)))
    }
    ftyp ++ box("moov", box("mvhd", mvhd) ++ traks.flatten.toArray)
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

  /** 12-bit row-difference dHash over the 4×4 luminance-grid features
    * of [[decodeImage]]: bit (cy·3 + cx) set iff cell (cy,cx) is
    * brighter than its right neighbor — the classic difference-hash
    * layout (row-adjacent gradient signs), at the grid resolution the
    * decoder already extracts. Pure Catalyst (12 static comparisons,
    * codegen'd); equal-feature ties compare false on both engines
    * because the comparison is strict. */
  def dHash(featuresCol: Column): Column =
    (for (cy <- 0 until 4; cx <- 0 until 3) yield {
      val cell = cy * 4 + cx
      val idx = cy * 3 + cx
      when(featuresCol.getItem(cell) > featuresCol.getItem(cell + 1),
        lit(1L << idx)).otherwise(lit(0L))
    }).reduce(_ + _)

  /** Perceptual dedup groups: one row per distinct dHash with the
    * kept (minimum) media id and copy count — [[graft.operators.Dedup.exactKeepFirst]]
    * at perceptual rather than byte identity. The shuffle key is the
    * 8-byte hash, never pixels: decode and hashing are scan-local, so
    * the exchange carries (hash, id) pairs — the 100 TB posture for
    * image-corpus dedup. */
  def dHashGroups(decoded: DataFrame): DataFrame =
    decoded
      .select(col("media_id"), dHash(col("features")).as("dhash"))
      .groupBy(col("dhash"))
      .agg(min(col("media_id")).as("kept_id"), count(lit(1)).as("n_copies"))

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
