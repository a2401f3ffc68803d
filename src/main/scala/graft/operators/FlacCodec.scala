package graft.operators

/** REAL FLAC decode + encode — the one mainstream compressed audio
  * codec that is fully decodable offline: unlike MP3/AAC (whose
  * Huffman/IMDCT tables are large external data), FLAC's entire
  * bitstream is parameterized IN the stream — fixed/LPC predictors,
  * partitioned Rice residuals, CRC-8/CRC-16 integrity, and an MD5 of
  * the unencoded samples in STREAMINFO (format per the public FLAC
  * format specification / RFC 9639; reference behavior cf.
  * `/root/reference` has no audio path — this extends the multimodal
  * family the same way p36's IMA-ADPCM did).
  *
  * Decoder scope (everything a spec-valid mono/stereo 4–32 bps stream
  * can contain): STREAMINFO + skipped metadata blocks, frame headers
  * with all block-size/sample-rate/sample-size code forms, UTF-8-coded
  * frame numbers, CONSTANT / VERBATIM / FIXED(0–4) / LPC(1–32)
  * subframes, wasted bits, both Rice methods (4- and 5-bit params)
  * with escape-to-raw partitions, all four channel assignments
  * (independent, left/side, right/side, mid/side), CRC-8 header and
  * CRC-16 frame verification, and the STREAMINFO sample-MD5 check.
  * Encoder scope (enough to produce spec-valid streams any decoder
  * accepts): mono/independent channels, per-frame best fixed
  * predictor (order 0–4), single-partition Rice with per-frame
  * parameter search and raw-escape fallback, correct CRCs and MD5.
  * Lossless means the round trip is EXACT equality — FlacCodecSpec
  * pins decode(encode(x)) == x bit for bit, plus hand-assembled spec
  * vectors built from the format text (independent of the encoder's
  * bit writer) and loud-failure cases for corrupted CRC/MD5. */
object FlacCodec {

  final case class FlacAudio(sampleRate: Int, channels: Int, bps: Int,
                             totalSamples: Long, nFrames: Int,
                             samples: Array[Array[Int]])

  // ---------------------------------------------------------------- CRC

  private[operators] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  private[operators] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------ bit I/O

  private final class BitReader(val buf: Array[Byte], startByte: Int) {
    var pos: Int = startByte // byte position
    var bit: Int = 0         // bits consumed in current byte (0..7), MSB first
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def alignToByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def readBit(): Int = {
      require(pos < buf.length, "FLAC: bitstream truncated")
      val v = (buf(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      // sign-extend an n-bit two's-complement value
      if (n == 0) 0
      else if ((v & (1L << (n - 1))) != 0) (v - (1L << n)).toInt
      else v.toInt
    }
    /** FLAC unary: count of 0-bits before the terminating 1-bit. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nb += 1
      if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def alignToByte(): Unit = while (nb != 0) writeBit(0)
    def toBytes: Array[Byte] = { require(nb == 0, "unaligned"); out.toByteArray }
  }

  // --------------------------------------------------------------- decode

  /** Decode a complete FLAC stream. Verifies every frame's CRC-8 and
    * CRC-16 and (when STREAMINFO carries one) the sample MD5 — a
    * corrupted stream fails LOUDLY, it never returns wrong samples. */
  def decode(bytes: Array[Byte]): FlacAudio = {
    require(bytes.length >= 42 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C',
      "FLAC: bad magic")
    var p = 4
    // metadata blocks: STREAMINFO must be first; skip the rest
    var last = false
    var sampleRate = 0; var channels = 0; var bps = 0
    var totalSamples = 0L
    val md5 = new Array[Byte](16)
    var first = true
    while (!last) {
      val hdr = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      last = (hdr >>> 31) != 0
      val typ = (hdr >>> 24) & 0x7f
      val len = hdr & 0xffffff
      p += 4
      if (first) {
        require(typ == 0 && len == 34, "FLAC: STREAMINFO must be first")
        val r = new BitReader(bytes, p)
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        sampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
        System.arraycopy(bytes, p + 18, md5, 0, 16)
        first = false
      }
      p += len
    }
    require(sampleRate > 0, "FLAC: invalid sample rate")
    val chans = Array.fill(channels)(
      new scala.collection.mutable.ArrayBuffer[Int]())
    var nFrames = 0
    while (p < bytes.length) {
      p = decodeFrame(bytes, p, sampleRate, channels, bps, chans)
      nFrames += 1
    }
    val samples = chans.map(_.toArray)
    if (md5.exists(_ != 0)) {
      val dig = java.security.MessageDigest.getInstance("MD5")
      dig.update(interleavedLeBytes(samples, bps))
      require(java.util.Arrays.equals(dig.digest(), md5),
        "FLAC: sample MD5 mismatch — stream corrupt")
    }
    if (totalSamples > 0)
      require(samples(0).length.toLong == totalSamples,
        s"FLAC: decoded ${samples(0).length} of $totalSamples samples")
    FlacAudio(sampleRate, channels, bps, totalSamples, nFrames, samples)
  }

  /** The MD5 input: samples interleaved, little-endian,
    * ceil(bps/8) bytes each — the layout the format spec fixes. */
  private def interleavedLeBytes(samples: Array[Array[Int]], bps: Int)
      : Array[Byte] = {
    val bytesPer = (bps + 7) / 8
    val n = if (samples.isEmpty) 0 else samples(0).length
    val out = new Array[Byte](n * samples.length * bytesPer)
    var o = 0
    var i = 0
    while (i < n) {
      var c = 0
      while (c < samples.length) {
        val v = samples(c)(i)
        var b = 0
        while (b < bytesPer) { out(o) = ((v >> (8 * b)) & 0xff).toByte; o += 1; b += 1 }
        c += 1
      }
      i += 1
    }
    out
  }

  private val BlockSizes = Array(-1, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val SampleRates = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000, -8, -16, -160, -99)
  private val SampleSizes = Array(-1, 8, 12, -99, 16, 20, 24, 32)

  private def decodeFrame(bytes: Array[Byte], start: Int, siRate: Int,
                          siChannels: Int, siBps: Int,
                          chans: Array[scala.collection.mutable.ArrayBuffer[Int]])
      : Int = {
    val r = new BitReader(bytes, start)
    val sync = r.readBits(14)
    require(sync == 0x3ffe, f"FLAC: bad frame sync at $start ($sync%x)")
    r.readBit() // reserved
    r.readBit() // blocking strategy
    val bsCode = r.readBits(4).toInt
    val srCode = r.readBits(4).toInt
    val chCode = r.readBits(4).toInt
    val ssCode = r.readBits(3).toInt
    r.readBit() // reserved
    // UTF-8-coded frame/sample number (up to 36 bits → ≤ 7 bytes)
    var lead = r.readBits(8).toInt
    var follow = 0
    while ((lead & 0x80) != 0) { follow += 1; lead <<= 1; lead &= 0xff }
    var i = 0
    while (i < follow - 1) { r.readBits(8); i += 1 }
    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("FLAC: reserved block size")
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case c => BlockSizes(c)
    }
    srCode match { // STREAMINFO rules, but a frame that CONTRADICTS it
      // is corrupt — validate instead of discarding (r9 review: the
      // rate table was dead code and uncommon-rate forms went
      // unchecked)
      case 0 => ()
      case 12 => require(r.readBits(8) * 1000L == siRate,
        "FLAC: frame/STREAMINFO sample-rate mismatch")
      case 13 => require(r.readBits(16) == siRate,
        "FLAC: frame/STREAMINFO sample-rate mismatch")
      case 14 => require(r.readBits(16) * 10L == siRate,
        "FLAC: frame/STREAMINFO sample-rate mismatch")
      case 15 => throw new IllegalArgumentException("FLAC: invalid sr code")
      case c => require(SampleRates(c) == siRate,
        "FLAC: frame/STREAMINFO sample-rate mismatch")
    }
    val bps = ssCode match {
      case 0 => siBps
      case 3 => throw new IllegalArgumentException("FLAC: reserved bps code")
      case c => SampleSizes(c)
    }
    // 0–7 = 1–8 independent channels, 8/9/10 = the stereo
    // decorrelation modes; 11–15 are RESERVED and must refuse like
    // every other reserved field (r9 review: they previously decoded
    // as independent stereo — wrong samples behind a valid CRC when
    // STREAMINFO's MD5 is unset)
    require(chCode <= 10,
      s"FLAC: reserved channel assignment $chCode")
    val nCh = if (chCode <= 7) chCode + 1 else 2
    require(nCh == siChannels, "FLAC: frame/STREAMINFO channel mismatch")
    val headerEnd = r.bytePos
    require(r.aligned, "FLAC: header must be byte-aligned before CRC-8")
    val crc8Read = r.readBits(8).toInt
    require(crc8(bytes, start, headerEnd) == crc8Read, "FLAC: CRC-8 mismatch")
    // subframes: side channels carry one extra bit
    val sub = Array.ofDim[Array[Int]](nCh)
    var c = 0
    while (c < nCh) {
      val extra = chCode match {
        case 8 => if (c == 1) 1 else 0  // left/side
        case 9 => if (c == 0) 1 else 0  // right/side
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      sub(c) = decodeSubframe(r, blockSize, bps + extra)
      c += 1
    }
    r.alignToByte()
    val frameEnd = r.bytePos
    val crc16Read = r.readBits(16).toInt
    require(crc16(bytes, start, frameEnd) == crc16Read, "FLAC: CRC-16 mismatch")
    // undo inter-channel decorrelation
    val out: Array[Array[Int]] = chCode match {
      case 8 => // left/side: right = left - side
        Array(sub(0), Array.tabulate(blockSize)(i => sub(0)(i) - sub(1)(i)))
      case 9 => // right/side: left = right + side
        Array(Array.tabulate(blockSize)(i => sub(1)(i) + sub(0)(i)), sub(1))
      case 10 => // mid/side
        Array.tabulate(2, blockSize) { (ch, i) =>
          val mid = (sub(0)(i) << 1) | (sub(1)(i) & 1)
          val side = sub(1)(i)
          if (ch == 0) (mid + side) >> 1 else (mid - side) >> 1
        }
      case _ => sub
    }
    var cc = 0
    while (cc < nCh) { chans(cc) ++= out(cc); cc += 1 }
    r.bytePos
  }

  private def decodeSubframe(r: BitReader, blockSize: Int, bps: Int)
      : Array[Int] = {
    require(r.readBit() == 0, "FLAC: subframe padding bit must be 0")
    val typ = r.readBits(6).toInt
    var wasted = 0
    if (r.readBit() == 1) wasted = r.readUnary() + 1
    val eff = bps - wasted
    val out: Array[Int] =
      if (typ == 0) { // CONSTANT
        val v = r.readSigned(eff)
        Array.fill(blockSize)(v)
      } else if (typ == 1) { // VERBATIM
        Array.fill(blockSize)(r.readSigned(eff))
      } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
        val order = typ & 0x07
        val x = new Array[Int](blockSize)
        var i = 0
        while (i < order) { x(i) = r.readSigned(eff); i += 1 }
        val res = readResiduals(r, blockSize, order)
        while (i < blockSize) {
          val pred = order match {
            case 0 => 0L
            case 1 => x(i - 1).toLong
            case 2 => 2L * x(i - 1) - x(i - 2)
            case 3 => 3L * x(i - 1) - 3L * x(i - 2) + x(i - 3)
            case 4 => 4L * x(i - 1) - 6L * x(i - 2) + 4L * x(i - 3) - x(i - 4)
          }
          x(i) = (pred + res(i - order)).toInt
          i += 1
        }
        x
      } else if ((typ & 0x20) != 0) { // LPC, order 1..32
        val order = (typ & 0x1f) + 1
        val x = new Array[Int](blockSize)
        var i = 0
        while (i < order) { x(i) = r.readSigned(eff); i += 1 }
        val precision = r.readBits(4).toInt + 1
        require(precision != 16, "FLAC: invalid qlp precision (code 1111)")
        val shift = r.readSigned(5)
        require(shift >= 0, "FLAC: negative qlp shift is reserved")
        val coefs = Array.fill(order)(r.readSigned(precision))
        val res = readResiduals(r, blockSize, order)
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * x(i - 1 - j); j += 1 }
          x(i) = ((acc >> shift) + res(i - order)).toInt
          i += 1
        }
        x
      } else throw new IllegalArgumentException(
        f"FLAC: reserved subframe type $typ%02x")
    if (wasted > 0) out.map(_ << wasted) else out
  }

  private def readResiduals(r: BitReader, blockSize: Int, order: Int)
      : Array[Int] = {
    val method = r.readBits(2).toInt
    require(method <= 1, "FLAC: reserved residual coding method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readBits(4).toInt
    val nParts = 1 << partOrder
    require(blockSize % nParts == 0, "FLAC: partition order mismatch")
    val out = new Array[Int](blockSize - order)
    var o = 0
    var part = 0
    while (part < nParts) {
      val n = (blockSize >> partOrder) - (if (part == 0) order else 0)
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < n) { out(o) = if (raw == 0) 0 else r.readSigned(raw); o += 1; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = r.readUnary()
          val u = (q.toLong << param) | r.readBits(param)
          // zigzag unfold
          out(o) = (if ((u & 1L) == 0) u >>> 1 else -((u + 1) >>> 1)).toInt
          o += 1; i += 1
        }
      }
      part += 1
    }
    out
  }

  // --------------------------------------------------------------- encode

  /** Encode mono/independent-channel samples as a spec-valid FLAC
    * stream: STREAMINFO (with sample MD5), per frame the best fixed
    * predictor (order 0–4 by absolute-residual sum), single-partition
    * Rice with searched parameter and raw-escape fallback. Lossless by
    * construction — [[decode]] returns the input exactly. */
  def encode(samples: Array[Int], sampleRate: Int, bps: Int = 16,
             blockSize: Int = 4096): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), "bad sample rate")
    require(bps >= 4 && bps <= 32, "bad bps")
    require(blockSize >= 16 && blockSize <= 32768, "bad block size")
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO, last-metadata flag set
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16) // min block size
    si.writeBits(blockSize.toLong, 16) // max
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits(0L, 3)            // channels - 1 (mono)
    si.writeBits((bps - 1).toLong, 5)
    si.writeBits(samples.length.toLong, 36)
    val dig = java.security.MessageDigest.getInstance("MD5")
    dig.update(interleavedLeBytes(Array(samples), bps))
    val siBytes = si.toBytes ++ dig.digest()
    out.write(0x80); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes)
    var frame = 0
    var off = 0
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      out.write(encodeFrame(samples, off, n, frame, bps))
      off += n
      frame += 1
    }
    out.toByteArray
  }

  private def encodeFrame(samples: Array[Int], off: Int, n: Int,
                          frameIdx: Int, bps: Int): Array[Byte] = {
    val w = new BitWriter
    w.writeBits(0x3ffeL, 14) // sync
    w.writeBit(0)            // reserved
    w.writeBit(0)            // fixed-blocksize strategy: frame number
    w.writeBits(7L, 4)       // block size: 16-bit value - 1 at header end
    w.writeBits(0L, 4)       // sample rate: from STREAMINFO
    w.writeBits(0L, 4)       // channel assignment: mono
    w.writeBits(bps match {  // sample size
      case 8 => 1L; case 12 => 2L; case 16 => 4L
      case 20 => 5L; case 24 => 6L; case 32 => 7L
      case _ => 0L           // from STREAMINFO
    }, 3)
    w.writeBit(0)            // reserved
    // UTF-8-coded frame number (same scheme as codepoint encoding)
    utf8Code(w, frameIdx.toLong)
    w.writeBits((n - 1).toLong, 16)
    val headerBytes = w.toBytes // byte-aligned by construction here
    val w2 = new BitWriter
    headerBytes.foreach(b => w2.writeBits((b & 0xff).toLong, 8))
    w2.writeBits(crc8(headerBytes, 0, headerBytes.length).toLong, 8)
    // subframe: best fixed order by absolute residual sum
    val x = java.util.Arrays.copyOfRange(samples, off, off + n)
    val maxOrder = math.min(4, n - 1)
    var bestOrder = 0
    var bestCost = Long.MaxValue
    var ord = 0
    while (ord <= maxOrder) {
      val res = fixedResiduals(x, ord)
      var s = 0L
      res.foreach(r => s += math.abs(r.toLong))
      if (s < bestCost) { bestCost = s; bestOrder = ord }
      ord += 1
    }
    val res = fixedResiduals(x, bestOrder)
    // ENCODABILITY gate (r9 review): the raw escape's 5-bit width
    // field tops out at 31 bits (values in [−2³⁰, 2³⁰−1]), and a
    // residual past that would either truncate (the old silent-wrap
    // bug) or Rice-encode with an astronomically long unary run. A
    // VERBATIM subframe (samples raw at bps bits — the decoder's
    // typ==1 branch) is exact and size-bounded for any input, so
    // high-bps material whose residuals overflow the escape takes
    // that path instead. Reachable only for bps ≥ 28 (order ≤ 4
    // residual magnitude ≤ 16·2^(bps−1)).
    val escapable = res.forall(r => r >= -(1L << 30) && r < (1L << 30))
    if (!escapable) {
      w2.writeBit(0)
      w2.writeBits(0x01L, 6) // VERBATIM subframe (000001)
      w2.writeBit(0)         // no wasted bits
      x.foreach(s => w2.writeBits(s.toLong & ((1L << bps) - 1), bps))
    } else {
      w2.writeBit(0)
      w2.writeBits((0x08 | bestOrder).toLong, 6) // FIXED subframe
      w2.writeBit(0)                             // no wasted bits
      var i = 0
      while (i < bestOrder) { w2.writeBits(x(i).toLong & ((1L << bps) - 1), bps); i += 1 }
      writeResiduals(w2, res)
    }
    w2.alignToByte()
    val body = w2.toBytes
    val w3 = new BitWriter
    body.foreach(b => w3.writeBits((b & 0xff).toLong, 8))
    w3.writeBits(crc16(body, 0, body.length).toLong, 16)
    w3.toBytes
  }

  /** Residuals in LONG, exactly: an order-4 predictor on 32-bit
    * samples can produce |residual| up to ~2³⁵, and the previous Int
    * return silently wrapped it — the stream then failed its own MD5
    * on decode (r9 review). Exact longs here; whether they are
    * ENCODABLE (Rice/escape vs verbatim fallback) is the caller's
    * branch. */
  private def fixedResiduals(x: Array[Int], order: Int): Array[Long] = {
    Array.tabulate(x.length - order) { k =>
      val i = k + order
      val pred = order match {
        case 0 => 0L
        case 1 => x(i - 1).toLong
        case 2 => 2L * x(i - 1) - x(i - 2)
        case 3 => 3L * x(i - 1) - 3L * x(i - 2) + x(i - 3)
        case 4 => 4L * x(i - 1) - 6L * x(i - 2) + 4L * x(i - 3) - x(i - 4)
      }
      x(i) - pred
    }
  }

  private def writeResiduals(w: BitWriter, res: Array[Long]): Unit = {
    w.writeBits(0L, 2) // rice method 0 (4-bit params)
    w.writeBits(0L, 4) // partition order 0
    // parameter search: total bits for each k; escape when raw wins
    val us = res.map(r => (r << 1) ^ (r >> 63))
    var bestK = -1
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var bits = 0L
      var i = 0
      while (i < us.length && bits < bestBits) {
        bits += (us(i) >>> k) + 1 + k
        i += 1
      }
      if (bits < bestBits) { bestBits = bits; bestK = k }
      k += 1
    }
    val maxAbs = res.foldLeft(0L)((m, r) => math.max(m, math.abs(r)))
    var rawBits = 1
    while (rawBits < 31 && (1L << (rawBits - 1)) <= maxAbs) rawBits += 1
    if (rawBits.toLong * res.length < bestBits) {
      w.writeBits(15L, 4) // escape
      w.writeBits(rawBits.toLong, 5)
      res.foreach(r => w.writeBits(r & ((1L << rawBits) - 1), rawBits))
    } else {
      w.writeBits(bestK.toLong, 4)
      var i = 0
      while (i < us.length) {
        val u = us(i)
        val q = (u >>> bestK).toInt
        var j = 0
        while (j < q) { w.writeBit(0); j += 1 }
        w.writeBit(1)
        w.writeBits(u & ((1L << bestK) - 1), bestK)
        i += 1
      }
    }
  }

  /** The frame-number coding: UTF-8's length-prefix scheme applied to
    * an arbitrary value (not a codepoint — surrogates etc. are NOT
    * excluded), as the format spec defines. */
  private def utf8Code(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.writeBits(v, 8)
    else {
      // an nBytes-long code carries 5·nBytes+1 payload bits
      var nBytes = 2
      while (v >= (1L << (nBytes * 5 + 1)) && nBytes < 7) nBytes += 1
      // lead byte: nBytes ones, a zero, then the top (7 - nBytes)
      // payload bits
      w.writeBits((1L << nBytes) - 1, nBytes)
      w.writeBit(0)
      w.writeBits(v >> (6 * (nBytes - 1)), 7 - nBytes)
      var i = nBytes - 2
      while (i >= 0) {
        w.writeBits(2L, 2) // 10 continuation
        w.writeBits((v >> (6 * i)) & 0x3f, 6)
        i -= 1
      }
    }
  }
}
