package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[FlacCodec]]: lossless round-trip EXACT equality across
  * signal shapes / block sizes / lengths, hand-assembled spec vectors
  * built bit-by-bit from the format text (independent of the
  * encoder's writer — they exercise decoder paths the encoder never
  * emits: LPC, 5-bit Rice, partition order > 0, wasted bits), and
  * loud-failure cases for corrupted CRC-8/CRC-16/MD5. */
class FlacCodecSpec extends AnyFunSuite {

  private def roundTrip(x: Array[Int], blockSize: Int = 4096,
                        rate: Int = 44100): Unit = {
    val bytes = FlacCodec.encode(x, rate, bps = 16, blockSize = blockSize)
    val dec = FlacCodec.decode(bytes)
    assert(dec.sampleRate === rate && dec.channels === 1 && dec.bps === 16)
    assert(dec.samples(0).toSeq === x.toSeq, "lossless means EXACT")
  }

  test("round-trip: constant, ramp, wave, noise, mixed, odd lengths") {
    roundTrip(Array.fill(1000)(1234))
    roundTrip(Array.tabulate(1000)(i => i - 500))
    roundTrip(Array.tabulate(777)(i =>
      (math.sin(i / 7.0) * 12000).toInt), blockSize = 256)
    // full-range deterministic noise: rice param search + escape path
    roundTrip(Array.tabulate(513)(i =>
      (((i * 2654435761L + 104729) % 65536) - 32768).toInt), blockSize = 64)
    roundTrip(Array.tabulate(65)(i =>
      (i % 13) * 700 + (((i * 31) % 7) - 3)), blockSize = 64)
    roundTrip(Array(42)) // single sample, order-0 only
  }

  test("round-trip at 32 bps: full-scale alternation takes the VERBATIM " +
      "fallback and still decodes exactly") {
    // r9 review regression: order-0 residuals of ±2³¹-scale samples
    // exceed the raw escape's 31-bit ceiling; the encoder used to mask
    // off the high bits and the stream failed its own MD5 on decode.
    // The encodability gate now emits a VERBATIM subframe instead.
    val x = Array.tabulate(100)(i =>
      if (i % 2 == 0) Int.MaxValue else Int.MinValue)
    val bytes = FlacCodec.encode(x, 8000, bps = 32, blockSize = 64)
    val dec = FlacCodec.decode(bytes)
    assert(dec.bps === 32 && dec.samples(0).toSeq === x.toSeq)
    // high-order residual overflow (|res| past Int range) on smoother
    // high-bps material must also survive: a steep 28-bit ramp
    val ramp = Array.tabulate(500)(i => (i - 250) * (1 << 19))
    val b2 = FlacCodec.encode(ramp, 8000, bps = 28, blockSize = 128)
    assert(FlacCodec.decode(b2).samples(0).toSeq === ramp.toSeq)
  }

  test("round-trip: many frames exercise the UTF-8 frame-number coding") {
    // 200 frames of 16... blockSize min is 16: 3200 samples; frame
    // numbers 0..199 cross the 1-byte/2-byte UTF-8 boundary at 128
    val x = Array.tabulate(3200)(i => (i * 37) % 2000 - 1000)
    roundTrip(x, blockSize = 16)
  }

  // minimal MSB-first bit assembler, independent of FlacCodec's writer
  private class Bits {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0; private var n = 0
    def b(v: Long, width: Int): this.type = {
      var i = width - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt; n += 1
        if (n == 8) { out += cur.toByte; cur = 0; n = 0 }
        i -= 1
      }
      this
    }
    def bytes: Array[Byte] = { require(n == 0); out.toArray }
  }

  // independent table-driven CRCs (the codec's are bitwise loops)
  private lazy val crc8T: Array[Int] = Array.tabulate(256) { b =>
    var c = b
    for (_ <- 0 until 8) c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
    c
  }
  private lazy val crc16T: Array[Int] = Array.tabulate(256) { b =>
    var c = b << 8
    for (_ <- 0 until 8) c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff
    c
  }
  private def tcrc8(bs: Seq[Byte]): Int =
    bs.foldLeft(0)((c, x) => crc8T((c ^ (x & 0xff)) & 0xff))
  private def tcrc16(bs: Seq[Byte]): Int =
    bs.foldLeft(0)((c, x) => ((c << 8) & 0xffff) ^ crc16T(((c >> 8) ^ (x & 0xff)) & 0xff))

  /** STREAMINFO + headers for a hand-built single-frame mono stream;
    * zero MD5 = "unset", the decoder then skips the sample check. */
  private def handStream(blockSize: Int, bps: Int, body: Bits => Unit)
      : Array[Byte] = {
    val si = new Bits()
      .b(blockSize, 16).b(blockSize, 16).b(0, 24).b(0, 24)
      .b(8000, 20).b(0, 3).b(bps - 1, 5).b(blockSize, 36)
    val head = Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 34) ++
      si.bytes ++ new Array[Byte](16)
    // frame header: sync, blocking 0, bs code 7 (16-bit at end),
    // sr from STREAMINFO, mono, bps code, frame #0, bs-1
    val fh = new Bits().b(0x3ffe, 14).b(0, 1).b(0, 1).b(7, 4).b(0, 4)
      .b(0, 4).b(if (bps == 16) 4 else 0, 3).b(0, 1)
      .b(0, 8).b(blockSize - 1, 16)
    val withCrc8 = fh.bytes :+ tcrc8(fh.bytes.toSeq).toByte
    val bb = new Bits()
    withCrc8.foreach(x => bb.b(x & 0xff, 8))
    body(bb) // body must leave bb byte-aligned (pad bits included)
    val frame = bb.bytes
    head ++ frame ++ new Bits().b(tcrc16(frame.toSeq), 16).bytes
  }

  test("spec vector: CONSTANT subframe (hand-assembled bits)") {
    // subframe bits 1+6+1+16 = 24: already byte-aligned, no pad
    val bytes = handStream(32, 16, bb => {
      bb.b(0, 1).b(0, 6).b(0, 1)      // CONSTANT, no wasted bits
      bb.b(-777L & 0xffff, 16)        // the constant, 16-bit signed
    })
    val dec = FlacCodec.decode(bytes)
    assert(dec.samples(0).toSeq === Seq.fill(32)(-777))
    assert(dec.nFrames === 1 && dec.sampleRate === 8000)
  }

  test("spec vector: LPC order-1 + 5-bit rice + partition order 1 + wasted bits") {
    // x_0 = 12 (warmup, 15 effective bits: 1 wasted bit, stored >> 1);
    // LPC coef 2, shift 1 -> pred_i = (2 * x_{i-1}) >> 1 = x_{i-1};
    // residuals +1 each -> stored samples 6,7,...,21 then <<1 at the
    // end: decoded = 12,14,...,42. Partition order 1 over 16 samples:
    // part 0 has 8 - order = 7 residuals, part 1 has 8. Method 1
    // (5-bit params), k = 0: zigzag(+1) = 2 -> unary 001.
    val bytes = handStream(16, 16, bb => {
      bb.b(0, 1).b(0x20, 6)           // LPC order 1 (100000 -> order-1+1)
      bb.b(1, 1).b(1, 1)              // wasted-bits flag, unary "1" = 1 bit
      bb.b(6, 15)                     // warmup sample (15 effective bits)
      bb.b(3, 4)                      // qlp precision-1 = 3 -> 4 bits
      bb.b(1, 5)                      // shift = 1
      bb.b(2, 4)                      // coefficient = 2 (4-bit signed)
      bb.b(1, 2)                      // residual method 1 (rice5)
      bb.b(1, 4)                      // partition order 1
      bb.b(0, 5)                      // partition 0: k = 0
      for (_ <- 0 until 7) bb.b(1, 3) // 001 x7 (zigzag(1)=2: q=2,stop)
      bb.b(0, 5)                      // partition 1: k = 0
      for (_ <- 0 until 8) bb.b(1, 3)
      // bits so far: 8+16+4+5+4+2+4+5+21+5+24 = aligned? count:
      // 1+6+1+1+15+4+5+4+2+4+5+7*3+5+8*3 = 98 -> pad 6 bits
      bb.b(0, 6)
    })
    val dec = FlacCodec.decode(bytes)
    assert(dec.samples(0).toSeq === (0 until 16).map(i => 12 + 2 * i))
  }

  test("corrupted frame body fails the CRC-16 loudly") {
    val x = Array.tabulate(300)(i => i * 11 - 1500)
    val bytes = FlacCodec.encode(x, 8000, blockSize = 256)
    // flip a bit INSIDE the first frame's residuals (well past the
    // 42-byte STREAMINFO head and the frame header)
    bytes(80) = (bytes(80) ^ 0x10).toByte
    val e = intercept[IllegalArgumentException](FlacCodec.decode(bytes))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("MD5") ||
      e.getMessage.contains("truncated") || e.getMessage.contains("sync"))
  }

  test("Multimodal.decodeAudio routes fLaC payloads to the real decoder") {
    val x = Array.tabulate(800)(i => (math.sin(i / 5.0) * 8000).toInt)
    val bytes = FlacCodec.encode(x, 16000, blockSize = 256)
    val d = Multimodal.decodeAudio(Multimodal.MediaRow(7L, "audio", bytes))
    assert(d.sample_rate === 16000 && d.channels === 1 && d.bits === 16)
    assert(d.n_frames === 800L && d.duration_ms === 50L)
    assert(math.abs(d.peak - 8000.0 / 32768.0) < 0.01 && d.rms > 0.1)
    // corrupt stream degrades to the stub (8000 Hz marker), not a throw
    bytes(60) = (bytes(60) ^ 0x40).toByte
    val s = Multimodal.decodeAudio(Multimodal.MediaRow(7L, "audio", bytes))
    assert(s.sample_rate === 8000 && s.n_frames === bytes.length.toLong)
  }

  test("corrupted STREAMINFO MD5 fails loudly") {
    val x = Array.tabulate(100)(i => i)
    val bytes = FlacCodec.encode(x, 8000, blockSize = 64)
    bytes(30) = (bytes(30) ^ 0x01).toByte // inside the 16-byte MD5
    val e = intercept[IllegalArgumentException](FlacCodec.decode(bytes))
    assert(e.getMessage.contains("MD5"))
  }
}
