package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[CodecMeta]] header parsers: round-trips across the
  * parameter space (MPEG versions, ID3 tags, channel modes, SPS
  * geometry sweep), partial-parse semantics on torn streams, and
  * degrade-never-throw on alien bytes. Pure JVM — no Spark session. */
class CodecMetaSpec extends AnyFunSuite {

  test("mp3: MPEG-1 and MPEG-2 frame walks recover rate/channels/frames/duration") {
    val p1 = CodecMeta.mp3Frames(mpeg1 = true, bitrateIdx = 9, srIdx = 1,
      mono = false, nFrames = 38)
    val m1 = CodecMeta.parseMp3(7L, p1)
    assert(m1.codec === "mp3" && m1.sample_rate === 48000 && m1.channels === 2)
    assert(m1.bitrate_kbps === 128 && m1.n_frames === 38L)
    assert(m1.duration_ms === 38L * 1152 * 1000 / 48000)

    val p2 = CodecMeta.mp3Frames(mpeg1 = false, bitrateIdx = 5, srIdx = 0,
      mono = true, nFrames = 11)
    val m2 = CodecMeta.parseMp3(8L, p2)
    assert(m2.sample_rate === 22050 && m2.channels === 1 && m2.bitrate_kbps === 40)
    // MPEG-2 Layer III frames carry 576 samples, not 1152
    assert(m2.n_frames === 11L && m2.duration_ms === 11L * 576 * 1000 / 22050)
  }

  test("mp3: ID3v2 tag skipped; dispatch routes tagged payloads to the mp3 parser") {
    val p = CodecMeta.mp3Frames(mpeg1 = true, bitrateIdx = 1, srIdx = 0,
      mono = true, nFrames = 5, id3Bytes = 777)
    assert(new String(p.take(3)) === "ID3")
    val m = CodecMeta.parse(9L, p)
    assert(m.codec === "mp3" && m.n_frames === 5L && m.bitrate_kbps === 32)
  }

  test("mp3: torn tail keeps the parsed prefix; garbage yields the zero record") {
    val p = CodecMeta.mp3Frames(mpeg1 = true, bitrateIdx = 9, srIdx = 1,
      mono = false, nFrames = 10)
    val torn = p.take(p.length - 50) // last frame incomplete
    val m = CodecMeta.parseMp3(1L, torn)
    assert(m.n_frames === 9L, "incomplete final frame must not count")
    assert(CodecMeta.parse(2L, Array.fill[Byte](64)(0x55)).codec === "unknown")
    assert(CodecMeta.parse(3L, null).codec === "unknown")
    assert(CodecMeta.parse(4L, Array[Byte](1, 2)).codec === "unknown")
  }

  test("adts: header walk recovers profile/rate/channels and derives the bitrate") {
    val p = CodecMeta.adtsFrames(profile = 2, srIdx = 3, chanCfg = 2,
      frameLen = 120, nFrames = 25)
    val m = CodecMeta.parse(5L, p)
    assert(m.codec === "aac" && m.sample_rate === 48000 && m.channels === 2)
    assert(m.profile === 2 && m.n_frames === 25L)
    assert(m.duration_ms === 25L * 1024 * 1000 / 48000)
    assert(m.bitrate_kbps === (120L * 25 * 8 * 48000 / (25L * 1024 * 1000)).toInt)
    // torn tail: prefix survives
    val torn = CodecMeta.parseAdts(6L, p.take(p.length - 10))
    assert(torn.n_frames === 24L)
  }

  test("h264: SPS geometry round-trips across a parameter sweep (emulation bytes included)") {
    for (wMb <- Seq(1, 8, 20, 40, 120, 256); hMb <- Seq(1, 9, 17, 68); lvl <- Seq(0, 10, 31, 51)) {
      val sps = CodecMeta.h264Sps(wMb, hMb, lvl)
      val m = CodecMeta.parse(wMb.toLong, sps)
      assert(m.codec === "h264", s"($wMb,$hMb,$lvl)")
      assert(m.width === wMb * 16 && m.height === hMb * 16, s"($wMb,$hMb,$lvl) -> ${m.width}x${m.height}")
      assert(m.profile === 66 && m.level === lvl)
    }
  }

  test("h264: torn SPS and non-SPS NALs degrade to the zero record") {
    val sps = CodecMeta.h264Sps(20, 15, 30)
    assert(CodecMeta.parseSps(1L, sps.take(7)).codec === "unknown")
    val nonSps = Array[Byte](0, 0, 0, 1, 0x65) ++ Array.fill[Byte](8)(0x22)
    assert(CodecMeta.parseSps(2L, nonSps).codec === "unknown")
  }

  test("h264: corrupt geometry degrades to the zero record, never garbage dims") {
    // type-7 NAL whose RBSP is sync-looking noise: long zero runs make
    // ue() explode or produce absurd widths — both must yield "unknown"
    for (fill <- Seq(0x00, 0x80, 0x41, 0x07).map(_.toByte)) {
      val nal = Array[Byte](0, 0, 0, 1, 0x67) ++ Array.fill[Byte](24)(fill)
      val m = CodecMeta.parseSps(1L, nal)
      assert(m.codec === "unknown" ||
        (m.width > 0 && m.height > 0 && m.width <= 16384 && m.height <= 16384),
        s"fill=$fill -> ${m.codec} ${m.width}x${m.height}")
    }
  }

  test("adts: ID3-tagged AAC dispatches to the aac parser; 7.1 maps to 8 channels") {
    val aac = CodecMeta.adtsFrames(profile = 2, srIdx = 4, chanCfg = 7,
      frameLen = 90, nFrames = 12)
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 40) ++
      new Array[Byte](40)
    val m = CodecMeta.parse(11L, tag ++ aac)
    assert(m.codec === "aac" && m.sample_rate === 44100)
    assert(m.channels === 8, "channel_configuration 7 is the 7.1 layout")
    assert(m.n_frames === 12L)
  }

  test("mp3: ID3v2.4 footer flag and stacked tags are both skipped") {
    val audio = CodecMeta.mp3Frames(mpeg1 = true, bitrateIdx = 9, srIdx = 0,
      mono = false, nFrames = 7)
    // tag with footer flag (0x10): header + 20-byte body + 10-byte footer
    val footered = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 20) ++
      new Array[Byte](20) ++ Array[Byte]('3', 'D', 'I', 4, 0, 0x10, 0, 0, 0, 20)
    val m1 = CodecMeta.parse(1L, footered ++ audio)
    assert(m1.codec === "mp3" && m1.n_frames === 7L, "footer not skipped")
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++ new Array[Byte](10)
    val m2 = CodecMeta.parse(2L, tag ++ tag ++ audio)
    assert(m2.codec === "mp3" && m2.n_frames === 7L, "stacked tags not skipped")
  }
}
