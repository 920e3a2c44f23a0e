package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{MediaHeaders, MediaSynth}

/** The header-only media decoder: round-trip over every synthesized
  * format, adversarial malformed inputs, and the synth length constants
  * the q65 oracle's n_bytes arithmetic depends on. */
class MediaHeadersSpec extends AnyFunSuite {

  test("round-trip: synth dims survive decode for every format variant") {
    // ids cover all 5 format branches several times, incl. 0 and large ids
    val ids = (0L to 37L) ++ Seq(1000L, 99999L, 123456789L)
    ids.foreach { id =>
      val (w, h, f) = MediaHeaders.decode(MediaSynth.synth(id))
      assert(f == MediaSynth.formatOf(id), s"id=$id format")
      assert(w == MediaSynth.widthOf(id), s"id=$id width")
      assert(h == MediaSynth.heightOf(id), s"id=$id height")
    }
  }

  test("synth payload lengths equal the oracle's pinned constants") {
    assert(MediaSynth.synth(0L).length == MediaSynth.PngBytes)   // png
    assert(MediaSynth.synth(1L).length == MediaSynth.JpegBytes)  // SOF0
    assert(MediaSynth.synth(2L).length == MediaSynth.JpegBytes)  // SOF2
    assert(MediaSynth.synth(3L).length == MediaSynth.GifBytes)   // gif
    assert(MediaSynth.synth(4L).length == MediaSynth.BmpBytes)   // bmp
  }

  test("jpeg: fill bytes, RST markers, and APPn segments are walked over") {
    // hand-build: SOI, fill 0xFF padding, APP1 with junk, RST0, SOF0
    val o = new java.io.ByteArrayOutputStream()
    def w(bs: Int*): Unit = bs.foreach(o.write)
    w(0xff, 0xd8)                    // SOI
    w(0xff, 0xff, 0xff, 0xe1, 0x00, 0x06, 1, 2, 3, 4) // fill + APP1 len 6
    w(0xff, 0xd0)                    // RST0 (no payload)
    w(0xff, 0xc0, 0x00, 0x0b, 8, 0x01, 0x00, 0x02, 0x80, 1, 1, 0x11, 0)
    // height 0x0100=256, width 0x0280=640
    assert(MediaHeaders.decode(o.toByteArray) == (640, 256, "jpeg"))
  }

  test("jpeg: SOS or EOI before any SOF decodes unknown, not a crash") {
    def seg(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    assert(MediaHeaders.decode(seg(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0))
      == (0, 0, "unknown"))
    assert(MediaHeaders.decode(seg(0xff, 0xd8, 0xff, 0xd9)) == (0, 0, "unknown"))
    // truncated mid-segment
    assert(MediaHeaders.decode(seg(0xff, 0xd8, 0xff, 0xe0, 0x00)) == (0, 0, "unknown"))
    // declared length runs past the buffer
    assert(MediaHeaders.decode(seg(0xff, 0xd8, 0xff, 0xe0, 0xff, 0xff))
      == (0, 0, "unknown"))
  }

  test("png: wrong chunk tag or zero dims decode unknown") {
    val good = MediaSynth.synth(0L) // a png
    val badTag = good.clone(); badTag(12) = 'X'.toByte
    assert(MediaHeaders.decode(badTag) == (0, 0, "unknown"))
    val zeroW = good.clone(); zeroW(16) = 0; zeroW(17) = 0; zeroW(18) = 0; zeroW(19) = 0
    assert(MediaHeaders.decode(zeroW) == (0, 0, "unknown"))
    // truncated before IHDR
    assert(MediaHeaders.decode(good.take(12)) == (0, 0, "unknown"))
  }

  test("bmp: negative (top-down) height decodes as positive magnitude") {
    val b = MediaSynth.synth(4L) // bmp synth writes -h
    val (w, h, f) = MediaHeaders.decode(b)
    assert(f == "bmp" && w == MediaSynth.widthOf(4L) && h == MediaSynth.heightOf(4L))
  }

  test("garbage, empty, and null inputs decode unknown") {
    assert(MediaHeaders.decode(null) == (0, 0, "unknown"))
    assert(MediaHeaders.decode(Array.empty[Byte]) == (0, 0, "unknown"))
    assert(MediaHeaders.decode("not media at all".getBytes) == (0, 0, "unknown"))
    assert(MediaHeaders.decode(Array.fill[Byte](100)(0x7f)) == (0, 0, "unknown"))
  }

  test("av round-trip: wav/mp3/mp4 header fields survive decode for many seeds") {
    (0L until 90L).foreach { id =>
      val m = MediaHeaders.decodeAv(MediaSynth.synthAv(id))
      assert(m.format == MediaSynth.avFormatOf(id), s"id=$id")
      MediaSynth.avFormatOf(id) match {
        case "wav" =>
          assert(m.sampleRate == MediaSynth.wavSampleRate(id), s"id=$id")
          assert(m.channels == MediaSynth.wavChannels(id), s"id=$id")
          assert(m.durationMs == MediaSynth.wavDurationMs(id), s"id=$id")
          assert(m.width == 0 && m.height == 0)
        case "mp3" =>
          assert(m.sampleRate == MediaSynth.mp3SampleRate(id), s"id=$id")
          assert(m.channels == MediaSynth.mp3Channels(id), s"id=$id")
          assert(m.durationMs == MediaSynth.mp3DurationMs(id), s"id=$id")
        case "mp4" =>
          assert(m.durationMs == MediaSynth.mp4DurationMs(id), s"id=$id")
          assert(m.width == MediaSynth.widthOf(id), s"id=$id")
          assert(m.height == MediaSynth.heightOf(id), s"id=$id")
          assert(m.sampleRate == 0 && m.channels == 0)
      }
      assert(MediaSynth.synthAv(id).length == MediaSynth.avBytesOf(id), s"id=$id")
    }
  }

  test("av decode: images fall through with dims; garbage refuses to Unknown") {
    val img = MediaHeaders.decodeAv(MediaSynth.synth(0L)) // png seed
    assert(img.format == "png" && img.width == MediaSynth.widthOf(0L) &&
      img.durationMs == 0L && img.sampleRate == 0)
    assert(MediaHeaders.decodeAv(null) == MediaHeaders.Unknown)
    assert(MediaHeaders.decodeAv("RIFFxxxx".getBytes) == MediaHeaders.Unknown)
    assert(MediaHeaders.decodeAv(Array.fill[Byte](64)(0x11)) == MediaHeaders.Unknown)
    // WAV missing its data chunk refuses (no duration input)
    val noData = MediaSynth.synthAv(0L).take(36)
    assert(MediaHeaders.decodeAv(noData) == MediaHeaders.Unknown)
    // a hostile declared chunk size cannot wrap the walk (terminates)
    val evil = MediaSynth.synthAv(0L).clone()
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte // fmt size = 0xffffffff
    assert(MediaHeaders.decodeAv(evil) == MediaHeaders.Unknown)
    // MP4 with a truncated moov refuses rather than misreads
    val mp4 = MediaSynth.synthAv(2L)
    assert(MediaHeaders.decodeAv(mp4.take(40)) == MediaHeaders.Unknown)
  }

  test("pcm round-trip: every synthesized sample survives decode, for many seeds") {
    (0L until 64L).foreach { id =>
      val pcm = MediaHeaders.decodePcm(MediaSynth.synthPcm(id))
        .getOrElse(fail(s"id=$id refused a well-formed PCM16 WAV"))
      assert(pcm.sampleRate == MediaSynth.pcmSampleRate(id), s"id=$id")
      assert(pcm.channels == MediaSynth.pcmChannels(id), s"id=$id")
      val total = MediaSynth.pcmTotalSamples(id).toInt
      assert(pcm.samples.length == total, s"id=$id")
      // byte-for-byte: LE order + sign extension, checked sample by sample
      (0 until total).foreach { k =>
        assert(pcm.samples(k).toInt == MediaSynth.pcmSample(id, k.toLong),
          s"id=$id k=$k")
      }
    }
  }

  test("pcm refuse contract: truncation, odd length, non-PCM, non-16-bit") {
    val good = MediaSynth.synthPcm(5L)
    // truncated data chunk — declared size exceeds the payload
    assert(MediaHeaders.decodePcm(good.dropRight(2)).isEmpty)
    // header-only wav (q78 synth declares data it never ships) refuses
    assert(MediaHeaders.decodePcm(MediaSynth.synthAv(0L)).isEmpty)
    // non-PCM format code refuses
    val ieee = good.clone(); ieee(20) = 3 // WAVE_FORMAT_IEEE_FLOAT
    assert(MediaHeaders.decodePcm(ieee).isEmpty)
    // non-16-bit refuses
    val b8 = good.clone(); b8(34) = 8
    assert(MediaHeaders.decodePcm(b8).isEmpty)
    // not a wav at all
    assert(MediaHeaders.decodePcm(null).isEmpty)
    assert(MediaHeaders.decodePcm(MediaSynth.synth(0L)).isEmpty)
    // decodeAv still reads the sample-bearing wav's header normally
    val meta = MediaHeaders.decodeAv(good)
    assert(meta.format == "wav" &&
      meta.sampleRate == MediaSynth.pcmSampleRate(5L))
  }

  test("g711 round-trip: every companded byte expands through the ITU table, many seeds") {
    (0L until 32L).foreach { id =>
      val pcm = MediaHeaders.decodePcm(MediaSynth.synthG711(id))
        .getOrElse(fail(s"id=$id refused a well-formed G.711 WAV"))
      val expectCodec = if (id % 2 == 0) "ulaw" else "alaw"
      assert(pcm.codec == expectCodec, s"id=$id codec")
      assert(pcm.sampleRate == 8000 &&
        pcm.channels == MediaSynth.g711Channels(id), s"id=$id header")
      val total = MediaSynth.g711TotalSamples(id).toInt
      assert(pcm.samples.length == total, s"id=$id length")
      val table = if (id % 2 == 0) MediaHeaders.UlawTable
                  else MediaHeaders.AlawTable
      (0 until total).foreach { k =>
        assert(pcm.samples(k) == table(MediaSynth.g711Code(id, k.toLong)),
          s"id=$id k=$k")
      }
    }
  }

  test("g711 tables: ITU landmark values and closure under the formula") {
    // μ-law: 0xFF encodes +0; 0x7F encodes -0; 0x80 is the positive max
    assert(MediaHeaders.UlawTable(0xff) == 0)
    assert(MediaHeaders.UlawTable(0x7f) == 0)
    assert(MediaHeaders.UlawTable(0x80) == 32124)
    assert(MediaHeaders.UlawTable(0x00) == -32124)
    // A-law: 0xD5 (0x80 after xor 0x55) is +8, 0x55 (0x00) is -8; extremes
    assert(MediaHeaders.AlawTable(0xd5) == 8)
    assert(MediaHeaders.AlawTable(0x55) == -8)
    assert(MediaHeaders.AlawTable.max == 32256)
    assert(MediaHeaders.AlawTable.min == -32256)
    // μ-law decode is symmetric: code c and its sign-flipped twin negate
    // (excluding the two zero codes)
    (0 until 128).filter(_ != 0x7f).foreach { c =>
      assert(MediaHeaders.UlawTable(c) == -MediaHeaders.UlawTable(c | 0x80),
        s"c=$c")
    }
  }

  test("g711 refuse contract: 16-bit G.711 claims and truncation refuse") {
    val good = MediaSynth.synthG711(4L)
    // a G.711 format claiming 16 bits is malformed: refuse, don't guess
    val w16 = good.clone(); w16(34) = 16
    assert(MediaHeaders.decodePcm(w16).isEmpty)
    // truncated data chunk refuses
    assert(MediaHeaders.decodePcm(good.dropRight(1)).isEmpty)
    // 8-bit PLAIN PCM (format 1, bits 8) still refuses — only the
    // companded families decode at 8 bits
    val pcm8 = good.clone(); pcm8(20) = 1
    assert(MediaHeaders.decodePcm(pcm8).isEmpty)
  }

  // ---------------------------------------------------------- IMA ADPCM
  /** Hand-assembled IMA ADPCM WAV: per block, per-channel 4-byte headers
    * then the raw data words — no shared code with the decoder. */
  private def adpcmWav(channels: Int, ba: Int,
                       blocks: Seq[(Seq[(Int, Int)], Array[Byte])],
                       bits: Int = 4, fmtCode: Int = 0x11): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
    }
    val dataBytes = blocks.map(b => 4 * channels + b._2.length).sum
    "RIFF".foreach(c => o.write(c.toInt)); le32(36L + dataBytes)
    "WAVE".foreach(c => o.write(c.toInt))
    "fmt ".foreach(c => o.write(c.toInt)); le32(16L)
    le16(fmtCode); le16(channels)
    le32(8000L); le32(4000L)
    le16(ba); le16(bits)
    "data".foreach(c => o.write(c.toInt)); le32(dataBytes.toLong)
    blocks.foreach { case (heads, data) =>
      heads.foreach { case (pred, idx) => le16(pred & 0xffff); o.write(idx); o.write(0) }
      data.foreach(b => o.write(b & 0xff))
    }
    o.toByteArray
  }

  /** Independent reference recurrence, straight from the published IMA
    * algorithm (re-derived here, not shared with the decoder). */
  private def imaRef(nibs: Seq[Int], pred0: Int, idx0: Int): Seq[Int] = {
    val step = MediaHeaders.ImaStepTable; val adj = MediaHeaders.ImaIndexTable
    var p = pred0; var i = idx0
    nibs.map { n =>
      val s = step(i)
      var d = s >> 3
      if ((n & 1) != 0) d += s >> 2
      if ((n & 2) != 0) d += s >> 1
      if ((n & 4) != 0) d += s
      p = math.max(-32768, math.min(32767, if ((n & 8) != 0) p - d else p + d))
      i = math.max(0, math.min(88, i + adj(n)))
      p
    }
  }

  test("adpcm: hand-computed vector decodes bit-exactly") {
    // one mono block, blockAlign 8: header (pred 0, idx 0), nibbles
    // [2,7,9,0,15,4,8,3] packed low-first -> bytes 72 09 4F 38. Samples
    // worked by hand through the published recurrence.
    val wav = adpcmWav(1, 8, Seq((Seq((0, 0)),
      Array(0x72, 0x09, 0x4f, 0x38).map(_.toByte))))
    val pcm = MediaHeaders.decodePcm(wav)
      .getOrElse(fail("refused a well-formed ADPCM WAV"))
    assert(pcm.codec == "adpcm" && pcm.sampleRate == 8000 && pcm.channels == 1)
    assert(pcm.samples.toSeq == Seq(0, 3, 14, 8, 9, -14, 17, 13, 38)
      .map(_.toShort))
  }

  test("adpcm: block headers reset state — synth round-trip, many seeds") {
    (0L until 16L).foreach { id =>
      val pcm = MediaHeaders.decodePcm(MediaSynth.synthAdpcm(id))
        .getOrElse(fail(s"id=$id refused a well-formed ADPCM WAV"))
      val spb = MediaSynth.adpcmSamplesPerBlock(id)
      val nb = MediaSynth.adpcmBlocks(id).toInt
      assert(pcm.samples.length == nb * spb, s"id=$id length")
      (0 until nb).foreach { blk =>
        // sample 0 of every block IS the header predictor (the reset)
        assert(pcm.samples(blk * spb).toInt ==
          MediaSynth.adpcmPred0(id, blk.toLong), s"id=$id blk=$blk reset")
        // the rest of the block matches the independent reference
        val nibs = (0 until spb - 1).map(j =>
          MediaSynth.adpcmNibble(id, blk.toLong, j.toLong))
        val expect = imaRef(nibs, MediaSynth.adpcmPred0(id, blk.toLong),
          MediaSynth.adpcmIdx0(id, blk.toLong))
        (1 until spb).foreach { s =>
          assert(pcm.samples(blk * spb + s).toInt == expect(s - 1),
            s"id=$id blk=$blk s=$s")
        }
      }
    }
  }

  test("adpcm: stereo interleave — duplicated channels decode to L == R == mono") {
    // both channels carry identical headers and identical data words:
    // any interleave defect (word order, per-channel state mixup) breaks
    // the L == R symmetry or the match with the mono decode
    val word = Array(0x72, 0x09, 0x4f, 0x38).map(_.toByte)
    val stereo = adpcmWav(2, 16,
      Seq((Seq((100, 20), (100, 20)), word ++ word)))
    val mono = adpcmWav(1, 8, Seq((Seq((100, 20)), word)))
    val ps = MediaHeaders.decodePcm(stereo).getOrElse(fail("stereo refused"))
    val pm = MediaHeaders.decodePcm(mono).getOrElse(fail("mono refused"))
    assert(ps.channels == 2 && ps.samples.length == 2 * pm.samples.length)
    (0 until pm.samples.length).foreach { s =>
      assert(ps.samples(2 * s) == pm.samples(s), s"L s=$s")
      assert(ps.samples(2 * s + 1) == pm.samples(s), s"R s=$s")
    }
  }

  test("adpcm: step/index tables pin the published IMA landmarks") {
    val t = MediaHeaders.ImaStepTable
    assert(t.length == 89 && t(0) == 7 && t(8) == 16 && t(16) == 34 &&
      t(44) == 494 && t(88) == 32767)
    assert(t.sliding(2).forall(p => p(1) > p(0)), "strictly increasing")
    assert(MediaHeaders.ImaIndexTable.toSeq ==
      Seq(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8))
  }

  test("adpcm refuse contract: partial block, bad bits, bad index, bad align") {
    val good = MediaSynth.synthAdpcm(3L)
    assert(MediaHeaders.decodePcm(good).isDefined)
    // a non-4-bit IMA claim refuses
    val b16 = good.clone(); b16(34) = 16
    assert(MediaHeaders.decodePcm(b16).isEmpty)
    // MS-ADPCM (format 2) refuses — only IMA decodes
    val ms = good.clone(); ms(20) = 2
    assert(MediaHeaders.decodePcm(ms).isEmpty)
    // data chunk not a whole number of blocks refuses: blockAlign says
    // 12 but only 8 bytes (one short block) ship
    val word = Array(0x11, 0x22, 0x33, 0x44).map(_.toByte)
    val partial = adpcmWav(1, 12, Seq((Seq((0, 0)), word)))
    assert(MediaHeaders.decodePcm(partial).isEmpty)
    // header step index past 88 refuses
    val badIdx = adpcmWav(1, 8, Seq((Seq((0, 89)), word)))
    assert(MediaHeaders.decodePcm(badIdx).isEmpty)
    // block align not whole 4-byte words per channel refuses
    val badAlign = adpcmWav(1, 10, Seq((Seq((0, 0)), word.take(2) ++ word)))
    assert(MediaHeaders.decodePcm(badAlign).isEmpty)
  }

  test("wavFrameSlice: block-aligned real audio at the timestamp, clipped at the end") {
    // pick a stereo seed (blockAlign 4) with a known rate
    val id = 1L // channels = 1 + 1%2 = 2, rate = 8000*(1+1%4) = 16000
    val b = MediaSynth.synthPcm(id)
    val ch = MediaSynth.pcmChannels(id)
    assert(ch == 2)
    val slice = MediaHeaders.wavFrameSlice(b, 0, 16).get
    // ts=0: the first 16 data-chunk bytes = samples 0..7 little-endian
    (0 until 8).foreach { k =>
      val v = MediaSynth.pcmSample(id, k.toLong)
      assert((slice(2 * k) & 0xff) == (v & 0xff), s"k=$k lo")
      assert((slice(2 * k + 1) & 0xff) == ((v >> 8) & 0xff), s"k=$k hi")
    }
    // a mid-stream timestamp: patch the fmt rate down to 100 Hz so ts=1
    // lands inside the clip (id=1 has 263 frames) — slice must start at
    // byte 1·100·blockAlign of the data chunk, i.e. raw sample 100·ch
    val slow = b.clone()
    slow(24) = 100; slow(25) = 0; slow(26) = 0; slow(27) = 0
    val s3 = MediaHeaders.wavFrameSlice(slow, 1, 16).get
    val k0 = 1 * 100 * ch
    (0 until 8).foreach { j =>
      val v = MediaSynth.pcmSample(id, (k0 + j).toLong)
      assert((s3(2 * j) & 0xff) == (v & 0xff), s"j=$j lo")
      assert((s3(2 * j + 1) & 0xff) == ((v >> 8) & 0xff), s"j=$j hi")
    }
    // past-the-end timestamp yields None, not a wrapped slice
    assert(MediaHeaders.wavFrameSlice(b, 3600, 16).isEmpty)
    // header-only wav (no payload bytes) yields None
    assert(MediaHeaders.wavFrameSlice(MediaSynth.synthAv(0L), 0, 16).isEmpty)
  }
}
