package graft.llm

/** Header-only media metadata decode — the real (non-stub) decoder for the
  * multimodal plumbing. Parses container headers for width/height/format
  * without decoding pixel data, so the per-row cost is O(header bytes) and
  * the operator stays a zero-shuffle map stage at any corpus size.
  *
  * Formats are parsed from their public specifications:
  *  - PNG (RFC 2083 / W3C): 8-byte signature, then the IHDR chunk whose
  *    data starts at offset 16 — width and height as big-endian u32.
  *  - JPEG (ITU T.81): SOI then a marker walk; any SOFn segment
  *    (0xC0–0xCF except DHT 0xC4, JPG 0xC8, DAC 0xCC) carries
  *    [len u16][precision u8][height u16][width u16].
  *  - GIF (87a/89a): 6-byte signature, then logical-screen width/height
  *    as little-endian u16.
  *  - BMP: "BM", BITMAPINFOHEADER width/height as little-endian i32 at
  *    offsets 18/22 (height may be negative for top-down rows).
  *
  * Anything unrecognized (or truncated before its dimensions) decodes to
  * (0, 0, "unknown") rather than throwing — a 100 TB scan must not die on
  * one corrupt object.
  */
object MediaHeaders {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def beU16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def leU16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def beU32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def leI32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && (0 until 8).forall(i => b(i) == PngSig(i))

  /** PNG: the spec requires IHDR to be the first chunk, so width/height sit
    * at fixed offsets 16/20 (after sig + chunk length + "IHDR" tag). */
  private def decodePng(b: Array[Byte]): (Int, Int, String) = {
    // defensive: honour the chunk tag, not just the offset
    val tagOk = b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'
    if (!tagOk) (0, 0, "unknown")
    else (beU32(b, 16).toInt, beU32(b, 20).toInt, "png") match {
      case (w, h, f) if w > 0 && h > 0 => (w, h, f)
      case _ => (0, 0, "unknown")
    }
  }

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  /** JPEG marker walk: skip segments until a SOFn frame header. Stops at
    * SOS (entropy-coded data follows — a well-formed stream puts SOFn
    * before SOS) or EOI or truncation. */
  private def decodeJpeg(b: Array[Byte]): (Int, Int, String) = {
    var i = 2
    while (i + 3 < b.length) {
      // marker alignment: skip fill bytes (0xFF padding before a marker)
      if (u8(b, i) != 0xff) return (0, 0, "unknown")
      var j = i
      while (j < b.length && u8(b, j) == 0xff) j += 1
      if (j >= b.length) return (0, 0, "unknown")
      val marker = u8(b, j)
      val isSof = marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc
      if (isSof) {
        // [len u16][precision u8][height u16][width u16]
        if (j + 7 >= b.length) return (0, 0, "unknown")
        val h = beU16(b, j + 4)
        val w = beU16(b, j + 6)
        return if (w > 0 && h > 0) (w, h, "jpeg") else (0, 0, "unknown")
      }
      marker match {
        case 0xd8 => i = j + 1 // SOI (no payload)
        case m if m >= 0xd0 && m <= 0xd7 => i = j + 1 // RSTn (no payload)
        case 0xd9 => return (0, 0, "unknown") // EOI before any SOF
        case 0xda => return (0, 0, "unknown") // SOS before SOF: give up
        case _ =>
          if (j + 2 >= b.length) return (0, 0, "unknown")
          val len = beU16(b, j + 1)
          if (len < 2) return (0, 0, "unknown")
          i = j + 1 + len
      }
    }
    (0, 0, "unknown")
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def decodeGif(b: Array[Byte]): (Int, Int, String) = {
    val w = leU16(b, 6); val h = leU16(b, 8)
    if (w > 0 && h > 0) (w, h, "gif") else (0, 0, "unknown")
  }

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'B' && b(1) == 'M'

  private def decodeBmp(b: Array[Byte]): (Int, Int, String) = {
    val w = leI32(b, 18)
    val h = math.abs(leI32(b, 22)) // negative = top-down row order
    if (w > 0 && h > 0) (w, h, "bmp") else (0, 0, "unknown")
  }

  /** Total decode: (width, height, format); (0, 0, "unknown") when the
    * payload is not a recognized/complete media header. Signature matches
    * [[Multimodal.decodeBatches]]'s injected decoder. */
  def decode(bytes: Array[Byte]): (Int, Int, String) = {
    if (bytes == null || bytes.length < 4) return (0, 0, "unknown")
    if (isPng(bytes)) decodePng(bytes)
    else if (isJpeg(bytes)) decodeJpeg(bytes)
    else if (isGif(bytes)) decodeGif(bytes)
    else if (isBmp(bytes)) decodeBmp(bytes)
    else (0, 0, "unknown")
  }

  // --------------------------------------------------------- audio/video

  /** Header-only audio/video metadata: width/height for video tracks,
    * sample rate/channels for audio, duration in milliseconds for both —
    * zero fields where the format doesn't carry them. `Unknown` for
    * unrecognized/truncated payloads, same refuse-to-zero contract as the
    * image decode. */
  final case class AvMeta(width: Int, height: Int, sampleRate: Int,
                          channels: Int, durationMs: Long, format: String)
  val Unknown: AvMeta = AvMeta(0, 0, 0, 0, 0L, "unknown")

  private def leU32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => (b(i + k) & 0xff) == t.charAt(k))

  // ---- WAV (RIFF, public multimedia programming interface spec):
  // "RIFF"<size>"WAVE", then chunks; the fmt chunk carries
  // channels/sampleRate/byteRate; duration = data size / byte rate.
  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 && tag(b, 0, "RIFF") && tag(b, 8, "WAVE")

  private def decodeWav(b: Array[Byte]): AvMeta = {
    var i = 12L
    var sampleRate = 0
    var channels = 0
    var byteRate = 0L
    var dataBytes = -1L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val size = leU32(b, at + 4)
      if (tag(b, at, "fmt ") && at + 24 <= b.length) {
        channels = leU16(b, at + 10)
        sampleRate = leU32(b, at + 12).toInt
        byteRate = leU32(b, at + 16)
      } else if (tag(b, at, "data")) {
        // header-only contract: the DECLARED size is the duration input
        // (payloads may be truncated in a header corpus)
        dataBytes = size
      }
      // chunks are word-aligned (odd sizes pad one byte); Long walk so a
      // hostile declared size cannot wrap the cursor backwards
      i += 8L + size + (size & 1L)
    }
    if (sampleRate <= 0 || channels <= 0 || byteRate <= 0L || dataBytes < 0L)
      Unknown
    else AvMeta(0, 0, sampleRate, channels, dataBytes * 1000L / byteRate, "wav")
  }

  // ---- MP3 (ISO 11172-3 frame header): 11-bit sync, then version /
  // layer / bitrate / sample-rate / channel-mode fields. Header-only
  // duration is the standard CBR estimate: frames = len/frameLen,
  // 1152 samples per MPEG1 Layer III frame.
  private val Mp3Bitrates = // MPEG1 Layer III, kbit/s, index 1-14
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3Rates = Array(44100, 48000, 32000, 0)

  private def isMp3(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xff && (u8(b, 1) & 0xfe) == 0xfa // MPEG1 L3

  private def decodeMp3(b: Array[Byte]): AvMeta = {
    val bitrateIdx = (u8(b, 2) >> 4) & 0xf
    val rateIdx = (u8(b, 2) >> 2) & 0x3
    val mode = (u8(b, 3) >> 6) & 0x3
    val bitrate = Mp3Bitrates(bitrateIdx) * 1000
    val rate = Mp3Rates(rateIdx)
    if (bitrate <= 0 || rate <= 0) return Unknown
    val channels = if (mode == 3) 1 else 2 // 3 = single channel
    val padding = (u8(b, 2) >> 1) & 0x1
    val frameLen = 144 * bitrate / rate + padding
    val frames = b.length / frameLen
    if (frames < 1) return Unknown
    AvMeta(0, 0, rate, channels, frames.toLong * 1152L * 1000L / rate, "mp3")
  }

  // ---- MP4 (ISO 14496-12 BMFF): box walk to moov/mvhd for
  // timescale+duration and moov/trak/tkhd for track dims (16.16 fixed).
  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 16 && tag(b, 4, "ftyp")

  private def decodeMp4(b: Array[Byte]): AvMeta = {
    var durationMs = -1L
    var w = 0
    var h = 0
    def walk(from: Int, until: Int, depth: Int): Unit = {
      var i = from
      while (i + 8 <= until) {
        val size = beU32(b, i)
        if (size < 8 || i + size > until) return // malformed: stop
        val end = i + size.toInt
        if (tag(b, i + 4, "moov") && depth == 0) walk(i + 8, end, 1)
        else if (tag(b, i + 4, "trak") && depth == 1) walk(i + 8, end, 2)
        else if (tag(b, i + 4, "mvhd") && depth == 1 && i + 12 <= end) {
          val v = u8(b, i + 8)
          if (v == 0 && i + 28 <= end) {
            val timescale = beU32(b, i + 20)
            if (timescale > 0) durationMs = beU32(b, i + 24) * 1000L / timescale
          } else if (v == 1 && i + 40 <= end) {
            val timescale = beU32(b, i + 28)
            val dur = (beU32(b, i + 32) << 32) | beU32(b, i + 36)
            if (timescale > 0) durationMs = dur * 1000L / timescale
          }
        } else if (tag(b, i + 4, "tkhd") && depth == 2) {
          val v = u8(b, i + 8)
          val wOff = if (v == 0) i + 8 + 76 else i + 8 + 88
          if (wOff + 8 <= end) {
            w = (beU32(b, wOff) >> 16).toInt  // 16.16 fixed -> integer part
            h = (beU32(b, wOff + 4) >> 16).toInt
          }
        }
        i = end
      }
    }
    walk(0, b.length, 0)
    if (durationMs < 0L) Unknown
    else AvMeta(w, h, 0, 0, durationMs, "mp4")
  }

  // --------------------------------------------------------- PCM samples
  // WAV is the one codec-free container: a PCM16 data chunk IS the sample
  // stream, so the decode below is value-real end to end (the image/AV
  // decoders above stop at headers because this container ships no
  // codecs). Same refuse contract: anything short of a complete,
  // well-formed PCM16 payload decodes to None — a truncated data chunk
  // must never yield silently-partial samples.

  /** Decoded linear audio: `samples` is the raw interleaved 16-bit
    * stream; `codec` names the wire encoding it was expanded from —
    * "pcm16" (the bytes ARE the samples) or "ulaw"/"alaw" (G.711 8-bit
    * companded bytes, expanded through the ITU table — r12). */
  final case class PcmAudio(sampleRate: Int, channels: Int,
                            samples: Array[Short], codec: String = "pcm16")

  /** ITU-T G.711 μ-law byte → 16-bit linear (the public-domain CCITT
    * formula: complement, then ((mantissa·8 + 0x84) << exponent) − 0x84,
    * sign from the complemented high bit). Range ±32124. */
  private[graft] val UlawTable: Array[Short] = Array.tabulate(256) { c =>
    val u = ~c & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** ITU-T G.711 A-law byte → 16-bit linear (xor 0x55, segment expand;
    * sign bit SET means positive in A-law). Range ±32256. */
  private[graft] val AlawTable: Array[Short] = Array.tabulate(256) { c =>
    val a = c ^ 0x55
    val t0 = (a & 0x0f) << 4
    val seg = (a >> 4) & 7
    val t = seg match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case s => (t0 + 0x108) << (s - 1)
    }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  /** Structural WAV chunk walk shared by the sample decoders: the fmt
    * fields plus the data chunk's (offset, length), with the payload
    * FULLY present — format policy (which codecs decode) stays with the
    * callers. None on non-WAV, missing chunks, or truncation. */
  private def wavLayout(b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int, Int)] = {
    if (b == null || !isWav(b)) return None
    var i = 12L
    var fmtCode = 0; var channels = 0; var rate = 0; var bits = 0
    var blockAlign = 0
    var dataOff = -1; var dataLen = -1
    while (i + 8 <= b.length) {
      val at = i.toInt
      val size = leU32(b, at + 4)
      if (tag(b, at, "fmt ") && at + 24 <= b.length) {
        fmtCode = leU16(b, at + 8)
        channels = leU16(b, at + 10)
        rate = leU32(b, at + 12).toInt
        blockAlign = leU16(b, at + 20)
        bits = leU16(b, at + 22)
      } else if (tag(b, at, "data")) {
        if (at + 8 + size > b.length) return None // truncated payload
        dataOff = at + 8; dataLen = size.toInt
      }
      i += 8L + size + (size & 1L)
    }
    if (rate <= 0 || channels <= 0 || dataOff < 0) None
    else Some((fmtCode, bits, rate, channels, dataOff, dataLen, blockAlign))
  }

  /** [[wavLayout]] restricted to complete 16-bit PCM payloads — the
    * frame-slice path's contract (block align = 2·channels). */
  private def pcmLayout(b: Array[Byte]): Option[(Int, Int, Int, Int)] =
    wavLayout(b) match {
      case Some((1, 16, rate, channels, dataOff, dataLen, _))
        if (dataLen & 1) == 0 => Some((rate, channels, dataOff, dataLen))
      case _ => None
    }

  // IMA/DVI ADPCM (WAV format 0x11) — the published normative tables
  // (IMA Digital Audio Pack, "Recommended Practices for Enhancing
  // Digital Audio Compatibility", rev 3.00 §4; same tables in RFC 3551's
  // DVI4 description). Unlike G.711 these are defined AS tables (the
  // step sizes approximate a 1.1x geometric ramp with normative
  // roundings), so they are transcribed, not derived — every entry is
  // exercised by the q92 oracle's SQL replay of the same recurrence.
  private[graft] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private[graft] val ImaIndexTable: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA nibble step, bit-exact shared law with the q92 SQL oracle:
    * delta = (step>>3) + n0·(step>>2) + n1·(step>>1) + n2·step, sign
    * from bit 3, predictor clamped to i16, index clamped to [0, 88]. */
  @inline private def imaStep(nib: Int, pred: Int, idx: Int): (Int, Int) = {
    val step = ImaStepTable(idx)
    var delta = step >> 3
    if ((nib & 1) != 0) delta += step >> 2
    if ((nib & 2) != 0) delta += step >> 1
    if ((nib & 4) != 0) delta += step
    val p0 = if ((nib & 8) != 0) pred - delta else pred + delta
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + ImaIndexTable(nib)))
    (p, i)
  }

  /** Decode a complete IMA ADPCM data chunk (format 0x11, 4-bit). Block
    * structure per the IMA/Microsoft layout: each `blockAlign`-sized
    * block opens with a 4-byte header PER CHANNEL (initial predictor as
    * LE i16 — which IS the block's first output sample — then step index
    * u8, reserved u8), followed by 4-byte data words interleaved one
    * word per channel (8 nibbles = 8 samples each, LOW nibble first).
    * The predictor/index state RESETS at every block header — the
    * property hostile block sizes exercise. Refuses (None): data not a
    * whole number of blocks, a block too small for its headers, data
    * bytes not whole 4-byte words per channel, or a header step index
    * past 88. */
  private def decodeImaAdpcm(b: Array[Byte], rate: Int, channels: Int,
                             dataOff: Int, dataLen: Int,
                             blockAlign: Int): Option[PcmAudio] = {
    val headBytes = 4 * channels
    if (blockAlign < headBytes + 4 * channels) return None
    if ((blockAlign - headBytes) % (4 * channels) != 0) return None
    if (dataLen <= 0 || dataLen % blockAlign != 0) return None
    val nBlocks = dataLen / blockAlign
    val samplesPerBlock = 1 + (blockAlign - headBytes) * 2 / channels
    val out = new Array[Short](nBlocks * samplesPerBlock * channels)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var blk = 0
    while (blk < nBlocks) {
      val blockOff = dataOff + blk * blockAlign
      val outBase = blk * samplesPerBlock * channels
      var c = 0
      while (c < channels) {
        val h = blockOff + 4 * c
        pred(c) = (u8(b, h) | (u8(b, h + 1) << 8)).toShort.toInt // LE i16
        idx(c) = u8(b, h + 2)
        if (idx(c) > 88) return None
        out(outBase + c) = pred(c).toShort // header sample = sample 0
        c += 1
      }
      val words = (blockAlign - headBytes) / (4 * channels)
      var w = 0
      while (w < words) {
        c = 0
        while (c < channels) {
          val wordOff = blockOff + headBytes + (w * channels + c) * 4
          var j = 0
          while (j < 8) {
            val byte = u8(b, wordOff + j / 2)
            val nib = if ((j & 1) == 0) byte & 0x0f else (byte >> 4) & 0x0f
            val (p, i) = imaStep(nib, pred(c), idx(c))
            pred(c) = p; idx(c) = i
            val s = 1 + w * 8 + j // sample index within block, channel c
            out(outBase + s * channels + c) = p.toShort
            j += 1
          }
          c += 1
        }
        w += 1
      }
      blk += 1
    }
    Some(PcmAudio(rate, channels, out, "adpcm"))
  }

  /** Decode the full linear sample stream; None under the refuse
    * contract (non-WAV, truncated, unsupported codec). Four codec-free
    * wire formats decode for real: PCM16 (format 1, 16-bit, even data
    * length — LE i16 bytes ARE the samples), the two G.711 companded
    * families (μ-law format 7 / A-law format 6, 8-bit — one table lookup
    * per byte, the public ITU expansion), and IMA/DVI ADPCM (format
    * 0x11, 4-bit — block-reset predictor recurrence over the published
    * step/index tables, r13). Anything else — IEEE float, MS-ADPCM
    * (format 2), a non-4-bit IMA claim, a 16-bit G.711 claim, an odd
    * PCM16 chunk, a partial ADPCM block — refuses rather than
    * guessing. */
  def decodePcm(b: Array[Byte]): Option[PcmAudio] =
    wavLayout(b) match {
      case Some((1, 16, rate, channels, dataOff, dataLen, _))
        if (dataLen & 1) == 0 =>
        val n = dataLen / 2
        val out = new Array[Short](n)
        var k = 0
        while (k < n) {
          val at = dataOff + 2 * k
          out(k) = (u8(b, at) | (u8(b, at + 1) << 8)).toShort // LE i16
          k += 1
        }
        Some(PcmAudio(rate, channels, out, "pcm16"))
      case Some((fmt, 8, rate, channels, dataOff, dataLen, _))
        if fmt == 6 || fmt == 7 =>
        val table = if (fmt == 7) UlawTable else AlawTable
        val out = new Array[Short](dataLen)
        var k = 0
        while (k < dataLen) {
          out(k) = table(u8(b, dataOff + k))
          k += 1
        }
        Some(PcmAudio(rate, channels, out, if (fmt == 7) "ulaw" else "alaw"))
      case Some((17, 4, rate, channels, dataOff, dataLen, blockAlign)) =>
        decodeImaAdpcm(b, rate, channels, dataOff, dataLen, blockAlign)
      case _ => None
    }

  /** The real audio bytes at a frame timestamp: `nBytes` of the data
    * chunk starting at second `tsSeconds`, aligned down to a whole frame
    * (block align) and clipped to the chunk — the slice a frame sampler
    * hands to a feature extractor. None when the payload is not a
    * complete PCM16 WAV or the timestamp falls past the audio. */
  def wavFrameSlice(b: Array[Byte], tsSeconds: Int, nBytes: Int): Option[Array[Byte]] =
    pcmLayout(b).flatMap { case (rate, channels, dataOff, dataLen) =>
      val blockAlign = 2 * channels
      val byteRate = rate.toLong * blockAlign
      val rel = tsSeconds.toLong * byteRate
      val aligned = rel - (rel % blockAlign)
      if (tsSeconds < 0 || aligned >= dataLen) None
      else {
        val start = dataOff + aligned.toInt
        val len = math.min(nBytes.toLong, dataLen - aligned).toInt
        Some(java.util.Arrays.copyOfRange(b, start, start + len))
      }
    }

  /** Total audio/video decode — [[Unknown]] when the payload is not a
    * recognized WAV/MP3/MP4 header (images fall through to [[decode]]'s
    * formats with their dimensions carried over). */
  def decodeAv(bytes: Array[Byte]): AvMeta = {
    if (bytes == null || bytes.length < 4) return Unknown
    if (isWav(bytes)) decodeWav(bytes)
    else if (isMp4(bytes)) decodeMp4(bytes)
    else if (isMp3(bytes)) decodeMp3(bytes)
    else {
      val (w, h, f) = decode(bytes)
      if (f == "unknown") Unknown else AvMeta(w, h, 0, 0, 0L, f)
    }
  }
}
