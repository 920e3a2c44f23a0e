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
}
