package graft.llm

import java.io.ByteArrayOutputStream

/** Deterministic media-payload synthesis: well-formed PNG/JPEG/GIF/BMP
  * headers whose dimensions are pure functions of a seed id. Used by the
  * q65 gate query: Spark builds the binaries and parses them back with
  * [[MediaHeaders]]; the DuckDB oracle independently predicts the decoded
  * metadata from the same id arithmetic — so a parser bug (wrong offset,
  * endianness, marker walk) breaks the hash compare.
  *
  * Payload byte lengths are format-fixed constants (pinned by spec and
  * used by the oracle's n_bytes arithmetic).
  */
object MediaSynth {
  /** Dimensions a seed synthesizes to — shared by synth and oracle. */
  def widthOf(id: Long): Int = (1 + math.floorMod(id * 13L, 1920L)).toInt
  def heightOf(id: Long): Int = (1 + math.floorMod(id * 7L, 1080L)).toInt
  /** Format cycle: 0=png, 1=baseline jpeg (SOF0), 2=progressive jpeg
    * (SOF2), 3=gif, 4=bmp. Two jpeg variants exercise distinct SOF
    * markers through the same walk. */
  def formatOf(id: Long): String = math.floorMod(id, 5L) match {
    case 0 => "png"
    case 1 | 2 => "jpeg"
    case 3 => "gif"
    case _ => "bmp"
  }

  val PngBytes = 33   // sig 8 + len 4 + tag 4 + IHDR data 13 + crc 4
  val JpegBytes = 42  // SOI 2 + APP0 18 + DQT 7 + SOF 13 + EOI 2
  val GifBytes = 13   // sig 6 + screen descriptor 7
  val BmpBytes = 54   // file header 14 + BITMAPINFOHEADER 40

  def bytesOf(id: Long): Int = math.floorMod(id, 5L) match {
    case 0 => PngBytes
    case 1 | 2 => JpegBytes
    case 3 => GifBytes
    case _ => BmpBytes
  }

  private def beU16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def leU16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def beU32(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
    o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }
  private def leI32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }

  private def png(w: Int, h: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream(PngBytes)
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(o.write)
    beU32(o, 13L)                       // IHDR data length
    "IHDR".foreach(c => o.write(c.toInt))
    beU32(o, w.toLong); beU32(o, h.toLong)
    o.write(8); o.write(6)              // bit depth, color type RGBA
    o.write(0); o.write(0); o.write(0)  // compression, filter, interlace
    beU32(o, 0L)                        // CRC (not validated by header parse)
    o.toByteArray
  }

  private def jpeg(w: Int, h: Int, progressive: Boolean): Array[Byte] = {
    val o = new ByteArrayOutputStream(JpegBytes)
    o.write(0xff); o.write(0xd8)                   // SOI
    o.write(0xff); o.write(0xe0); beU16(o, 16)     // APP0, len 16
    "JFIF".foreach(c => o.write(c.toInt)); o.write(0)
    o.write(1); o.write(1)                         // version 1.1
    o.write(0); beU16(o, 1); beU16(o, 1)           // density units + x/y
    o.write(0); o.write(0)                         // no thumbnail
    o.write(0xff); o.write(0xdb); beU16(o, 5)      // DQT stub, len 5
    o.write(0); o.write(0); o.write(0)             // 3 payload bytes
    o.write(0xff); o.write(if (progressive) 0xc2 else 0xc0)
    beU16(o, 11)                                   // SOF len: 8 + 3*1 comp
    o.write(8)                                     // precision
    beU16(o, h); beU16(o, w)                       // HEIGHT then WIDTH
    o.write(1)                                     // 1 component
    o.write(1); o.write(0x11); o.write(0)          // comp id, sampling, qtable
    o.write(0xff); o.write(0xd9)                   // EOI
    o.toByteArray
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream(GifBytes)
    "GIF89a".foreach(c => o.write(c.toInt))
    leU16(o, w); leU16(o, h)
    o.write(0); o.write(0); o.write(0)  // packed, bg color, aspect
    o.toByteArray
  }

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream(BmpBytes)
    o.write('B'.toInt); o.write('M'.toInt)
    leI32(o, BmpBytes)                  // file size
    leI32(o, 0)                         // reserved
    leI32(o, BmpBytes)                  // pixel-data offset (none here)
    leI32(o, 40)                        // BITMAPINFOHEADER size
    leI32(o, w); leI32(o, -h)           // negative height = top-down
    leU16(o, 1); leU16(o, 24)           // planes, bpp
    leI32(o, 0); leI32(o, 0)            // compression, image size
    leI32(o, 2835); leI32(o, 2835)      // ppm resolution
    leI32(o, 0); leI32(o, 0)            // palette counts
    o.toByteArray
  }

  /** The payload for a seed id — format, dims, and length all pure
    * functions of the id. */
  def synth(id: Long): Array[Byte] = {
    val w = widthOf(id); val h = heightOf(id)
    math.floorMod(id, 5L) match {
      case 0 => png(w, h)
      case 1 => jpeg(w, h, progressive = false)
      case 2 => jpeg(w, h, progressive = true)
      case 3 => gif(w, h)
      case _ => bmp(w, h)
    }
  }
}
