package graft

import java.io.ByteArrayOutputStream

/** Shared hand-built MS-CFB (OLE2 compound file) fixture for the legacy
  * binary document specs (.doc / .ppt): multi-stream, 512-byte-sector,
  * regular-FAT container with streams padded past the mini cutoff. */
object CfbFixture {
  private def u16(v: Int) = Array[Byte]((v & 255).toByte, ((v >> 8) & 255).toByte)
  private def u32(v: Int) = u16(v & 0xffff) ++ u16((v >>> 16) & 0xffff)
  private def utf16(s: String) = s.getBytes("UTF-16LE")

  def cfb(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val padded = streams.map { case (n, b) =>
      (n, b ++ Array.fill[Byte](math.max(0, 4096 - b.length))(0))
    }
    val sectorsOf = padded.map { case (_, b) => (b.length + 511) / 512 }
    val starts = sectorsOf.scanLeft(2)(_ + _)
    def dirEntry(name: String, typ: Int, start: Int, size: Int): Array[Byte] = {
      val b = new Array[Byte](128)
      val nm = utf16(name)
      System.arraycopy(nm, 0, b, 0, nm.length)
      System.arraycopy(u16(nm.length + 2), 0, b, 64, 2)
      b(66) = typ.toByte
      System.arraycopy(u32(start), 0, b, 116, 4)
      System.arraycopy(u32(size), 0, b, 120, 4)
      b
    }
    val end = 0xfffffffe
    val out = new ByteArrayOutputStream()
    val header = new Array[Byte](512)
    System.arraycopy(Array[Byte](0xd0.toByte, 0xcf.toByte, 0x11, 0xe0.toByte,
      0xa1.toByte, 0xb1.toByte, 0x1a, 0xe1.toByte), 0, header, 0, 8)
    System.arraycopy(u16(0x0003), 0, header, 26, 2)
    System.arraycopy(u16(0xfffe), 0, header, 28, 2)
    System.arraycopy(u16(9), 0, header, 30, 2)
    System.arraycopy(u16(6), 0, header, 32, 2)
    System.arraycopy(u32(1), 0, header, 44, 4)   // one FAT sector
    System.arraycopy(u32(1), 0, header, 48, 4)   // dir at sector 1
    System.arraycopy(u32(4096), 0, header, 56, 4)
    System.arraycopy(u32(end), 0, header, 60, 4) // no miniFAT
    System.arraycopy(u32(end), 0, header, 68, 4) // no DIFAT chain
    System.arraycopy(u32(0), 0, header, 76, 4)
    (1 until 109).foreach(i =>
      System.arraycopy(u32(0xffffffff), 0, header, 76 + 4 * i, 4))
    out.write(header)
    val fat = new Array[Byte](512)
    System.arraycopy(u32(0xfffffffd), 0, fat, 0, 4)
    System.arraycopy(u32(end), 0, fat, 4, 4)
    padded.indices.foreach { s =>
      val st = starts(s)
      (0 until sectorsOf(s)).foreach { i =>
        val next = if (i == sectorsOf(s) - 1) end else st + i + 1
        System.arraycopy(u32(next), 0, fat, 4 * (st + i), 4)
      }
    }
    out.write(fat)
    val dir = new Array[Byte](512)
    System.arraycopy(dirEntry("Root Entry", 5, end, 0), 0, dir, 0, 128)
    padded.indices.foreach { s =>
      System.arraycopy(dirEntry(padded(s)._1, 2, starts(s), padded(s)._2.length),
        0, dir, 128 * (s + 1), 128)
    }
    out.write(dir)
    padded.foreach { case (_, b) =>
      out.write(b)
      out.write(new Array[Byte]((512 - b.length % 512) % 512))
    }
    out.toByteArray
  }
}
