package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocumentIngest, XlsText}

/** BIFF8 .xls extraction: fixtures are hand-built from the open specs
  * (MS-CFB container + MS-XLS records) — SST with CONTINUE splits,
  * inline labels, all four RK encodings, formula cached results, the
  * mini-stream container path, and the refusal contract. */
class XlsTextSpec extends AnyFunSuite {

  // ---- little-endian builders
  private def u16(v: Int) = Array[Byte]((v & 255).toByte, ((v >> 8) & 255).toByte)
  private def u32(v: Int) = u16(v & 0xffff) ++ u16((v >>> 16) & 0xffff)
  private def f64(d: Double) = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => ((bits >>> (8 * i)) & 0xff).toByte).toArray
  }
  private def rec(id: Int, data: Array[Byte]) = u16(id) ++ u16(data.length) ++ data
  private def ascii(s: String) = s.getBytes("ISO-8859-1")
  private def utf16(s: String) = s.getBytes("UTF-16LE")

  private def bof(dt: Int) =
    rec(0x0809, u16(0x0600) ++ u16(dt) ++ u16(0) ++ u16(0) ++ u32(0) ++ u32(0))
  private val eof = rec(0x000a, Array.empty[Byte])

  /** SST entry: compressed or UTF-16 string. */
  private def sstString(s: String, wide: Boolean): Array[Byte] =
    u16(s.length) ++ Array[Byte](if (wide) 1 else 0) ++
      (if (wide) utf16(s) else ascii(s))

  private def labelSst(row: Int, col: Int, isst: Int) =
    rec(0x00fd, u16(row) ++ u16(col) ++ u16(0) ++ u32(isst))
  private def number(row: Int, col: Int, v: Double) =
    rec(0x0203, u16(row) ++ u16(col) ++ u16(0) ++ f64(v))
  private def rk(row: Int, col: Int, v: Int) =
    rec(0x027e, u16(row) ++ u16(col) ++ u16(0) ++ u32(v))
  private def boolCell(row: Int, col: Int, v: Boolean) =
    rec(0x0205, u16(row) ++ u16(col) ++ u16(0) ++
      Array[Byte](if (v) 1 else 0, 0))

  private def boundsheet(pos: Int, name: String) =
    rec(0x0085, u32(pos) ++ Array[Byte](0, 0) ++
      Array[Byte](name.length.toByte, 0) ++ ascii(name))

  /** Assemble a workbook stream: globals (SST as raw records + sheets
    * index) + one substream per sheet. */
  private def workbook(sstRecs: Array[Byte],
                       sheets: Seq[(String, Array[Byte])]): Array[Byte] = {
    // layout pass: globals size depends only on record COUNT, not content
    val globalsFixed = bof(0x0005) ++ sstRecs
    val bsLen = sheets.map(s => 4 + 4 + 2 + 2 + s._1.length).sum
    val globalsLen = globalsFixed.length + bsLen + eof.length
    var at = globalsLen
    val positions = sheets.map { case (_, body) =>
      val p = at; at += body.length; p
    }
    globalsFixed ++
      sheets.zip(positions).flatMap { case ((n, _), p) => boundsheet(p, n) } ++
      eof ++ sheets.flatMap(_._2)
  }

  /** Wrap a stream into a minimal 512-byte-sector CFB container. */
  private def cfb(streamName: String, stream0: Array[Byte],
                  mini: Boolean = false): Array[Byte] = {
    val stream = if (mini) stream0
      else stream0 ++ Array.fill[Byte](math.max(0, 4096 - stream0.length))(0)
    val nData = (stream.length + 511) / 512
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
    val out = new ByteArrayOutputStream()
    val header = new Array[Byte](512)
    System.arraycopy(Array[Byte](0xd0.toByte, 0xcf.toByte, 0x11, 0xe0.toByte,
      0xa1.toByte, 0xb1.toByte, 0x1a, 0xe1.toByte), 0, header, 0, 8)
    System.arraycopy(u16(0x003e), 0, header, 24, 2) // minor
    System.arraycopy(u16(0x0003), 0, header, 26, 2) // major (512 B)
    System.arraycopy(u16(0xfffe), 0, header, 28, 2) // byte order
    System.arraycopy(u16(9), 0, header, 30, 2)      // sector shift
    System.arraycopy(u16(6), 0, header, 32, 2)      // mini shift
    System.arraycopy(u32(1), 0, header, 44, 4)      // # FAT sectors
    System.arraycopy(u32(1), 0, header, 48, 4)      // first dir sector
    System.arraycopy(u32(4096), 0, header, 56, 4)   // mini cutoff
    val end = 0xfffffffe
    val free = 0xffffffff
    if (mini) {
      System.arraycopy(u32(2), 0, header, 60, 4)    // first miniFAT sector
      System.arraycopy(u32(1), 0, header, 64, 4)    // # miniFAT sectors
    } else {
      System.arraycopy(u32(end), 0, header, 60, 4)
    }
    System.arraycopy(u32(end), 0, header, 68, 4)    // no DIFAT chain
    System.arraycopy(u32(0), 0, header, 76, 4)      // DIFAT[0] = FAT @ 0
    (1 until 109).foreach(i =>
      System.arraycopy(u32(free), 0, header, 76 + 4 * i, 4))
    out.write(header)

    if (!mini) {
      // sectors: 0=FAT, 1=dir, 2..=stream chain
      val fat = new Array[Byte](512)
      System.arraycopy(u32(0xfffffffd), 0, fat, 0, 4) // FAT sector marker
      System.arraycopy(u32(end), 0, fat, 4, 4)        // dir chain ends
      (0 until nData).foreach { i =>
        val next = if (i == nData - 1) end else 3 + i
        System.arraycopy(u32(next), 0, fat, 8 + 4 * i, 4)
      }
      out.write(fat)
      val dir = new Array[Byte](512)
      System.arraycopy(dirEntry("Root Entry", 5, end, 0), 0, dir, 0, 128)
      // a regular (non-mini) stream must report >= miniCutoff bytes, so
      // the fixture records the padded size (trailing zero records are
      // skipped by the BIFF walker, as in real writers' slack space)
      System.arraycopy(dirEntry(streamName, 2, 2, stream.length), 0, dir, 128, 128)
      out.write(dir)
      (0 until nData).foreach { i =>
        val s = new Array[Byte](512)
        val n = math.min(512, stream.length - 512 * i)
        System.arraycopy(stream, 512 * i, s, 0, n)
        out.write(s)
      }
    } else {
      // sectors: 0=FAT, 1=dir, 2=miniFAT, 3..=root mini-stream data
      val nMiniSectors = (stream.length + 63) / 64
      val rootBytes = nMiniSectors * 64
      val nRootSectors = (rootBytes + 511) / 512
      val fat = new Array[Byte](512)
      System.arraycopy(u32(0xfffffffd), 0, fat, 0, 4)
      System.arraycopy(u32(end), 0, fat, 4, 4)  // dir
      System.arraycopy(u32(end), 0, fat, 8, 4)  // miniFAT
      (0 until nRootSectors).foreach { i =>
        val next = if (i == nRootSectors - 1) end else 4 + i
        System.arraycopy(u32(next), 0, fat, 12 + 4 * i, 4)
      }
      out.write(fat)
      val dir = new Array[Byte](512)
      System.arraycopy(dirEntry("Root Entry", 5, 3, rootBytes), 0, dir, 0, 128)
      System.arraycopy(dirEntry(streamName, 2, 0, stream0.length), 0, dir, 128, 128)
      out.write(dir)
      val miniFat = new Array[Byte](512)
      (0 until nMiniSectors).foreach { i =>
        val next = if (i == nMiniSectors - 1) end else i + 1
        System.arraycopy(u32(next), 0, miniFat, 4 * i, 4)
      }
      out.write(miniFat)
      (0 until nRootSectors).foreach { i =>
        val s = new Array[Byte](512)
        val n = math.min(512, stream.length - 512 * i)
        if (n > 0) System.arraycopy(stream, 512 * i, s, 0, n)
        out.write(s)
      }
    }
    out.toByteArray
  }

  private def rkInt(v: Int) = (v << 2) | 2
  private def rkInt100(v: Int) = (v << 2) | 3
  private def rkFloat(d: Double) =
    ((java.lang.Double.doubleToLongBits(d) >>> 32) & 0xfffffffcL).toInt

  test("two sheets: SST, inline labels, numbers, RK variants, booleans") {
    val sst = rec(0x00fc, u32(3) ++ u32(3) ++
      sstString("hola", wide = false) ++
      sstString("olé", wide = true) ++
      sstString("tercero", wide = false))
    val sheet1 = bof(0x0010) ++
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
      number(1, 0, 42.0) ++ number(1, 1, 3.25) ++
      rk(2, 0, rkInt(7)) ++ rk(2, 1, rkInt100(1234)) ++
      rk(2, 2, rkFloat(2.5)) ++
      boolCell(4, 0, true) ++ eof // row 3 left empty -> skipped
    val sheet2 = bof(0x0010) ++ labelSst(0, 0, 2) ++
      rec(0x0204, u16(1) ++ u16(0) ++ u16(0) ++
        u16(6) ++ Array[Byte](0) ++ ascii("inline")) ++ eof
    val doc = cfb("Workbook", workbook(sst, Seq(
      "Hoja1" -> sheet1, "Hoja2" -> sheet2)))
    val sheets = XlsText.sheets(doc)
    assert(sheets.map(_._1) == Seq("Hoja1", "Hoja2"))
    val rows1 = sheets.head._2
    assert(rows1 == Seq(
      Seq("hola", "olé"),
      Seq("42", "3.25"),
      Seq("7", "12.34", "2.5"),
      Seq("true")))
    assert(sheets(1)._2 == Seq(Seq("tercero"), Seq("inline")))
    val text = XlsText.toText(doc)
    assert(text.contains("Sheet: Hoja1"))
    assert(text.contains("Row 1: hola | olé"))
    assert(text.contains("Row 3: 7 | 12.34 | 2.5"))
  }

  test("SST strings split across CONTINUE re-read the compression flag") {
    // string 'abcdef': header + 'abc' in SST, CONTINUE restates flag
    // (wide this time) and carries 'def' as UTF-16
    val sstData = u32(2) ++ u32(2) ++
      u16(6) ++ Array[Byte](0) ++ ascii("abc")
    val cont = Array[Byte](1) ++ utf16("def") ++
      sstString("entera", wide = false)
    val sst = rec(0x00fc, sstData) ++ rec(0x003c, cont)
    val sheet = bof(0x0010) ++ labelSst(0, 0, 0) ++ labelSst(1, 0, 1) ++ eof
    val doc = cfb("Workbook", workbook(sst, Seq("S" -> sheet)))
    assert(XlsText.sheets(doc).head._2 == Seq(Seq("abcdef"), Seq("entera")))
  }

  test("a CONTINUE split mid-UTF-16-code-unit refuses loudly") {
    // wide string 'xy': header + 'x' + ONE stray byte of 'y' in the SST
    // record, the other byte in CONTINUE — spec-violating; consuming the
    // CONTINUE's header as character data would be silent corruption
    val sstData = u32(1) ++ u32(1) ++
      u16(2) ++ Array[Byte](1) ++ utf16("x") ++ Array[Byte]('y'.toByte)
    val cont = Array[Byte](1, 0) // flag byte + the code unit's high byte
    val sst = rec(0x00fc, sstData) ++ rec(0x003c, cont)
    val sheet = bof(0x0010) ++ labelSst(0, 0, 0) ++ eof
    val doc = cfb("Workbook", workbook(sst, Seq("S" -> sheet)))
    val e = intercept[IllegalArgumentException](XlsText.sheets(doc))
    assert(e.getMessage.contains("split across CONTINUE"))
  }

  test("formula cached results: numeric inline, string via STRING record") {
    val sst = rec(0x00fc, u32(0) ++ u32(0))
    val fNum = rec(0x0006, u16(0) ++ u16(0) ++ u16(0) ++ f64(6.5) ++
      u16(0) ++ u32(0) ++ u16(0))
    val fStr = rec(0x0006, u16(1) ++ u16(0) ++ u16(0) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0xff.toByte, 0xff.toByte) ++
      u16(0) ++ u32(0) ++ u16(0)) ++
      rec(0x0207, u16(4) ++ Array[Byte](0) ++ ascii("calc"))
    val sheet = bof(0x0010) ++ fNum ++ fStr ++ eof
    val doc = cfb("Workbook", workbook(sst, Seq("F" -> sheet)))
    assert(XlsText.sheets(doc).head._2 == Seq(Seq("6.5"), Seq("calc")))
  }

  test("mini-stream containers (small workbooks) read through the miniFAT") {
    val sst = rec(0x00fc, u32(1) ++ u32(1) ++ sstString("mini", wide = false))
    val sheet = bof(0x0010) ++ labelSst(0, 0, 0) ++ number(1, 0, 5) ++ eof
    val doc = cfb("Workbook", workbook(sst, Seq("M" -> sheet)), mini = true)
    assert(XlsText.sheets(doc).head._2 == Seq(Seq("mini"), Seq("5")))
  }

  test("encrypted workbooks (FILEPASS) and junk refuse loudly") {
    val sst = rec(0x00fc, u32(0) ++ u32(0))
    val guarded = bof(0x0005) ++ rec(0x002f, u16(1) ++ u16(0)) ++ sst ++ eof
    val doc = cfb("Workbook", guarded)
    val e = intercept[IllegalArgumentException](XlsText.sheets(doc))
    assert(e.getMessage.contains("encrypted"))
    intercept[IllegalArgumentException](
      XlsText.sheets("no es un xls".getBytes("UTF-8")))
    // and a compound file with no Workbook stream refuses too
    val other = cfb("NotAWorkbook", bof(0x0005) ++ eof)
    intercept[IllegalArgumentException](XlsText.sheets(other))
  }

  test("dispatcher routes .xls; corrupt files become error rows, not task failures") {
    val sst = rec(0x00fc, u32(1) ++ u32(1) ++ sstString("via xls", wide = false))
    val sheet = bof(0x0010) ++ labelSst(0, 0, 0) ++ eof
    val doc = cfb("Workbook", workbook(sst, Seq("D" -> sheet)))
    assert(DocumentIngest.extractText("libro.xls", doc).exists(_.contains("via xls")))
    // rendering parity with the xlsx twin's shape
    assert(DocumentIngest.extractText("libro.xls", doc)
      .exists(_.startsWith("Sheet: D\nRow 1: via xls")))
  }
}
