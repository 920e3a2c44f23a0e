package graft.sources

import scala.collection.mutable

/** Legacy binary PowerPoint (.ppt) text extraction from the open MS-PPT
  * spec, zero added dependencies — closing the last legacy slot in the
  * [[DocumentIngest]] dispatcher (the reference's helper stack is
  * python-pptx, pptx-only — utils/extract_data/aje_libs/documents/
  * helpers/ppt_helper.py — so this EXCEEDS parity like `.xls`/`.doc`).
  *
  * The honest subset: the `PowerPoint Document` stream is a tree of
  * 8-byte-headed records (recVer/recInstance u16, recType u16, recLen
  * u32); containers (recVer 0xF) nest, and slide text lives in
  * TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8, CP1252)
  * leaves — the same walk every binary-PPT extractor (catppt, POI's
  * quick extractor) performs. In-atom CR/VT render as line breaks.
  * Encrypted decks (DocumentEncryptionAtom 0x2F14) and malformed record
  * trees refuse loudly; [[DocumentIngest.ingest]] turns that into the
  * per-document error row.
  */
object PptText {
  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    u16(b, i).toLong | (u16(b, i + 2).toLong << 16)

  private val TextCharsAtom = 0x0fa0
  private val TextBytesAtom = 0x0fa8
  private val DocumentEncryptionAtom = 0x2f14

  /** Whole-deck extracted text, slide-stream order. */
  def extract(bytes: Array[Byte]): String = {
    val doc = XlsText.cfbStream(bytes, Seq("PowerPoint Document"))
    val atoms = mutable.ArrayBuffer[String]()
    walk(doc, 0, doc.length, atoms, depth = 0)
    atoms.map(render).filter(_.nonEmpty).mkString("\n")
  }

  private def walk(b: Array[Byte], from: Int, until: Int,
                   out: mutable.ArrayBuffer[String], depth: Int): Unit = {
    require(depth <= 32, "record tree deeper than MS-PPT allows — refusing")
    var i = from
    while (i + 8 <= until) {
      val ver = u16(b, i) & 0xf
      val typ = u16(b, i + 2)
      val len = u32(b, i + 4)
      // CFB writers round stream sizes up to the sector, so a real deck's
      // top level may end in zero slack (record type 0 does not exist);
      // accept it only when the ENTIRE tail is zero — anything else is
      // corruption and refuses below
      if (depth == 0 && ver == 0 && typ == 0 && len == 0L &&
          (i until until).forall(b(_) == 0)) return
      val end = i + 8 + len
      require(len <= Int.MaxValue && end <= until,
        s"record 0x${typ.toHexString} overruns its container — refusing")
      require(typ != DocumentEncryptionAtom,
        "encrypted presentation (DocumentEncryptionAtom) — refusing")
      if (ver == 0xf) walk(b, i + 8, end.toInt, out, depth + 1)
      else if (typ == TextCharsAtom) {
        require(len % 2 == 0, "odd TextCharsAtom length — refusing")
        val sb = new StringBuilder
        var j = i + 8
        while (j < end) { sb.append(u16(b, j).toChar); j += 2 }
        out += sb.toString
      } else if (typ == TextBytesAtom) {
        val sb = new StringBuilder
        var j = i + 8
        while (j < end) { sb.append(DocText.cp1252(b(j) & 0xff)); j += 1 }
        out += sb.toString
      }
      i = end.toInt
    }
    require(i == until, "trailing partial record header — refusing")
  }

  /** In-atom markers: CR (the PPT paragraph mark) and VT (soft line
    * break) become newlines; remaining C0 controls drop. */
  private def render(s: String): String = {
    val sb = new StringBuilder
    s.foreach { ch =>
      if (ch == '\r' || ch == 0x0b || ch == '\n') sb.append('\n'): Unit
      else if (ch == '\t' || ch >= ' ') sb.append(ch): Unit
    }
    sb.toString.linesIterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
  }
}
