package graft.sources

import scala.collection.mutable

/** Legacy binary Word (.doc) text extraction from the open MS-DOC spec,
  * zero added dependencies — the final legacy-format gap in the
  * [[DocumentIngest]] dispatcher after `.xls` (the reference's own
  * helper stack is python-docx, docx-only, so this EXCEEDS parity).
  *
  * The honest subset: the FIB is located in the `WordDocument` stream,
  * the piece table (Clx → Pcdt → PlcPcd) in the `0Table`/`1Table`
  * stream the FIB selects, and every text piece is decoded at its real
  * offset with its real encoding (fCompressed → CP1252 single-byte,
  * otherwise UTF-16LE) in CP order — the same walk python-docx's
  * binary sibling (antiword/libwv) performs. Field/control markers
  * render as the usual extraction whitespace. Encrypted documents
  * (fEncrypted) and junk bytes refuse loudly; [[DocumentIngest.ingest]]
  * turns that into the per-document error row.
  */
object DocText {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32(b: Array[Byte], i: Int): Int = u16(b, i) | (u16(b, i + 2) << 16)

  /** Whole-document extracted text. */
  def extract(bytes: Array[Byte]): String = {
    val word = XlsText.cfbStream(bytes, Seq("WordDocument"))
    require(word.length >= 0x200 && u16(word, 0) == 0xa5ec,
      "not a Word binary file (FIB magic missing)")
    val flags = u16(word, 0x0a)
    require((flags & 0x0100) == 0, "encrypted document (fEncrypted) — refusing")
    val whichTbl = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    val table = XlsText.cfbStream(bytes, Seq(whichTbl))

    // FibRgFcLcb97: walk the variable-length FIB blocks to the fc/lcb
    // array; fcClx/lcbClx is pair index 66 (MS-DOC 2.5.1)
    var pos = 32
    val csw = u16(word, pos); pos += 2 + csw * 2
    val cslw = u16(word, pos); pos += 2 + cslw * 4
    val cbRgFcLcb = u16(word, pos); pos += 2
    require(cbRgFcLcb > 66, s"FIB carries no Clx pointer (cb=$cbRgFcLcb)")
    val fcClx = i32(word, pos + 66 * 8)
    val lcbClx = i32(word, pos + 66 * 8 + 4)
    require(fcClx >= 0 && lcbClx > 0 && fcClx + lcbClx <= table.length,
      "Clx out of table-stream bounds")

    // Clx: skip Prc blocks (0x01 + u16 cb), land on the Pcdt (0x02)
    var c = fcClx
    val clxEnd = fcClx + lcbClx
    while (c < clxEnd && u8(table, c) == 0x01) c += 3 + u16(table, c + 1)
    require(c < clxEnd && u8(table, c) == 0x02, "piece table (Pcdt) missing")
    val lcb = i32(table, c + 1)
    val plc = c + 5
    require(plc + lcb <= clxEnd, "PlcPcd overruns the Clx")
    val n = (lcb - 4) / 12
    require(n >= 1, "empty piece table")

    val sb = new StringBuilder
    (0 until n).foreach { k =>
      val cpStart = i32(table, plc + 4 * k)
      val cpEnd = i32(table, plc + 4 * (k + 1))
      val pcd = plc + 4 * (n + 1) + 8 * k
      val fcRaw = i32(table, pcd + 2)
      val compressed = (fcRaw & 0x40000000) != 0
      val fc = fcRaw & 0x3fffffff
      val len = cpEnd - cpStart
      if (len > 0) {
        if (compressed) {
          val off = fc / 2
          require(off + len <= word.length, "compressed piece out of bounds")
          (0 until len).foreach(i => sb.append(cp1252(u8(word, off + i))))
        } else {
          require(fc + 2 * len <= word.length, "unicode piece out of bounds")
          (0 until len).foreach(i =>
            sb.append(u16(word, fc + 2 * i).toChar))
        }
      }
    }
    render(sb.toString)
  }

  /** CP1252's 0x80–0x9F block differs from Latin-1; the rest matches. */
  private val Cp1252High: Array[Char] =
    "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ"
      .toCharArray

  private[sources] def cp1252(b: Int): Char =
    if (b >= 0x80 && b <= 0x9f) Cp1252High(b - 0x80) else b.toChar

  /** Word's in-stream markers to extraction text: CR/0x0B = line end,
    * 0x07 = table cell/row mark, fields keep their cached RESULT (the
    * text between separator 0x14 and end 0x15) and drop the
    * instruction (between begin 0x13 and 0x14) — what every binary-Word
    * extractor renders; remaining C0 controls drop.
    *
    * Fields nest routinely (IF/TOC/INCLUDETEXT wrap inner fields), and
    * nesting can occur inside either portion, so a boolean is not
    * enough: a stack tracks the portion of every open field, and a
    * character is visible only when EVERY open field is in its result
    * portion — an inner field's result inside an outer field's
    * instruction is still instruction text and must not leak. */
  private def render(s: String): String = {
    val sb = new StringBuilder
    // one entry per open field: false = instruction portion, true = result
    val inResult = mutable.ArrayDeque.empty[Boolean]
    s.foreach { ch =>
      if (ch == 0x13) inResult.append(false): Unit
      else if (ch == 0x14) {
        if (inResult.nonEmpty) inResult(inResult.length - 1) = true
      } else if (ch == 0x15) {
        if (inResult.nonEmpty) inResult.removeLast(): Unit
      } else if (inResult.forall(identity)) {
        if (ch == '\r' || ch == 0x07 || ch == 0x0b || ch == '\n')
          sb.append('\n'): Unit
        else if (ch == '\t' || ch >= ' ') sb.append(ch): Unit
      }
    }
    sb.toString.linesIterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
  }
}
