package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocText, DocumentIngest}

/** Binary Word (.doc) extraction: fixtures hand-built from the open
  * specs (MS-CFB multi-stream container + MS-DOC FIB/piece table) —
  * compressed and unicode pieces in CP order, Prc skip, field
  * instruction/result rendering, and the refusal contract. */
class DocTextSpec extends AnyFunSuite {

  private def u16(v: Int) = Array[Byte]((v & 255).toByte, ((v >> 8) & 255).toByte)
  private def u32(v: Int) = u16(v & 0xffff) ++ u16((v >>> 16) & 0xffff)
  private def utf16(s: String) = s.getBytes("UTF-16LE")

  /** Multi-stream 512-byte-sector CFB — the shared [[CfbFixture]]. */
  private def cfb(streams: Seq[(String, Array[Byte])]): Array[Byte] =
    CfbFixture.cfb(streams)

  /** WordDocument stream: minimal FIB + raw text area at `textAt`. */
  private def wordStream(fcClx: Int, lcbClx: Int, flags: Int,
                         textAt: Int, text: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](math.max(1024, textAt + text.length))
    System.arraycopy(u16(0xa5ec), 0, b, 0, 2)
    System.arraycopy(u16(0x00c1), 0, b, 2, 2)
    System.arraycopy(u16(flags), 0, b, 0x0a, 2)
    System.arraycopy(u16(14), 0, b, 32, 2)       // csw
    System.arraycopy(u16(22), 0, b, 62, 2)       // cslw
    System.arraycopy(u16(93), 0, b, 152, 2)      // cbRgFcLcb
    System.arraycopy(u32(fcClx), 0, b, 154 + 66 * 8, 4)
    System.arraycopy(u32(lcbClx), 0, b, 154 + 66 * 8 + 4, 4)
    System.arraycopy(text, 0, b, textAt, text.length)
    b
  }

  /** PlcPcd for pieces of (cpLen, fcRaw). */
  private def pcdt(pieces: Seq[(Int, Int)], prc: Boolean = false): Array[Byte] = {
    val cps = pieces.scanLeft(0)(_ + _._1)
    val plc = cps.flatMap(u32) ++
      pieces.flatMap { case (_, fcRaw) => u16(0) ++ u32(fcRaw) ++ u16(0) }
    val head = if (prc) Array[Byte](0x01) ++ u16(2) ++ Array[Byte](9, 9)
               else Array.empty[Byte]
    head ++ Array[Byte](0x02) ++ u32(plc.length) ++ plc
  }

  private def compressedFc(byteOff: Int) = (byteOff * 2) | 0x40000000

  test("compressed and unicode pieces decode in CP order; CR breaks lines") {
    // piece 1 (CP1252): "Hola\r" + 0x93 quote; piece 2 (UTF-16): "señal—fin"
    val p1 = "Hola\r".getBytes("ISO-8859-1") ++ Array[Byte](0x93.toByte)
    val p2 = utf16("señal—fin")
    val text = p1 ++ p2
    val clx = pcdt(Seq((6, compressedFc(1024)),
      (9, 1024 + p1.length))) // unicode fc is a raw byte offset
    val doc = cfb(Seq(
      "WordDocument" -> wordStream(0, clx.length, 0x0200, 1024, text),
      "1Table" -> clx))
    assert(DocText.extract(doc) == "Hola\n“señal—fin")
  }

  test("Prc blocks before the Pcdt are skipped") {
    val p1 = "texto plano\r".getBytes("ISO-8859-1")
    val clx = pcdt(Seq((p1.length, compressedFc(1024))), prc = true)
    val doc = cfb(Seq(
      "WordDocument" -> wordStream(0, clx.length, 0x0200, 1024, p1),
      "1Table" -> clx))
    assert(DocText.extract(doc) == "texto plano")
  }

  test("fields render their cached result, not the instruction") {
    // ver <0x13>REF marcador<0x14>resultado<0x15> fin<CR>
    val p1 = "ver ".getBytes("ISO-8859-1") ++ Array[Byte](0x13) ++
      "REF marcador".getBytes("ISO-8859-1") ++ Array[Byte](0x14) ++
      "resultado".getBytes("ISO-8859-1") ++ Array[Byte](0x15) ++
      " fin\r".getBytes("ISO-8859-1")
    val clx = pcdt(Seq((p1.length, compressedFc(1024))))
    val doc = cfb(Seq(
      "WordDocument" -> wordStream(0, clx.length, 0x0200, 1024, p1),
      "1Table" -> clx))
    assert(DocText.extract(doc) == "ver resultado fin")
  }

  test("nested fields: an inner field inside the outer INSTRUCTION stays hidden") {
    // a <13>IF <13>REF x<14>oculto<15> cond<14>res <13>DATE<14>2024<15> fin<15> z<CR>
    // The inner field's RESULT ("oculto") sits inside the outer field's
    // instruction — Word never displays it; the inner field inside the
    // outer RESULT shows its result ("2024"). A boolean tracker leaks
    // " cond" after the first 0x15 — the depth stack must not.
    def f(s: String) = s.getBytes("ISO-8859-1")
    val p1 = f("a ") ++ Array[Byte](0x13) ++ f("IF ") ++
      Array[Byte](0x13) ++ f("REF x") ++ Array[Byte](0x14) ++ f("oculto") ++
      Array[Byte](0x15) ++ f(" cond") ++ Array[Byte](0x14) ++ f("res ") ++
      Array[Byte](0x13) ++ f("DATE") ++ Array[Byte](0x14) ++ f("2024") ++
      Array[Byte](0x15) ++ f(" fin") ++ Array[Byte](0x15) ++ f(" z\r")
    val clx = pcdt(Seq((p1.length, compressedFc(1024))))
    val doc = cfb(Seq(
      "WordDocument" -> wordStream(0, clx.length, 0x0200, 1024, p1),
      "1Table" -> clx))
    assert(DocText.extract(doc) == "a res 2024 fin z")
  }

  test("0Table is selected when fWhichTblStm is clear") {
    val p1 = "tabla cero\r".getBytes("ISO-8859-1")
    val clx = pcdt(Seq((p1.length, compressedFc(1024))))
    val doc = cfb(Seq(
      "WordDocument" -> wordStream(0, clx.length, 0x0000, 1024, p1),
      "0Table" -> clx))
    assert(DocText.extract(doc) == "tabla cero")
  }

  test("encrypted documents and junk refuse loudly") {
    val p1 = "secreto\r".getBytes("ISO-8859-1")
    val clx = pcdt(Seq((p1.length, compressedFc(1024))))
    val enc = cfb(Seq(
      "WordDocument" -> wordStream(0, clx.length, 0x0200 | 0x0100, 1024, p1),
      "1Table" -> clx))
    val e = intercept[IllegalArgumentException](DocText.extract(enc))
    assert(e.getMessage.contains("encrypted"))
    intercept[IllegalArgumentException](
      DocText.extract("no es un doc".getBytes("UTF-8")))
    // a compound file without a WordDocument stream refuses too
    intercept[IllegalArgumentException](
      DocText.extract(cfb(Seq("Otro" -> new Array[Byte](64)))))
  }

  test("dispatcher routes .doc") {
    val p1 = "via despacho\r".getBytes("ISO-8859-1")
    val clx = pcdt(Seq((p1.length, compressedFc(1024))))
    val doc = cfb(Seq(
      "WordDocument" -> wordStream(0, clx.length, 0x0200, 1024, p1),
      "1Table" -> clx))
    assert(DocumentIngest.extractText("informe.doc", doc)
      .contains("via despacho"))
  }
}
