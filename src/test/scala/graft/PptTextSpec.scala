package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocumentIngest, PptText}

/** Binary PowerPoint (.ppt) extraction: fixtures hand-built from the open
  * specs (MS-CFB container + MS-PPT record tree) — nested containers,
  * UTF-16 and CP1252 text atoms, CR/VT line rendering, and the refusal
  * contract (encryption atom, overrunning records, junk). */
class PptTextSpec extends AnyFunSuite {

  private def u16(v: Int) = Array[Byte]((v & 255).toByte, ((v >> 8) & 255).toByte)
  private def u32(v: Int) = u16(v & 0xffff) ++ u16((v >>> 16) & 0xffff)

  /** One record: ver (0xF = container), type, payload. */
  private def rec(ver: Int, typ: Int, payload: Array[Byte]): Array[Byte] =
    u16(ver & 0xf) ++ u16(typ) ++ u32(payload.length) ++ payload

  private def charsAtom(s: String): Array[Byte] =
    rec(0, 0x0fa0, s.getBytes("UTF-16LE"))
  private def bytesAtom(s: String): Array[Byte] =
    rec(0, 0x0fa8, s.getBytes("ISO-8859-1"))

  private def deck(docStream: Array[Byte]): Array[Byte] =
    CfbFixture.cfb(Seq("PowerPoint Document" -> docStream,
      "Current User" -> new Array[Byte](16)))

  test("text atoms extract through nested containers in stream order") {
    // Document container { Slide container { chars atom, bytes atom },
    // Slide container { chars atom } } — catppt-order extraction
    val doc = rec(0xf, 0x03e8, // DocumentContainer
      rec(0xf, 0x03ee, charsAtom("Título") ++ bytesAtom("viñeta uno")) ++
        rec(0xf, 0x03ee, charsAtom("resumen final")))
    assert(PptText.extract(deck(doc)) == "Título\nviñeta uno\nresumen final")
  }

  test("CR and VT inside an atom render as line breaks; CP1252 high block maps") {
    val doc = rec(0xf, 0x03e8,
      charsAtom("línea uno\rlínea dos" + 0x0b.toChar + "soft") ++
        bytesAtom(new String(Array(0x93.toChar, 'o', 'k', 0x94.toChar))))
    assert(PptText.extract(deck(doc)) == "línea uno\nlínea dos\nsoft\n“ok”")
  }

  test("encrypted decks refuse loudly") {
    val doc = rec(0xf, 0x03e8,
      rec(0, 0x2f14, new Array[Byte](8)) ++ charsAtom("secreto"))
    val e = intercept[IllegalArgumentException](PptText.extract(deck(doc)))
    assert(e.getMessage.contains("encrypted"))
  }

  test("overrunning records, partial headers, and junk refuse loudly") {
    // child record claims more bytes than its container holds
    val bad = rec(0xf, 0x03e8, u16(0) ++ u16(0x0fa0) ++ u32(9999))
    intercept[IllegalArgumentException](PptText.extract(deck(bad)))
    // nonzero trailing garbage refuses (zero sector slack is tolerated —
    // CFB writers round stream sizes up; record type 0 does not exist)
    val trail = charsAtom("ok") ++ Array.fill[Byte](12)(0xee.toByte)
    intercept[IllegalArgumentException](PptText.extract(deck(trail)))
    assert(PptText.extract(deck(charsAtom("ok"))) == "ok") // zero slack only
    // odd UTF-16 atom length
    val odd = u16(0) ++ u16(0x0fa0) ++ u32(3) ++ Array[Byte](65, 0, 66)
    intercept[IllegalArgumentException](PptText.extract(deck(odd)))
    // not a compound file at all
    intercept[IllegalArgumentException](
      PptText.extract("no es un ppt".getBytes("UTF-8")))
    // a compound file without the PowerPoint Document stream
    intercept[IllegalArgumentException](
      PptText.extract(CfbFixture.cfb(Seq("Otro" -> new Array[Byte](64)))))
  }

  test("dispatcher routes .ppt; corrupt decks become error rows, not task failures") {
    val doc = rec(0xf, 0x03e8, charsAtom("via despacho ppt"))
    assert(DocumentIngest.extractText("charla.ppt", deck(doc))
      .contains("via despacho ppt"))
  }
}
