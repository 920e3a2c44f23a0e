package graft

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocumentIngest, PdfText}

/** Minimal-PDF extraction: fixtures are hand-built from the open spec
  * (ISO 32000) — uncompressed and Flate content streams, the text-show
  * operator family, string escapes — plus the refusal contract for
  * encrypted and image-only files. */
class PdfTextSpec extends AnyFunSuite {

  private def latin1(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** One-page PDF whose content stream is `content` (raw or deflated). */
  private def pdf(content: String, flate: Boolean,
                  trailerExtra: String = ""): Array[Byte] = {
    val body =
      if (flate) deflate(latin1(content)) else latin1(content)
    val out = new ByteArrayOutputStream()
    out.write(latin1(
      s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${body.length}${if (flate) " /Filter /FlateDecode" else ""} >>
         |stream
         |""".stripMargin))
    out.write(body)
    out.write(latin1(
      s"""
         |endstream
         |endobj
         |trailer << /Root 1 0 R$trailerExtra >>
         |%%EOF
         |""".stripMargin))
    out.toByteArray
  }

  test("uncompressed content stream: Tj shows, Td line breaks, escapes") {
    val doc = pdf(
      """BT /F1 12 Tf 72 720 Td (Hello) Tj ( world) Tj 0 -14 Td (Linea 2 \(ok\)) Tj ET""",
      flate = false)
    assert(PdfText.extract(doc).contains("Hello world\nLinea 2 (ok)"))
  }

  test("Flate stream: TJ kern-to-space, T* newline, hex strings") {
    val doc = pdf(
      """BT [ (A) -250 (B) 10 (C) ] TJ T* <48656C6C6F> Tj ET""",
      flate = true)
    assert(PdfText.extract(doc).contains("A BC\nHello"))
  }

  test("octal escapes, nested parens, line continuation") {
    val doc = pdf(
      "BT (\\101\\102\\103 (anidado) fin) Tj (a\\\nb) Tj ET",
      flate = false)
    // \101\102\103 = ABC; nested parens preserved; \<EOL> drops both
    assert(PdfText.extract(doc).contains("ABC (anidado) fin" + "ab"))
  }

  test("quote operators break lines before showing") {
    val doc = pdf("""BT (uno) Tj (dos) ' ET""", flate = false)
    assert(PdfText.extract(doc).contains("uno\ndos"))
  }

  test("encrypted PDFs refuse to None") {
    val doc = pdf("""BT (secreto) Tj ET""", flate = false,
      trailerExtra = " /Encrypt 9 0 R")
    assert(PdfText.extract(doc).isEmpty)
  }

  test("image-only (no text operators) refuses to None; junk refuses") {
    // a Flate stream of binary noise, no BT anywhere
    val noise = Array.tabulate[Byte](4096)(i => ((i * 131) % 251).toByte)
    val out = new ByteArrayOutputStream()
    val z = deflate(noise)
    out.write(latin1(
      s"%PDF-1.5\n5 0 obj << /Subtype /Image /Length ${z.length} /Filter /FlateDecode >>\nstream\n"))
    out.write(z)
    out.write(latin1("\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"))
    assert(PdfText.extract(out.toByteArray).isEmpty)
    assert(PdfText.extract(latin1("%PDF-1.4 junk")).isEmpty)
    assert(PdfText.extract(latin1("not a pdf at all")).isEmpty)
  }

  test("dispatcher routes .pdf through the reader") {
    val doc = pdf("""BT (via dispatch) Tj ET""", flate = false)
    assert(DocumentIngest.extractText("informe.pdf", doc)
      .contains("via dispatch"))
    // refusals flow as the dispatcher's None, not an error
    assert(DocumentIngest.extractText("scan.pdf", latin1("%PDF-1.4 junk")).isEmpty)
  }
}
