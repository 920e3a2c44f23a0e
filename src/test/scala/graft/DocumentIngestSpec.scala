package graft

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DocumentIngest

/** Office-document ingestion: fixtures are hand-built OOXML zips shaped
  * exactly like real writers' output (the DeltaInteropSpec pattern —
  * built from the public format, no office runtime in the container). */
class DocumentIngestSpec extends AnyFunSuite {
  import TestSpark._

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def xlsxBytes: Array[Byte] = zip(
    "xl/workbook.xml" ->
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Ventas" sheetId="1" r:id="rId2"/><sheet name="Meta" sheetId="2" r:id="rId1"/></sheets></workbook>""".stripMargin,
    // rels deliberately NOT in file-name order: names must resolve via rId
    "xl/_rels/workbook.xml.rels" ->
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId2" Type="t" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin,
    "xl/sharedStrings.xml" ->
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
        |<si><t>hola</t></si><si><r><t>mul</t></r><r><t>ti</t></r></si></sst>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c><c r="C1" t="inlineStr"><is><t>inline</t></is></c></row>
        |<row r="2"/>
        |<row r="3"><c r="B3" t="s"><v>1</v></c><c r="D3"><v>2.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin,
    "xl/worksheets/sheet2.xml" ->
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="b"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin)

  private def docxBytes: Array[Byte] = zip(
    "word/document.xml" ->
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>
        |<w:p><w:r><w:t>Hello</w:t></w:r><w:r><w:t xml:space="preserve"> world</w:t></w:r></w:p>
        |<w:p><w:r><w:t>Line2</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin)

  private def pptxBytes: Array[Byte] = zip(
    "ppt/slides/slide2.xml" ->
      """<p:sld xmlns:p="p" xmlns:a="a"><a:p><a:r><a:t>Second slide</a:t></a:r></a:p></p:sld>""",
    "ppt/slides/slide1.xml" ->
      """<p:sld xmlns:p="p" xmlns:a="a"><a:p><a:r><a:t>First</a:t></a:r></a:p><a:p><a:r><a:t>slide</a:t></a:r></a:p></p:sld>""")

  test("colIndex decodes spreadsheet column letters") {
    assert(DocumentIngest.colIndex("A1") == 0)
    assert(DocumentIngest.colIndex("Z9") == 25)
    assert(DocumentIngest.colIndex("AA3") == 26)
    assert(DocumentIngest.colIndex("BC23") == 54)
  }

  test("xlsx: sheets in workbook order, shared/inline/number cells, empty rows dropped") {
    val sheets = DocumentIngest.xlsxSheets(xlsxBytes)
    assert(sheets.map(_._1) == Seq("Ventas", "Meta"))
    val ventas = sheets.head._2
    // row 2 was empty → dropped; gaps carry nulls up to the cell's column
    assert(ventas == Seq(
      Seq("hola", "42", "inline"),
      Seq(null, "multi", null, "2.5")))
    assert(sheets(1)._2 == Seq(Seq("true")))
    val text = DocumentIngest.xlsxToText(xlsxBytes)
    assert(text.startsWith("Sheet: Ventas\nRow 1: hola | 42 | inline\nRow 2:  | multi |  | 2.5"))
    assert(text.contains("Sheet: Meta\nRow 1: true"))
  }

  test("docx and pptx extract run text with paragraph/slide breaks") {
    assert(DocumentIngest.docxText(docxBytes) == "Hello world\nLine2")
    assert(DocumentIngest.pptxText(pptxBytes) == "First\nslide\n\nSecond slide")
  }

  test("word-accumulating chunker matches the reference's size law") {
    // words of length 4 (+1 space): chunk closes when running size >= 10
    val chunks = DocumentIngest.chunkWords("aaaa bbbb cccc dddd eeee", 10)
    assert(chunks == Seq("aaaa bbbb", "cccc dddd", "eeee"))
    assert(DocumentIngest.chunkWords("", 10).isEmpty)
    // one chunk when everything fits
    assert(DocumentIngest.chunkWords("a b", 100) == Seq("a b"))
  }

  test("distributed ingest: decode on executors, corrupt files carry errors") {
    val dir: Path = Files.createTempDirectory("graft_docs")
    Files.write(dir.resolve("ventas.xlsx"), xlsxBytes)
    Files.write(dir.resolve("informe.docx"), docxBytes)
    Files.write(dir.resolve("deck.pptx"), pptxBytes)
    Files.write(dir.resolve("notas.txt"), "plain text".getBytes("UTF-8"))
    Files.write(dir.resolve("scan.pdf"), "%PDF-1.4 junk".getBytes("UTF-8"))
    Files.write(dir.resolve("bad.xlsx"), Array[Byte](1, 2, 3, 4))
    val got: Map[String, (Option[String], Option[String])] =
      DocumentIngest.ingest(spark, dir.toString)
        .collect().map(r => r.getString(0).split('/').last ->
          (Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(got("informe.docx")._1.contains("Hello world\nLine2"))
    assert(got("notas.txt")._1.contains("plain text"))
    assert(got("ventas.xlsx")._1.exists(_.contains("Row 1: hola | 42 | inline")))
    assert(got("deck.pptx")._1.exists(_.contains("Second slide")))
    // unsupported: null text, null error (the dispatcher's None)
    assert(got("scan.pdf") == (None, None))
    // corrupt: null text, error string — the batch survives
    assert(got("bad.xlsx")._1.isEmpty && got("bad.xlsx")._2.nonEmpty)
    // chunked stage shape
    val chunks = DocumentIngest.ingestChunks(spark, dir.toString, chunkSize = 8)
    assert(chunks.filter(col("path").endsWith("informe.docx")).count() >= 2)
    assert(chunks.select("chunk_idx").collect().map(_.getInt(0)).min == 0)
  }
}
