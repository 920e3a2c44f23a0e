package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Office-document ingestion into the stage layer — the reference lake's
  * extraction utility reads spreadsheets/documents and lands their text
  * (reference: utils/extract_data/aje_libs/documents/helpers/
  * document_processor.py + xls_helper.py: dispatch on extension, extract
  * text per format, spreadsheets rendered as "Sheet: name / Row N:
  * a | b | c", then word-accumulated chunking).
  *
  * Spark-first shape: the OOXML family (xlsx/docx/pptx) is ZIP + XML, so
  * the JDK's ZipInputStream + StAX decode them with ZERO added
  * dependencies, inside a `binaryFile`-source mapPartitions — each
  * executor parses its own files, the driver never touches bytes, and a
  * million-document corpus is just a bigger file listing. PDF decodes
  * through [[PdfText]] (public ISO 32000 subset: Flate content streams +
  * text-show operators); encrypted and image-only PDFs refuse to None —
  * the dispatcher's "unsupported → None" contract, never a fake decode.
  *
  * Parsing is defensive, not trusting: entity resolution is disabled
  * (no XXE), entry sizes are capped (no zip bombs), and junk bytes
  * produce a per-document null + error string, never a task failure —
  * one corrupt file in a 100 TB ingest must not kill the batch.
  */
object DocumentIngest {

  /** Max bytes any single zip entry may inflate to (zip-bomb guard). */
  val MaxEntryBytes: Int = 64 * 1024 * 1024

  /** Max TOTAL inflated bytes across kept entries — a many-entry archive
    * must not exhaust executor memory even if each entry clears the
    * per-entry cap. */
  val MaxTotalBytes: Long = 256L * 1024 * 1024

  /** Max kept-entry count (same many-small-entries bomb, by count). */
  val MaxEntries: Int = 4096

  def extension(path: String): String = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val i = name.lastIndexOf('.')
    if (i < 0) "" else name.substring(i + 1).toLowerCase
  }

  // ------------------------------------------------------------- zip/xml

  /** Inflate the archive's entries, materializing ONLY those `keep`
    * admits (each format reads a fixed handful of XML parts — embedded
    * media and foreign entries are never buffered), under three bomb
    * guards: per-entry bytes, total kept bytes, kept-entry count.
    * Skipped entries cost only the stream skip, not an allocation. */
  private def zipEntries(bytes: Array[Byte],
                         keep: String => Boolean): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.LinkedHashMap[String, Array[Byte]]()
    val buf = new Array[Byte](64 * 1024)
    var total = 0L
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory && keep(e.getName)) {
        require(out.size < MaxEntries,
          s"archive holds more than $MaxEntries kept entries")
        val bos = new java.io.ByteArrayOutputStream()
        var n = zis.read(buf)
        while (n >= 0) {
          bos.write(buf, 0, n)
          require(bos.size() <= MaxEntryBytes,
            s"zip entry ${e.getName} exceeds $MaxEntryBytes bytes")
          require(total + bos.size() <= MaxTotalBytes,
            s"archive inflates past $MaxTotalBytes total bytes")
          n = zis.read(buf)
        }
        total += bos.size()
        out(e.getName) = bos.toByteArray
      }
      e = zis.getNextEntry
    }
    out.toMap
  }

  /** xlsx keeps the workbook, its rels, shared strings, and any XML part
    * under xl/ a sheet relationship may point at — never xl/media. */
  private val keepXlsx: String => Boolean = name =>
    name == "xl/workbook.xml" || name == "xl/_rels/workbook.xml.rels" ||
      name == "xl/sharedStrings.xml" ||
      (name.startsWith("xl/") && !name.startsWith("xl/media/") &&
        name.endsWith(".xml"))

  private val keepDocx: String => Boolean = _ == "word/document.xml"

  private val SlideName = """ppt/slides/slide(\d+)\.xml""".r

  private val keepPptx: String => Boolean = name =>
    SlideName.pattern.matcher(name).matches()

  private def xmlReader(bytes: Array[Byte]) = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    // no DTDs, no external entities: document content only
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** Concatenate the character content of every `textTag` element,
    * inserting `break` at each `breakTag` element end. */
  private def collectText(bytes: Array[Byte], textTag: String,
                          breakTag: String, break: String): String = {
    val r = xmlReader(bytes)
    val sb = new StringBuilder
    var inText = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == textTag) inText = true
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == textTag) inText = false
          else if (r.getLocalName == breakTag) sb.append(break)
        case javax.xml.stream.XMLStreamConstants.CHARACTERS |
             javax.xml.stream.XMLStreamConstants.CDATA =>
          if (inText) sb.append(r.getText): Unit
        case _ => ()
      }
    }
    r.close()
    sb.toString
  }

  // --------------------------------------------------------------- xlsx

  /** "A1" / "BC23" → zero-based column index. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    c - 1
  }

  /** Shared-strings table: one entry per <si>, runs concatenated. */
  private def sharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = xmlReader(bytes)
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur.clear()
            case "t"  => inT = true
            case _    => ()
          }
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += cur.toString
            case "t"  => inT = false
            case _    => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS |
             javax.xml.stream.XMLStreamConstants.CDATA =>
          if (inT) cur.append(r.getText): Unit
        case _ => ()
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** One worksheet → rows of nullable cell strings (shared strings
    * resolved, inline strings and raw numeric/boolean values as stored).
    * Rows that are entirely empty are dropped — the reference's
    * `any(cell is not None)` filter. */
  private def sheetRows(bytes: Array[Byte],
                        shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val r = xmlReader(bytes)
    val rows = mutable.ArrayBuffer[Seq[String]]()
    var row: mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIs = false
    val v = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer[String]()
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(if (row == null) 0 else row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              v.clear()
            case "v" => inV = true
            case "is" => inIs = true
            case "t" if inIs => inV = true
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              if (row != null && row.exists(_ != null)) rows += row.toSeq
              row = null
            case "c" =>
              if (row != null && v.nonEmpty) {
                val value = cellType match {
                  case "s" =>
                    val i = v.toString.trim.toInt
                    if (i >= 0 && i < shared.length) shared(i) else ""
                  case "b" => if (v.toString.trim == "1") "true" else "false"
                  case _   => v.toString
                }
                while (row.length <= cellCol) row += null
                row(cellCol) = value
              }
              v.clear(); cellType = ""
            case "v" => inV = false
            case "is" => inIs = false
            case "t" => if (inIs) inV = false
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS |
             javax.xml.stream.XMLStreamConstants.CDATA =>
          if (inV) v.append(r.getText): Unit
        case _ => ()
      }
    }
    r.close()
    rows.toSeq
  }

  /** Workbook sheet names in document order, resolved to their part
    * paths through the relationship file (sheet file names are NOT
    * contractual — writers may reorder them). */
  private def sheetTargets(entries: Map[String, Array[Byte]]): Seq[(String, String)] = {
    val rels: Map[String, String] = entries.get("xl/_rels/workbook.xml.rels")
      .map { b =>
        val r = xmlReader(b)
        val out = mutable.Map[String, String]()
        while (r.hasNext) {
          if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship") {
            val id = r.getAttributeValue(null, "Id")
            val tgt = r.getAttributeValue(null, "Target")
            if (id != null && tgt != null) out(id) = tgt
          }
        }
        r.close(); out.toMap
      }.getOrElse(Map.empty)
    val wb = entries.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an xlsx: no xl/workbook.xml"))
    val r = xmlReader(wb)
    val out = mutable.ArrayBuffer[(String, String)]()
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
        val name = Option(r.getAttributeValue(null, "name")).getOrElse("")
        val rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue).orNull
        val target = Option(rid).flatMap(rels.get)
          .map(t => if (t.startsWith("/")) t.drop(1) else s"xl/$t")
          .getOrElse(s"xl/worksheets/sheet${out.length + 1}.xml")
        out += (name -> target)
      }
    }
    r.close()
    out.toSeq
  }

  /** All sheets of an xlsx: (sheetName, rows). */
  def xlsxSheets(bytes: Array[Byte]): Seq[(String, Seq[Seq[String]])] = {
    val entries = zipEntries(bytes, keepXlsx)
    val shared = entries.get("xl/sharedStrings.xml")
      .map(sharedStrings).getOrElse(IndexedSeq.empty)
    sheetTargets(entries).map { case (name, target) =>
      name -> entries.get(target).map(sheetRows(_, shared)).getOrElse(Nil)
    }
  }

  /** The reference's spreadsheet-to-text rendering: "Sheet: name", then
    * "Row N: a | b | c" per non-empty row, blank line between sheets
    * (document_processor.py process_excel_to_text). */
  def xlsxToText(bytes: Array[Byte]): String = {
    val parts = mutable.ArrayBuffer[String]()
    xlsxSheets(bytes).foreach { case (name, rows) =>
      parts += s"Sheet: $name"
      rows.zipWithIndex.foreach { case (row, i) =>
        parts += s"Row ${i + 1}: " +
          row.map(c => if (c == null) "" else c).mkString(" | ")
      }
      parts += ""
    }
    parts.mkString("\n")
  }

  /** docx body text: w:t runs concatenated, paragraph breaks as \n. */
  def docxText(bytes: Array[Byte]): String = {
    val entries = zipEntries(bytes, keepDocx)
    val doc = entries.getOrElse("word/document.xml",
      throw new IllegalArgumentException("not a docx: no word/document.xml"))
    collectText(doc, "t", "p", "\n").trim
  }

  /** pptx slide text in slide order: a:t runs, paragraph breaks as \n,
    * blank line between slides. */
  def pptxText(bytes: Array[Byte]): String = {
    val entries = zipEntries(bytes, keepPptx)
    val slides = entries.keys.flatMap {
      case k @ SlideName(n) => Some(n.toInt -> k)
      case _ => None
    }.toSeq.sortBy(_._1)
    slides.map { case (_, k) => collectText(entries(k), "t", "p", "\n").trim }
      .mkString("\n\n")
  }

  /** Extension dispatch, the document_processor contract: supported
    * formats decode, unsupported return None. */
  def extractText(path: String, bytes: Array[Byte]): Option[String] =
    extension(path) match {
      case "xlsx" => Some(xlsxToText(bytes))
      case "docx" => Some(docxText(bytes))
      case "pptx" => Some(pptxText(bytes))
      case "txt" | "md" => Some(new String(bytes, "UTF-8"))
      // minimal public-spec reader: Flate content streams + text-show
      // operators; encrypted/scanned/undecodable-CID refuse to None
      case "pdf" => PdfText.extract(bytes)
      // legacy binary Excel: CFB container + BIFF8 records (XlsText);
      // encrypted workbooks and junk bytes throw -> the error row
      case "xls" => Some(XlsText.toText(bytes))
      // legacy binary Word: FIB + piece table (DocText); encrypted
      // documents and junk bytes throw -> the error row
      case "doc" => Some(DocText.extract(bytes))
      // legacy binary PowerPoint: record-tree walk over the CFB
      // container (PptText); encrypted decks and junk throw -> error row
      case "ppt" => Some(PptText.extract(bytes))
      case _ => None
    }

  /** The reference's word-accumulating chunker: words pack into chunks
    * until the running size (word lengths + separating spaces) reaches
    * `chunkSize` (document_processor.py process_by_chunks). */
  def chunkWords(text: String, chunkSize: Int = 1000): Seq[String] = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    val chunks = mutable.ArrayBuffer[String]()
    val cur = mutable.ArrayBuffer[String]()
    var size = 0
    words.foreach { w =>
      cur += w
      size += w.length + 1
      if (size >= chunkSize) {
        chunks += cur.mkString(" ")
        cur.clear(); size = 0
      }
    }
    if (cur.nonEmpty) chunks += cur.mkString(" ")
    chunks.toSeq
  }

  // ------------------------------------------------------------ ingest

  /** Distributed ingest: every file under `dir` (recursively) decoded on
    * the executors → (path, ext, text, error). Unsupported formats keep
    * text null with a null error (the dispatcher's None); corrupt files
    * keep text null and carry the error string — the batch never dies on
    * one bad document. */
  def ingest(spark: SparkSession, dir: String,
             glob: String = "*"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (path, bytes) =>
        val ext = extension(path)
        try {
          val t = extractText(path, bytes)
          (path, ext, t.orNull, null: String)
        } catch {
          case e: Throwable =>
            (path, ext, null: String,
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      }).toDF("path", "ext", "text", "error")
  }

  /** The canonical chunk grain over any (path, text) frame — ONE
    * implementation of the chunk law, shared by [[ingestChunks]] and
    * the stage layer (CorpusPipeline.ingestStage), so chunk boundaries
    * and word counts can never drift between the two landings. */
  def chunkFrame(docs: DataFrame, chunkSize: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("text").isNotNull)
      .select(col("path"), col("text"))
      .as[(String, String)]
      .flatMap { case (path, text) =>
        chunkWords(text, chunkSize).zipWithIndex.map {
          case (c, i) => (path, i, c.split(" ").length, c)
        }
      }.toDF("path", "idx_chunk", "n_palabras_chunk", "texto_chunk")
  }

  /** Ingest + chunk: one row per (document, chunk_idx), the shape the
    * stage layer lands for the downstream text pipeline. */
  def ingestChunks(spark: SparkSession, dir: String,
                   chunkSize: Int = 1000): DataFrame =
    chunkFrame(ingest(spark, dir), chunkSize)
      .select(col("path"), col("idx_chunk").as("chunk_idx"),
        col("texto_chunk").as("chunk"))
}
