package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1

import scala.collection.mutable

/** Minimal public-spec PDF text extraction (ISO 32000), zero added
  * dependencies — the JDK's Inflater decodes Flate content streams and
  * the text shows are a small operator walk. The reference routes `.pdf`
  * through a page-walking text extractor
  * (utils/extract_data/aje_libs/documents/helpers/pdf_helper.py:15-34,
  * one text block per page joined by newlines); this is the same
  * operator-level extraction against the open spec:
  *
  *   - every `stream…endstream` object is located in the raw bytes
  *     (content streams are always top-level stream objects — the spec
  *     forbids streams inside object streams — so a raw scan finds them
  *     all without an xref walk);
  *   - `/FlateDecode` streams inflate through java.util.zip.Inflater;
  *     unfiltered streams pass through; other filters are skipped;
  *   - a decoded stream that contains a `BT` text block is walked for the
  *     text-showing operators `Tj`, `'`, `"` and `TJ` (literal `(…)`
  *     strings with the spec's escape set, `<hex>` strings), with
  *     newlines at the line-motion operators `Td`/`TD`/`T*` and at `ET`,
  *     and the common kern-to-space heuristic inside `TJ` arrays;
  *   - REFUSED to None, never faked: encrypted files (an `/Encrypt`
  *     entry outside stream data — string shows would need the doc's
  *     decryption key) and files with no text operators at all (scanned
  *     image-only PDFs).
  *
  * Out of scope, documented: multi-byte CID fonts' ToUnicode CMaps (hex
  * shows decode as single bytes), non-Flate filters, and glyph
  * positioning finer than the newline/kern heuristics — the same class
  * of approximation the reference's own extractor makes.
  */
object PdfText {

  /** Extracted text, or None for encrypted / text-free documents. */
  def extract(bytes: Array[Byte]): Option[String] = {
    val raw = new String(bytes, ISO_8859_1)
    if (!raw.startsWith("%PDF")) return None
    val streams = streamSpans(raw)
    if (isEncrypted(raw, streams)) return None
    val parts = mutable.ArrayBuffer[String]()
    streams.foreach { case StreamSpan(dict, from, until) =>
      val data = decode(dict, bytes, from, until)
      data.foreach { d =>
        val content = new String(d, ISO_8859_1)
        if (content.contains("BT")) {
          val t = showText(content)
          if (t.trim.nonEmpty) parts += t.trim
        }
      }
    }
    val out = parts.mkString("\n")
    if (out.trim.isEmpty) None else Some(out)
  }

  // ------------------------------------------------------------ streams

  private case class StreamSpan(dict: String, from: Int, until: Int)

  /** Locate every stream object's (dictionary slice, data byte range).
    * The dictionary slice runs from the nearest preceding `obj` keyword
    * (clamped to 2 KB) to the `stream` keyword — enough to read the
    * filter name without a full object parser. */
  private def streamSpans(raw: String): Seq[StreamSpan] = {
    val out = mutable.ArrayBuffer[StreamSpan]()
    var i = raw.indexOf("stream")
    while (i >= 0) {
      // the keyword, not a substring of `endstream`
      val standalone = i == 0 || !raw.charAt(i - 1).isLetter
      if (standalone) {
        // data starts after the keyword's EOL (spec: CRLF or LF)
        var s = i + "stream".length
        if (s < raw.length && raw.charAt(s) == '\r') s += 1
        if (s < raw.length && raw.charAt(s) == '\n') s += 1
        val e = raw.indexOf("endstream", s)
        if (e > s) {
          val objAt = raw.lastIndexOf("obj", i)
          val dictFrom = math.max(if (objAt < 0) 0 else objAt, i - 2048)
          // trailing EOL before endstream is not stream data
          var de = e
          if (de > s && raw.charAt(de - 1) == '\n') de -= 1
          if (de > s && raw.charAt(de - 1) == '\r') de -= 1
          out += StreamSpan(raw.substring(dictFrom, i), s, de)
          i = raw.indexOf("stream", e + 9)
        } else i = -1
      } else i = raw.indexOf("stream", i + 6)
    }
    out.toSeq
  }

  /** `/Encrypt` anywhere outside stream data ⇒ the strings and streams
    * are enciphered and a keyless extractor must refuse. */
  private def isEncrypted(raw: String, streams: Seq[StreamSpan]): Boolean = {
    var i = raw.indexOf("/Encrypt")
    while (i >= 0) {
      if (!streams.exists(s => i >= s.from && i < s.until)) return true
      i = raw.indexOf("/Encrypt", i + 8)
    }
    false
  }

  /** Cap on any single inflated stream (mirrors DocumentIngest's
    * zip-entry guard: a content stream is text, not a bomb). */
  val MaxStreamBytes: Int = 64 * 1024 * 1024

  private def decode(dict: String, bytes: Array[Byte],
                     from: Int, until: Int): Option[Array[Byte]] = {
    val hasFilter = dict.contains("/Filter")
    val flate = dict.contains("/FlateDecode") || dict.contains("/Fl ") ||
      dict.contains("/Fl/") || dict.contains("/Fl>")
    if (!hasFilter) Some(java.util.Arrays.copyOfRange(bytes, from, until))
    else if (flate && !dict.contains("[")) inflate(bytes, from, until)
    else if (flate && singleFilterArray(dict)) inflate(bytes, from, until)
    else None // other or chained filters: skip, never guess
  }

  /** `/Filter [/FlateDecode]` — a one-element array is still plain
    * Flate; real chains (e.g. ASCII85+Flate) are skipped. */
  private def singleFilterArray(dict: String): Boolean = {
    val i = dict.indexOf("/Filter")
    if (i < 0) return false
    val open = dict.indexOf('[', i)
    if (open < 0) return false
    val close = dict.indexOf(']', open)
    close > open &&
      dict.substring(open + 1, close).trim.matches("""/(FlateDecode|Fl)""")
  }

  private def inflate(bytes: Array[Byte], from: Int,
                      until: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(bytes, from, until - from)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) {
          out.write(buf, 0, n)
          require(out.size() <= MaxStreamBytes,
            s"PDF stream inflates past $MaxStreamBytes bytes")
        } else if (n == 0 && !inf.finished()) return None // truncated
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None // not really Flate
    } finally inf.end()
  }

  // ------------------------------------------------- content operators

  /** Kern values at or below this (thousandths of an em, negated in TJ
    * arrays) render as word gaps — the standard extraction heuristic. */
  val KernSpace: Double = 180.0

  /** Walk one decoded content stream for its text shows. */
  private[sources] def showText(content: String): String = {
    val sb = new StringBuilder
    def newline(): Unit =
      if (sb.nonEmpty && sb.last != '\n') sb.append('\n'): Unit
    var i = 0
    val n = content.length
    var lastString: String = null
    var inArray = false
    val arrayParts = mutable.ArrayBuffer[String]()
    var lastNum = 0.0
    var numValid = false
    while (i < n) {
      val c = content.charAt(i)
      c match {
        case '%' => // comment to EOL
          while (i < n && content.charAt(i) != '\n' && content.charAt(i) != '\r')
            i += 1
        case '(' =>
          val (s, next) = literalString(content, i)
          if (inArray) arrayParts += s else lastString = s
          i = next
        case '<' if i + 1 < n && content.charAt(i + 1) == '<' =>
          i += 2 // dict open — no strings start here
        case '<' =>
          val (s, next) = hexString(content, i)
          if (inArray) arrayParts += s else lastString = s
          i = next
        case '[' =>
          inArray = true; arrayParts.clear(); i += 1
        case ']' =>
          inArray = false; i += 1
        case '\'' =>
          newline()
          if (lastString != null) sb.append(lastString): Unit
          lastString = null; i += 1
        case '"' =>
          newline()
          if (lastString != null) sb.append(lastString): Unit
          lastString = null; i += 1
        case _ if c.isDigit || c == '+' || c == '-' || c == '.' =>
          val st = i
          i += 1
          while (i < n && (content.charAt(i).isDigit || content.charAt(i) == '.'))
            i += 1
          try { lastNum = content.substring(st, i).toDouble; numValid = true }
          catch { case _: NumberFormatException => numValid = false }
          // a kern deep enough reads as a word gap
          if (inArray && numValid && lastNum <= -KernSpace)
            arrayParts += " "
        case _ if c.isLetter || c == '*' =>
          val st = i
          i += 1
          while (i < n && (content.charAt(i).isLetterOrDigit ||
            content.charAt(i) == '*')) i += 1
          content.substring(st, i) match {
            case "Tj" =>
              if (lastString != null) sb.append(lastString): Unit
              lastString = null
            case "TJ" =>
              arrayParts.foreach(sb.append(_))
              arrayParts.clear()
            case "Td" | "TD" | "T*" => newline()
            case "ET" => newline()
            case _ => ()
          }
        case _ => i += 1
      }
    }
    sb.toString
  }

  /** `(…)` literal string: nested parens balance; the spec's escapes. */
  private def literalString(content: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    val n = content.length
    while (i < n && depth > 0) {
      content.charAt(i) match {
        case '\\' if i + 1 < n =>
          content.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\r' => // line continuation
              i += 2; if (i < n && content.charAt(i) == '\n') i += 1
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; i += 1
              while (k < 3 && i < n && content.charAt(i) >= '0' &&
                content.charAt(i) <= '7') {
                v = v * 8 + (content.charAt(i) - '0'); i += 1; k += 1
              }
              sb.append((v & 0xff).toChar): Unit
            case other => sb.append(other); i += 2 // spec: drop the backslash
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case ch => sb.append(ch); i += 1
      }
    }
    (sb.toString, i)
  }

  /** `<hex>` string: whitespace ignored, odd final digit padded with 0.
    * Bytes read as single-byte chars (CID/multi-byte fonts out of
    * scope — see object doc). */
  private def hexString(content: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    val n = content.length
    var hi = -1
    while (i < n && content.charAt(i) != '>') {
      val c = content.charAt(i)
      val d = Character.digit(c, 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { sb.append(((hi << 4) | d).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar): Unit
    (sb.toString, if (i < n) i + 1 else i)
  }
}
