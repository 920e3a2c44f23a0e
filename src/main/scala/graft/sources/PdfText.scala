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
  * Composite (Type0/CID) fonts — the dominant encoding in modern PDFs —
  * show 2-byte CIDs, so reading their hex shows as single bytes would
  * emit plausible-looking MOJIBAKE, the one failure mode worse than
  * refusing. The dispatcher contract is fail-SAFE: when Type0/CIDFont
  * resources are present, hex shows decode through the document's
  * ToUnicode CMap (bfchar/bfrange → UTF-16BE, the Identity-H + CMap
  * case every mainstream generator emits), and a document whose CMaps
  * are absent, conflicting, or do not cover a shown code REFUSES to
  * None — never garbage text.
  *
  * Out of scope, documented: non-Flate filters, CID literal-string
  * shows (refused via the same guard), and glyph positioning finer
  * than the newline/kern heuristics — the same class of approximation
  * the reference's own extractor makes.
  */
object PdfText {

  /** Extracted text, or None for encrypted / text-free / undecodable-CID
    * documents. */
  def extract(bytes: Array[Byte]): Option[String] = {
    val raw = new String(bytes, ISO_8859_1)
    if (!raw.startsWith("%PDF")) return None
    val streams = streamSpans(raw)
    if (isEncrypted(raw, streams)) return None
    val decoded = streams.map { case s @ StreamSpan(dict, from, until) =>
      (s, decode(dict, bytes, from, until).map(new String(_, ISO_8859_1)))
    }
    // Type0/CID fonts anywhere (raw object space or inside decoded object
    // streams) switch hex shows from byte-chars to CMap decoding
    val cid = hasCidFonts(raw, streams) ||
      decoded.exists(_._2.exists(c => containsToken(c, "/Type0") ||
        containsToken(c, "/CIDFont")))
    val cmap: Option[Map[Int, String]] =
      if (!cid) None
      else mergedToUnicode(decoded.flatMap(_._2)) match {
        case Some(m) => Some(m)
        case None => return None // CID fonts but no usable CMap: refuse
      }
    val parts = mutable.ArrayBuffer[String]()
    decoded.foreach { case (_, data) =>
      data.foreach { content =>
        if (content.contains("BT") && !content.contains("begincmap")) {
          showText(content, cmap) match {
            case None => return None // a show the CMap cannot decode
            case Some(t) => if (t.trim.nonEmpty) parts += t.trim
          }
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

  /** `/Type0` or `/CIDFont…` font resources outside stream data — the
    * same raw-scan shape as [[isEncrypted]]. */
  private def hasCidFonts(raw: String, streams: Seq[StreamSpan]): Boolean =
    Seq("/Type0", "/CIDFont").exists { tok =>
      var i = raw.indexOf(tok)
      var found = false
      while (i >= 0 && !found) {
        if (!streams.exists(s => i >= s.from && i < s.until) &&
          tokenEndsAt(raw, i + tok.length)) found = true
        i = raw.indexOf(tok, i + tok.length)
      }
      found
    }

  /** Token check against a decoded stream body (object streams carry the
    * font dictionaries as plain text after inflation). */
  private def containsToken(content: String, tok: String): Boolean = {
    var i = content.indexOf(tok)
    while (i >= 0) {
      if (tokenEndsAt(content, i + tok.length)) return true
      i = content.indexOf(tok, i + tok.length)
    }
    false
  }

  /** A name token ends where a delimiter or EOF follows — so `/Type0`
    * never matches inside a longer name. `/CIDFont` is a deliberate
    * prefix match for /CIDFontType0 and /CIDFontType2. */
  private def tokenEndsAt(s: String, end: Int): Boolean =
    end >= s.length || {
      val c = s.charAt(end)
      !c.isLetterOrDigit || s.startsWith("Type", end)
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

  /** Single-byte-font walk (no CID fonts present): total, never refuses. */
  private[sources] def showText(content: String): String =
    showText(content, None).get

  /** Walk one decoded content stream for its text shows. With a ToUnicode
    * `cmap` (CID fonts present), hex shows decode as 2-byte codes through
    * it and the walk REFUSES (None) on any show the map cannot decode —
    * under a composite font a byte-wise read would be mojibake, and
    * garbage text entering a corpus silently is the one unacceptable
    * outcome. Literal shows under a CID document are kept only when they
    * read as plain single-byte text (see [[literalLooksSingleByte]]). */
  private[sources] def showText(content: String,
                                cmap: Option[Map[Int, String]]): Option[String] = {
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
          val (s0, next) = literalString(content, i)
          val s = cmap match {
            case Some(_) if !literalLooksSingleByte(s0) => return None
            // Ambiguity guard: if the merged ToUnicode map can ALSO read
            // this literal's byte pairs as 2-byte CIDs (e.g. 0x4142 maps,
            // yet the bytes print as "AB"), the single-byte reading is a
            // guess — and a wrong guess is silent mojibake. Refuse.
            case Some(m) if decodeCid(s0, m).isDefined => return None
            case _ => s0
          }
          if (inArray) arrayParts += s else lastString = s
          i = next
        case '<' if i + 1 < n && content.charAt(i + 1) == '<' =>
          i += 2 // dict open — no strings start here
        case '<' =>
          val (raw, next) = hexString(content, i)
          val s = cmap match {
            case Some(m) => decodeCid(raw, m) match {
              case Some(t) => t
              case None => return None
            }
            case None => raw
          }
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
    Some(sb.toString)
  }

  // ------------------------------------------------ CID / ToUnicode CMaps

  /** A literal show that is plausibly simple-font text: printable Latin-1
    * or ordinary whitespace. Control/undefined bytes under a CID document
    * mean the literal is really 2-byte codes — refuse rather than guess. */
  private def literalLooksSingleByte(s: String): Boolean =
    s.forall(c => c >= 0x20 && c != 0x7f || c == '\n' || c == '\r' || c == '\t')

  /** Decode a hex show's raw byte-chars as big-endian 2-byte codes through
    * the ToUnicode map. None on an odd byte count or an unmapped code. */
  private def decodeCid(raw: String, m: Map[Int, String]): Option[String] = {
    if (raw.length % 2 != 0) return None
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val code = (raw.charAt(i) << 8) | raw.charAt(i + 1)
      m.get(code) match {
        case Some(t) => sb.append(t)
        case None => return None
      }
      i += 2
    }
    Some(sb.toString)
  }

  /** Cap on merged CMap size: 2-byte codes cannot exceed 65536 entries. */
  val MaxCMapEntries: Int = 65536

  /** Collect every ToUnicode CMap among the decoded streams and merge
    * them. None when no CMap parses, any CMap is unsupported (non-2-byte
    * codes), or two CMaps disagree on a code (without an xref walk a show
    * cannot be attributed to a font, so only a CONSISTENT union is safe). */
  private[sources] def mergedToUnicode(contents: Seq[String]): Option[Map[Int, String]] = {
    val cmapStreams = contents.filter(c => c.contains("begincmap") &&
      (c.contains("beginbfchar") || c.contains("beginbfrange")))
    if (cmapStreams.isEmpty) return None
    val merged = mutable.HashMap[Int, String]()
    cmapStreams.foreach { c =>
      parseToUnicode(c) match {
        case None => return None // a CMap exists but cannot be read: refuse
        case Some(m) => m.foreach { case (k, v) =>
          merged.get(k) match {
            case Some(prev) if prev != v => return None // ambiguous code
            case _ => merged(k) = v
          }
        }
      }
    }
    if (merged.isEmpty) None else Some(merged.toMap)
  }

  /** Parse one ToUnicode CMap stream's bfchar/bfrange sections (ISO 32000
    * 9.10.3 / Adobe CMap spec): `<src> <dstUtf16BE>` pairs and
    * `<lo> <hi> <dstStart>` / `<lo> <hi> [<d0> <d1> …]` ranges. Source
    * codes must be 2 bytes (the Identity-H norm); anything else is
    * unsupported → None. */
  private def parseToUnicode(content: String): Option[Map[Int, String]] = {
    val out = mutable.HashMap[Int, String]()
    def utf16(hex: String): String = {
      val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    val hexTok = """<([0-9A-Fa-f\s]*)>""".r
    def hexes(span: String): Seq[String] =
      hexTok.findAllMatchIn(span).map(_.group(1).replaceAll("\\s", "")).toSeq
    try {
      // bfchar: pairs
      for (span <- sections(content, "beginbfchar", "endbfchar")) {
        val toks = hexes(span)
        if (toks.length % 2 != 0) return None
        toks.grouped(2).foreach { case Seq(src, dst) =>
          if (src.length != 4) return None
          out(Integer.parseInt(src, 16)) = utf16(dst)
        }
      }
      // bfrange: triples, third element a hex or a [ … ] array
      for (span <- sections(content, "beginbfrange", "endbfrange")) {
        var rest = span.trim
        while (rest.nonEmpty) {
          val m1 = hexTok.findFirstMatchIn(rest).getOrElse(return None)
          val lo0 = m1.group(1).replaceAll("\\s", "")
          rest = rest.substring(m1.end).trim
          val m2 = hexTok.findFirstMatchIn(rest).getOrElse(return None)
          val hi0 = m2.group(1).replaceAll("\\s", "")
          rest = rest.substring(m2.end).trim
          if (lo0.length != 4 || hi0.length != 4) return None
          val lo = Integer.parseInt(lo0, 16)
          val hi = Integer.parseInt(hi0, 16)
          if (hi < lo || out.size + (hi - lo + 1) > MaxCMapEntries) return None
          if (rest.startsWith("[")) {
            val close = rest.indexOf(']')
            if (close < 0) return None
            val dsts = hexes(rest.substring(1, close))
            if (dsts.length != hi - lo + 1) return None
            (lo to hi).zip(dsts).foreach { case (k, d) => out(k) = utf16(d) }
            rest = rest.substring(close + 1).trim
          } else {
            val m3 = hexTok.findFirstMatchIn(rest).getOrElse(return None)
            val d0 = m3.group(1).replaceAll("\\s", "")
            rest = rest.substring(m3.end).trim
            // dstStart increments its LAST code unit across the range
            val base = utf16(d0)
            if (base.isEmpty) return None
            (lo to hi).foreach { k =>
              val off = k - lo
              out(k) = base.dropRight(1) + (base.last + off).toChar
            }
          }
        }
      }
    } catch { case _: NumberFormatException => return None }
    if (out.isEmpty) None else Some(out.toMap)
  }

  /** The body spans of every `begin… / end…` section pair, in order. */
  private def sections(content: String, begin: String, end: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    var i = content.indexOf(begin)
    while (i >= 0) {
      val e = content.indexOf(end, i + begin.length)
      if (e < 0) return out.toSeq
      out += content.substring(i + begin.length, e)
      i = content.indexOf(begin, e + end.length)
    }
    out.toSeq
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
    * Returns the raw bytes as chars; the caller maps them byte-wise
    * (simple fonts) or as 2-byte CIDs through the ToUnicode CMap. */
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
