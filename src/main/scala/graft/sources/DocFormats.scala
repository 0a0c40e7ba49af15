package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater, ZipEntry, ZipInputStream, ZipOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Dependency-free PDF and DOCX codecs (SURVEY §2.1 S2/S3).
  *
  * The reference extracts PDF text page-wise joined by "\n\n"
  * (`document_processing_service.py:40-58`, PyMuPDF `page.get_text`)
  * and DOCX text paragraph-wise joined by "\n" (`:60-76`,
  * python-docx `para.text`), stripping the final result; extraction
  * failure maps to a PROCESSING_ERROR status (`:146-193`). No
  * PDF/DOCX library ships in this container, so both formats are
  * parsed directly — the JDK has everything required: `Inflater` for
  * /FlateDecode content streams, `ZipInputStream` + StAX for the
  * OOXML container.
  *
  * Readers handle the general structures: nested page trees, direct
  * object refs, multi-stream /Contents arrays, Tj/TJ/'/" show
  * operators, escaped literal + hex strings, and w:t/w:tab/w:br/w:cr
  * runs. Out of scope (raise → PROCESSING_ERROR downstream):
  * encrypted PDFs, cross-reference streams with object streams,
  * non-Latin font encodings with /ToUnicode CMaps.
  *
  * Writers emit minimal standard-conforming files and exist so the
  * extraction path can be proven by deterministic round-trip oracles
  * (`s2_pdf_roundtrip` / `s3_docx_roundtrip`) and by specs over real
  * fixture files; they double as S10-style export sinks. All output
  * is byte-deterministic (fixed zip timestamps, fixed deflate level)
  * so the round-trip queries hash identically across runs.
  */
object DocFormats {

  // ------------------------------------------------------------------
  // shared flate helpers
  // ------------------------------------------------------------------

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 4 + 64)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput())
        throw new java.util.zip.DataFormatException("truncated flate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // PDF writer
  // ------------------------------------------------------------------

  private def escPdf(t: String): String = t.flatMap {
    case '('  => "\\("
    case ')'  => "\\)"
    case '\\' => "\\\\"
    case c    => c.toString
  }

  /** Minimal one-text-line-per-page PDF: catalog → pages → page/content
    * pairs, Helvetica, Flate-compressed streams, correct xref. */
  def writePdf(pages: Seq[String]): Array[Byte] = {
    val out = new ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = ArrayBuffer.empty[Int] // offset of object i+1
    def obj(num: Int)(body: => Unit): Unit = {
      offsets += out.size(); w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    val kids = pages.indices.map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(2)(w(s"<< /Type /Pages /Kids [$kids] /Count ${pages.size} >>\n"))
    obj(3)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 4 + 2 * i
      val contNum = pageNum + 1
      obj(pageNum)(w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contNum 0 R >>\n"))
      val stream = deflate(
        s"BT /F1 12 Tf 72 720 Td (${escPdf(text)}) Tj ET".getBytes(ISO_8859_1))
      obj(contNum) {
        w(s"<< /Length ${stream.length} /Filter /FlateDecode >>\nstream\n")
        out.write(stream)
        w("\nendstream\n")
      }
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // PDF reader
  // ------------------------------------------------------------------

  private val ObjHeader = """(?s)(\d+)\s+\d+\s+obj\b""".r
  private val Ref = """(\d+)\s+0\s+R""".r

  /** S2 — extract text from a PDF: pages in page-tree order, each
    * page's shown text lines joined "\n", pages joined "\n\n", result
    * stripped (the reference's PyMuPDF contract). */
  def extractPdf(bytes: Array[Byte]): String = {
    // Latin-1 decode is 1:1 byte↔char, so string offsets == byte offsets.
    val s = new String(bytes, ISO_8859_1)
    require(s.startsWith("%PDF"), "not a PDF (missing %PDF header)")
    // Object bodies: header → next header (binary streams may contain
    // 'endobj' bytes, object headers are a far rarer collision).
    val heads = ObjHeader.findAllMatchIn(s).map(m => (m.group(1).toInt, m.end, m.start)).toVector
    val objBody: Map[Int, String] = heads.zipWithIndex.map { case ((num, bodyStart, _), i) =>
      val end = if (i + 1 < heads.size) heads(i + 1)._3 else s.length
      num -> s.substring(bodyStart, end)
    }.toMap
    def dictOf(body: String): String = {
      val st = body.indexOf("<<")
      if (st < 0) return ""
      var depth = 0; var i = st
      while (i < body.length - 1) {
        if (body.startsWith("<<", i)) { depth += 1; i += 2 }
        else if (body.startsWith(">>", i)) {
          depth -= 1; i += 2; if (depth == 0) return body.substring(st, i)
        } else i += 1
      }
      body.substring(st)
    }
    val root = objBody.collectFirst {
      case (_, b) if dictOf(b).contains("/Catalog") =>
        Ref.findFirstMatchIn(dictOf(b).substring(dictOf(b).indexOf("/Pages"))) match {
          case Some(m) => m.group(1).toInt
          case None => throw new IllegalArgumentException("catalog without /Pages ref")
        }
    }.orElse(objBody.collectFirst {
      case (n, b) if """/Type\s*/Pages""".r.findFirstIn(dictOf(b)).isDefined => n
    }).getOrElse(throw new IllegalArgumentException("no /Catalog or /Pages object"))

    val PageType = """/Type\s*/Page(?!s)""".r
    def pagesOf(num: Int): Vector[Int] = {
      val d = dictOf(objBody.getOrElse(num,
        throw new IllegalArgumentException(s"dangling page ref $num")))
      if (PageType.findFirstIn(d).isDefined) Vector(num)
      else {
        val kidsAt = d.indexOf("/Kids")
        if (kidsAt < 0) Vector.empty
        else {
          val arrEnd = d.indexOf(']', kidsAt)
          Ref.findAllMatchIn(d.substring(kidsAt, if (arrEnd < 0) d.length else arrEnd))
            .map(_.group(1).toInt).toVector.flatMap(pagesOf)
        }
      }
    }

    def streamData(num: Int): Array[Byte] = {
      val body = objBody.getOrElse(num,
        throw new IllegalArgumentException(s"dangling contents ref $num"))
      val d = dictOf(body)
      val sAt = body.indexOf("stream", d.length max 0)
      if (sAt < 0) return Array.emptyByteArray
      var dataStart = sAt + "stream".length
      if (body.startsWith("\r\n", dataStart)) dataStart += 2
      else if (body.startsWith("\n", dataStart)) dataStart += 1
      val len = """/Length\s+(\d+)""".r.findFirstMatchIn(d).map(_.group(1).toInt)
      val dataEnd = len match {
        case Some(l) if dataStart + l <= body.length => dataStart + l
        case _ =>
          val e = body.lastIndexOf("endstream")
          if (e < 0) body.length else e
      }
      val raw = body.substring(dataStart, dataEnd).getBytes(ISO_8859_1)
      if (d.contains("/FlateDecode")) inflate(raw) else raw
    }

    def contentsOf(num: Int): Array[Byte] = {
      val d = dictOf(objBody(num))
      val cAt = d.indexOf("/Contents")
      if (cAt < 0) return Array.emptyByteArray
      val tail = d.substring(cAt)
      // Array form takes every ref inside the brackets; scalar form
      // takes ONLY the first ref (later refs in the dict belong to
      // other keys, e.g. /Resources fonts).
      val refs =
        if (tail.drop("/Contents".length).trim.startsWith("["))
          Ref.findAllMatchIn(tail.substring(0, tail.indexOf(']') + 1))
            .map(_.group(1).toInt).toVector
        else Ref.findFirstMatchIn(tail).map(_.group(1).toInt).toVector
      refs.map(streamData).foldLeft(Array.emptyByteArray)(_ ++ _)
    }

    val pageTexts = pagesOf(root).map(p => contentStreamText(new String(contentsOf(p), ISO_8859_1)))
    pageTexts.mkString("\n\n").trim
  }

  /** Shown text of one content stream: Tj/TJ/quote operators
    * accumulate strings on the current line; Td, TD, T-star and the
    * quote operators' implicit line moves start a new line. */
  private[sources] def contentStreamText(c: String): String = {
    val lines = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    val pending = ArrayBuffer.empty[String]
    def newline(): Unit = if (cur.nonEmpty) { lines += cur.toString; cur.setLength(0) }
    var i = 0
    def parseLiteral(): String = { // at '(' on entry
      val sb = new StringBuilder; var depth = 1; i += 1
      while (i < c.length && depth > 0) {
        c.charAt(i) match {
          case '\\' if i + 1 < c.length =>
            c.charAt(i + 1) match {
              case 'n' => sb += '\n'; i += 2
              case 'r' => sb += '\r'; i += 2
              case 't' => sb += '\t'; i += 2
              case 'b' => sb += '\b'; i += 2
              case 'f' => sb += '\f'; i += 2
              case '\n' => i += 2 // line continuation
              case '\r' => i += (if (i + 2 < c.length && c.charAt(i + 2) == '\n') 3 else 2)
              case d if d >= '0' && d <= '7' =>
                var v = 0; var n = 0; i += 1
                while (n < 3 && i < c.length && c.charAt(i) >= '0' && c.charAt(i) <= '7') {
                  v = v * 8 + (c.charAt(i) - '0'); i += 1; n += 1
                }
                sb += v.toChar
              case other => sb += other; i += 2
            }
          case '(' => depth += 1; sb += '('; i += 1
          case ')' => depth -= 1; if (depth > 0) sb += ')'; i += 1
          case ch => sb += ch; i += 1
        }
      }
      sb.toString
    }
    def parseHex(): String = { // at '<' on entry (not '<<')
      val sb = new StringBuilder; i += 1
      val hx = new StringBuilder
      while (i < c.length && c.charAt(i) != '>') {
        val ch = c.charAt(i)
        if (Character.digit(ch, 16) >= 0) hx += ch
        i += 1
      }
      i += 1
      if (hx.length % 2 == 1) hx += '0'
      hx.toString.grouped(2).foreach(h => sb += Integer.parseInt(h, 16).toChar)
      sb.toString
    }
    while (i < c.length) {
      val ch = c.charAt(i)
      if (ch == '(') pending += parseLiteral()
      else if (ch == '<' && i + 1 < c.length && c.charAt(i + 1) != '<') pending += parseHex()
      else if (ch == '%') { while (i < c.length && c.charAt(i) != '\n') i += 1 }
      else if (ch == '\'' || ch == '"') {
        newline(); if (pending.nonEmpty) cur ++= pending.last
        pending.clear(); i += 1
      } else if (Character.isLetter(ch) || ch == '*') {
        val st = i
        while (i < c.length && (Character.isLetter(c.charAt(i)) || c.charAt(i) == '*')) i += 1
        c.substring(st, i) match {
          case "Tj" => if (pending.nonEmpty) cur ++= pending.last; pending.clear()
          case "TJ" => cur ++= pending.mkString; pending.clear()
          case "Td" | "TD" | "T*" => newline(); pending.clear()
          case "BT" | "ET" => newline(); pending.clear()
          case _ => pending.clear()
        }
      } else i += 1
    }
    newline()
    lines.mkString("\n")
  }

  // ------------------------------------------------------------------
  // DOCX writer
  // ------------------------------------------------------------------

  private def escXml(t: String): String = t.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case c   => c.toString
  }

  private val WNs = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  /** Minimal OOXML package: [Content_Types].xml + _rels/.rels +
    * word/document.xml, fixed entry timestamps for byte determinism. */
  def writeDocx(paragraphs: Seq[String]): Array[Byte] = {
    val doc = s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      s"""<w:document xmlns:w="$WNs"><w:body>""" +
      paragraphs.map(p =>
        s"""<w:p><w:r><w:t xml:space="preserve">${escXml(p)}</w:t></w:r></w:p>""").mkString +
      "</w:body></w:document>"
    val types = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
      "</Types>"
    val rels = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
      "</Relationships>"
    val out = new ByteArrayOutputStream(1024)
    val z = new ZipOutputStream(out)
    Seq("[Content_Types].xml" -> types, "_rels/.rels" -> rels,
        "word/document.xml" -> doc).foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(0L) // determinism: no wall-clock in the archive
      z.putNextEntry(e)
      z.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // DOCX reader
  // ------------------------------------------------------------------

  // ------------------------------------------------------------------
  // HTML writer
  // ------------------------------------------------------------------

  /** Minimal realistic web page for the `s15_html_extract` round-trip
    * oracle: head (title/style/script), a nav of pure links, an h1 +
    * content paragraphs, a body script, a comment, and a link-dense
    * footer. The main-content extractor must keep exactly the h1 +
    * paragraphs and drop everything else. Byte-deterministic. */
  def writeHtml(title: String, paragraphs: Seq[String],
                navLinks: Seq[String], footerLinks: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder(512)
    sb ++= "<!DOCTYPE html>\n<html lang=\"en\">\n<head>\n"
    sb ++= s"<meta charset=\"utf-8\">\n<title>${escXml(title)}</title>\n"
    sb ++= "<style>body { margin: 0 auto; max-width: 40em; } nav > ul { list-style: none; }</style>\n"
    sb ++= "</head>\n<body>\n<nav><ul>\n"
    navLinks.zipWithIndex.foreach { case (l, i) =>
      sb ++= s"""<li><a href="/nav/$i">${escXml(l)}</a></li>\n"""
    }
    sb ++= "</ul></nav>\n"
    sb ++= s"<h1>${escXml(title)}</h1>\n<!-- main content -->\n"
    paragraphs.foreach(p => sb ++= s"<p>${escXml(p)}</p>\n")
    sb ++= "<script>document.write(\"<p>not & text</p>\"); if (1 < 2) { x(); }</script>\n"
    sb ++= "<footer>" +
      footerLinks.zipWithIndex.map { case (l, i) =>
        s"""<a href="/f/$i">${escXml(l)}</a>"""
      }.mkString(" · ") + "</footer>\n"
    sb ++= "</body>\n</html>\n"
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------------
  // HTML reader (main-content extraction)
  // ------------------------------------------------------------------

  /** Tags that terminate a text block; everything else (a, b, em,
    * span, …) is inline and keeps the block open — the jusText/
    * trafilatura block model. */
  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "br", "hr", "table", "thead", "tbody", "tr", "td", "th", "nav",
    "header", "footer", "section", "article", "aside", "main",
    "blockquote", "pre", "form", "figure", "figcaption", "dl", "dt",
    "dd", "title", "body", "html")

  /** S15 — main-content extraction from HTML (the dominant real
    * web-corpus format; extends the reference's extractor family,
    * `document_processing_service.py:123-192`, with the format its
    * MIME dispatch lists but never parses). Dependency-free
    * single-pass parser over the raw markup:
    *
    *   - `<!-- -->` comments, `<script>`/`<style>` element content and
    *     everything inside `<head>` are skipped outright;
    *   - block-level tags (BlockTags) close the current text block,
    *     inline tags do not — `a <b>bold</b> c` stays one block;
    *   - character/entity references decode (named core set + numeric
    *     dec/hex), a lone `&` passes through literally;
    *   - whitespace runs ([ \t\n\r\f]+) collapse to one space per
    *     block, blocks trim, empty blocks drop;
    *   - boilerplate rule (jusText-style): a block whose non-space
    *     chars are >50 % inside `<a>` anchors is link boilerplate
    *     (nav menus, footers, pagination) and is dropped;
    *   - surviving blocks join "\n\n" (the S2 page contract).
    *
    * Malformed input is handled leniently (unclosed tags at EOF,
    * `>` inside quoted attributes, stray `<`); only non-HTML bytes
    * (no tag at all) raise, mapping to PROCESSING_ERROR upstream. */
  def extractHtml(bytes: Array[Byte]): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    require(s.indexOf('<') >= 0, "not HTML (no markup found)")
    val blocks = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var curNonWs = 0
    var curLinkNonWs = 0
    var anchorDepth = 0
    var i = 0
    val n = s.length

    def flush(): Unit = {
      // collapse [ \t\n\r\f]+ → ' ', trim; drop empty + link-dense blocks
      val collapsed = new StringBuilder(cur.length)
      var lastWs = true
      cur.foreach { c =>
        val ws = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
        if (ws) { if (!lastWs) collapsed += ' '; lastWs = true }
        else { collapsed += c; lastWs = false }
      }
      val t = collapsed.toString.trim
      if (t.nonEmpty && curLinkNonWs * 2 <= curNonWs) blocks += t
      cur.setLength(0); curNonWs = 0; curLinkNonWs = 0
    }

    def append(c: Char): Unit = {
      cur += c
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
      if (!ws) { curNonWs += 1; if (anchorDepth > 0) curLinkNonWs += 1 }
    }

    /** Case-insensitive indexOf for closing-tag search. */
    def findCi(needle: String, from: Int): Int = {
      var j = from
      while (j <= n - needle.length) {
        if (s.regionMatches(true, j, needle, 0, needle.length)) return j
        j += 1
      }
      -1
    }

    /** Skip one tag starting at '<'; returns index after '>' (quote-
      * aware: '>' inside a quoted attribute value does not close). */
    def tagEnd(from: Int): Int = {
      var j = from
      var quote: Char = 0
      while (j < n) {
        val c = s.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return j + 1
        j += 1
      }
      n
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
            (Character.isLetter(s.charAt(i + 1)) || s.charAt(i + 1) == '/' ||
              s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val closing = s.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val st = j
          while (j < n && Character.isLetterOrDigit(s.charAt(j))) j += 1
          val name = s.substring(st, j).toLowerCase
          i = tagEnd(j)
          if (!closing && (name == "script" || name == "style" || name == "head")) {
            if (BlockTags.contains(name)) flush()
            val close = findCi(s"</$name", i)
            i = if (close < 0) n else tagEnd(close + 2 + name.length)
          } else if (name == "a") {
            if (closing) anchorDepth = math.max(0, anchorDepth - 1)
            else anchorDepth += 1
          } else if (BlockTags.contains(name)) flush()
        } else { append(c); i += 1 } // stray '<' is text
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ent = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else null
        val decoded: String = ent match {
          case null     => null
          case "amp"    => "&"
          case "lt"     => "<"
          case "gt"     => ">"
          case "quot"   => "\""
          case "apos"   => "'"
          case "nbsp"   => "\u0020"
          case e if e.startsWith("#x") || e.startsWith("#X") =>
            try new String(Character.toChars(Integer.parseInt(e.drop(2), 16)))
            catch { case _: Exception => null }
          case e if e.startsWith("#") =>
            try new String(Character.toChars(Integer.parseInt(e.drop(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (decoded == null) { append('&'); i += 1 }
        else { decoded.foreach(append); i = semi + 1 }
      } else { append(c); i += 1 }
    }
    flush()
    blocks.mkString("\n\n").trim
  }

  /** S3 — extract text from a DOCX: body paragraphs joined "\n", runs
    * concatenated, w:tab → \t, w:br/w:cr → \n, result stripped (the
    * reference's python-docx contract). */
  def extractDocx(bytes: Array[Byte]): String = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var xml: Array[Byte] = null
    var entry = zin.getNextEntry
    while (entry != null && xml == null) {
      if (entry.getName == "word/document.xml") xml = zin.readAllBytes()
      else entry = zin.getNextEntry
    }
    require(xml != null, "no word/document.xml in archive")
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants => C}
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(xml))
    val paras = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inP = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case C.START_ELEMENT => r.getLocalName match {
            case "p"          => inP = true; cur.setLength(0)
            case "t"          => inT = true
            case "tab" if inP => cur += '\t'
            case "br" | "cr" if inP => cur += '\n'
            case _            =>
          }
          case C.CHARACTERS | C.CDATA if inT => cur ++= r.getText
          case C.END_ELEMENT => r.getLocalName match {
            case "p" => if (inP) { paras += cur.toString; inP = false }
            case "t" => inT = false
            case _   =>
          }
          case _ =>
        }
      }
    } finally r.close()
    paras.mkString("\n").trim
  }

  // ------------------------------------------------------------------
  // WARC (ISO 28500) — the web-archive container Common Crawl ships,
  // i.e. the dominant on-disk format of a 100 TB web training corpus.
  // Dependency-free reader/writer for the subset a curation pipeline
  // needs: multi-record files, per-record gzip members (the Common
  // Crawl convention — each record is its own gzip member so a range
  // request can decompress one record), warcinfo/request/response
  // types, and HTTP-header stripping for response payloads. The
  // writer is byte-deterministic (record ids derived from the target
  // URI, fixed date) so round-trip gates hash identically.
  // ------------------------------------------------------------------

  final case class WarcRecord(warcType: String, targetUri: String,
                              contentType: String, payload: Array[Byte])

  private val CRLF = "\r\n"
  private val WarcDate = "2026-01-01T00:00:00Z"

  private def warcRecordBytes(warcType: String, targetUri: String,
                              contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb ++= "WARC/1.0" ++= CRLF
    sb ++= s"WARC-Type: $warcType" ++= CRLF
    sb ++= s"WARC-Record-ID: <urn:graft:${md5Hex(s"$warcType|$targetUri")}>" ++= CRLF
    sb ++= s"WARC-Date: $WarcDate" ++= CRLF
    if (targetUri.nonEmpty) sb ++= s"WARC-Target-URI: $targetUri" ++= CRLF
    sb ++= s"Content-Type: $contentType" ++= CRLF
    sb ++= s"Content-Length: ${payload.length}" ++= CRLF
    sb ++= CRLF
    val head = sb.toString.getBytes(ISO_8859_1)
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload)
    out.write(CRLF.getBytes(ISO_8859_1)); out.write(CRLF.getBytes(ISO_8859_1))
    out.toByteArray
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  /** Write a WARC file: one `warcinfo` record, then a `request` +
    * `response` pair per page (uri, html bytes) — the Common Crawl
    * record mix. `gzipPerRecord` emits each record as its own gzip
    * member (concatenated members = one legal .warc.gz). */
  def writeWarc(pages: Seq[(String, Array[Byte])],
                gzipPerRecord: Boolean = false): Array[Byte] = {
    val info = warcRecordBytes("warcinfo", "",
      "application/warc-fields",
      s"software: graft-warc/1.0${CRLF}format: WARC File Format 1.0$CRLF"
        .getBytes(ISO_8859_1))
    val recs = info +: pages.flatMap { case (uri, html) =>
      val req = warcRecordBytes("request", uri,
        "application/http; msgtype=request",
        s"GET $uri HTTP/1.1${CRLF}Host: example.com$CRLF$CRLF".getBytes(ISO_8859_1))
      val httpResp = {
        val head = ("HTTP/1.1 200 OK" + CRLF +
          "Content-Type: text/html; charset=utf-8" + CRLF +
          s"Content-Length: ${html.length}" + CRLF + CRLF).getBytes(ISO_8859_1)
        val b = new ByteArrayOutputStream(head.length + html.length)
        b.write(head); b.write(html); b.toByteArray
      }
      Seq(req, warcRecordBytes("response", uri,
        "application/http; msgtype=response", httpResp))
    }
    val out = new ByteArrayOutputStream(4096)
    recs.foreach(r => out.write(if (gzipPerRecord) gzipBytes(r) else r))
    out.toByteArray
  }

  /** Parse a WARC file (plain or .gz with concatenated members) into
    * its records. Strict on the framing the spec guarantees
    * (Content-Length octet counts), lenient on unknown headers. */
  def readWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    val data =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
        // GZIPInputStream consumes concatenated members natively
        val gz = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(bytes))
        val bos = new ByteArrayOutputStream(bytes.length * 4)
        val buf = new Array[Byte](8192)
        var n = gz.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = gz.read(buf) }
        gz.close(); bos.toByteArray
      } else bytes
    val recs = ArrayBuffer.empty[WarcRecord]
    var pos = 0
    def lineAt(p: Int): (String, Int) = {
      var e = p
      while (e + 1 < data.length && !(data(e) == '\r' && data(e + 1) == '\n')) e += 1
      (new String(data, p, e - p, ISO_8859_1), e + 2)
    }
    while (pos < data.length) {
      // skip inter-record blank lines
      val (first, afterFirst) = lineAt(pos)
      if (first.isEmpty) pos = afterFirst
      else {
        require(first.startsWith("WARC/"), s"not a WARC record at offset $pos: '$first'")
        var p = afterFirst
        var wtype = ""; var uri = ""; var ctype = ""; var clen = -1L
        var line = ""
        while ({ val (l, np) = lineAt(p); line = l; p = np; l.nonEmpty }) {
          val i = line.indexOf(':')
          if (i > 0) {
            val (k, v) = (line.substring(0, i).trim.toLowerCase, line.substring(i + 1).trim)
            k match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "content-type" => ctype = v
              case "content-length" => clen = v.toLong
              case _ =>
            }
          }
        }
        require(clen >= 0, s"WARC record at $pos missing Content-Length")
        // copyOfRange zero-pads past data.length — reject truncation
        // explicitly instead of returning a corrupt zero-filled payload
        require(clen <= Int.MaxValue - p,
          s"WARC record at $pos: Content-Length $clen too large for in-memory parse")
        require(p + clen <= data.length,
          s"WARC record at $pos truncated: Content-Length $clen but only " +
            s"${data.length - p} bytes remain")
        val payload = java.util.Arrays.copyOfRange(data, p, p + clen.toInt)
        recs += WarcRecord(wtype, uri, ctype, payload)
        pos = p + clen.toInt
      }
    }
    recs.toSeq
  }

  /** Strip the HTTP header block from an `application/http` payload —
    * the body starts after the first CRLFCRLF. */
  def warcHttpBody(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length &&
      !(payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')) i += 1
    if (i + 3 >= payload.length) payload
    else java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
  }
}
