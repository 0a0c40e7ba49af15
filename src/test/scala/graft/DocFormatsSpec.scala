package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DocFormats
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Unit coverage for the dependency-free PDF/DOCX codecs (S2/S3).
  * The round-trip queries prove writer∘reader identity at corpus
  * scale; this spec additionally parses HANDCRAFTED files the writer
  * never produced (uncompressed streams, hex strings, TJ arrays,
  * escapes, nested page trees, tabs/breaks) so the readers aren't
  * merely the writer's inverse. */
class DocFormatsSpec extends AnyFunSuite {

  test("pdf round-trip: multi-page, parens/backslash escaping, empty page") {
    val pages = Seq("hello (world) \\ with escapes", "second page", "")
    val text = DocFormats.extractPdf(DocFormats.writePdf(pages))
    // trailing empty page is stripped by the final trim
    assert(text == "hello (world) \\ with escapes\n\nsecond page")
  }

  test("pdf reader: handcrafted uncompressed PDF with TJ array, hex string, octal escape, nested page tree") {
    def contentObj(num: Int, body: String): String =
      s"$num 0 obj\n<< /Length ${body.length} >>\nstream\n$body\nendstream\nendobj\n"
    val c1 = "BT /F1 12 Tf 72 720 Td [(Hel) (lo) ( )] TJ <576f726c64> Tj 0 -14 Td (line\\1632) Tj ET"
    val c2 = "BT (page2a) Tj ET BT (page2b) ' ET"
    val pdf =
      "%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        // nested tree: root kids = [inner pages node, page 5]
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\nendobj\n" +
        "4 0 obj\n<< /Type /Page /Parent 3 0 R /Contents 6 0 R >>\nendobj\n" +
        "5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [7 0 R] >>\nendobj\n" +
        contentObj(6, c1) + contentObj(7, c2) +
        "trailer\n<< /Size 8 /Root 1 0 R >>\n%%EOF\n"
    val text = DocFormats.extractPdf(pdf.getBytes(ISO_8859_1))
    // page 1: "Hello " ++ hex "World", then Td newline, octal \163 = 's' → "lines2"
    // page 2: two BT blocks → two lines; ' starts a new line then shows
    assert(text == "Hello World\nlines2\n\npage2a\npage2b")
  }

  test("pdf reader: corrupt inputs raise (dispatch maps to PROCESSING_ERROR)") {
    intercept[Exception](DocFormats.extractPdf("not a pdf".getBytes(ISO_8859_1)))
    intercept[Exception](DocFormats.extractPdf("%PDF-1.4\njunk only".getBytes(ISO_8859_1)))
  }

  test("docx round-trip: paragraphs, xml-escaped chars, empty paragraph") {
    val paras = Seq("a < b & c > d", "", "third")
    val text = DocFormats.extractDocx(DocFormats.writeDocx(paras))
    assert(text == "a < b & c > d\n\nthird")
  }

  test("docx reader: handcrafted document.xml with tabs, breaks, multiple runs") {
    val doc = """<?xml version="1.0"?>""" +
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
      """<w:p><w:r><w:t>run1</w:t></w:r><w:r><w:tab/><w:t>run2</w:t></w:r></w:p>""" +
      """<w:p><w:r><w:t xml:space="preserve">with </w:t><w:br/><w:t>break</w:t></w:r></w:p>""" +
      """</w:body></w:document>"""
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    z.closeEntry(); z.close()
    val text = DocFormats.extractDocx(out.toByteArray)
    assert(text == "run1\trun2\nwith \nbreak")
  }

  test("docx reader: archive without document.xml raises") {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("other.xml"))
    z.write("<x/>".getBytes); z.closeEntry(); z.close()
    intercept[Exception](DocFormats.extractDocx(out.toByteArray))
  }

  test("writers are byte-deterministic (round-trip queries hash stably)") {
    val p = Seq("alpha beta", "gamma")
    assert(DocFormats.writePdf(p).sameElements(DocFormats.writePdf(p)))
    assert(DocFormats.writeDocx(p).sameElements(DocFormats.writeDocx(p)))
    assert(DocFormats.writeHtml("t", p, Seq("n"), Seq("f"))
      .sameElements(DocFormats.writeHtml("t", p, Seq("n"), Seq("f"))))
  }

  private def html(s: String): String =
    DocFormats.extractHtml(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("html round-trip: head/nav/footer dropped, h1 + paragraphs kept, entities decode") {
    val text = DocFormats.extractHtml(DocFormats.writeHtml(
      "The Title", Seq("first para", "a < b & c > d"),
      Seq("Home", "About"), Seq("privacy policy", "terms of use")))
    assert(text == "The Title\n\nfirst para\n\na < b & c > d")
  }

  test("html reader: inline tags keep one block, block tags split") {
    assert(html("<body><p>a <b>bold</b> <a href=x>tiny</a> c</p><div>next</div></body>")
      == "a bold tiny c\n\nnext")
    assert(html("<p>one<br>two</p>") == "one\n\ntwo")
  }

  test("html reader: script/style/comment content and head are excluded") {
    val page = "<head><title>skip me</title><style>p > a { color: red }</style></head>" +
      "<body><SCRIPT>var a = \"<p>fake</p>\";</SCRIPT><p>real</p><!-- <p>no</p> --></body>"
    assert(html(page) == "real")
  }

  test("html reader: link-density boilerplate rule") {
    // pure-link block dropped; mostly-text block with a small link kept
    assert(html("<div><a href=1>only links here</a></div><p>kept text <a href=2>x</a></p>")
      == "kept text x")
    // exactly half link chars is NOT dropped (rule is strictly >50%)
    assert(html("<p><a href=1>abcd</a> efgh</p>") == "abcd efgh")
  }

  test("html reader: numeric entities, nbsp, lone ampersand, whitespace collapse") {
    assert(html("<p>em&#8212;dash &#x41;&nbsp;B</p>") == "em—dash A B")
    assert(html("<p>AT&T  and\n\tmore</p>") == "AT&T and more")
  }

  test("html reader: fuzz — arbitrary tag soup never throws, output is whitespace-normalized") {
    val rng = new scala.util.Random(42)
    val frags = Array("<", ">", "</", "<!--", "-->", "<p", "<a href=\"", "\"",
      "'", "<script>", "</script>", "&", "&amp;", "&#", "&#x", ";", "text ",
      "<div>", "</div>", "  ", "\n", "<b>", "=", "<head>", "</head>", "é漢")
    (0 until 200).foreach { _ =>
      val soup = (0 until 40).map(_ => frags(rng.nextInt(frags.length))).mkString
      if (soup.contains('<')) {
        val out = html(soup) // must not throw
        assert(!out.exists(c => c == '\t' || c == '\r' || c == '\f'))
        assert(!out.contains("  ") && out == out.trim)
      }
    }
  }

  test("html reader: malformed input is lenient, non-HTML raises") {
    assert(html("<p>attr gt <span title=\"a > b\">inside</span></p>") == "attr gt inside")
    assert(html("<p>unclosed at eof") == "unclosed at eof")
    assert(html("<p>stray < char</p>") == "stray < char")
    intercept[Exception](html("no markup at all"))
  }

  private def warcPages = Seq(
    "https://example.com/doc/1" -> DocFormats.writeHtml("T1", Seq("para one"), Nil, Nil),
    "https://example.com/doc/2" -> DocFormats.writeHtml("T2", Seq("para two", "encore"), Nil, Nil))

  test("warc: plain round-trip — record mix, framing, http body strip") {
    val bytes = DocFormats.writeWarc(warcPages)
    val recs = DocFormats.readWarc(bytes)
    assert(recs.map(_.warcType) == Seq("warcinfo", "request", "response",
      "request", "response"))
    val resp = recs.filter(_.warcType == "response")
    assert(resp.map(_.targetUri) == warcPages.map(_._1))
    // HTTP headers stripped → exactly the original html bytes
    resp.zip(warcPages).foreach { case (r, (_, html)) =>
      assert(DocFormats.warcHttpBody(r.payload).sameElements(html))
    }
    // payload bytes of a response include the HTTP status line
    assert(new String(resp.head.payload, ISO_8859_1).startsWith("HTTP/1.1 200 OK"))
  }

  test("warc: gzip members round-trip identically to plain; writer is deterministic") {
    val plain = DocFormats.writeWarc(warcPages)
    val gz = DocFormats.writeWarc(warcPages, gzipPerRecord = true)
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    assert(gz.length != plain.length)
    assert(DocFormats.readWarc(gz).map(r => (r.warcType, r.targetUri)) ==
      DocFormats.readWarc(plain).map(r => (r.warcType, r.targetUri)))
    assert(DocFormats.readWarc(gz).zip(DocFormats.readWarc(plain))
      .forall { case (a, b) => a.payload.sameElements(b.payload) })
    // byte determinism (fixed date, uri-derived ids, fixed gzip params)
    assert(DocFormats.writeWarc(warcPages).sameElements(plain))
    assert(DocFormats.writeWarc(warcPages, gzipPerRecord = true).sameElements(gz))
  }

  test("warc: payload bytes are framed by Content-Length — CRLFCRLF inside a body is not a boundary") {
    // a body containing the record separator sequence must survive
    val tricky = ("<p>before</p>\r\n\r\n<p>after</p>").getBytes(ISO_8859_1)
    val bytes = DocFormats.writeWarc(Seq("https://x/doc/9" -> tricky))
    val resp = DocFormats.readWarc(bytes).filter(_.warcType == "response")
    assert(resp.size == 1)
    assert(DocFormats.warcHttpBody(resp.head.payload).sameElements(tricky))
  }

  test("warc: unknown headers tolerated; garbage input raises") {
    val bytes = DocFormats.writeWarc(warcPages)
    // splice an unknown header into the first record
    val s = new String(bytes, ISO_8859_1)
      .replaceFirst("WARC-Date", "X-Custom: v\r\nWARC-Date")
    val recs = DocFormats.readWarc(s.getBytes(ISO_8859_1))
    assert(recs.size == 5)
    intercept[Exception](DocFormats.readWarc("HTTP/1.1 200 OK\r\n\r\n".getBytes(ISO_8859_1)))
  }
}
