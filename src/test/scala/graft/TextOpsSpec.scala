package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextOps

class TextOpsSpec extends AnyFunSuite {

  test("chunkText: empty and null inputs") {
    assert(TextOps.chunkText("") == Seq.empty)
    assert(TextOps.chunkText(null) == Seq.empty)
    assert(TextOps.chunkText("   ") == Seq.empty)
  }

  test("chunkText: short text is a single chunk") {
    assert(TextOps.chunkText("hello world") == Seq("hello world"))
  }

  test("chunkText: covers full text with overlap") {
    val text = ("abcde " * 200).trim // 1199 chars, no sentence enders
    val chunks = TextOps.chunkText(text, chunkSize = 100, overlap = 20)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 150)) // size + boundary window
    // every char position is covered by some chunk (overlap ⇒ no gaps)
    assert(chunks.head.startsWith("abcde"))
    assert(text.endsWith(chunks.last.takeRight(20)))
  }

  test("chunkText: prefers CJK sentence boundaries") {
    val sentence = "這是一個測試句子。" // 9 chars incl. 。
    val text = sentence * 30 // 270 chars
    val chunks = TextOps.chunkText(text, chunkSize = 100, overlap = 10)
    // every non-final chunk should end at a sentence boundary
    chunks.dropRight(1).foreach { c =>
      assert(TextOps.SentenceEnders(c.last), s"chunk does not end at boundary: ...${c.takeRight(12)}")
    }
  }

  test("chunkText: ascii sentence boundaries and no empty chunks") {
    val text = ("The quick brown fox jumps. " * 40).trim
    val chunks = TextOps.chunkText(text, chunkSize = 120, overlap = 30)
    assert(chunks.forall(_.trim.nonEmpty))
    chunks.dropRight(1).foreach(c => assert(c.endsWith(".")))
  }

  test("smartTruncate: under limit unchanged; sentence preferred; ellipsis on hard cut") {
    assert(TextOps.smartTruncate("short", 10) == "short")
    val t1 = "First sentence. Second one here." // 32 chars
    val r1 = TextOps.smartTruncate(t1, 20)
    assert(r1 == "First sentence.") // '.' at idx 14 ≥ 0.7*20
    val hard = "abcdefghijklmnopqrstuvwxyz"
    assert(TextOps.smartTruncate(hard, 10) == "abcdefghij...")
    val words = "aa bb cc dd ee ff gg hh ii"
    val r2 = TextOps.smartTruncate(words, 10)
    assert(r2.endsWith("...") && r2.length <= 13)
  }

  test("smartCompressList: fits → joined; overflow → budgeted with suffix") {
    assert(TextOps.smartCompressList(Seq("a", "b"), 10) == "a, b")
    val r = TextOps.smartCompressList(Seq("aaaaaaaaaa", "bbbbbbbbbb", "cccccccccc"), 20)
    assert(r.length <= 28)
    val dropped = TextOps.smartCompressList((1 to 50).map(i => s"item$i"), 30)
    assert(dropped.contains("+") && dropped.contains("項"))
  }

  test("buildSummaryText: short passthrough, long respects budget") {
    val short = TextOps.buildSummaryText("f.pdf", "sum", Seq("k"), Seq("s"), Seq("d"), "pdf")
    assert(short.contains("f.pdf") && short.contains("sum"))
    val long = TextOps.buildSummaryText("f.pdf", "x" * 2000, Seq("term" * 50),
      Seq("kw" * 80), Seq("dom" * 40), "pdf", maxLen = 512)
    assert(long.length <= 515) // maxLen + ellipsis
    assert(long.contains("summary:"))
  }

  test("textSource: priority order and empty fallback") {
    assert(TextOps.textSource(Some("a"), Some("b"), None, None) == ("a", "extracted_text"))
    assert(TextOps.textSource(Some(""), Some("b"), None, None) == ("b", "ai_analysis.extracted_text"))
    assert(TextOps.textSource(None, None, None, Some("d")) == ("d", "analysis.extracted_text"))
    assert(TextOps.textSource(None, None, None, None) == ("", "none"))
  }

  test("UnicodeNorm.nfc: composes decomposed text, no-copy on normalized, codegen path") {
    import org.apache.spark.unsafe.types.UTF8String
    val dec = UTF8String.fromString("café")
    val pre = UTF8String.fromString("café")
    assert(graft.functions.UnicodeNorm.nfc(dec) == pre)
    // already-NFC input comes back as the same instance (fast path)
    assert(graft.functions.UnicodeNorm.nfc(pre) eq pre)
    // mojibake bytes are valid precomposed chars — NFC must NOT touch them
    val moji = UTF8String.fromString("cafÃ©")
    assert(graft.functions.UnicodeNorm.nfc(moji) eq moji)
    // through the Spark expression (exercises doGenCode)
    val spark = SparkSessionHelper.spark
    import spark.implicits._
    val out = Seq("café", "café", "x")
      .toDF("s")
      .select(graft.functions.UnicodeNorm.nfcCol(org.apache.spark.sql.functions.col("s")).as("n"))
      .as[String].collect()
    assert(out.toSeq == Seq("café", "café", "x"))
  }

  test("ts_phrase_search: every hit is a real consecutive bigram, counts exact") {
    val spark = SparkSessionHelper.spark
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("ts_phrase_search")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    val texts = graft.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    spark.catalog.clearCache()
    // recount every reported phrase occurrence against the raw text
    val reported = rows.map { case (ph, id, _, _) => (ph, id) }.toSet
    rows.foreach { case (phrase, docId, nOcc, firstPos) =>
      val Array(w1, w2) = phrase.split(" ")
      val toks = texts(docId)
      val occ = toks.indices.dropRight(1)
        .filter(i => toks(i) == w1 && toks(i + 1) == w2)
      assert(occ.length.toLong == nOcc, s"$phrase in $docId")
      assert((occ.head + 1).toLong == firstPos, s"$phrase first pos in $docId")
    }
    // and no hit was missed: every doc containing a phrase is reported
    for ((id, toks) <- texts; (w1, w2) <- Seq(("table", "scan"), ("batch", "stream"), ("sort", "merge")))
      if (toks.indices.dropRight(1).exists(i => toks(i) == w1 && toks(i + 1) == w2))
        assert(reported.contains((s"$w1 $w2", id)), s"missed $w1 $w2 in $id")
  }
}
