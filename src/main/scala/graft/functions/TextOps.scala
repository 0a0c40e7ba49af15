package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Pure text operators (SURVEY.md §2.8 T1-T5) — re-implemented from the
  * reference's documented contracts, character-based (CJK-safe).
  *
  * T1 chunker contract (`backend/app/utils/text_processing.py:5-66`):
  * overlapping chunks of `chunkSize` chars (default 462 = 512-50) with
  * `overlap` (50); a chunk prefers to end at a sentence boundary
  * 。！？.!? found in the window [max(start+size/2, end-100), end+50);
  * next start = max(start+1, end-overlap); empty (all-whitespace)
  * chunks are skipped.
  */
object TextOps {

  val SentenceEnders: Set[Char] = Set('。', '！', '？', '.', '!', '?')

  /** T1 — sentence-boundary-preferring overlapping chunker. */
  def chunkText(text: String, chunkSize: Int = 462, overlap: Int = 50): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = ArrayBuffer.empty[String]
    var start = 0
    while (start < text.length) {
      var end = math.min(start + chunkSize, text.length)
      if (end < text.length) {
        val from = math.max(start + chunkSize / 2, end - 100)
        val to = math.min(text.length, end + 50)
        var boundary = -1
        var i = from
        while (i < to) {
          if (SentenceEnders(text.charAt(i))) boundary = i
          i += 1
        }
        if (boundary >= 0) end = boundary + 1
      }
      val chunk = text.substring(start, math.max(end, start)).trim
      if (chunk.nonEmpty) out += chunk
      start = if (end >= text.length) text.length
              else math.max(start + 1, end - overlap)
    }
    out.toSeq
  }

  /** T2 — truncate to maxLen preferring a sentence end in the last 30%
    * of the budget, else a word boundary in the last 20%, else hard cut;
    * '...' appended on non-sentence cuts (`text_processing.py:68-109`). */
  def smartTruncate(text: String, maxLen: Int): String = {
    if (text == null) ""
    else if (text.length <= maxLen) text
    else {
      val cut = text.substring(0, maxLen)
      val lastEnd = cut.lastIndexWhere(SentenceEnders)
      if (lastEnd >= (maxLen * 0.7).toInt) cut.substring(0, lastEnd + 1)
      else {
        val lastSpace = cut.lastIndexOf(' ')
        if (lastSpace >= (maxLen * 0.8).toInt) cut.substring(0, lastSpace) + "..."
        else cut + "..."
      }
    }
  }

  /** T3 — compress a list into ≤ maxLen with a per-item budget of
    * (maxLen - separators) / n, suffixing "...+N項" for dropped items
    * (`text_processing.py:111-176`). */
  def smartCompressList(items: Seq[String], maxLen: Int, sep: String = ", "): String = {
    if (items.isEmpty) return ""
    val full = items.mkString(sep)
    if (full.length <= maxLen) return full
    val sepBudget = sep.length * (items.size - 1)
    val per = math.max(1, (maxLen - sepBudget) / items.size)
    val out = ArrayBuffer.empty[String]
    var used = 0
    var dropped = 0
    for (it <- items) {
      val piece = if (it.length <= per) it else it.substring(0, per)
      if (used + piece.length + (if (out.nonEmpty) sep.length else 0) <= maxLen - 8) {
        used += piece.length + (if (out.nonEmpty) sep.length else 0)
        out += piece
      } else dropped += 1
    }
    if (dropped > 0) out.mkString(sep) + s"...+${dropped}項" else out.mkString(sep)
  }

  /** T4 — summary-vector text assembly with weighted component budgets
    * when the assembled text exceeds maxLen: filename 15%, summary 50%,
    * key_terms 15%, searchable 10%, domains 8%, content_type 2%
    * (`semantic_summary_service.py:433-574`, weights `:514-521`). */
  def buildSummaryText(filename: String, summary: String, keyTerms: Seq[String],
                       searchable: Seq[String], domains: Seq[String],
                       contentType: String, maxLen: Int = 512): String = {
    def part(label: String, v: String): String = if (v.isEmpty) "" else s"$label: $v"
    val naive = Seq(
      part("file", filename), part("summary", summary),
      part("terms", keyTerms.mkString(", ")), part("keywords", searchable.mkString(", ")),
      part("domains", domains.mkString(", ")), part("type", contentType)
    ).filter(_.nonEmpty).mkString(" | ")
    if (naive.length <= maxLen) naive
    else {
      val budget = maxLen - 20 // labels + separators reserve
      val w = Seq(0.15, 0.50, 0.15, 0.10, 0.08, 0.02)
      val vals = Seq(filename, summary, keyTerms.mkString(", "),
        searchable.mkString(", "), domains.mkString(", "), contentType)
      val labels = Seq("file", "summary", "terms", "keywords", "domains", "type")
      val pieces = labels.lazyZip(vals).lazyZip(w).map { (l, v, wi) =>
        val b = (budget * wi).toInt
        if (v.isEmpty) "" else part(l, smartTruncate(v, math.max(1, b)))
      }.filter(_.nonEmpty)
      smartTruncate(pieces.mkString(" | "), maxLen)
    }
  }

  /** Code-point-aware truncate: the reference counts Python code
    * points; Scala's substring counts UTF-16 units, which diverges on
    * supplementary-plane chars (the 💡 marker). */
  private def truncCp(s: String, max: Int, suffix: String): String = {
    val n = s.codePointCount(0, s.length)
    if (n > max) s.substring(0, s.offsetByCodePoints(0, max)) + suffix else s
  }

  /** T13 — conversation-history formatting for the QA classifier
    * (`question_classifier_service.py:73-117`): role-paired walk where
    * user turns keep ≤300 chars (+"..."), assistant clarification turns
    * (marked by 澄清/🔖/💡) collapse to ≤2 core lines (關於您的問題/💡),
    * falling back to a 600-char cut, and plain assistant turns keep
    * ≤800 chars (+"...[後續省略]"); the block is framed by the
    * 最近對話記錄/當前問題 sentinels, or the no-history sentinel when
    * empty. */
  def formatHistory(messages: Seq[(String, String)]): String = {
    if (messages.isEmpty) return "無對話歷史"
    val sb = new StringBuilder("=== 最近對話記錄 ===\n")
    messages.foreach { case (role, content) =>
      if (role == "user")
        sb ++= s"用戶: ${truncCp(content, 300, "...")}\n"
      else {
        val c =
          if (content.contains("澄清") || content.contains("🔖") || content.contains("💡")) {
            val core = content.split("\n", -1).iterator
              .filter(l => l.contains("關於您的問題") || l.contains("💡"))
              .take(2).toSeq
            if (core.nonEmpty) core.mkString("\n")
            else truncCp(content, 600, "...")
          } else truncCp(content, 800, "...[後續省略]")
        sb ++= s"助手: $c\n"
      }
    }
    sb ++= "=== 當前問題 ==="
    sb.toString
  }

  /** T5 — text-source priority coalesce: first non-empty wins, tagged
    * with its source (`semantic_summary_service.py:29-70`). */
  def textSource(extracted: Option[String], aiExtracted: Option[String],
                 fullText: Option[String], legacy: Option[String]): (String, String) = {
    val cands = Seq(
      "extracted_text" -> extracted, "ai_analysis.extracted_text" -> aiExtracted,
      "text_content.full_text" -> fullText, "analysis.extracted_text" -> legacy)
    cands.collectFirst { case (tag, Some(t)) if t.nonEmpty => (t, tag) }
      .getOrElse(("", "none"))
  }
}
