package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Ingestion sources/sinks (SURVEY.md §2.1 S1-S10).
  *
  * S1 landing scan: `binaryFile` over an upload directory with derived
  * metadata. S2-S6: MIME dispatch to per-format text extractors —
  * PDF and DOCX are REAL dependency-free parsers (`DocFormats`:
  * FlateDecode streams + page-tree walk; OOXML zip + StAX), TXT is
  * UTF-8; images pass through with no extracted text and unchanged
  * status; a file its extractor cannot parse gets a null text and
  * PROCESSING_ERROR (S5/S6 contract: unsupported types keep their
  * status, `document_processing_service.py:123-192`). S7 email import
  * dedup = left-anti by email_id. S10 log sink = append-mode write.
  *
  * Scale: binaryFile scans parallelize per file; extraction is
  * map-only. The dispatch is a `when` chain (codegen'd); only the
  * per-format byte parsers are UDFs (inherently imperative).
  */
object DocumentSources {

  /** S1 — scan a landing directory of uploaded files. */
  def readLandingDir(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("length").as("size"),
        col("modificationTime").as("uploaded_at"), col("content"),
        element_at(split(col("path"), "/"), -1).as("filename"))
      .withColumn("extension", lower(element_at(split(col("filename"), "\\."), -1)))
      .withColumn("status", lit("UPLOADED"))

  /** S6 — extension → extractor dispatch (as a codegen'd expression). */
  def extractorFor(extension: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(extension === "pdf", "pdf_extractor")
      .when(extension.isin("docx", "doc"), "docx_extractor")
      .when(extension.isin("html", "htm", "xhtml"), "html_extractor")
      .when(extension.isin("txt", "md", "log"), "text_extractor")
      .when(extension.isin("jpg", "jpeg", "png", "gif", "webp"), "image_passthrough")
      .otherwise("unsupported")

  /** Per-format extraction contract. */
  trait TextExtractor extends Serializable {
    def extract(bytes: Array[Byte]): String
  }
  /** S2 — real PDF text: page-tree walk, FlateDecode, Tj/TJ text ops,
    * pages joined "\n\n" (`document_processing_service.py:40-58`). */
  object PdfExtractor extends TextExtractor {
    def extract(bytes: Array[Byte]): String = DocFormats.extractPdf(bytes)
  }
  /** S3 — real DOCX text: OOXML zip → word/document.xml via StAX,
    * paragraphs joined "\n" (`document_processing_service.py:60-76`). */
  object DocxExtractor extends TextExtractor {
    def extract(bytes: Array[Byte]): String = DocFormats.extractDocx(bytes)
  }
  /** S4 — real UTF-8 text read. */
  object TxtExtractor extends TextExtractor {
    def extract(bytes: Array[Byte]): String =
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
  /** S15 — real HTML main-content extraction (jusText-style
    * link-density boilerplate removal; see DocFormats.extractHtml). */
  object HtmlExtractor extends TextExtractor {
    def extract(bytes: Array[Byte]): String = DocFormats.extractHtml(bytes)
  }

  /** S2-S6 — attach extracted_text by dispatching on extension.
    * Unsupported/image rows keep null text and their status; a parse
    * failure inside an extractor yields null text + PROCESSING_ERROR
    * (`document_processing_service.py:188-193`), never a failed job —
    * at scale one corrupt upload must not kill a million-file batch. */
  def extractText(files: DataFrame): DataFrame = {
    def safely(f: TextExtractor) = udf((b: Array[Byte]) =>
      try Option(f.extract(b))
      catch { case scala.util.control.NonFatal(_) => Option.empty[String] })
    val pdfU = safely(PdfExtractor)
    val docxU = safely(DocxExtractor)
    val txtU = safely(TxtExtractor)
    val htmlU = safely(HtmlExtractor)
    files
      .withColumn("extractor", extractorFor(col("extension")))
      .withColumn("extracted_text",
        when(col("extractor") === "pdf_extractor", pdfU(col("content")))
          .when(col("extractor") === "docx_extractor", docxU(col("content")))
          .when(col("extractor") === "html_extractor", htmlU(col("content")))
          .when(col("extractor") === "text_extractor", txtU(col("content")))
          .otherwise(lit(null).cast("string")))
      .withColumn("status",
        when(col("extractor") === "unsupported", col("status"))
          .when(col("extractor") === "image_passthrough", col("status"))
          .when(col("extracted_text").isNull, lit("PROCESSING_ERROR"))
          .otherwise(lit("TEXT_EXTRACTED")))
  }

  /** S7 — import-new-only by key (duplicate-import check,
    * `email_document_processor.py:134-160`). */
  def importNew(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.join(existing.select(key).distinct(), Seq(key), "left_anti")

  /** S10 — append-only log sink. */
  def appendLogs(logs: DataFrame, path: String): Unit =
    logs.write.mode("append").parquet(path)

  /** S8 — upsert-by-key as a pure batch relation: updates replace
    * existing rows with the same key, everything else carries forward
    * — the reference's per-document delete-then-insert
    * (`vector_db_service.py:84-163`) generalized to bulk MERGE
    * semantics. At 100 TB the anti-join side is a broadcast when the
    * update batch is small, and the result is written back with
    * dynamic partition overwrite (see IndexPipeline.writeVectors). */
  def upsertByKey(existing: DataFrame, updates: DataFrame, key: String): DataFrame =
    updates.unionByName(
      existing.join(updates.select(key).distinct(), Seq(key), "left_anti"))

  /** Small-file compaction (table maintenance): rewrite a parquet
    * directory into ~targetBytes files. Append-mode sinks (S10, the
    * streaming sinks) accrete small files that poison scan parallelism
    * at scale — compaction keeps file count ∝ data volume. Returns the
    * target file count used. */
  def compactParquet(spark: SparkSession, path: String, targetBytes: Long): Int = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val live = new Path(path)
    val totalBytes = fs.getContentSummary(live).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(path.stripSuffix("/") + "__compact_tmp")
    val old = new Path(path.stripSuffix("/") + "__compact_old")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // Exchange order keeps a crash from ever leaving the live path
    // empty: move live aside, move tmp in, delete old LAST. Every fs
    // Boolean is checked; a failed swap-in restores the original.
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"compactParquet: cannot clear stale $old")
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"compactParquet: cannot move $live aside")
    if (!fs.rename(tmp, live)) {
      val restored = fs.rename(old, live)
      throw new java.io.IOException(
        s"compactParquet: cannot swap in $tmp (original restored: $restored)")
    }
    if (!fs.delete(old, true))
      throw new java.io.IOException(s"compactParquet: compacted OK but cannot delete $old")
    nFiles
  }

  /** Schema-evolution read: union parquet written at different schema
    * versions (mergeSchema), so added columns surface as nulls on old
    * rows — the contract for rolling schema upgrades on an append-only
    * table. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Recursive delete for the fixture dirs the landing/log queries
    * rebuild deterministically on every invocation. The walk stream is
    * closed (try/finally) — the previous version leaked a file handle
    * per invocation (round-5 ADVICE). */
  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** Fixture roots keyed on the SANITIZED FULL data-dir path plus this
    * JVM's pid — not String.hashCode — so two concurrent runs (or two
    * datasets whose paths happen to collide in hashCode) can never
    * delete each other's fixture mid-query (round-5 ADVICE). The query
    * rebuilds the dir on every invocation, so the key only has to be
    * stable within one JVM. */
  private def fixtureDir(kind: String, dataDir: String): java.nio.file.Path =
    java.nio.file.Paths.get("/tmp/graft_" + kind + "_" +
      dataDir.replaceAll("[^A-Za-z0-9._-]", "_") + "_" +
      ProcessHandle.current().pid())

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+S2+S3+S4+S5+S6 composite under ONE exact oracle: a real
    // landing directory is (re)built on disk — every document becomes
    // an uploaded FILE whose format cycles pdf/docx/txt/jpg/xyz by
    // doc_id, with the pdf/docx bytes produced by the real writers —
    // then binaryFile-scanned (S1), extension-dispatched (S6), text
    // extracted by the real parsers (S2/S3/S4), images/unsupported
    // passed through with status intact (S5). The oracle replays the
    // expected text per format (single-page pdf/docx extract to
    // trim(text), txt is byte-identical) and the status contract.
    "s1_landing_scan" -> ((s, d) => {
      import java.nio.file.Files
      val dir = fixtureDir("landing", d)
      deleteRecursively(dir)
      Files.createDirectories(dir)
      val exts = Array("pdf", "docx", "txt", "html", "jpg", "xyz")
      Tables.documents(s, d).filter(col("doc_id") < 500 && col("n_chars") > 0)
        .select("doc_id", "text").collect().foreach { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val ext = exts((id % 6).toInt)
          val bytes = ext match {
            case "pdf"  => DocFormats.writePdf(Seq(text))
            case "docx" => DocFormats.writeDocx(Seq(text))
            case "html" => DocFormats.writeHtml(s"Doc $id", Seq(text),
              Seq("Home"), Seq("privacy policy", "terms"))
            case "txt"  => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            case "jpg"  => s"IMG$id".getBytes(java.nio.charset.StandardCharsets.UTF_8)
            case _      => s"BIN$id".getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
          Files.write(dir.resolve(f"up_$id%05d.$ext"), bytes)
        }
      extractText(readLandingDir(s, dir.toString))
        .select(col("filename"), col("extension"), col("extractor"), col("status"),
          length(col("extracted_text")).cast("long").as("n_text"),
          md5(col("extracted_text")).as("text_md5"))
        .orderBy("filename")
    }),

    // S10 — append-only log sink digest: two appended batches into a
    // fresh sink dir must BOTH survive the read-back (append never
    // replaces), proven by per-batch counts + id sums.
    "s10_log_sink" -> ((s, d) => {
      val dir = fixtureDir("logsink", d)
      deleteRecursively(dir)
      val docs = Tables.documents(s, d)
      appendLogs(docs.select(col("doc_id"), lit(1).as("batch")), dir.toString)
      appendLogs(docs.select(col("doc_id"), lit(2).as("batch")), dir.toString)
      s.read.parquet(dir.toString)
        .groupBy("batch")
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"))
        .orderBy("batch")
    }),

    // S6 dispatch over a derived filename population (deterministic
    // extension assignment from doc_id) — verifies the when-chain.
    "s6_mime_dispatch" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("extension",
          element_at(array(lit("pdf"), lit("docx"), lit("txt"), lit("html"),
            lit("jpg"), lit("xyz")),
            (col("doc_id") % 6 + 1).cast("int")))
        .withColumn("extractor", extractorFor(col("extension")))
        .groupBy("extractor").agg(count(lit(1)).as("n"))
        .orderBy("extractor")),

    // S23 — JSONL.GZ round-trip, the training-data interchange format
    // (the shape of every public corpus drop: one JSON object per
    // line, gzip shards): the corpus is written DISTRIBUTED through
    // Spark's json sink with gzip codec (one shard per partition — at
    // 100 TB this is the real export path, no driver funnel), read
    // back with an EXPLICIT schema (never inference — a schema scan
    // of 100 TB of gzip is a full decompress pass), and the gate pins
    // per-source counts and a content digest equal to the direct
    // parquet expectation — any loss in JSON escaping, the codec, or
    // schema projection hash-fails.
    "s23_jsonl_roundtrip" -> ((s, d) => {
      val dir = fixtureDir("jsonl", d).toString
      Tables.documents(s, d).select("doc_id", "text", "lang", "source")
        .write.mode("overwrite").option("compression", "gzip").json(dir)
      s.read.schema("doc_id LONG, text STRING, lang STRING, source STRING")
        .json(dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          md5(concat_ws("", array_sort(collect_list(concat_ws(":",
            col("doc_id"), md5(col("text")), col("lang")))))).as("digest"))
        .orderBy("source")
    }),

    // S2 — REAL PDF extraction proven by round-trip: each document's
    // text is paginated (100-char page 1, remainder page 2), written
    // as a Flate-compressed two-page PDF, parsed back by the real
    // extractor, and the reassembled text (pages joined "\n\n",
    // stripped) is hash-compared against the oracle's direct string
    // computation — any drift in the writer, the inflater, the page
    // walk, the Tj parser, or the join/strip contract fails the gate.
    "s2_pdf_roundtrip" -> ((s, d) => {
      val mk = udf((text: String) =>
        DocFormats.writePdf(Seq(text.substring(0, 100), text.substring(100))))
      val ex = udf((b: Array[Byte]) => DocFormats.extractPdf(b))
      Tables.documents(s, d).filter(col("n_chars") > 100)
        .withColumn("extracted", ex(mk(col("text"))))
        .select(col("doc_id"),
          length(col("extracted")).cast("long").as("n_extracted"),
          md5(col("extracted")).as("text_md5"))
        .orderBy("doc_id")
    }),

    // S3 — REAL DOCX extraction, same round-trip proof: two paragraphs
    // through the OOXML writer and the StAX extractor, joined "\n".
    "s3_docx_roundtrip" -> ((s, d) => {
      val mk = udf((text: String) =>
        DocFormats.writeDocx(Seq(text.substring(0, 100), text.substring(100))))
      val ex = udf((b: Array[Byte]) => DocFormats.extractDocx(b))
      Tables.documents(s, d).filter(col("n_chars") > 100)
        .withColumn("extracted", ex(mk(col("text"))))
        .select(col("doc_id"),
          length(col("extracted")).cast("long").as("n_extracted"),
          md5(col("extracted")).as("text_md5"))
        .orderBy("doc_id")
    }),

    // X6 — the Gmail-import composite (`apis/v1/gmail.py:624-844` +
    // `email_document_processor.py:24-231`): an email-shaped fixture is
    // derived from documents (subject = text prefix + an invalid-char
    // tail cycling through the sanitizer's alphabet, cc present on
    // every 5th email), every 3rd email is already imported → S7
    // left-anti dedup drops it, survivors get the reference's document
    // record: sanitized filename (invalid chars → '_', 200-char cut,
    // strip), UTF-8 body size, the reconstructed RFC-822 message
    // (headers joined "\n", Cc line only when present, X-Gmail-* custom
    // headers) hashed, and the X1 chunk count of the body. Hash-exact:
    // the oracle replays the sanitize/RFC-822 string math and the
    // chunker's state-machine CTE.
    "x6_email_import" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("n_chars") > 0)
      val tail = element_at(
        array(lit(""), lit(" <q*>"), lit(" a\\b/c"), lit(" x:y|z?\"")),
        (col("doc_id") % 4 + 1).cast("int"))
      val emails = docs.select(
        col("doc_id"), col("text"),
        concat(lit("em_"), col("doc_id")).as("email_id"),
        concat(lit("th_"), expr("doc_id div 4")).as("thread_id"),
        concat(lit("Re: "), substring(col("text"), 1, 40), tail).as("subject"),
        concat(lit("sender"), col("doc_id") % 7, lit("@example.com")).as("from_address"),
        when(col("doc_id") % 5 === 0, lit("cc@example.com")).as("cc"),
        concat(lit("2026-01-"), lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
          lit("T00:00:00")).as("edate"),
        concat(lit("<msg-"), col("doc_id"), lit("@mail>")).as("message_id"))
      val existing = emails.filter(col("doc_id") % 3 === 0)
      val fresh = importNew(emails, existing, "email_id")
      val nChunksU = udf((t: String) =>
        graft.functions.TextOps.chunkText(t, 462, 50).size.toLong)
      fresh
        .withColumn("filename", trim(substring(
          translate(concat(col("subject"), lit("_"), col("email_id")),
            "<>:\"|?*/\\", "_________"), 1, 200)))
        .withColumn("eml", concat_ws("\n",
          concat(lit("From: "), col("from_address")),
          lit("To: user@example.com"),
          when(col("cc").isNotNull, concat(lit("Cc: "), col("cc"))),
          concat(lit("Subject: "), col("subject")),
          concat(lit("Date: "), col("edate")),
          concat(lit("Message-ID: "), col("message_id")),
          concat(lit("X-Gmail-ID: "), col("email_id")),
          concat(lit("X-Gmail-Thread-ID: "), col("thread_id")),
          lit(""), col("text")))
        .select(col("doc_id"), col("email_id"), col("thread_id"), col("filename"),
          octet_length(col("text")).cast("long").as("file_size"),
          md5(col("eml")).as("eml_md5"),
          nChunksU(col("text")).as("n_chunks"))
        .orderBy("doc_id")
    }),

    // S15 — REAL HTML main-content extraction proven by round-trip:
    // each document's text becomes a full page (head with title/style,
    // nav of pure links, h1 + three paragraphs — one carrying every
    // core entity — a body script, a comment, a link-dense footer).
    // The extractor must return exactly h1 + paragraphs joined "\n\n":
    // any drift in the tag walk, the entity decoder, the script/head
    // skip, or the link-density boilerplate rule fails the gate. The
    // oracle recomputes the expected text directly (corpus text is
    // single-spaced ASCII, so block whitespace-collapse is identity
    // and DuckDB trim == Scala trim).
    "s15_html_extract" -> ((s, d) => {
      val mk = udf((text: String) => DocFormats.writeHtml(
        text.substring(0, 40),
        Seq(text.substring(40, 100), text.substring(100),
          "Fee & fi < fo > \"fum\" 'qux'"),
        Seq("Home", "Archive", "About"),
        Seq("privacy policy", "terms of service")))
      val ex = udf((b: Array[Byte]) => DocFormats.extractHtml(b))
      Tables.documents(s, d).filter(col("n_chars") > 100)
        .withColumn("extracted", ex(mk(col("text"))))
        .select(col("doc_id"),
          length(col("extracted")).cast("long").as("n_extracted"),
          md5(col("extracted")).as("text_md5"))
        .orderBy("doc_id")
    }),

    // S20 — WARC ingestion, the Common Crawl container a 100 TB web
    // training corpus actually arrives in: documents are grouped 16 to
    // a WARC (warcinfo + request/response pairs — the real record
    // mix), every other WARC written as per-record gzip members (the
    // CC convention), then parsed back: record framing by
    // Content-Length, multi-member gunzip, non-response records
    // dropped, HTTP headers stripped, and the HTML payload run through
    // the same main-content extractor s15 gates. Hash-exact per doc:
    // extracted text must round-trip, and the record-mix counts
    // (n_info = 1, n_req = pages) pin the type filtering. At scale
    // this is one narrow map over binary files — no shuffle until the
    // group-by here, which exists only to BUILD the fixture WARCs.
    "s20_warc_ingest" -> ((s, d) => {
      val mkWarc = udf((ids: Seq[Long], texts: Seq[String], gz: Boolean) =>
        DocFormats.writeWarc(ids.zip(texts).map { case (id, text) =>
          (s"https://example.com/doc/$id", DocFormats.writeHtml(
            text.substring(0, 40),
            Seq(text.substring(40, 100), text.substring(100),
              "Fee & fi < fo > \"fum\" 'qux'"),
            Seq("Home", "Archive", "About"),
            Seq("privacy policy", "terms of service")))
        }, gzipPerRecord = gz))
      val parse = udf((b: Array[Byte]) => {
        val recs = DocFormats.readWarc(b)
        val nInfo = recs.count(_.warcType == "warcinfo").toLong
        val nReq = recs.count(_.warcType == "request").toLong
        recs.filter(_.warcType == "response").map(r =>
          (r.targetUri, new String(DocFormats.warcHttpBody(r.payload), "UTF-8"),
            nInfo, nReq))
      })
      val exHtml = udf((html: String) => DocFormats.extractHtml(html.getBytes("UTF-8")))
      Tables.documents(s, d).filter(col("n_chars") > 100)
        .withColumn("warc_id", floor(col("doc_id") / 16).cast("long"))
        .groupBy("warc_id")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("text")))).as("pages"))
        .withColumn("ids", expr("transform(pages, p -> p.doc_id)"))
        .withColumn("texts", expr("transform(pages, p -> p.text)"))
        .withColumn("n_pages", size(col("pages")).cast("long"))
        .withColumn("gz", pmod(col("warc_id"), lit(2)) === 0)
        .withColumn("rec", explode(parse(mkWarc(col("ids"), col("texts"), col("gz")))))
        .withColumn("doc_id", regexp_extract(col("rec._1"), "/doc/(\\d+)$", 1).cast("long"))
        .withColumn("extracted", exHtml(col("rec._2")))
        .select(col("doc_id"),
          length(col("extracted")).cast("long").as("n_extracted"),
          md5(col("extracted")).as("text_md5"),
          col("n_pages"), col("rec._3").as("n_info"), col("rec._4").as("n_req"))
        .orderBy("doc_id")
    }),

    // S8 upsert: every 7th doc is re-analyzed (text prefixed, source
    // re-tagged); the merged relation must show replaced rows under the
    // new source and untouched rows under their originals.
    "s8_upsert_merge" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val updates = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(lit("UPDATED "), col("text")))
        .withColumn("source", lit("upsert"))
      upsertByKey(docs, updates, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text")).cast("long")).as("sum_len"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("source")
    })
  )

  val oracles: Map[String, String] = Map(
    "s1_landing_scan" ->
      """WITH f AS (
        |  SELECT doc_id, ext,
        |    'up_' || lpad(doc_id::VARCHAR, 5, '0') || '.' || ext AS filename,
        |    CASE WHEN ext = 'pdf' THEN trim(text)
        |         WHEN ext = 'docx' THEN trim(text)
        |         WHEN ext = 'html' THEN 'Doc ' || doc_id || chr(10) || chr(10) || trim(text)
        |         WHEN ext = 'txt' THEN text END AS xt
        |  FROM (SELECT doc_id, text,
        |          (['pdf','docx','txt','html','jpg','xyz'])[(doc_id % 6 + 1)::INT] AS ext
        |        FROM documents WHERE doc_id < 500 AND n_chars > 0)),
        |g AS (
        |  SELECT filename, ext AS extension,
        |    CASE WHEN ext = 'pdf' THEN 'pdf_extractor'
        |         WHEN ext IN ('docx','doc') THEN 'docx_extractor'
        |         WHEN ext IN ('html','htm','xhtml') THEN 'html_extractor'
        |         WHEN ext IN ('txt','md','log') THEN 'text_extractor'
        |         WHEN ext IN ('jpg','jpeg','png','gif','webp') THEN 'image_passthrough'
        |         ELSE 'unsupported' END AS extractor, xt
        |  FROM f)
        |SELECT filename, extension, extractor,
        |  CASE WHEN extractor IN ('image_passthrough', 'unsupported') THEN 'UPLOADED'
        |       WHEN xt IS NULL THEN 'PROCESSING_ERROR'
        |       ELSE 'TEXT_EXTRACTED' END AS status,
        |  CAST(length(xt) AS BIGINT) AS n_text,
        |  md5(xt) AS text_md5
        |FROM g ORDER BY filename""".stripMargin,
    "s10_log_sink" ->
      """SELECT batch, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_id
        |FROM (SELECT doc_id, 1 AS batch FROM documents
        |      UNION ALL SELECT doc_id, 2 AS batch FROM documents)
        |GROUP BY batch ORDER BY batch""".stripMargin,
    "s6_mime_dispatch" ->
      """SELECT CASE
        |    WHEN ext = 'pdf' THEN 'pdf_extractor'
        |    WHEN ext IN ('docx','doc') THEN 'docx_extractor'
        |    WHEN ext IN ('html','htm','xhtml') THEN 'html_extractor'
        |    WHEN ext IN ('txt','md','log') THEN 'text_extractor'
        |    WHEN ext IN ('jpg','jpeg','png','gif','webp') THEN 'image_passthrough'
        |    ELSE 'unsupported' END AS extractor,
        |  count(*) AS n
        |FROM (SELECT (['pdf','docx','txt','html','jpg','xyz'])[(doc_id % 6 + 1)::INT] AS ext
        |      FROM documents)
        |GROUP BY 1 ORDER BY extractor""".stripMargin,
    // JSONL round-trip expectation: lossless, so the digest is the
    // direct parquet computation.
    "s23_jsonl_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  md5(string_agg(line, '' ORDER BY line)) AS digest
        |FROM (SELECT source, CAST(doc_id AS VARCHAR) || ':' || md5(text)
        |        || ':' || lang AS line
        |      FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,
    // Round-trip expectation computed directly on the text: the PDF
    // path reassembles page1 + "\n\n" + page2 then strips; the DOCX
    // path joins paragraphs with "\n". Corpus text is ASCII words, so
    // trim (space-only in DuckDB) == Scala trim here.
    "s2_pdf_roundtrip" ->
      """SELECT doc_id,
        |  CAST(length(trim(substr(text, 1, 100) || chr(10) || chr(10) || substr(text, 101))) AS BIGINT) AS n_extracted,
        |  md5(trim(substr(text, 1, 100) || chr(10) || chr(10) || substr(text, 101))) AS text_md5
        |FROM documents WHERE n_chars > 100 ORDER BY doc_id""".stripMargin,
    "s3_docx_roundtrip" ->
      """SELECT doc_id,
        |  CAST(length(trim(substr(text, 1, 100) || chr(10) || substr(text, 101))) AS BIGINT) AS n_extracted,
        |  md5(trim(substr(text, 1, 100) || chr(10) || substr(text, 101))) AS text_md5
        |FROM documents WHERE n_chars > 100 ORDER BY doc_id""".stripMargin,
    // The surviving blocks are the h1 (title = 40-char text prefix)
    // plus the three content paragraphs; nav/footer fall to the
    // link-density rule, head/script/comment are skipped, and the
    // entity paragraph round-trips through escape + decode to its
    // literal form.
    "s15_html_extract" ->
      """WITH base AS (
        |  SELECT doc_id, trim(substr(text, 1, 40)) AS t,
        |    trim(substr(text, 41, 60)) AS p1, trim(substr(text, 101)) AS p2
        |  FROM documents WHERE n_chars > 100),
        |asm AS (
        |  SELECT doc_id,
        |    t || chr(10) || chr(10) || p1 || chr(10) || chr(10) || p2 ||
        |      chr(10) || chr(10) || 'Fee & fi < fo > "fum" ''qux''' AS ext
        |  FROM base)
        |SELECT doc_id, CAST(length(ext) AS BIGINT) AS n_extracted,
        |  md5(ext) AS text_md5
        |FROM asm ORDER BY doc_id""".stripMargin,
    // S20 replayed: the s15 page assembly per doc, grouped 16 to a
    // WARC for the record-mix counts (n_info constant 1, n_req =
    // group size); gzip-vs-plain alternation is invisible to content.
    "s20_warc_ingest" ->
      """WITH base AS (
        |  SELECT doc_id, doc_id // 16 AS warc_id,
        |    trim(substr(text, 1, 40)) AS t,
        |    trim(substr(text, 41, 60)) AS p1, trim(substr(text, 101)) AS p2
        |  FROM documents WHERE n_chars > 100),
        |grp AS (SELECT warc_id, count(*) AS n_pages FROM base GROUP BY warc_id),
        |asm AS (
        |  SELECT doc_id, warc_id,
        |    t || chr(10) || chr(10) || p1 || chr(10) || chr(10) || p2 ||
        |      chr(10) || chr(10) || 'Fee & fi < fo > "fum" ''qux''' AS ext
        |  FROM base)
        |SELECT a.doc_id, CAST(length(ext) AS BIGINT) AS n_extracted,
        |  md5(ext) AS text_md5, g.n_pages,
        |  CAST(1 AS BIGINT) AS n_info, g.n_pages AS n_req
        |FROM asm a JOIN grp g USING (warc_id) ORDER BY a.doc_id""".stripMargin,
    "x6_email_import" -> {
      val t1End = graft.pipelines.IndexPipeline.t1End
      s"""WITH RECURSIVE inc AS (
         |  SELECT doc_id, text,
         |    'em_' || doc_id AS email_id,
         |    'th_' || (doc_id // 4) AS thread_id,
         |    'Re: ' || substr(text, 1, 40) ||
         |      (['', ' <q*>', ' a\\b/c', ' x:y|z?"'])[(doc_id % 4 + 1)::INT] AS subject,
         |    'sender' || (doc_id % 7) || '@example.com' AS from_address,
         |    CASE WHEN doc_id % 5 = 0 THEN 'cc@example.com' END AS cc,
         |    '2026-01-' || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') || 'T00:00:00' AS edate,
         |    '<msg-' || doc_id || '@mail>' AS message_id
         |  FROM documents WHERE n_chars > 0),
         |imp AS (SELECT * FROM inc WHERE doc_id % 3 <> 0),
         |src AS (SELECT doc_id, text AS t, length(text)::BIGINT AS len FROM imp),
         |walk AS (
         |  SELECT doc_id, CAST(0 AS BIGINT) AS start0 FROM src
         |  UNION ALL
         |  SELECT w.doc_id,
         |    CASE WHEN $t1End >= s.len THEN s.len
         |         ELSE greatest(w.start0 + 1, ($t1End) - 50) END
         |  FROM walk w JOIN src s USING (doc_id)
         |  WHERE w.start0 < s.len),
         |chunks AS (
         |  SELECT w.doc_id,
         |    trim(substr(s.t, w.start0 + 1, ($t1End) - w.start0)) AS chunk
         |  FROM walk w JOIN src s USING (doc_id)
         |  WHERE w.start0 < s.len),
         |cnt AS (
         |  SELECT doc_id, count(*) AS n_chunks FROM chunks
         |  WHERE chunk <> '' GROUP BY doc_id)
         |SELECT i.doc_id, i.email_id, i.thread_id,
         |  trim(substr(translate(i.subject || '_' || i.email_id,
         |    '<>:"|?*/\\', '_________'), 1, 200)) AS filename,
         |  CAST(strlen(i.text) AS BIGINT) AS file_size,
         |  md5(concat_ws(chr(10),
         |    'From: ' || i.from_address,
         |    'To: user@example.com',
         |    CASE WHEN i.cc IS NOT NULL THEN 'Cc: ' || i.cc END,
         |    'Subject: ' || i.subject,
         |    'Date: ' || i.edate,
         |    'Message-ID: ' || i.message_id,
         |    'X-Gmail-ID: ' || i.email_id,
         |    'X-Gmail-Thread-ID: ' || i.thread_id,
         |    '', i.text)) AS eml_md5,
         |  CAST(coalesce(c.n_chunks, 0) AS BIGINT) AS n_chunks
         |FROM imp i LEFT JOIN cnt c USING (doc_id)
         |ORDER BY i.doc_id""".stripMargin
    },
    "s8_upsert_merge" ->
      """WITH merged AS (
        |  SELECT doc_id, 'UPDATED ' || text AS text, 'upsert' AS source
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, text, source FROM documents WHERE doc_id % 7 <> 0)
        |SELECT source, count(*) AS n,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_len,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM merged GROUP BY source ORDER BY source""".stripMargin
  )
}
