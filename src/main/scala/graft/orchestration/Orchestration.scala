package graft.orchestration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Search

/** LLM-orchestration layer (SURVEY.md §2.10 L1-L10, §2.11 X2/X3):
  * LLM calls are pluggable column/record transforms behind `LlmTask`,
  * with deterministic test doubles — the engine orchestrates plans,
  * never network calls. Also hosts the pure planning utilities:
  * V10 strategy router, P8 projection-collision removal, T12 dynamic
  * schema discovery.
  */
object Orchestration {

  // ---- V10: strategy router (`search_strategy.py:12-41`) ----
  sealed trait SearchStrategy
  case object SummaryOnly extends SearchStrategy
  case object RrfFusion extends SearchStrategy
  case object Hybrid extends SearchStrategy

  def routeStrategy(granularity: String, suggestion: Option[String]): SearchStrategy =
    granularity match {
      case "thematic" => SummaryOnly
      case "detailed" | "unknown" => RrfFusion
      case _ => suggestion match {
        case Some("summary_only") => SummaryOnly
        case Some("rrf_fusion") | Some("keyword_enhanced_rrf") => RrfFusion
        case _ => Hybrid
      }
    }

  // ---- P8: projection collision removal (`mongodb_utils.py:9-44`) ----
  /** If both a parent path and a child path are projected, drop the
    * parent and keep the deepest child (Mongo would error on both). */
  def resolveProjectionCollisions(paths: Seq[String]): Seq[String] =
    paths.filterNot(p => paths.exists(q => q != p && q.startsWith(p + ".")))

  // ---- T12: dynamic-field schema discovery (`document_detail_query_handler.py:189-258`) ----
  /** Sample ≤ n rows of a map column and merge observed keys into
    * fieldPath → example-value-type, driver-side by design. */
  def discoverSchema(df: DataFrame, mapCol: String, n: Int = 5): Map[String, String] =
    df.select(mapCol).limit(n).collect()
      .flatMap(r => Option(r.getMap[String, String](0)).map(_.toMap).getOrElse(Map.empty))
      .groupBy(_._1)
      .map { case (k, vs) =>
        val v = vs.head._2
        val t = if (v == null) "null"
        else if (v.matches("-?\\d+")) "int"
        else if (v.matches("-?\\d+\\.\\d+")) "float"
        else "str"
        k -> s"$k ($t)"
      }

  // ---- L-task contracts with deterministic stubs ----
  trait LlmTask[I, O] extends Serializable { def apply(in: I): O }

  case class TextAnalysisOut(summary: String, keywords: Seq[String], autoTitle: String)
  /** L1 stub: summary = smart-truncated head; keywords = most frequent
    * tokens (deterministic analogue of `AITextAnalysisOutput`). */
  object StubTextAnalysis extends LlmTask[String, TextAnalysisOut] {
    def apply(text: String): TextAnalysisOut = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val kws = toks.groupBy(identity).view.mapValues(_.length).toSeq
        .sortBy { case (w, n) => (-n, w) }.take(5).map(_._1)
      TextAnalysisOut(graft.functions.TextOps.smartTruncate(text, 100),
        kws, toks.take(3).mkString(" "))
    }
  }

  /** L2 — image-analysis contract (`AIImageAnalysisOutput`,
    * `ai_models_simplified.py:104-112`): initial_summary,
    * extracted_text (vision OCR, null when not applicable),
    * content_type, key_information. Deterministic stub: dimensions
    * come from the Multimodal stub decoder, content_type from the
    * channel count, and the OCR leg reads the bytes as UTF-8 (the
    * fixture's images ARE text bytes, so the plumbing is oracle-able
    * end-to-end); real deployments swap a vision model behind the
    * same signature. */
  case class ImageAnalysisOut(initialSummary: String, extractedText: Option[String],
                              contentType: String, keyInformation: Seq[String])
  object StubImageAnalysis extends LlmTask[Array[Byte], ImageAnalysisOut] {
    def apply(bytes: Array[Byte]): ImageAnalysisOut = {
      val (w, h, c) = graft.operators.Multimodal.StubDecoder.decode(bytes)
      val contentType = c match {
        case 1 => "document_scan"
        case 2 => "diagram"
        case _ => "photo"
      }
      val ocr =
        if (c == 1)
          Some(new String(bytes.take(60), java.nio.charset.StandardCharsets.UTF_8))
        else None
      ImageAnalysisOut(s"圖片 ${w}x${h} ${c}ch", ocr, contentType,
        ocr.map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).take(3).toSeq)
          .getOrElse(Seq.empty))
    }
  }

  /** L3 stub: deterministic query expansion (3 rewrites). */
  object StubQueryRewrite extends LlmTask[String, Seq[String]] {
    def apply(q: String): Seq[String] =
      Seq(q, s"$q details", s"about $q")
  }

  /** L4 rule-based intent fallback (`question_classifier_service.py:275-321`):
    * greeting keyword + short → greeting; vague words or <5 chars →
    * clarification needed; else document search. */
  def classifyIntentRules(question: String): String = {
    val q = question.trim.toLowerCase
    val greetings = Seq("hi", "hello", "hey", "你好", "嗨")
    if (greetings.exists(q.contains) && q.length < 10) "greeting"
    else if (q.length < 5 || Seq("stuff", "things", "那個", "這個").exists(q.contains))
      "clarification_needed"
    else "document_search"
  }

  /** L7 answer-confidence heuristic: min(0.9, 0.3 + 0.1·n_ctx)
    * (`qa_answer_service.py:173-177`). */
  def answerConfidence(nContexts: Int): Double =
    math.min(0.9, 0.3 + 0.1 * nContexts)

  // ---- L5: Mongo-detail-query generation contract + stub ----
  /** The `AIMongoDBQueryDetailOutput` contract
    * (`ai_models_simplified.py:21-28`): a projection path list, an
    * optional sub-filter, and the generator's reasoning. */
  case class DetailQueryPlan(projection: Seq[String],
                             subFilter: Option[(String, String)],
                             reasoning: String)

  /** L5 stub — deterministic plan generation: project the schema
    * fields whose names appear as question tokens (filename always
    * included, collisions resolved via P8); real deployments swap an
    * LLM behind the same signature. */
  def stubMongoQueryGen(question: String, schemaFields: Seq[String]): DetailQueryPlan = {
    val qtoks = question.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val mentioned = schemaFields.filter(f => qtoks.contains(f.toLowerCase))
    DetailQueryPlan(
      resolveProjectionCollisions(("filename" +: mentioned).distinct),
      None,
      s"fields mentioned in question: ${mentioned.mkString(",")}")
  }

  // ---- L6: document selection for detailed query ----
  /** L6 — `qa_document_processor.py:25-150`: dedup candidates keep-max
    * per doc, rank by score, cap at 2×limit, short-circuit when < 2
    * candidates; the (pluggable) selector's picks are validated
    * against the candidate set (J8) and an empty/invalid selection
    * falls back to top-n. The default selector IS the fallback
    * (deterministic top-limit), matching the reference's behavior when
    * the AI leg fails. */
  def selectDocumentsForDetail(candidates: Seq[(String, Double)], limit: Int = 3,
      selector: Seq[String] => Seq[String] = null): Seq[String] = {
    val uniq = candidates.groupBy(_._1).map { case (id, xs) => (id, xs.map(_._2).max) }
      .toSeq.sortBy { case (id, sc) => (-sc, id) }
    val cand = uniq.take(math.min(limit * 2, uniq.size)).map(_._1)
    if (cand.size < 2) return cand
    val picks = Option(selector).map(_.apply(cand)).getOrElse(cand.take(limit))
    val valid = cand.toSet
    val validated = picks.filter(valid)
    if (validated.nonEmpty) validated.take(limit)
    else cand.take(math.min(limit, cand.size))
  }

  // ---- L8: clarification generation stub ----
  /** L8 — the deterministic (AI-failure fallback) contract from
    * `question_classifier_service.py:376-393`: a default clarification
    * question with suggested responses and the missing-information
    * slots. */
  case class Clarification(question: String, reasoning: String,
                           suggestedResponses: Seq[String],
                           missingInformation: Seq[String])
  def stubClarification(originalQuestion: String, ambiguityReason: String): Clarification =
    Clarification(
      "能否請您提供更多細節?",
      s"deterministic stub for: $ambiguityReason",
      Seq("提供更多信息", "詳細說明"),
      Seq("具體內容"))

  /** L10 — suggested-questions time-based templates, the deterministic
    * leg of `suggested_questions_generator.py:459-490` (per-cluster
    * questions are LLM-generated in the reference; the cluster-name
    * template below stands in). */
  val TimeQuestionTemplates: Seq[String] = Seq(
    "幫我總結最近上傳的文件",
    "最近更新的文件有哪些重要信息？",
    "比較最近一週和上個月的文件有什麼變化",
    "最新的文件提到了哪些重要事項？")

  // ---- X2: standard QA flow over the embeddings/documents fixture ----
  /** Rewrite → route → multi-query weighted search → doc join →
    * context assembly with confidence (LLM answer step stubbed). */
  def standardQa(s: SparkSession, d: String, queryVecIds: Seq[Long], k: Int): DataFrame = {
    val e = Tables.embeddings(s, d)
    // All query vectors in ONE action (Search.qvecs) — the three
    // sequential .head() jobs here were round 3's x2_standard_qa
    // 11.6× bench regression.
    val qvecs = Search.qvecs(s, d, queryVecIds)
    val weights = Seq(1.3, 1.1, 1.0).take(qvecs.size)
    val results = Search.multiQueryMerge(e, qvecs, weights, 2 * k, k)
    results.join(Tables.documents(s, d), results("vec_id") === col("doc_id"))
      .withColumn("confidence", least(lit(0.9), lit(0.3) + lit(0.1) * lit(k.toDouble)))
      .select(col("label"), col("vec_id"), col("wsim"), col("doc_id"), col("confidence"))
      .orderBy(col("wsim").desc, col("vec_id").asc)
  }

  // ---- X3: intelligent QA — classify → route → handler ----
  sealed trait QaResult
  case class DirectReply(intent: String, reply: String) extends QaResult
  case class SearchPlan(intent: String, strategy: SearchStrategy,
                        rewrites: Seq[String]) extends QaResult

  /** Intelligent-QA routing (`qa_orchestrator.py:94-195`): greeting/
    * chitchat answer directly; clarification asks back; search-like
    * intents produce a search plan (rewrite + strategy) for the
    * engine. The LLM classify/rewrite stages are the deterministic
    * stubs; real deployments swap them behind the same LlmTask shape.
    */
  def intelligentQa(question: String, granularity: String = "unknown"): QaResult =
    classifyIntentRules(question) match {
      case "greeting" => DirectReply("greeting", "Hello! Ask me about your documents.")
      case "clarification_needed" =>
        DirectReply("clarification_needed", "Could you be more specific?")
      case intent =>
        SearchPlan(intent, routeStrategy(granularity, None), StubQueryRewrite(question))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L4 — rule-based intent classification as a batch column op.
    "l4_intent_rules" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("q", substring(col("text"), 1, 8))
        .withColumn("intent",
          when(length(trim(col("q"))) < 5, "clarification_needed")
            .otherwise("document_search"))
        .select("doc_id", "intent")
        .orderBy("doc_id")),

    // X2 — composite standard-QA flow, hash-exact: the query vectors
    // come from the embeddings table (batch qvecs collect), so the
    // whole rewrite→multi-query-merge→doc-join→confidence flow is
    // SQL-mirrorable (the v8 merge body + documents join + the
    // constant confidence formula).
    "x2_standard_qa" -> ((s, d) => standardQa(s, d, Seq(0L, 1L, 2L), 5)),

    // X4 — the streaming-QA emission stage (`qa_orchestrator.py:
    // 464-801`): the answer is emitted as an SSE event stream —
    // progress first, then the answer text in 50-char chunks, then a
    // metadata record. As a batch relation: one row per event with a
    // deterministic sequence number; the serving layer is a trivial
    // ordered iterator over this. (Answer assembly here uses the
    // document text directly so the whole event stream is
    // oracle-exact; the embedder-dependent retrieval feeding a real
    // answer is covered by x2.)
    "x4_stream_qa" -> ((s, d) => {
      val answers = Tables.documents(s, d).filter(col("doc_id") < 5)
        .select(col("doc_id").as("q_id"),
          concat(lit("Answer: "), substring(col("text"), 1, 120)).as("answer"))
      val lastIdx = expr("(length(answer) - 1) div 50")
      val chunks = answers
        .select(col("q_id"), col("answer"),
          posexplode(transform(sequence(lit(0), lastIdx.cast("int")),
            i => substring(col("answer"), (i * 50 + 1).cast("int"), lit(50))))
            .as(Seq("idx", "payload")))
        .select(col("q_id"), (col("idx") + 1).cast("long").as("seq"),
          lit("chunk").as("event"), length(col("payload")).cast("long").as("len"),
          md5(col("payload")).as("payload_md5"))
      val progress = answers.select(col("q_id"), lit(0L).as("seq"),
        lit("progress").as("event"), lit(0L).as("len"),
        lit(null).cast("string").as("payload_md5"))
      val meta = answers.select(col("q_id"), (lastIdx + 2).cast("long").as("seq"),
        lit("metadata").as("event"), length(col("answer")).cast("long").as("len"),
        md5(col("answer")).as("payload_md5"))
      progress.unionByName(chunks).unionByName(meta)
        .orderBy("q_id", "seq")
    }),

    // X8 — the end-to-end detail-query flow (the 7th intent handler,
    // `document_detail_query_handler.py:280-360`): D5-shaped candidate
    // scoring → L6 selection (2×limit cap, fallback top-n) with
    // reference numbering → L5 stub plan (fields mentioned in the
    // question, P8 collision-resolved) → P7 projection of exactly the
    // planned fields. The plan is generated driver-side from the
    // question string alone (no Spark action), so the whole flow is
    // hash-exact against the oracle.
    // T12 — dynamic-field schema discovery under an exact oracle: a
    // synthetic open-schema map column (string/int/float values plus
    // row-varying keys) over the FIVE lowest doc_ids (the sample is
    // ordered, so the driver-side ≤n-row sampling contract is
    // deterministic); the discovered field → "name (type)" map is the
    // output. The oracle pins the classifier branches and the
    // key-merge across rows.
    "t12_schema_discovery" -> ((s, d) => {
      val base = Tables.documents(s, d).orderBy("doc_id")
        .withColumn("m", map(
          lit("lang"), col("lang"),
          lit("n_chars"), col("n_chars").cast("string"),
          lit("score"), concat(col("doc_id").cast("string"), lit(".5")),
          concat(lit("extra_"), (col("doc_id") % 2).cast("string")), lit("x")))
      val discovered = discoverSchema(base, "m", 5)
      import s.implicits._
      discovered.toSeq.toDF("field", "described").orderBy("field")
    }),

    // L8 — clarification generation (the deterministic stub contract,
    // `clarification...` reference flow): ambiguity reasons cycle by
    // doc_id over a 30-doc sample; the stub's question/responses/slots
    // and the reason-bearing reasoning line are the hashed output.
    "l8_clarification" -> ((s, d) => {
      val reason = when(col("doc_id") % 3 === 0, "missing_timeframe")
        .when(col("doc_id") % 3 === 1, "ambiguous_subject")
        .otherwise("underspecified_scope")
      val clarU = udf((r: String) => {
        val c = stubClarification("q", r)
        (c.question, c.reasoning, c.suggestedResponses.mkString("|"),
          c.missingInformation.mkString("|"))
      })
      Tables.documents(s, d).filter(col("doc_id") < 30)
        .withColumn("c", clarU(reason))
        .select(col("doc_id"), col("c._1").as("question"),
          col("c._2").as("reasoning"), col("c._3").as("suggested"),
          col("c._4").as("missing"))
        .orderBy("doc_id")
    }),

    // P8 — projection-collision removal as a RELATION (the driver-side
    // helper's set semantics, distributed): per doc, a path is kept iff
    // no strictly-deeper path of the same doc exists. The anti join has
    // an equi key (doc_id) with the descendant test as residual — SMJ/
    // BHJ LeftAnti, never a nested loop. Fixture paths cycle collision
    // patterns by doc_id so every branch (parent dropped at depth 1 and
    // 2, lone child kept, disjoint trees untouched) appears.
    "p8_projection_collision" -> ((s, d) => {
      val paths = Tables.documents(s, d).select(col("doc_id"),
        explode(array(
          lit("enriched_data"),
          when(col("doc_id") % 2 === 0, lit("enriched_data.entities")),
          when(col("doc_id") % 3 === 0, lit("enriched_data.entities.vendor")),
          when(col("doc_id") % 5 === 0, lit("cluster_info")),
          lit("cluster_info.cluster_id"),
          when(col("doc_id") % 7 === 0, lit("tags")))).as("path"))
        .filter(col("path").isNotNull)
      val descendants = paths.select(col("doc_id").as("q_doc"), col("path").as("q"))
      paths.join(descendants,
          col("doc_id") === col("q_doc") &&
            col("q").startsWith(concat(col("path"), lit("."))),
          "left_anti")
        .orderBy("doc_id", "path")
    }),

    "x8_detail_query" -> ((s, d) => {
      import graft.operators.TextAnalysis.tokens
      import org.apache.spark.sql.expressions.Window
      val question = "show the summary and keywords where vector join dup appear"
      val qTerms = Seq("vector", "join", "dup")
      val docs = Tables.documents(s, d)
      val cands = docs
        .withColumn("score",
          size(array_intersect(array_distinct(tokens(col("text"))),
            typedLit(qTerms))).cast("double"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(6) // L6: max_candidates = 2 × limit
      val selected = cands.orderBy(col("score").desc, col("doc_id").asc).limit(3)
        .withColumn("ref_no", row_number().over(
          graft.functions.BoundedWindow.orderBy(col("doc_id"),
            col("score").desc, col("doc_id").asc)).cast("long"))
      val plan = stubMongoQueryGen(question, Seq("summary", "keywords", "lang", "source"))
      val fieldCols: Map[String, org.apache.spark.sql.Column] = Map(
        "filename" -> concat(lit("doc_"), col("doc_id")),
        "summary" -> substring(col("text"), 1, 80),
        "keywords" -> concat_ws(",", slice(tokens(col("text")), 1, 3)),
        "lang" -> col("lang"),
        "source" -> col("source"))
      val projCols = plan.projection.map(f => fieldCols(f).as(f))
      selected
        .select(col("doc_id") +: col("ref_no") +: col("score") +: projCols: _*)
        .orderBy("doc_id")
    }),

    // V10 — the strategy-routing table itself as a driver-verified
    // relation: every (granularity × suggestion) combination the
    // reference's router distinguishes (`search_strategy.py:12-41`) is
    // synthesized from doc_id, routed through the REAL routeStrategy,
    // and tallied — the truth table is hash-compared.
    "v10_route_strategy" -> ((s, d) => {
      val gArr = array(lit("thematic"), lit("detailed"), lit("unknown"), lit("other"))
      val sArr = array(lit(null).cast("string"), lit("summary_only"), lit("rrf_fusion"),
        lit("keyword_enhanced_rrf"), lit("hybrid_auto"))
      val routeU = udf((g: String, sg: String) =>
        routeStrategy(g, Option(sg)) match {
          case SummaryOnly => "summary_only"
          case RrfFusion   => "rrf_fusion"
          case Hybrid      => "hybrid"
        })
      Tables.documents(s, d)
        .withColumn("granularity", element_at(gArr, (col("doc_id") % 4 + 1).cast("int")))
        .withColumn("suggestion", element_at(sArr, (col("doc_id") % 5 + 1).cast("int")))
        .withColumn("strategy", routeU(col("granularity"), col("suggestion")))
        .withColumn("suggestion", coalesce(col("suggestion"), lit("none")))
        .groupBy("granularity", "suggestion", "strategy")
        .agg(count(lit(1)).as("n"))
        .orderBy("granularity", "suggestion", "strategy")
    }),

    // L1 — the text-analysis stub under an exact oracle: summary =
    // smartTruncate(text, 100) (the t2 SQL branch mirror at 100-char
    // thresholds 71/81), keywords = top-5 tokens by (count desc, token
    // asc), auto_title = first 3 tokens — the whole
    // `AITextAnalysisOutput` stand-in is hash-compared.
    "l1_text_analysis" -> ((s, d) => {
      val u = udf((t: String) => {
        val o = StubTextAnalysis(t)
        (o.summary, o.keywords.mkString(","), o.autoTitle)
      })
      Tables.documents(s, d).filter(col("n_chars") > 0)
        .withColumn("r", u(col("text")))
        .select(col("doc_id"), md5(col("r._1")).as("summary_md5"),
          length(col("r._1")).cast("long").as("summary_len"),
          col("r._2").as("keywords"), col("r._3").as("auto_title"))
        .orderBy("doc_id")
    }),

    // L3+L7 — rewrite expansion and answer confidence as one relation:
    // each doc's question expands to the stub's 3 rewrites
    // (posexploded) and carries the confidence heuristic at a per-doc
    // context count — both formulas hash-compared (confidence uses
    // ::DOUBLE literals in the oracle so both engines run the same
    // IEEE op sequence).
    "l3_l7_qa_plan" -> ((s, d) => {
      val rw = udf((q: String) => StubQueryRewrite(q))
      val conf = udf((n: Int) => answerConfidence(n))
      Tables.documents(s, d).filter(col("n_chars") > 0)
        .withColumn("question", substring(col("text"), 1, 30))
        .select(col("doc_id"), posexplode(rw(col("question"))).as(Seq("seq", "rewrite")))
        .withColumn("confidence", conf((col("doc_id") % 12).cast("int")))
        .select(col("doc_id"), col("seq").cast("long").as("seq"), col("rewrite"),
          col("confidence"))
        .orderBy("doc_id", "seq")
    }),

    // L2 — image analysis over an image-shaped binary fixture (text
    // bytes standing in for pixels, as Multimodal does): the stub's
    // decode → content_type → OCR-leg → key-information flow runs as a
    // map-only UDF over the binary column and every output field is
    // hash-compared (the stub arithmetic is mirrored in the oracle).
    "l2_image_analysis" -> ((s, d) => {
      val u = udf((b: Array[Byte]) => {
        val o = StubImageAnalysis(b)
        (o.initialSummary, o.extractedText.orNull, o.contentType,
          o.keyInformation.mkString(","))
      })
      Tables.documents(s, d).filter(col("n_chars") > 0)
        .withColumn("content", col("text").cast("binary"))
        .withColumn("r", u(col("content")))
        .select(col("doc_id"), col("r._1").as("initial_summary"),
          col("r._2").as("extracted_text"), col("r._3").as("content_type"),
          col("r._4").as("key_info"))
        .orderBy("doc_id")
    }),

    // L10 — suggested-questions generation: one templated question per
    // cluster (cluster name = the C4 rank-1 keyword; the reference's
    // LLM leg swapped for the deterministic template) plus the four
    // time-based template questions (suggested_questions_generator.py:
    // 459-490). The <3-documents gating lives with the caller (spec'd).
    "l10_suggested_questions" -> ((s, d) => {
      import graft.operators.TextAnalysis.tokens
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      val docs = Tables.documents(s, d)
      val toks = e.join(docs, col("doc_id") === col("vec_id"))
        .select(col("label"), explode(tokens(col("text"))).as("tok"))
      val names = toks.groupBy("label", "tok").agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("label").orderBy(col("n").desc, col("tok").asc)))
        .filter(col("rnk") === 1)
        .select(col("label"), col("tok").as("cluster_name"))
      val perCluster = names.select(col("label").cast("long").as("category"),
        lit("cluster").as("qtype"),
        concat(lit("關於「"), col("cluster_name"), lit("」的文件有哪些重點？")).as("question"))
      import s.implicits._
      val timeQs = TimeQuestionTemplates.map(q => (-1L, "time_based", q))
        .toDF("category", "qtype", "question")
      perCluster.unionByName(timeQs).orderBy("category", "question")
    }),

    // X3 — the intelligent-QA routing stage as a batch column op:
    // rule-classify intent (L4), derive granularity, choose direct
    // reply vs search, and pick the search strategy (V10 routing:
    // thematic → summary_only, else rrf_fusion). Pure CASE logic →
    // exact oracle; the executed search legs are oracle-checked
    // separately (v5/v6).
    "x3_intelligent_route" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("q", substring(col("text"), 1, 8))
        .withColumn("intent",
          when(length(trim(col("q"))) < 5, "clarification_needed")
            .otherwise("document_search"))
        .withColumn("granularity",
          when(col("n_chars") > 800, "detailed").otherwise("thematic"))
        .withColumn("action",
          when(col("intent") === "clarification_needed", "direct_reply")
            .otherwise("search"))
        .withColumn("strategy",
          when(col("action") === "direct_reply", lit(null).cast("string"))
            .otherwise(when(col("granularity") === "thematic", "summary_only")
              .otherwise("rrf_fusion")))
        .select("doc_id", "intent", "granularity", "action", "strategy")
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    "l4_intent_rules" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(substr(text, 1, 8))) < 5 THEN 'clarification_needed'
        |       ELSE 'document_search' END AS intent
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x4_stream_qa" ->
      """WITH answers AS (
        |  SELECT doc_id AS q_id, 'Answer: ' || substr(text, 1, 120) AS answer
        |  FROM documents WHERE doc_id < 5),
        |chunks AS (
        |  SELECT q_id, (i + 1)::BIGINT AS seq, 'chunk' AS event,
        |    length(substr(answer, (i * 50 + 1)::INT, 50))::BIGINT AS len,
        |    md5(substr(answer, (i * 50 + 1)::INT, 50)) AS payload_md5
        |  FROM answers,
        |    LATERAL unnest(generate_series(0, ((length(answer) - 1) // 50)::INT)) AS t(i)),
        |progress AS (
        |  SELECT q_id, 0::BIGINT AS seq, 'progress' AS event, 0::BIGINT AS len,
        |         NULL::VARCHAR AS payload_md5 FROM answers),
        |meta AS (
        |  SELECT q_id, ((length(answer) - 1) // 50 + 2)::BIGINT AS seq,
        |         'metadata' AS event, length(answer)::BIGINT AS len,
        |         md5(answer) AS payload_md5 FROM answers)
        |SELECT q_id, seq, event, len, payload_md5 FROM (
        |  SELECT * FROM progress UNION ALL
        |  SELECT * FROM chunks UNION ALL
        |  SELECT * FROM meta)
        |ORDER BY q_id, seq""".stripMargin,
    "t12_schema_discovery" ->
      """SELECT field, described FROM (VALUES
        |  ('extra_0', 'extra_0 (str)'), ('extra_1', 'extra_1 (str)'),
        |  ('lang', 'lang (str)'), ('n_chars', 'n_chars (int)'),
        |  ('score', 'score (float)')) AS t(field, described)
        |ORDER BY field""".stripMargin,
    "l8_clarification" ->
      """SELECT doc_id, '能否請您提供更多細節?' AS question,
        |  'deterministic stub for: ' ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'missing_timeframe'
        |          WHEN doc_id % 3 = 1 THEN 'ambiguous_subject'
        |          ELSE 'underspecified_scope' END) AS reasoning,
        |  '提供更多信息|詳細說明' AS suggested,
        |  '具體內容' AS missing
        |FROM documents WHERE doc_id < 30 ORDER BY doc_id""".stripMargin,
    "p8_projection_collision" ->
      """WITH paths AS (
        |  SELECT doc_id, path FROM (
        |    SELECT doc_id, unnest([
        |      'enriched_data',
        |      CASE WHEN doc_id % 2 = 0 THEN 'enriched_data.entities' END,
        |      CASE WHEN doc_id % 3 = 0 THEN 'enriched_data.entities.vendor' END,
        |      CASE WHEN doc_id % 5 = 0 THEN 'cluster_info' END,
        |      'cluster_info.cluster_id',
        |      CASE WHEN doc_id % 7 = 0 THEN 'tags' END]) AS path
        |    FROM documents)
        |  WHERE path IS NOT NULL)
        |SELECT doc_id, path FROM paths p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM paths q
        |  WHERE q.doc_id = p.doc_id AND starts_with(q.path, p.path || '.'))
        |ORDER BY doc_id, path""".stripMargin,
    "x8_detail_query" ->
      """WITH scored AS (
        |  SELECT doc_id, text, lang, source,
        |    CAST(len(list_intersect(list_distinct(list_filter(string_split(text, ' '), t -> t <> '')),
        |                            ['vector','join','dup'])) AS DOUBLE) AS score
        |  FROM documents),
        |cands AS (SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT 6),
        |sel AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS ref_no
        |  FROM (SELECT * FROM cands ORDER BY score DESC, doc_id ASC LIMIT 3))
        |SELECT doc_id, ref_no, score,
        |  'doc_' || doc_id AS filename,
        |  substr(text, 1, 80) AS summary,
        |  array_to_string(list_filter(string_split(text, ' '), t -> t <> '')[1:3], ',') AS keywords
        |FROM sel ORDER BY doc_id""".stripMargin,
    "x2_standard_qa" -> {
      def qn(i: Int) = s"(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = $i)"
      s"""WITH b AS (
         |  SELECT label, vec_id, sim * 1.3::DOUBLE AS wsim FROM (
         |    SELECT label, vec_id, list_inner_product(embedding::DOUBLE[], ${qn(0)}) AS sim
         |    FROM embeddings WHERE list_inner_product(embedding::DOUBLE[], ${qn(0)}) >= 0.0
         |    ORDER BY sim DESC, vec_id ASC LIMIT 10)
         |  UNION ALL
         |  SELECT label, vec_id, sim * 1.1::DOUBLE AS wsim FROM (
         |    SELECT label, vec_id, list_inner_product(embedding::DOUBLE[], ${qn(1)}) AS sim
         |    FROM embeddings WHERE list_inner_product(embedding::DOUBLE[], ${qn(1)}) >= 0.0
         |    ORDER BY sim DESC, vec_id ASC LIMIT 10)
         |  UNION ALL
         |  SELECT label, vec_id, sim * 1.0::DOUBLE AS wsim FROM (
         |    SELECT label, vec_id, list_inner_product(embedding::DOUBLE[], ${qn(2)}) AS sim
         |    FROM embeddings WHERE list_inner_product(embedding::DOUBLE[], ${qn(2)}) >= 0.0
         |    ORDER BY sim DESC, vec_id ASC LIMIT 10)),
         |m AS (
         |  SELECT label, vec_id, wsim FROM (
         |    SELECT label, vec_id, wsim,
         |           row_number() OVER (PARTITION BY label ORDER BY wsim DESC, vec_id ASC) AS rn
         |    FROM b)
         |  WHERE rn = 1 ORDER BY wsim DESC, label ASC LIMIT 5)
         |SELECT m.label, m.vec_id, m.wsim, d.doc_id,
         |  least(0.9::DOUBLE, 0.3::DOUBLE + 0.1::DOUBLE * 5.0::DOUBLE) AS confidence
         |FROM m JOIN documents d ON d.doc_id = m.vec_id
         |ORDER BY m.wsim DESC, m.vec_id ASC""".stripMargin
    },
    "v10_route_strategy" ->
      """WITH base AS (
        |  SELECT (['thematic','detailed','unknown','other'])[(doc_id % 4 + 1)::INT] AS granularity,
        |         ([NULL,'summary_only','rrf_fusion','keyword_enhanced_rrf','hybrid_auto'])[(doc_id % 5 + 1)::INT] AS suggestion
        |  FROM documents),
        |routed AS (
        |  SELECT granularity, coalesce(suggestion, 'none') AS suggestion,
        |    CASE WHEN granularity = 'thematic' THEN 'summary_only'
        |         WHEN granularity IN ('detailed', 'unknown') THEN 'rrf_fusion'
        |         WHEN suggestion = 'summary_only' THEN 'summary_only'
        |         WHEN suggestion IN ('rrf_fusion', 'keyword_enhanced_rrf') THEN 'rrf_fusion'
        |         ELSE 'hybrid' END AS strategy
        |  FROM base)
        |SELECT granularity, suggestion, strategy, count(*) AS n
        |FROM routed GROUP BY 1, 2, 3
        |ORDER BY granularity, suggestion, strategy""".stripMargin,
    "l1_text_analysis" ->
      """WITH pos AS (
        |  SELECT doc_id, text AS s, substr(text, 1, 100) AS cut
        |  FROM documents WHERE n_chars > 0),
        |tr AS (
        |  SELECT doc_id, s, cut,
        |    greatest(
        |      CASE WHEN strpos(reverse(cut), '.') > 0
        |           THEN length(cut) - strpos(reverse(cut), '.') + 1 ELSE 0 END,
        |      CASE WHEN strpos(reverse(cut), '!') > 0
        |           THEN length(cut) - strpos(reverse(cut), '!') + 1 ELSE 0 END,
        |      CASE WHEN strpos(reverse(cut), '?') > 0
        |           THEN length(cut) - strpos(reverse(cut), '?') + 1 ELSE 0 END) AS last_end,
        |    CASE WHEN strpos(reverse(cut), ' ') > 0
        |         THEN length(cut) - strpos(reverse(cut), ' ') + 1 ELSE 0 END AS last_space
        |  FROM pos),
        |summ AS (
        |  SELECT doc_id,
        |    CASE WHEN length(s) <= 100 THEN s
        |         WHEN last_end >= 71 THEN substr(cut, 1, last_end)
        |         WHEN last_space >= 81 THEN substr(cut, 1, last_space - 1) || '...'
        |         ELSE cut || '...' END AS summary
        |  FROM tr),
        |toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS tok
        |  FROM documents WHERE n_chars > 0),
        |kw AS (
        |  SELECT doc_id, tok,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, tok ASC) AS rnk
        |  FROM toks GROUP BY doc_id, tok),
        |kws AS (
        |  SELECT doc_id, array_to_string(list(tok ORDER BY rnk), ',') AS keywords
        |  FROM kw WHERE rnk <= 5 GROUP BY doc_id),
        |title AS (
        |  SELECT doc_id,
        |    array_to_string(list_filter(string_split(lower(text), ' '), t -> t <> '')[1:3], ' ') AS auto_title
        |  FROM documents WHERE n_chars > 0)
        |SELECT su.doc_id, md5(su.summary) AS summary_md5,
        |  length(su.summary)::BIGINT AS summary_len,
        |  coalesce(k.keywords, '') AS keywords,
        |  coalesce(t.auto_title, '') AS auto_title
        |FROM summ su
        |LEFT JOIN kws k USING (doc_id)
        |LEFT JOIN title t USING (doc_id)
        |ORDER BY su.doc_id""".stripMargin,
    "l3_l7_qa_plan" ->
      """WITH base AS (
        |  SELECT doc_id, substr(text, 1, 30) AS q,
        |    least(0.9::DOUBLE, 0.3::DOUBLE + 0.1::DOUBLE * (doc_id % 12)) AS confidence
        |  FROM documents WHERE n_chars > 0),
        |rw AS (
        |  SELECT doc_id, unnest([
        |      {'seq': 0, 'r': q},
        |      {'seq': 1, 'r': q || ' details'},
        |      {'seq': 2, 'r': 'about ' || q}], recursive := true) ,
        |    confidence
        |  FROM base)
        |SELECT doc_id, CAST(seq AS BIGINT) AS seq, r AS rewrite, confidence
        |FROM rw ORDER BY doc_id, seq""".stripMargin,
    "l2_image_analysis" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    64 + strlen(text) % 512 AS w,
        |    64 + (strlen(text) // 2) % 512 AS h,
        |    (1 + strlen(text) % 3)::INT AS c
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id,
        |  '圖片 ' || w || 'x' || h || ' ' || c || 'ch' AS initial_summary,
        |  CASE WHEN c = 1 THEN substr(text, 1, 60) END AS extracted_text,
        |  CASE c WHEN 1 THEN 'document_scan' WHEN 2 THEN 'diagram'
        |         ELSE 'photo' END AS content_type,
        |  CASE WHEN c = 1 THEN array_to_string(
        |      list_filter(string_split(lower(substr(text, 1, 60)), ' '), t -> t <> '')[1:3], ',')
        |    ELSE '' END AS key_info
        |FROM base ORDER BY doc_id""".stripMargin,
    "l10_suggested_questions" ->
      """WITH names AS (
        |  SELECT label, tok AS cluster_name FROM (
        |    SELECT label, tok,
        |           row_number() OVER (PARTITION BY label ORDER BY count(*) DESC, tok ASC) AS rnk
        |    FROM (SELECT e.label, unnest(list_filter(string_split(d.text, ' '), t -> t <> '')) AS tok
        |          FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id)
        |    GROUP BY label, tok) WHERE rnk = 1),
        |per_cluster AS (
        |  SELECT CAST(label AS BIGINT) AS category, 'cluster' AS qtype,
        |         '關於「' || cluster_name || '」的文件有哪些重點？' AS question
        |  FROM names),
        |time_qs AS (
        |  SELECT CAST(-1 AS BIGINT) AS category, 'time_based' AS qtype, unnest([
        |    '幫我總結最近上傳的文件',
        |    '最近更新的文件有哪些重要信息？',
        |    '比較最近一週和上個月的文件有什麼變化',
        |    '最新的文件提到了哪些重要事項？']) AS question)
        |SELECT category, qtype, question
        |FROM (SELECT * FROM per_cluster UNION ALL SELECT * FROM time_qs)
        |ORDER BY category, question""".stripMargin,
    "x3_intelligent_route" ->
      """SELECT doc_id, intent, granularity, action,
        |  CASE WHEN action = 'direct_reply' THEN NULL
        |       WHEN granularity = 'thematic' THEN 'summary_only'
        |       ELSE 'rrf_fusion' END AS strategy
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(substr(text, 1, 8))) < 5 THEN 'clarification_needed'
        |         ELSE 'document_search' END AS intent,
        |    CASE WHEN n_chars > 800 THEN 'detailed' ELSE 'thematic' END AS granularity,
        |    CASE WHEN length(trim(substr(text, 1, 8))) < 5 THEN 'direct_reply'
        |         ELSE 'search' END AS action
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}
