package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import graft.Tables
import graft.operators.TextAnalysis.tokens

/** CCNet-style language-model perplexity filtering (Wenzek et al.
  * 2019, "CCNet: Extracting high quality monolingual datasets from
  * web crawl data", public arXiv 1911.00359) — the classic web-corpus
  * curation pass this engine's funnel family was still missing: train
  * a small LM on a trusted seed corpus, score every document's
  * cross-entropy under it, and split each language into head / middle
  * / tail perplexity buckets (CCNet §4.3 keeps head+middle for
  * training). The paper uses a 5-gram KenLM; the trained half here is
  * a bigram LM over a bounded top-`vocabSize` vocabulary with
  * everything else collapsed to `<unk>` — the same bounded-model-state
  * move as the BM25 idf table and the quality classifier, so the model
  * broadcasts inside one expression and scoring is a MAP-ONLY pass.
  *
  * ENGINE PARITY (why there is no `ln` anywhere): per-token code
  * lengths are QUANTIZED to eighth-bits via the all-integer
  * `qlog8(x) = 8·⌊log2 x⌋ + ⌊8·x / 2^⌊log2 x⌋⌋ − 8` — the
  * piecewise-linear-per-octave log2 (monotone, exact integer ops,
  * replayed in DuckDB as `length(bin(x))`-arithmetic), so the per-doc
  * NLL is an exact integer sum in ANY association order and the only
  * doubles in the query are correctly-rounded divisions of exact
  * integers. A production deployment would sum float log-probs; the
  * quantization error is < 1 eighth-bit per token, far below the
  * head/middle/tail decision granularity, and it buys a hash-exact
  * oracle (the established ta_entropy/lnTable trade, without the
  * 256-entry table ceiling).
  *
  * Scale shape: model build = one explode + map-side-combined
  * groupBy over the SEED slice only, collected at ≤ (vocab+2)² rows;
  * scoring = one BigramNll projection over the corpus scan (zero
  * shuffles, zero joins — slots into a Structured Streaming
  * micro-batch unchanged); bucket thresholds come from a BOUNDED
  * deterministic per-language sample (md5-rank ≤ 1024, the
  * ivfTrainSampled pattern) rather than a corpus-wide per-language
  * sort — CCNet likewise computes its percentile cutoffs offline on
  * a fraction of the data — and the final bucket assignment is a
  * broadcast join + CASE, map-only again.
  */
object Perplexity {

  /** Eighth-bit quantized log2: 8·⌊log2 x⌋ + ⌊8x/2^⌊log2 x⌋⌋ − 8
    * for x ≥ 1. Monotone non-decreasing; qlog8(1) = 0; exact integer
    * arithmetic (DuckDB twin: 8·(length(bin(x))−1) + ...). */
  private[graft] def qlog8(x: Long): Long = {
    val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
    8L * b + ((x << 3) >> b) - 8L
  }

  private[graft] val Unk = "<unk>"
  private[graft] val Bos = "<s>"

  /** Trained bigram model as bounded parallel arrays (plan-shippable,
    * canonical-equality friendly): seen-bigram code lengths
    * qlog8(c(v,w)+1) and per-context denominators qlog8(c(v)+V+1)
    * where V = vocabSize (next-symbol alphabet = vocab ∪ unk).
    * Contexts cover vocab ∪ {unk, bos} COMPLETELY (zero-count
    * contexts included) so scoring never needs a fallback branch. */
  private[graft] case class PplModel(vocab: Array[String],
      bgV: Array[String], bgW: Array[String], bgQ: Array[Long],
      ctxK: Array[String], ctxQ: Array[Long])

  /** Train on the docs whose `source` is in `seedSources`: vocab =
    * top-`vocabSize` seed tokens (count desc, tok asc — a bounded
    * TakeOrdered, never a full sort), bigram counts over
    * BOS-prefixed mapped token sequences. The O(vocab)-per-token
    * array_contains mapping runs over the SEED slice only (a training
    * pass, like the classifier's); the corpus-wide pass uses
    * BigramNll's hash lookups instead. */
  private[graft] def perplexityModel(docs: DataFrame, seedSources: Seq[String],
                                     vocabSize: Int = 256): PplModel = {
    val seed = docs.filter(col("source").isin(seedSources: _*))
    val vocab = seed
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
      .collect().map(_.getString(0))
    val vlit = typedLit(vocab)
    val bg = seed
      .withColumn("m", transform(tokens(col("text")),
        t => when(array_contains(vlit, t), t).otherwise(lit(Unk))))
      .filter(size(col("m")) >= 1)
      .select(explode(transform(sequence(lit(1), size(col("m"))),
        i => struct(
          when(i === 1, lit(Bos)).otherwise(element_at(col("m"), i - 1)).as("v"),
          element_at(col("m"), i).as("w")))).as("b"))
      .groupBy(col("b.v").as("v"), col("b.w").as("w"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val cv = bg.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ctxKeys = (vocab.toSeq :+ Unk :+ Bos).sorted.toArray
    PplModel(vocab,
      bg.map(_._1), bg.map(_._2), bg.map(t => qlog8(t._3 + 1L)),
      ctxKeys, ctxKeys.map(v => qlog8(cv.getOrElse(v, 0L) + vocabSize + 1L)))
  }

  /** (doc_id, lang, n_tokens, nll_q, xent8) for every doc: one
    * map-only BigramNll projection; xent8 = quantized eighth-bits of
    * cross-entropy per token (one exact integer-to-integer double
    * division). */
  private[graft] def perplexityScore(docs: DataFrame, m: PplModel): DataFrame =
    docs
      .withColumn("ns", org.apache.spark.sql.GraftBridge.column(BigramNll(
        org.apache.spark.sql.GraftBridge.expression(tokens(col("text"))),
        m.vocab, m.bgV, m.bgW, m.bgQ, m.ctxK, m.ctxQ)))
      .filter(col("ns.n_tokens") > 0)
      .select(col("doc_id"), col("lang"),
        col("ns.n_tokens").as("n_tokens"), col("ns.nll").as("nll_q"))
      .withColumn("xent8",
        col("nll_q").cast("double") / col("n_tokens").cast("double"))

  /** Head/middle/tail cutoffs per language from a bounded
    * deterministic sample: the ≤ `sampleCap` docs per lang with the
    * smallest md5("pxs:"+doc_id) (keys-only rank window over the
    * scored relation), tercile values at ranks ⌈m/3⌉ and ⌈2m/3⌉ by
    * (xent8, doc_id). Returns (lang, t1, t2) — ≤ one row per lang. */
  private[graft] def pplCutoffs(scored: DataFrame, sampleCap: Int = 1024): DataFrame = {
    val wS = Window.partitionBy("lang")
      .orderBy(md5(concat(lit("pxs:"), col("doc_id").cast("string"))), col("doc_id"))
    val wR = Window.partitionBy("lang").orderBy(col("xent8"), col("doc_id"))
    scored
      .withColumn("rs", row_number().over(wS)).filter(col("rs") <= sampleCap)
      .withColumn("r", row_number().over(wR))
      .withColumn("mm", count(lit(1)).over(Window.partitionBy("lang")))
      .groupBy("lang")
      .agg(max(when(col("r") === expr("(mm + 2) div 3"), col("xent8"))).as("t1"),
        max(when(col("r") === expr("(2 * mm + 2) div 3"), col("xent8"))).as("t2"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CCNet perplexity filter end-to-end: train the bigram LM on the
    // seed sources, score the whole corpus map-only, bucket each
    // language by sampled tercile thresholds. head = most fluent
    // under the seed LM (CCNet keeps head+middle). Oracle replays
    // every stage: vocab top-k, BOS-prefixed bigram counts, the
    // qlog8 integer arithmetic via length(bin(x)), the md5-rank
    // sample, and the threshold CASE.
    "pp_perplexity_filter" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("n_chars") > 0)
      val model = perplexityModel(docs, Seq("src0", "src1", "src2", "src3"))
      val scored = perplexityScore(docs, model)
      val cuts = pplCutoffs(scored)
      scored.join(broadcast(cuts), "lang")
        .withColumn("ppl_bucket",
          when(col("xent8") <= col("t1"), "head")
            .when(col("xent8") <= col("t2"), "middle")
            .otherwise("tail"))
        .select("doc_id", "lang", "n_tokens", "nll_q", "xent8", "ppl_bucket")
        .orderBy("doc_id")
    })
  )

  private val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"
  private val seedsSql = "('src0','src1','src2','src3')"

  /** qlog8 as DuckDB SQL over an integer expression (see qlog8). */
  private def qSql(x: String): String =
    s"(8*(length(bin($x))-1) + (($x*8) // (1::BIGINT << (length(bin($x))-1))) - 8)"

  val oracles: Map[String, String] = Map(
    "pp_perplexity_filter" ->
      s"""WITH toked AS (
         |  SELECT doc_id, lang, source, $toksSql AS toks
         |  FROM documents WHERE n_chars > 0),
         |pos AS (
         |  SELECT doc_id, lang, source, i, toks[i] AS tok
         |  FROM toked, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)),
         |vcnt AS (
         |  SELECT tok, count(*) AS c FROM pos
         |  WHERE source IN $seedsSql GROUP BY 1),
         |vocab AS (SELECT tok FROM vcnt ORDER BY c DESC, tok ASC LIMIT 256),
         |m AS (
         |  SELECT p.doc_id, p.lang, p.source, p.i,
         |    CASE WHEN v.tok IS NOT NULL THEN p.tok ELSE '<unk>' END AS mt
         |  FROM pos p LEFT JOIN vocab v ON p.tok = v.tok),
         |mb AS (
         |  SELECT doc_id, lang, source, i,
         |    coalesce(lag(mt) OVER (PARTITION BY doc_id ORDER BY i), '<s>') AS v,
         |    mt AS w
         |  FROM m),
         |bc AS (
         |  SELECT v, w, count(*) AS c FROM mb
         |  WHERE source IN $seedsSql GROUP BY 1, 2),
         |cc AS (SELECT v, sum(c) AS cv FROM bc GROUP BY 1),
         |terms AS (
         |  SELECT mb.doc_id, mb.lang,
         |    (coalesce(cc.cv, 0) + 257)::BIGINT AS den,
         |    (coalesce(bc.c, 0) + 1)::BIGINT AS num
         |  FROM mb LEFT JOIN bc ON mb.v = bc.v AND mb.w = bc.w
         |          LEFT JOIN cc ON mb.v = cc.v),
         |scored AS (
         |  SELECT doc_id, lang, count(*)::BIGINT AS n_tokens,
         |    sum(${qSql("den")} - ${qSql("num")})::BIGINT AS nll_q
         |  FROM terms GROUP BY 1, 2),
         |sc2 AS (
         |  SELECT *, nll_q::DOUBLE / n_tokens::DOUBLE AS xent8 FROM scored),
         |samp AS (
         |  SELECT lang, xent8, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY md5('pxs:' || doc_id), doc_id) AS rs
         |  FROM sc2),
         |ranked AS (
         |  SELECT lang, xent8,
         |    row_number() OVER (PARTITION BY lang ORDER BY xent8, doc_id) AS r,
         |    count(*) OVER (PARTITION BY lang) AS mm
         |  FROM samp WHERE rs <= 1024),
         |cut AS (
         |  SELECT lang,
         |    max(CASE WHEN r = (mm + 2) // 3 THEN xent8 END) AS t1,
         |    max(CASE WHEN r = (2*mm + 2) // 3 THEN xent8 END) AS t2
         |  FROM ranked GROUP BY lang)
         |SELECT s.doc_id, s.lang, s.n_tokens, s.nll_q, s.xent8,
         |  CASE WHEN s.xent8 <= c.t1 THEN 'head'
         |       WHEN s.xent8 <= c.t2 THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket
         |FROM sc2 s JOIN cut c ON s.lang = c.lang
         |ORDER BY s.doc_id""".stripMargin
  )
}

/** Per-doc bigram-LM scorer: walks the token array once against the
  * bounded trained model with UTF8String-keyed hash lookups (the
  * QcScore pattern — no per-token String boxing, no O(vocab) scans)
  * and accumulates the EXACT INTEGER quantized NLL:
  * Σ qlog8(c(ctx)+V+1) − qlog8(c(ctx,tok)+1), unseen bigrams
  * contributing qlog8(1) = 0 via the missing-key default, contexts
  * always present (the model ships the complete context alphabet).
  * Returns struct(n_tokens, nll). CodegenFallback for the same
  * reason as QcScore: per-row fallback cost is negligible at doc
  * granularity while the inner loop stays allocation-free. */
case class BigramNll(child: Expression, vocab: Array[String],
    bgV: Array[String], bgW: Array[String], bgQ: Array[Long],
    ctxK: Array[String], ctxQ: Array[Long])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("nll", LongType, nullable = false)))

  /** Per-context node: the denominator code length plus this
    * context's seen-successor table — one lookup on `prev` serves
    * both, so the hot loop is exactly two hash probes per token
    * (vocab membership of the token + the prev node). */
  private final class Node(val den: Long) {
    val next = new java.util.HashMap[UTF8String, java.lang.Long]()
  }
  @transient private lazy val unk = UTF8String.fromString(Perplexity.Unk)
  @transient private lazy val bos = UTF8String.fromString(Perplexity.Bos)
  @transient private lazy val vset: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.length * 2)
    vocab.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }
  @transient private lazy val ctx: java.util.HashMap[UTF8String, Node] = {
    val m = new java.util.HashMap[UTF8String, Node](ctxK.length * 2)
    var i = 0
    while (i < ctxK.length) { m.put(UTF8String.fromString(ctxK(i)), new Node(ctxQ(i))); i += 1 }
    var j = 0
    while (j < bgV.length) {
      // every bigram context is in ctxK by construction (complete alphabet)
      m.get(UTF8String.fromString(bgV(j))).next
        .put(UTF8String.fromString(bgW(j)), bgQ(j))
      j += 1
    }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var prev = bos
    var s = 0L
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val m = if (vset.contains(t)) t else unk
        val node = ctx.get(prev)
        s += node.den
        val q = node.next.get(m)
        if (q != null) s -= q.longValue()
        prev = m
        cnt += 1L
      }
      i += 1
    }
    InternalRow(cnt, s)
  }

  // value equality over the model arrays (QcScore/AdcScore reasoning)
  override def equals(o: Any): Boolean = o match {
    case b: BigramNll => child == b.child &&
      java.util.Arrays.equals(vocab.asInstanceOf[Array[AnyRef]], b.vocab.asInstanceOf[Array[AnyRef]]) &&
      java.util.Arrays.equals(bgV.asInstanceOf[Array[AnyRef]], b.bgV.asInstanceOf[Array[AnyRef]]) &&
      java.util.Arrays.equals(bgW.asInstanceOf[Array[AnyRef]], b.bgW.asInstanceOf[Array[AnyRef]]) &&
      java.util.Arrays.equals(bgQ, b.bgQ) &&
      java.util.Arrays.equals(ctxK.asInstanceOf[Array[AnyRef]], b.ctxK.asInstanceOf[Array[AnyRef]]) &&
      java.util.Arrays.equals(ctxQ, b.ctxQ)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bgQ) + java.util.Arrays.hashCode(ctxQ)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
