package graft.evaluation

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{HashEmbedder, SyntheticEmbedder, SyntheticVec, VectorFunctions}
import graft.pipelines.IndexPipeline

/** Retrieval-quality evaluation harness (SURVEY.md §5.3): the
  * reference computes Hit-Rate@k, MRR and nDCG@k per query across 5
  * search modes (`evaluation/evaluate_vector_retrieval.py:68-74,
  * 320-322,357-396`; eval params top_k=5, threshold 0.3 `:146-148`).
  *
  * Golden dataset analogue of `generate_test_dataset.py`: each query
  * is a verbatim snippet of a document; the source document is the
  * single relevant result. All queries are scored in ONE plan per
  * mode: the query set (q_id, q_emb) is broadcast against the vectors
  * scan and ranks are per-query window functions — the batch-scoring
  * shape that amortizes one corpus scan over the whole query set at
  * 100 TB.
  */
object RetrievalEval {

  /** (q_id = source doc_id, q_emb) snippet queries. */
  def goldenQueries(docs: DataFrame, embedder: HashEmbedder, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val embUdf = udf((t: String) => embedder.embed(t))
    docs.filter(length(col("text")) >= 120)
      .orderBy("doc_id").limit(n)
      .select(col("doc_id").as("q_id"),
        embUdf(substring(col("text"), 40, 120)).as("q_emb"))
  }

  private def scored(vectors: DataFrame, queries: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(queries))
      .withColumn("sim", VectorFunctions.dot(col("embedding"), col("q_emb")))

  private def topkPerQuery(df: DataFrame, k: Int): DataFrame =
    df.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select("q_id", "label", "rank")

  private def bestPerDoc(df: DataFrame): DataFrame =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy("q_id", "label").orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("_rn") === 1).drop("_rn")

  /** All 5 reference modes, batched. Vectors must carry
    * (vec_id, label, embedding, vtype). */
  def runMode(mode: String, vectors: DataFrame, queries: DataFrame, k: Int): DataFrame =
    runModeScored(mode,
      scored(vectors.filter(col("vtype") === "summary"), queries),
      scored(vectors.filter(col("vtype") === "chunk"), queries), k)

  /** Mode implementations over pre-scored (and cacheable) branches —
    * the expensive crossJoin+dot scan is shared by all 5 modes. */
  def runModeScored(mode: String, scoredSummaries: DataFrame,
                    scoredChunks: DataFrame, k: Int): DataFrame =
    mode match {
      case "summary_only" => topkPerQuery(scoredSummaries, k)
      case "chunks_only"  => topkPerQuery(bestPerDoc(scoredChunks), k)
      case "legacy" =>
        topkPerQuery(bestPerDoc(scoredSummaries.unionByName(scoredChunks)), k)
      case "hybrid" =>
        // stage 1: per-query top-10 summary docs; stage 2: chunks
        // restricted to those (q_id, label) candidates
        val cand = topkPerQuery(scoredSummaries, 10).select("q_id", "label")
        val pruned = scoredChunks.join(cand, Seq("q_id", "label"), "left_semi")
        topkPerQuery(bestPerDoc(pruned), k)
      case "rrf_fusion" =>
        // Single-pass form of: per-branch bestPerDoc → per-query
        // top-10 rank → full-outer RRF → final rank. The composed
        // pipeline was ~6 exchanges over tiny relations — a pure
        // scheduler floor (the round-11 eval_retrieval_metrics
        // regression's fat leg). One groupBy collapses both branches'
        // bestPerDoc (max of (sim, −vec_id) = sim desc, vec_id asc —
        // the same tiebreak), and the three windows share ONE q_id
        // hash partitioning, eliminating the join entirely: 2
        // exchanges total. Output is row-identical to the composed
        // form (the oracle pins it).
        val g = scoredSummaries.select(col("q_id"), col("label"),
            struct(col("sim"), (-col("vec_id")).as("nv")).as("b"),
            lit("s").as("t"))
          .unionByName(scoredChunks.select(col("q_id"), col("label"),
            struct(col("sim"), (-col("vec_id")).as("nv")).as("b"),
            lit("c").as("t")))
          .groupBy("q_id", "label")
          .agg(max(when(col("t") === "s", col("b"))).as("sbest"),
            max(when(col("t") === "c", col("b"))).as("cbest"))
        g.withColumn("rn_s", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("sbest").desc_nulls_last, col("label").asc)))
          .withColumn("rn_c", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("cbest").desc_nulls_last, col("label").asc)))
          .withColumn("s_rank",
            when(col("sbest").isNotNull && col("rn_s") <= 10, col("rn_s")))
          .withColumn("c_rank",
            when(col("cbest").isNotNull && col("rn_c") <= 10, col("rn_c")))
          .filter(col("s_rank").isNotNull || col("c_rank").isNotNull)
          .withColumn("rrf",
            coalesce(lit(0.4) / (lit(60) + col("s_rank")), lit(0.0)) +
              coalesce(lit(0.6) / (lit(60) + col("c_rank")), lit(0.0)))
          .withColumn("rank", row_number().over(
            Window.partitionBy("q_id").orderBy(col("rrf").desc, col("label").asc)))
          .filter(col("rank") <= k)
          .select("q_id", "label", "rank")
    }

  /** doc_id·1000 + slot (999 = summary, else chunk_index), with the
    * overflow guard in EVERY harness (round-5 ADVICE): a doc with
    * ≥ 999 chunks would silently collide with the summary slot or the
    * next doc's id range — fail loudly instead. A doc's summary row
    * and its chunk 0 both carry chunk_index 0, so summaries get the
    * reserved slot to keep vec_id (the window tiebreak) unique. */
  private def withVecId(vectors: DataFrame): DataFrame =
    vectors.withColumn("vec_id", col("doc_id") * 1000 +
      when(col("vtype") === "summary", lit(999))
        .when(col("chunk_index") >= 999, raise_error(concat(
          lit("vec_id scheme overflow: chunk_index "), col("chunk_index"),
          lit(" >= 999 for doc_id "), col("doc_id"))))
        .otherwise(col("chunk_index")))

  /** Hit@{1,3,5,10}, MRR, nDCG@{5,10} per mode — the BASELINE.md
    * metric grid (k ∈ {1,3,5,10}, `evaluate_vector_retrieval.py:
    * 357-396`). Single relevant doc per query ⇒ nDCG@k =
    * 1/log2(rank+1) when the source doc ranks ≤ k, else 0; modes run
    * at depth 10 so the k=10 metrics are meaningful. */
  def evaluate(s: SparkSession, d: String, nQueries: Int = 30): DataFrame = {
    val embedder = new HashEmbedder(64)
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
    val vectors = withVecId(IndexPipeline.buildIndex(docs, embedder))
      .withColumn("label", col("doc_id"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val queries = goldenQueries(docs, embedder, nQueries)
    // ONE crossJoin+dot over the whole vector set, cached once; the
    // 10 per-mode consumers are filters over it. (Separate cached
    // summary/chunk branches each paid their own index-build + scan.)
    val allScored = scored(vectors, queries)
      .select("q_id", "label", "vec_id", "vtype", "sim").cache()
    val ss = allScored.filter(col("vtype") === "summary")
    val sc = allScored.filter(col("vtype") === "chunk")
    val modes = Seq("rrf_fusion", "hybrid", "summary_only", "chunks_only", "legacy")
    val perMode = modes.map { m =>
      val hitRanks = runModeScored(m, ss, sc, 10)
        .filter(col("label") === col("q_id")) // relevant doc retrieved
        .select(col("q_id"), col("rank"))
      val n = lit(nQueries.toDouble)
      hitRanks.agg(
        sum(when(col("rank") <= 1, 1.0).otherwise(0.0)).as("h1"),
        sum(when(col("rank") <= 3, 1.0).otherwise(0.0)).as("h3"),
        sum(when(col("rank") <= 5, 1.0).otherwise(0.0)).as("h5"),
        sum(when(col("rank") <= 10, 1.0).otherwise(0.0)).as("h10"),
        sum(lit(1.0) / col("rank")).as("rr"),
        sum(when(col("rank") <= 5, lit(1.0) / log2(col("rank") + 1))
          .otherwise(0.0)).as("dcg5"),
        sum(lit(1.0) / log2(col("rank") + 1)).as("dcg10"))
        .select(lit(m).as("mode"),
          (coalesce(col("h1"), lit(0.0)) / n).as("hit1"),
          (coalesce(col("h3"), lit(0.0)) / n).as("hit3"),
          (coalesce(col("h5"), lit(0.0)) / n).as("hit5"),
          (coalesce(col("h10"), lit(0.0)) / n).as("hit10"),
          (coalesce(col("rr"), lit(0.0)) / n).as("mrr"),
          (coalesce(col("dcg5"), lit(0.0)) / n).as("ndcg5"),
          (coalesce(col("dcg10"), lit(0.0)) / n).as("ndcg10"))
    }
    perMode.reduce(_ unionByName _)
  }

  /** 1/log2(rank+1) for rank = 1..10, computed ONCE and injected into
    * both engines as literals — neither engine's own log2 is trusted
    * per-row (the lnTable precedent: libm vs StrictMath disagree by
    * 1 ulp on some integer inputs). */
  private[graft] val invLog2Table: IndexedSeq[Double] =
    (1 to 10).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
  private def invLog2Sql: String =
    invLog2Table.map(x => s"'$x'").mkString("([", ",", "]::DOUBLE[])")

  /** The metric grid of `evaluate`, HASH-GATED: same five modes, same
    * windows, but the vectors/queries come from the SQL-reconstructible
    * SyntheticEmbedder (x7's md5-prefix → ±1-vector construction — all
    * sims integer-valued), nDCG discounts read the injected
    * 1/log2 table, and the inexact metric sums (MRR's Σ1/rank, the DCG
    * sums) fold in q_id order via the established ordered-reduce
    * pattern so both engines accumulate identically. The HashEmbedder
    * harness above stays as the realistic-embedder run; this twin
    * proves the METRIC MATH (windows, mode logic, grid arithmetic)
    * under the exact gate. */
  def evaluateSynth(s: SparkSession, d: String, nQueries: Int = 30): DataFrame = {
    val embedder = new SyntheticEmbedder(64)
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
    val vectors = withVecId(IndexPipeline.buildIndex(docs, embedder))
      .withColumn("label", col("doc_id"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val embUdf = udf((t: String) => embedder.embed(t))
    val queries = docs.filter(length(col("text")) >= 120)
      .orderBy("doc_id").limit(nQueries)
      .select(col("doc_id").as("q_id"),
        embUdf(substring(col("text"), 40, 120)).as("q_emb"))
    val allScored = scored(vectors, queries)
      .select("q_id", "label", "vec_id", "vtype", "sim").cache()
    val ss = allScored.filter(col("vtype") === "summary")
    val sc = allScored.filter(col("vtype") === "chunk")
    // ordered double fold (== DuckDB list_reduce(list(x ORDER BY key)))
    def ofold(x: Column, key: Column): Column =
      aggregate(array_sort(collect_list(struct(key.as("k"), x.as("v")))),
        lit(0.0), (a, e) => a + e.getField("v"))
    val tab = typedLit(invLog2Table)
    val n = lit(nQueries.toDouble)
    val modes = Seq("rrf_fusion", "hybrid", "summary_only", "chunks_only", "legacy")
    modes.map { m =>
      val hitRanks = runModeScored(m, ss, sc, 10)
        .filter(col("label") === col("q_id"))
        .select(col("q_id"), col("rank"))
      hitRanks.agg(
        sum(when(col("rank") <= 1, 1.0).otherwise(0.0)).as("h1"),
        sum(when(col("rank") <= 3, 1.0).otherwise(0.0)).as("h3"),
        sum(when(col("rank") <= 5, 1.0).otherwise(0.0)).as("h5"),
        sum(when(col("rank") <= 10, 1.0).otherwise(0.0)).as("h10"),
        ofold(lit(1.0) / col("rank"), col("q_id")).as("rr"),
        ofold(when(col("rank") <= 5, element_at(tab, col("rank").cast("int")))
          .otherwise(lit(0.0)), col("q_id")).as("dcg5"),
        ofold(element_at(tab, col("rank").cast("int")), col("q_id")).as("dcg10"))
        .select(lit(m).as("mode"),
          (coalesce(col("h1"), lit(0.0)) / n).as("hit1"),
          (coalesce(col("h3"), lit(0.0)) / n).as("hit3"),
          (coalesce(col("h5"), lit(0.0)) / n).as("hit5"),
          (coalesce(col("h10"), lit(0.0)) / n).as("hit10"),
          (coalesce(col("rr"), lit(0.0)) / n).as("mrr"),
          (coalesce(col("dcg5"), lit(0.0)) / n).as("ndcg5"),
          (coalesce(col("dcg10"), lit(0.0)) / n).as("ndcg10"))
    }.reduce(_ unionByName _).orderBy("mode")
  }

  /** Per-stage wall times for the `eval_retrieval_metrics` grid
    * (round-9 verdict task 6): materialize the shared scored scan
    * once, then time each mode's consumer aggregation over it — the
    * attribution that keeps the harness's growth readable as modes ×
    * grid expand (the full-query time is scan + Σ modes + union). Run
    * by Bench after the timed passes; entries land in
    * BENCH_DETAIL.json as `eval_retrieval_metrics__<stage>`. */
  def evaluateModeTimings(s: SparkSession, d: String,
                          nQueries: Int = 40): Seq[(String, Double)] = {
    val embedder = new SyntheticEmbedder(64)
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
    val vectors = withVecId(IndexPipeline.buildIndex(docs, embedder))
      .withColumn("label", col("doc_id"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val embUdf = udf((t: String) => embedder.embed(t))
    val queries = docs.filter(length(col("text")) >= 120)
      .orderBy("doc_id").limit(nQueries)
      .select(col("doc_id").as("q_id"),
        embUdf(substring(col("text"), 40, 120)).as("q_emb"))
    val allScored = scored(vectors, queries)
      .select("q_id", "label", "vec_id", "vtype", "sim").cache()
    def t[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val scanSec = t(allScored.count())
    val ss = allScored.filter(col("vtype") === "summary")
    val sc = allScored.filter(col("vtype") === "chunk")
    val modes = Seq("rrf_fusion", "hybrid", "summary_only", "chunks_only", "legacy")
    val perMode = modes.map { m =>
      s"eval_retrieval_metrics__$m" -> t(
        runModeScored(m, ss, sc, 10)
          .filter(col("label") === col("q_id")).count())
    }
    allScored.unpersist()
    ("eval_retrieval_metrics__scan" -> scanSec) +: perMode
  }

  /** QAdataset-shaped retrieval-quality grid (SURVEY §5.3;
    * `generate_test_dataset.py:423-604`): the reference generates ONE
    * thematic (主題級) question from each document's SUMMARY and
    * detail (細節級) questions from individual CHUNKS, each with the
    * source doc as the single relevant result, then compares the 5
    * search modes' Hit@k/MRR/nDCG per question type
    * (`evaluate_vector_retrieval.py:357-396`). Deterministic analogue:
    * vectors are SyntheticVec's of structured ids (summary s_d =
    * 10⁶+d; chunks c_{d,k} = 2·10⁶+10d+k, k<3), and each question
    * embedding is a PER-DIMENSION MIX of its target vector (the
    * summary for thematic, one chunk for detail), the doc's other
    * branch, and query-specific noise — selected by a deterministic
    * integer hash both engines evaluate bit-identically. Detail
    * questions cycle through three affinity regimes
    * (balanced-weak / chunk-strong / chunk-weak+summary-moderate), so
    * single-branch modes each have a failure regime while fusion sees
    * both branches — which is exactly the reference's observed mode
    * ordering (rrf_fusion ≥ hybrid ≥ single modes on detail
    * questions), asserted in RetrievalEvalSpec and hash-gated here. */
  def evalModesGrid(s: SparkSession, d: String): DataFrame = {
    val nDocs = 40
    val dim = 64
    def bitOf(id: Column, j: Column): Column =
      when(shiftright((id * lit(dim.toLong) + j) * lit(2246822519L), 16)
        .bitwiseAND(lit(1L)) === 0L, lit(1.0)).otherwise(lit(-1.0))
    def pctOf(qkey: Column, j: Column): Column =
      shiftright((qkey * lit(dim.toLong) + j) * lit(1099087573L), 8) % 100

    val docs = Tables.documents(s, d).filter(col("doc_id") < nDocs).select("doc_id")
    val vectors = docs.select(col("doc_id").as("label"),
        lit("summary").as("vtype"), (lit(1000000L) + col("doc_id")).as("vec_id"))
      .unionByName(docs
        .select(col("doc_id").as("label"), explode(sequence(lit(0L), lit(2L))).as("k"))
        .select(col("label"), lit("chunk").as("vtype"),
          (lit(2000000L) + col("label") * 10 + col("k")).as("vec_id")))
      .withColumn("embedding", SyntheticVec.vecCol(col("vec_id"), dim))

    val qmeta = docs.select(col("doc_id").as("rel_doc"),
        explode(sequence(lit(0L), lit(2L))).as("qslot"))
      .withColumn("q_id", col("rel_doc") * 3 + col("qslot"))
      .withColumn("qtype",
        when(col("qslot") === 0, lit("thematic")).otherwise(lit("detail")))
      .withColumn("sum_id", lit(1000000L) + col("rel_doc"))
      .withColumn("target_id", when(col("qslot") === 0, col("sum_id"))
        .otherwise(lit(2000000L) + col("rel_doc") * 10 + (col("qslot") - 1)))
      .withColumn("second_id", when(col("qslot") === 0,
          lit(2000000L) + col("rel_doc") * 10).otherwise(col("sum_id")))
      .withColumn("regime", (col("rel_doc") + col("qslot")) % 3)
      .withColumn("p1", when(col("qslot") === 0, lit(60L))
        .when(col("regime") === 0, lit(38L))
        .when(col("regime") === 1, lit(60L)).otherwise(lit(28L)))
      .withColumn("p2", when(col("qslot") === 0, lit(22L))
        .when(col("regime") === 0, lit(38L))
        .when(col("regime") === 1, lit(12L)).otherwise(lit(52L)))
      .withColumn("q_emb", transform(sequence(lit(0L), lit(dim - 1L)), j =>
        bitOf(
          when(pctOf(col("q_id"), j) < col("p1"), col("target_id"))
            .when(pctOf(col("q_id"), j) < col("p1") + col("p2"), col("second_id"))
            .otherwise(lit(3000000L) + col("q_id")), j)))

    val allScored = scored(vectors, qmeta.select("q_id", "q_emb"))
      .select("q_id", "label", "vec_id", "vtype", "sim").cache()
    val ss = allScored.filter(col("vtype") === "summary")
    val sc = allScored.filter(col("vtype") === "chunk")
    val meta = qmeta.select("q_id", "rel_doc", "qtype")
    val nOf = Map("thematic" -> nDocs, "detail" -> 2 * nDocs)

    def ofold(x: Column, key: Column): Column =
      aggregate(array_sort(collect_list(struct(key.as("k"), x.as("v")))),
        lit(0.0), (a, e) => a + e.getField("v"))
    val tab = typedLit(invLog2Table)
    val modes = Seq("rrf_fusion", "hybrid", "summary_only", "chunks_only", "legacy")
    modes.flatMap { m =>
      val ranked = runModeScored(m, ss, sc, 10)
        .join(broadcast(meta), Seq("q_id"))
        .filter(col("label") === col("rel_doc"))
        .select("q_id", "qtype", "rank")
      Seq("detail", "thematic").map { qt =>
        val n = lit(nOf(qt).toDouble)
        ranked.filter(col("qtype") === qt).agg(
          sum(when(col("rank") <= 1, 1.0).otherwise(0.0)).as("h1"),
          sum(when(col("rank") <= 3, 1.0).otherwise(0.0)).as("h3"),
          sum(when(col("rank") <= 5, 1.0).otherwise(0.0)).as("h5"),
          sum(when(col("rank") <= 10, 1.0).otherwise(0.0)).as("h10"),
          ofold(lit(1.0) / col("rank"), col("q_id")).as("rr"),
          ofold(when(col("rank") <= 5, element_at(tab, col("rank").cast("int")))
            .otherwise(lit(0.0)), col("q_id")).as("dcg5"),
          ofold(element_at(tab, col("rank").cast("int")), col("q_id")).as("dcg10"))
          .select(lit(m).as("mode"), lit(qt).as("qtype"),
            (coalesce(col("h1"), lit(0.0)) / n).as("hit1"),
            (coalesce(col("h3"), lit(0.0)) / n).as("hit3"),
            (coalesce(col("h5"), lit(0.0)) / n).as("hit5"),
            (coalesce(col("h10"), lit(0.0)) / n).as("hit10"),
            (coalesce(col("rr"), lit(0.0)) / n).as("mrr"),
            (coalesce(col("dcg5"), lit(0.0)) / n).as("ndcg5"),
            (coalesce(col("dcg10"), lit(0.0)) / n).as("ndcg10"))
      }
    }.reduce(_ unionByName _).orderBy("mode", "qtype")
  }

  /** Query-rewrite A/B + smart-trigger harness — the reference's second
    * evaluation (`evaluate_query_rewrite_retrieval.py:71,203-400`):
    * arm 1 searches the raw query; arm 2 always expands it via the L3
    * rewrite stub (positional weights 1.3/1.1/1.0, V8 merge); arm 3 is
    * the smart trigger — run the cheap probe first and SKIP the rewrite
    * when its top similarity ≥ 0.75 (the reference's threshold),
    * reporting the skip rate alongside the metrics. One scored
    * relation (vectors × all query variants) feeds all three arms.
    */
  def evaluateRewriteAb(s: SparkSession, d: String, nQueries: Int = 30): DataFrame = {
    val embedder = new HashEmbedder(64)
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
    val vectors = withVecId(IndexPipeline.buildIndex(docs, embedder))
      .withColumn("label", col("doc_id"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
    // (q_id, variant, weight, q_emb): variant 0 = raw snippet, 1/2 =
    // L3-stub rewrites of the snippet text.
    val embUdf = udf((t: String) => embedder.embed(t))
    val snippets = docs.filter(length(col("text")) >= 120)
      .orderBy("doc_id").limit(nQueries)
      .select(col("doc_id").as("q_id"), substring(col("text"), 40, 120).as("q_text"))
    val variants = snippets.select(col("q_id"), explode(array(
        struct(lit(0).as("variant"), lit(1.3).as("w"), col("q_text").as("t")),
        struct(lit(1).as("variant"), lit(1.1).as("w"),
          concat(col("q_text"), lit(" details")).as("t")),
        struct(lit(2).as("variant"), lit(1.0).as("w"),
          concat(lit("about "), col("q_text")).as("t")))).as("v"))
      .select(col("q_id"), col("v.variant").as("variant"), col("v.w").as("w"),
        embUdf(col("v.t")).as("q_emb"))
    val scored = vectors.crossJoin(broadcast(variants))
      .withColumn("sim", VectorFunctions.dot(col("embedding"), col("q_emb")))
      .select("q_id", "variant", "w", "label", "vec_id", "sim").cache()

    def bestPerDocRanked(df: DataFrame, scoreCol: String): DataFrame =
      df.withColumn("_rn", row_number().over(
          Window.partitionBy("q_id", "label").orderBy(col(scoreCol).desc, col("vec_id").asc)))
        .filter(col("_rn") === 1)
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col(scoreCol).desc, col("label").asc)))
        .filter(col("rank") <= 10)
        .select("q_id", "label", "rank")
    // arm 1: raw query only
    val base = bestPerDocRanked(scored.filter(col("variant") === 0), "sim")
    // arm 2: weighted multi-query merge (V8 shape)
    val merged = bestPerDocRanked(
      scored.withColumn("wsim", col("sim") * col("w")), "wsim")
    // arm 3: per-query probe — skip the rewrite when base top-1 sim ≥ 0.75
    val probe = scored.filter(col("variant") === 0)
      .groupBy("q_id").agg(max(col("sim")).as("top_sim"))
      .withColumn("skip_rewrite", col("top_sim") >= 0.75)
    val smart = base.join(probe.filter(col("skip_rewrite")).select("q_id"), Seq("q_id"), "left_semi")
      .unionByName(merged.join(probe.filter(!col("skip_rewrite")).select("q_id"),
        Seq("q_id"), "left_semi"))

    val n = lit(nQueries.toDouble)
    def metrics(arm: String, ranks: DataFrame, skipRate: org.apache.spark.sql.Column): DataFrame =
      ranks.filter(col("label") === col("q_id"))
        .agg(sum(when(col("rank") <= 5, 1.0).otherwise(0.0)).as("h5"),
          sum(lit(1.0) / col("rank")).as("rr"))
        .select(lit(arm).as("arm"),
          (coalesce(col("h5"), lit(0.0)) / n).as("hit5"),
          (coalesce(col("rr"), lit(0.0)) / n).as("mrr"),
          skipRate.as("skip_rate"))
    val skip = probe.agg((sum(when(col("skip_rewrite"), 1.0).otherwise(0.0)) / n).as("sr"))
      .head().getDouble(0)
    metrics("no_rewrite", base, lit(0.0))
      .unionByName(metrics("always_rewrite", merged, lit(0.0)))
      .unionByName(metrics("smart_trigger", smart, lit(skip)))
  }

  /** Hash-gated twin of `evaluateRewriteAb` (same three arms, same
    * probe threshold) over the SQL-reconstructible embedder — the arm
    * logic, weighted merge, smart trigger and skip-rate arithmetic all
    * inside the exact gate. MRR folds in q_id order; weights are
    * injected as string-cast doubles on the oracle side. */
  def evaluateRewriteAbSynth(s: SparkSession, d: String, nQueries: Int = 30): DataFrame = {
    val embedder = new SyntheticEmbedder(64)
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
    val vectors = withVecId(IndexPipeline.buildIndex(docs, embedder))
      .withColumn("label", col("doc_id"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val embUdf = udf((t: String) => embedder.embed(t))
    val snippets = docs.filter(length(col("text")) >= 120)
      .orderBy("doc_id").limit(nQueries)
      .select(col("doc_id").as("q_id"), substring(col("text"), 40, 120).as("q_text"))
    val variants = snippets.select(col("q_id"), explode(array(
        struct(lit(0).as("variant"), lit(1.3).as("w"), col("q_text").as("t")),
        struct(lit(1).as("variant"), lit(1.1).as("w"),
          concat(col("q_text"), lit(" details")).as("t")),
        struct(lit(2).as("variant"), lit(1.0).as("w"),
          concat(lit("about "), col("q_text")).as("t")))).as("v"))
      .select(col("q_id"), col("v.variant").as("variant"), col("v.w").as("w"),
        embUdf(col("v.t")).as("q_emb"))
    val scoredV = vectors.crossJoin(broadcast(variants))
      .withColumn("sim", VectorFunctions.dot(col("embedding"), col("q_emb")))
      .select("q_id", "variant", "w", "label", "vec_id", "sim").cache()

    def bestPerDocRanked(df: DataFrame, scoreCol: String): DataFrame =
      df.withColumn("_rn", row_number().over(
          Window.partitionBy("q_id", "label").orderBy(col(scoreCol).desc, col("vec_id").asc)))
        .filter(col("_rn") === 1)
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col(scoreCol).desc, col("label").asc)))
        .filter(col("rank") <= 10)
        .select("q_id", "label", "rank")
    val base = bestPerDocRanked(scoredV.filter(col("variant") === 0), "sim")
    val merged = bestPerDocRanked(
      scoredV.withColumn("wsim", col("sim") * col("w")), "wsim")
    val probe = scoredV.filter(col("variant") === 0)
      .groupBy("q_id").agg(max(col("sim")).as("top_sim"))
      .withColumn("skip_rewrite", col("top_sim") >= 0.75)
    val smart = base.join(probe.filter(col("skip_rewrite")).select("q_id"), Seq("q_id"), "left_semi")
      .unionByName(merged.join(probe.filter(!col("skip_rewrite")).select("q_id"),
        Seq("q_id"), "left_semi"))

    def ofold(x: Column, key: Column): Column =
      aggregate(array_sort(collect_list(struct(key.as("k"), x.as("v")))),
        lit(0.0), (a, e) => a + e.getField("v"))
    val n = lit(nQueries.toDouble)
    def metrics(arm: String, ranks: DataFrame, skipRate: Column): DataFrame =
      ranks.filter(col("label") === col("q_id"))
        .agg(sum(when(col("rank") <= 5, 1.0).otherwise(0.0)).as("h5"),
          ofold(lit(1.0) / col("rank"), col("q_id")).as("rr"))
        .select(lit(arm).as("arm"),
          (coalesce(col("h5"), lit(0.0)) / n).as("hit5"),
          (coalesce(col("rr"), lit(0.0)) / n).as("mrr"),
          skipRate.as("skip_rate"))
    val skip = probe.agg((sum(when(col("skip_rewrite"), 1.0).otherwise(0.0)) / n).as("sr"))
      .head().getDouble(0)
    metrics("no_rewrite", base, lit(0.0))
      .unionByName(metrics("always_rewrite", merged, lit(0.0)))
      .unionByName(metrics("smart_trigger", smart, lit(skip)))
      .orderBy("arm")
  }

  /** RAG answer-quality stand-in (`evaluate_full_qa_system.py:188-224`):
    * the reference scores answer_relevancy + answer_correctness with
    * Ragas LLM judges; the deterministic analogue scores the stubbed QA
    * answer (X2's assembled top-3 contexts) lexically — relevancy = the
    * fraction of question tokens the answer covers, correctness =
    * token-set F1 between the answer and the golden source document.
    * context_precision is the RAGAS rank-weighted analogue (full mode,
    * `evaluate_full_qa_system.py:38-39`): a retrieved context is
    * "relevant" when ≥ half its tokens appear in the golden document,
    * and the score is Σₖ rel_k · precision@k / Σₖ rel_k over the
    * ranked contexts — 1.0 when every relevant context outranks every
    * irrelevant one, degrading as relevant contexts sink.
    * One broadcast-queries × summary-vectors scan feeds everything; a
    * q_id = -1 summary row carries the corpus means (the number the
    * reference's `result.to_pandas().mean()` reports). Rows-only:
    * retrieval depends on the hash embedder; invariants in spec.
    */
  /** (q_id, context_precision) over ranked retrieved contexts: rel_k =
    * 1 when ≥ 0.5 of the context's tokens occur in the golden doc for
    * q_id; score = Σ rel_k·(cum_rel_k/rank_k) / max(Σ rel_k, 1), folded
    * in rank order (3 contexts/query ⇒ the per-group state is O(k)). */
  private[graft] def contextPrecision(ctx: DataFrame, docs: DataFrame,
                                      toks: Column => Column): DataFrame = {
    val rel = ctx
      .join(docs.select(col("doc_id").as("q_id"), col("text").as("golden_txt")), Seq("q_id"))
      .withColumn("cset", toks(col("snip")))
      .withColumn("rel",
        when(size(array_intersect(col("cset"), toks(col("golden_txt")))).cast("double") /
             greatest(size(col("cset")), lit(1)).cast("double") >= lit(0.5), lit(1.0))
          .otherwise(lit(0.0)))
      .select("q_id", "rank", "rel")
    rel.groupBy("q_id").agg(
      aggregate(
        array_sort(collect_list(struct(col("rank"), col("rel")))),
        struct(lit(0.0).as("cum"), lit(0.0).as("acc")),
        (a, e) => struct(
          (a.getField("cum") + e.getField("rel")).as("cum"),
          (a.getField("acc") + e.getField("rel") * (a.getField("cum") + e.getField("rel"))
            / e.getField("rank").cast("double")).as("acc")),
        a => a.getField("acc") / greatest(a.getField("cum"), lit(1.0))
      ).as("context_precision"))
  }

  def evaluateAnswerQuality(s: SparkSession, d: String, nQueries: Int = 30): DataFrame = {
    val embedder = new HashEmbedder(64)
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
    val vectors = IndexPipeline.buildIndex(docs, embedder)
      .filter(col("vtype") === "summary")
      .withColumn("vec_id", col("doc_id"))
      .withColumn("label", col("doc_id"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val embUdf = udf((t: String) => embedder.embed(t))
    val snippets = docs.filter(length(col("text")) >= 120)
      .orderBy("doc_id").limit(nQueries)
      .select(col("doc_id").as("q_id"), substring(col("text"), 40, 120).as("q_text"))
    val queries = snippets.withColumn("q_emb", embUdf(col("q_text")))
    // top-3 summary docs per query (X2's retrieval), context = each
    // doc's 256-char truncated text, answer = contexts joined in rank
    // order — the standardQa assembly without the driver round-trip.
    val top3 = topkPerQuery(scored(vectors, queries), 3)
    val ctx = top3.join(docs.select(col("doc_id").as("label"),
      substring(col("text"), 1, 256).as("snip")), Seq("label"))
    val answers = ctx.groupBy("q_id").agg(
      array_join(transform(
        array_sort(collect_list(struct(col("rank"), col("snip")))),
        x => x("snip")), " ").as("answer"),
      count(lit(1)).as("n_contexts"))
    val toks = (c: org.apache.spark.sql.Column) =>
      array_distinct(filter(split(c, " "), t => t =!= ""))
    val scoredAnswers = answers
      .join(snippets, Seq("q_id"))
      .join(docs.select(col("doc_id").as("q_id"), col("text").as("golden")), Seq("q_id"))
      .withColumn("qset", toks(col("q_text")))
      .withColumn("aset", toks(col("answer")))
      .withColumn("gset", toks(col("golden")))
      .withColumn("relevancy",
        size(array_intersect(col("qset"), col("aset"))).cast("double") /
          greatest(size(col("qset")), lit(1)).cast("double"))
      .withColumn("p",
        size(array_intersect(col("aset"), col("gset"))).cast("double") /
          greatest(size(col("aset")), lit(1)).cast("double"))
      .withColumn("r",
        size(array_intersect(col("aset"), col("gset"))).cast("double") /
          greatest(size(col("gset")), lit(1)).cast("double"))
      .withColumn("correctness",
        when(col("p") + col("r") > 0, lit(2.0) * col("p") * col("r") / (col("p") + col("r")))
          .otherwise(lit(0.0)))
      .join(contextPrecision(ctx, docs, toks), Seq("q_id"))
      .select(col("q_id"), col("n_contexts"), col("relevancy"), col("correctness"),
        col("context_precision"))
    val mean = scoredAnswers.agg(
      sum(col("n_contexts")).as("n_contexts"),
      avg(col("relevancy")).as("relevancy"), avg(col("correctness")).as("correctness"),
      avg(col("context_precision")).as("context_precision"))
      .select(lit(-1L).as("q_id"), col("n_contexts"), col("relevancy"), col("correctness"),
        col("context_precision"))
    scoredAnswers.unionByName(mean).orderBy("q_id")
  }

  /** Hash-gated twin of `evaluateAnswerQuality`: same top-3 retrieval →
    * context assembly → lexical relevancy/F1, over the
    * SQL-reconstructible embedder. Per-row scores are exact single
    * IEEE ops on integer set sizes; the corpus-mean row folds in q_id
    * order instead of `avg` so both engines accumulate identically. */
  def evaluateAnswerQualitySynth(s: SparkSession, d: String, nQueries: Int = 30): DataFrame = {
    val embedder = new SyntheticEmbedder(64)
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
    val vectors = IndexPipeline.buildIndex(docs, embedder)
      .filter(col("vtype") === "summary")
      .withColumn("vec_id", col("doc_id"))
      .withColumn("label", col("doc_id"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val embUdf = udf((t: String) => embedder.embed(t))
    val snippets = docs.filter(length(col("text")) >= 120)
      .orderBy("doc_id").limit(nQueries)
      .select(col("doc_id").as("q_id"), substring(col("text"), 40, 120).as("q_text"))
    val queriesDf = snippets.withColumn("q_emb", embUdf(col("q_text")))
    val top3 = topkPerQuery(scored(vectors, queriesDf), 3)
    val ctx = top3.join(docs.select(col("doc_id").as("label"),
      substring(col("text"), 1, 256).as("snip")), Seq("label"))
    val answers = ctx.groupBy("q_id").agg(
      array_join(transform(
        array_sort(collect_list(struct(col("rank"), col("snip")))),
        x => x("snip")), " ").as("answer"),
      count(lit(1)).as("n_contexts"))
    val toks = (c: Column) => array_distinct(filter(split(c, " "), t => t =!= ""))
    val scoredAnswers = answers
      .join(snippets, Seq("q_id"))
      .join(docs.select(col("doc_id").as("q_id"), col("text").as("golden")), Seq("q_id"))
      .withColumn("qset", toks(col("q_text")))
      .withColumn("aset", toks(col("answer")))
      .withColumn("gset", toks(col("golden")))
      .withColumn("relevancy",
        size(array_intersect(col("qset"), col("aset"))).cast("double") /
          greatest(size(col("qset")), lit(1)).cast("double"))
      .withColumn("p",
        size(array_intersect(col("aset"), col("gset"))).cast("double") /
          greatest(size(col("aset")), lit(1)).cast("double"))
      .withColumn("r",
        size(array_intersect(col("aset"), col("gset"))).cast("double") /
          greatest(size(col("gset")), lit(1)).cast("double"))
      .withColumn("correctness",
        when(col("p") + col("r") > 0, lit(2.0) * col("p") * col("r") / (col("p") + col("r")))
          .otherwise(lit(0.0)))
      .join(contextPrecision(ctx, docs, toks), Seq("q_id"))
      .select(col("q_id"), col("n_contexts"), col("relevancy"), col("correctness"),
        col("context_precision"))
    def ofold(x: Column, key: Column): Column =
      aggregate(array_sort(collect_list(struct(key.as("k"), x.as("v")))),
        lit(0.0), (a, e) => a + e.getField("v"))
    val mean = scoredAnswers.agg(
      sum(col("n_contexts")).as("n_contexts"),
      (ofold(col("relevancy"), col("q_id")) /
        count(lit(1)).cast("double")).as("relevancy"),
      (ofold(col("correctness"), col("q_id")) /
        count(lit(1)).cast("double")).as("correctness"),
      (ofold(col("context_precision"), col("q_id")) /
        count(lit(1)).cast("double")).as("context_precision"))
      .select(lit(-1L).as("q_id"), col("n_contexts"), col("relevancy"), col("correctness"),
        col("context_precision"))
    scoredAnswers.unionByName(mean).orderBy("q_id")
  }

  // Both members of each harness pair run the SQL-reconstructible
  // embedder so EVERY driver row is hash-exact (round-5 VERDICT asked
  // for zero no_oracle rows): the `_exact` twin pins the 30-query grid,
  // the harness entry re-runs the same machinery at a 40-query grid —
  // different retrieval sets, windows and metric denominators, so the
  // pair is not a duplicate. Embedder-INDEPENDENCE (the HashEmbedder
  // run: evaluate/evaluateRewriteAb/evaluateAnswerQuality) stays
  // covered by RetrievalEvalSpec, where invariants — mode ordering,
  // metric ranges, skip-rate bounds — are asserted without an oracle.
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_modes_grid" -> ((s, d) => evalModesGrid(s, d)),
    "eval_retrieval_metrics" -> ((s, d) => evaluateSynth(s, d, nQueries = 40)),
    "eval_retrieval_exact" -> ((s, d) => evaluateSynth(s, d)),
    "eval_rewrite_ab" -> ((s, d) => evaluateRewriteAbSynth(s, d, nQueries = 40)),
    "eval_rewrite_exact" -> ((s, d) => evaluateRewriteAbSynth(s, d)),
    "eval_answer_quality" -> ((s, d) => evaluateAnswerQualitySynth(s, d, nQueries = 40)),
    "eval_answer_exact" -> ((s, d) => evaluateAnswerQualitySynth(s, d))
  )

  // The full eval grid replayed in SQL: chunk walk + summary assembly
  // + md5-prefix vectors (the x7 machinery), per-query windows per
  // mode, metric sums with the injected 1/log2 table and q_id-ordered
  // folds for the inexact ones. Parameterized by the query-grid size so
  // the 30-query `_exact` twin and the 40-query harness entry share one
  // builder.
  private def retrievalOracle(n: Int): String = {
      import graft.pipelines.IndexPipeline.{t1End, summaryTxtSql, synVecOfText}
      def bestPerDoc(rel: String) =
        s"""SELECT q_id, label, vec_id, sim FROM (
           |  SELECT q_id, label, vec_id, sim, row_number() OVER (
           |    PARTITION BY q_id, label ORDER BY sim DESC, vec_id ASC) AS rn
           |  FROM $rel) WHERE rn = 1""".stripMargin
      def rankTop10(rel: String) =
        s"""SELECT q_id, label, rank FROM (
           |  SELECT q_id, label, row_number() OVER (
           |    PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
           |  FROM $rel) WHERE rank <= 10""".stripMargin
      def metrics(mode: String, rel: String) =
        s"""SELECT '$mode' AS mode,
           |  coalesce(sum(CASE WHEN rank <= 1 THEN 1 ELSE 0 END), 0)::DOUBLE / CAST($n AS DOUBLE) AS hit1,
           |  coalesce(sum(CASE WHEN rank <= 3 THEN 1 ELSE 0 END), 0)::DOUBLE / CAST($n AS DOUBLE) AS hit3,
           |  coalesce(sum(CASE WHEN rank <= 5 THEN 1 ELSE 0 END), 0)::DOUBLE / CAST($n AS DOUBLE) AS hit5,
           |  coalesce(sum(CASE WHEN rank <= 10 THEN 1 ELSE 0 END), 0)::DOUBLE / CAST($n AS DOUBLE) AS hit10,
           |  coalesce(CASE WHEN count(*) > 0 THEN list_reduce(
           |    list(1.0::DOUBLE / rank ORDER BY q_id), (a, b) -> a + b) END, 0.0)
           |    / CAST($n AS DOUBLE) AS mrr,
           |  coalesce(CASE WHEN count(*) > 0 THEN list_reduce(
           |    list(CASE WHEN rank <= 5 THEN $invLog2Sql[rank::INT] ELSE 0.0::DOUBLE END
           |         ORDER BY q_id), (a, b) -> a + b) END, 0.0)
           |    / CAST($n AS DOUBLE) AS ndcg5,
           |  coalesce(CASE WHEN count(*) > 0 THEN list_reduce(
           |    list($invLog2Sql[rank::INT] ORDER BY q_id), (a, b) -> a + b) END, 0.0)
           |    / CAST($n AS DOUBLE) AS ndcg10
           |FROM $rel WHERE label = q_id""".stripMargin
      s"""WITH RECURSIVE src AS (
         |  SELECT doc_id, text AS t, length(text)::BIGINT AS len
         |  FROM documents WHERE doc_id < 200 AND length(text) > 0),
         |walk AS (
         |  SELECT doc_id, CAST(0 AS BIGINT) AS start0 FROM src
         |  UNION ALL
         |  SELECT w.doc_id,
         |    CASE WHEN $t1End >= s.len THEN s.len
         |         ELSE greatest(w.start0 + 1, ($t1End) - 50) END
         |  FROM walk w JOIN src s USING (doc_id)
         |  WHERE w.start0 < s.len),
         |chunksraw AS (
         |  SELECT w.doc_id, w.start0,
         |    trim(substr(s.t, w.start0 + 1, ($t1End) - w.start0)) AS chunk
         |  FROM walk w JOIN src s USING (doc_id)
         |  WHERE w.start0 < s.len),
         |chunkrel AS (
         |  SELECT doc_id AS label,
         |    doc_id * 1000 +
         |      (row_number() OVER (PARTITION BY doc_id ORDER BY start0) - 1) AS vec_id,
         |    chunk
         |  FROM chunksraw WHERE chunk <> ''),
         |summrel AS (
         |  SELECT doc_id AS label, doc_id * 1000 + 999 AS vec_id,
         |    $summaryTxtSql AS stext
         |  FROM documents WHERE doc_id < 200),
         |qv AS (
         |  SELECT q_id, ${synVecOfText("qt")} AS qe FROM (
         |    SELECT doc_id AS q_id, substr(text, 40, 120) AS qt
         |    FROM documents WHERE doc_id < 200 AND length(text) >= 120
         |    ORDER BY doc_id LIMIT $n)),
         |ssim AS (
         |  SELECT q.q_id, s.label, s.vec_id,
         |    list_inner_product(${synVecOfText("stext")}, q.qe) AS sim
         |  FROM summrel s CROSS JOIN qv q),
         |csim AS (
         |  SELECT q.q_id, c.label, c.vec_id,
         |    list_inner_product(${synVecOfText("chunk")}, q.qe) AS sim
         |  FROM chunkrel c CROSS JOIN qv q),
         |r_summary AS (${rankTop10("ssim")}),
         |bd_chunks AS (${bestPerDoc("csim")}),
         |r_chunks AS (${rankTop10("bd_chunks")}),
         |bd_legacy AS (${bestPerDoc(
            "(SELECT * FROM ssim UNION ALL SELECT * FROM csim)")}),
         |r_legacy AS (${rankTop10("bd_legacy")}),
         |pruned AS (
         |  SELECT c.* FROM csim c
         |  WHERE EXISTS (SELECT 1 FROM r_summary s
         |                WHERE s.q_id = c.q_id AND s.label = c.label)),
         |bd_hybrid AS (${bestPerDoc("pruned")}),
         |r_hybrid AS (${rankTop10("bd_hybrid")}),
         |bd_ssim AS (${bestPerDoc("ssim")}),
         |sb AS (${rankTop10("bd_ssim")}),
         |rrf0 AS (
         |  SELECT coalesce(s.q_id, c.q_id) AS q_id,
         |         coalesce(s.label, c.label) AS label,
         |         coalesce(0.4::DOUBLE / (60 + s.rank), 0.0) +
         |         coalesce(0.6::DOUBLE / (60 + c.rank), 0.0) AS rrf
         |  FROM sb s FULL OUTER JOIN r_chunks c
         |    ON s.q_id = c.q_id AND s.label = c.label),
         |r_rrf AS (
         |  SELECT q_id, label, rank FROM (
         |    SELECT q_id, label, row_number() OVER (
         |      PARTITION BY q_id ORDER BY rrf DESC, label ASC) AS rank
         |    FROM rrf0) WHERE rank <= 10)
         |SELECT * FROM (
         |  ${metrics("chunks_only", "r_chunks")}
         |  UNION ALL ${metrics("hybrid", "r_hybrid")}
         |  UNION ALL ${metrics("legacy", "r_legacy")}
         |  UNION ALL ${metrics("rrf_fusion", "r_rrf")}
         |  UNION ALL ${metrics("summary_only", "r_summary")})
         |ORDER BY mode""".stripMargin
  }

  private def rewriteOracle(n: Int): String = {
      import graft.pipelines.IndexPipeline.{t1End, summaryTxtSql, synVecOfText}
      def arm(name: String, rel: String, skipExpr: String) =
        s"""SELECT '$name' AS arm,
           |  coalesce(sum(CASE WHEN rank <= 5 THEN 1 ELSE 0 END), 0)::DOUBLE
           |    / CAST($n AS DOUBLE) AS hit5,
           |  coalesce(CASE WHEN count(*) > 0 THEN list_reduce(
           |    list(1.0::DOUBLE / rank ORDER BY q_id), (a, b) -> a + b) END, 0.0)
           |    / CAST($n AS DOUBLE) AS mrr,
           |  $skipExpr AS skip_rate
           |FROM $rel WHERE label = q_id""".stripMargin
      s"""WITH RECURSIVE src AS (
         |  SELECT doc_id, text AS t, length(text)::BIGINT AS len
         |  FROM documents WHERE doc_id < 200 AND length(text) > 0),
         |walk AS (
         |  SELECT doc_id, CAST(0 AS BIGINT) AS start0 FROM src
         |  UNION ALL
         |  SELECT w.doc_id,
         |    CASE WHEN $t1End >= s.len THEN s.len
         |         ELSE greatest(w.start0 + 1, ($t1End) - 50) END
         |  FROM walk w JOIN src s USING (doc_id)
         |  WHERE w.start0 < s.len),
         |chunksraw AS (
         |  SELECT w.doc_id, w.start0,
         |    trim(substr(s.t, w.start0 + 1, ($t1End) - w.start0)) AS chunk
         |  FROM walk w JOIN src s USING (doc_id)
         |  WHERE w.start0 < s.len),
         |allvec AS (
         |  SELECT doc_id AS label,
         |    doc_id * 1000 +
         |      (row_number() OVER (PARTITION BY doc_id ORDER BY start0) - 1) AS vec_id,
         |    chunk AS txt
         |  FROM chunksraw WHERE chunk <> ''
         |  UNION ALL
         |  SELECT doc_id AS label, doc_id * 1000 + 999 AS vec_id,
         |    $summaryTxtSql AS txt
         |  FROM documents WHERE doc_id < 200),
         |qrel AS (
         |  SELECT doc_id AS q_id, substr(text, 40, 120) AS qt
         |  FROM documents WHERE doc_id < 200 AND length(text) >= 120
         |  ORDER BY doc_id LIMIT $n),
         |qv AS (
         |  SELECT q_id, variant, w, ${synVecOfText("t")} AS qe FROM (
         |    SELECT q_id, 0 AS variant, '1.3'::DOUBLE AS w, qt AS t FROM qrel
         |    UNION ALL SELECT q_id, 1, '1.1'::DOUBLE, qt || ' details' FROM qrel
         |    UNION ALL SELECT q_id, 2, '1.0'::DOUBLE, 'about ' || qt FROM qrel)),
         |scored AS (
         |  SELECT q.q_id, q.variant, q.w, v.label, v.vec_id,
         |    list_inner_product(${synVecOfText("v.txt")}, q.qe) AS sim
         |  FROM allvec v CROSS JOIN qv q),
         |b1 AS (
         |  SELECT q_id, label, sim FROM (
         |    SELECT q_id, label, sim, row_number() OVER (
         |      PARTITION BY q_id, label ORDER BY sim DESC, vec_id ASC) AS rn
         |    FROM scored WHERE variant = 0) WHERE rn = 1),
         |base AS (
         |  SELECT q_id, label, rank FROM (
         |    SELECT q_id, label, row_number() OVER (
         |      PARTITION BY q_id ORDER BY sim DESC, label ASC) AS rank
         |    FROM b1) WHERE rank <= 10),
         |m1 AS (
         |  SELECT q_id, label, wsim FROM (
         |    SELECT q_id, label, sim * w AS wsim, row_number() OVER (
         |      PARTITION BY q_id, label ORDER BY sim * w DESC, vec_id ASC) AS rn
         |    FROM scored) WHERE rn = 1),
         |merged AS (
         |  SELECT q_id, label, rank FROM (
         |    SELECT q_id, label, row_number() OVER (
         |      PARTITION BY q_id ORDER BY wsim DESC, label ASC) AS rank
         |    FROM m1) WHERE rank <= 10),
         |probe AS (
         |  SELECT q_id, max(sim) AS top_sim FROM scored
         |  WHERE variant = 0 GROUP BY q_id),
         |smart AS (
         |  SELECT b.q_id, b.label, b.rank FROM base b
         |  JOIN probe p ON p.q_id = b.q_id AND p.top_sim >= 0.75
         |  UNION ALL
         |  SELECT m.q_id, m.label, m.rank FROM merged m
         |  JOIN probe p ON p.q_id = m.q_id AND NOT (p.top_sim >= 0.75)),
         |skipr AS (
         |  SELECT sum(CASE WHEN top_sim >= 0.75 THEN 1 ELSE 0 END)::DOUBLE
         |    / CAST($n AS DOUBLE) AS sr FROM probe)
         |SELECT * FROM (
         |  ${arm("always_rewrite", "merged", "CAST(0 AS DOUBLE)")}
         |  UNION ALL ${arm("no_rewrite", "base", "CAST(0 AS DOUBLE)")}
         |  UNION ALL ${arm("smart_trigger", "smart", "(SELECT sr FROM skipr)")})
         |ORDER BY arm""".stripMargin
  }

  private def answerOracle(n: Int): String = {
      import graft.pipelines.IndexPipeline.{summaryTxtSql, synVecOfText}
      val tokset = (x: String) =>
        s"list_distinct(list_filter(string_split($x, ' '), t -> t <> ''))"
      s"""WITH summ AS (
         |  SELECT doc_id AS label, doc_id AS vec_id, $summaryTxtSql AS stext
         |  FROM documents WHERE doc_id < 200),
         |qrel AS (
         |  SELECT doc_id AS q_id, substr(text, 40, 120) AS qt
         |  FROM documents WHERE doc_id < 200 AND length(text) >= 120
         |  ORDER BY doc_id LIMIT $n),
         |qv AS (SELECT q_id, qt, ${synVecOfText("qt")} AS qe FROM qrel),
         |top3 AS (
         |  SELECT q_id, label, rank FROM (
         |    SELECT q.q_id, s.label, row_number() OVER (
         |      PARTITION BY q.q_id
         |      ORDER BY list_inner_product(${synVecOfText("s.stext")}, q.qe) DESC,
         |               s.vec_id ASC) AS rank
         |    FROM summ s CROSS JOIN qv q) WHERE rank <= 3),
         |answers AS (
         |  SELECT t.q_id, string_agg(substr(d.text, 1, 256), ' ' ORDER BY t.rank) AS answer,
         |    count(*) AS n_contexts
         |  FROM top3 t JOIN documents d ON d.doc_id = t.label
         |  GROUP BY t.q_id),
         |sets AS (
         |  SELECT a.q_id, a.n_contexts,
         |    ${tokset("q.qt")} AS qset,
         |    ${tokset("a.answer")} AS aset,
         |    ${tokset("d.text")} AS gset
         |  FROM answers a JOIN qv q USING (q_id)
         |  JOIN documents d ON d.doc_id = a.q_id),
         |pr AS (
         |  SELECT q_id, n_contexts,
         |    len(list_intersect(qset, aset))::DOUBLE
         |      / greatest(len(qset), 1)::DOUBLE AS relevancy,
         |    len(list_intersect(aset, gset))::DOUBLE
         |      / greatest(len(aset), 1)::DOUBLE AS p,
         |    len(list_intersect(aset, gset))::DOUBLE
         |      / greatest(len(gset), 1)::DOUBLE AS r
         |  FROM sets),
         |per AS (
         |  SELECT q_id, n_contexts, relevancy,
         |    CASE WHEN p + r > 0 THEN 2.0::DOUBLE * p * r / (p + r)
         |         ELSE CAST(0 AS DOUBLE) END AS correctness
         |  FROM pr),
         |ctxrel AS (
         |  SELECT t.q_id, t.rank,
         |    CASE WHEN len(list_intersect(${tokset("substr(c.text, 1, 256)")},
         |                                 ${tokset("g.text")}))::DOUBLE
         |           / greatest(len(${tokset("substr(c.text, 1, 256)")}), 1)::DOUBLE
         |           >= 0.5::DOUBLE
         |         THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS rel
         |  FROM top3 t
         |  JOIN documents c ON c.doc_id = t.label
         |  JOIN documents g ON g.doc_id = t.q_id),
         |cums AS (
         |  SELECT q_id, rank, rel,
         |    sum(rel) OVER (PARTITION BY q_id ORDER BY rank) AS cum
         |  FROM ctxrel),
         |cp AS (
         |  SELECT q_id,
         |    list_reduce(list(rel * cum / rank::DOUBLE ORDER BY rank), (a, b) -> a + b)
         |      / greatest(sum(rel), 1.0::DOUBLE) AS context_precision
         |  FROM cums GROUP BY q_id),
         |perq AS (
         |  SELECT p.q_id, p.n_contexts, p.relevancy, p.correctness, c.context_precision
         |  FROM per p JOIN cp c USING (q_id)),
         |mean AS (
         |  SELECT CAST(-1 AS BIGINT) AS q_id,
         |    CAST(sum(n_contexts) AS BIGINT) AS n_contexts,
         |    list_reduce(list(relevancy ORDER BY q_id), (a, b) -> a + b)
         |      / CAST(count(*) AS DOUBLE) AS relevancy,
         |    list_reduce(list(correctness ORDER BY q_id), (a, b) -> a + b)
         |      / CAST(count(*) AS DOUBLE) AS correctness,
         |    list_reduce(list(context_precision ORDER BY q_id), (a, b) -> a + b)
         |      / CAST(count(*) AS DOUBLE) AS context_precision
         |  FROM perq)
         |SELECT q_id, n_contexts, relevancy, correctness, context_precision FROM perq
         |UNION ALL SELECT q_id, n_contexts, relevancy, correctness, context_precision FROM mean
         |ORDER BY q_id""".stripMargin
  }

  /** The eval_modes_grid replay: structured-id SyntheticVec corpus,
    * the same per-dim query-mix arithmetic (every integer op mirrored
    * with full parenthesization), the 5 mode plans, and the per-
    * (mode, qtype) metric grid with q_id-ordered folds. */
  private def modesGridOracle: String = {
      def vec(idExpr: String) = graft.functions.SyntheticVec.vecSql(idExpr, 64)
      // per-dim selector: pct(q_id, j) routes to target/second/noise id
      val pct = "((((qm.q_id * 64 + j) * 1099087573) >> 8) % 100)"
      val sel = s"(CASE WHEN $pct < qm.p1 THEN qm.target_id " +
        s"WHEN $pct < qm.p1 + qm.p2 THEN qm.second_id " +
        "ELSE 3000000 + qm.q_id END)"
      val qe = "list_transform(range(0, 64), j -> CASE WHEN " +
        s"(((($sel * 64 + j) * 2246822519) >> 16) & 1) = 0 " +
        "THEN 1.0 ELSE -1.0 END)"
      def bestPerDoc(rel: String) =
        s"""SELECT q_id, label, vec_id, sim FROM (
           |  SELECT q_id, label, vec_id, sim, row_number() OVER (
           |    PARTITION BY q_id, label ORDER BY sim DESC, vec_id ASC) AS rn
           |  FROM $rel) WHERE rn = 1""".stripMargin
      def rankTop10(rel: String) =
        s"""SELECT q_id, label, rank FROM (
           |  SELECT q_id, label, row_number() OVER (
           |    PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
           |  FROM $rel) WHERE rank <= 10""".stripMargin
      def metrics(mode: String, qt: String, rel: String, n: Int) =
        s"""SELECT '$mode' AS mode, '$qt' AS qtype,
           |  coalesce(sum(CASE WHEN rank <= 1 THEN 1 ELSE 0 END), 0)::DOUBLE / CAST($n AS DOUBLE) AS hit1,
           |  coalesce(sum(CASE WHEN rank <= 3 THEN 1 ELSE 0 END), 0)::DOUBLE / CAST($n AS DOUBLE) AS hit3,
           |  coalesce(sum(CASE WHEN rank <= 5 THEN 1 ELSE 0 END), 0)::DOUBLE / CAST($n AS DOUBLE) AS hit5,
           |  coalesce(sum(CASE WHEN rank <= 10 THEN 1 ELSE 0 END), 0)::DOUBLE / CAST($n AS DOUBLE) AS hit10,
           |  coalesce(CASE WHEN count(*) > 0 THEN list_reduce(
           |    list(1.0::DOUBLE / rank ORDER BY q_id), (a, b) -> a + b) END, 0.0)
           |    / CAST($n AS DOUBLE) AS mrr,
           |  coalesce(CASE WHEN count(*) > 0 THEN list_reduce(
           |    list(CASE WHEN rank <= 5 THEN $invLog2Sql[rank::INT] ELSE 0.0::DOUBLE END
           |         ORDER BY q_id), (a, b) -> a + b) END, 0.0)
           |    / CAST($n AS DOUBLE) AS ndcg5,
           |  coalesce(CASE WHEN count(*) > 0 THEN list_reduce(
           |    list($invLog2Sql[rank::INT] ORDER BY q_id), (a, b) -> a + b) END, 0.0)
           |    / CAST($n AS DOUBLE) AS ndcg10
           |FROM (
           |  SELECT r.q_id, r.rank FROM $rel r JOIN qm ON r.q_id = qm.q_id
           |  WHERE r.label = qm.rel_doc AND qm.qtype = '$qt')""".stripMargin
      s"""WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 40),
         |vecs AS (
         |  SELECT doc_id AS label, 'summary' AS vtype, 1000000 + doc_id AS vec_id
         |  FROM docs
         |  UNION ALL
         |  SELECT doc_id, 'chunk', 2000000 + doc_id * 10 + k
         |  FROM docs, LATERAL (SELECT unnest([0, 1, 2]) AS k)),
         |qm AS (
         |  SELECT doc_id AS rel_doc, qslot, doc_id * 3 + qslot AS q_id,
         |    CASE WHEN qslot = 0 THEN 'thematic' ELSE 'detail' END AS qtype,
         |    CASE WHEN qslot = 0 THEN 1000000 + doc_id
         |         ELSE 2000000 + doc_id * 10 + (qslot - 1) END AS target_id,
         |    CASE WHEN qslot = 0 THEN 2000000 + doc_id * 10
         |         ELSE 1000000 + doc_id END AS second_id,
         |    CASE WHEN qslot = 0 THEN 60
         |         WHEN (doc_id + qslot) % 3 = 0 THEN 38
         |         WHEN (doc_id + qslot) % 3 = 1 THEN 60 ELSE 28 END AS p1,
         |    CASE WHEN qslot = 0 THEN 22
         |         WHEN (doc_id + qslot) % 3 = 0 THEN 38
         |         WHEN (doc_id + qslot) % 3 = 1 THEN 12 ELSE 52 END AS p2
         |  FROM docs, LATERAL (SELECT unnest([0, 1, 2]) AS qslot)),
         |qv AS (SELECT qm.q_id, $qe AS qe FROM qm),
         |ssim AS (
         |  SELECT q.q_id, v.label, v.vec_id,
         |    list_inner_product(${vec("v.vec_id")}, q.qe) AS sim
         |  FROM vecs v CROSS JOIN qv q WHERE v.vtype = 'summary'),
         |csim AS (
         |  SELECT q.q_id, v.label, v.vec_id,
         |    list_inner_product(${vec("v.vec_id")}, q.qe) AS sim
         |  FROM vecs v CROSS JOIN qv q WHERE v.vtype = 'chunk'),
         |r_summary AS (${rankTop10("ssim")}),
         |bd_chunks AS (${bestPerDoc("csim")}),
         |r_chunks AS (${rankTop10("bd_chunks")}),
         |bd_legacy AS (${bestPerDoc(
            "(SELECT * FROM ssim UNION ALL SELECT * FROM csim)")}),
         |r_legacy AS (${rankTop10("bd_legacy")}),
         |pruned AS (
         |  SELECT c.* FROM csim c
         |  WHERE EXISTS (SELECT 1 FROM r_summary s
         |                WHERE s.q_id = c.q_id AND s.label = c.label)),
         |bd_hybrid AS (${bestPerDoc("pruned")}),
         |r_hybrid AS (${rankTop10("bd_hybrid")}),
         |bd_ssim AS (${bestPerDoc("ssim")}),
         |sb AS (${rankTop10("bd_ssim")}),
         |rrf0 AS (
         |  SELECT coalesce(s.q_id, c.q_id) AS q_id,
         |         coalesce(s.label, c.label) AS label,
         |         coalesce(0.4::DOUBLE / (60 + s.rank), 0.0) +
         |         coalesce(0.6::DOUBLE / (60 + c.rank), 0.0) AS rrf
         |  FROM sb s FULL OUTER JOIN r_chunks c
         |    ON s.q_id = c.q_id AND s.label = c.label),
         |r_rrf AS (
         |  SELECT q_id, label, rank FROM (
         |    SELECT q_id, label, row_number() OVER (
         |      PARTITION BY q_id ORDER BY rrf DESC, label ASC) AS rank
         |    FROM rrf0) WHERE rank <= 10)
         |SELECT * FROM (
         |  ${metrics("chunks_only", "detail", "r_chunks", 80)}
         |  UNION ALL ${metrics("chunks_only", "thematic", "r_chunks", 40)}
         |  UNION ALL ${metrics("hybrid", "detail", "r_hybrid", 80)}
         |  UNION ALL ${metrics("hybrid", "thematic", "r_hybrid", 40)}
         |  UNION ALL ${metrics("legacy", "detail", "r_legacy", 80)}
         |  UNION ALL ${metrics("legacy", "thematic", "r_legacy", 40)}
         |  UNION ALL ${metrics("rrf_fusion", "detail", "r_rrf", 80)}
         |  UNION ALL ${metrics("rrf_fusion", "thematic", "r_rrf", 40)}
         |  UNION ALL ${metrics("summary_only", "detail", "r_summary", 80)}
         |  UNION ALL ${metrics("summary_only", "thematic", "r_summary", 40)})
         |ORDER BY mode, qtype""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "eval_modes_grid" -> modesGridOracle,
    "eval_retrieval_exact" -> retrievalOracle(30),
    "eval_retrieval_metrics" -> retrievalOracle(40),
    "eval_rewrite_exact" -> rewriteOracle(30),
    "eval_rewrite_ab" -> rewriteOracle(40),
    "eval_answer_exact" -> answerOracle(30),
    "eval_answer_quality" -> answerOracle(40))
}
