package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{ProductQuantization => PQ}

/** One stats-driven batch-serving entry point (round-13 verdict
  * task 3): the PHYSICAL twin of the reference's V10 logical strategy
  * router (`enhanced_search_service.py:12-41` picks semantic vs hybrid
  * vs traditional from query shape; this picks the ANN TIER from
  * stored index state).
  *
  * The engine grew five parallel batch entry points — brute
  * (`Search.knnBatch`), IVF (`Search.ivfSearchBatch`), PQ-ADC
  * (`PQ.pqSearchBatch`), IVF-PQ (`PQ.ivfpqSearchBatch`) and the
  * binary-Hamming coarse tier — each with its own signature, leaving
  * tier choice to the caller the way BENCHVEC reasons by hand.
  * [[searchBatch]] folds them behind one call: [[route]] inspects
  * [[IndexState]] (which index assets exist, corpus size vs the
  * brute-force ceiling, the caller's recall floor) and every tier
  * returns the same normalized (q_id, rank, id, sim, tier) frame, so
  * swapping tiers is a stats change, not a code change.
  *
  * Routing order mirrors the cost ladder the BENCHVEC measurements
  * established at 500k × 768-d:
  *  1. exactness wins when it is cheap or demanded — corpus at or
  *     under `bruteForceCeiling` rows, or `recallFloor` ≥ 0.999
  *     (exact contract), routes brute force: one scan, zero index
  *     dependencies, recall 1.0;
  *  2. cells + codes compound → IVF-PQ (probe-pruned scan at
  *     m/(8·dim) of the bytes — the lowest measured bytes of any
  *     full-path leg);
  *  3. cells alone → IVF (probe-pruned full-width scan);
  *  4. codes alone → PQ-ADC (full-corpus compressed scan);
  *  5. sign-sketch alone → binary Hamming (8-byte coarse scan +
  *     exact rescore);
  *  6. nothing → brute force.
  * Every lossy tier ends in the exact rescore of its candidates, so
  * the router trades recall/bytes, never result EXACTNESS on the
  * returned rows' scores.
  */
object Serving {

  sealed trait Tier { def name: String }
  case object BruteForceTier extends Tier { val name = "brute_force" }
  case object IvfTier extends Tier { val name = "ivf" }
  case object PqTier extends Tier { val name = "pq" }
  case object IvfPqTier extends Tier { val name = "ivf_pq" }
  case object HammingTier extends Tier { val name = "hamming" }

  /** Everything the router consults: the uncompressed corpus plus
    * whatever derived index assets the serving deployment maintains
    * (all optional — the CDC-maintained set: cells via x17, codes via
    * x19, byid layout via x20). `corpusSize` comes from store stats
    * (a manifest row count at scale), not a scan. Column contract:
    * `cells` is `Search.ivfAssign` output (tenant, id, embedding,
    * cell); `encoded` is `PQ.pqEncode` output (tenant, id, codes),
    * joined with the cell column when `encodedHasCells`; `signWords`
    * carries (tenant, id, words) from [[signPack]]. */
  final case class IndexState(
      vectors: DataFrame,
      corpusSize: Long,
      centroids: Option[Map[String, Array[Array[Double]]]] = None,
      cells: Option[DataFrame] = None,
      codebooks: Option[Map[String, PQ.Codebooks]] = None,
      encoded: Option[DataFrame] = None,
      encodedHasCells: Boolean = false,
      residualCodes: Boolean = false,
      signWords: Option[DataFrame] = None,
      byidPath: Option[String] = None,
      tenantCol: String = "tenant",
      idCol: String = "id",
      embCol: String = "embedding")

  /** The routing decision alone — pure function of the state and the
    * caller's requirements, so specs pin the full decision matrix. */
  def route(state: IndexState, recallFloor: Double = 0.0,
            bruteForceCeiling: Long = 10000L): Tier =
    if (recallFloor >= 0.999 || state.corpusSize <= bruteForceCeiling)
      BruteForceTier
    else if (state.centroids.isDefined && state.cells.isDefined)
      if (state.codebooks.isDefined && state.encoded.isDefined &&
          state.encodedHasCells) IvfPqTier
      else IvfTier
    // residual codes are meaningless without the centroids their
    // decomposition references — never route them to the flat PQ scan
    else if (state.codebooks.isDefined && state.encoded.isDefined &&
             !state.residualCodes) PqTier
    else if (state.signWords.isDefined) HammingTier
    else BruteForceTier

  /** Route + serve: one call, one normalized output schema
    * (q_id, rank, id, sim, tier) across every tier. */
  def searchBatch(state: IndexState, tenant: String,
                  queries: Seq[(Long, Seq[Double])], k: Int,
                  nProbe: Int = 4, rescoreK: Int = 50,
                  threshold: Double = 0.0, recallFloor: Double = 0.0,
                  bruteForceCeiling: Long = 10000L): DataFrame = {
    val tier = route(state, recallFloor, bruteForceCeiling)
    // with a CDC-maintained byid store (x20) present, candidate
    // rescore point-reads go THROUGH it (base + delta segments +
    // tombstones) — a stale `vectors` frame can never serve old bytes
    val fetch: Option[Seq[Long] => DataFrame] = state.byidPath.map { p =>
      (ids: Seq[Long]) =>
        ByidStore.fetch(state.vectors.sparkSession, p, ids, state.idCol)
    }
    val raw = tier match {
      case BruteForceTier =>
        Search.knnBatch(
            state.vectors.filter(col(state.tenantCol) === tenant),
            queries, k, threshold, state.idCol, state.embCol)
          .select(col("q_id"), col("rank"), col("vec_id").as("id"), col("sim"))
      case IvfTier =>
        Search.ivfSearchBatch(state.cells.get, state.centroids.get, tenant,
            queries, k, nProbe, threshold)
          .select("q_id", "rank", "id", "sim")
      case PqTier =>
        ranked(PQ.pqSearchBatch(state.encoded.get, state.vectors,
          state.codebooks.get, tenant, queries, k, rescoreK, threshold,
          state.tenantCol, state.idCol, state.embCol, fetch))
      case IvfPqTier =>
        // a residual codes table (pqEncodeResidual) MUST be scored by
        // the decomposed IVFADC path — running the raw ADC scorer over
        // residual codes silently drops the dot(q, centroid) term, a
        // wrong-RANKING trap the state flag closes
        if (state.residualCodes)
          ranked(PQ.ivfadcSearchBatch(state.encoded.get, state.vectors,
            state.codebooks.get, state.centroids.get, tenant, queries, k,
            rescoreK, nProbe, threshold, state.tenantCol, state.idCol,
            state.embCol, fetch))
        else
          ranked(PQ.ivfpqSearchBatch(state.encoded.get, state.vectors,
            state.codebooks.get, state.centroids.get, tenant, queries, k,
            rescoreK, nProbe, threshold, state.tenantCol, state.idCol,
            state.embCol, fetch))
      case HammingTier =>
        ranked(hammingSearchBatch(state.signWords.get, state.vectors, tenant,
          queries, k, rescoreK, threshold, state.tenantCol, state.idCol,
          state.embCol, fetch))
    }
    raw.withColumn("tier", lit(tier.name))
  }

  /** Single-query routed search — [[searchBatch]] with a batch of one,
    * q_id dropped: (rank, id, sim, tier). */
  def search(state: IndexState, tenant: String, queryVec: Seq[Double],
             k: Int, nProbe: Int = 4, rescoreK: Int = 50,
             threshold: Double = 0.0, recallFloor: Double = 0.0,
             bruteForceCeiling: Long = 10000L): DataFrame =
    searchBatch(state, tenant, Seq((0L, queryVec)), k, nProbe, rescoreK,
      threshold, recallFloor, bruteForceCeiling).drop("q_id")

  /** Normalize a (q_id, id, …, sim) candidate frame to the router's
    * output contract — rank over the ≤ k·Q result rows, never the
    * corpus. */
  private def ranked(df: DataFrame): DataFrame =
    df.withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("id").asc)).cast("int"))
      .select("q_id", "rank", "id", "sim")
      .orderBy("q_id", "rank")

  /** Sign-bit sketch packing: 64 dims per long, bit i of word w set
    * when component (64·w + i) > 0 — the SRP/binary-quantization tier
    * (`ann_binary_hamming`) as a reusable serving asset. Map-only
    * (zero shuffle); at 100 TB the words table is dim/64 longs per
    * row — the cheapest scan of the quantization ladder. */
  /** Build the (tenant, id, words) sign-sketch asset — ONE tight-loop
    * UDF pass over the corpus (NOT SQL higher-order functions, whose
    * per-element interpreted lambdas cost minutes at 500k × 768:
    * the BenchVec bin-pack measurement), `toArray` once per row so
    * indexing is O(1). Map-only, zero shuffle. */
  def signPackAll(vectors: DataFrame, tenantCol: String, idCol: String,
                  embCol: String, dim: Int): DataFrame = {
    require(dim % 64 == 0, s"signPackAll needs dim % 64 == 0, got $dim")
    val nw = dim / 64
    val packUdf = udf { (e: Seq[Double]) =>
      val a = e.toArray
      val out = new Array[Long](nw)
      var w = 0
      while (w < nw) {
        var acc = 0L; var i = 0
        while (i < 64) { if (a(w * 64 + i) > 0.0) acc |= (1L << i); i += 1 }
        out(w) = acc; w += 1
      }
      out.toSeq
    }
    vectors.select(col(tenantCol).cast("string").as("tenant"),
      col(idCol).cast("long").as("id"),
      packUdf(col(embCol).cast("array<double>")).as("words"))
  }

  /** Driver-side twin of [[signPack]] for query vectors. */
  def signPackLocal(v: Seq[Double]): Seq[Long] = {
    require(v.length % 64 == 0, s"signPackLocal needs dim % 64 == 0")
    (0 until v.length / 64).map { w =>
      (0 until 64).foldLeft(0L)((acc, i) =>
        if (v(64 * w + i) > 0.0) acc | (1L << i) else acc)
    }
  }

  /** Batched binary-Hamming serving: ONE words scan (8 bytes/row at
    * 512-d) evaluates Q XOR+popcount distances per row, per-query
    * coarse top-`rescoreK` through the primitive grouped top-k
    * (score = −hamming, so the shared DESC selection ranks ascending
    * distance with the same id tiebreak), then the shared
    * one-point-fetch exact rescore — the same batch spine as
    * `PQ.pqSearchBatch`, at the cheapest coarse-scan bytes of the
    * ladder. Column contract: `signWords` must carry the canonical
    * (tenant, id, words) columns as [[signPackAll]] produces. */
  def hammingSearchBatch(signWords: DataFrame, vectors: DataFrame,
                         tenant: String, queries: Seq[(Long, Seq[Double])],
                         k: Int, rescoreK: Int, threshold: Double = 0.0,
                         tenantCol: String = "tenant", idCol: String = "id",
                         embCol: String = "embedding",
                         fetchById: Option[Seq[Long] => DataFrame] = None): DataFrame = {
    // unrolled per-word XOR+popcount chain — plain codegen
    // expressions, NOT zip_with/aggregate: SQL higher-order-function
    // lambdas evaluate interpreted per element (the BenchVec
    // bin-pack measurement: 384M lambda calls ≈ 533 s), while an
    // element_at + bit_count chain stays inside whole-stage codegen
    def hamming(words: Column, qw: Seq[Long]): Column =
      qw.indices.map { w =>
        call_function("bit_count",
          element_at(words, w + 1).bitwiseXOR(lit(qw(w)))).cast("long")
      }.reduce(_ + _)
    val distArr = array(queries.map { case (qid, qv) =>
      struct(lit(qid).as("q_id"),
        (-hamming(col("words"), signPackLocal(qv)).cast("double")).as("adc"))
    }: _*)
    val cand = signWords.filter(col("tenant") === tenant)
      .select(col("id"), explode(distArr).as("qa"))
      .select(col("qa.q_id").as("q_id"), col("qa.adc").as("adc"), col("id"))
    PQ.rescoreBatch(PQ.candTopK(cand, rescoreK), vectors, queries, k,
        threshold, tenant, tenantCol, idCol, embCol, fetchById)
      .withColumnRenamed("adc_score", "neg_hamming")
  }

  // ---------------------------------------------------------------- //

  private def base(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .withColumn("tenant", lit("all"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The router under the exact gate: a FULL index state (sampled IVF
    // cells + PQ codes joined with cells — the ann_ivfpq_batch build)
    // with the brute-force ceiling forced to 0, so the stats-driven
    // decision is IVF-PQ at every SF; the routed batch must then be
    // row-identical to Q independent single-query IVF-PQ searches
    // (the oracle replays five Lloyd kernels per batch member), with
    // the routing decision itself pinned as the `tier` column. The
    // decision MATRIX (ceiling, recall floor, partial index states)
    // is spec-pinned in ServingSpec, mirroring v10_route_strategy's
    // logical-router gate.
    "ann_auto_topk" -> ((s, d) => {
      val e = base(s, d)
      val cents = Search.ivfTrainSampled(e, "tenant", "vec_id", "embedding", 16,
        sampleCap = 256)
      val assigned = Search.ivfAssign(e, "tenant", "vec_id", "embedding", cents)
      val books = PQ.pqTrainSampled(e, "tenant", "vec_id", "embedding", 4, 8, 256)
      val enc = PQ.pqEncode(e, "tenant", "vec_id", "embedding", books)
        .join(assigned.select(col("tenant"), col("id"), col("cell")),
          Seq("tenant", "id"))
      val qids = Seq(0L, 1L, 2L)
      val qs = qids.zip(Search.qvecs(s, d, qids))
      val st = IndexState(vectors = e, corpusSize = e.count(),
        centroids = Some(cents), cells = Some(assigned),
        codebooks = Some(books), encoded = Some(enc), encodedHasCells = true,
        idCol = "vec_id", embCol = "embedding")
      searchBatch(st, "all", qs, k = 10, nProbe = 4, rescoreK = 50,
        bruteForceCeiling = 0L)
    })
  )

  val oracles: Map[String, String] = Map(
    // the single-query IVF-PQ replay once per batch member (the
    // ann_ivfpq_batch oracle), normalized to the router contract:
    // per-query rank over (sim DESC, id ASC) and the constant routed
    // tier.
    "ann_auto_topk" -> {
      def arm(qid: Long): String =
        s"""SELECT CAST($qid AS BIGINT) AS q_id,
           |  row_number() OVER (ORDER BY t.sim DESC, t.id ASC) AS rank,
           |  t.id, t.sim, 'ivf_pq' AS tier
           |FROM (${PQ.ivfpqSingleSql(qid)}) t""".stripMargin
      Seq(0L, 1L, 2L).map(arm)
        .mkString("", "\nUNION ALL\n", "\nORDER BY q_id ASC, rank ASC")
    }
  )
}
