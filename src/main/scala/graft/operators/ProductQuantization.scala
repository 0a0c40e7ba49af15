package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorFunctions.dot

/** Product quantization (PQ) — the compressed-scan ANN path for the
  * 100 TB tier, complementing the IVF cell layout (`Search.ivfBuild`)
  * and int8 scalar quantization (`vq_quantize_int8`).
  *
  * The reference serves vectors from an in-process ChromaDB store
  * (`vector_db_service.py:165-261`) and never needs compression at its
  * ≤10k-vector tenant scale; at corpus scale the dominant ANN cost is
  * the bytes scanned per query, and PQ attacks exactly that: each
  * embedding is split into `m` subvectors, each subvector replaced by
  * the index of its nearest codeword in a per-subspace codebook
  * trained on a bounded sample. A 768-d float64 vector (6,144 B)
  * becomes `m` small ints (m bytes at ksub ≤ 256) — a 32–64×
  * smaller scan with query-time scoring via an m×ksub lookup table
  * (asymmetric distance computation, ADC), then exact rescoring of
  * the top candidates from the uncompressed store.
  *
  * Every stage is deterministic and oracle-replayable (the same
  * discipline as the sampled IVF build, `Search.ivfTrainSampled`):
  *  - TRAIN: per tenant, the `sampleCap` lowest-id vectors; per
  *    subspace, the shared deterministic Lloyd kernel
  *    (`Clustering.localKMeans` — evenly-spaced id-order init, 10
  *    iterations, keep-first argmin) over the subvector slices;
  *    codewords are member means folded in id order. The DuckDB
  *    oracle replays this with `Clustering.kmeansCte` at dim = dsub.
  *  - ENCODE: one narrow map over the corpus against the broadcast
  *    codebooks — argmin of squared distance, left fold, keep-first
  *    `<` tiebreak (exactly `Search.ivfAssign`'s loop). Zero shuffle.
  *  - SEARCH: the ADC lookup table is built driver-side (m×ksub
  *    doubles — tiny) and broadcast; scoring the code column is a
  *    narrow map + TakeOrderedAndProject; the `rescoreK` survivors
  *    broadcast-join back to the uncompressed table for exact dots.
  *
  * Scale posture: train is bounded (sampleCap × tenants rows through
  * the driver), encode and ADC scan are shuffle-free maps, rescore
  * touches `rescoreK` rows. At 100 TB the codes table is the only
  * full-corpus scan — `m / (8 × dim)` of the raw bytes — and pairs
  * with the IVF (tenant, cell) layout for probe-pruned ADC
  * (`BenchVec` measures both at 500k × 768-d).
  */
object ProductQuantization {

  /** codebooks(s)(c) = codeword c of subspace s, a dsub-length vector. */
  type Codebooks = Array[Array[Array[Double]]]

  /** Train per-tenant PQ codebooks on a deterministic bounded sample
    * (the `sampleCap` lowest ids — same rank rule as
    * `Search.ivfTrainSampled`, no RNG). `m` must divide the embedding
    * dim. Returns tenant → m codebooks of ≤ ksub codewords each
    * (Lloyd cells that end empty are dropped by the dense renumbering,
    * same as the IVF build). */
  def pqTrainSampled(vectors: DataFrame, tenantCol: String, idCol: String,
                     embCol: String, m: Int, ksub: Int,
                     sampleCap: Int = 2048): Map[String, Codebooks] = {
    // bounded sample keys (partial-aggregated, window-free — see
    // Search.sampleKeys), embeddings fetched by broadcast join —
    // never sorts full rows through one task
    val keys = Search.sampleKeys(vectors, tenantCol, idCol, sampleCap)
    val sample = vectors
      .select(col(tenantCol).cast("string").as("tenant"),
        col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .join(broadcast(keys), Seq("tenant", "id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2).toArray))
    sample.groupBy(_._1).map { case (t, rows) =>
      val pts = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val dim = pts.head._2.length
      require(dim % m == 0, s"embedding dim $dim not divisible into $m subspaces")
      val dsub = dim / m
      val books: Codebooks = Array.tabulate(m) { s =>
        val sub = pts.map { case (id, v) =>
          (id, java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
        }
        val assigned = Clustering.localKMeans(sub, ksub)
        val byId = sub.toMap
        // member means folded in id order — bit-reproducible and
        // exactly the oracle's list(emb ORDER BY id) fold
        assigned.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, ms) =>
          val sum = new Array[Double](dsub)
          ms.sortBy(_._1).foreach { mm =>
            val v = byId(mm._1); var j = 0
            while (j < dsub) { sum(j) += v(j); j += 1 }
          }
          sum.map(_ / ms.length)
        }.toArray
      }
      t -> books
    }
  }

  /** Encode every vector as its m nearest-codeword indices — ONE
    * narrow map against the broadcast codebooks (squared-distance
    * left fold, keep-first `<` tiebreak). Output (tenant, id, codes);
    * write this partitioned/bucketed and the ADC scan never touches
    * the raw embeddings. */
  def pqEncode(vectors: DataFrame, tenantCol: String, idCol: String,
               embCol: String, codebooks: Map[String, Codebooks]): DataFrame = {
    val bc = vectors.sparkSession.sparkContext.broadcast(codebooks)
    val encUdf = udf { (t: String, e: Seq[Double]) =>
      val books = bc.value(t)
      val m = books.length
      val v = e.toArray
      val dsub = v.length / m
      val codes = new Array[Int](m)
      var s = 0
      while (s < m) {
        val cb = books(s)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cb.length) {
          val cen = cb(c); var dd = 0.0; var j = 0
          while (j < dsub) { val df = v(s * dsub + j) - cen(j); dd += df * df; j += 1 }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        codes(s) = best; s += 1
      }
      codes
    }
    vectors
      .select(col(tenantCol).cast("string").as("tenant"),
        col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("embedding"))
      .select(col("tenant"), col("id"),
        encUdf(col("tenant"), col("embedding")).as("codes"))
  }

  /** `pqEncode` with the serving layout: codes PACKED as one unsigned
    * byte per subspace (requires ksub ≤ 256) — the m-byte binary
    * column a 100 TB codes table actually stores. Parquet decodes a
    * binary literal far cheaper than an m-element int array (BenchVec
    * measures the ADC scan dropping under brute force only with this
    * layout: the array form's decode cost swamps the 8× arithmetic
    * win at page-cached local scale), and `AdcScore` reads it natively
    * in codegen. Same argmin loop, same code values — PqSpec asserts
    * byte-for-int parity with the array encoder. */
  def pqEncodePacked(vectors: DataFrame, tenantCol: String, idCol: String,
                     embCol: String, codebooks: Map[String, Codebooks]): DataFrame = {
    require(codebooks.values.forall(_.forall(_.length <= 256)),
      "packed codes need ksub <= 256")
    val bc = vectors.sparkSession.sparkContext.broadcast(codebooks)
    val encUdf = udf { (t: String, e: Seq[Double]) =>
      val books = bc.value(t)
      val m = books.length
      val v = e.toArray
      val dsub = v.length / m
      val codes = new Array[Byte](m)
      var s = 0
      while (s < m) {
        val cb = books(s)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cb.length) {
          val cen = cb(c); var dd = 0.0; var j = 0
          while (j < dsub) { val df = v(s * dsub + j) - cen(j); dd += df * df; j += 1 }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        codes(s) = (best & 0xFF).toByte; s += 1
      }
      codes
    }
    vectors
      .select(col(tenantCol).cast("string").as("tenant"),
        col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("embedding"))
      .select(col("tenant"), col("id"),
        encUdf(col("tenant"), col("embedding")).as("codes"))
  }

  /** ADC lookup table for one query: lut(s)(c) = dot(query subvector
    * s, codeword c) — m×ksub doubles, built driver-side, broadcast.
    * Σ_s lut(s)(code_s) approximates dot(query, vector) with the
    * vector snapped to its codewords. */
  def adcLut(books: Codebooks, queryVec: Seq[Double]): Array[Array[Double]] = {
    val q = queryVec.toArray
    val m = books.length
    val dsub = q.length / m
    Array.tabulate(m) { s =>
      val cb = books(s)
      Array.tabulate(cb.length) { c =>
        var acc = 0.0; var j = 0
        while (j < dsub) { acc += q(s * dsub + j) * cb(c)(j); j += 1 }
        acc
      }
    }
  }

  /** PQ search: ADC-score the code column (narrow map + TakeOrdered),
    * take the `rescoreK` best candidates, broadcast them back to the
    * uncompressed vectors for exact cosine, return the exact top-k.
    * The full-corpus scan reads ONLY the codes; the embedding store is
    * touched for `rescoreK` rows — IN ROWS. In BYTES the broadcast
    * join still scans the raw table (the hash probe decodes every
    * row), which is fine at tenant scale but at corpus scale the raw
    * store must be id-keyed: BenchVec measures the difference (the
    * join-rescore was SLOWER than brute force at 500k×768-d; an
    * id-sorted layout + isin pushdown page-skips to the 200
    * candidates). Serving deployments pair this with the sorted/
    * bucketed-by-id raw layout or the IVF cell layout (rescore from
    * probed cells only — `ann_ivfpq_topk`). */
  def pqSearch(encoded: DataFrame, vectors: DataFrame,
               codebooks: Map[String, Codebooks], tenant: String,
               queryVec: Seq[Double], k: Int, rescoreK: Int,
               threshold: Double = 0.0, tenantCol: String = "tenant",
               idCol: String = "id", embCol: String = "embedding"): DataFrame = {
    // ADC scoring runs as a native codegen expression (the lut is
    // query-constant and tiny — m×ksub doubles — so it rides inside
    // the generated code, not a broadcast+UDF boundary): the one
    // expression evaluated for every corpus row stays in
    // whole-stage codegen.
    val cand = encoded.filter(col("tenant") === tenant)
      .withColumn("adc_score",
        graft.functions.VectorFunctions.adcScore(col("codes"),
          adcLut(codebooks(tenant), queryVec)))
      .orderBy(col("adc_score").desc, col("id").asc)
      .limit(rescoreK)
      .select("id", "adc_score")
    vectors.filter(col(tenantCol) === tenant)
      .select(col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .join(broadcast(cand), Seq("id"))
      .withColumn("sim", dot(col("emb"), typedLit(queryVec)))
      .filter(col("sim") >= threshold)
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
      .select("id", "adc_score", "sim")
  }

  /** Batched PQ serving: ONE codes scan answers the whole query batch
    * (the compressed-tier counterpart of `Search.knnBatch` /
    * `ivfSearchBatch` — per-query scans re-read the codes table Q
    * times; at corpus scale the scan IS the cost, so amortizing it
    * across the batch is the serving lever). Each code row evaluates Q
    * codegen `AdcScore` expressions (each LUT rides as a codegen
    * reference object, m×ksub doubles — tiny), stacked into one array
    * and exploded to (q_id, adc, id); per-query candidate top-rescoreK
    * comes from the partial-aggregating `TopK`, so the shuffle carries
    * ≤ rescoreK rows per (query, partition), never the corpus. The
    * exact rescore is ONE bounded point-fetch for the UNION of all
    * candidates: ids collect to the driver (≤ Q·rescoreK — the same
    * bounded contract as the single-query broadcast) and push down as
    * `Layout.idsPredicate`'s or-of-eq, so an id-keyed raw layout
    * (`Layout.pointFetchWrite`) reads candidate PAGES, not the table.
    * Like `knnBatch`, intended for bounded batches (≲64 queries): the
    * per-row expression count grows with Q.
    *
    * Column contract (ADVICE r13): `tenantCol`/`idCol`/`embCol` rename
    * the UNCOMPRESSED `vectors` relation only; the `encoded` relation
    * must carry the canonical `tenant`/`id`/`codes` columns exactly as
    * `pqEncode` produces them. */
  def pqSearchBatch(encoded: DataFrame, vectors: DataFrame,
                    codebooks: Map[String, Codebooks], tenant: String,
                    queries: Seq[(Long, Seq[Double])], k: Int, rescoreK: Int,
                    threshold: Double = 0.0, tenantCol: String = "tenant",
                    idCol: String = "id", embCol: String = "embedding",
                    fetchById: Option[Seq[Long] => DataFrame] = None): DataFrame = {
    val sess = encoded.sparkSession
    import sess.implicits._
    val adcArr = array(queries.map { case (qid, qv) =>
      struct(lit(qid).as("q_id"),
        graft.functions.VectorFunctions.adcScore(col("codes"),
          adcLut(codebooks(tenant), qv)).as("adc"))
    }: _*)
    val cand = encoded.filter(col("tenant") === tenant)
      .select(col("id"), explode(adcArr).as("qa"))
      .select(col("qa.q_id").as("q_id"), col("qa.adc").as("adc"), col("id"))
    rescoreBatch(candTopK(cand, rescoreK), vectors, queries, k, threshold,
      tenant, tenantCol, idCol, embCol, fetchById)
  }

  /** Per-query candidate top-`rescoreK` over (q_id, adc, id) rows via
    * the primitive grouped top-k (TopK.primitiveTopK: per-partition
    * bounded arrays fold the multi-million-row candidate stream at
    * scan speed — the typed aggregator alone cost ~2 s at 4M rows —
    * then the tiny ≤ rescoreK-per-(query, partition) remainder merges
    * through the exact-ordered aggregator; the shuffle carries
    * candidates, never the corpus). */
  private[operators] def candTopK(cand: DataFrame, rescoreK: Int): DataFrame = {
    val sess = cand.sparkSession
    import sess.implicits._
    graft.functions.TopK.primitiveTopK(cand.as[(Long, Double, Long)], rescoreK)
      .select(col("g").as("q_id"), explode(col("top")).as("r"))
      .select(col("q_id"), col("r.id").as("id"), col("r.score").as("adc_score"))
  }

  /** Shared batch rescore: collect the candidate set (bounded by
    * Q·rescoreK rows by construction), push the id union down as
    * `Layout.idsPredicate`'s or-of-eq (one point-fetch for the whole
    * batch), exact-dot each (q, id) against the literal query map,
    * exact top-k per query. `fetchById` overrides WHERE the candidate
    * embeddings come from — the default reads `vectors` with the
    * or-of-eq predicate; a serving deployment with a CDC-maintained
    * byid store (x20) passes `ByidStore.fetch` so the point read goes
    * through base + delta segments + tombstones instead of a possibly
    * stale frame. */
  private[operators] def rescoreBatch(cand: DataFrame, vectors: DataFrame,
                           queries: Seq[(Long, Seq[Double])], k: Int,
                           threshold: Double, tenant: String,
                           tenantCol: String, idCol: String,
                           embCol: String,
                           fetchById: Option[Seq[Long] => DataFrame] = None): DataFrame = {
    val sess = cand.sparkSession
    import sess.implicits._
    val candSeq: Seq[(Long, Long, Double)] =
      cand.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Empty candidate set (empty codes table, unknown tenant, zero
    // probed cells): return the empty frame the single-query path
    // produces instead of handing idsPredicate an empty id list
    // (ADVICE r13).
    if (candSeq.isEmpty)
      return Seq.empty[(Long, Long, Double, Double)]
        .toDF("q_id", "id", "adc_score", "sim")
    val ids = candSeq.map(_._2).distinct
    val qmap: Map[Long, Seq[Double]] = queries.toMap
    val fetched = fetchById match {
      // the byid store keys on id ALONE (ByidStore scaladoc: ids must
      // be globally unique across tenants, as the reference's uuids
      // are) — re-filter by tenant as belt-and-braces so a store that
      // DOES carry the column can never serve another tenant's
      // embedding bytes into this tenant's rescore (ADVICE r14)
      case Some(f) =>
        val raw = f(ids)
        val scoped = if (raw.columns.contains(tenantCol))
          raw.filter(col(tenantCol) === tenant) else raw
        scoped.select(col(idCol).cast("long").as("id"),
          col(embCol).cast("array<double>").as("emb"))
      case None => vectors.filter(col(tenantCol) === tenant)
        .select(col(idCol).cast("long").as("id"),
          col(embCol).cast("array<double>").as("emb"))
        .filter(Layout.idsPredicate(col("id"), ids))
    }
    fetched
      .join(broadcast(candSeq.toDF("q_id", "id", "adc_score")), Seq("id"))
      .withColumn("sim", dot(col("emb"), element_at(typedLit(qmap), col("q_id"))))
      .filter(col("sim") >= threshold)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id").asc)))
      .filter(col("rnk") <= k)
      .select("q_id", "id", "adc_score", "sim")
      .orderBy(col("q_id").asc, col("sim").desc, col("id").asc)
  }

  /** Batched IVF-PQ serving — both prunings compound ACROSS the batch:
    * ONE scan of the UNION of all queries' probed cells (partition
    * pruning bounds it to ≤ nProbe·Q/nCells of the codes table), each
    * scanned row ADC-scores only against the queries whose probe set
    * contains its cell (`isin` gate per query before the codegen
    * AdcScore — rows outside a query's probes contribute null and are
    * filtered), per-query partial TopK, then the shared one-point-fetch
    * exact rescore. The batched counterpart of `ann_ivfpq_topk`'s
    * single-query path, mirroring `Search.ivfSearchBatch`.
    *
    * Column contract (ADVICE r13): `tenantCol`/`idCol`/`embCol` rename
    * the UNCOMPRESSED `vectors` relation only; `encodedCells` must
    * carry the canonical `tenant`/`id`/`codes`/`cell` columns (as
    * `pqEncode` joined to the cell assignment produces). */
  def ivfpqSearchBatch(encodedCells: DataFrame, vectors: DataFrame,
                       codebooks: Map[String, Codebooks],
                       centroids: Map[String, Array[Array[Double]]],
                       tenant: String, queries: Seq[(Long, Seq[Double])],
                       k: Int, rescoreK: Int, nProbe: Int,
                       threshold: Double = 0.0, tenantCol: String = "tenant",
                       idCol: String = "id", embCol: String = "embedding",
                       fetchById: Option[Seq[Long] => DataFrame] = None): DataFrame = {
    val probes: Seq[(Long, Seq[Double], Seq[Int])] = queries.map {
      case (qid, qv) => (qid, qv, Search.ivfProbeCells(centroids, tenant, qv, nProbe))
    }
    val union = probes.flatMap(_._3).distinct.sorted
    val adcArr = array(probes.map { case (qid, qv, cells) =>
      struct(lit(qid).as("q_id"),
        when(col("cell").isin(cells: _*),
          graft.functions.VectorFunctions.adcScore(col("codes"),
            adcLut(codebooks(tenant), qv))).as("adc"))
    }: _*)
    val cand = encodedCells
      .filter(col("tenant") === tenant && col("cell").isin(union: _*))
      .select(col("id"), col("cell"), explode(adcArr).as("qa"))
      .filter(col("qa.adc").isNotNull)
      .select(col("qa.q_id").as("q_id"), col("qa.adc").as("adc"), col("id"))
    rescoreBatch(candTopK(cand, rescoreK), vectors, queries, k, threshold,
      tenant, tenantCol, idCol, embCol, fetchById)
  }

  // ---- residual coding (IVFADC proper) ---------------------------- //

  private def argminCell(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val cen = cents(c); var s = 0.0; var j = 0
      while (j < cen.length) { val df = v(j) - cen(j); s += df * df; j += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  private def dotL(a: Array[Double], b: Seq[Double]): Double = {
    var s = 0.0; var j = 0
    while (j < a.length) { s += a(j) * b(j); j += 1 }
    s
  }

  /** Residual PQ training (Jégou et al. 2011's IVFADC, the FAISS
    * default): codebooks are trained on `v − centroid(cell(v))`
    * instead of the raw vectors. Within one IVF cell the vectors
    * share the centroid's coarse position, so the residuals carry
    * only the fine structure — the same ksub codewords spend their
    * resolution on a much smaller domain, closing the ADC ranking
    * error that raw coding pays (round-13 verdict task 4: recall@10
    * 0.275 vs plain IVF's 0.288 ceiling at nprobe 8 on the uniform
    * corpus). Same deterministic discipline as [[pqTrainSampled]]:
    * sampleCap lowest ids, cell assignment via the shared argmin,
    * per-subspace Lloyd over the residual slices, member means in id
    * order — the DuckDB oracle replays every stage. */
  def pqTrainResidualSampled(vectors: DataFrame, tenantCol: String, idCol: String,
                             embCol: String,
                             centroids: Map[String, Array[Array[Double]]],
                             m: Int, ksub: Int,
                             sampleCap: Int = 2048): Map[String, Codebooks] = {
    val keys = Search.sampleKeys(vectors, tenantCol, idCol, sampleCap)
    val sample = vectors
      .select(col(tenantCol).cast("string").as("tenant"),
        col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .join(broadcast(keys), Seq("tenant", "id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2).toArray))
    sample.groupBy(_._1).map { case (t, rows) =>
      val cents = centroids(t)
      val pts = rows.map { r =>
        val v = r._3
        val cen = cents(argminCell(v, cents))
        val res = new Array[Double](v.length)
        var j = 0
        while (j < v.length) { res(j) = v(j) - cen(j); j += 1 }
        (r._2, res)
      }.sortBy(_._1)
      val dim = pts.head._2.length
      require(dim % m == 0, s"embedding dim $dim not divisible into $m subspaces")
      val dsub = dim / m
      val books: Codebooks = Array.tabulate(m) { s =>
        val sub = pts.map { case (id, v) =>
          (id, java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
        }
        val assigned = Clustering.localKMeans(sub, ksub)
        val byId = sub.toMap
        assigned.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, ms) =>
          val sum = new Array[Double](dsub)
          ms.sortBy(_._1).foreach { mm =>
            val v = byId(mm._1); var j = 0
            while (j < dsub) { sum(j) += v(j); j += 1 }
          }
          sum.map(_ / ms.length)
        }.toArray
      }
      t -> books
    }
  }

  /** Residual encode: ONE narrow map doing cell assignment (shared
    * argmin), residual subtraction and per-subspace codeword argmin —
    * output (tenant, id, cell, codes), the IVF-PQ serving layout in a
    * single pass (no separate assign + join). Zero shuffle. */
  def pqEncodeResidual(vectors: DataFrame, tenantCol: String, idCol: String,
                       embCol: String,
                       centroids: Map[String, Array[Array[Double]]],
                       codebooks: Map[String, Codebooks]): DataFrame = {
    val sc = vectors.sparkSession.sparkContext
    val bcC = sc.broadcast(centroids)
    val bcB = sc.broadcast(codebooks)
    val encUdf = udf { (t: String, e: Seq[Double]) =>
      val cents = bcC.value(t)
      val books = bcB.value(t)
      val v = e.toArray
      val cell = argminCell(v, cents)
      val cen = cents(cell)
      val res = new Array[Double](v.length)
      var j = 0
      while (j < v.length) { res(j) = v(j) - cen(j); j += 1 }
      val m = books.length
      val dsub = v.length / m
      val codes = new Array[Int](m)
      var s = 0
      while (s < m) {
        val cb = books(s)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cb.length) {
          val cw = cb(c); var dd = 0.0; var jj = 0
          while (jj < dsub) { val df = res(s * dsub + jj) - cw(jj); dd += df * df; jj += 1 }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        codes(s) = best; s += 1
      }
      (cell, codes)
    }
    vectors
      .select(col(tenantCol).cast("string").as("tenant"),
        col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("embedding"))
      .withColumn("_a", encUdf(col("tenant"), col("embedding")))
      .select(col("tenant"), col("id"), col("_a._1").as("cell"),
        col("_a._2").as("codes"))
  }

  /** [[pqEncodeResidual]] with the packed serving layout (one unsigned
    * byte per subspace, ksub ≤ 256) — the m-byte binary codes column
    * the 100 TB IVFADC tier stores, mirroring [[pqEncodePacked]]'s
    * parquet-decode rationale. Same argmin loops, same code values. */
  def pqEncodeResidualPacked(vectors: DataFrame, tenantCol: String, idCol: String,
                             embCol: String,
                             centroids: Map[String, Array[Array[Double]]],
                             codebooks: Map[String, Codebooks]): DataFrame = {
    require(codebooks.values.forall(_.forall(_.length <= 256)),
      "packed codes need ksub <= 256")
    val sc = vectors.sparkSession.sparkContext
    val bcC = sc.broadcast(centroids)
    val bcB = sc.broadcast(codebooks)
    val encUdf = udf { (t: String, e: Seq[Double]) =>
      val cents = bcC.value(t)
      val books = bcB.value(t)
      val v = e.toArray
      val cell = argminCell(v, cents)
      val cen = cents(cell)
      val res = new Array[Double](v.length)
      var j = 0
      while (j < v.length) { res(j) = v(j) - cen(j); j += 1 }
      val m = books.length
      val dsub = v.length / m
      val codes = new Array[Byte](m)
      var s = 0
      while (s < m) {
        val cb = books(s)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cb.length) {
          val cw = cb(c); var dd = 0.0; var jj = 0
          while (jj < dsub) { val df = res(s * dsub + jj) - cw(jj); dd += df * df; jj += 1 }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        codes(s) = (best & 0xFF).toByte; s += 1
      }
      (cell, codes)
    }
    vectors
      .select(col(tenantCol).cast("string").as("tenant"),
        col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("embedding"))
      .withColumn("_a", encUdf(col("tenant"), col("embedding")))
      .select(col("tenant"), col("id"), col("_a._1").as("cell"),
        col("_a._2").as("codes"))
  }

  /** IVFADC search: probe the nProbe nearest cells, ADC-score their
    * codes AGAINST THE RESIDUAL DECOMPOSITION — dot(q, v) ≈
    * dot(q, centroid(cell)) + Σ_s lut(s)(code_s), where the lut dots
    * q's subvectors with the RESIDUAL codewords and the per-cell
    * constant rides in as a tiny literal map — then exact-rescore the
    * top `rescoreK`. Identical scan bytes to the raw-coded IVF-PQ
    * path (m codes per row); the residual decomposition buys pure
    * ranking fidelity at zero query-time cost. */
  def ivfadcSearch(encodedCells: DataFrame, vectors: DataFrame,
                   codebooks: Map[String, Codebooks],
                   centroids: Map[String, Array[Array[Double]]],
                   tenant: String, queryVec: Seq[Double], k: Int,
                   rescoreK: Int, nProbe: Int, threshold: Double = 0.0,
                   tenantCol: String = "tenant", idCol: String = "id",
                   embCol: String = "embedding"): DataFrame = {
    val cells = Search.ivfProbeCells(centroids, tenant, queryVec, nProbe)
    val centDot: Map[Int, Double] =
      cells.map(c => c -> dotL(centroids(tenant)(c), queryVec)).toMap
    val cand = encodedCells
      .filter(col("tenant") === tenant && col("cell").isin(cells: _*))
      .withColumn("adc_score",
        graft.functions.VectorFunctions.adcScore(col("codes"),
          adcLut(codebooks(tenant), queryVec)) +
          element_at(typedLit(centDot), col("cell")))
      .orderBy(col("adc_score").desc, col("id").asc)
      .limit(rescoreK)
      .select("id", "adc_score")
    vectors.filter(col(tenantCol) === tenant)
      .select(col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .join(broadcast(cand), Seq("id"))
      .withColumn("sim", dot(col("emb"), typedLit(queryVec)))
      .filter(col("sim") >= threshold)
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
      .select("id", "adc_score", "sim")
  }

  /** Batched IVFADC serving — `ivfpqSearchBatch`'s spine (ONE scan of
    * the union of all queries' probed cells, per-query partial TopK,
    * shared point-fetch rescore) with the residual decomposition: each
    * per-query stacked expression adds that query's dot(q, centroid)
    * constant for the row's cell (a tiny literal map over its probe
    * set). Same column contract as `ivfpqSearchBatch`; `encodedCells`
    * must carry RESIDUAL codes as `pqEncodeResidual` produces. */
  def ivfadcSearchBatch(encodedCells: DataFrame, vectors: DataFrame,
                        codebooks: Map[String, Codebooks],
                        centroids: Map[String, Array[Array[Double]]],
                        tenant: String, queries: Seq[(Long, Seq[Double])],
                        k: Int, rescoreK: Int, nProbe: Int,
                        threshold: Double = 0.0, tenantCol: String = "tenant",
                        idCol: String = "id", embCol: String = "embedding",
                        fetchById: Option[Seq[Long] => DataFrame] = None): DataFrame = {
    val probes: Seq[(Long, Seq[Double], Seq[Int])] = queries.map {
      case (qid, qv) => (qid, qv, Search.ivfProbeCells(centroids, tenant, qv, nProbe))
    }
    val union = probes.flatMap(_._3).distinct.sorted
    val adcArr = array(probes.map { case (qid, qv, cells) =>
      val cd: Map[Int, Double] =
        cells.map(c => c -> dotL(centroids(tenant)(c), qv)).toMap
      struct(lit(qid).as("q_id"),
        when(col("cell").isin(cells: _*),
          graft.functions.VectorFunctions.adcScore(col("codes"),
            adcLut(codebooks(tenant), qv)) +
            element_at(typedLit(cd), col("cell"))).as("adc"))
    }: _*)
    val cand = encodedCells
      .filter(col("tenant") === tenant && col("cell").isin(union: _*))
      .select(col("id"), col("cell"), explode(adcArr).as("qa"))
      .filter(col("qa.adc").isNotNull)
      .select(col("qa.q_id").as("q_id"), col("qa.adc").as("adc"), col("id"))
    rescoreBatch(candTopK(cand, rescoreK), vectors, queries, k, threshold,
      tenant, tenantCol, idCol, embCol, fetchById)
  }

  // ---------------------------------------------------------------- //

  private val M = 4
  private val Ksub = 8
  private val SampleCap = 256
  private val RescoreK = 50

  private def base(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .withColumn("tenant", lit("all"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PQ ANN end-to-end under the exact gate: sampled per-subspace
    // Lloyd training (m=4 × k=8 over the 256 lowest ids), full-corpus
    // encode, ADC top-50 by lookup-table score, exact rescore top-10.
    // The oracle replays all four stages (kmeansCte at dim=16 per
    // subspace); codeword ids differ by a monotone relabeling (dense
    // vs raw Lloyd ids) that no output column observes.
    "ann_pq_topk" -> ((s, d) => {
      val e = base(s, d)
      val books = pqTrainSampled(e, "tenant", "vec_id", "embedding", M, Ksub, SampleCap)
      val enc = pqEncode(e, "tenant", "vec_id", "embedding", books)
      val q = Search.qvecs(s, d, Seq(0L)).head
      pqSearch(enc, e, books, "all", q, 10, RescoreK,
        idCol = "vec_id", embCol = "embedding")
    }),

    // Batched PQ serving under the exact gate: three queries through
    // ONE codes scan (Q stacked codegen ADC expressions + per-query
    // partial TopK) and ONE or-of-eq point-fetch rescore of the
    // candidate union. The oracle replays the single-query pipeline
    // once per query vector and unions — proving the batch path is
    // row-identical to Q independent searches.
    "ann_pq_batch" -> ((s, d) => {
      val e = base(s, d)
      val books = pqTrainSampled(e, "tenant", "vec_id", "embedding", M, Ksub, SampleCap)
      val enc = pqEncode(e, "tenant", "vec_id", "embedding", books)
      val qids = Seq(0L, 1L, 2L)
      val qs = qids.zip(Search.qvecs(s, d, qids))
      pqSearchBatch(enc, e, books, "all", qs, 10, RescoreK,
        idCol = "vec_id", embCol = "embedding")
    }),

    // IVF-PQ combined — the full FAISS-shaped serving path as ONE
    // query: sampled IVF cells (16, probe 4) bound the scan, PQ codes
    // (m=4 × k=8) replace the embeddings inside the probed cells, ADC
    // ranks, the top 50 rescore exactly. Both prunings compound: at
    // 100 TB the per-query scan is (nProbe/nCells) of the corpus at
    // m/(4·dim) of the bytes. The oracle replays BOTH builds (five
    // Lloyd replays total) plus probe, ADC fold and rescore.
    "ann_ivfpq_topk" -> ((s, d) => {
      val e = base(s, d)
      val cents = Search.ivfTrainSampled(e, "tenant", "vec_id", "embedding", 16,
        sampleCap = SampleCap)
      val assigned = Search.ivfAssign(e, "tenant", "vec_id", "embedding", cents)
      val books = pqTrainSampled(e, "tenant", "vec_id", "embedding", M, Ksub, SampleCap)
      val enc = pqEncode(e, "tenant", "vec_id", "embedding", books)
        .join(assigned.select(col("tenant"), col("id"), col("cell")), Seq("tenant", "id"))
      val q = Search.qvecs(s, d, Seq(0L)).head
      val cells = Search.ivfProbeCells(cents, "all", q, 4)
      val cand = enc.filter(col("cell").isin(cells: _*))
        .withColumn("adc_score",
          graft.functions.VectorFunctions.adcScore(col("codes"), adcLut(books("all"), q)))
        .orderBy(col("adc_score").desc, col("id").asc)
        .limit(RescoreK)
        .select("id", "adc_score")
      e.select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("emb"))
        .join(broadcast(cand), Seq("id"))
        .withColumn("sim", graft.functions.VectorFunctions.dot(col("emb"), typedLit(q)))
        .filter(col("sim") >= 0.0)
        .orderBy(col("sim").desc, col("id").asc)
        .limit(10)
        .select("id", "adc_score", "sim")
    }),

    // Batched IVF-PQ under the exact gate: three queries, ONE scan of
    // the union of their probe-4 cell sets, per-row ADC only against
    // the queries probing that row's cell, shared point-fetch rescore.
    // The oracle replays the single-query IVF-PQ pipeline (five Lloyd
    // replays) once per batch member and unions.
    "ann_ivfpq_batch" -> ((s, d) => {
      val e = base(s, d)
      val cents = Search.ivfTrainSampled(e, "tenant", "vec_id", "embedding", 16,
        sampleCap = SampleCap)
      val assigned = Search.ivfAssign(e, "tenant", "vec_id", "embedding", cents)
      val books = pqTrainSampled(e, "tenant", "vec_id", "embedding", M, Ksub, SampleCap)
      val enc = pqEncode(e, "tenant", "vec_id", "embedding", books)
        .join(assigned.select(col("tenant"), col("id"), col("cell")), Seq("tenant", "id"))
      val qids = Seq(0L, 1L, 2L)
      val qs = qids.zip(Search.qvecs(s, d, qids))
      ivfpqSearchBatch(enc, e, books, cents, "all", qs, 10, RescoreK, 4,
        idCol = "vec_id", embCol = "embedding")
    }),

    // IVFADC proper (round-13 verdict task 4): the same probe-pruned
    // compressed scan as ann_ivfpq_topk, but the codes quantize the
    // RESIDUAL v − centroid(cell) instead of the raw vector, and the
    // ADC score decomposes as dot(q, centroid) + Σ lut — textbook
    // Jégou 2011, the FAISS IVFADC default. Identical bytes, better
    // ranking: the codewords spend their resolution on the fine
    // structure only (BENCHVEC measures the recall delta vs raw
    // coding at 500k × 768-d). Oracle replays all five Lloyd kernels
    // PLUS the residual subtraction on both the sample and the
    // corpus — every stage is IEEE-exact in both engines.
    "ann_ivfadc_topk" -> ((s, d) => {
      val e = base(s, d)
      val cents = Search.ivfTrainSampled(e, "tenant", "vec_id", "embedding", 16,
        sampleCap = SampleCap)
      val books = pqTrainResidualSampled(e, "tenant", "vec_id", "embedding",
        cents, M, Ksub, SampleCap)
      val encR = pqEncodeResidual(e, "tenant", "vec_id", "embedding", cents, books)
      val q = Search.qvecs(s, d, Seq(0L)).head
      ivfadcSearch(encR, e, books, cents, "all", q, 10, RescoreK, 4,
        idCol = "vec_id", embCol = "embedding")
    }),

    // Batched IVFADC under the exact gate: three queries, ONE scan of
    // the union of their probe-4 cell sets, per-row residual ADC
    // (+ the query's dot(q, centroid) constant for that row's cell)
    // only against the queries probing the cell, shared point-fetch
    // rescore. The oracle replays the single-query IVFADC pipeline
    // (five Lloyd replays + residual subtraction) once per batch
    // member and unions — the residual twin of ann_ivfpq_batch.
    "ann_ivfadc_batch" -> ((s, d) => {
      val e = base(s, d)
      val cents = Search.ivfTrainSampled(e, "tenant", "vec_id", "embedding", 16,
        sampleCap = SampleCap)
      val books = pqTrainResidualSampled(e, "tenant", "vec_id", "embedding",
        cents, M, Ksub, SampleCap)
      val encR = pqEncodeResidual(e, "tenant", "vec_id", "embedding", cents, books)
      val qids = Seq(0L, 1L, 2L)
      val qs = qids.zip(Search.qvecs(s, d, qids))
      ivfadcSearchBatch(encR, e, books, cents, "all", qs, 10, RescoreK, 4,
        idCol = "vec_id", embCol = "embedding")
    }),

    // Binary quantization — the cheapest scan tier of the quantization
    // ladder (float → int8 → PQ → 1 bit/dim): each dim collapses to
    // its sign bit, 64 dims pack into two 32-bit words, and the coarse
    // pass ranks the corpus by Hamming distance (two XOR+popcount ops
    // per vector — 8 bytes scanned instead of 512). The top-50 then
    // pay the exact float dot. Sign-bit hashing is the classic SRP/
    // binary-embedding scheme (Charikar 2002) modern vector stores
    // ship as their "binary quantization" tier; here the planes are
    // the coordinate axes, so pack/unpack is SQL-expressible and the
    // whole pipeline — packing, XOR, popcount, rescore — is exact in
    // both engines (every step is integer). Scale: packing is a
    // map-only scan, the coarse rank is TakeOrderedAndProject (no
    // shuffle beyond the bounded top-k), rescore touches 50 rows.
    "ann_binary_hamming" -> ((s, d) => {
      val packWord = (off: Int) =>
        expr(s"aggregate(sequence(0, 31), 0L, (acc, i) -> acc + " +
          s"IF(element_at(emb, i + ${off + 1}) > 0.0D, CAST(pow(2, i) AS BIGINT), 0L))")
      val packed = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .withColumn("w0", packWord(0))
        .withColumn("w1", packWord(32))
      val qRow = packed.filter(col("vec_id") === 0).select("w0", "w1", "emb").head()
      val (qw0, qw1) = (qRow.getLong(0), qRow.getLong(1))
      val qe = qRow.getSeq[Double](2)
      packed.filter(col("vec_id") =!= 0)
        .withColumn("x0", col("w0").bitwiseXOR(lit(qw0)))
        .withColumn("x1", col("w1").bitwiseXOR(lit(qw1)))
        .withColumn("hamming", expr("CAST(bit_count(x0) + bit_count(x1) AS BIGINT)"))
        .orderBy(col("hamming").asc, col("vec_id").asc)
        .limit(RescoreK)
        .withColumn("sim", dot(col("emb"), typedLit(qe)))
        .select("vec_id", "hamming", "sim")
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // Matryoshka truncation (Kusupati et al. 2022, public): MRL-style
    // embeddings front-load information, so the coarse pass scores
    // only the first 16 of 64 dims (4× fewer bytes and FLOPs per
    // candidate) and the top-50 rescore on the full vector. Unlike
    // PQ/binary this needs no training or codebook at all — the
    // "index" is a column projection, which at 100 TB means the
    // coarse scan reads a quarter of the vector bytes (or a separate
    // 16-dim column pruned at the parquet reader). Both stages are
    // plain dots — hash-exact in both engines.
    "ann_mrl_truncated" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .withColumn("emb16", slice(col("emb"), 1, 16))
      val qRow = e.filter(col("vec_id") === 0).select("emb", "emb16").head()
      val qe = qRow.getSeq[Double](0)
      val q16 = qRow.getSeq[Double](1)
      e.filter(col("vec_id") =!= 0)
        .withColumn("coarse", dot(col("emb16"), typedLit(q16)))
        .orderBy(col("coarse").desc, col("vec_id").asc)
        .limit(RescoreK)
        .withColumn("sim", dot(col("emb"), typedLit(qe)))
        .select("vec_id", "coarse", "sim")
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // Full-corpus encode distribution: every vector's code assignment
    // per subspace, reduced to the per-subspace occupancy profile
    // (rank by descending count). Gates the ENCODE stage over ALL
    // vectors — ann_pq_topk only observes codes that survive the ADC
    // cut. Rows are (s, rank, cnt): on count ties the rank↔codeword
    // pairing is arbitrary on both engines but the emitted rows are
    // identical, so the hash is stable.
    "pq_code_balance" -> ((s, d) => {
      val e = base(s, d)
      val books = pqTrainSampled(e, "tenant", "vec_id", "embedding", M, Ksub, SampleCap)
      val enc = pqEncode(e, "tenant", "vec_id", "embedding", books)
      enc.select(posexplode(col("codes")).as(Seq("s", "code")))
        .groupBy("s", "code").agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("s").orderBy(col("cnt").desc, col("code").asc)))
        .select(col("s"), col("rnk"), col("cnt"))
        .orderBy("s", "rnk")
    })
  )

  /** Per-subspace slice source + Lloyd replay + member-mean codebook +
    * full-corpus argmin encode, with the subspace's ADC lut score
    * attached to the winning codeword. `off` = s × dsub. */
  /** One subspace's oracle replay: sample slice → Lloyd → member-mean
    * codebook → argmin assignment of `assignRel`'s rows. `withScore`
    * adds the ADC partial (requires a `q` CTE in scope); the
    * CDC-maintenance gate (x19) assigns without a query. `sampleRel`
    * is the training-sample relation — the residual gate
    * (ann_ivfadc_topk) points both rels at residual twins. */
  private[graft] def subspaceCte(s: Int, dsub: Int, assignRel: String = "eall",
                                 withScore: Boolean = true,
                                 sampleRel: String = "esample"): String = {
    val off = s * dsub
    val rng = s"range(1, ${dsub + 1})"
    val scSel = if (withScore) ", sc" else ""
    val scExpr = if (withScore)
      s"""      list_inner_product(c.centroid,
         |        list_transform($rng, j -> q.qv[j + $off])) AS sc,
         |""".stripMargin
    else ""
    val qJoin = if (withScore) " CROSS JOIN q" else ""
    s"""p${s}src AS (
       |  SELECT id, tenant, list_transform($rng, j -> emb[j + $off]) AS emb
       |  FROM $sampleRel),
       |${Clustering.kmeansCte(Ksub, s"p${s}src", s"p${s}_", dsub)},
       |p${s}cb AS (
       |  SELECT k.best AS cell, count(*) AS cnt, list(p.emb ORDER BY p.id) AS m
       |  FROM p${s}_kassign k JOIN p${s}src p ON p.id = k.id
       |  GROUP BY k.best),
       |p${s}cen AS (
       |  SELECT cell,
       |    list_transform($rng,
       |      j -> list_reduce(list_transform(m, v -> v[j]), (x, y) -> x + y)
       |           / CAST(cnt AS DOUBLE)) AS centroid
       |  FROM p${s}cb),
       |p${s}a AS (
       |  SELECT id, cell$scSel FROM (
       |    SELECT p.id, c.cell,
       |$scExpr      row_number() OVER (PARTITION BY p.id ORDER BY
       |        list_reduce(list_transform($rng,
       |          j -> (p.emb[j + $off] - c.centroid[j]) * (p.emb[j + $off] - c.centroid[j])),
       |          (x, y) -> x + y) ASC,
       |        c.cell ASC) AS rnk
       |    FROM $assignRel p CROSS JOIN p${s}cen c$qJoin)
       |  WHERE rnk = 1)""".stripMargin
  }

  private def pqPrelude(dim: Int, qId: Long = 0L): String = {
    val dsub = dim / M
    s"""eall AS (
       |  SELECT vec_id AS id, 'all' AS tenant, embedding::DOUBLE[] AS emb
       |  FROM embeddings),
       |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = $qId),
       |esample AS (
       |  SELECT id, tenant, emb FROM (
       |    SELECT id, tenant, emb,
       |      row_number() OVER (PARTITION BY tenant ORDER BY id) AS rn FROM eall)
       |  WHERE rn <= $SampleCap),
       |${(0 until M).map(subspaceCte(_, dsub)).mkString(",\n")},
       |subsc AS (
       |${(0 until M).map(s => s"  SELECT id, $s AS s, sc FROM p${s}a")
          .mkString("\n  UNION ALL\n")}),
       |adc AS (
       |  SELECT id, list_reduce(list(sc ORDER BY s), (a, b) -> a + b) AS adc_score
       |  FROM subsc GROUP BY id)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // sign-bit pack → XOR+popcount Hamming coarse-50 → exact rescore.
    // Every stage is integer (or the final exact dot), so the replay
    // is bit-exact: 2**i is a double but exact through i=31, and the
    // two engines see the same floats so `> 0` agrees dim-for-dim.
    "ann_binary_hamming" ->
      """WITH packed AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb,
        |    CAST(list_sum(list_transform(range(0,32),
        |      i -> CASE WHEN embedding[i+1] > 0 THEN CAST(2**i AS BIGINT) ELSE 0 END)) AS BIGINT) AS w0,
        |    CAST(list_sum(list_transform(range(0,32),
        |      i -> CASE WHEN embedding[i+33] > 0 THEN CAST(2**i AS BIGINT) ELSE 0 END)) AS BIGINT) AS w1
        |  FROM embeddings),
        |q AS (SELECT w0 AS qw0, w1 AS qw1, emb AS qe FROM packed WHERE vec_id = 0),
        |coarse AS (
        |  SELECT p.vec_id, p.emb,
        |    CAST(bit_count(xor(p.w0, q.qw0)) + bit_count(xor(p.w1, q.qw1)) AS BIGINT) AS hamming
        |  FROM packed p CROSS JOIN q WHERE p.vec_id <> 0
        |  ORDER BY hamming ASC, p.vec_id ASC LIMIT 50)
        |SELECT vec_id, hamming, list_inner_product(emb, (SELECT qe FROM q)) AS sim
        |FROM coarse ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,

    // first-16-dims coarse dot → exact full-dim rescore; both stages
    // are the same sequential-fold inner product the v1 family already
    // gates, just over a sliced list.
    "ann_mrl_truncated" ->
      """WITH q AS (
        |  SELECT embedding::DOUBLE[] AS qe,
        |         array_slice(embedding::DOUBLE[], 1, 16) AS q16
        |  FROM embeddings WHERE vec_id = 0),
        |coarse AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb,
        |    list_inner_product(array_slice(embedding::DOUBLE[], 1, 16),
        |                       (SELECT q16 FROM q)) AS coarse
        |  FROM embeddings WHERE vec_id <> 0
        |  ORDER BY coarse DESC, vec_id ASC LIMIT 50)
        |SELECT vec_id, coarse, list_inner_product(emb, (SELECT qe FROM q)) AS sim
        |FROM coarse ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,

    // the 64-d embeddings table → dsub=16 per subspace; ADC fold in
    // subspace order (list ORDER BY s) mirrors the engine's ascending
    // accumulation; rescore-50 then exact top-10 as the engine does.
    "ann_pq_topk" ->
      s"""WITH RECURSIVE ${pqPrelude(64)},
         |cand AS (
         |  SELECT id, adc_score FROM adc
         |  ORDER BY adc_score DESC, id ASC LIMIT $RescoreK)
         |SELECT c.id AS id, c.adc_score,
         |       list_inner_product(p.emb, q.qv) AS sim
         |FROM cand c JOIN eall p ON p.id = c.id CROSS JOIN q
         |WHERE list_inner_product(p.emb, q.qv) >= 0.0
         |ORDER BY sim DESC, c.id ASC LIMIT 10""".stripMargin,

    // the single-query replay, once per batch member, unioned: the
    // batch plan must equal Q independent searches row for row.
    "ann_pq_batch" -> {
      def arm(qid: Long): String =
        s"""SELECT CAST($qid AS BIGINT) AS q_id, t.id, t.adc_score, t.sim FROM (
           |WITH RECURSIVE ${pqPrelude(64, qid)},
           |cand AS (
           |  SELECT id, adc_score FROM adc
           |  ORDER BY adc_score DESC, id ASC LIMIT $RescoreK)
           |SELECT c.id AS id, c.adc_score,
           |       list_inner_product(p.emb, q.qv) AS sim
           |FROM cand c JOIN eall p ON p.id = c.id CROSS JOIN q
           |WHERE list_inner_product(p.emb, q.qv) >= 0.0
           |ORDER BY sim DESC, c.id ASC LIMIT 10) t""".stripMargin
      Seq(0L, 1L, 2L).map(arm)
        .mkString("", "\nUNION ALL\n", "\nORDER BY q_id ASC, sim DESC, id ASC")
    },

    // both builds replayed: the PQ prelude (4 subspace Lloyd replays +
    // encode + ADC) plus the sampled-IVF cell replay of ann_ivf_sampled
    // (Lloyd on the same esample, member-mean centroids, full argmin
    // re-assignment, probe-4) — candidates are ADC-ranked WITHIN the
    // probed cells, then exact-rescored.
    "ann_ivfpq_topk" -> ivfpqSingleSql(0L),

    // the residual-coded twin: the same five Lloyd replays, but the
    // four subspace trainers and the corpus assignment run over the
    // RESIDUAL relations (emb − centroid of the argmin cell), and the
    // ADC fold gains the per-cell dot(q, centroid) constant — the
    // exact decomposition ivfadcSearch computes, fold order matched
    // term for term.
    "ann_ivfadc_topk" -> ivfadcSingleSql(0L),

    // the single-query IVFADC replay, once per batch member, unioned
    "ann_ivfadc_batch" -> {
      def arm(qid: Long): String =
        s"""SELECT CAST($qid AS BIGINT) AS q_id, t.id, t.adc_score, t.sim
           |FROM (${ivfadcSingleSql(qid)}) t""".stripMargin
      Seq(0L, 1L, 2L).map(arm)
        .mkString("", "\nUNION ALL\n", "\nORDER BY q_id ASC, sim DESC, id ASC")
    },

    // the single-query IVF-PQ replay, once per batch member, unioned
    "ann_ivfpq_batch" -> {
      def arm(qid: Long): String =
        s"""SELECT CAST($qid AS BIGINT) AS q_id, t.id, t.adc_score, t.sim
           |FROM (${ivfpqSingleSql(qid)}) t""".stripMargin
      Seq(0L, 1L, 2L).map(arm)
        .mkString("", "\nUNION ALL\n", "\nORDER BY q_id ASC, sim DESC, id ASC")
    },

    "pq_code_balance" ->
      s"""WITH RECURSIVE ${pqPrelude(64)},
         |percell AS (
         |${(0 until M).map(s => s"  SELECT $s AS s, cell, count(*) AS cnt FROM p${s}a GROUP BY cell")
            .mkString("\n  UNION ALL\n")})
         |SELECT s, row_number() OVER (PARTITION BY s ORDER BY cnt DESC, cell ASC) AS rnk, cnt
         |FROM percell
         |ORDER BY s, rnk""".stripMargin
  )

  /** The single-query IVFADC oracle replay: the ivfpqSingleSql
    * skeleton with residual twins — `esample_res`/`eall_res` subtract
    * each row's assigned-cell centroid, the subspace CTEs train and
    * assign over those, and the candidate score is
    * Σ_s sc + dot(q, centroid(cell)). */
  private[operators] def ivfadcSingleSql(qId: Long): String = {
    val dsub = 64 / M
    val subs = (0 until M).map(s => subspaceCte(s, dsub,
      assignRel = "eall_res", withScore = true,
      sampleRel = "esample_res")).mkString(",\n")
    s"""WITH RECURSIVE eall AS (
       |  SELECT vec_id AS id, 'all' AS tenant, embedding::DOUBLE[] AS emb
       |  FROM embeddings),
       |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = $qId),
       |esample AS (
       |  SELECT id, tenant, emb FROM (
       |    SELECT id, tenant, emb,
       |      row_number() OVER (PARTITION BY tenant ORDER BY id) AS rn FROM eall)
       |  WHERE rn <= $SampleCap),
       |${Clustering.kmeansCte(16, "esample", "s_")},
       |cents AS (
       |  SELECT k.best AS cell, count(*) AS cnt,
       |    list(p.emb ORDER BY p.id) AS m
       |  FROM s_kassign k JOIN esample p ON p.id = k.id
       |  GROUP BY k.best),
       |cenv AS (
       |  SELECT cell,
       |    list_transform(range(1, 65),
       |      j -> list_reduce(list_transform(m, v -> v[j]), (x, y) -> x + y)
       |           / CAST(cnt AS DOUBLE)) AS centroid
       |  FROM cents),
       |assignall AS (
       |  SELECT id, cell FROM (
       |    SELECT p.id, c.cell,
       |      row_number() OVER (PARTITION BY p.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          j -> (p.emb[j] - c.centroid[j]) * (p.emb[j] - c.centroid[j])),
       |          (x, y) -> x + y) ASC, c.cell ASC) AS rnk
       |    FROM eall p CROSS JOIN cenv c)
       |  WHERE rnk = 1),
       |esample_res AS (
       |  SELECT p.id, p.tenant,
       |    list_transform(range(1, 65), j -> p.emb[j] - c.centroid[j]) AS emb
       |  FROM esample p JOIN assignall a ON a.id = p.id
       |  JOIN cenv c ON c.cell = a.cell),
       |eall_res AS (
       |  SELECT p.id, p.tenant,
       |    list_transform(range(1, 65), j -> p.emb[j] - c.centroid[j]) AS emb
       |  FROM eall p JOIN assignall a ON a.id = p.id
       |  JOIN cenv c ON c.cell = a.cell),
       |$subs,
       |subsc AS (
       |${(0 until M).map(s => s"  SELECT id, $s AS s, sc FROM p${s}a")
          .mkString("\n  UNION ALL\n")}),
       |adcres AS (
       |  SELECT id, list_reduce(list(sc ORDER BY s), (a, b) -> a + b) AS r
       |  FROM subsc GROUP BY id),
       |centdot AS (
       |  SELECT a.id, a.cell, list_inner_product(c.centroid, q.qv) AS cd
       |  FROM assignall a JOIN cenv c ON c.cell = a.cell CROSS JOIN q),
       |proberank AS (
       |  SELECT cell, row_number() OVER (
       |    ORDER BY list_inner_product(centroid, q.qv) DESC, cell ASC) AS pr
       |  FROM cenv CROSS JOIN q),
       |probed AS (SELECT cell FROM proberank WHERE pr <= 4),
       |cand AS (
       |  SELECT a.id, a.r + cd.cd AS adc_score
       |  FROM adcres a
       |  JOIN centdot cd ON cd.id = a.id
       |  JOIN probed pb ON pb.cell = cd.cell
       |  ORDER BY adc_score DESC, a.id ASC LIMIT $RescoreK)
       |SELECT c.id AS id, c.adc_score,
       |       list_inner_product(p.emb, q.qv) AS sim
       |FROM cand c JOIN eall p ON p.id = c.id CROSS JOIN q
       |WHERE list_inner_product(p.emb, q.qv) >= 0.0
       |ORDER BY sim DESC, c.id ASC LIMIT 10""".stripMargin
  }

  /** The full single-query IVF-PQ oracle replay (five Lloyd replays:
    * 16-cell sampled IVF + 4 subspace codebooks), parameterized by the
    * query vector's id — shared by `ann_ivfpq_topk` (qId 0) and the
    * `ann_ivfpq_batch` arms. */
  private[operators] def ivfpqSingleSql(qId: Long): String =
      s"""WITH RECURSIVE ${pqPrelude(64, qId)},
         |${Clustering.kmeansCte(16, "esample", "s_")},
         |cents AS (
         |  SELECT k.best AS cell, count(*) AS cnt,
         |    list(p.emb ORDER BY p.id) AS m
         |  FROM s_kassign k JOIN esample p ON p.id = k.id
         |  GROUP BY k.best),
         |cenv AS (
         |  SELECT cell,
         |    list_transform(range(1, 65),
         |      j -> list_reduce(list_transform(m, v -> v[j]), (x, y) -> x + y)
         |           / CAST(cnt AS DOUBLE)) AS centroid
         |  FROM cents),
         |assignall AS (
         |  SELECT id, cell FROM (
         |    SELECT p.id, c.cell,
         |      row_number() OVER (PARTITION BY p.id ORDER BY
         |        list_reduce(list_transform(range(1, 65),
         |          j -> (p.emb[j] - c.centroid[j]) * (p.emb[j] - c.centroid[j])),
         |          (x, y) -> x + y) ASC, c.cell ASC) AS rnk
         |    FROM eall p CROSS JOIN cenv c)
         |  WHERE rnk = 1),
         |proberank AS (
         |  SELECT cell, row_number() OVER (
         |    ORDER BY list_inner_product(centroid, q.qv) DESC, cell ASC) AS pr
         |  FROM cenv CROSS JOIN q),
         |probed AS (SELECT cell FROM proberank WHERE pr <= 4),
         |cand AS (
         |  SELECT a.id, a.adc_score
         |  FROM adc a
         |  JOIN assignall asg ON asg.id = a.id
         |  JOIN probed pb ON pb.cell = asg.cell
         |  ORDER BY a.adc_score DESC, a.id ASC LIMIT $RescoreK)
         |SELECT c.id AS id, c.adc_score,
         |       list_inner_product(p.emb, q.qv) AS sim
         |FROM cand c JOIN eall p ON p.id = c.id CROSS JOIN q
         |WHERE list_inner_product(p.emb, q.qv) >= 0.0
         |ORDER BY sim DESC, c.id ASC LIMIT 10""".stripMargin
}
