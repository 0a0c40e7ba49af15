package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{RpLsh, SyntheticVec}
import graft.functions.VectorFunctions.{cosine, dot}

/** Vector search operators (SURVEY.md §2.3 V1-V13) — the reference's
  * core retrieval path re-expressed as DataFrame plan shapes.
  *
  * Semantics mirrored from the reference:
  *  - V1 kNN: cosine top-k with threshold post-filter
  *    (`vector_db_service.py:165-261`; similarity = dot of normalized
  *    vectors, `embedding_service.py:181-209`).
  *  - V4 two-stage: summary-kNN candidates prune the chunk search
  *    space via a semi join (`enhanced_search_service.py:126-203`).
  *  - V6 RRF: per-branch keep-best-per-doc + rank, full-outer fuse
  *    w_s/(k0+rank_s) + w_c/(k0+rank_c), k0=60, weights 0.4/0.6
  *    (`enhanced_search_service.py:259-506`).
  *  - V7 dedup keep-max per doc (`:508-548`), V8 multi-query weighted
  *    merge with positional weights 1.3/1.1/1.0
  *    (`qa_search_coordinator.py:119-205`), V11 traditional parallel
  *    merge (`:207-269`).
  *
  * Test-data mapping: the driver's `embeddings` table plays the vector
  * store — even `vec_id` rows act as summary vectors, odd rows as
  * chunk vectors, `label` as the owning document id.
  *
  * Scale posture: every kNN is a single parquet scan + codegen'd dot +
  * `TakeOrderedAndProject` (no shuffle); fusion joins operate on ≤2k
  * candidate rows and broadcast automatically under AQE. At 100 TB
  * the vectors table is partitioned by `owner_id` (tenant pruning) —
  * the per-query cost is one tenant shard scan, embarrassingly
  * parallel across executors.
  */
object Search {

  /** V1 — brute-force exact cosine top-k over normalized vectors. */
  def knn(vectors: DataFrame, queryVec: Seq[Double], k: Int, threshold: Double,
          idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    vectors
      .withColumn("sim", dot(col(embCol), typedLit(queryVec)))
      .filter(col("sim") >= threshold)
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** W2/V7 — keep the best-scoring row per document. */
  def keepBestPerDoc(df: DataFrame, docCol: String = "label",
                     idCol: String = "vec_id"): DataFrame =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(docCol).orderBy(col("sim").desc, col(idCol).asc)))
      .filter(col("_rn") === 1).drop("_rn")

  /** V7+D4 — rerank/dedup stage-2 results, then backfill from stage-1:
    * keep the best chunk per document in score order; when fewer than k
    * documents survive, append stage-1 documents not yet seen, again in
    * score order (`enhanced_search_service.py:508-548`). `src` marks the
    * leg (0 = stage-2 dedup, 1 = stage-1 backfill) and drives the
    * append-after ordering — the reference's sequential loop is exactly
    * a union ordered by (leg, score) cut at k. The seen-set at the start
    * of the reference's backfill loop is every distinct stage-2 document
    * (the dedup loop only breaks early when k is already reached, in
    * which case the limit discards backfill rows anyway). Both inputs
    * are already top-k-bounded, so the anti join broadcasts.
    */
  def rerankDedupBackfill(stage2: DataFrame, stage1: DataFrame, k: Int): DataFrame = {
    val dedup = keepBestPerDoc(stage2).withColumn("src", lit(0))
    val seen = stage2.select("label").distinct()
    val backfill = keepBestPerDoc(stage1)
      .join(broadcast(seen), Seq("label"), "left_anti")
      .withColumn("src", lit(1))
    dedup.unionByName(backfill)
      .orderBy(col("src").asc, col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Rank a (small, already top-k-limited) branch by score —
    * BoundedWindow keeps the partition spec non-empty so WindowExec's
    * global-window warning can't fire on these k-bounded inputs. */
  private def ranked(df: DataFrame, idCol: String = "vec_id"): DataFrame =
    df.withColumn("rank", row_number().over(
      graft.functions.BoundedWindow.orderBy(col(idCol), col("sim").desc, col(idCol).asc)))

  /** V4 — two-stage hybrid: summary candidates semi-join-prune chunks. */
  def twoStage(summaries: DataFrame, chunks: DataFrame, queryVec: Seq[Double],
               stage1K: Int, stage2K: Int, threshold: Double): DataFrame = {
    val cand = knn(summaries, queryVec, stage1K, threshold).select("label").distinct()
    knn(chunks.join(broadcast(cand), Seq("label"), "left_semi"),
      queryVec, stage2K, threshold)
  }

  /** V6 — RRF fusion of a summary branch and a chunk branch. */
  def rrfFusion(summaries: DataFrame, chunks: DataFrame, queryVec: Seq[Double],
                branchK: Int, k: Int, k0: Int = 60,
                wSummary: Double = 0.4, wChunks: Double = 0.6): DataFrame = {
    val s = ranked(keepBestPerDoc(knn(summaries, queryVec, branchK, 0.0)))
      .select(col("label"), col("vec_id").as("s_vec_id"), col("sim").as("s_sim"),
        col("rank").as("s_rank"))
    val c = ranked(keepBestPerDoc(knn(chunks, queryVec, branchK, 0.0)))
      .select(col("label"), col("vec_id").as("c_vec_id"), col("sim").as("c_sim"),
        col("rank").as("c_rank"))
    s.join(c, Seq("label"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(wSummary) / (lit(k0) + col("s_rank")), lit(0.0)) +
          coalesce(lit(wChunks) / (lit(k0) + col("c_rank")), lit(0.0)))
      // result row prefers the chunk representative, else summary
      // (enhanced_search_service.py:458-488)
      .withColumn("rep_vec_id", coalesce(col("c_vec_id"), col("s_vec_id")))
      .select("label", "rep_vec_id", "rrf_score")
      .orderBy(col("rrf_score").desc, col("label").asc)
      .limit(k)
  }

  /** V8 — multi-query weighted merge with positional weights. */
  def multiQueryMerge(vectors: DataFrame, queryVecs: Seq[Seq[Double]],
                      weights: Seq[Double], perQueryK: Int, k: Int): DataFrame = {
    val branches = queryVecs.zip(weights).map { case (q, w) =>
      knn(vectors, q, perQueryK, 0.0).withColumn("wsim", col("sim") * lit(w))
    }
    val all = branches.reduce(_ unionByName _)
    all.withColumn("_rn", row_number().over(
        Window.partitionBy("label").orderBy(col("wsim").desc, col("vec_id").asc)))
      .filter(col("_rn") === 1).drop("_rn", "sim")
      .orderBy(col("wsim").desc, col("label").asc)
      .limit(k)
  }

  /** V9 — greedy diversity re-rank (MMR-lite): admit a result if its
    * first-10-token word set overlaps the accumulated seen-set by < 5
    * words, or fewer than max(3, k/2) admitted so far
    * (`search_strategy.py:44-73`). Inherently sequential over a ≤50-row
    * candidate list → runs on the driver by design (SURVEY §2.3 V9).
    */
  def diversityRerank(results: Array[(Long, Double, String)], k: Int): Array[(Long, Double, String)] = {
    val floor = math.max(3, k / 2)
    val seen = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, String)]
    for (r <- results if out.size < k) {
      val words = r._3.toLowerCase.split("\\s+").filter(_.nonEmpty).take(10).toSet
      val overlap = words.count(seen)
      if (overlap < 5 || out.size < floor) {
        out += r
        seen ++= words
      }
    }
    out.toArray
  }

  /** V12 — engine-level degradation: if the primary search plan fails
    * or returns empty, rerun a relaxed single-stage kNN with
    * threshold × 0.7 (`qa_search_coordinator.py:271-297`). */
  def withFallback(primary: => DataFrame, vectors: DataFrame, queryVec: Seq[Double],
                   k: Int, threshold: Double): DataFrame = {
    // Execution (the emptiness probe) must run INSIDE the try: a plan that
    // builds fine but fails at execution time is exactly the degradation
    // case V12 covers. The primary is persisted BEFORE the probe and the
    // probe is a FULL count (not limit(1)) — limit(1) would only
    // materialize the partitions scanned to find one row, so a
    // nondeterministic plan could pass the probe yet return different
    // rows from the unscanned partitions. A full count materializes
    // every cached partition once; primaries are top-k-bounded searches,
    // so the extra cost over limit(1) is negligible. (The persisted
    // handle follows the SparkEntry.queries clearCache contract; the
    // fallback path unpersists eagerly.)
    val attempt: Option[DataFrame] =
      try {
        val df = primary.persist()
        try {
          if (df.count() == 0L) { df.unpersist(false); None }
          else Some(df)
        } catch { case e: Throwable => df.unpersist(false); throw e }
      } catch { case scala.util.control.NonFatal(_) => None }
    attempt.getOrElse(knn(vectors, queryVec, k, threshold * 0.7))
  }

  /** IVF index build — the documented ANN scale path (SURVEY §7.3):
    * per-tenant centroids (deterministic local k-means), every vector
    * assigned to its nearest centroid cell. At 100 TB the vectors
    * table is then written partitioned/bucketed by (tenant, cell) so a
    * query scans only `nProbe` cells instead of the tenant shard.
    * Returns the cell-assigned vectors; centroids are derivable via
    * `ivfCentroids`.
    */
  def ivfBuild(vectors: DataFrame, tenantCol: String, idCol: String,
               embCol: String, nCells: Int): DataFrame = {
    val cells = Clustering.clusterPerTenant(vectors, tenantCol, idCol, embCol, nCells)
      .select(col("tenant"), col("id"), col("cluster_idx").as("cell"))
    vectors
      .select(col(tenantCol).cast("string").as("tenant"), col(idCol).cast("long").as("id"),
        col(embCol).as("embedding"))
      .join(cells, Seq("tenant", "id"))
  }

  /** Mean embedding per (tenant, cell) — the probe set. Tiny (tenants ×
    * nCells rows): broadcast/collect freely. The mean folds members in
    * id order (zip_with over the sorted collect_list) rather than
    * shuffle-order avg: bit-reproducible across runs/partitionings —
    * a probe RANKING built on it never flips on re-run — and exactly
    * replayable by the DuckDB oracle (ann_ivf_topk). */
  def ivfCentroids(indexed: DataFrame): DataFrame =
    indexed
      .select(col("tenant"), col("cell"), col("id"),
        col("embedding").cast("array<double>").as("emb"))
      .groupBy("tenant", "cell")
      .agg(count(lit(1)).as("cnt"),
        array_sort(collect_list(struct(col("id"), col("emb")))).as("lst"))
      // Accumulator dim comes from the DATA (first member's vector),
      // not a hard-coded 64: zip_with null-pads mismatched lengths, so
      // a fixed-width zero vector would silently null out centroids
      // for any other dimensionality (round-5 ADVICE).
      .select(col("tenant"), col("cell"), col("cnt"),
        aggregate(col("lst"),
          array_repeat(lit(0.0), size(element_at(col("lst"), 1).getField("emb"))),
          (acc, e) => zip_with(acc, e.getField("emb"), (a, x) => a + x)).as("sums"))
      .select(col("tenant"), col("cell"),
        transform(col("sums"), x => x / col("cnt").cast("double")).as("centroid"))

  /** IVF search: probe the nProbe nearest cells (centroid ranking on
    * the driver — O(nCells) tiny), then exact kNN inside those cells
    * only. Exactness trades for scan fraction ≈ nProbe/nCells.
    */
  def ivfSearch(indexed: DataFrame, centroids: DataFrame, tenant: String,
                queryVec: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val cellRank = centroids.filter(col("tenant") === tenant)
      .select(col("cell"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .map { case (c, cen) =>
        val sim = cen.zip(queryVec).map { case (a, b) => a * b }.sum
        (c, sim)
      }
      .sortBy { case (c, sim) => (-sim, c) }
      .take(nProbe).map(_._1)
    knn(indexed.filter(col("tenant") === tenant && col("cell").isin(cellRank: _*)),
      queryVec, k, 0.0, idCol = "id")
  }

  /** Deterministic bounded sample keys: the `cap` LOWEST ids per
    * tenant (reproducible, no RNG), selected by the partial-aggregating
    * `TopKAggregator` with a constant score — its (score DESC, id ASC)
    * total order then reduces to id ASC, so each map task keeps ≤cap
    * keys per tenant and the shuffle carries ≤ cap·partitions rows.
    * This replaces a per-tenant rank window over the keys, which had
    * two problems at scale: (a) a single-tenant corpus sorts EVERY key
    * through one task — 10B rows of ids is still an 80 GB single-task
    * sort; (b) when the tenant column is a constant (`lit("all")`),
    * Catalyst folds the foldable partition key away and the empty-spec
    * WindowExec warning fires (the round-7 bench-tail regression). The
    * aggregator form is bounded for ANY tenant cardinality and has no
    * window at all. */
  def sampleKeys(vectors: DataFrame, tenantCol: String, idCol: String,
                 cap: Int): DataFrame = {
    val sess = vectors.sparkSession
    import sess.implicits._
    vectors
      .select(col(tenantCol).cast("string").as("tenant"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(t => graft.functions.ScoredRow(0.0, t._2))
      .agg(graft.functions.TopK.topK(cap).name("top"))
      .toDF("tenant", "top")
      .select(col("tenant"), explode(col("top.id")).as("id"))
  }

  /** Scale-path IVF centroid training (the 100 TB variant of the
    * per-tenant local build): `ivfBuild`'s in-task k-means is exact for
    * the reference's ≤10k-vector tenants but cannot run inside one
    * task when a tenant shard holds millions of vectors. Centroids are
    * trained on a bounded DETERMINISTIC sample per tenant (the
    * `sampleCap` lowest ids — reproducible, no RNG) with the same
    * deterministic Lloyd kernel, and derived as member means folded in
    * id order. Returns tenant → centroid matrix; the map is tiny
    * (tenants × nCells × dim) and broadcasts. */
  def ivfTrainSampled(vectors: DataFrame, tenantCol: String, idCol: String,
                      embCol: String, nCells: Int,
                      sampleCap: Int = 2048): Map[String, Array[Array[Double]]] = {
    // Bounded sample-key selection; fetched embeddings ride a broadcast
    // join — never sorts full rows through one task (see sampleKeys).
    val keys = sampleKeys(vectors, tenantCol, idCol, sampleCap)
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
      val assigned = Clustering.localKMeans(pts, nCells)
      val embById = pts.toMap
      val cents = assigned.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, ms) =>
        val sum = new Array[Double](dim)
        ms.sortBy(_._1).foreach { m =>
          val v = embById(m._1); var j = 0
          while (j < dim) { sum(j) += v(j); j += 1 }
        }
        sum.map(_ / ms.length)
      }
      t -> cents.toArray
    }
  }

  /** Distributed cell assignment against broadcast centroids: argmin
    * of squared distance in a tight local loop — ONE narrow map over
    * the corpus, zero shuffle. Write the result partitioned by
    * (tenant, cell) and `ivfProbeCells` + a partition-pruned scan
    * replace the full-corpus kNN (BenchVec measures the win at 500k ×
    * 768-d). */
  def ivfAssign(vectors: DataFrame, tenantCol: String, idCol: String,
                embCol: String,
                centroids: Map[String, Array[Array[Double]]]): DataFrame = {
    val spark = vectors.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    val argminUdf = udf { (t: String, e: Seq[Double]) =>
      val cents = bc.value(t)
      val v = e.toArray // one primitive copy, then a boxing-free hot loop
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cents.length) {
        val cen = cents(c); var s = 0.0; var j = 0
        while (j < cen.length) { val df = v(j) - cen(j); s += df * df; j += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      best
    }
    vectors.select(col(tenantCol).cast("string").as("tenant"),
        col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("embedding"))
      .withColumn("cell", argminUdf(col("tenant"), col("embedding")))
  }

  /** `ivfAssign` plus the squared distance to the winning centroid —
    * the maintenance signal an incremental index append monitors
    * (rising assign distance on new batches = centroid drift; the
    * retrain trigger). Same broadcast-argmin narrow map; the distance
    * fold accumulates in ascending component order so it replays
    * bitwise in the oracle. */
  def ivfAssignWithDist(vectors: DataFrame, tenantCol: String, idCol: String,
                        embCol: String,
                        centroids: Map[String, Array[Array[Double]]]): DataFrame = {
    val spark = vectors.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf { (t: String, e: Seq[Double]) =>
      val cents = bc.value(t)
      val v = e.toArray
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cents.length) {
        val cen = cents(c); var s = 0.0; var j = 0
        while (j < cen.length) { val df = v(j) - cen(j); s += df * df; j += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      (best, bestD)
    }
    vectors.select(col(tenantCol).cast("string").as("tenant"),
        col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("embedding"))
      .withColumn("_a", assignUdf(col("tenant"), col("embedding")))
      .select(col("tenant"), col("id"), col("embedding"),
        col("_a._1").as("cell"), col("_a._2").as("d2"))
  }

  /** Train + assign in one call — the sampled counterpart of
    * `ivfBuild`, same output shape. */
  def ivfBuildSampled(vectors: DataFrame, tenantCol: String, idCol: String,
                      embCol: String, nCells: Int, sampleCap: Int = 2048): DataFrame =
    ivfAssign(vectors, tenantCol, idCol, embCol,
      ivfTrainSampled(vectors, tenantCol, idCol, embCol, nCells, sampleCap))

  /** Probe ranking for a trained centroid set: the `nProbe` cells
    * nearest (by dot) to the query — driver-side over the tiny
    * broadcastable matrix, same ranking rule as `ivfSearch`. */
  def ivfProbeCells(centroids: Map[String, Array[Array[Double]]], tenant: String,
                    queryVec: Seq[Double], nProbe: Int): Seq[Int] =
    centroids(tenant).zipWithIndex.map { case (cen, c) =>
      var s = 0.0; var j = 0
      while (j < cen.length) { s += cen(j) * queryVec(j); j += 1 }
      (c, s)
    }.sortBy { case (c, s) => (-s, c) }.take(nProbe).map(_._1).toSeq

  /** Batched multi-query kNN — the query-THROUGHPUT serving shape: one
    * corpus scan serves a whole broadcast batch of queries. Each row
    * explodes against the tiny literal query matrix (a codegen
    * generator, no join) and the bounded `TopKAggregator`
    * partial-aggregates map-side, so the shuffle carries ≤ k rows per
    * (query, map partition) — NOT the corpus×Q rows the window form
    * (`ann_bruteforce_batch`) sort-shuffles. At 100 TB this amortizes
    * the scan: Q queries cost ONE corpus read plus a k·Q·partitions
    * shuffle, vs Q full reads for a per-query loop (BenchVec measures
    * the amortization at 500k × 768-d). Ordering is total (sim DESC,
    * id ASC), so results are hash-identical to the per-query path. */
  def knnBatch(vectors: DataFrame, queries: Seq[(Long, Seq[Double])], k: Int,
               threshold: Double, idCol: String = "vec_id",
               embCol: String = "embedding",
               excludeSelf: Boolean = false): DataFrame = {
    val sess = vectors.sparkSession
    import sess.implicits._
    val base = vectors
      .select(col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("emb"))
    // Small batches ride as a plan literal (a codegen generator, no
    // join); past ~64 queries the literal bloats the logical plan and
    // generated code linearly in Q, so large batches become a broadcast
    // cross join instead — same rows, same scoring, one corpus scan
    // either way (ADVICE r7).
    val exploded = (if (queries.size <= 64)
      base.select(col("id"), col("emb"), explode(typedLit(queries)).as("q"))
    else {
      val qdf = queries.toDF("_1", "_2")
      base.crossJoin(broadcast(qdf))
        .select(col("id"), col("emb"), struct(col("_1"), col("_2")).as("q"))
    })
      .withColumn("sim", dot(col("emb"), col("q._2")))
      .filter(col("sim") >= threshold)
    val scored = if (excludeSelf) exploded.filter(col("id") =!= col("q._1"))
                 else exploded
    // primitive grouped top-k (TopK.primitiveTopK): identical selection
    // to the typed aggregator, but the multi-million-row scored stream
    // folds through bounded per-partition arrays instead of paying the
    // aggregation-buffer boundary per row (measured ~2 s at 4M rows).
    graft.functions.TopK.primitiveTopK(
        scored.select(col("q._1").as("q_id"), col("sim"), col("id"))
          .as[(Long, Double, Long)], k)
      .select(col("g").as("q_id"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("r.id").as("vec_id"), col("r.score").as("sim"))
      .orderBy("q_id", "rank")
  }

  /** Batched IVF search: the probe sets of ALL queries in the batch
    * are unioned into one cell predicate (partition pruning bounds the
    * scan to the union — still nProbe·Q/nCells of the corpus at
    * worst), each scanned row is scored only against the queries
    * whose probe set contains its cell (`array_contains` before the
    * dot), and per-query top-k comes from the partial-aggregating
    * `TopKAggregator`. One pruned scan serves the whole batch. */
  def ivfSearchBatch(indexed: DataFrame,
                     centroids: Map[String, Array[Array[Double]]],
                     tenant: String, queries: Seq[(Long, Seq[Double])],
                     k: Int, nProbe: Int,
                     threshold: Double = 0.0): DataFrame = {
    val sess = indexed.sparkSession
    import sess.implicits._
    val probes: Seq[(Long, Seq[Double], Seq[Int])] = queries.map {
      case (qid, qv) => (qid, qv, ivfProbeCells(centroids, tenant, qv, nProbe))
    }
    val union = probes.flatMap(_._3).distinct.sorted
    indexed.filter(col("tenant") === tenant)
      .filter(col("cell").isin(union: _*))
      .select(col("id"), col("embedding").as("emb"), col("cell"),
        explode(typedLit(probes)).as("q"))
      .filter(array_contains(col("q._3"), col("cell")))
      .withColumn("sim", dot(col("emb"), col("q._2")))
      .filter(col("sim") >= threshold)
      .select(col("q._1").as("q_id"), col("sim"), col("id"))
      .transform(df => graft.functions.TopK.primitiveTopK(
        df.as[(Long, Double, Long)], k)) // same selection, no per-row buffer boundary
      .select(col("g").as("q_id"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("r.id").as("id"), col("r.score").as("sim"))
      .orderBy("q_id", "rank")
  }

  /** Fetch several query vectors in ONE action (one isin scan +
    * collect), never one .head() job per id — the driver-round-trip
    * anti-pattern flagged in round 3 (x2_standard_qa 0.62 s → 7.2 s
    * under contention was three sequential point-lookup jobs). */
  private[graft] def qvecs(s: SparkSession, d: String, ids: Seq[Long]): Seq[Seq[Double]] = {
    val m = Tables.embeddings(s, d).filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    ids.map(m)
  }

  private def qvec(s: SparkSession, d: String, id: Long): Seq[Double] =
    qvecs(s, d, Seq(id)).head

  private def summaries(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") % 2 === 0)
  private def chunks(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") % 2 === 1)

  // ---- 768-d reference-dimensionality parity family ----------------
  // The test embeddings are 64-d; the reference embeds at 768
  // (`embedding_service.py:17`). This family reruns the kNN/fusion/LSH
  // operators at true dimensionality over a deterministic ±1 corpus
  // (functions/SyntheticVec) whose dot products are integer-valued —
  // so unlike most embedder-dependent math, the ENTIRE 768-d path is
  // hash-exact against DuckDB (the oracle rebuilds the same vectors
  // from the same integer mix). Plan shape is identical to the 64-d
  // twins (scan + codegen dot + TakeOrderedAndProject, no shuffle);
  // only the per-row dot cost changes (12×), which is exactly what the
  // bench entries are meant to expose.
  private[graft] val q768: Seq[Double] = SyntheticVec.vecLocal(0, 768).toSeq
  // 10 planes = 1,024 buckets: plane count follows CORPUS size
  // (buckets ≈ n/occupancy; 5k docs at sf0.1 → ~5/bucket), NOT dim —
  // widening vectors 64→768 raises projection cost, not the number of
  // bits needed to split the same corpus.
  private[graft] val rp768 = new RpLsh(10, 768)
  /** The 768-d synthetic relation, fanned out BEFORE the synthesis
    * (only doc_ids shuffle — guide §2.5; the single-file scan
    * serialized every downstream dot product on one core). `cache =
    * true` (the default) additionally PERSISTS the synthesized
    * vectors: without the cache barrier the threshold filters
    * re-inline the synthesis below the fan (predicate pushdown
    * crosses a repartition), putting the dominant per-row pass back
    * on one partition — and evaluating it twice (the mm_phash
    * re-inlining class). Measured: v1_knn_768 1.42→0.79 s,
    * v4 1.73→1.00, v6 1.50→0.93. ann_rp_lsh_768 opts OUT (cache =
    * false): its bucket filter prunes ~95% of rows before any dot, so
    * materializing every vector into the cache costs more than it
    * saves (measured 1.08→1.76 s with the cache — reverted). Callers
    * run under the bench/Verify clearCache-per-query contract. */
  private def vecs768(s: SparkSession, d: String,
                      cache: Boolean = true): DataFrame = {
    val v = Tables.fanOut(Tables.documents(s, d)
        .select(col("doc_id"), expr("doc_id div 5").as("label")))
      .select(
        col("doc_id").as("vec_id"),
        col("label"),
        SyntheticVec.vecCol(col("doc_id"), 768).as("embedding"))
    if (cache) v.persist() else v
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // V1 — kNN cosine top-k with threshold (vector_db_service.py:165-261).
    "v1_knn_topk" -> ((s, d) =>
      knn(Tables.embeddings(s, d), qvec(s, d, 0), 10, 0.3)
        .select("vec_id", "label", "sim")),

    // V3 — sample scan: first-N summary vectors of a tenant, the
    // clustering input feed (vector_db_service.py:325-387; the 10k cap
    // is a Chroma workaround dropped here per SURVEY V3 note — the cap
    // is kept only as the explicit limit parameter).
    "v3_sample_scan" -> ((s, d) =>
      summaries(s, d).filter(col("label") < 5)
        .select("vec_id", "label")
        .orderBy("vec_id")
        .limit(100)),

    // S9 — batch vector delete: anti join on an id list; survivors
    // reported (vector_db_service.py:288-323).
    "s9_batch_delete" -> ((s, d) => {
      import s.implicits._
      val ids = Seq(0L, 1L, 2L, 3L, 17L, 99L).toDF("del_id")
      Tables.embeddings(s, d)
        .join(ids, col("vec_id") === col("del_id"), "left_anti")
        .groupBy("label").agg(count(lit(1)).as("n_remaining"))
        .orderBy("label")
    }),

    // V2 — all vectors of one document, fixed sim 1.0 (vector_db_service.py:429-474).
    "v2_get_by_doc" -> ((s, d) =>
      Tables.embeddings(s, d).filter(col("label") === 3)
        .select(col("vec_id"), col("label"), lit(1.0).as("sim"))
        .orderBy("vec_id")),

    // V1 under the reference's single most-tested property — OWNER
    // ISOLATION (`test_vector_db_api.py:442-472`, SURVEY §5): an
    // adversarial copy of the QUERY VECTOR ITSELF (sim = ‖q‖² — would
    // rank first corpus-wide) is injected under another tenant; the
    // tenant-scoped kNN must never surface it. The oracle injects the
    // same bait row and proves the tenant-pruned ranking hash-exactly.
    // TenantIsolationSpec runs the same adversarial shape over every
    // tenant-scoped operator (IVF, clustering, dedup).
    "v1_knn_isolation" -> ((s, d) => {
      val q = qvec(s, d, 0)
      val bait = Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select((col("vec_id") + 50000).as("vec_id"),
          typedLit(q).as("embedding"), lit(99).as("label"))
      val corpus = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"),
          col("label"))
        .unionByName(bait)
      knn(corpus.filter(col("label") === 3), q, 10, 0.0)
        .select("vec_id", "label", "sim")
    }),

    // V5 — summary-only kNN (type pinned, enhanced_search_service.py:205-257).
    "v5_summary_only" -> ((s, d) =>
      knn(summaries(s, d), qvec(s, d, 0), 10, 0.0)
        .select("vec_id", "label", "sim")),

    // V4 — two-stage hybrid search.
    "v4_two_stage" -> ((s, d) =>
      twoStage(summaries(s, d), chunks(s, d), qvec(s, d, 0), 10, 10, 0.0)
        .select("vec_id", "label", "sim")),

    // V6 — RRF fusion, service-default weights 0.4/0.6, k0=60.
    "v6_rrf_fusion" -> ((s, d) =>
      rrfFusion(summaries(s, d), chunks(s, d), qvec(s, d, 0), 10, 5)),

    // V7 — dedup keep-max per document over all vectors.
    "v7_dedup_keepmax" -> ((s, d) =>
      keepBestPerDoc(
        Tables.embeddings(s, d).withColumn("sim", dot(col("embedding"), typedLit(qvec(s, d, 0)))))
        .select("label", "vec_id", "sim")
        .orderBy("label")),

    // V12 — degraded-search fallback under an exact oracle: leg A's
    // primary (threshold 0.3) finds rows and is returned as-is; leg
    // B's primary scans an impossible tenant (label = -999, empty ⇒
    // probe count 0) so withFallback reruns at threshold × 0.7 — both
    // legs' outputs are hash-compared (the oracle writes the relaxed
    // threshold as 0.5::DOUBLE * 0.7::DOUBLE so both engines compare
    // against the identical IEEE product).
    "v12_fallback" -> ((s, d) => {
      val q0v = qvec(s, d, 0)
      val emb = Tables.embeddings(s, d)
      val taken = withFallback(knn(emb, q0v, 10, 0.3), emb, q0v, 10, 0.5)
        .withColumn("leg", lit("primary"))
      val fell = withFallback(
        knn(emb.filter(col("label") === -999), q0v, 10, 0.3), emb, q0v, 10, 0.5)
        .withColumn("leg", lit("fallback"))
      taken.unionByName(fell)
        .select(col("leg"), col("vec_id"), col("label"), col("sim"))
        .orderBy(col("leg").desc, col("vec_id").asc)
    }),

    // V7b/D4 — the full rerank-dedup-backfill path: a stage-2 chunk
    // search deliberately bounded below k (top-8) so the stage-1
    // summary ranking must backfill the unseen documents
    // (enhanced_search_service.py:526-544).
    "v7b_backfill" -> ((s, d) => {
      val q = qvec(s, d, 0)
      val s1 = knn(summaries(s, d), q, 15, 0.0)
      val cand = s1.select("label").distinct()
      val s2 = knn(chunks(s, d).join(broadcast(cand), Seq("label"), "left_semi"),
        q, 8, 0.0)
      rerankDedupBackfill(s2, s1, 10)
        .select("label", "vec_id", "sim", "src")
        .orderBy(col("src").asc, col("sim").desc, col("vec_id").asc)
    }),

    // V8 — multi-query weighted merge (weights 1.3/1.1/1.0,
    // search_weight_config.py:15-19); the three query vectors arrive
    // via ONE collect (qvecs), not three point-lookup jobs.
    "v8_multiquery_merge" -> ((s, d) =>
      multiQueryMerge(Tables.embeddings(s, d),
        qvecs(s, d, Seq(0L, 1L, 2L)),
        Seq(1.3, 1.1, 1.0), 10, 5)
        .select("label", "vec_id", "wsim")),

    // V11 — traditional single-stage: parallel summary+chunk branches,
    // merge keep-max per doc (qa_search_coordinator.py:207-269).
    "v11_traditional" -> ((s, d) => {
      val q = qvec(s, d, 0)
      val merged = knn(summaries(s, d), q, 10, 0.0)
        .unionByName(knn(chunks(s, d), q, 10, 0.0))
      keepBestPerDoc(merged)
        .select("label", "vec_id", "sim")
        .orderBy(col("sim").desc, col("label").asc)
        .limit(10)
    }),

    // V13 — pairwise cosine with zero-norm guard (embedding_service.py:181-209).
    "v13_pairwise_cosine" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val a = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"), cosine(col("emb_a"), col("emb_b")).as("sim"))
        .orderBy("id_a")
    }),

    // Late-interaction (ColBERT-style MaxSim) retrieval: the query is
    // MULTIPLE vectors (one per query token) and a doc's score is
    // Σ_i max_j ⟨q_i, d_j⟩ over its chunk vectors — multi-vector
    // retrieval's standard scoring (Khattab & Zaharia 2020, public),
    // here over the per-doc chunk vectors the two-stage family already
    // indexes (label = doc, odd vec_ids = chunks). One broadcast of
    // the 3-subvector query set, ONE corpus scan; max per (doc, q_i)
    // partial-aggregates map-side, and the final Σ folds the ≤3 maxes
    // in q_i order (the cross-engine ordered-reduce; max itself is
    // order-independent and exact). Top-10 docs.
    "v14_late_interaction" -> ((s, d) => {
      val e = chunks(s, d)
      val qs = Tables.embeddings(s, d).filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_i"),
          col("embedding").cast("array<double>").as("q_emb"))
      e.crossJoin(broadcast(qs))
        .withColumn("sim", dot(col("embedding"), col("q_emb")))
        .groupBy("label", "q_i")
        .agg(max(col("sim")).as("best"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_q"),
          aggregate(array_sort(collect_list(struct(col("q_i"), col("best").as("v")))),
            lit(0.0), (a, x) => a + x.getField("v")).as("lis"))
        .orderBy(col("lis").desc, col("label").asc)
        .limit(10)
        .select("label", "n_q", "lis")
    }),

    // Similarity-search batch: brute-force top-5 neighbors for each of
    // 5 query vectors in one plan (the 100 TB batch-scoring shape:
    // broadcast the query set, one scan of the corpus).
    "ann_bruteforce_batch" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("q_emb"))
      val scored = e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", dot(col("embedding"), col("q_emb")))
      scored.withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc)))
        .filter(col("rank") <= 5)
        .select("q_id", "rank", "vec_id", "sim")
        .orderBy("q_id", "rank")
    }),

    // The same 5-query batch through the aggregator path: ONE corpus
    // scan + map-side bounded top-k per query (the window form above
    // sort-shuffles corpus×Q rows; this shuffles ≤ k·Q·partitions).
    // Same oracle shape — the two plans must agree hash-exactly.
    "ann_batch_topk" -> ((s, d) => {
      val ids = Seq(0L, 1L, 2L, 3L, 4L)
      val qs = ids.zip(qvecs(s, d, ids))
      knnBatch(Tables.embeddings(s, d), qs, 5,
        threshold = Double.NegativeInfinity, excludeSelf = true)
    }),

    // Batched IVF: all four queries' probe-4 sets union into one
    // pruned scan; each row is scored only for the queries that
    // probed its cell. The oracle replays the sampled-IVF build once
    // and fans the probe ranking out per query.
    "ann_ivf_batch" -> ((s, d) => {
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .withColumn("tenant", lit("all"))
      val cents = ivfTrainSampled(base, "tenant", "vec_id", "embedding", 16,
        sampleCap = 256)
      val indexed = ivfAssign(base, "tenant", "vec_id", "embedding", cents)
      val ids = Seq(0L, 1L, 2L, 3L)
      ivfSearchBatch(indexed, cents, "all", ids.zip(qvecs(s, d, ids)), 10, 4)
    }),

    // Incremental IVF maintenance: the index is trained ONCE on the
    // base corpus (vec_id % 5 != 0); a new batch (vec_id % 5 == 0)
    // arrives and is assigned against the FROZEN centroids — one
    // narrow map, no retrain, the cell layout just appends. The
    // output is the maintenance dashboard: per-cell base/new counts,
    // the worst assign distance of the new batch (drift signal), and
    // an integer-math imbalance flag (cell > 2× the mean ⇒ split/
    // retrain). The oracle replays the sampled train on the base and
    // BOTH argmin assignments with bitwise distance folds.
    "ann_ivf_incremental" -> ((s, d) => {
      val all = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .withColumn("tenant", lit("all"))
      val base = all.filter(col("vec_id") % 5 =!= 0)
      val fresh = all.filter(col("vec_id") % 5 === 0)
      val cents = ivfTrainSampled(base, "tenant", "vec_id", "embedding", 16,
        sampleCap = 256)
      val bc = ivfAssign(base, "tenant", "vec_id", "embedding", cents)
        .groupBy("cell").agg(count(lit(1)).as("n_base"))
      val fc = ivfAssignWithDist(fresh, "tenant", "vec_id", "embedding", cents)
        .groupBy("cell").agg(count(lit(1)).as("n_new"),
          max(col("d2")).as("max_d2_new"))
      val agg = bc.join(fc, Seq("cell"), "full_outer")
        .select(col("cell"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("max_d2_new"), lit(0.0)).as("max_d2_new"))
        .withColumn("n_total", col("n_base") + col("n_new"))
      agg.withColumn("_tot",
          sum(col("n_total")).over(graft.functions.BoundedWindow.all(col("cell"))))
        .withColumn("needs_split",
          (col("n_total") * 16 > col("_tot") * 2).cast("int"))
        .select("cell", "n_base", "n_new", "n_total", "max_d2_new", "needs_split")
        .orderBy("cell")
    }),

    // ANN IVF — centroid-pruned search (rows-only: k-means build not
    // SQL-expressible; exactness-vs-recall contract in SearchSpec).
    "ann_ivf_topk" -> ((s, d) => {
      val base = Tables.embeddings(s, d).withColumn("tenant", lit("all"))
      val indexed = ivfBuild(base, "tenant", "vec_id", "embedding", 16).cache()
      val centroids = ivfCentroids(indexed)
      ivfSearch(indexed, centroids, "all", qvec(s, d, 0), 10, 4)
        .select("id", "sim")
    }),

    // FILTERED ANN serving — the "filtered vector search" problem: a
    // metadata predicate (here id % 8 == 3, a 1/8-selective stand-in
    // for any pushed-down attribute filter) composes with IVF probe
    // pruning. The predicate lands on the probed scan (at the
    // (tenant, cell)-partitioned layout both prunings compound:
    // partition pruning bounds the files, the pushed filter bounds
    // the rows), and nProbe doubles (4 → 8) to compensate the thinned
    // cells — the standard filtered-search recall trade. Same oracle
    // machinery as ann_ivf_topk with the predicate in the scan.
    "ann_ivf_filtered" -> ((s, d) => {
      val base = Tables.embeddings(s, d).withColumn("tenant", lit("all"))
      val indexed = ivfBuild(base, "tenant", "vec_id", "embedding", 16).cache()
      val centroids = ivfCentroids(indexed)
      ivfSearch(indexed.filter(col("id") % 8 === 3), centroids, "all",
        qvec(s, d, 0), 10, 8)
        .select("id", "sim")
    }),

    // The SAMPLED IVF build under the exact gate, with a cap that
    // actually subsamples (256 of the corpus): deterministic
    // lowest-id sample → Lloyd on the sample → member-mean centroids →
    // argmin re-assignment of EVERY vector (the one step the full
    // build doesn't have) → probe-4 pruned top-10. The oracle replays
    // all five stages; the argmin's squared-distance fold and
    // lowest-cell tiebreak are bit-replayed by an explicit
    // list_reduce in id-ascending component order.
    "ann_ivf_sampled" -> ((s, d) => {
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .withColumn("tenant", lit("all"))
      val cents = ivfTrainSampled(base, "tenant", "vec_id", "embedding", 16,
        sampleCap = 256)
      val indexed = ivfAssign(base, "tenant", "vec_id", "embedding", cents)
      val cells = ivfProbeCells(cents, "all", qvec(s, d, 0), 4)
      knn(indexed.filter(col("cell").isin(cells: _*)), qvec(s, d, 0), 10, 0.0,
        idCol = "id")
        .select("id", "sim")
    }),

    // ANN IVF full-probe — nProbe = nCells scans every cell, so the
    // result provably equals brute-force kNN (same oracle). This gives
    // the IVF build/probe machinery an exact correctness gate; the
    // pruned variant above exercises the recall/scan-fraction tradeoff.
    "ann_ivf_fullprobe" -> ((s, d) => {
      val base = Tables.embeddings(s, d).withColumn("tenant", lit("all"))
      val indexed = ivfBuild(base, "tenant", "vec_id", "embedding", 16).cache()
      val centroids = ivfCentroids(indexed)
      ivfSearch(indexed, centroids, "all", qvec(s, d, 0), 10, 16)
        .select("id", "sim")
    }),

    // ANN via random-hyperplane LSH — the LSH-bucketed alternative to
    // IVF: corpus coding is a map-only pass (8 sign-of-projection
    // bits, deterministic ±1 planes shared bit-exactly with the
    // oracle — functions/RandomHyperplane), the query probes its code
    // plus all codes within Hamming distance 2 (37 of 256 buckets,
    // ~28% of this corpus), and only candidates pay the exact rescore.
    // Unlike IVF there is no training step, so the WHOLE path — code,
    // probe set, rescore — is hash-exact against DuckDB. At 100 TB
    // the code is a partition column: multiprobe = partition pruning.
    // (Recall vs brute force is asserted ≥ 0.5 in SearchSpec; random
    // synthetic embeddings are LSH's worst case — no cluster
    // structure — so real-corpus recall would be higher.)
    "ann_rp_lsh" -> ((s, d) => {
      import graft.functions.RandomHyperplane
      val q = qvec(s, d, 0)
      val probes = RandomHyperplane.multiprobe(RandomHyperplane.codeOf(q), 2)
      Tables.embeddings(s, d)
        .withColumn("code", RandomHyperplane.codeCol(col("embedding")))
        .filter(col("code").isin(probes: _*))
        .withColumn("sim", dot(col("embedding"), typedLit(q)))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(10)
        .select("vec_id", "code", "sim")
    }),

    // 768-d parity: V1 brute-force kNN at reference dimensionality —
    // same scan + codegen-dot + TakeOrderedAndProject plan as
    // v1_knn_topk, 12× the per-row arithmetic.
    "v1_knn_768" -> ((s, d) =>
      knn(vecs768(s, d), q768, 10, 0.0).select("vec_id", "label", "sim")),

    // 768-d parity: V4 two-stage hybrid (summary candidates semi-join
    // prune the chunk branch) — broadcast semi-join unchanged at 768.
    // Both branches consume the same synthetic relation: persist so the
    // 768-wide array construction runs once (caller clearCache
    // contract, SparkEntry.scala).
    "v4_two_stage_768" -> ((s, d) => {
      val v = vecs768(s, d).persist()
      twoStage(v.filter(col("vec_id") % 2 === 0),
        v.filter(col("vec_id") % 2 === 1), q768, 10, 10, 0.0)
        .select("vec_id", "label", "sim")
    }),

    // 768-d parity: V6 RRF fusion, service weights 0.4/0.6, k0=60.
    "v6_rrf_768" -> ((s, d) => {
      val v = vecs768(s, d).persist()
      rrfFusion(v.filter(col("vec_id") % 2 === 0),
        v.filter(col("vec_id") % 2 === 1), q768, 10, 5)
    }),

    // 768-d parity: RP-LSH multiprobe ANN at reference dimensionality.
    // 10 planes (see rp768 note), Hamming radius 2 → 56 of 1,024
    // buckets probed; code, probe set and rescore all hash-exact.
    "ann_rp_lsh_768" -> ((s, d) => {
      val probes = rp768.multiprobe(rp768.codeOf(q768), 2)
      vecs768(s, d, cache = false) // bucket filter prunes before the dots
        .withColumn("code", rp768.codeCol(col("embedding")))
        .filter(col("code").isin(probes: _*))
        .withColumn("sim", dot(col("embedding"), typedLit(q768)))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(10)
        .select("vec_id", "code", "sim")
    }),

    // Batch kNN JOIN via LSH blocking — "top-3 neighbors for EVERY
    // vector" (the all-pairs shape behind SemDeDup audits, diversity
    // analysis, and graph-based curation). All-pairs is O(n²) and
    // unrunnable at scale; blocking pairs by the RP-LSH code makes it
    // an equi-join on the 8-bit code (3,772 candidate pairs vs
    // 124,750 all-pairs on this corpus — 33×), then a per-vector
    // window ranks only same-bucket candidates. Vectors whose bucket
    // has no other member simply emit no rows — the recall/cost trade
    // LSH makes explicit. One shuffle on the code + one on id_a.
    "ann_lsh_knn_join" -> ((s, d) => {
      import graft.functions.RandomHyperplane
      val coded = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          RandomHyperplane.codeCol(col("embedding")).as("code"))
      val a = coded.select(col("code"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      val b = coded.select(col("code"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
      a.join(b, Seq("code")).filter(col("id_a") =!= col("id_b"))
        .withColumn("sim", dot(col("emb_a"), col("emb_b")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("id_a").orderBy(col("sim").desc, col("id_b").asc)))
        .filter(col("rank") <= 3)
        .select(col("id_a"), col("rank"), col("id_b").as("neighbor_id"), col("sim"))
        .orderBy("id_a", "rank")
    }),

    // Hard-negative mining (embedding-training data prep): for every
    // anchor (a 10% id sample), the top-2 MOST similar vectors with a
    // DIFFERENT label — the "looks alike, isn't" pairs contrastive
    // fine-tuning needs. All-pairs is unrunnable at scale; blocking by
    // the RP-LSH code makes it an equi-join on the 8-bit code (the
    // same sub-quadratic shape as ann_lsh_knn_join), with the
    // different-label test as a cheap residual. Anchors whose bucket
    // holds only same-label vectors emit nothing — the recall/cost
    // trade LSH makes explicit. Hash-exact: code, sims and ranks all
    // replay in SQL.
    "pp_hard_negatives" -> ((s, d) => {
      import graft.functions.RandomHyperplane
      val coded = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("emb"),
          RandomHyperplane.codeCol(col("embedding")).as("code"))
      val anchors = coded.filter(col("vec_id") % 10 === 0)
        .select(col("code"), col("vec_id").as("anchor_id"),
          col("label").as("a_label"), col("emb").as("a_emb"))
      anchors.join(coded, Seq("code"))
        .filter(col("label") =!= col("a_label"))
        .withColumn("sim", dot(col("a_emb"), col("emb")))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("anchor_id").orderBy(col("sim").desc, col("vec_id").asc)))
        .filter(col("rnk") <= 2)
        .select(col("anchor_id"), col("rnk"), col("vec_id").as("negative_id"), col("sim"))
        .orderBy("anchor_id", "rnk")
    }),

    // Diversity-preserving subsample (training-pipeline op): cap the
    // corpus at ~20% while keeping EVERY region of embedding space —
    // uniform per-bucket quotas over the RP-LSH buckets, the
    // training-free analogue of cluster-balanced sampling (the
    // flattening move SemDeDup-style pipelines apply after dedup so
    // dense regions don't drown sparse ones). Quotas: target
    // N = total/5 split evenly across occupied buckets, remainder to
    // the lowest codes (the pp_domain_upmix exact-count move, so
    // Σ quota = N exactly when every bucket can fill); selection
    // within a bucket ranks by the md5 of the vec id. Scale: coding
    // is map-only; the rank window is per bucket (bounded by bucket
    // occupancy); the quota plan is a ≤256-row agg under a bounded
    // window — no global sort, no training, fully hash-exact.
    "pp_diversity_sample" -> ((s, d) => {
      import graft.functions.{BoundedWindow, RandomHyperplane}
      val coded = Tables.embeddings(s, d)
        .withColumn("code", RandomHyperplane.codeCol(col("embedding")))
      val wAll = BoundedWindow.all(col("n_in"))
      val plan = coded.groupBy("code").agg(count(lit(1)).as("n_in"))
        .withColumn("total", sum(col("n_in")).over(wAll))
        .withColumn("n_used", count(lit(1)).over(wAll))
        .withColumn("base", expr("(total div 5) div n_used"))
        .withColumn("rem", expr("(total div 5) % n_used"))
        .withColumn("code_rank", row_number().over(
          BoundedWindow.orderBy(col("code"), col("code").asc)))
        .withColumn("quota", least(col("n_in"),
          col("base") + when(col("code_rank") <= col("rem"), 1L).otherwise(0L)))
        .select("code", "n_in", "quota")
      coded.join(broadcast(plan), Seq("code"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("code").orderBy(
            md5(concat(lit("div:"), col("vec_id").cast("string"))), col("vec_id"))))
        .filter(col("rnk") <= col("quota"))
        .groupBy("code")
        .agg(max(col("n_in")).as("n_in"), max(col("quota")).as("quota"),
          count(lit(1)).as("n_kept"), sum(col("vec_id")).as("kept_sum_id"))
        .orderBy("code")
    }),

    // Quantized ANN with float rescore — the production two-tier
    // pattern behind every large-scale vector index: a cheap int8
    // coarse pass ranks the corpus (4× smaller vectors, integer
    // arithmetic), then only the top-50 pay the full float dot. All
    // integer dot products are EXACT in both engines (products ≤ 127²
    // per dim, partial sums far below 2^53), so unlike a13/a14 this
    // "approximate" pipeline is fully oracle-exact end-to-end.
    "ann_int8_rescore" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("q8", transform(col("embedding").cast("array<double>"),
          x => floor(x * 127).cast("long")))
      val qRow = e.filter(col("vec_id") === 0)
        .select(col("q8"), col("embedding").cast("array<double>").as("qe")).head()
      val q8 = qRow.getSeq[Long](0)
      val qe = qRow.getSeq[Double](1)
      val coarse = e.filter(col("vec_id") =!= 0)
        .withColumn("coarse", aggregate(
          zip_with(col("q8"), typedLit(q8), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
        .orderBy(col("coarse").desc, col("vec_id").asc)
        .limit(50)
      coarse.withColumn("sim", dot(col("embedding"), typedLit(qe)))
        .select("vec_id", "coarse", "sim")
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // keyword_enhanced_rrf made concrete (the reference only aliases it
    // to rrf_fusion, search_strategy.py:29-33): a BM25 keyword branch
    // and a vector kNN branch fused by RRF, k0=60, equal weights. Both
    // branches are top-k-bounded before ranking, so the fusion joins
    // ≤20-row relations regardless of corpus size.
    "ts_hybrid_rrf" -> ((s, d) => {
      val kw = TextAnalysis.bm25Scores(Tables.documents(s, d), Seq("join", "vector", "dup"))
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(20)
        .withColumn("kw_rank", row_number().over(
          graft.functions.BoundedWindow.orderBy(col("doc_id"),
            col("bm25").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("kw_rank"))
      val vec = knn(Tables.embeddings(s, d), qvec(s, d, 0), 20, 0.0)
        .withColumn("vec_rank", row_number().over(
          graft.functions.BoundedWindow.orderBy(col("vec_id"),
            col("sim").desc, col("vec_id").asc)))
        .select(col("vec_id").as("doc_id"), col("vec_rank"))
      kw.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf_score",
          coalesce(lit(0.5) / (lit(60) + col("kw_rank")), lit(0.0)) +
            coalesce(lit(0.5) / (lit(60) + col("vec_rank")), lit(0.0)))
        .select("doc_id", "rrf_score")
        .orderBy(col("rrf_score").desc, col("doc_id").asc)
        .limit(10)
    }),

    // V9 — diversity re-rank over top-20 kNN joined to document text;
    // the greedy sequential admit runs on the driver, and is mirrored
    // exactly by a DuckDB recursive CTE oracle.
    "v9_diversity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val top = knn(Tables.embeddings(s, d), qvec(s, d, 0), 20, 0.0)
        .join(docs, col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("sim"), col("text"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      val picked = diversityRerank(
        top.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))), 5)
      import s.implicits._
      picked.toSeq.toDF("vec_id", "sim", "text").select("vec_id", "sim")
    })
  )

  private val q0 = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"
  private def qn(i: Int) = s"(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = $i)"

  // 768-d fixture rebuilt inside DuckDB from the same integer mix as
  // SyntheticVec.vecCol; qS768 is the (static) query vector of id 0.
  private val v768Cte =
    s"""v768 AS (SELECT doc_id AS vec_id, doc_id // 5 AS label,
       |  ${SyntheticVec.vecSql("doc_id", 768)} AS emb FROM documents)""".stripMargin
  private val qS768 = SyntheticVec.vecSql("0", 768)

  val oracles: Map[String, String] = Map(
    "v1_knn_768" ->
      s"""WITH $v768Cte
         |SELECT vec_id, label, list_inner_product(emb, $qS768) AS sim
         |FROM v768
         |WHERE list_inner_product(emb, $qS768) >= 0.0
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v4_two_stage_768" ->
      s"""WITH $v768Cte,
         |s1 AS (
         |  SELECT DISTINCT label FROM (
         |    SELECT label, list_inner_product(emb, $qS768) AS sim, vec_id
         |    FROM v768
         |    WHERE vec_id % 2 = 0 AND list_inner_product(emb, $qS768) >= 0.0
         |    ORDER BY sim DESC, vec_id ASC LIMIT 10))
         |SELECT vec_id, label, sim FROM (
         |  SELECT vec_id, label, list_inner_product(emb, $qS768) AS sim
         |  FROM v768
         |  WHERE vec_id % 2 = 1 AND list_inner_product(emb, $qS768) >= 0.0
         |    AND label IN (SELECT label FROM s1)
         |  ORDER BY sim DESC, vec_id ASC LIMIT 10)
         |ORDER BY sim DESC, vec_id ASC""".stripMargin,
    "v6_rrf_768" ->
      s"""WITH $v768Cte,
         |sb AS (
         |  SELECT label, vec_id, sim,
         |         row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rnk
         |  FROM (
         |    SELECT label, vec_id, sim FROM (
         |      SELECT label, vec_id, sim,
         |             row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id ASC) AS rn
         |      FROM (
         |        SELECT label, vec_id, list_inner_product(emb, $qS768) AS sim
         |        FROM v768
         |        WHERE vec_id % 2 = 0 AND list_inner_product(emb, $qS768) >= 0.0
         |        ORDER BY sim DESC, vec_id ASC LIMIT 10))
         |    WHERE rn = 1)),
         |cb AS (
         |  SELECT label, vec_id, sim,
         |         row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rnk
         |  FROM (
         |    SELECT label, vec_id, sim FROM (
         |      SELECT label, vec_id, sim,
         |             row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id ASC) AS rn
         |      FROM (
         |        SELECT label, vec_id, list_inner_product(emb, $qS768) AS sim
         |        FROM v768
         |        WHERE vec_id % 2 = 1 AND list_inner_product(emb, $qS768) >= 0.0
         |        ORDER BY sim DESC, vec_id ASC LIMIT 10))
         |    WHERE rn = 1))
         |SELECT coalesce(sb.label, cb.label) AS label,
         |       coalesce(cb.vec_id, sb.vec_id) AS rep_vec_id,
         |       coalesce(0.4::DOUBLE / (60 + sb.rnk), 0.0) +
         |       coalesce(0.6::DOUBLE / (60 + cb.rnk), 0.0) AS rrf_score
         |FROM sb FULL OUTER JOIN cb ON sb.label = cb.label
         |ORDER BY rrf_score DESC, label ASC LIMIT 5""".stripMargin,
    // ANN IVF pruned search under the exact gate: the cell build is the
    // Lloyd replay (Clustering.kmeansCte, k=16 over one tenant), probe
    // centroids are the member means folded in id order (matching the
    // order-deterministic ivfCentroids), the probe ranking replays the
    // driver's (-sim, cell) sort cut at nProbe=4, and only probed
    // cells' vectors reach the exact top-10.
    "ann_ivf_topk" -> {
      s"""WITH RECURSIVE eall AS (
         |  SELECT vec_id AS id, 'all' AS tenant, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |${Clustering.kmeansCte(16, "eall", "c_")},
         |cents AS (
         |  SELECT k.best AS cell, count(*) AS cnt,
         |    list(p.emb ORDER BY p.id) AS m
         |  FROM c_kassign k JOIN eall p ON p.id = k.id
         |  GROUP BY k.best),
         |cenv AS (
         |  SELECT cell,
         |    list_transform(range(1, 65),
         |      j -> list_reduce(list_transform(m, v -> v[j]), (x, y) -> x + y)
         |           / CAST(cnt AS DOUBLE)) AS centroid
         |  FROM cents),
         |proberank AS (
         |  SELECT cell, row_number() OVER (
         |    ORDER BY list_inner_product(centroid, $q0) DESC, cell ASC) AS pr
         |  FROM cenv),
         |probed AS (SELECT cell FROM proberank WHERE pr <= 4)
         |SELECT id, sim FROM (
         |  SELECT k.id, list_inner_product(p.emb, $q0) AS sim
         |  FROM c_kassign k
         |  JOIN probed pb ON pb.cell = k.best
         |  JOIN eall p ON p.id = k.id)
         |WHERE sim >= 0.0
         |ORDER BY sim DESC, id ASC LIMIT 10""".stripMargin
    },
    // Filtered twin of ann_ivf_topk: identical Lloyd replay, probe-8
    // ranking, and the id % 8 = 3 predicate inside the pruned scan.
    "ann_ivf_filtered" -> {
      s"""WITH RECURSIVE eall AS (
         |  SELECT vec_id AS id, 'all' AS tenant, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |${Clustering.kmeansCte(16, "eall", "c_")},
         |cents AS (
         |  SELECT k.best AS cell, count(*) AS cnt,
         |    list(p.emb ORDER BY p.id) AS m
         |  FROM c_kassign k JOIN eall p ON p.id = k.id
         |  GROUP BY k.best),
         |cenv AS (
         |  SELECT cell,
         |    list_transform(range(1, 65),
         |      j -> list_reduce(list_transform(m, v -> v[j]), (x, y) -> x + y)
         |           / CAST(cnt AS DOUBLE)) AS centroid
         |  FROM cents),
         |proberank AS (
         |  SELECT cell, row_number() OVER (
         |    ORDER BY list_inner_product(centroid, $q0) DESC, cell ASC) AS pr
         |  FROM cenv),
         |probed AS (SELECT cell FROM proberank WHERE pr <= 8)
         |SELECT id, sim FROM (
         |  SELECT k.id, list_inner_product(p.emb, $q0) AS sim
         |  FROM c_kassign k
         |  JOIN probed pb ON pb.cell = k.best
         |  JOIN eall p ON p.id = k.id
         |  WHERE k.id % 8 = 3)
         |WHERE sim >= 0.0
         |ORDER BY sim DESC, id ASC LIMIT 10""".stripMargin
    },
    // Sampled IVF build replayed end-to-end: deterministic lowest-id
    // sample (rank replay), Lloyd over the SAMPLE, member-mean
    // centroids in id order, argmin re-assignment of every vector
    // (squared-distance left fold + lowest-cell tiebreak — exactly
    // ivfAssign's keep-first `<` loop), then the probe-4 top-10.
    // Cell ids here are raw Lloyd cluster ids while the engine uses
    // their dense renumbering — a monotone relabeling, so every
    // tiebreak and the probed set are identical.
    "ann_ivf_sampled" -> {
      s"""WITH RECURSIVE eall AS (
         |  SELECT vec_id AS id, 'all' AS tenant, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |esample AS (
         |  SELECT id, tenant, emb FROM (
         |    SELECT id, tenant, emb,
         |      row_number() OVER (PARTITION BY tenant ORDER BY id) AS rn FROM eall)
         |  WHERE rn <= 256),
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
         |    ORDER BY list_inner_product(centroid, $q0) DESC, cell ASC) AS pr
         |  FROM cenv),
         |probed AS (SELECT cell FROM proberank WHERE pr <= 4)
         |SELECT id, sim FROM (
         |  SELECT a.id, list_inner_product(p.emb, $q0) AS sim
         |  FROM assignall a
         |  JOIN probed pb ON pb.cell = a.cell
         |  JOIN eall p ON p.id = a.id)
         |WHERE sim >= 0.0
         |ORDER BY sim DESC, id ASC LIMIT 10""".stripMargin
    },

    // the sampled train replayed on the BASE corpus only, then BOTH
    // argmin assignments (base and the frozen-centroid new batch)
    // with bitwise distance folds; per-cell counts + max new-batch
    // distance + integer-math imbalance flag.
    "ann_ivf_incremental" -> {
      s"""WITH RECURSIVE eall AS (
         |  SELECT vec_id AS id, 'all' AS tenant, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |ebase AS (SELECT * FROM eall WHERE id % 5 <> 0),
         |efresh AS (SELECT * FROM eall WHERE id % 5 = 0),
         |esample AS (
         |  SELECT id, tenant, emb FROM (
         |    SELECT id, tenant, emb,
         |      row_number() OVER (PARTITION BY tenant ORDER BY id) AS rn FROM ebase)
         |  WHERE rn <= 256),
         |${graft.operators.Clustering.kmeansCte(16, "esample", "s_")},
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
         |db AS (
         |  SELECT id, cell, dd FROM (
         |    SELECT id, cell, dd, row_number() OVER (PARTITION BY id
         |      ORDER BY dd ASC, cell ASC) AS rnk
         |    FROM (SELECT p.id, c.cell,
         |      list_reduce(list_transform(range(1, 65),
         |        j -> (p.emb[j] - c.centroid[j]) * (p.emb[j] - c.centroid[j])),
         |        (x, y) -> x + y) AS dd
         |      FROM ebase p CROSS JOIN cenv c))
         |  WHERE rnk = 1),
         |dn AS (
         |  SELECT id, cell, dd FROM (
         |    SELECT id, cell, dd, row_number() OVER (PARTITION BY id
         |      ORDER BY dd ASC, cell ASC) AS rnk
         |    FROM (SELECT p.id, c.cell,
         |      list_reduce(list_transform(range(1, 65),
         |        j -> (p.emb[j] - c.centroid[j]) * (p.emb[j] - c.centroid[j])),
         |        (x, y) -> x + y) AS dd
         |      FROM efresh p CROSS JOIN cenv c))
         |  WHERE rnk = 1),
         |bc AS (SELECT cell, count(*) AS n_base FROM db GROUP BY cell),
         |fc AS (SELECT cell, count(*) AS n_new, max(dd) AS max_d2_new
         |       FROM dn GROUP BY cell),
         |agg AS (
         |  SELECT coalesce(bc.cell, fc.cell) AS cell,
         |    coalesce(n_base, 0) AS n_base, coalesce(n_new, 0) AS n_new,
         |    coalesce(n_base, 0) + coalesce(n_new, 0) AS n_total,
         |    coalesce(max_d2_new, 0.0) AS max_d2_new
         |  FROM bc FULL OUTER JOIN fc ON bc.cell = fc.cell)
         |SELECT cell, n_base, n_new, n_total, max_d2_new,
         |  CAST(CASE WHEN n_total * 16 > (SELECT sum(n_total) FROM agg) * 2
         |    THEN 1 ELSE 0 END AS INTEGER) AS needs_split
         |FROM agg ORDER BY cell""".stripMargin
    },

    // the sampled-IVF replay (one Lloyd + member-mean + full argmin)
    // with the probe ranking fanned out PER QUERY; candidates are
    // scored only in probed cells, ranked per q_id.
    "ann_ivf_batch" -> {
      s"""WITH RECURSIVE eall AS (
         |  SELECT vec_id AS id, 'all' AS tenant, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |esample AS (
         |  SELECT id, tenant, emb FROM (
         |    SELECT id, tenant, emb,
         |      row_number() OVER (PARTITION BY tenant ORDER BY id) AS rn FROM eall)
         |  WHERE rn <= 256),
         |${graft.operators.Clustering.kmeansCte(16, "esample", "s_")},
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
         |qs AS (
         |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 4),
         |proberank AS (
         |  SELECT q.q_id, c.cell, row_number() OVER (PARTITION BY q.q_id
         |    ORDER BY list_inner_product(c.centroid, q.qv) DESC, c.cell ASC) AS pr
         |  FROM cenv c CROSS JOIN qs q),
         |probed AS (SELECT q_id, cell FROM proberank WHERE pr <= 4),
         |scored AS (
         |  SELECT pb.q_id, a.id, list_inner_product(p.emb, q.qv) AS sim
         |  FROM assignall a
         |  JOIN probed pb ON pb.cell = a.cell
         |  JOIN qs q ON q.q_id = pb.q_id
         |  JOIN eall p ON p.id = a.id)
         |SELECT q_id, rank, id, sim FROM (
         |  SELECT q_id, id, sim, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, id ASC) AS rank
         |  FROM scored WHERE sim >= 0.0)
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },

    "pp_hard_negatives" -> {
      val codeExpr = graft.functions.RandomHyperplane.codeSql("embedding::DOUBLE[]")
      s"""WITH coded AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS emb, $codeExpr AS code
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
         |         list_inner_product(a.emb, b.emb) AS sim,
         |         row_number() OVER (PARTITION BY a.vec_id
         |           ORDER BY list_inner_product(a.emb, b.emb) DESC, b.vec_id ASC) AS rnk
         |  FROM coded a JOIN coded b
         |    ON a.code = b.code AND a.label <> b.label
         |  WHERE a.vec_id % 10 = 0)
         |SELECT anchor_id, rnk, negative_id, sim FROM pairs
         |WHERE rnk <= 2 ORDER BY anchor_id, rnk""".stripMargin
    },

    "pp_diversity_sample" -> {
      val codeExpr = graft.functions.RandomHyperplane.codeSql("embedding::DOUBLE[]")
      s"""WITH coded AS (
         |  SELECT vec_id, $codeExpr AS code FROM embeddings),
         |counts AS (SELECT code, count(*) AS n_in FROM coded GROUP BY code),
         |tot AS (SELECT CAST(sum(n_in) AS BIGINT) AS total,
         |               CAST(count(*) AS BIGINT) AS n_used FROM counts),
         |planq AS (
         |  SELECT code, n_in,
         |    least(n_in, (total // 5) // n_used +
         |      CASE WHEN row_number() OVER (ORDER BY code ASC)
         |                <= (total // 5) % n_used THEN 1 ELSE 0 END) AS quota
         |  FROM counts, tot),
         |ranked AS (
         |  SELECT vec_id, code,
         |    row_number() OVER (PARTITION BY code
         |      ORDER BY md5('div:' || CAST(vec_id AS VARCHAR)), vec_id) AS rnk
         |  FROM coded)
         |SELECT p.code, max(p.n_in) AS n_in, max(p.quota) AS quota,
         |  count(*) AS n_kept, CAST(sum(r.vec_id) AS BIGINT) AS kept_sum_id
         |FROM ranked r JOIN planq p USING (code)
         |WHERE r.rnk <= p.quota
         |GROUP BY p.code ORDER BY p.code""".stripMargin
    },
    "ann_rp_lsh_768" ->
      s"""WITH $v768Cte,
         |coded AS (
         |  SELECT vec_id, ${rp768.codeSqlGen("emb")} AS code, emb FROM v768)
         |SELECT vec_id, code, list_inner_product(emb, $qS768) AS sim
         |FROM coded
         |WHERE code IN (${rp768.multiprobe(rp768.codeOf(q768), 2).mkString(", ")})
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v3_sample_scan" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE vec_id % 2 = 0 AND label < 5 ORDER BY vec_id LIMIT 100""".stripMargin,
    "s9_batch_delete" ->
      """SELECT label, count(*) AS n_remaining FROM embeddings
        |WHERE vec_id NOT IN (0,1,2,3,17,99) GROUP BY label ORDER BY label""".stripMargin,
    "v1_knn_topk" ->
      s"""SELECT vec_id, label, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |FROM embeddings
         |WHERE list_inner_product(embedding::DOUBLE[], $q0) >= 0.3
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v12_fallback" ->
      s"""WITH pleg AS (
         |  SELECT 'primary' AS leg, vec_id, label, sim FROM (
         |    SELECT vec_id, label, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |    FROM embeddings
         |    WHERE list_inner_product(embedding::DOUBLE[], $q0) >= 0.3
         |    ORDER BY sim DESC, vec_id ASC LIMIT 10)),
         |fleg AS (
         |  SELECT 'fallback' AS leg, vec_id, label, sim FROM (
         |    SELECT vec_id, label, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |    FROM embeddings
         |    WHERE list_inner_product(embedding::DOUBLE[], $q0) >= 0.5::DOUBLE * 0.7::DOUBLE
         |    ORDER BY sim DESC, vec_id ASC LIMIT 10))
         |SELECT leg, vec_id, label, sim
         |FROM (SELECT * FROM pleg UNION ALL SELECT * FROM fleg)
         |ORDER BY leg DESC, vec_id ASC""".stripMargin,
    "v2_get_by_doc" ->
      """SELECT vec_id, label, 1.0::DOUBLE AS sim FROM embeddings
        |WHERE label = 3 ORDER BY vec_id""".stripMargin,
    "v1_knn_isolation" ->
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 50000, $q0, 99 FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, sim FROM (
         |  SELECT vec_id, label, list_inner_product(emb, $q0) AS sim
         |  FROM corpus WHERE label = 3)
         |WHERE sim >= 0.0
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v5_summary_only" ->
      s"""SELECT vec_id, label, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |FROM embeddings WHERE vec_id % 2 = 0
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v4_two_stage" ->
      s"""WITH s1 AS (
         |  SELECT DISTINCT label FROM (
         |    SELECT label, list_inner_product(embedding::DOUBLE[], $q0) AS sim, vec_id
         |    FROM embeddings WHERE vec_id % 2 = 0
         |    ORDER BY sim DESC, vec_id ASC LIMIT 10))
         |SELECT vec_id, label, sim FROM (
         |  SELECT vec_id, label, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |  FROM embeddings
         |  WHERE vec_id % 2 = 1 AND label IN (SELECT label FROM s1)
         |  ORDER BY sim DESC, vec_id ASC LIMIT 10)
         |ORDER BY sim DESC, vec_id ASC""".stripMargin,
    "v6_rrf_fusion" ->
      s"""WITH sb AS (
         |  SELECT label, vec_id, sim,
         |         row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rnk
         |  FROM (
         |    SELECT label, vec_id, sim FROM (
         |      SELECT label, vec_id, sim,
         |             row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id ASC) AS rn
         |      FROM (
         |        SELECT label, vec_id, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |        FROM embeddings WHERE vec_id % 2 = 0
         |        ORDER BY sim DESC, vec_id ASC LIMIT 10))
         |    WHERE rn = 1)),
         |cb AS (
         |  SELECT label, vec_id, sim,
         |         row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rnk
         |  FROM (
         |    SELECT label, vec_id, sim FROM (
         |      SELECT label, vec_id, sim,
         |             row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id ASC) AS rn
         |      FROM (
         |        SELECT label, vec_id, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |        FROM embeddings WHERE vec_id % 2 = 1
         |        ORDER BY sim DESC, vec_id ASC LIMIT 10))
         |    WHERE rn = 1))
         |SELECT coalesce(sb.label, cb.label) AS label,
         |       coalesce(cb.vec_id, sb.vec_id) AS rep_vec_id,
         |       coalesce(0.4::DOUBLE / (60 + sb.rnk), 0.0) +
         |       coalesce(0.6::DOUBLE / (60 + cb.rnk), 0.0) AS rrf_score
         |FROM sb FULL OUTER JOIN cb ON sb.label = cb.label
         |ORDER BY rrf_score DESC, label ASC LIMIT 5""".stripMargin,
    "v7_dedup_keepmax" ->
      s"""SELECT label, vec_id, sim FROM (
         |  SELECT label, vec_id, sim,
         |         row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id ASC) AS rn
         |  FROM (SELECT label, vec_id,
         |               list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |        FROM embeddings))
         |WHERE rn = 1 ORDER BY label""".stripMargin,
    // Backfill oracle mirrors the leg construction: stage-2 dedup rows
    // (src 0) first, then stage-1 docs absent from stage 2 (src 1),
    // ordered (src, sim DESC) and cut at k. Both branches carry the
    // knn threshold filter so parity holds for any data.
    "v7b_backfill" ->
      s"""WITH s1 AS (
         |  SELECT label, vec_id, sim FROM (
         |    SELECT label, vec_id, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |    FROM embeddings
         |    WHERE vec_id % 2 = 0 AND list_inner_product(embedding::DOUBLE[], $q0) >= 0.0
         |    ORDER BY sim DESC, vec_id ASC LIMIT 15)),
         |s2 AS (
         |  SELECT label, vec_id, sim FROM (
         |    SELECT label, vec_id, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |    FROM embeddings
         |    WHERE vec_id % 2 = 1 AND list_inner_product(embedding::DOUBLE[], $q0) >= 0.0
         |      AND label IN (SELECT DISTINCT label FROM s1)
         |    ORDER BY sim DESC, vec_id ASC LIMIT 8)),
         |dedup AS (
         |  SELECT label, vec_id, sim, 0 AS src FROM (
         |    SELECT label, vec_id, sim,
         |           row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id ASC) AS rn
         |    FROM s2) WHERE rn = 1),
         |backfill AS (
         |  SELECT label, vec_id, sim, 1 AS src FROM (
         |    SELECT label, vec_id, sim,
         |           row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id ASC) AS rn
         |    FROM s1 WHERE label NOT IN (SELECT label FROM s2)) WHERE rn = 1)
         |SELECT label, vec_id, sim, src FROM (
         |  SELECT * FROM dedup UNION ALL SELECT * FROM backfill)
         |ORDER BY src ASC, sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v8_multiquery_merge" ->
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
         |    ORDER BY sim DESC, vec_id ASC LIMIT 10))
         |SELECT label, vec_id, wsim FROM (
         |  SELECT label, vec_id, wsim,
         |         row_number() OVER (PARTITION BY label ORDER BY wsim DESC, vec_id ASC) AS rn
         |  FROM b)
         |WHERE rn = 1 ORDER BY wsim DESC, label ASC LIMIT 5""".stripMargin,
    "v11_traditional" ->
      s"""WITH m AS (
         |  SELECT * FROM (
         |    SELECT label, vec_id, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |    FROM embeddings WHERE vec_id % 2 = 0
         |    ORDER BY sim DESC, vec_id ASC LIMIT 10)
         |  UNION ALL
         |  SELECT * FROM (
         |    SELECT label, vec_id, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |    FROM embeddings WHERE vec_id % 2 = 1
         |    ORDER BY sim DESC, vec_id ASC LIMIT 10))
         |SELECT label, vec_id, sim FROM (
         |  SELECT label, vec_id, sim,
         |         row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id ASC) AS rn
         |  FROM m)
         |WHERE rn = 1 ORDER BY sim DESC, label ASC LIMIT 10""".stripMargin,
    "v13_pairwise_cosine" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CASE WHEN sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) = 0
        |         OR sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])) = 0
        |       THEN 0.0
        |       ELSE list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        |            / (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
        |               * sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
        |  END AS sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 20 ORDER BY id_a""".stripMargin,
    "ann_bruteforce_batch" ->
      """SELECT q_id, rank, vec_id, sim FROM (
        |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
        |         list_inner_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY list_inner_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
        |                    e.vec_id ASC) AS rank
        |  FROM embeddings e CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
        |  WHERE e.vec_id <> q.vec_id)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    // aggregator path, identical semantics ⇒ identical oracle text
    "ann_batch_topk" ->
      """SELECT q_id, rank, vec_id, sim FROM (
        |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
        |         list_inner_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY list_inner_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
        |                    e.vec_id ASC) AS rank
        |  FROM embeddings e CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
        |  WHERE e.vec_id <> q.vec_id)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "v14_late_interaction" ->
      """WITH qs AS (
        |  SELECT vec_id AS q_i, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id < 3),
        |best AS (
        |  SELECT e.label, q.q_i,
        |    max(list_inner_product(e.embedding::DOUBLE[], q.qe)) AS best
        |  FROM embeddings e CROSS JOIN qs q
        |  WHERE e.vec_id % 2 = 1
        |  GROUP BY e.label, q.q_i),
        |agg AS (
        |  SELECT label, count(*)::BIGINT AS n_q,
        |    list_reduce(list(best ORDER BY q_i), (a, b) -> a + b) AS lis
        |  FROM best GROUP BY label)
        |SELECT label, n_q, lis FROM agg
        |ORDER BY lis DESC, label ASC LIMIT 10""".stripMargin,
    // Full-probe IVF == brute-force kNN (every cell scanned).
    "ann_ivf_fullprobe" ->
      s"""SELECT vec_id AS id, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |FROM embeddings
         |WHERE list_inner_product(embedding::DOUBLE[], $q0) >= 0.0
         |ORDER BY sim DESC, id ASC LIMIT 10""".stripMargin,
    // int8 coarse scores are exact integers: DuckDB's double-
    // accumulated list_inner_product equals Spark's long fold because
    // every partial sum is an integer far below 2^53.
    "ann_int8_rescore" ->
      s"""WITH q AS (
         |  SELECT list_transform(embedding::DOUBLE[],
         |           x -> CAST(floor(x * 127) AS BIGINT)) AS q8,
         |         embedding::DOUBLE[] AS qe
         |  FROM embeddings WHERE vec_id = 0),
         |corpus AS (
         |  SELECT vec_id,
         |         list_transform(embedding::DOUBLE[],
         |           x -> CAST(floor(x * 127) AS BIGINT)) AS q8,
         |         embedding
         |  FROM embeddings WHERE vec_id <> 0),
         |coarse AS (
         |  SELECT c.vec_id, c.embedding,
         |    CAST(list_inner_product(c.q8::DOUBLE[], q.q8::DOUBLE[]) AS BIGINT) AS coarse
         |  FROM corpus c CROSS JOIN q
         |  ORDER BY coarse DESC, vec_id ASC LIMIT 50)
         |SELECT vec_id, coarse,
         |  list_inner_product(embedding::DOUBLE[], (SELECT qe FROM q)) AS sim
         |FROM coarse
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    // The RP-LSH oracle rebuilds the ±1 planes as literals (the same
    // deterministic generator emits both the Spark typedLits and this
    // SQL), derives the query code, expands the Hamming-≤2 multiprobe
    // set with two bit-flip passes (p = 8 means "no flip", DISTINCT
    // dedups), and replays bucket-filter + exact rescore.
    "ann_rp_lsh" -> {
      import graft.functions.RandomHyperplane.codeSql
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         |qc AS (SELECT ${codeSql("qe")} AS qcode FROM q),
         |bits AS (SELECT unnest(range(0, 9)) AS p),
         |probes AS (
         |  SELECT DISTINCT
         |    xor(xor(qcode, CASE WHEN b1.p = 8 THEN 0 ELSE 1 << b1.p END),
         |        CASE WHEN b2.p = 8 THEN 0 ELSE 1 << b2.p END) AS code
         |  FROM qc, bits b1, bits b2),
         |coded AS (
         |  SELECT vec_id, ${codeSql("embedding::DOUBLE[]")} AS code,
         |    list_inner_product(embedding::DOUBLE[], (SELECT qe FROM q)) AS sim
         |  FROM embeddings)
         |SELECT vec_id, code, sim FROM coded
         |WHERE code IN (SELECT code FROM probes)
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin
    },
    "ann_lsh_knn_join" -> {
      import graft.functions.RandomHyperplane.codeSql
      s"""WITH coded AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb,
         |    ${codeSql("embedding::DOUBLE[]")} AS code
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    list_inner_product(a.emb, b.emb) AS sim
         |  FROM coded a JOIN coded b
         |    ON a.code = b.code AND a.vec_id <> b.vec_id),
         |ranked AS (
         |  SELECT id_a, id_b, sim,
         |    row_number() OVER (PARTITION BY id_a
         |                       ORDER BY sim DESC, id_b ASC) AS rank
         |  FROM pairs)
         |SELECT id_a, rank, id_b AS neighbor_id, sim FROM ranked
         |WHERE rank <= 3 ORDER BY id_a, rank""".stripMargin
    },
    "ts_hybrid_rrf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
         |  FROM documents),
         |hits AS (SELECT doc_id, term FROM toks WHERE term IN ('join','vector','dup')),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY 1, 2),
         |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
         |dl AS (SELECT doc_id,
         |         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS dl
         |       FROM documents),
         |stats AS (SELECT count(*) AS n_docs,
         |            CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS sum_dl
         |          FROM documents),
         |scored AS (
         |  SELECT t.doc_id, t.term,
         |    ln((n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) + 1.0::DOUBLE)
         |      * (t.tf * 2.2::DOUBLE)
         |      / (t.tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * dl
         |           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS sc
         |  FROM tf t JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
         |bm AS (SELECT doc_id, list_reduce(list(sc ORDER BY term), (a, b) -> a + b) AS bm25
         |       FROM scored GROUP BY doc_id),
         |kw AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS kw_rank
         |       FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 20)),
         |vec AS (SELECT vec_id AS doc_id,
         |          row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS vec_rank
         |        FROM (SELECT vec_id, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |              FROM embeddings
         |              WHERE list_inner_product(embedding::DOUBLE[], $q0) >= 0.0
         |              ORDER BY sim DESC, vec_id ASC LIMIT 20))
         |SELECT coalesce(kw.doc_id, vec.doc_id) AS doc_id,
         |  coalesce(0.5::DOUBLE / (60 + kw_rank), 0.0::DOUBLE) +
         |  coalesce(0.5::DOUBLE / (60 + vec_rank), 0.0::DOUBLE) AS rrf_score
         |FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
         |ORDER BY rrf_score DESC, doc_id ASC LIMIT 10""".stripMargin,
    // Greedy diversity admit as a recursive CTE: walk candidates in rank
    // order carrying (picked ids, picked sims, seen word-set); admit when
    // |first-10-token-set ∩ seen| < 5 or fewer than 3 admitted, stop at 5.
    "v9_diversity" ->
      s"""WITH RECURSIVE topk AS (
         |  SELECT vec_id, sim FROM (
         |    SELECT vec_id, list_inner_product(embedding::DOUBLE[], $q0) AS sim
         |    FROM embeddings
         |    WHERE list_inner_product(embedding::DOUBLE[], $q0) >= 0.0
         |    ORDER BY sim DESC, vec_id ASC LIMIT 20)),
         |cand AS (
         |  SELECT row_number() OVER (ORDER BY t.sim DESC, t.vec_id ASC) AS i,
         |         t.vec_id, t.sim,
         |         list_distinct(list_filter(string_split_regex(lower(d.text), '\\s+'),
         |                                   x -> x <> '')[1:10]) AS words
         |  FROM topk t JOIN documents d ON t.vec_id = d.doc_id),
         |step AS (
         |  SELECT CAST(0 AS BIGINT) AS i, CAST([] AS BIGINT[]) AS picked,
         |         CAST([] AS DOUBLE[]) AS sims, CAST([] AS VARCHAR[]) AS seen
         |  UNION ALL
         |  SELECT c.i,
         |    CASE WHEN len(s.picked) < 5
         |           AND (len(list_intersect(c.words, s.seen)) < 5 OR len(s.picked) < 3)
         |         THEN list_append(s.picked, c.vec_id) ELSE s.picked END,
         |    CASE WHEN len(s.picked) < 5
         |           AND (len(list_intersect(c.words, s.seen)) < 5 OR len(s.picked) < 3)
         |         THEN list_append(s.sims, c.sim) ELSE s.sims END,
         |    CASE WHEN len(s.picked) < 5
         |           AND (len(list_intersect(c.words, s.seen)) < 5 OR len(s.picked) < 3)
         |         THEN list_distinct(list_concat(s.seen, c.words)) ELSE s.seen END
         |  FROM step s JOIN cand c ON c.i = s.i + 1)
         |SELECT vec_id, sim FROM (
         |  SELECT unnest(picked) AS vec_id, unnest(sims) AS sim,
         |         generate_subscripts(picked, 1) AS pos
         |  FROM (SELECT picked, sims FROM step ORDER BY i DESC LIMIT 1))
         |ORDER BY pos""".stripMargin
  )
}
