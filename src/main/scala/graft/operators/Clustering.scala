package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Clustering engine (SURVEY.md §2.9 C1-C9). The reference runs
  * per-tenant HDBSCAN over ≤10k summary vectors
  * (`clustering_service.py:387-455`); MLlib has no HDBSCAN, so the
  * committed contract (SURVEY §7.3) is: clustering behind a
  * `Clusterer` trait with (a) a scalable KMeans mode and (b) a
  * faithful per-tenant local mode — each tenant's vectors are small
  * by construction (10k cap), so per-group Lloyd iterations run
  * *inside* `flatMapGroups`, distributing tenants across executors
  * with zero cross-tenant shuffle. That is exactly the 100 TB shape:
  * groupByKey(tenant) → local clustering per group.
  *
  * Noise contract: points farther than `noiseThreshold` from their
  * nearest centroid get label -1 (HDBSCAN's noise semantics,
  * `clustering_service.py:433`); confidence = min(0.5 + n/100, 0.95)
  * (`:909`).
  */
object Clustering {

  /** Deterministic local Lloyd k-means over one group's vectors.
    * Seeded by sorting on the id column — no RNG, reproducible across
    * partitionings (unlike MLlib's k-means|| init under local[n]).
    */
  def localKMeans(points: Array[(Long, Array[Double])], k: Int, iters: Int = 10,
                  noiseThreshold: Double = Double.MaxValue): Array[(Long, Int, Double)] = {
    if (points.isEmpty) return Array.empty
    val sorted = points.sortBy(_._1)
    val kk = math.min(k, sorted.length)
    // deterministic init: evenly spaced points in id order
    var centroids = Array.tabulate(kk)(i => sorted(i * sorted.length / kk)._2.clone())
    val dim = sorted.head._2.length
    var it = 0
    var assign = new Array[Int](sorted.length)
    while (it < iters) {
      var changed = false
      var p = 0
      while (p < sorted.length) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var dist = 0.0; var j = 0
          while (j < dim) { val df = sorted(p)._2(j) - centroids(c)(j); dist += df * df; j += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        if (assign(p) != best) { assign(p) = best; changed = true }
        p += 1
      }
      val sums = Array.fill(kk, dim)(0.0)
      val counts = new Array[Int](kk)
      p = 0
      while (p < sorted.length) {
        val a = assign(p); counts(a) += 1
        var j = 0
        while (j < dim) { sums(a)(j) += sorted(p)._2(j); j += 1 }
        p += 1
      }
      centroids = Array.tabulate(kk)(c =>
        if (counts(c) > 0) sums(c).map(_ / counts(c)) else centroids(c))
      it += 1
      if (!changed) it = iters
    }
    def distTo(p: Int, c: Int): Double = {
      var dist = 0.0; var j = 0
      while (j < dim) { val df = sorted(p)._2(j) - centroids(c)(j); dist += df * df; j += 1 }
      math.sqrt(dist)
    }

    // Noise-robust refinement: points beyond the threshold are marked
    // noise and excluded from centroid recomputation (otherwise a far
    // outlier drags the centroid and everything becomes "noise") —
    // approximating HDBSCAN's outlier exclusion contract.
    val noise = new Array[Boolean](sorted.length)
    if (noiseThreshold < Double.MaxValue) {
      var round = 0
      while (round < 3) {
        var p = 0
        while (p < sorted.length) { noise(p) = distTo(p, assign(p)) > noiseThreshold; p += 1 }
        val sums = Array.fill(kk, dim)(0.0)
        val counts = new Array[Int](kk)
        p = 0
        while (p < sorted.length) {
          if (!noise(p)) {
            val a = assign(p); counts(a) += 1
            var j = 0
            while (j < dim) { sums(a)(j) += sorted(p)._2(j); j += 1 }
          }
          p += 1
        }
        centroids = Array.tabulate(kk) { c =>
          if (counts(c) > 0) sums(c).map(_ / counts(c))
          else {
            // every point beyond threshold → re-seed at the nearest
            // point so the centroid can migrate into the dense region
            var best = 0; var bestD = Double.MaxValue
            var p2 = 0
            while (p2 < sorted.length) {
              val dd = distTo(p2, c); if (dd < bestD) { bestD = dd; best = p2 }
              p2 += 1
            }
            sorted(best)._2.clone()
          }
        }
        // reassign non-noise points to the nearest refined centroid
        p = 0
        while (p < sorted.length) {
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < kk) { val dd = distTo(p, c); if (dd < bestD) { bestD = dd; best = c }; c += 1 }
          assign(p) = best
          p += 1
        }
        round += 1
      }
      var p = 0
      while (p < sorted.length) { noise(p) = distTo(p, assign(p)) > noiseThreshold; p += 1 }
    }

    sorted.indices.map { p =>
      val d = distTo(p, assign(p))
      if (noise(p)) (sorted(p)._1, -1, d) else (sorted(p)._1, assign(p), d)
    }.toArray
  }

  /** C2/C7 — per-tenant clustering via flatMapGroups: tenants fan out
    * across executors, each clustered locally and deterministically. */
  def clusterPerTenant(vectors: DataFrame, tenantCol: String, idCol: String,
                       embCol: String, k: Int, noiseThreshold: Double = Double.MaxValue): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors
      .select(col(tenantCol).cast("string").as("tenant"), col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .as[(String, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (tenant, rows) =>
        val pts = rows.map(r => (r._2, r._3.toArray)).toArray
        localKMeans(pts, k, 10, noiseThreshold).iterator.map { case (id, c, d) =>
          (tenant, id, if (c < 0) "noise" else s"cluster_${tenant}_$c", c, d)
        }
      }
      .toDF("tenant", "id", "cluster_id", "cluster_idx", "dist")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C2 — flat clustering of the embeddings table, label as tenant
    // (rows-only: iterative refinement isn't SQL-expressible; invariants
    // are asserted in ClusteringSpec).
    "c2_cluster_per_tenant" -> ((s, d) =>
      clusterPerTenant(Tables.embeddings(s, d), "label", "vec_id", "embedding", 3)
        .select("tenant", "id", "cluster_id", "cluster_idx")
        .orderBy("tenant", "id")),

    // C3 — cluster triage: ≥3 main, ==2 small, ≤1/noise excluded
    // (clustering_service.py:159-183) over the label distribution.
    "c3_triage" -> ((s, d) =>
      Tables.embeddings(s, d).groupBy("label").agg(count(lit(1)).as("n"))
        .withColumn("triage",
          when(col("n") >= 3, "main").when(col("n") === 2, "small").otherwise("excluded"))
        .select("label", "n", "triage")
        .orderBy("label")),

    // C6 — cluster persistence stats: confidence = min(0.5 + n/100, 0.95)
    // (clustering_service.py:909).
    "c6_confidence" -> ((s, d) =>
      Tables.embeddings(s, d).groupBy("label").agg(count(lit(1)).as("n"))
        .withColumn("confidence",
          least(lit(0.95), lit(0.5) + col("n").cast("double") / lit(100.0)))
        .select("label", "n", "confidence")
        .orderBy("label")),

    // C8 — cluster tree read: clusters by size desc with rank
    // (clustering_service.py:978-1033).
    "c8_cluster_tree" -> ((s, d) => {
      val sizes = Tables.embeddings(s, d).groupBy("label").agg(count(lit(1)).as("n"))
      sizes.withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("label").asc)))
        .select("rnk", "label", "n")
        .orderBy("rnk")
    })
  )

  val oracles: Map[String, String] = Map(
    "c3_triage" ->
      """SELECT label, count(*) AS n,
        |  CASE WHEN count(*) >= 3 THEN 'main'
        |       WHEN count(*) = 2 THEN 'small'
        |       ELSE 'excluded' END AS triage
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "c6_confidence" ->
      """SELECT label, count(*) AS n,
        |  least(0.95, 0.5 + CAST(count(*) AS DOUBLE) / 100.0) AS confidence
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "c8_cluster_tree" ->
      """SELECT row_number() OVER (ORDER BY n DESC, label ASC) AS rnk, label, n
        |FROM (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
        |ORDER BY rnk""".stripMargin
  )
}
