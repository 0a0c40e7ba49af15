package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

/** Density-mode invariants (the HDBSCAN-contract clusterer,
  * `clustering_service.py:387-455`): cluster count is DISCOVERED,
  * non-convex density-connected shapes stay whole, noise comes from
  * density, and min_cluster_size demotes undersized clusters —
  * exactly the semantics the k-means fallback cannot express. */
class DensityClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark

  /** Two concentric rings (non-convex, not linearly separable by
    * centroids) + two isolated points + one close pair. */
  private def ringFixture: Array[(Long, Array[Double])] = {
    val inner = (0 until 24).map { i =>
      val a = 2 * math.Pi * i / 24
      (i.toLong, Array(math.cos(a), math.sin(a)))
    }
    val outer = (0 until 24).map { i =>
      val a = 2 * math.Pi * i / 24
      (100L + i, Array(3 * math.cos(a), 3 * math.sin(a)))
    }
    val isolated = Seq((200L, Array(10.0, 10.0)), (201L, Array(-12.0, 5.0)))
    val pair = Seq((300L, Array(20.0, 0.0)), (301L, Array(20.05, 0.0)))
    (inner ++ outer ++ isolated ++ pair).toArray
  }

  test("discovers the cluster count and keeps non-convex rings whole") {
    val out = Clustering.localDbscan(ringFixture, eps = 0.9).toSeq
    val byId = out.map(r => r._1 -> r._2).toMap
    val clusters = out.map(_._2).filter(_ >= 0).distinct.sorted
    assert(clusters == Seq(0, 1), s"expected exactly 2 discovered clusters, got $clusters")
    // each ring is ONE density-connected cluster; a 2-means split would
    // cut both rings in half instead
    val innerLabels = (0L until 24L).map(byId).distinct
    val outerLabels = (100L until 124L).map(byId).distinct
    assert(innerLabels.size == 1, s"inner ring split: $innerLabels")
    assert(outerLabels.size == 1, s"outer ring split: $outerLabels")
    assert(innerLabels.head != outerLabels.head, "rings merged")
    // renumbering by smallest member id: the inner ring holds id 0
    assert(innerLabels.head == 0)
  }

  test("noise from density; min_cluster_size demotes the close pair") {
    val out = Clustering.localDbscan(ringFixture, eps = 0.9).toSeq
    val byId = out.map(r => r._1 -> r._2).toMap
    assert(byId(200L) == -1 && byId(201L) == -1, "isolated points must be density noise")
    // 300/301 are mutual eps-neighbors (a genuine density pair) but the
    // cluster has size 2 < min_cluster_size=3 → demoted to noise
    assert(byId(300L) == -1 && byId(301L) == -1, "undersized cluster must demote")
  }

  test("k-means with the same data CANNOT keep the rings whole (contrast)") {
    val pts = ringFixture.filter(_._1 < 200)
    val km = Clustering.localKMeans(pts, k = 2).map(r => r._1 -> r._2).toMap
    val innerLabels = (0L until 24L).map(km).distinct
    val outerLabels = (100L until 124L).map(km).distinct
    assert(innerLabels.size > 1 || outerLabels.size > 1 ||
      innerLabels.toSet == outerLabels.toSet,
      "centroid clustering should not separate concentric rings cleanly")
  }

  test("deterministic under input order permutation; core distance populated") {
    val base = Clustering.localDbscan(ringFixture, eps = 0.9).toSeq.sortBy(_._1)
    val shuffled = Clustering.localDbscan(
      ringFixture.reverse.sortBy(p => (p._1 % 7, p._1)), eps = 0.9).toSeq.sortBy(_._1)
    assert(base == shuffled, "labels must not depend on input order")
    // core distance = distance to the min_samples-th point: ring
    // neighbors sit one arc-step apart
    val innerStep = 2 * math.sin(math.Pi / 24)
    val cd0 = base.find(_._1 == 0L).get._3
    assert(math.abs(cd0 - innerStep) < 1e-9, s"core dist $cd0 vs arc step $innerStep")
  }

  test("driver entries run: density mode labels per tenant with noise naming") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("c2b_density")(spark, d).collect()
    assert(rows.nonEmpty)
    val names = rows.map(_.getString(2)).toSet
    assert(names.exists(_.startsWith("cluster_")), "no discovered clusters at eps=1.25")
    assert(names.contains("noise"), "no density noise at eps=1.25")
    // cluster ids are namespaced per tenant
    rows.filter(_.getString(2) != "noise").foreach { r =>
      assert(r.getString(2).startsWith(s"cluster_${r.getString(0)}_"), r.toString)
    }
    val stats = SparkEntry.queries("x5b_clustering_density")(spark, d).collect()
    assert(stats.nonEmpty)
    val hier = SparkEntry.queries("c7b_hierarchical_density")(spark, d).collect()
    assert(hier.nonEmpty)
    // L1 refinements (when present) carry their L0 parent id
    hier.filter(_.getInt(4) == 1).foreach { r =>
      assert(r.getString(2).startsWith(r.getString(3) + "_L1_"), r.toString)
    }
  }
}
