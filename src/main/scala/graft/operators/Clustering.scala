package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Clustering engine (SURVEY.md §2.9 C1-C9). The reference runs
  * per-tenant HDBSCAN over ≤10k summary vectors
  * (`clustering_service.py:387-455`); MLlib has no HDBSCAN, so the
  * committed contract (SURVEY §7.3) ships TWO local modes behind the
  * same per-tenant fan-out (`clusterPerTenantWith`): (a) the FAITHFUL
  * density mode — deterministic DBSCAN with HDBSCAN's contract
  * constants (min_cluster_size=3, min_samples=2, noise=−1), which
  * discovers the cluster count and follows arbitrary-shape density
  * clusters like the reference; and (b) the scalable deterministic
  * k-means fallback for callers that fix k. Each tenant's vectors are
  * small by construction (10k cap), so either algorithm runs *inside*
  * `flatMapGroups`, distributing tenants across executors with zero
  * cross-tenant shuffle. That is exactly the 100 TB shape:
  * groupByKey(tenant) → local clustering per group.
  *
  * Noise contract: density mode marks low-density points −1 (HDBSCAN
  * semantics, `clustering_service.py:433`); the k-means mode
  * approximates it with a distance-to-centroid cutoff. confidence =
  * min(0.5 + n/100, 0.95) (`:909`).
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

  /** Density-based local clusterer — the FAITHFUL mode for the
    * reference's HDBSCAN contract (`clustering_service.py:387-455`:
    * HDBSCAN(min_cluster_size=3, min_samples=2), noise label −1 at
    * `:433`): deterministic DBSCAN with HDBSCAN's contract constants.
    * Unlike the k-means fallback it DISCOVERS the cluster count (no k
    * input), follows arbitrary-shape density-connected regions, and
    * derives noise from density (too few eps-neighbors), not from a
    * distance-to-centroid cutoff. Clusters smaller than
    * `minClusterSize` are demoted to noise — HDBSCAN's min_cluster_size
    * pruning. The third output is the HDBSCAN core distance (distance
    * to the minSamples-th nearest point, self counted first).
    *
    * Determinism: points are processed in id order and final cluster
    * indices are renumbered by smallest member id, so the labeling is
    * independent of partitioning and traversal order. Cost: O(n²·dim)
    * within ONE tenant group — bounded by the same ≤10k per-tenant cap
    * that makes the reference's in-process HDBSCAN feasible; tenants
    * fan out across executors via flatMapGroups exactly like the
    * k-means mode.
    */
  def localDbscan(points: Array[(Long, Array[Double])], eps: Double,
                  minSamples: Int = 2, minClusterSize: Int = 3): Array[(Long, Int, Double)] = {
    if (points.isEmpty) return Array.empty
    val sorted = points.sortBy(_._1)
    val n = sorted.length
    val dim = sorted.head._2.length
    def dist(a: Int, b: Int): Double = {
      var s = 0.0; var j = 0
      while (j < dim) { val df = sorted(a)._2(j) - sorted(b)._2(j); s += df * df; j += 1 }
      math.sqrt(s)
    }
    val neigh = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (dist(i, j) <= eps) { neigh(i) += j; neigh(j) += i }
        j += 1
      }
      i += 1
    }
    // core rule: |N_eps(p)| ≥ min_samples, the point itself included
    val core = Array.tabulate(n)(p => neigh(p).length + 1 >= minSamples)
    val Unvisited = -2
    val labels = Array.fill(n)(Unvisited)
    var cid = 0
    i = 0
    while (i < n) {
      if (core(i) && labels(i) == Unvisited) {
        labels(i) = cid
        val queue = scala.collection.mutable.Queue(neigh(i).toSeq: _*)
        while (queue.nonEmpty) {
          val q = queue.dequeue()
          if (labels(q) == Unvisited) {
            labels(q) = cid
            if (core(q)) queue ++= neigh(q)
          }
        }
        cid += 1
      }
      i += 1
    }
    i = 0
    while (i < n) { if (labels(i) == Unvisited) labels(i) = -1; i += 1 }
    // min_cluster_size: demote undersized clusters to noise
    val sizes = new Array[Int](math.max(cid, 1))
    labels.foreach(l => if (l >= 0) sizes(l) += 1)
    i = 0
    while (i < n) {
      if (labels(i) >= 0 && sizes(labels(i)) < minClusterSize) labels(i) = -1
      i += 1
    }
    // renumber surviving clusters by smallest member id
    val remap = labels.zipWithIndex.filter(_._1 >= 0).groupBy(_._1)
      .map { case (l, ms) => l -> ms.map(m => sorted(m._2)._1).min }
      .toSeq.sortBy(_._2).map(_._1).zipWithIndex.toMap
    sorted.indices.map { p =>
      val cd =
        if (minSamples <= 1) 0.0
        else {
          val ds = (0 until n).filter(_ != p).map(dist(p, _)).sorted
          if (ds.length >= minSamples - 1) ds(minSamples - 2) else Double.PositiveInfinity
        }
      val l = labels(p)
      (sorted(p)._1, if (l >= 0) remap(l) else -1, cd)
    }.toArray
  }

  /** TRUE HDBSCAN with `'eom'` (excess-of-mass) stability selection —
    * the reference's actual algorithm (`clustering_service.py:421-428`:
    * `HDBSCAN(min_cluster_size=3, min_samples=2,
    * cluster_selection_method='eom')`), which the single-eps DBSCAN
    * mode cannot reproduce on variable-density tenants (one eps either
    * merges the tight clusters or over-noises the loose one —
    * HierarchySpec proves the separation on such a fixture).
    *
    * Formulation: instead of the binary single-linkage dendrogram +
    * condense pass of the original implementation, this walks the
    * MULTIWAY threshold cascade over mutual-reachability bottleneck
    * distances — provably label-equivalent (equal-weight binary
    * cascades contribute zero stability, so collapsing them into one
    * multiway split changes neither stabilities nor the eom choice)
    * and, crucially, replayable in SQL by the DuckDB oracle
    * (see `hdbscanCte`): components at threshold w are exactly
    * {q : minimax-mreach(p,q) ≤ w}, computable by a Bellman-Ford-style
    * min-max closure — no union-find needed.
    *
    * Steps: (1) core distance = distance to the minSamples-th nearest
    * point, self counted first; (2) mutual reachability mreach(a,b) =
    * max(core a, core b, d(a,b)); (3) Prim MST (index tie-break — the
    * cascade below depends only on TRUE weights, so MST tie choices
    * never change the output); (4) merge MST edges ascending grouped
    * by equal weight into a multiway component tree; (5) descend from
    * the root: at a node of weight w (split lambda λ = 1/w, +∞ for
    * w = 0 duplicate groups), children of size < minClusterSize fall
    * out of the current cluster at λ, ≥ 2 big children end the cluster
    * and each becomes a new cluster born at λ, exactly 1 big child
    * continues the cluster; (6) stability S(C) = Σ points (λ_p − λ_b)
    * + Σ child clusters |D|·(λ_D − λ_b), each sum folded in id order
    * (oracle parity); (7) E(C) = max(S(C), Σ E(children)) bottom-up;
    * a cluster self-wins iff S ≥ Σ E(children); selected = self-wins
    * with no self-winning proper ancestor (root excluded —
    * allow_single_cluster=False); (8) labels = the unique selected
    * ancestor-or-self of the cluster each point fell out of, noise −1,
    * clusters renumbered by smallest member id.
    *
    * Cost: O(n²·dim) per tenant like localDbscan — bounded by the
    * reference's ≤10k per-tenant cap; tenants fan out across executors
    * via the same flatMapGroups. Third output = core distance. */
  def localHdbscan(points: Array[(Long, Array[Double])], minSamples: Int = 2,
                   minClusterSize: Int = 3): Array[(Long, Int, Double)] = {
    if (points.isEmpty) return Array.empty
    val sorted = points.sortBy(_._1)
    val n = sorted.length
    val dim = sorted.head._2.length
    def dist(a: Int, b: Int): Double = {
      var s = 0.0; var j = 0
      while (j < dim) { val df = sorted(a)._2(j) - sorted(b)._2(j); s += df * df; j += 1 }
      math.sqrt(s)
    }
    val core = Array.tabulate(n) { p =>
      if (minSamples <= 1 || n == 1) 0.0
      else {
        val ds = (0 until n).filter(_ != p).map(dist(p, _)).sorted
        if (ds.length >= minSamples - 1) ds(minSamples - 2) else Double.PositiveInfinity
      }
    }
    if (n < minClusterSize)
      return sorted.indices.map(p => (sorted(p)._1, -1, core(p))).toArray
    def mreach(a: Int, b: Int): Double =
      math.max(math.max(core(a), core(b)), dist(a, b))

    // Prim over mreach, O(n²); deterministic (first strict minimum).
    val inTree = new Array[Boolean](n)
    val key = Array.fill(n)(Double.PositiveInfinity)
    val from = Array.fill(n)(-1)
    key(0) = 0.0
    val mstEdges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    var step = 0
    while (step < n) {
      var u = -1; var best = Double.PositiveInfinity
      var i = 0
      while (i < n) { if (!inTree(i) && (u < 0 || key(i) < best)) { best = key(i); u = i }; i += 1 }
      inTree(u) = true
      if (from(u) >= 0) mstEdges += ((from(u), u, key(u)))
      i = 0
      while (i < n) {
        if (!inTree(i)) { val w = mreach(u, i); if (w < key(i)) { key(i) = w; from(i) = u } }
        i += 1
      }
      step += 1
    }

    // Multiway component tree: MST edges ascending, equal weights as
    // ONE batch (simultaneous splits when read top-down).
    val uf = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x; while (uf(r) != r) r = uf(r)
      var c = x; while (uf(c) != c) { val nx = uf(c); uf(c) = r; c = nx }
      r
    }
    // node ids: 0..n-1 leaves; ≥ n internal (index into `tw`/`tch`)
    val tw = scala.collection.mutable.ArrayBuffer.empty[Double]
    val tch = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    val tsz = scala.collection.mutable.ArrayBuffer.empty[Int]
    val tmin = scala.collection.mutable.ArrayBuffer.empty[Long]
    def nodeSize(id: Int): Int = if (id < n) 1 else tsz(id - n)
    def nodeMin(id: Int): Long = if (id < n) sorted(id)._1 else tmin(id - n)
    val compNode = Array.tabulate(n)(identity)
    for ((w, es) <- mstEdges.groupBy(_._3).toSeq.sortBy(_._1)) {
      val pres = scala.collection.mutable.LinkedHashSet.empty[Int]
      es.foreach { case (a, b, _) => pres += find(a); pres += find(b) }
      val preOf = pres.iterator.map(r => r -> compNode(r)).toMap
      es.foreach { case (a, b, _) =>
        val ra = find(a); val rb = find(b); if (ra != rb) uf(rb) = ra
      }
      for ((root, members) <- pres.groupBy(find(_)) if members.size > 1) {
        val childIds = members.toArray.map(preOf).sortBy(nodeMin)
        tw += w; tch += childIds
        tsz += childIds.map(nodeSize).sum
        tmin += childIds.map(nodeMin).min
        compNode(root) = n + tw.length - 1
      }
    }
    val rootNode = compNode(find(0))

    // Condensed cascade: fall-out point rows + child-cluster rows.
    val fallPts = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Int)]
    val childRows = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double, Int)]
    val clBirth = scala.collection.mutable.ArrayBuffer.empty[Double]
    val clParent = scala.collection.mutable.ArrayBuffer.empty[Int]
    val clMinId = scala.collection.mutable.ArrayBuffer.empty[Long]
    def newCluster(birth: Double, par: Int, minId: Long): Int = {
      clBirth += birth; clParent += par; clMinId += minId; clBirth.length - 1
    }
    def leavesOf(id: Int): Iterator[Int] =
      if (id < n) Iterator.single(id) else tch(id - n).iterator.flatMap(leavesOf)
    if (nodeSize(rootNode) >= minClusterSize) {
      val rootCl = newCluster(0.0, -1, nodeMin(rootNode))
      val stack = scala.collection.mutable.Stack[(Int, Int)]((rootNode, rootCl))
      while (stack.nonEmpty) {
        val (nd, cl) = stack.pop()
        val t = nd - n
        val lam = if (tw(t) > 0.0) 1.0 / tw(t) else Double.PositiveInfinity
        val (bigs, smalls) = tch(t).partition(nodeSize(_) >= minClusterSize)
        for (s <- smalls; p <- leavesOf(s)) fallPts += ((p, lam, cl))
        if (bigs.length >= 2) {
          for (b <- bigs) { // minId order (children pre-sorted)
            val c = newCluster(lam, cl, nodeMin(b))
            childRows += ((cl, c, lam, nodeSize(b)))
            stack.push((b, c))
          }
        } else if (bigs.length == 1) stack.push((bigs(0), cl))
      }
    }

    // Stability: ordered folds (point-id order / child-minId order) so
    // the DuckDB replay accumulates bit-identically.
    val nCl = clBirth.length
    val stab = new Array[Double](nCl)
    val ptsByCl = fallPts.groupBy(_._3)
    val chByCl = childRows.groupBy(_._1)
    var c = 0
    while (c < nCl) {
      var s = 0.0
      for ((p, lam, _) <- ptsByCl.getOrElse(c, Nil).toSeq.sortBy(x => sorted(x._1)._1))
        s += lam - clBirth(c)
      var cs = 0.0
      for ((_, ch, lam, sz) <- chByCl.getOrElse(c, Nil).toSeq.sortBy(r => clMinId(r._2)))
        cs += (lam - clBirth(c)) * sz
      stab(c) = s + cs
      c += 1
    }
    // E(C) = max(S, Σ E(children)) bottom-up (reverse creation order is
    // a valid topological order: parents are created before children).
    val eVal = new Array[Double](nCl)
    val childESum = new Array[Double](nCl)
    val childrenOf = Array.fill(nCl)(List.empty[Int])
    c = 0
    while (c < nCl) { if (clParent(c) >= 0) childrenOf(clParent(c)) ::= c; c += 1 }
    c = nCl - 1
    while (c >= 0) {
      var cs = 0.0
      for (ch <- childrenOf(c).sortBy(clMinId(_))) cs += eVal(ch)
      childESum(c) = cs
      eVal(c) = math.max(stab(c), cs)
      c -= 1
    }
    val selfwin = Array.tabulate(nCl)(c => stab(c) >= childESum(c))
    // selected = self-wins with no self-winning proper ancestor (the
    // root, cluster 0, is excluded from selection entirely).
    val selected = new Array[Boolean](nCl)
    val ancWin = new Array[Boolean](nCl)
    c = 0
    while (c < nCl) {
      val par = clParent(c)
      ancWin(c) = par >= 0 && (ancWin(par) || (par != 0 && selfwin(par)))
      selected(c) = c != 0 && selfwin(c) && !ancWin(c)
      c += 1
    }
    // label = unique selected ancestor-or-self of the fall-out cluster
    val labCl = Array.fill(n)(-1)
    for ((p, _, cl0) <- fallPts) {
      var k = cl0
      while (k >= 0 && !selected(k)) k = clParent(k)
      labCl(p) = k
    }
    val remap = labCl.zipWithIndex.filter(_._1 >= 0).groupBy(_._1)
      .map { case (cl, ms) => cl -> ms.map(m => sorted(m._2)._1).min }
      .toSeq.sortBy(_._2).map(_._1).zipWithIndex.toMap
    sorted.indices.map { p =>
      val l = labCl(p)
      (sorted(p)._1, if (l >= 0) remap(l) else -1, core(p))
    }.toArray
  }

  /** C2 true-HDBSCAN mode — per-tenant `'eom'` clustering behind the
    * shared fan-out. */
  def clusterPerTenantHdbscan(vectors: DataFrame, tenantCol: String, idCol: String,
                              embCol: String, minSamples: Int = 2,
                              minClusterSize: Int = 3): DataFrame =
    clusterPerTenantWith(vectors, tenantCol, idCol, embCol)(
      localHdbscan(_, minSamples, minClusterSize))

  /** C2/C7 — per-tenant clustering via flatMapGroups: tenants fan out
    * across executors, each clustered locally and deterministically. */
  def clusterPerTenant(vectors: DataFrame, tenantCol: String, idCol: String,
                       embCol: String, k: Int, noiseThreshold: Double = Double.MaxValue): DataFrame =
    clusterPerTenantWith(vectors, tenantCol, idCol, embCol)(
      localKMeans(_, k, 10, noiseThreshold))

  /** C2 faithful mode — per-tenant DENSITY clustering (HDBSCAN
    * contract constants; see localDbscan). */
  def clusterPerTenantDbscan(vectors: DataFrame, tenantCol: String, idCol: String,
                             embCol: String, eps: Double,
                             minSamples: Int = 2, minClusterSize: Int = 3): DataFrame =
    clusterPerTenantWith(vectors, tenantCol, idCol, embCol)(
      localDbscan(_, eps, minSamples, minClusterSize))

  /** Shared per-tenant fan-out: groupByKey(tenant) → local clusterer
    * inside flatMapGroups — zero cross-tenant shuffle beyond the one
    * group-by, any local algorithm behind the same (id, cluster, stat)
    * contract. */
  def clusterPerTenantWith(vectors: DataFrame, tenantCol: String, idCol: String,
                           embCol: String)(
      clusterer: Array[(Long, Array[Double])] => Array[(Long, Int, Double)]): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors
      .select(col(tenantCol).cast("string").as("tenant"), col(idCol).cast("long").as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .as[(String, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (tenant, rows) =>
        val pts = rows.map(r => (r._2, r._3.toArray)).toArray
        clusterer(pts).iterator.map { case (id, c, d) =>
          (tenant, id, if (c < 0) "noise" else s"cluster_${tenant}_$c", c, d)
        }
      }
      .toDF("tenant", "id", "cluster_id", "cluster_idx", "dist")
  }

  /** C7 — two-level hierarchical clustering: L0 over the full tenant
    * population (min size 8 in the reference), then each sufficiently
    * large L0 cluster is re-clustered into L1 subclusters; cluster ids
    * are namespaced `cluster_{tenant}_L0_{i}` / `..._L1_{i}_{j}` with
    * parent links (`clustering_service.py:1127-1307`). Implemented as
    * two chained per-group passes — no recursion, bounded depth 2.
    */
  def hierarchicalCluster(vectors: DataFrame, tenantCol: String, idCol: String,
                          embCol: String, k0: Int, k1: Int, minForSplit: Int = 8): DataFrame =
    hierarchicalClusterBy(vectors, tenantCol, idCol, embCol,
      clusterPerTenant(_, _, _, _, k0), clusterPerTenant(_, _, _, _, k1),
      minForSplit)

  /** C7 generalized over the per-level clusterer: the density mode
    * re-clusters large L0 density clusters at a tighter eps (the
    * coarse-to-fine reading of HDBSCAN's hierarchy), the k-means mode
    * splits into k1 subclusters. */
  def hierarchicalClusterBy(vectors: DataFrame, tenantCol: String, idCol: String,
                            embCol: String,
                            l0Cluster: (DataFrame, String, String, String) => DataFrame,
                            l1Cluster: (DataFrame, String, String, String) => DataFrame,
                            minForSplit: Int = 8): DataFrame = {
    val l0 = l0Cluster(vectors, tenantCol, idCol, embCol)
      .withColumnRenamed("cluster_id", "l0_id").withColumnRenamed("cluster_idx", "l0_idx")
      .select("tenant", "id", "l0_id", "l0_idx")
    val withEmb = l0.join(
      vectors.select(col(tenantCol).cast("string").as("tenant"),
        col(idCol).cast("long").as("id"), col(embCol).as("emb")),
      Seq("tenant", "id"))
    val sizes = withEmb.groupBy("l0_id").agg(count(lit(1)).as("l0_n"))
    val splittable = withEmb.join(broadcast(sizes.filter(col("l0_n") >= minForSplit)), Seq("l0_id"))
      // noise is never split: L1 refinement applies to clusters only
      .filter(col("l0_id") =!= "noise")
    val l1 = l1Cluster(splittable, "l0_id", "id", "emb")
      .select(col("tenant").as("l0_id"), col("id"),
        col("cluster_idx").as("l1_idx"))
    // density-mode L1 can mark sub-noise (l1_idx = −1): those points
    // stay at their L0 cluster rather than gaining a bogus L1 id
    val refined = col("l1_idx").isNotNull && col("l1_idx") >= 0
    l0.join(l1, Seq("l0_id", "id"), "left_outer")
      .withColumn("cluster_id",
        when(refined,
          concat(lit("cluster_"), col("tenant"), lit("_L0_"), col("l0_idx"),
            lit("_L1_"), col("l1_idx")))
          .when(col("l0_idx") >= 0,
            concat(lit("cluster_"), col("tenant"), lit("_L0_"), col("l0_idx")))
          .otherwise(lit("noise")))
      .withColumn("parent_cluster_id",
        when(refined,
          concat(lit("cluster_"), col("tenant"), lit("_L0_"), col("l0_idx"))))
      .withColumn("level", when(refined, 1).otherwise(0))
      .select("tenant", "id", "cluster_id", "parent_cluster_id", "level")
  }

  /** X5 — the full clustering job: extract (C1) → cluster (C2) →
    * triage (C3) → persistence stats with confidence (C6). */
  def clusteringJob(vectors: DataFrame, tenantCol: String, idCol: String,
                    embCol: String, k: Int): DataFrame =
    clusteringStats(clusterPerTenant(vectors, tenantCol, idCol, embCol, k))

  /** C3+C6 stats over any assignment relation (shared by both
    * clustering modes). */
  def clusteringStats(assigned: DataFrame): DataFrame =
    assigned.groupBy("tenant", "cluster_id").agg(count(lit(1)).as("n"))
      .withColumn("triage",
        when(col("n") >= 3, "main").when(col("n") === 2, "small").otherwise("excluded"))
      .withColumn("confidence",
        least(lit(0.95), lit(0.5) + col("n").cast("double") / lit(100.0)))
      .select("tenant", "cluster_id", "n", "triage", "confidence")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C4/C5 fallback labels — per-cluster top-3 keyword frequency
    // (clustering_service.py:793-865, the deterministic label path).
    "c4_cluster_labels" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      val docs = Tables.documents(s, d)
      val toks = e.join(docs, col("doc_id") === col("vec_id"))
        .select(col("label"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      toks.groupBy("label", "tok").agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("label")
            .orderBy(col("n").desc, col("tok").asc)))
        .filter(col("rnk") <= 3)
        .select("label", "rnk", "tok", "n")
        .orderBy("label", "rnk")
    }),

    // C5 — small-cluster (2-doc) labels as a DISTINCT rule
    // (`clustering_service.py:637-700`): union the two docs' top-3
    // keywords; if any, label = first two joined " · "; else the first
    // doc's title cut to 10 chars; else the constant fallback. Python's
    // `list(keywords_set)[:2]` iterates a set in arbitrary order — the
    // deterministic stand-in sorts the union first. 2-doc clusters are
    // synthesized by pairing consecutive doc_ids; keyword/title absence
    // is injected by pair id to exercise every branch.
    "c5_small_labels" -> ((s, d) => {
      import graft.operators.TextAnalysis.tokens
      val docs = Tables.documents(s, d)
        .withColumn("pair_id", expr("doc_id div 2"))
        .withColumn("kws",
          when(col("pair_id") % 5 === 0, array().cast("array<string>"))
            .otherwise(slice(tokens(col("text")), 1, 3)))
      docs.groupBy("pair_id")
        .agg(array_sort(array_distinct(flatten(collect_list(col("kws"))))).as("kw_set"),
          min(col("doc_id")).as("min_id"), count(lit(1)).as("n"))
        .withColumn("label_text",
          when(size(col("kw_set")) > 0, concat_ws(" · ", slice(col("kw_set"), 1, 2)))
            .when(col("pair_id") % 10 =!= 5,
              substring(concat(lit("doc_"), col("min_id")), 1, 10))
            .otherwise(lit("其他項目")))
        .select("pair_id", "n", "label_text")
        .orderBy("pair_id")
    }),

    // C7 — hierarchical clustering (rows-only; invariants in spec).
    "c7_hierarchical" -> ((s, d) =>
      hierarchicalCluster(
        Tables.embeddings(s, d).withColumn("tenant", lit("all")),
        "tenant", "vec_id", "embedding", 5, 3)
        .orderBy("id")),

    // X5 — composite clustering job (rows-only).
    "x5_clustering_job" -> ((s, d) =>
      clusteringJob(Tables.embeddings(s, d), "label", "vec_id", "embedding", 3)
        .orderBy("tenant", "cluster_id")),

    // C2 — flat clustering of the embeddings table, label as tenant
    // (rows-only: iterative refinement isn't SQL-expressible; invariants
    // are asserted in ClusteringSpec).
    "c2_cluster_per_tenant" -> ((s, d) =>
      clusterPerTenant(Tables.embeddings(s, d), "label", "vec_id", "embedding", 3)
        .select("tenant", "id", "cluster_id", "cluster_idx")
        .orderBy("tenant", "id")),

    // C2 FAITHFUL mode — per-tenant DENSITY clustering with the
    // reference's HDBSCAN contract constants (min_cluster_size=3,
    // min_samples=2, noise=−1; clustering_service.py:387-455).
    // Discovers the cluster count — no k input. eps=1.25 sits between
    // the per-tenant nearest-neighbor and bulk distance modes of the
    // synthetic embeddings, so the output mixes real clusters, demoted
    // pairs and density noise. Rows-only (iterative BFS not
    // SQL-expressible); density invariants in ClusteringSpec.
    "c2b_density" -> ((s, d) =>
      clusterPerTenantDbscan(Tables.embeddings(s, d), "label", "vec_id",
        "embedding", eps = 1.25)
        .select("tenant", "id", "cluster_id", "cluster_idx")
        .orderBy("tenant", "id")),

    // C7 density mode — coarse L0 at eps=1.25, large clusters refined
    // at the tighter eps=1.15 (HDBSCAN's hierarchy read coarse-to-fine).
    "c7b_hierarchical_density" -> ((s, d) =>
      hierarchicalClusterBy(
        Tables.embeddings(s, d), "label", "vec_id", "embedding",
        clusterPerTenantDbscan(_, _, _, _, 1.25),
        clusterPerTenantDbscan(_, _, _, _, 1.15),
        minForSplit = 8)
        .orderBy("id")),

    // X5 density mode — the full job over density assignments.
    "x5b_clustering_density" -> ((s, d) =>
      clusteringStats(
        clusterPerTenantDbscan(Tables.embeddings(s, d), "label", "vec_id",
          "embedding", eps = 1.25))
        .orderBy("tenant", "cluster_id")),

    // C2 TRUE-HDBSCAN mode — 'eom' excess-of-mass stability selection
    // over mutual-reachability density (see localHdbscan;
    // clustering_service.py:421-428). HASH-exact: the oracle replays
    // the full cascade — minimax closure, threshold components,
    // condensed cascade, ordered stability folds, eom selection — in
    // recursive SQL (hdbscanCte).
    "c2h_hdbscan_eom" -> ((s, d) =>
      clusterPerTenantHdbscan(Tables.embeddings(s, d), "label", "vec_id", "embedding")
        .select("tenant", "id", "cluster_id", "cluster_idx")
        .orderBy("tenant", "id")),

    // C7 true-HDBSCAN hierarchy — L0 eom clustering, L0 clusters of
    // ≥ 8 members re-clustered by a second per-cluster HDBSCAN run
    // (core distances recomputed within the subset = the finer density
    // scale), sub-noise stays at L0.
    "c7h_hierarchical_hdbscan" -> ((s, d) =>
      hierarchicalClusterBy(
        Tables.embeddings(s, d), "label", "vec_id", "embedding",
        clusterPerTenantHdbscan(_, _, _, _),
        clusterPerTenantHdbscan(_, _, _, _),
        minForSplit = 8)
        .orderBy("id")),

    // X5 true-HDBSCAN mode — the full job over eom assignments.
    "x5h_clustering_hdbscan" -> ((s, d) =>
      clusteringStats(
        clusterPerTenantHdbscan(Tables.embeddings(s, d), "label", "vec_id", "embedding"))
        .orderBy("tenant", "cluster_id")),

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
          graft.functions.BoundedWindow.orderBy(col("label"),
            col("n").desc, col("label").asc)))
        .select("rnk", "label", "n")
        .orderBy("rnk")
    })
  )

  /** The density mode IS oracle-expressible: with min_samples = 2
    * every point that has an eps-neighbor is core, so DBSCAN's BFS
    * degenerates to CONNECTED COMPONENTS of the eps-graph — a
    * recursive-CTE transitive closure, the same move as
    * dd_components. Distances replay the Scala loop exactly: ordered
    * left-to-right fold of (aᵢ−bᵢ)², then sqrt (correctly rounded in
    * both engines), compared to the same eps literal. Components of
    * size < min_cluster_size demote to noise; surviving clusters
    * renumber by smallest member id per tenant. */
  private def densityCompsCte(eps: String): String =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
       |pairs AS (
       |  SELECT a.label AS tenant, a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE sqrt(list_reduce(
       |      list_transform(range(1, 65),
       |        j -> (a.emb[j] - b.emb[j]) * (a.emb[j] - b.emb[j])),
       |      (x, y) -> x + y)) <= $eps),
       |edges AS (
       |  SELECT tenant, a_id AS a, b_id AS b FROM pairs
       |  UNION ALL SELECT tenant, b_id, a_id FROM pairs),
       |walk AS (
       |  SELECT DISTINCT tenant, a AS node, a AS reach FROM edges
       |  UNION
       |  SELECT w.tenant, w.node, x.b AS reach
       |  FROM walk w JOIN edges x ON x.tenant = w.tenant AND x.a = w.reach),
       |comps AS (
       |  SELECT tenant, node, min(reach) AS comp FROM walk
       |  GROUP BY tenant, node),
       |surviving AS (
       |  SELECT tenant, comp, count(*) AS n, min(node) AS min_id FROM comps
       |  GROUP BY tenant, comp HAVING count(*) >= 3),
       |idx AS (
       |  SELECT tenant, comp,
       |    (row_number() OVER (PARTITION BY tenant ORDER BY min_id) - 1) AS cidx
       |  FROM surviving),
       |assign AS (
       |  SELECT ev.label AS tenant_l, ev.vec_id AS id,
       |    CASE WHEN i.cidx IS NOT NULL THEN i.cidx ELSE -1 END AS cluster_idx
       |  FROM e ev
       |  LEFT JOIN comps c ON c.tenant = ev.label AND c.node = ev.vec_id
       |  LEFT JOIN idx i ON i.tenant = c.tenant AND i.comp = c.comp)""".stripMargin

  /** Lloyd k-means replayed in SQL — the k-means fallback is ALSO
    * oracle-expressible because every step is bit-deterministic:
    * init = evenly spaced points in id order; assignment = argmin of
    * SQUARED distances computed as left-to-right folds (first lowest
    * index wins ties, the Scala `<` rule); centroid update = per-dim
    * ordered sum over members in id order / count (empty cluster
    * keeps its centroid). The Scala loop's early exit is a FIXPOINT
    * (same assignment ⇒ same ordered sums ⇒ same centroids ⇒ same
    * assignment), so replaying the full iteration count is
    * bit-identical. State = one row per tenant holding the centroid
    * LIST, so the recursive term references the CTE once. Final
    * labels = assignment against the it=9 centroids (Scala's 10th
    * and last assignment pass). Assumes ≥ k points per tenant (the
    * fixture has ~50+). */
  private[graft] def kmeansCte(k: Int, src: String = "e", pre: String = "",
                               dim: Int = 64): String = {
    val cis = (0 until k)
    // squared distance of point emb to centroid c (1-based list index)
    def d(ci: Int) =
      s"""list_reduce(list_transform(range(1, ${dim + 1}),
         |  j -> (p.emb[j] - s.cens[${ci + 1}][j]) * (p.emb[j] - s.cens[${ci + 1}][j])),
         |  (x, y) -> x + y)""".stripMargin
    // first-strict-minimum argmin, lowest index on ties: the FIRST
    // list position holding the minimum (list_position returns the
    // first occurrence — exactly Scala's `<` keep-earlier rule)
    def argmin(ds: Seq[String]): String = {
      val arr = ds.mkString("[", ", ", "]")
      s"(list_position($arr, list_aggregate($arr, 'min')) - 1)"
    }
    val dNames = cis.map(ci => s"d$ci")
    val members = cis.map(ci =>
      s"list(p2.emb ORDER BY p2.id) FILTER (WHERE p2.best = $ci) AS m$ci").mkString(",\n    ")
    val newCens = cis.map { ci =>
      s"""CASE WHEN len(m$ci) > 0 THEN list_transform(range(1, ${dim + 1}),
         |  j -> list_reduce(list_transform(m$ci, v -> v[j]), (x, y) -> x + y)
         |       / CAST(len(m$ci) AS DOUBLE))
         |ELSE oldcens[${ci + 1}] END""".stripMargin
    }.mkString("[", ",\n ", "]")
    s"""${pre}np AS (SELECT tenant, count(*) AS n FROM $src GROUP BY tenant),
       |${pre}rk AS (
       |  SELECT tenant, id, emb,
       |    row_number() OVER (PARTITION BY tenant ORDER BY id) - 1 AS r
       |  FROM $src),
       |${pre}init AS (
       |  SELECT rk.tenant,
       |    list(rk.emb ORDER BY ci.ci) AS cens
       |  FROM ${pre}rk rk JOIN ${pre}np np USING (tenant)
       |  JOIN (SELECT unnest(range(0, $k)) AS ci) ci
       |    ON rk.r = (ci.ci * np.n) // $k
       |  GROUP BY rk.tenant),
       |${pre}iter AS (
       |  SELECT 0 AS it, tenant, cens FROM ${pre}init
       |  UNION ALL
       |  SELECT it + 1, tenant, $newCens AS cens FROM (
       |    SELECT s_it AS it, tenant, any_value(s_cens) AS oldcens,
       |      $members
       |    FROM (
       |      SELECT s.it AS s_it, p.tenant, s.cens AS s_cens, p.id, p.emb,
       |        ${dNames.zip(cis).map { case (n, ci) => s"${d(ci)} AS $n" }.mkString(",\n        ")},
       |        ${argmin(dNames)} AS best
       |      FROM ${pre}iter s JOIN $src p ON p.tenant = s.tenant
       |      WHERE s.it < 9) p2
       |    GROUP BY s_it, tenant)),
       |${pre}fincen AS (SELECT tenant, cens FROM ${pre}iter WHERE it = 9),
       |${pre}kassign AS (
       |  SELECT p.tenant, p.id,
       |    ${dNames.zip(cis).map { case (n, ci) => s"${d(ci)} AS $n" }.mkString(",\n    ")},
       |    ${argmin(dNames)} AS best
       |  FROM ${pre}fincen s JOIN $src p ON p.tenant = s.tenant)""".stripMargin
  }

  /** Full HDBSCAN-eom replayed in SQL — the cascade formulation of
    * `localHdbscan` is chosen precisely because every stage is
    * relational:
    *  1. mutual reachability mr0(a,b) = max(core a, core b, d(a,b))
    *     with core = min other-distance (min_samples = 2);
    *  2. minimax (bottleneck) closure mm by Bellman-Ford-style
    *     relaxation — mm_{k+1}(a,b) = min over c of max(mm_k(a,c),
    *     mr0(c,b)) with 0-weight self loops so "keep" and "extend" are
    *     one join (single recursive reference); k iterations cover
    *     paths of k+1 edges, 64 > any sf tenant size;
    *  3. threshold levels = distinct minimax values (== MST weight
    *     set) descending, plus a w=0 sentinel; component of p at level
    *     w = {q : mm(p,q) ≤ w}, rep = min member id;
    *  4. cluster chain walk (recursive): a component ≥ 3 continues its
    *     parent's cluster unless the parent split into ≥ 2 big
    *     children — then a new cluster is born at λ = 1/w_parent;
    *  5. fall-out rows: a point leaves its cluster at the transition
    *     where its component size drops below 3 (λ = 1/w of the level
    *     above; points still in a ≥3 component at the sentinel level —
    *     duplicate groups — leave at +∞, the lib's λ = 1/0 rule);
    *  6. stability = id-ordered fold of point rows + minId-ordered
    *     fold of child-cluster rows (bit-identical to the Scala
    *     accumulation);
    *  7. E = max(S, Σ E(children)) by value iteration over the
    *     cluster tree (self-links keep childless clusters alive in the
    *     recursive working table);
    *  8. eom: selected = S ≥ Σ E(children) with no self-winning proper
    *     ancestor, root excluded; labels = selected ancestor-or-self
    *     of each point's fall-out cluster, renumbered by smallest
    *     member id. */
  private[graft] def hdbscanCte(src: String, pre: String, iters: Int = 64): String =
    s"""${pre}d0 AS MATERIALIZED (
       |  SELECT a.tenant, a.id AS a_id, b.id AS b_id,
       |    CASE WHEN a.id = b.id THEN CAST(0 AS DOUBLE) ELSE sqrt(list_reduce(
       |      list_transform(range(1, 65),
       |        j -> (a.emb[j] - b.emb[j]) * (a.emb[j] - b.emb[j])),
       |      (x, y) -> x + y)) END AS d
       |  FROM $src a JOIN $src b ON a.tenant = b.tenant),
       |${pre}core AS MATERIALIZED (
       |  SELECT tenant, a_id AS id, min(d) AS core
       |  FROM ${pre}d0 WHERE a_id <> b_id GROUP BY tenant, a_id),
       |${pre}mr0 AS MATERIALIZED (
       |  SELECT d.tenant, d.a_id, d.b_id,
       |    CASE WHEN d.a_id = d.b_id THEN CAST(0 AS DOUBLE)
       |         ELSE greatest(d.d, ca.core, cb.core) END AS w
       |  FROM ${pre}d0 d
       |  JOIN ${pre}core ca ON ca.tenant = d.tenant AND ca.id = d.a_id
       |  JOIN ${pre}core cb ON cb.tenant = d.tenant AND cb.id = d.b_id),
       |${pre}mm AS (
       |  SELECT 0 AS it, tenant, a_id, b_id, w FROM ${pre}mr0
       |  UNION ALL
       |  SELECT it + 1, tenant, a_id, b_id, min(w) AS w FROM (
       |    SELECT m.it AS it, m.tenant AS tenant, m.a_id AS a_id,
       |      x.b_id AS b_id, greatest(m.w, x.w) AS w
       |    FROM ${pre}mm m JOIN ${pre}mr0 x
       |      ON x.tenant = m.tenant AND x.a_id = m.b_id
       |    WHERE m.it < $iters)
       |  GROUP BY it, tenant, a_id, b_id),
       |${pre}mmf AS MATERIALIZED (SELECT tenant, a_id, b_id, w FROM ${pre}mm WHERE it = $iters),
       |${pre}lvl AS MATERIALIZED (
       |  SELECT tenant, w,
       |    row_number() OVER (PARTITION BY tenant ORDER BY w DESC) AS t
       |  FROM (
       |    SELECT DISTINCT tenant, w FROM ${pre}mmf WHERE a_id <> b_id
       |    UNION
       |    SELECT DISTINCT tenant, CAST(0 AS DOUBLE) FROM ${pre}mmf)),
       |${pre}comp AS MATERIALIZED (
       |  SELECT l.tenant, l.t, l.w, m.a_id AS id, min(m.b_id) AS rep
       |  FROM ${pre}lvl l
       |  JOIN ${pre}mmf m ON m.tenant = l.tenant AND m.w <= l.w
       |  GROUP BY l.tenant, l.t, l.w, m.a_id),
       |${pre}cs AS MATERIALIZED (
       |  SELECT tenant, t, w, rep, count(*) AS sz FROM ${pre}comp
       |  GROUP BY tenant, t, w, rep),
       |${pre}par AS MATERIALIZED (
       |  SELECT c.tenant, c.t, c.rep, c.sz, p.rep AS prep, p.w AS pw
       |  FROM ${pre}cs c
       |  JOIN ${pre}comp p ON p.tenant = c.tenant AND p.t = c.t - 1 AND p.id = c.rep),
       |${pre}bigk AS MATERIALIZED (
       |  SELECT tenant, t, prep, count(*) AS nbig
       |  FROM ${pre}par WHERE sz >= 3
       |  GROUP BY tenant, t, prep),
       |${pre}cl AS (
       |  SELECT tenant, CAST(1 AS BIGINT) AS t, rep, CAST(1 AS BIGINT) AS bt,
       |    rep AS brep, CAST(0 AS DOUBLE) AS blam,
       |    CAST(NULL AS BIGINT) AS par_bt, CAST(NULL AS BIGINT) AS par_brep
       |  FROM ${pre}cs WHERE t = 1 AND sz >= 3
       |  UNION ALL
       |  SELECT p.tenant, p.t, p.rep,
       |    CASE WHEN b.nbig >= 2 THEN p.t ELSE k.bt END,
       |    CASE WHEN b.nbig >= 2 THEN p.rep ELSE k.brep END,
       |    CASE WHEN b.nbig >= 2 THEN CAST(1 AS DOUBLE) / p.pw ELSE k.blam END,
       |    CASE WHEN b.nbig >= 2 THEN k.bt ELSE k.par_bt END,
       |    CASE WHEN b.nbig >= 2 THEN k.brep ELSE k.par_brep END
       |  FROM ${pre}cl k
       |  JOIN ${pre}par p ON p.tenant = k.tenant AND p.t = k.t + 1 AND p.prep = k.rep
       |  JOIN ${pre}bigk b ON b.tenant = p.tenant AND b.t = p.t AND b.prep = p.prep
       |  WHERE p.sz >= 3),
       |${pre}clm AS MATERIALIZED (SELECT * FROM ${pre}cl),
       |${pre}clusters AS MATERIALIZED (
       |  SELECT DISTINCT tenant, bt, brep, blam, par_bt, par_brep FROM ${pre}clm),
       |${pre}pc AS MATERIALIZED (
       |  SELECT c.tenant, c.t, c.w, c.id, c.rep, s.sz
       |  FROM ${pre}comp c
       |  JOIN ${pre}cs s ON s.tenant = c.tenant AND s.t = c.t AND s.rep = c.rep),
       |${pre}lastlvl AS MATERIALIZED (SELECT tenant, max(t) AS mt FROM ${pre}lvl GROUP BY tenant),
       |${pre}fall AS MATERIALIZED (
       |  SELECT a.tenant, a.id, a.t, a.rep,
       |    CASE WHEN a.t = ll.mt THEN CAST('infinity' AS DOUBLE)
       |         ELSE CAST(1 AS DOUBLE) / a.w END AS lam
       |  FROM ${pre}pc a
       |  JOIN ${pre}lastlvl ll ON ll.tenant = a.tenant
       |  LEFT JOIN ${pre}pc b ON b.tenant = a.tenant AND b.id = a.id AND b.t = a.t + 1
       |  WHERE a.sz >= 3 AND (a.t = ll.mt OR b.sz < 3)),
       |${pre}fallc AS MATERIALIZED (
       |  SELECT f.tenant, f.id, f.lam, k.bt, k.brep, k.blam
       |  FROM ${pre}fall f
       |  JOIN ${pre}clm k ON k.tenant = f.tenant AND k.t = f.t AND k.rep = f.rep),
       |${pre}ps AS MATERIALIZED (
       |  SELECT tenant, bt, brep,
       |    list_reduce(list(lam - blam ORDER BY id), (x, y) -> x + y) AS psum
       |  FROM ${pre}fallc GROUP BY tenant, bt, brep),
       |${pre}chs AS MATERIALIZED (
       |  SELECT c.tenant, c.par_bt AS bt, c.par_brep AS brep,
       |    c.blam AS clam, c.brep AS crep, s.sz, pk.blam AS pblam
       |  FROM ${pre}clusters c
       |  JOIN ${pre}clusters pk ON pk.tenant = c.tenant AND pk.bt = c.par_bt
       |    AND pk.brep = c.par_brep
       |  JOIN ${pre}cs s ON s.tenant = c.tenant AND s.t = c.bt AND s.rep = c.brep
       |  WHERE c.par_bt IS NOT NULL),
       |${pre}css AS MATERIALIZED (
       |  SELECT tenant, bt, brep,
       |    list_reduce(list((clam - pblam) * CAST(sz AS DOUBLE) ORDER BY crep),
       |      (x, y) -> x + y) AS csum
       |  FROM ${pre}chs GROUP BY tenant, bt, brep),
       |${pre}stab AS MATERIALIZED (
       |  SELECT c.tenant, c.bt, c.brep, c.blam, c.par_bt, c.par_brep,
       |    coalesce(p.psum, CAST(0 AS DOUBLE))
       |      + coalesce(s.csum, CAST(0 AS DOUBLE)) AS stab
       |  FROM ${pre}clusters c
       |  LEFT JOIN ${pre}ps p ON p.tenant = c.tenant AND p.bt = c.bt AND p.brep = c.brep
       |  LEFT JOIN ${pre}css s ON s.tenant = c.tenant AND s.bt = c.bt
       |    AND s.brep = c.brep),
       |${pre}emap AS MATERIALIZED (
       |  SELECT tenant, bt AS src_bt, brep AS src_brep, bt AS dst_bt,
       |    brep AS dst_brep, 0 AS iskid
       |  FROM ${pre}clusters
       |  UNION ALL
       |  SELECT tenant, bt, brep, par_bt, par_brep, 1 FROM ${pre}clusters
       |  WHERE par_bt IS NOT NULL),
       |${pre}ev AS (
       |  SELECT 0 AS it, tenant, bt, brep, stab AS e FROM ${pre}stab
       |  UNION ALL
       |  SELECT it + 1, tenant, dst_bt AS bt, dst_brep AS brep,
       |    greatest(any_value(dstab),
       |      coalesce(list_reduce(
       |        list(ce ORDER BY src_brep) FILTER (WHERE iskid = 1),
       |        (x, y) -> x + y), CAST(0 AS DOUBLE))) AS e
       |  FROM (
       |    SELECT v.it AS it, m.tenant AS tenant, m.dst_bt, m.dst_brep,
       |      m.src_brep, m.iskid, v.e AS ce, st.stab AS dstab
       |    FROM ${pre}ev v
       |    JOIN ${pre}emap m ON m.tenant = v.tenant AND m.src_bt = v.bt
       |      AND m.src_brep = v.brep
       |    JOIN ${pre}stab st ON st.tenant = m.tenant AND st.bt = m.dst_bt
       |      AND st.brep = m.dst_brep
       |    WHERE v.it < 64)
       |  GROUP BY it, tenant, dst_bt, dst_brep),
       |${pre}cesum AS MATERIALIZED (
       |  SELECT c.tenant, c.par_bt AS bt, c.par_brep AS brep,
       |    list_reduce(list(f.e ORDER BY c.brep), (x, y) -> x + y) AS csum
       |  FROM ${pre}clusters c
       |  JOIN ${pre}ev f ON f.it = 64 AND f.tenant = c.tenant AND f.bt = c.bt
       |    AND f.brep = c.brep
       |  WHERE c.par_bt IS NOT NULL
       |  GROUP BY c.tenant, c.par_bt, c.par_brep),
       |${pre}win AS MATERIALIZED (
       |  SELECT s.tenant, s.bt, s.brep, s.par_bt, s.par_brep,
       |    (s.stab >= coalesce(cs2.csum, CAST(0 AS DOUBLE))) AS selfwin
       |  FROM ${pre}stab s
       |  LEFT JOIN ${pre}cesum cs2 ON cs2.tenant = s.tenant AND cs2.bt = s.bt
       |    AND cs2.brep = s.brep),
       |${pre}seltree AS (
       |  SELECT tenant, bt, brep, selfwin, FALSE AS ancwin, TRUE AS isroot
       |  FROM ${pre}win WHERE par_bt IS NULL
       |  UNION ALL
       |  SELECT w.tenant, w.bt, w.brep, w.selfwin,
       |    s.ancwin OR (NOT s.isroot AND s.selfwin), FALSE
       |  FROM ${pre}seltree s
       |  JOIN ${pre}win w ON w.tenant = s.tenant AND w.par_bt = s.bt
       |    AND w.par_brep = s.brep),
       |${pre}under AS (
       |  SELECT tenant, bt, brep, bt AS s_bt, brep AS s_brep FROM ${pre}seltree
       |  WHERE NOT isroot AND selfwin AND NOT ancwin
       |  UNION ALL
       |  SELECT c.tenant, c.bt, c.brep, u.s_bt, u.s_brep
       |  FROM ${pre}under u
       |  JOIN ${pre}clusters c ON c.tenant = u.tenant AND c.par_bt = u.bt
       |    AND c.par_brep = u.brep),
       |${pre}plab AS MATERIALIZED (
       |  SELECT f.tenant, f.id, u.s_bt, u.s_brep
       |  FROM ${pre}fallc f
       |  JOIN ${pre}under u ON u.tenant = f.tenant AND u.bt = f.bt
       |    AND u.brep = f.brep),
       |${pre}cidx AS MATERIALIZED (
       |  SELECT tenant, s_bt, s_brep,
       |    row_number() OVER (PARTITION BY tenant ORDER BY min_id) - 1 AS cidx
       |  FROM (SELECT tenant, s_bt, s_brep, min(id) AS min_id FROM ${pre}plab
       |        GROUP BY tenant, s_bt, s_brep)),
       |${pre}assign AS (
       |  SELECT s.tenant, s.id, coalesce(x.cidx, -1) AS cluster_idx
       |  FROM $src s
       |  LEFT JOIN ${pre}plab p ON p.tenant = s.tenant AND p.id = s.id
       |  LEFT JOIN ${pre}cidx x ON x.tenant = p.tenant AND x.s_bt = p.s_bt
       |    AND x.s_brep = p.s_brep)""".stripMargin

  val oracles: Map[String, String] = Map(
    // C2 true-HDBSCAN mode under the exact gate (see hdbscanCte).
    "c2h_hdbscan_eom" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT label AS tenant, vec_id AS id, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |${hdbscanCte("e", "h_")}
         |SELECT CAST(tenant AS VARCHAR) AS tenant, id,
         |  CASE WHEN cluster_idx >= 0
         |       THEN 'cluster_' || tenant || '_' || cluster_idx
         |       ELSE 'noise' END AS cluster_id,
         |  cluster_idx::INT AS cluster_idx
         |FROM h_assign ORDER BY tenant, id""".stripMargin,
    // X5 true-HDBSCAN mode — stats over the same assignment.
    "x5h_clustering_hdbscan" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT label AS tenant, vec_id AS id, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |${hdbscanCte("e", "h_")},
         |named AS (
         |  SELECT CAST(tenant AS VARCHAR) AS tenant,
         |    CASE WHEN cluster_idx >= 0
         |         THEN 'cluster_' || tenant || '_' || cluster_idx
         |         ELSE 'noise' END AS cluster_id
         |  FROM h_assign)
         |SELECT tenant, cluster_id, count(*) AS n,
         |  CASE WHEN count(*) >= 3 THEN 'main'
         |       WHEN count(*) = 2 THEN 'small' ELSE 'excluded' END AS triage,
         |  least(0.95, 0.5 + CAST(count(*) AS DOUBLE) / 100.0) AS confidence
         |FROM named GROUP BY tenant, cluster_id
         |ORDER BY tenant, cluster_id""".stripMargin,
    // C7 true-HDBSCAN hierarchy — the replay twice: L0 over tenants,
    // L1 over L0 clusters of ≥ 8 members (tenant key = the L0 cluster
    // id string), sub-noise stays at L0.
    "c7h_hierarchical_hdbscan" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT label AS tenant, vec_id AS id, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |${hdbscanCte("e", "l0_")},
         |l0 AS (SELECT tenant, id, cluster_idx AS l0_idx FROM l0_assign),
         |lbig AS (
         |  SELECT tenant, l0_idx FROM l0 WHERE l0_idx >= 0
         |  GROUP BY tenant, l0_idx HAVING count(*) >= 8),
         |esub AS (
         |  SELECT 'cluster_' || l.tenant || '_' || l.l0_idx AS tenant, l.id, ev.emb
         |  FROM l0 l
         |  JOIN e ev ON ev.tenant = l.tenant AND ev.id = l.id
         |  JOIN lbig b ON b.tenant = l.tenant AND b.l0_idx = l.l0_idx),
         |${hdbscanCte("esub", "l1_")}
         |SELECT CAST(l.tenant AS VARCHAR) AS tenant, l.id,
         |  CASE WHEN a1.cluster_idx IS NOT NULL AND a1.cluster_idx >= 0
         |       THEN 'cluster_' || l.tenant || '_L0_' || l.l0_idx
         |            || '_L1_' || a1.cluster_idx
         |       WHEN l.l0_idx >= 0 THEN 'cluster_' || l.tenant || '_L0_' || l.l0_idx
         |       ELSE 'noise' END AS cluster_id,
         |  CASE WHEN a1.cluster_idx IS NOT NULL AND a1.cluster_idx >= 0
         |       THEN 'cluster_' || l.tenant || '_L0_' || l.l0_idx
         |       END AS parent_cluster_id,
         |  CASE WHEN a1.cluster_idx IS NOT NULL AND a1.cluster_idx >= 0
         |       THEN 1 ELSE 0 END AS level
         |FROM l0 l LEFT JOIN l1_assign a1 ON a1.id = l.id
         |ORDER BY l.id""".stripMargin,
    // C7 k-means hierarchy under the exact gate: L0 Lloyd (k=5) over
    // the whole population, clusters of ≥ 8 members re-clustered by a
    // second Lloyd replay (k=3) keyed per L0 cluster.
    "c7_hierarchical" ->
      s"""WITH RECURSIVE ebase AS (
         |  SELECT vec_id AS id, 'all' AS tenant, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |${kmeansCte(5, "ebase", "l0_")},
         |l0big AS (
         |  SELECT best FROM l0_kassign GROUP BY best HAVING count(*) >= 8),
         |esub AS (
         |  SELECT a.id, 'cluster_all_' || a.best AS tenant, p.emb
         |  FROM l0_kassign a
         |  JOIN ebase p ON p.id = a.id
         |  JOIN l0big b ON b.best = a.best),
         |${kmeansCte(3, "esub", "l1_")}
         |SELECT 'all' AS tenant, k0.id,
         |  CASE WHEN k1.best IS NOT NULL
         |       THEN 'cluster_all_L0_' || k0.best || '_L1_' || k1.best
         |       ELSE 'cluster_all_L0_' || k0.best END AS cluster_id,
         |  CASE WHEN k1.best IS NOT NULL
         |       THEN 'cluster_all_L0_' || k0.best END AS parent_cluster_id,
         |  CASE WHEN k1.best IS NOT NULL THEN 1 ELSE 0 END AS level
         |FROM l0_kassign k0 LEFT JOIN l1_kassign k1 ON k1.id = k0.id
         |ORDER BY k0.id""".stripMargin,
    // C2 k-means fallback under the exact gate (see kmeansCte).
    "c2_cluster_per_tenant" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id AS id, label AS tenant, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |${kmeansCte(3)}
         |SELECT CAST(tenant AS VARCHAR) AS tenant, id,
         |  'cluster_' || tenant || '_' || best AS cluster_id,
         |  best::INT AS cluster_idx
         |FROM kassign ORDER BY tenant, id""".stripMargin,
    // X5 — triage/confidence stats over the same k-means assignment.
    "x5_clustering_job" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id AS id, label AS tenant, embedding::DOUBLE[] AS emb
         |  FROM embeddings),
         |${kmeansCte(3)},
         |named AS (
         |  SELECT CAST(tenant AS VARCHAR) AS tenant,
         |    'cluster_' || tenant || '_' || best AS cluster_id
         |  FROM kassign)
         |SELECT tenant, cluster_id, count(*) AS n,
         |  CASE WHEN count(*) >= 3 THEN 'main'
         |       WHEN count(*) = 2 THEN 'small' ELSE 'excluded' END AS triage,
         |  least(0.95, 0.5 + CAST(count(*) AS DOUBLE) / 100.0) AS confidence
         |FROM named GROUP BY tenant, cluster_id
         |ORDER BY tenant, cluster_id""".stripMargin,
    // C2 FAITHFUL mode under the exact gate (see densityCompsCte).
    "c2b_density" ->
      s"""WITH RECURSIVE ${densityCompsCte("1.25")}
         |SELECT CAST(tenant_l AS VARCHAR) AS tenant, id,
         |  CASE WHEN cluster_idx >= 0
         |       THEN 'cluster_' || tenant_l || '_' || cluster_idx
         |       ELSE 'noise' END AS cluster_id,
         |  cluster_idx::INT AS cluster_idx
         |FROM assign ORDER BY tenant, id""".stripMargin,
    // X5 density mode — triage/confidence stats over the same
    // assignment relation.
    "x5b_clustering_density" ->
      s"""WITH RECURSIVE ${densityCompsCte("1.25")},
         |named AS (
         |  SELECT CAST(tenant_l AS VARCHAR) AS tenant,
         |    CASE WHEN cluster_idx >= 0
         |         THEN 'cluster_' || tenant_l || '_' || cluster_idx
         |         ELSE 'noise' END AS cluster_id
         |  FROM assign)
         |SELECT tenant, cluster_id, count(*) AS n,
         |  CASE WHEN count(*) >= 3 THEN 'main'
         |       WHEN count(*) = 2 THEN 'small' ELSE 'excluded' END AS triage,
         |  least(0.95, 0.5 + CAST(count(*) AS DOUBLE) / 100.0) AS confidence
         |FROM named GROUP BY tenant, cluster_id
         |ORDER BY tenant, cluster_id""".stripMargin,
    // C7 density mode — L0 components at eps 1.25, L1 refinement at
    // eps 1.15 inside L0 clusters of ≥ 8 members (noise never splits);
    // both levels are the same transitive-closure replay, L1 keyed by
    // (tenant, l0 cluster) and renumbered by smallest member id.
    "c7b_hierarchical_density" ->
      s"""WITH RECURSIVE ${densityCompsCte("1.25")},
         |l0 AS (SELECT tenant_l, id, cluster_idx AS l0_idx FROM assign),
         |big AS (
         |  SELECT tenant_l, l0_idx FROM l0 WHERE l0_idx >= 0
         |  GROUP BY tenant_l, l0_idx HAVING count(*) >= 8),
         |members AS (
         |  SELECT l.tenant_l, l.l0_idx, l.id, ev.emb
         |  FROM l0 l
         |  JOIN e ev ON ev.vec_id = l.id AND ev.label = l.tenant_l
         |  JOIN big b ON b.tenant_l = l.tenant_l AND b.l0_idx = l.l0_idx),
         |pairs1 AS (
         |  SELECT a.tenant_l, a.l0_idx, a.id AS a_id, b.id AS b_id
         |  FROM members a JOIN members b
         |    ON a.tenant_l = b.tenant_l AND a.l0_idx = b.l0_idx AND a.id < b.id
         |  WHERE sqrt(list_reduce(
         |      list_transform(range(1, 65),
         |        j -> (a.emb[j] - b.emb[j]) * (a.emb[j] - b.emb[j])),
         |      (x, y) -> x + y)) <= '1.15'::DOUBLE),
         |edges1 AS (
         |  SELECT tenant_l, l0_idx, a_id AS a, b_id AS b FROM pairs1
         |  UNION ALL SELECT tenant_l, l0_idx, b_id, a_id FROM pairs1),
         |walk1 AS (
         |  SELECT DISTINCT tenant_l, l0_idx, a AS node, a AS reach FROM edges1
         |  UNION
         |  SELECT w.tenant_l, w.l0_idx, w.node, x.b AS reach
         |  FROM walk1 w JOIN edges1 x
         |    ON x.tenant_l = w.tenant_l AND x.l0_idx = w.l0_idx AND x.a = w.reach),
         |comps1 AS (
         |  SELECT tenant_l, l0_idx, node, min(reach) AS comp FROM walk1
         |  GROUP BY tenant_l, l0_idx, node),
         |surviving1 AS (
         |  SELECT tenant_l, l0_idx, comp, min(node) AS min_id FROM comps1
         |  GROUP BY tenant_l, l0_idx, comp HAVING count(*) >= 3),
         |idx1 AS (
         |  SELECT tenant_l, l0_idx, comp,
         |    (row_number() OVER (PARTITION BY tenant_l, l0_idx ORDER BY min_id) - 1) AS cidx
         |  FROM surviving1),
         |assign1 AS (
         |  SELECT m.tenant_l, m.l0_idx, m.id, i.cidx AS l1_idx
         |  FROM members m
         |  LEFT JOIN comps1 c
         |    ON c.tenant_l = m.tenant_l AND c.l0_idx = m.l0_idx AND c.node = m.id
         |  LEFT JOIN idx1 i
         |    ON i.tenant_l = c.tenant_l AND i.l0_idx = c.l0_idx AND i.comp = c.comp),
         |final AS (
         |  SELECT l.tenant_l, l.id, l.l0_idx, a1.l1_idx
         |  FROM l0 l LEFT JOIN assign1 a1
         |    ON a1.tenant_l = l.tenant_l AND a1.id = l.id)
         |SELECT CAST(tenant_l AS VARCHAR) AS tenant, id,
         |  CASE WHEN l1_idx IS NOT NULL AND l1_idx >= 0
         |       THEN 'cluster_' || tenant_l || '_L0_' || l0_idx || '_L1_' || l1_idx
         |       WHEN l0_idx >= 0 THEN 'cluster_' || tenant_l || '_L0_' || l0_idx
         |       ELSE 'noise' END AS cluster_id,
         |  CASE WHEN l1_idx IS NOT NULL AND l1_idx >= 0
         |       THEN 'cluster_' || tenant_l || '_L0_' || l0_idx END AS parent_cluster_id,
         |  CASE WHEN l1_idx IS NOT NULL AND l1_idx >= 0 THEN 1 ELSE 0 END AS level
         |FROM final ORDER BY id""".stripMargin,
    "c4_cluster_labels" ->
      """SELECT label, rnk, tok, n FROM (
        |  SELECT label, tok, count(*) AS n,
        |         row_number() OVER (PARTITION BY label ORDER BY count(*) DESC, tok ASC) AS rnk
        |  FROM (
        |    SELECT e.label, unnest(list_filter(string_split(d.text, ' '), t -> t <> '')) AS tok
        |    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id)
        |  GROUP BY label, tok)
        |WHERE rnk <= 3 ORDER BY label, rnk""".stripMargin,
    "c5_small_labels" ->
      """WITH kw AS (
        |  SELECT doc_id // 2 AS pair_id, doc_id,
        |    CASE WHEN (doc_id // 2) % 5 = 0 THEN []::VARCHAR[]
        |         ELSE list_filter(string_split(text, ' '), t -> t <> '')[1:3] END AS kws
        |  FROM documents),
        |agg AS (
        |  SELECT pair_id,
        |    list_sort(list_distinct(flatten(list(kws)))) AS kw_set,
        |    min(doc_id) AS min_id, CAST(count(*) AS BIGINT) AS n
        |  FROM kw GROUP BY pair_id)
        |SELECT pair_id, n,
        |  CASE WHEN len(kw_set) > 0 THEN array_to_string(kw_set[1:2], ' · ')
        |       WHEN pair_id % 10 <> 5 THEN substr('doc_' || min_id, 1, 10)
        |       ELSE '其他項目' END AS label_text
        |FROM agg ORDER BY pair_id""".stripMargin,
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
