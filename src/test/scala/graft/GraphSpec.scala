package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank over the deterministic fixture link graph (operators.Graph). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionHelper.spark
  private val sf = "/root/testdata/sf0.001"

  private def run() = {
    val df = SparkEntry.queries("gr_pagerank")(spark, sf)
    val rows = df.collect()
    spark.catalog.clearCache()
    rows
  }

  test("ranks form a probability distribution (no dangling mass)") {
    val rows = run()
    assert(rows.length == 500)
    val sum = rows.map(_.getDouble(1)).sum
    assert(math.abs(sum - 1.0) < 1e-9, s"rank sum $sum")
    // teleport floor: no rank below 0.15/N
    val floor = 0.15 / 500
    assert(rows.forall(_.getDouble(1) >= floor - 1e-15))
  }

  test("structure drives rank: output is rank-ordered and in-degree correlates") {
    val rows = run()
    // ordered by pagerank DESC with doc_id tiebreak
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // the top decile's mean in-degree exceeds the bottom decile's:
    // contributions, not noise, set the ordering
    val top = rows.take(50).map(_.getLong(3)).sum.toDouble / 50
    val bot = rows.takeRight(50).map(_.getLong(3)).sum.toDouble / 50
    assert(top > bot, s"top-decile in_deg $top vs bottom $bot")
    // every node keeps outdeg >= 1 (the ring edge)
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("deterministic across runs (bit-identical ranks)") {
    val a = run().map(r => (r.getLong(0), r.getDouble(1)))
    val b = run().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.sameElements(b))
  }

  private def runLpa() = {
    val df = SparkEntry.queries("gr_labelprop")(spark, sf)
    val rows = df.collect()
    spark.catalog.clearCache()
    rows
  }

  test("label propagation: labels are node ids, sizes partition the graph") {
    val rows = runLpa()
    assert(rows.length == 500)
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids == (0L until 500L).toSet)
    // every community label is itself a node id (labels only ever copy)
    val labels = rows.map(_.getLong(1)).toSet
    assert(labels.subsetOf(ids))
    // propagation actually merged communities vs the singleton init
    assert(labels.size < 500, s"${labels.size} communities")
    // csize is the exact member count of each community, and the
    // sizes partition the node universe
    val bySize = rows.groupBy(_.getLong(1))
    rows.foreach { r =>
      assert(r.getLong(2) == bySize(r.getLong(1)).length.toLong)
    }
    assert(bySize.values.map(_.length).sum == 500)
  }

  test("label propagation: deterministic across runs (bit-identical labels)") {
    val a = runLpa().map(r => (r.getLong(0), r.getLong(1)))
    val b = runLpa().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("triangles: per-node counts sum to 3x the total; matches a local recount") {
    val rows = SparkEntry.queries("gr_triangles")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    val total = rows.head._3
    assert(total > 0, "fixture graph must contain triangles")
    assert(rows.map(_._2).sum == 3 * total, "each triangle touches 3 nodes")
    // local recount over the same fixture edges
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"))
    val und = graft.operators.Graph.edges(docs, 500)
      .collect().map(r => {
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }).toSet
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var cnt = 0L
    for ((a, b) <- und; c <- adj.getOrElse(b, Set.empty))
      if (und.contains((a, c))) cnt += 1
    spark.catalog.clearCache()
    assert(cnt == total, s"local recount $cnt vs $total")
  }

  test("kcore: 12 rounds reach the fixpoint (round 13 changes nothing); every member keeps >= 5 core neighbors") {
    val r12 = graft.operators.Graph.kcore(spark, sf, k = 5, iters = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    spark.catalog.clearCache()
    val r13 = graft.operators.Graph.kcore(spark, sf, k = 5, iters = 13)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    spark.catalog.clearCache()
    assert(r12 == r13, "peeling not converged at 12 rounds")
    assert(r12.nonEmpty, "fixture graph must have a non-empty 5-core")
    assert(r12.values.forall(_ >= 5), "a 5-core member with < 5 core neighbors")
    // a genuine split: something peripheral was peeled away
    val n = Tables.documents(spark, sf).count()
    spark.catalog.clearCache()
    assert(r12.size < n, "peel removed nothing - fixture degenerate")
  }

  test("kcore pre-convergence: output keeps EVERY survivor (incl. recount < k and 0), matching a driver-side peel") {
    // k and iters are parameters; before the fixpoint a last-round
    // survivor can recount BELOW k (even to 0) against the final
    // survivor set — it must appear with that degree, not be dropped
    // by an inner join (the SQL oracle emits it).
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"))
    val sym = {
      val e = graft.operators.Graph.edges(docs, 500)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      (e ++ e.map(_.swap)).toSet
    }
    spark.catalog.clearCache()
    val adj = sym.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    for ((k, iters) <- Seq((6, 1), (6, 2), (7, 1))) {
      var alive = (0L until 500L).toSet
      for (_ <- 1 to iters)
        alive = alive.filter(u => adj(u).count(alive) >= k)
      val expected = alive.map(u => u -> adj(u).count(alive).toLong).toMap
      val got = graft.operators.Graph.kcore(spark, sf, k = k, iters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      spark.catalog.clearCache()
      assert(got == expected,
        s"k=$k iters=$iters: spark ${got.size} rows vs sim ${expected.size} " +
          s"(missing: ${(expected.keySet -- got.keySet).take(5)})")
    }
  }
}
