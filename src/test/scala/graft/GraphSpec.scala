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
}
