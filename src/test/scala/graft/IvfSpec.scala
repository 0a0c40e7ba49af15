package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Search

class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("ivf: full-probe search is exactly brute force; partial probe has high recall") {
    val base = Tables.embeddings(spark, d).withColumn("tenant", lit("all"))
    val q = Tables.embeddings(spark, d).filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toSeq

    val indexed = Search.ivfBuild(base, "tenant", "vec_id", "embedding", 16).cache()
    assert(indexed.count() == 500)
    // cells partition the population
    assert(indexed.select("cell").distinct().count() <= 16)
    val centroids = Search.ivfCentroids(indexed).cache()

    val brute = Search.knn(Tables.embeddings(spark, d), q, 10, 0.0)
      .select("vec_id").as[Long].collect().toSet
    val full = Search.ivfSearch(indexed, centroids, "all", q, 10, 16)
      .select("id").as[Long].collect().toSet
    assert(full == brute) // probing all cells == exact

    val partial = Search.ivfSearch(indexed, centroids, "all", q, 10, 4)
      .select("id").as[Long].collect().toSet
    assert(partial.intersect(brute).size >= 6, s"recall too low: ${partial.intersect(brute).size}/10")
    // population actually spreads over multiple cells (pruning is real:
    // nProbe=4 of k cells scans a strict subset)
    val cellSizes = indexed.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(cellSizes.size >= 4)
    val largest4 = cellSizes.values.toSeq.sorted.reverse.take(4).sum
    assert(largest4 < 500, s"4 largest cells hold $largest4/500 — no pruning")
  }
}
