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

  test("ivf filtered search: predicate respected, full-probe filtered == filtered brute force") {
    val base = Tables.embeddings(spark, d).withColumn("tenant", lit("all"))
    val q = Tables.embeddings(spark, d).filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toSeq
    val indexed = Search.ivfBuild(base, "tenant", "vec_id", "embedding", 16).cache()
    val centroids = Search.ivfCentroids(indexed).cache()
    val got = Search.ivfSearch(indexed.filter($"id" % 8 === 3), centroids, "all", q, 10, 16)
      .select("id").as[Long].collect()
    assert(got.nonEmpty && got.forall(_ % 8 == 3))
    val brute = Search.knn(Tables.embeddings(spark, d).filter($"vec_id" % 8 === 3), q, 10, 0.0)
      .select("vec_id").as[Long].collect()
    assert(got.toSet == brute.toSet) // all cells probed ⇒ filter commutes with probe
    // partial probe stays inside the predicate too
    val partial = Search.ivfSearch(indexed.filter($"id" % 8 === 3), centroids, "all", q, 10, 4)
      .select("id").as[Long].collect()
    assert(partial.forall(_ % 8 == 3))
  }

  test("ivf index written partitioned by cell gets partition-pruned scans") {
    // The 100 TB serving path: vectors written partitioned by cell so a
    // probe scans only nProbe directories. Assert the physical plan
    // prunes partitions (PartitionFilters on cell, not a full scan).
    val base = Tables.embeddings(spark, d).withColumn("tenant", lit("all"))
    val indexed = Search.ivfBuild(base, "tenant", "vec_id", "embedding", 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    indexed.write.mode("overwrite").partitionBy("cell").parquet(dir)

    val reread = spark.read.parquet(dir).filter($"cell".isin(0, 1))
    val plan = reread.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected cell partition pruning in plan:\n$plan")
    // pruned scan reads a strict subset of rows
    val pruned = reread.count()
    assert(pruned > 0 && pruned < 500, s"pruned scan read $pruned rows")
  }
}
