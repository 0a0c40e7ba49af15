package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Search}

class HierarchySpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  test("hierarchicalCluster: L1 children link to existing L0 parents") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("tenant", lit("all"))
    val r = Clustering.hierarchicalCluster(df, "tenant", "vec_id", "embedding", 4, 2)
      .cache()
    assert(r.count() == 500) // every vector assigned
    val l1 = r.filter($"level" === 1)
    assert(l1.count() > 0)
    // every parent_cluster_id of an L1 row is a prefix of its cluster_id
    assert(l1.filter(!$"cluster_id".startsWith($"parent_cluster_id")).count() == 0)
    // L0 rows have no parent
    assert(r.filter($"level" === 0 && $"parent_cluster_id".isNotNull).count() == 0)
  }

  test("clusteringJob: triage and confidence columns consistent") {
    val r = Clustering.clusteringJob(
      Tables.embeddings(spark, "/root/testdata/sf0.001"), "label", "vec_id", "embedding", 3)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n")
      val conf = row.getAs[Double]("confidence")
      assert(conf == math.min(0.95, 0.5 + n / 100.0))
      val triage = row.getAs[String]("triage")
      assert(if (n >= 3) triage == "main" else if (n == 2) triage == "small" else triage == "excluded")
    }
  }

  test("withFallback: empty primary falls back to relaxed knn") {
    val vectors = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 1, Array(0.9f, 0.1f))
    ).toDF("vec_id", "label", "embedding")
    val q = Seq(1.0, 0.0)
    // primary with impossible threshold → empty → fallback at 0.9*0.7
    val r = Search.withFallback(
      Search.knn(vectors, q, 5, 2.0), vectors, q, 5, 0.9)
    assert(r.count() == 2) // both pass threshold 0.63
    // failing primary (exception) also falls back
    def boom: org.apache.spark.sql.DataFrame = throw new RuntimeException("boom")
    val r2 = Search.withFallback(boom, vectors, q, 5, 0.9)
    assert(r2.count() == 2)
    // a plan that BUILDS fine but fails at EXECUTION time must also
    // fall back (the V12 degradation case): udf throws on evaluation.
    val bomb = udf((x: Long) => if (x >= -1) throw new RuntimeException("exec") else 0L)
    val execFail = vectors.withColumn("sim", bomb($"vec_id").cast("double"))
    val r3 = Search.withFallback(execFail, vectors, q, 5, 0.9)
    assert(r3.count() == 2)
  }
}
