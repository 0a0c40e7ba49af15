package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Search

class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  // 4 docs × (1 summary + 1 chunk); unit vectors in 4-d space.
  private def fixture = Seq(
    // vec_id, label(doc), embedding
    (0L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)), // summary doc0
    (2L, 1, Array(0.0f, 1.0f, 0.0f, 0.0f)), // summary doc1
    (4L, 2, Array(0.6f, 0.8f, 0.0f, 0.0f)), // summary doc2
    (6L, 3, Array(0.0f, 0.0f, 1.0f, 0.0f)), // summary doc3
    (1L, 0, Array(0.8f, 0.6f, 0.0f, 0.0f)), // chunk doc0
    (3L, 1, Array(0.0f, 0.6f, 0.8f, 0.0f)), // chunk doc1
    (5L, 2, Array(1.0f, 0.0f, 0.0f, 0.0f)), // chunk doc2
    (7L, 3, Array(0.0f, 0.0f, 0.0f, 1.0f))  // chunk doc3
  ).toDF("vec_id", "label", "embedding")

  private val q = Seq(1.0, 0.0, 0.0, 0.0)

  test("knn: exact ordering, threshold, k") {
    val r = Search.knn(fixture, q, 3, 0.5).select("vec_id").as[Long].collect()
    // sims: v0=1.0, v5=1.0, v1=0.8, v4=0.6 → threshold .5, k=3, tiebreak vec_id
    assert(r.toSeq == Seq(0L, 5L, 1L))
  }

  test("tenant isolation: owner-filtered knn over a partitioned store prunes partitions") {
    // The reference's most-tested property (SURVEY §5: multi-user
    // isolation): a tenant-scoped search over an owner-partitioned
    // vector store must (a) return ONLY that tenant's rows and (b) plan
    // as a partition-pruned scan, not a full scan + filter.
    val dir = java.nio.file.Files.createTempDirectory("graft_tenants").toString + "/vectors"
    val two = fixture.withColumn("owner",
        when(col("label") < 2, "tenant_a").otherwise("tenant_b"))
    two.write.partitionBy("owner").parquet(dir)

    val store = spark.read.parquet(dir).filter(col("owner") === "tenant_a")
    val hits = Search.knn(store, q, 10, -1.0)
    assert(hits.select("owner").distinct().as[String].collect().toSeq == Seq("tenant_a"))
    assert(hits.count() == 4) // all 4 tenant_a vectors, none of tenant_b

    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tenant_a"),
      s"expected owner partition pruning in:\n$plan")
  }

  test("keepBestPerDoc keeps max-sim row per label") {
    val scored = fixture.withColumn("sim",
      graft.functions.VectorFunctions.dot(col("embedding"), typedLit(q)))
    val r = Search.keepBestPerDoc(scored).select("label", "vec_id")
      .as[(Int, Long)].collect().toMap
    assert(r(0) == 0L) // sim 1.0 beats chunk 0.8
    assert(r(2) == 5L) // chunk 1.0 beats summary 0.6
  }

  test("twoStage: chunk results restricted to summary candidates") {
    val summaries = fixture.filter($"vec_id" % 2 === 0)
    val chunks = fixture.filter($"vec_id" % 2 === 1)
    val r = Search.twoStage(summaries, chunks, q, 2, 4, 0.0)
      .select("vec_id").as[Long].collect().toSet
    // stage1 top-2 summaries: v0 (1.0), v4 (0.6) → labels {0, 2}
    // stage2 chunks of labels {0,2}: v1, v5
    assert(r == Set(1L, 5L))
  }

  test("rrfFusion: hand-computed RRF scores") {
    val summaries = fixture.filter($"vec_id" % 2 === 0)
    val chunks = fixture.filter($"vec_id" % 2 === 1)
    val r = Search.rrfFusion(summaries, chunks, q, 4, 4)
      .select("label", "rrf_score").as[(Int, Double)].collect().toMap
    // summary ranks: v0(1.0)→1, v4(.6)→2, v2(0)→3, v6(0)→4 (tiebreak id)
    // chunk ranks:   v5(1.0)→1, v1(.8)→2, v3(0)→3, v7(0)→4
    val exp0 = 0.4 / 61 + 0.6 / 62 // doc0: s_rank 1, c_rank 2
    val exp2 = 0.4 / 62 + 0.6 / 61 // doc2: s_rank 2, c_rank 1
    assert(math.abs(r(0) - exp0) < 1e-15)
    assert(math.abs(r(2) - exp2) < 1e-15)
    // chunks weighted higher (0.6) ⇒ doc2 outranks doc0
    assert(r(2) > r(0))
  }

  test("multiQueryMerge: positional weights, keep max per doc") {
    val qs = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val r = Search.multiQueryMerge(fixture, qs, Seq(1.3, 1.1), 8, 4)
      .select("label", "wsim").as[(Int, Double)].collect().toMap
    // doc0: best of {1.3*1.0 (q0,v0), 1.1*0.6 (q1,v1)} = 1.3
    assert(math.abs(r(0) - 1.3) < 1e-15)
    // doc1: best of {1.3*0 , 1.1*1.0 (q1,v2)} = 1.1
    assert(math.abs(r(1) - 1.1) < 1e-15)
  }

  test("rerankDedupBackfill: dedups stage-2, backfills unseen stage-1 docs in score order") {
    import org.apache.spark.sql.Row
    // stage2: two chunks of doc0 (keep max), one chunk of doc1 → 2 docs
    val stage2 = Seq((1L, 0, 0.9), (11L, 0, 0.7), (3L, 1, 0.5)).toDF("vec_id", "label", "sim")
    // stage1: docs 0,1 already seen; docs 2 (0.8) and 3 (0.6) backfill in score order
    val stage1 = Seq((0L, 0, 0.95), (2L, 1, 0.85), (4L, 2, 0.8), (6L, 3, 0.6))
      .toDF("vec_id", "label", "sim")
    val r = Search.rerankDedupBackfill(stage2, stage1, 4)
      .select("label", "vec_id", "sim", "src").collect().toSeq
    assert(r == Seq(Row(0, 1L, 0.9, 0), Row(1, 3L, 0.5, 0),
      Row(2, 4L, 0.8, 1), Row(3, 6L, 0.6, 1)))
    // k small enough that dedup alone fills the page → no backfill rows
    val r2 = Search.rerankDedupBackfill(stage2, stage1, 2)
      .select("label", "src").collect().toSeq
    assert(r2 == Seq(Row(0, 0), Row(1, 0)))
  }

  test("v14_late_interaction: maxsim sums the per-subvector bests, ranked desc") {
    val rows = SparkEntry.queries("v14_late_interaction")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 10)
    // every doc saw all 3 query subvectors, and ranking is by score desc
    assert(rows.forall(_._2 == 3L))
    assert(rows.map(_._3).sliding(2).forall(p => p.head >= p.last - 1e-12))
    // maxsim dominates any single-subvector score for the same doc:
    // lis >= max single dot for the top doc (sum of maxes >= one max)
    assert(rows.head._3 >= rows.last._3)
  }

  test("diversityRerank: floor admits, overlap rejects") {
    val results = Array(
      (1L, 0.9, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, 0.8, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup words
      (3L, 0.7, "one two three four five six seven eight nine ten"),
      (4L, 0.6, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup again
      (5L, 0.5, "uno dos tres cuatro cinco seis siete ocho nueve diez"))
    val picked = Search.diversityRerank(results, 4)
    val ids = picked.map(_._1).toSeq
    // floor = max(3, 2) = 3 → first three admitted regardless; 4th dup rejected, 5 admitted
    assert(ids == Seq(1L, 2L, 3L, 5L))
  }
}
