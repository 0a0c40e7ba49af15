package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Search

/** Batched multi-query serving (`Search.knnBatch` / `ivfSearchBatch`):
  * one corpus scan + partial-aggregated top-k must return EXACTLY the
  * per-query loop's results, and the batch plan must not sort-shuffle
  * the exploded corpus (the aggregator, not a window, does top-k). */
class BatchAnnSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, d)

  private def qset(ids: Seq[Long]): Seq[(Long, Seq[Double])] = {
    val m = emb.filter($"vec_id".isin(ids: _*))
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    ids.map(i => i -> m(i))
  }

  test("knnBatch == per-query knn loop, rank for rank") {
    val qs = qset(Seq(0L, 7L, 42L))
    val batch = Search.knnBatch(emb, qs, 8, threshold = 0.0)
      .select("q_id", "rank", "vec_id", "sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val loop = qs.flatMap { case (qid, qv) =>
      Search.knn(emb, qv, 8, 0.0)
        .select("vec_id", "sim").collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(1)) }
    }
    assert(batch.toSeq == loop,
      s"batch path diverged from the per-query loop")
  }

  test("knnBatch large batch (broadcast-join path) == per-query knn loop") {
    // >64 queries switches from the plan-literal generator to the
    // broadcast cross join (ADVICE r7: literal plan size grows with Q);
    // results must be identical rank-for-rank either way.
    val ids = (0L until 70L)
    val qs = qset(ids)
    val batch = Search.knnBatch(emb, qs, 5, threshold = 0.0)
      .select("q_id", "rank", "vec_id", "sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val loop = qs.flatMap { case (qid, qv) =>
      Search.knn(emb, qv, 5, 0.0)
        .select("vec_id", "sim").collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(1)) }
    }
    assert(batch.toSeq == loop,
      "broadcast-join batch path diverged from the per-query loop")
  }

  test("knnBatch excludeSelf drops exactly the query's own row") {
    val qs = qset(Seq(3L))
    val withSelf = Search.knnBatch(emb, qs, 5, Double.NegativeInfinity)
      .select("vec_id").as[Long].collect().toSeq
    val noSelf = Search.knnBatch(emb, qs, 5, Double.NegativeInfinity,
        excludeSelf = true)
      .select("vec_id").as[Long].collect().toSeq
    // vec 3 dotted with itself is the max (normalized) — rank 1
    assert(withSelf.head == 3L && !noSelf.contains(3L))
    // the rest of the ranking is unchanged, shifted up one slot
    assert(noSelf.take(4) == withSelf.tail && noSelf.size == 5)
  }

  test("ivfSearchBatch == per-query pruned scan, and scans only the probed union") {
    val base = emb
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
      .withColumn("tenant", lit("all"))
    val cents = Search.ivfTrainSampled(base, "tenant", "vec_id", "embedding",
      16, sampleCap = 256)
    val indexed = Search.ivfAssign(base, "tenant", "vec_id", "embedding", cents)
      .cache()
    val qs = qset(Seq(0L, 1L, 2L))
    val batch = Search.ivfSearchBatch(indexed, cents, "all", qs, 10, 4)
      .select("q_id", "rank", "id", "sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val loop = qs.flatMap { case (qid, qv) =>
      val cells = Search.ivfProbeCells(cents, "all", qv, 4)
      Search.knn(indexed.filter($"cell".isin(cells: _*)), qv, 10, 0.0,
          idCol = "id", embCol = "embedding")
        .select("id", "sim").collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(1)) }
    }
    assert(batch.toSeq == loop)
    indexed.unpersist()
  }

  test("ann_ivf_incremental accounts for every vector and flags only heavy cells") {
    val rows = SparkEntry.queries("ann_ivf_incremental")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    val n = emb.count()
    assert(rows.map(_._4).sum == n, "per-cell totals must cover the corpus")
    assert(rows.exists(_._3 > 0) && rows.forall(_._5 >= 0.0))
    val tot = rows.map(_._4).sum
    rows.foreach { case (cell, _, _, nt, _, flag) =>
      assert(flag == (if (nt * 16 > tot * 2) 1 else 0), s"cell $cell flag wrong")
    }
  }

  test("ivfAssignWithDist matches ivfAssign cell-for-cell") {
    val base = emb
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
      .withColumn("tenant", lit("all"))
    val cents = Search.ivfTrainSampled(base, "tenant", "vec_id", "embedding",
      16, sampleCap = 256)
    val a = Search.ivfAssign(base, "tenant", "vec_id", "embedding", cents)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    val b = Search.ivfAssignWithDist(base, "tenant", "vec_id", "embedding", cents)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("knnBatch plan has no window exec — top-k is the partial aggregator") {
    val qs = qset(Seq(0L, 1L))
    val plan = Search.knnBatch(emb, qs, 5, 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"batch kNN must not sort-shuffle corpus×Q rows through a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a typed partial aggregation in:\n$plan")
  }
}
