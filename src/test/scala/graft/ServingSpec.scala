package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ProductQuantization => PQ, Search, Serving}
import graft.operators.Serving._

/** The stats-driven tier router: the decision matrix is pinned per
  * index state (mirroring v10_route_strategy's logical-router gate),
  * and every tier's routed output must equal the direct tier call
  * under the router's normalized (q_id, rank, id, sim, tier) schema. */
class ServingSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  private val d = "/root/testdata/sf0.01"

  private lazy val e = Tables.embeddings(spark, d)
    .select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    .withColumn("tenant", lit("all"))
  private lazy val n = e.count()
  private lazy val cents =
    Search.ivfTrainSampled(e, "tenant", "vec_id", "embedding", 16, sampleCap = 256)
  private lazy val assigned =
    Search.ivfAssign(e, "tenant", "vec_id", "embedding", cents)
  private lazy val books =
    PQ.pqTrainSampled(e, "tenant", "vec_id", "embedding", 4, 8, 256)
  private lazy val enc =
    PQ.pqEncode(e, "tenant", "vec_id", "embedding", books)
  private lazy val encCells = enc
    .join(assigned.select(col("tenant"), col("id"), col("cell")), Seq("tenant", "id"))
  private lazy val words =
    Serving.signPackAll(e, "tenant", "vec_id", "embedding", 64)
  private lazy val qs = {
    val ids = Seq(0L, 1L, 2L)
    ids.zip(ids.map(i => e.filter(col("vec_id") === i)
      .head().getSeq[Double](1).toSeq))
  }

  private def st(centroidsOn: Boolean = false, cellsOn: Boolean = false,
                 codesOn: Boolean = false, withCells: Boolean = false,
                 wordsOn: Boolean = false): IndexState =
    IndexState(vectors = e, corpusSize = n,
      centroids = if (centroidsOn) Some(cents) else None,
      cells = if (cellsOn) Some(assigned) else None,
      codebooks = if (codesOn) Some(books) else None,
      encoded = if (codesOn) Some(if (withCells) encCells else enc) else None,
      encodedHasCells = withCells,
      signWords = if (wordsOn) Some(words) else None,
      idCol = "vec_id", embCol = "embedding")

  test("routing decision matrix") {
    // full state → IVF-PQ; partial states walk the ladder
    assert(route(st(centroidsOn = true, cellsOn = true, codesOn = true,
      withCells = true), bruteForceCeiling = 0) == IvfPqTier)
    assert(route(st(centroidsOn = true, cellsOn = true, codesOn = true),
      bruteForceCeiling = 0) == IvfTier) // codes without cells don't compound
    assert(route(st(centroidsOn = true, cellsOn = true),
      bruteForceCeiling = 0) == IvfTier)
    assert(route(st(codesOn = true), bruteForceCeiling = 0) == PqTier)
    assert(route(st(wordsOn = true), bruteForceCeiling = 0) == HammingTier)
    assert(route(st(), bruteForceCeiling = 0) == BruteForceTier)
    // small corpus → brute even with every asset present
    assert(route(st(centroidsOn = true, cellsOn = true, codesOn = true,
      withCells = true), bruteForceCeiling = n) == BruteForceTier)
    // exact recall contract → brute regardless of assets
    assert(route(st(centroidsOn = true, cellsOn = true, codesOn = true,
      withCells = true), recallFloor = 1.0, bruteForceCeiling = 0) == BruteForceTier)
  }

  private def rows(df: DataFrame): Seq[(Long, Int, Long)] =
    df.select(col("q_id"), col("rank").cast("int"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))

  test("routed brute force equals knnBatch; schema is normalized") {
    val got = searchBatch(st(), "all", qs, k = 5, bruteForceCeiling = 0)
    assert(got.columns.toSeq == Seq("q_id", "rank", "id", "sim", "tier"))
    assert(got.select("tier").distinct().head().getString(0) == "brute_force")
    val want = Search.knnBatch(e, qs, 5, 0.0, "vec_id", "embedding")
      .select(col("q_id"), col("rank"), col("vec_id").as("id"))
    assert(rows(got) == rows(want.withColumn("rank", col("rank"))))
  }

  test("routed IVF equals ivfSearchBatch") {
    val got = searchBatch(st(centroidsOn = true, cellsOn = true), "all", qs,
      k = 5, nProbe = 4, bruteForceCeiling = 0)
    assert(got.select("tier").distinct().head().getString(0) == "ivf")
    val want = Search.ivfSearchBatch(assigned, cents, "all", qs, 5, 4)
    assert(rows(got) == rows(want))
  }

  test("routed PQ equals pqSearchBatch") {
    val got = searchBatch(st(codesOn = true), "all", qs, k = 5,
      rescoreK = 50, bruteForceCeiling = 0)
    assert(got.select("tier").distinct().head().getString(0) == "pq")
    val want = PQ.pqSearchBatch(enc, e, books, "all", qs, 5, 50,
        idCol = "vec_id", embCol = "embedding")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("id").asc)))
    assert(rows(got) == rows(want))
  }

  test("routed IVF-PQ equals ivfpqSearchBatch") {
    val got = searchBatch(st(centroidsOn = true, cellsOn = true,
      codesOn = true, withCells = true), "all", qs, k = 5, nProbe = 4,
      rescoreK = 50, bruteForceCeiling = 0)
    assert(got.select("tier").distinct().head().getString(0) == "ivf_pq")
    val want = PQ.ivfpqSearchBatch(encCells, e, books, cents, "all", qs, 5, 50, 4,
        idCol = "vec_id", embCol = "embedding")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("id").asc)))
    assert(rows(got) == rows(want))
  }

  test("residual codes route to the IVFADC scorer, never the flat PQ scan") {
    val cents = Search.ivfTrainSampled(e, "tenant", "vec_id", "embedding", 16,
      sampleCap = 256)
    val rBooks = PQ.pqTrainResidualSampled(e, "tenant", "vec_id", "embedding",
      cents, 4, 8, 256)
    val encR = PQ.pqEncodeResidual(e, "tenant", "vec_id", "embedding", cents, rBooks)
    // residual codes WITHOUT centroids cannot be scored — route must
    // not pick the flat PQ tier
    val noCents = IndexState(vectors = e, corpusSize = n,
      codebooks = Some(rBooks), encoded = Some(encR), residualCodes = true,
      idCol = "vec_id", embCol = "embedding")
    assert(route(noCents, bruteForceCeiling = 0) == BruteForceTier)
    // full residual state → IVF-PQ tier, served by ivfadcSearchBatch
    val full = IndexState(vectors = e, corpusSize = n,
      centroids = Some(cents), cells = Some(assigned),
      codebooks = Some(rBooks), encoded = Some(encR),
      encodedHasCells = true, residualCodes = true,
      idCol = "vec_id", embCol = "embedding")
    val got = searchBatch(full, "all", qs, k = 5, nProbe = 4, rescoreK = 50,
      bruteForceCeiling = 0)
    assert(got.select("tier").distinct().head().getString(0) == "ivf_pq")
    val want = PQ.ivfadcSearchBatch(encR, e, rBooks, cents, "all", qs, 5, 50, 4,
        idCol = "vec_id", embCol = "embedding")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("id").asc)))
    assert(rows(got) == rows(want))
  }

  test("hamming tier: exact self-hit at rank 1, k rows per query, exact rescored sims") {
    val got = searchBatch(st(wordsOn = true), "all", qs, k = 5,
      rescoreK = 50, bruteForceCeiling = 0)
    assert(got.select("tier").distinct().head().getString(0) == "hamming")
    val byQ = got.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    // each query vector is in the corpus: Hamming 0 to itself → the
    // coarse pass must surface it and the exact rescore ranks it first
    qs.foreach { case (qid, _) =>
      val top = byQ(qid).minBy(_.getInt(1))
      assert(top.getLong(2) == qid, s"query $qid self-hit missing")
      assert(byQ(qid).length == 5)
    }
    // sims are EXACT dots (rescored), not sketch approximations
    val sim00 = byQ(0L).minBy(_.getInt(1)).getDouble(3)
    val want = qs.head._2.map(x => x * x).sum
    assert(math.abs(sim00 - want) < 1e-9)
  }

  test("single-query search equals a batch of one") {
    val state = st(centroidsOn = true, cellsOn = true, codesOn = true,
      withCells = true)
    val got = Serving.search(state, "all", qs.head._2, k = 5,
        nProbe = 4, bruteForceCeiling = 0)
      .select("rank", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val want = searchBatch(state, "all", Seq((0L, qs.head._2)), k = 5,
        nProbe = 4, bruteForceCeiling = 0)
      .select("rank", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == want && got.size == 5)
  }

  test("signPackLocal matches signPackAll on corpus rows") {
    val packed = words.filter(col("id") < 5).orderBy("id").collect()
      .map(r => r.getLong(1) -> r.getSeq[Long](2).toSeq).toMap
    (0L until 5L).foreach { i =>
      val v = e.filter(col("vec_id") === i).head().getSeq[Double](1).toSeq
      assert(Serving.signPackLocal(v) == packed(i), s"row $i")
    }
  }
}
