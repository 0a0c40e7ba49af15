package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ByidStore, ProductQuantization => PQ, Search, Serving, ServingState}

/** Persisted serving state: driver-side maps round-trip bit-exactly,
  * a directory-loaded state routes and serves identically to the
  * in-memory one, and the byid-backed rescore makes post-churn serving
  * read the MAINTAINED bytes, never a stale base. */
class ServingStateSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  private val d = "/root/testdata/sf0.01"

  private lazy val e = Tables.embeddings(spark, d)
    .select(col("vec_id").cast("long").as("id"),
      col("embedding").cast("array<double>").as("embedding"))
    .withColumn("tenant", lit("all"))
  private lazy val cents =
    Search.ivfTrainSampled(e, "tenant", "id", "embedding", 16, sampleCap = 256)
  private lazy val books =
    PQ.pqTrainSampled(e, "tenant", "id", "embedding", 4, 8, 256)
  private lazy val assigned =
    Search.ivfAssign(e, "tenant", "id", "embedding", cents)
  private lazy val encCells =
    PQ.pqEncode(e, "tenant", "id", "embedding", books)
      .join(assigned.select(col("tenant"), col("id"), col("cell")),
        Seq("tenant", "id"))
  private lazy val qs = {
    val ids = Seq(0L, 1L, 2L)
    ids.zip(ids.map(i => e.filter(col("id") === i)
      .select("embedding").head().getSeq[Double](0).toSeq))
  }

  private def buildDir(): String = {
    val dir = Files.createTempDirectory("graft-svstate-").toString
    ByidStore.init(e.select("id", "embedding", "tenant"), "id", s"$dir/byid",
      nFiles = 4)
    assigned.write.mode("overwrite").parquet(s"$dir/cells")
    encCells.write.mode("overwrite").parquet(s"$dir/encoded")
    ServingState.saveAssets(spark, dir, Some(cents), Some(books),
      corpusSize = e.count(), encodedHasCells = true)
    dir
  }

  test("centroids and codebooks round-trip bit-exactly") {
    val dir = buildDir()
    val c2 = ServingState.loadCentroids(spark, s"$dir/centroids")
    assert(c2.keySet == cents.keySet)
    assert(c2("all").map(_.toSeq).toSeq == cents("all").map(_.toSeq).toSeq)
    val b2 = ServingState.loadCodebooks(spark, s"$dir/codebooks")
    assert(b2("all").map(_.map(_.toSeq).toSeq).toSeq ==
      books("all").map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("directory-loaded state routes IVF-PQ and serves identically to in-memory") {
    val dir = buildDir()
    val st = ServingState.load(spark, dir)
    assert(Serving.route(st, bruteForceCeiling = 0) == Serving.IvfPqTier)
    val got = Serving.searchBatch(st, "all", qs, k = 5, nProbe = 4,
        rescoreK = 50, bruteForceCeiling = 0)
      .select("q_id", "rank", "id", "sim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val mem = Serving.IndexState(vectors = e, corpusSize = e.count(),
      centroids = Some(cents), cells = Some(assigned),
      codebooks = Some(books), encoded = Some(encCells),
      encodedHasCells = true, idCol = "id", embCol = "embedding")
    val want = Serving.searchBatch(mem, "all", qs, k = 5, nProbe = 4,
        rescoreK = 50, bruteForceCeiling = 0)
      .select("q_id", "rank", "id", "sim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("post-churn serving rescores through the maintained byid store, not a stale base") {
    import spark.implicits._
    val dir = buildDir()
    // pre-churn: query = vec 0's own embedding → exact self-hit at rank 1
    val st0 = ServingState.load(spark, dir)
    val q0 = Seq((0L, qs.head._2))
    val pre = Serving.searchBatch(st0, "all", q0, k = 3, nProbe = 4,
      rescoreK = 50, bruteForceCeiling = 0).collect()
    assert(pre.head.getAs[Long]("id") == 0L, "pre-churn self-hit missing")
    // churn ONLY the byid store: vec 0's embedding becomes its negation
    // (codes/cells stay stale — the candidate generator may still
    // surface id 0, but the rescore must see the NEW bytes)
    val newEmb = qs.head._2.map(x => -x)
    val add = Seq((0L, newEmb, "all")).toDF("id", "embedding", "tenant")
    ByidStore.applyCdc(spark, s"$dir/byid", Seq(0L).toDF("id"), add, "id")
    val st1 = ServingState.load(spark, dir)
    val post = Serving.searchBatch(st1, "all", q0, k = 3, nProbe = 4,
      rescoreK = 50, bruteForceCeiling = 0).collect()
    // dot(q, -q) = -|q|² < 0 < threshold 0.0: id 0 cannot survive the
    // rescore — a stale base would still serve it at rank 1
    assert(!post.exists(_.getAs[Long]("id") == 0L),
      "stale base bytes served after churn")
  }
}
