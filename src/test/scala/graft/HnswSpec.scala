package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Hnsw
import graft.functions.VectorFunctions.dot

/** HNSW-lite graph ANN tier: deterministic levels, blocked kNN edges,
  * beam-walk search (operators.Hnsw). */
class HnswSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionHelper.spark
  private val sf = "/root/testdata/sf0.001"

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private def qv(id: Long): Seq[Double] =
    vecs.filter(col("vec_id") === id).head().getSeq[Double](1)

  test("build is deterministic and the level ladder is well-formed") {
    val v = vecs.persist()
    val e1 = Hnsw.build(v).collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val e2 = Hnsw.build(v).collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(e1 == e2, "non-deterministic build")
    // every level present, node population shrinks as the level rises
    // (geometric p=1/2 ladder), and edges are symmetric by construction
    val byLvl = e1.groupBy(_._1)
    assert(byLvl.keySet == (0 to Hnsw.MaxLevel).toSet)
    val nodesPerLvl = (0 to Hnsw.MaxLevel).map(l =>
      byLvl(l).flatMap(e => Seq(e._2, e._3)).size)
    assert(nodesPerLvl.head > nodesPerLvl.last,
      s"level ladder not thinning: $nodesPerLvl")
    e1.foreach { case (l, s, d) => assert(e1((l, d, s)), s"asymmetric edge $l $s->$d") }
    // levels come from the hash, never exceed the cap
    val lvls = v.select(Hnsw.levelCol(col("vec_id"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(lvls.max <= Hnsw.MaxLevel && lvls.min == 0)
    // ladder health: most level-0 nodes are navigable (have an edge)
    val n = v.count()
    val withEdges = byLvl(0).map(_._2).size
    assert(withEdges >= (n * 0.9).toInt,
      s"level-0 graph too sparse: $withEdges of $n nodes have edges")
    v.unpersist(); spark.catalog.clearCache()
  }

  test("search: k ranked rows, sims descending, deterministic, and recall@10 vs brute force >= 0.8") {
    val v = vecs.persist()
    val adj = Hnsw.build(v).persist()
    val q = qv(0)
    val a = Hnsw.search(v, adj, q).collect()
    val b = Hnsw.search(v, adj, q).collect()
    assert(a.map(_.getLong(1)).sameElements(b.map(_.getLong(1))), "non-deterministic search")
    assert(a.length == 10 && a.map(_.getLong(0)).sameElements(1L to 10L))
    val sims = a.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    // brute-force truth for recall
    val exact = v.withColumn("sim", dot(col("embedding"), typedLit(q)))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = a.map(_.getLong(1)).count(exact) / 10.0
    assert(recall >= 0.8, s"recall@10 $recall below 0.8")
    adj.unpersist(); v.unpersist(); spark.catalog.clearCache()
  }

  test("seeded batch search: an exhaustive seed with no descent IS brute force; seeded descent deterministic") {
    val v = vecs.persist()
    val adj = Hnsw.build(v).persist()
    import spark.implicits._
    val qids = Seq(0L, 5L)
    val queries = qids.map(i => (i, qv(i))).toDF("q_id", "q_emb")
    // degenerate contract: seed pool = whole corpus, no descent →
    // exactly the brute-force top-k (pins the seed scan + final rank)
    val seeded = Hnsw.searchBatchSeeded(v, adj, queries, v, seedWidth = 10,
        k = 10, sched = Nil)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    qids.foreach { q =>
      val brute = v.withColumn("sim", dot(col("embedding"), typedLit(qv(q))))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSeq
      assert(seeded(q) == brute, s"seeded-no-descent != brute for q $q")
    }
    // sparse seed + descent: deterministic, k ranked rows per query
    val pool = v.filter(Hnsw.levelCol(col("vec_id")) >= 1)
    val sched = Seq((1, 16), (0, 24), (0, 24))
    val a = Hnsw.searchBatchSeeded(v, adj, queries, pool, 8, 10, sched).collect()
    val b = Hnsw.searchBatchSeeded(v, adj, queries, pool, 8, 10, sched).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(2))).sameElements(
      b.map(r => (r.getLong(0), r.getLong(2)))), "non-deterministic seeded search")
    assert(a.count(_.getLong(0) == 0L) == 10)
    adj.unpersist(); v.unpersist(); spark.catalog.clearCache()
  }

  test("incremental maintenance is bit-equal to a rebuild for additions AND removals") {
    val v = vecs.persist()
    val base = v.filter(col("vec_id") % 9 =!= 0)
    val cohort = v.filter(col("vec_id") % 9 === 0)
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // additions: base graph + maintain(cohort) == full rebuild
    val dBase = Hnsw.buildDirected(base).localCheckpoint()
    val addMaintained = edgeSet(Hnsw.maintainDirected(v, dBase, cohort))
    val fullRebuild = edgeSet(Hnsw.buildDirected(v))
    assert(addMaintained == fullRebuild,
      s"add-maintained != rebuild: ${(addMaintained -- fullRebuild).take(3)} / " +
        s"${(fullRebuild -- addMaintained).take(3)}")
    // removals: full graph - maintain(cohort out) == base rebuild
    val dFull = Hnsw.buildDirected(v).localCheckpoint()
    val rmMaintained = edgeSet(Hnsw.maintainDirected(base, dFull, cohort))
    val baseRebuild = edgeSet(Hnsw.buildDirected(base))
    assert(rmMaintained == baseRebuild,
      s"remove-maintained != rebuild: ${(rmMaintained -- baseRebuild).take(3)} / " +
        s"${(baseRebuild -- rmMaintained).take(3)}")
    // the maintenance only RECOMPUTED the churned blocks: most
    // unaffected srcs' edges must be the VERBATIM old rows (sanity
    // that the delta path, not a hidden rebuild, produced the result)
    assert((addMaintained & edgeSet(dBase)).size > addMaintained.size / 3)
    v.unpersist(); spark.catalog.clearCache()
  }

  test("batch search equals the single-query walk for every query") {
    val v = vecs.persist()
    val adj = Hnsw.build(v).persist()
    val qids = Seq(0L, 5L, 11L)
    import spark.implicits._
    val queries = qids.map(i => (i, qv(i))).toDF("q_id", "q_emb")
    val batch = Hnsw.searchBatch(v, adj, queries).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    qids.foreach { q =>
      val single = Hnsw.search(v, adj, qv(q)).collect().map(_.getLong(1)).toSeq
      assert(batch(q) == single, s"batch/single divergence for query $q")
    }
    adj.unpersist(); v.unpersist(); spark.catalog.clearCache()
  }
}
