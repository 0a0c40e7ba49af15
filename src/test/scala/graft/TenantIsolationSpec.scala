package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SyntheticVec
import graft.operators.{Clustering, Search}

/** SURVEY §5 calls owner isolation "the single most-tested property
  * in the reference" (`test_vector_db_api.py:442-472`). Adversarial
  * twin fixture: tenants a and b hold IDENTICAL vector sets under
  * disjoint ids — a cross-tenant leak changes results silently, so
  * every assertion pins "only this tenant's ids, every output row
  * tagged with its input tenant", and the twin symmetry doubles as a
  * determinism check (identical inputs must cluster identically). */
class TenantIsolationSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark

  // 2 × 40 identical vectors: tenant a ids 0..39, tenant b ids 1000..1039
  private lazy val twins: DataFrame = {
    val s = spark
    import s.implicits._
    (for {
      (t, base) <- Seq(("a", 0L), ("b", 1000L))
      i <- 0 until 40
    } yield (t, base + i, SyntheticVec.vecLocal(i.toLong, 16).toSeq))
      .toDF("tenant", "id", "embedding")
  }
  private def idsOf(t: String): Set[Long] =
    if (t == "a") (0L until 40L).toSet else (1000L until 1040L).toSet

  test("per-tenant clustering (k-means, density, hdbscan): members never cross tenants") {
    val modes = Seq[DataFrame => DataFrame](
      df => Clustering.clusterPerTenant(df, "tenant", "id", "embedding", 3),
      df => Clustering.clusterPerTenantDbscan(df, "tenant", "id", "embedding", 2.0),
      df => Clustering.clusterPerTenantHdbscan(df, "tenant", "id", "embedding"))
    for (mode <- modes) {
      val out = mode(twins).collect()
      assert(out.length == 80)
      out.foreach { r =>
        val (t, id, cid) = (r.getString(0), r.getLong(1), r.getString(2))
        assert(idsOf(t).contains(id), s"row $r leaked across tenants")
        if (cid != "noise") assert(cid.startsWith(s"cluster_${t}_"), r.toString)
      }
      val a = out.filter(_.getString(0) == "a").map(r => (r.getLong(1), r.getInt(3))).toMap
      val b = out.filter(_.getString(0) == "b")
        .map(r => (r.getLong(1) - 1000L, r.getInt(3))).toMap
      assert(a == b, "identical twin tenants must cluster identically")
    }
  }

  test("IVF build/assign/search stay inside the tenant") {
    val indexed = Search.ivfBuild(twins, "tenant", "id", "embedding", 4).cache()
    indexed.collect().foreach { r =>
      assert(idsOf(r.getString(0)).contains(r.getLong(1)), r.toString)
    }
    val centroids = Search.ivfCentroids(indexed)
    val q = SyntheticVec.vecLocal(3L, 16).toSeq
    val hits = Search.ivfSearch(indexed, centroids, "a", q, 5, 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.subsetOf(idsOf("a")), s"ivfSearch leaked: $hits")
    val sampled = Search.ivfBuildSampled(twins, "tenant", "id", "embedding", 4,
      sampleCap = 32)
    sampled.collect().foreach { r =>
      assert(idsOf(r.getString(0)).contains(r.getLong(1)), r.toString)
    }
    spark.catalog.clearCache()
  }

  test("batched IVF search serves only the queried tenant") {
    val cents = Search.ivfTrainSampled(twins, "tenant", "id", "embedding", 4,
      sampleCap = 32)
    val indexed = Search.ivfAssign(twins, "tenant", "id", "embedding", cents)
    val qs = Seq(0L, 1L, 2L).map(i =>
      i -> SyntheticVec.vecLocal(i, 16).toSeq)
    // tenant b holds IDENTICAL vectors (sim ties corpus-wide): any
    // cross-tenant candidate admission would change the id sets
    val hits = Search.ivfSearchBatch(indexed, cents, "a", qs, 5, 2,
        threshold = -1e9)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.subsetOf(idsOf("a")),
      s"ivfSearchBatch leaked across tenants: $hits")
    // incremental maintenance keeps per-tenant assignment too
    val inc = Search.ivfAssignWithDist(twins, "tenant", "id", "embedding", cents)
    inc.collect().foreach { r =>
      assert(idsOf(r.getString(0)).contains(r.getLong(1)), r.toString)
    }
  }

  test("hierarchical clustering keeps L1 refinement inside the tenant") {
    val out = Clustering.hierarchicalClusterBy(twins, "tenant", "id", "embedding",
      Clustering.clusterPerTenantHdbscan(_, _, _, _),
      Clustering.clusterPerTenantHdbscan(_, _, _, _), minForSplit = 8).collect()
    assert(out.length == 80)
    out.foreach { r =>
      val (t, id, cid) = (r.getString(0), r.getLong(1), r.getString(2))
      assert(idsOf(t).contains(id), s"row $r leaked")
      if (cid != "noise") assert(cid.startsWith(s"cluster_${t}_"), r.toString)
    }
  }

  test("PQ train/encode/search stay inside the tenant") {
    import graft.operators.{ProductQuantization => PQ}
    // identical twins ⇒ identical per-tenant codebooks (determinism)
    // and zero cross-tenant rows anywhere in the PQ path
    val books = PQ.pqTrainSampled(twins, "tenant", "id", "embedding", 2, 3, 64)
    assert(books.keySet == Set("a", "b"))
    assert(books("a").map(_.map(_.toSeq).toSeq).toSeq ==
      books("b").map(_.map(_.toSeq).toSeq).toSeq,
      "twin tenants must train identical codebooks")
    val enc = PQ.pqEncode(twins, "tenant", "id", "embedding", books).cache()
    enc.collect().foreach { r =>
      assert(idsOf(r.getString(0)).contains(r.getLong(1)), s"encode leaked: $r")
    }
    val q = SyntheticVec.vecLocal(3L, 16).toSeq
    for (t <- Seq("a", "b")) {
      val hits = PQ.pqSearch(enc, twins, books, t, q, 5, 20, threshold = -1e9)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(hits.nonEmpty && hits.subsetOf(idsOf(t)), s"pqSearch($t) leaked: $hits")
    }
    enc.unpersist()
    spark.catalog.clearCache()
  }

  test("driver v1_knn_isolation: the cross-tenant bait never surfaces") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("v1_knn_isolation")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == 3, s"non-tenant row surfaced: $r")
      assert(r.getLong(0) < 50000, s"bait row leaked: $r")
    }
    spark.catalog.clearCache()
  }

  test("label-blocked dedup pairs stay within one tenant") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dd_embedding_neardup")(spark, d)
    val e = Tables.embeddings(spark, d).select(col("vec_id"), col("label"))
    val joined = out
      .join(e.select(col("vec_id").as("id_a"), col("label").as("la")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("label").as("lb")), Seq("id_b"))
    assert(joined.filter(col("la") =!= col("lb") || col("la") =!= col("label"))
      .count() == 0, "near-dup pair crossed tenants")
    spark.catalog.clearCache()
  }
}
