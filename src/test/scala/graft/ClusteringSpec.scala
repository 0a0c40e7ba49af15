package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  private def blob(cx: Double, cy: Double, ids: Range): Array[(Long, Array[Double])] =
    ids.map(i => (i.toLong, Array(cx + 0.01 * (i % 3), cy + 0.01 * (i % 5)))).toArray

  test("localKMeans separates well-separated blobs deterministically") {
    val pts = blob(0, 0, 0 until 10) ++ blob(10, 10, 10 until 20) ++ blob(0, 10, 20 until 30)
    val r1 = Clustering.localKMeans(pts, 3)
    val r2 = Clustering.localKMeans(pts.reverse, 3) // order-independent (sorted inside)
    assert(r1.toSeq == r2.toSeq)
    val byCluster = r1.groupBy(_._2)
    assert(byCluster.size == 3)
    // each blob lands in exactly one cluster
    Seq(0 until 10, 10 until 20, 20 until 30).foreach { blk =>
      val labels = r1.filter(p => blk.contains(p._1.toInt)).map(_._2).toSet
      assert(labels.size == 1)
    }
  }

  test("localKMeans: noise threshold labels far points -1") {
    val pts = blob(0, 0, 0 until 10) :+ (99L, Array(1000.0, 1000.0))
    val r = Clustering.localKMeans(pts, 1, 10, noiseThreshold = 50.0)
    assert(r.find(_._1 == 99L).get._2 == -1)
    assert(r.filter(_._1 != 99L).forall(_._2 == 0))
  }

  test("localKMeans: k larger than points, empty input") {
    assert(Clustering.localKMeans(Array.empty, 3).isEmpty)
    val r = Clustering.localKMeans(blob(0, 0, 0 until 2), 5)
    assert(r.length == 2 && r.forall(_._2 >= 0))
  }

  test("clusterPerTenant: tenants isolated, ids namespaced") {
    val df = (0 until 20).map { i =>
      val tenant = if (i < 10) "t1" else "t2"
      (tenant, i.toLong, Array.fill(4)(if (i % 2 == 0) 1.0f else -1.0f))
    }.toDF("owner", "vec_id", "embedding")
    val r = Clustering.clusterPerTenant(df, "owner", "vec_id", "embedding", 2)
      .select("tenant", "cluster_id").as[(String, String)].collect()
    assert(r.forall { case (t, cid) => cid.startsWith(s"cluster_${t}_") })
    val perTenant = r.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(perTenant("t1").size == 2 && perTenant("t2").size == 2)
  }
}
