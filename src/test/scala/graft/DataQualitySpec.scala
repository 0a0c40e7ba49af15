package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DataQuality
import graft.operators.DataQuality._

class DataQualitySpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("validate: every metric exact on a hand-built table with planted violations") {
    val df = Seq(
      (1L, Option("a"), 5.0),
      (2L, Option.empty[String], -1.0), // null name, negative v
      (2L, Option("b"), 3.0)            // duplicate id
    ).toDF("id", "name", "v")
    val ref = Seq(1L, 3L).toDF("k") // id=2 (twice) unresolvable
    val rows = DataQuality.validate(df, Seq(
      SizeAtLeast("size", 2.0),
      Completeness("name_complete", "name", 1.0),
      Uniqueness("id_unique", Seq("id"), 1.0),
      Compliance("v_positive", col("v") > 0, 0.5),
      Referential("id_resolves", "id", ref, "k", 1.0)
    )).collect().map(r => r.getString(0) ->
      ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap

    assert(rows("size") == ((3L, 3.0, 2.0, 1L)))
    assert(rows("name_complete") == ((3L, 2.0 / 3.0, 1.0, 0L)))
    assert(rows("id_unique") == ((3L, 2.0 / 3.0, 1.0, 0L)))
    assert(rows("v_positive") == ((3L, 2.0 / 3.0, 0.5, 1L))) // 2/3 >= 0.5
    assert(rows("id_resolves") == ((3L, 1.0 / 3.0, 1.0, 0L)))
  }

  test("dq_validate: the orders suite passes every constraint on TPC-H-shaped data") {
    val rows = SparkEntry.queries("dq_validate")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(rows.length == 9)
    // TPC-H guarantees: keys unique, FKs resolve, domains hold
    val failed = rows.filter(_.getLong(5) != 1L).map(_.getString(0))
    assert(failed.isEmpty, s"failed checks: ${failed.mkString(",")}")
    // every metric except the size check is a fraction in [0,1]
    assert(rows.filter(_.getString(1) != "SizeAtLeast")
      .forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // one shared n_rows for all row-local checks
    assert(rows.map(_.getLong(2)).distinct.length == 1)
  }

  test("a26_anomaly_robust: med/MAD match a driver-side replay; flags follow the 3-sigma rule") {
    val rows = SparkEntry.queries("a26_anomaly_robust")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    val ns = rows.map(_.getLong(1)).sorted
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      (s((s.length - 1) / 2) + s(s.length / 2)) / 2.0
    }
    val med = median(ns.map(_.toDouble))
    val mad = median(ns.map(n => math.abs(n - med)))
    rows.foreach { r =>
      assert(r.getDouble(2) == med, s"med ${r.getDouble(2)} != replay $med")
      assert(r.getDouble(3) == mad, s"mad ${r.getDouble(3)} != replay $mad")
      val expectFlag =
        if (mad == 0.0) 0L
        else if (math.abs(r.getLong(1) - med) > 3.0 * 1.4826 * mad) 1L else 0L
      assert(r.getLong(5) == expectFlag, s"day ${r.getString(0)}")
      if (mad != 0.0)
        assert(r.getDouble(4) == (r.getLong(1) - med) / (1.4826 * mad))
    }
  }

  test("dq_histogram_drift: edges, buckets and L1 equal an exact driver-side replay") {
    val rows = SparkEntry.queries("dq_histogram_drift")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "value", "event_id", "dayofmonth(ts) as dom")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    val byType = ev.groupBy(_._1)
    rows.foreach { r =>
      val t = r.getString(0)
      val all = byType(t)
      val a = all.filter(_._4 <= 15).sortBy(x => (x._2, x._3))
      val b = all.filter(_._4 > 15)
      assert(r.getLong(1) == a.length.toLong && r.getLong(2) == b.length.toLong)
      val nA = a.length
      val edges = (1 to 3).map(k => a((k * nA) / 4 - 1)._2) // rn is 1-based
      def bkt(v: Double): Int = edges.indexWhere(v <= _) match {
        case -1 => 3; case i => i
      }
      val cA = (0 to 3).map(i => a.count(x => bkt(x._2) == i).toLong)
      val cB = (0 to 3).map(i => b.count(x => bkt(x._2) == i).toLong)
      val num = (0 to 3).map(i => math.abs(cA(i) * b.length - cB(i) * a.length)).sum
      assert(r.getDouble(3) == num.toDouble / (a.length.toLong * b.length).toDouble,
        s"drift mismatch for $t")
    }
  }

  test("ta_bootstrap_ci: replicate means equal an exact driver-side md5 replay") {
    val row = SparkEntry.queries("ta_bootstrap_ci")(spark, sf).collect().head
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(b: Int, id: Long): Double = {
      val hex = md.digest(s"bs:$b:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val hBig = hex.take(13).foldLeft(0L)((acc, c) =>
        acc * 16 + (if (c >= 'a') c - 'a' + 10 else c - '0'))
      (hBig + 1).toDouble / 4503599627370496.0
    }
    val cdf = Array(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
      0.9999167588507119, 0.9999897508033253)
    def w(uu: Double): Long = { val i = cdf.indexWhere(uu < _); if (i < 0) 8L else i.toLong }
    val means = (0 until 64).map { b =>
      val ws = docs.map { case (id, n) => (w(u(b, id)), n) }
      ws.map(p => p._1 * p._2).sum.toDouble / ws.map(_._1).sum.toDouble
    }.sorted
    assert(row.getLong(0) == docs.length.toLong)
    assert(row.getLong(2) == 64L)
    assert(row.getDouble(3) == means(1), "ci_lo")        // rank 2
    assert(row.getDouble(4) == (means(31) + means(32)) / 2.0, "ci_med")
    assert(row.getDouble(5) == means(62), "ci_hi")       // rank 63
    assert(row.getDouble(1) ==
      docs.map(_._2).sum.toDouble / docs.length.toDouble)
  }

  test("x13_entity_resolution: fused golden records are internally consistent") {
    val rows = SparkEntry.queries("x13_entity_resolution")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (comp, nMembers, rep, nSources) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nMembers >= 2L, s"comp $comp: singleton survived the edge filter")
      assert(comp <= rep, s"comp label is the min member id, rep can't precede it")
      assert(nSources >= 1L && nSources <= nMembers)
      assert(r.getString(4).nonEmpty) // fused language list
      assert(r.getLong(5) > 0L)       // total_chars
    }
    // verified edges are a subset of candidate edges, so the docs that
    // reach an entity are a subset of dd_components' clustered docs
    val candClustered = SparkEntry.queries("dd_components")(spark, sf).count()
    spark.catalog.clearCache()
    assert(rows.map(_.getLong(1)).sum <= candClustered)
  }
}
