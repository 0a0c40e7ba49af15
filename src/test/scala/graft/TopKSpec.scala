package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{ScoredRow, TopK, TopKAggregator}

class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  test("TopKAggregator equals the window top-k on real data") {
    val d = "/root/testdata/sf0.001"
    val viaAgg = Tables.orders(spark, d)
      .select($"o_custkey", $"o_totalprice", $"o_orderkey")
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => ScoredRow(t._2, t._3))
      .agg(TopK.topK(3).name("top"))
      .toDF("k", "top")
      .select($"k", explode($"top").as("r"))
      .select($"k", $"r.id", $"r.score")
      .as[(Long, Long, Double)].collect().toSet

    val viaWindow = Tables.orders(spark, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSet

    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("primitiveTopK equals the typed aggregator, ties and partial groups included") {
    val d = "/root/testdata/sf0.001"
    val base = Tables.orders(spark, d)
      .select($"o_custkey" % 7, $"o_totalprice", $"o_orderkey") // few groups, many rows each
      .as[(Long, Double, Long)]
    val viaAgg = base
      .groupByKey(_._1)
      .mapValues(t => ScoredRow(t._2, t._3))
      .agg(TopK.topK(5).name("top"))
      .toDF("g", "top")
      .select($"g", explode($"top").as("r"))
      .select($"g", $"r.id", $"r.score")
      .as[(Long, Long, Double)].collect().toSet
    val viaPrim = TopK.primitiveTopK(base, 5)
      .select($"g", explode($"top").as("r"))
      .select($"g", $"r.id", $"r.score")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaPrim == viaAgg)
    assert(viaPrim.nonEmpty)
    // synthetic ties + a group smaller than k: exact expected set
    val tiny = Seq((1L, 2.0, 9L), (1L, 2.0, 3L), (1L, 2.0, 5L), (1L, 1.0, 1L),
      (2L, 0.0, 7L)).toDS()
    val got = TopK.primitiveTopK(tiny, 2)
      .select($"g", explode($"top").as("r"))
      .select($"g", $"r.score", $"r.id")
      .as[(Long, Double, Long)].collect().toSet
    assert(got == Set((1L, 2.0, 3L), (1L, 2.0, 5L), (2L, 0.0, 7L)))
  }

  test("TopKAggregator is merge-order independent and bounded") {
    val agg = new TopKAggregator(2)
    val rows = Seq(ScoredRow(1.0, 5L), ScoredRow(3.0, 1L), ScoredRow(3.0, 0L),
      ScoredRow(2.0, 9L), ScoredRow(0.5, 2L))
    // every split point of the stream must give the same final top-2
    val expected = Seq(ScoredRow(3.0, 0L), ScoredRow(3.0, 1L))
    for (cut <- 0 to rows.length) {
      val (a, b) = rows.splitAt(cut)
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bufA, bufB)) == expected, s"cut=$cut")
      assert(agg.finish(agg.merge(bufB, bufA)) == expected, s"cut=$cut reversed")
    }
  }

  test("typed top-k agg plan is partial-aggregatable (no full-table window sort)") {
    val d = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("w6_topk_agg")(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      s"top-k agg must not fall back to a window:\n$plan")
  }
}
