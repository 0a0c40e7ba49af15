package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipelines.IndexPipeline
import graft.functions.HashEmbedder

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "The quick brown fox jumps over the lazy dog. " * 30, "t1", "en"),
    (1L, "short doc", "t1", "en"),
    (2L, "這是中文的句子。" * 100, "t2", "zh"),
    (3L, "", "t2", "en")
  ).toDF("doc_id", "text", "source", "lang").withColumn("n_chars", length($"text"))

  test("buildIndex: one summary per doc + chunks; normalized embeddings") {
    val vecs = IndexPipeline.buildIndex(docs, new HashEmbedder(32)).cache()
    val summaries = vecs.filter($"vtype" === "summary")
    assert(summaries.count() == 4)
    // long docs chunk into multiple rows; short/empty into ≤1
    val chunkCounts = vecs.filter($"vtype" === "chunk")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(chunkCounts(0L) > 1 && chunkCounts(2L) > 1)
    assert(!chunkCounts.contains(3L)) // empty text → no chunks
    // chunk_index is dense from 0 and total_chunks consistent
    val bad = vecs.filter($"vtype" === "chunk")
      .groupBy("doc_id").agg(max("chunk_index").as("mx"), count(lit(1)).as("n"),
        max("total_chunks").as("tc"))
      .filter($"mx" =!= $"n" - 1 || $"tc" =!= $"n")
    assert(bad.count() == 0)
    // embeddings unit-normalized (or zero)
    val norms = vecs.select(aggregate(transform($"embedding", x => x * x),
      lit(0.0), (a, x) => a + x).as("ss")).as[Double].collect()
    assert(norms.forall(ss => math.abs(ss - 1.0) < 1e-9 || ss == 0.0))
  }

  test("writeVectors: partitioned by owner, dynamic overwrite preserves other tenants") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecs").toString
    val vecs = IndexPipeline.buildIndex(docs, new HashEmbedder(16))
    IndexPipeline.writeVectors(vecs, dir)
    val n1 = spark.read.parquet(dir).count()
    assert(n1 == vecs.count())
    // overwrite only tenant t1 with a re-index of doc 1 → t2 rows intact
    val t1only = IndexPipeline.buildIndex(docs.filter($"source" === "t1"), new HashEmbedder(16))
    IndexPipeline.writeVectors(t1only, dir)
    val after = spark.read.parquet(dir)
    assert(after.filter($"owner" === "t2").count() ==
      vecs.filter($"owner" === "t2").count())
  }
}
