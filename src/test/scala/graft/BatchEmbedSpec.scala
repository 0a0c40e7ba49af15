package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BatchEmbed, Embedder, EmbedderAsBackend, EmbedderBackend,
  EmbedderHandle, HashEmbedder}
import graft.pipelines.IndexPipeline

/** Accumulator-instrumented backend: counts handle opens/closes, batch
  * calls, rows, and oversize batches so the spec can assert the
  * per-partition batch shape the runner promises. */
final class CountingBackend(val dim: Int, opens: LongAccumulator,
                            closes: LongAccumulator, batches: LongAccumulator,
                            rows: LongAccumulator, oversize: LongAccumulator,
                            batchSize: Int) extends EmbedderBackend {
  private val inner = new HashEmbedder(dim)
  def open(): EmbedderHandle = {
    opens.add(1)
    new EmbedderHandle {
      def embedBatch(texts: Array[String]): Array[Array[Double]] = {
        batches.add(1)
        rows.add(texts.length)
        if (texts.length > batchSize) oversize.add(1)
        texts.map(inner.embed)
      }
      override def close(): Unit = closes.add(1)
    }
  }
}

class BatchEmbedSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  private val d = "/root/testdata/sf0.001"

  test("batched path produces bit-identical vectors to the scalar UDF path") {
    val emb = new HashEmbedder(64)
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val batched = BatchEmbed.embedColumn(docs, "text", emb)
      .select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val embedUdf = udf((t: String) => emb.embed(t))
    val scalar = docs.select(col("doc_id"), embedUdf(col("text")).as("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(batched.keySet == scalar.keySet)
    batched.foreach { case (id, v) =>
      assert(v == scalar(id), s"doc $id: batched vector != scalar vector")
    }
  }

  test("fast internal-row path: bit-identical vectors, all other columns preserved") {
    val emb = new HashEmbedder(64)
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    val fast = BatchEmbed.embedColumnFast(docs, "text",
      new EmbedderAsBackend(emb))
      .select("doc_id", "source", "n_chars", "embedding").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getSeq[Double](3)))
      .toMap
    val embedUdf = udf((t: String) => emb.embed(t))
    val scalar = docs
      .select(col("doc_id"), col("source"), col("n_chars"),
        embedUdf(col("text")).as("embedding")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getSeq[Double](3)))
      .toMap
    assert(fast.keySet == scalar.keySet)
    fast.foreach { case (id, v) =>
      assert(v == scalar(id), s"doc $id: fast-path row != scalar row")
    }
  }

  test("fast path keeps the per-partition handle + batch contract") {
    val sc = spark.sparkContext
    val opens = sc.longAccumulator("f_opens")
    val closes = sc.longAccumulator("f_closes")
    val batches = sc.longAccumulator("f_batches")
    val rows = sc.longAccumulator("f_rows")
    val oversize = sc.longAccumulator("f_oversize")
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).repartition(4)
    val backend = new CountingBackend(64, opens, closes, batches, rows, oversize, 32)
    val n = BatchEmbed.embedColumnFast(docs, "text", backend, 32).count()
    assert(rows.value == n && oversize.value == 0)
    assert(opens.value == 4 && closes.value == opens.value)
    assert(batches.value <= n / 32 + 4 && batches.value > opens.value)
  }

  test("handle opened once per non-empty partition, closed once, batches ≤ batchSize") {
    val sc = spark.sparkContext
    val opens = sc.longAccumulator("opens")
    val closes = sc.longAccumulator("closes")
    val batches = sc.longAccumulator("batches")
    val rows = sc.longAccumulator("rows")
    val oversize = sc.longAccumulator("oversize")
    val batchSize = 32
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).repartition(4)
    val backend = new CountingBackend(64, opens, closes, batches, rows,
      oversize, batchSize)
    val out = BatchEmbed.embedColumn(docs, "text", backend, batchSize)
    val n = out.count()
    assert(n == docs.count())
    assert(rows.value == n, "every row must flow through embedBatch")
    assert(oversize.value == 0, "no batch may exceed batchSize")
    // one handle per partition (all 4 are non-empty after repartition);
    // mapPartitions runs once per partition per action — a single
    // count() action means exactly one open (and one close) each.
    assert(opens.value == 4, s"expected 4 handle opens, got ${opens.value}")
    assert(closes.value == opens.value, "every opened handle must be closed")
    // batching really amortizes: ceil(rows_p/32) calls per partition,
    // which for n rows over 4 partitions is ≤ n/32 + 4 calls total.
    assert(batches.value <= n / batchSize + 4,
      s"${batches.value} batch calls for $n rows is not batched")
    // handle reuse: far fewer opens than batch calls (model loaded per
    // partition, not per batch).
    assert(batches.value > opens.value, "expected multiple batches per handle")
  }

  test("buildIndex through BatchEmbed matches the legacy scalar-UDF construction") {
    val emb = new HashEmbedder(64)
    val docs = Tables.documents(spark, d).filter(col("doc_id") < 60)
    val batched = IndexPipeline.buildIndex(docs, emb)
      .select("doc_id", "vtype", "chunk_index", "total_chunks", "chunk_text", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)) ->
        (r.getInt(3), r.getString(4), r.getSeq[Double](5)))
      .toMap
    // legacy shape: per-row embed UDF + post-explode window count
    val chunkU = udf((t: String) => graft.functions.TextOps.chunkText(t, 462, 50))
    val sumU = udf((fn: String, txt: String) =>
      graft.functions.TextOps.buildSummaryText(fn,
        graft.functions.TextOps.smartTruncate(txt, 256), Seq.empty, Seq.empty,
        Seq.empty, "text"))
    val embedUdf = udf((t: String) => emb.embed(t))
    val base = docs.select(col("doc_id"), col("source").as("owner"), col("text"))
    val legacySumm = base
      .withColumn("chunk_text", sumU(concat(lit("doc_"), col("doc_id")), col("text")))
      .select(col("doc_id"), lit("summary").as("vtype"), lit(0).as("chunk_index"),
        lit(1).as("total_chunks"), col("chunk_text"))
    val legacyChunks = base
      .select(col("doc_id"),
        posexplode(chunkU(col("text"))).as(Seq("chunk_index", "chunk_text")))
      .withColumn("total_chunks", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")).cast("int"))
      .select(col("doc_id"), lit("chunk").as("vtype"), col("chunk_index"),
        col("total_chunks"), col("chunk_text"))
    val legacy = legacySumm.unionByName(legacyChunks)
      .withColumn("embedding", embedUdf(col("chunk_text")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)) ->
        (r.getInt(3), r.getString(4), r.getSeq[Double](5)))
      .toMap
    assert(batched.keySet == legacy.keySet)
    batched.foreach { case (k, v) =>
      assert(v == legacy(k), s"row $k diverged from the legacy construction")
    }
  }

  test("buildIndex plans ZERO shuffle Exchange (map-only pipeline)") {
    val plan = IndexPipeline.buildIndex(Tables.documents(spark, d))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"buildIndex must be map-only; plan:\n$plan")
  }
}
