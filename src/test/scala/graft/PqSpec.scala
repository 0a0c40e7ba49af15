package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantization => PQ, Search}

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def base = Tables.embeddings(spark, d)
    .select($"vec_id".cast("long").as("vec_id"),
      $"embedding".cast("array<double>").as("embedding"))
    .withColumn("tenant", lit("all"))

  test("pq: training is deterministic and codebooks have the declared shape") {
    val b1 = PQ.pqTrainSampled(base, "tenant", "vec_id", "embedding", 4, 8, 256)
    val b2 = PQ.pqTrainSampled(base, "tenant", "vec_id", "embedding", 4, 8, 256)
    assert(b1.keySet == Set("all"))
    val books = b1("all")
    assert(books.length == 4)                      // m subspaces
    books.foreach { cb =>
      assert(cb.nonEmpty && cb.length <= 8)        // ≤ ksub codewords
      cb.foreach(cw => assert(cw.length == 16))    // dsub = 64/4
    }
    // bit-identical across runs — no RNG anywhere in the train path
    assert(b1("all").map(_.map(_.toSeq).toSeq).toSeq ==
      b2("all").map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("pq: encode emits one valid code per subspace for every vector") {
    val books = PQ.pqTrainSampled(base, "tenant", "vec_id", "embedding", 4, 8, 256)
    val enc = PQ.pqEncode(base, "tenant", "vec_id", "embedding", books).cache()
    assert(enc.count() == base.count())
    val bad = enc.select(posexplode($"codes").as(Seq("s", "code")))
      .join(spark.createDataset((0 until 4).map(s => (s, books("all")(s).length)))
        .toDF("s", "k"), Seq("s"))
      .filter($"code" < 0 || $"code" >= $"k").count()
    assert(bad == 0, s"$bad out-of-range codes")
    enc.unpersist()
  }

  test("pq: rescoring the whole corpus recovers exact brute-force top-k") {
    // rescoreK = corpus size ⇒ the ADC cut keeps everyone and the
    // exact-rescore stage alone decides — must equal brute force kNN.
    val books = PQ.pqTrainSampled(base, "tenant", "vec_id", "embedding", 4, 8, 256)
    val enc = PQ.pqEncode(base, "tenant", "vec_id", "embedding", books)
    val q = Tables.embeddings(spark, d).filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toSeq
    val n = base.count().toInt
    val pq = PQ.pqSearch(enc, base, books, "all", q, 10, n,
        idCol = "vec_id", embCol = "embedding")
      .select("id").as[Long].collect().toSeq
    val brute = Search.knn(Tables.embeddings(spark, d), q, 10, 0.0)
      .select("vec_id").as[Long].collect().toSeq
    assert(pq == brute)
  }

  test("pq: ADC ranking has real recall at a 10x candidate cut") {
    val books = PQ.pqTrainSampled(base, "tenant", "vec_id", "embedding", 4, 8, 256)
    val enc = PQ.pqEncode(base, "tenant", "vec_id", "embedding", books)
    val q = Tables.embeddings(spark, d).filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toSeq
    val pq = PQ.pqSearch(enc, base, books, "all", q, 10, 50,
        idCol = "vec_id", embCol = "embedding")
      .select("id").as[Long].collect().toSet
    val brute = Search.knn(Tables.embeddings(spark, d), q, 10, 0.0)
      .select("vec_id").as[Long].collect().toSet
    assert(pq.intersect(brute).size >= 5,
      s"recall too low through a 50-of-500 ADC cut: ${pq.intersect(brute).size}/10")
  }

  test("pq: packed byte codes match the array encoder and score identically") {
    val books = PQ.pqTrainSampled(base, "tenant", "vec_id", "embedding", 4, 8, 256)
    val arr = PQ.pqEncode(base, "tenant", "vec_id", "embedding", books)
    val pk = PQ.pqEncodePacked(base, "tenant", "vec_id", "embedding", books)
    // code values byte-for-int identical on every row
    val aCodes = arr.select("id", "codes").as[(Long, Seq[Int])].collect().toMap
    val pCodes = pk.select("id", "codes").as[(Long, Array[Byte])].collect()
      .map { case (id, b) => id -> b.map(_ & 0xFF).toSeq }.toMap
    assert(aCodes == pCodes, "packed codes != array codes")
    // AdcScore reads both representations to the same double
    val q = Tables.embeddings(spark, d).filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toSeq
    val lut = PQ.adcLut(books("all"), q)
    val a = arr.withColumn("s", graft.functions.VectorFunctions.adcScore($"codes", lut))
      .select("id", "s").as[(Long, Double)].collect().toMap
    val b = pk.withColumn("s", graft.functions.VectorFunctions.adcScore($"codes", lut))
      .select("id", "s").as[(Long, Double)].collect().toMap
    assert(a == b, "ADC scores differ between array and packed codes")
  }

  test("ivfadc: residual packed codes match the array encoder; residual rescore beats none") {
    val cents = Search.ivfTrainSampled(base, "tenant", "vec_id", "embedding", 16,
      sampleCap = 256)
    val books = PQ.pqTrainResidualSampled(base, "tenant", "vec_id", "embedding",
      cents, 4, 8, 256)
    // residual training is deterministic too
    val books2 = PQ.pqTrainResidualSampled(base, "tenant", "vec_id", "embedding",
      cents, 4, 8, 256)
    assert(books("all").map(_.map(_.toSeq).toSeq).toSeq ==
      books2("all").map(_.map(_.toSeq).toSeq).toSeq)
    val arr = PQ.pqEncodeResidual(base, "tenant", "vec_id", "embedding", cents, books)
    val pk = PQ.pqEncodeResidualPacked(base, "tenant", "vec_id", "embedding", cents, books)
    val aRows = arr.select("id", "cell", "codes").as[(Long, Int, Seq[Int])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val pRows = pk.select("id", "cell", "codes").as[(Long, Int, Array[Byte])]
      .collect().map(r => r._1 -> (r._2, r._3.map(_ & 0xFF).toSeq)).toMap
    assert(aRows == pRows, "packed residual (cell, codes) != array encoder's")
    // the cell column must equal the shared ivfAssign argmin
    val assigned = Search.ivfAssign(base, "tenant", "vec_id", "embedding", cents)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    assert(aRows.view.mapValues(_._1).toMap == assigned)
    // end-to-end: ivfadcSearch returns k rows with exact descending sims
    val q = Tables.embeddings(spark, d).filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toSeq
    val got = PQ.ivfadcSearch(arr, base, books, cents, "all", q, 10, 50, 4,
      idCol = "vec_id", embCol = "embedding").collect()
    assert(got.length == 10)
    val sims = got.map(_.getAs[Double]("sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("pq: ADC separates tight clusters (structured-data contract)") {
    // Two tight clusters far apart; PQ codes must place every member
    // with its own cluster under ADC scoring even at m=2, ksub=2.
    val a = Array(10.0, 10.0, 10.0, 10.0)
    val b = Array(-10.0, -10.0, -10.0, -10.0)
    // ids 0-9 = cluster a, 10-19 = cluster b: the deterministic
    // evenly-spaced-in-id-order init then seeds one codeword per
    // cluster (interleaved ids would seed two identical a-points and
    // leave a codeword empty — an init property, not a PQ bug)
    val rows = (0L until 20L).map { i =>
      val c = if (i < 10) a else b
      val jit = 0.01 * (i % 5)
      (i, c.zipWithIndex.map { case (x, j) => x + (if (j == 0) jit else 0.0) }.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding").withColumn("tenant", lit("all"))
    val books = PQ.pqTrainSampled(df, "tenant", "vec_id", "embedding", 2, 2, 20)
    val enc = PQ.pqEncode(df, "tenant", "vec_id", "embedding", books)
    val top = PQ.pqSearch(enc, df, books, "all", a.toSeq, 10, 10,
        threshold = -1e9, idCol = "vec_id", embCol = "embedding")
      .select("id").as[Long].collect().toSet
    assert(top == (0L until 10L).toSet,
      s"ADC cut failed to isolate the query's cluster: $top")
  }

  // ---- cheaper quantization tiers (binary / Matryoshka) ---------- //

  private def bruteTop10: (Seq[Double], Map[Long, Double], Set[Long]) = {
    val e = Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val q = e.filter($"vec_id" === 0).head().getSeq[Double](1).toSeq
    val scored = e.filter($"vec_id" =!= 0)
      .withColumn("sim", graft.functions.VectorFunctions.dot($"emb", typedLit(q)))
    val sims = scored.select("vec_id", "sim").as[(Long, Double)].collect().toMap
    val top = scored.orderBy($"sim".desc, $"vec_id".asc).limit(10)
      .select("vec_id").as[Long].collect().toSet
    (q, sims, top)
  }

  test("binary quantization: hamming in range, rescore exact, recall pinned") {
    val rows = SparkEntry.queries("ann_binary_hamming")(spark, d).collect()
    spark.catalog.clearCache()
    assert(rows.length == 10)
    val (_, sims, brute) = bruteTop10
    rows.foreach { r =>
      val h = r.getLong(1)
      assert(h >= 0 && h <= 64, s"hamming out of range: $h")
      // the rescore stage is the exact float dot — no approximation
      assert(r.getDouble(2) == sims(r.getLong(0)),
        s"rescored sim differs from brute dot for id ${r.getLong(0)}")
    }
    val recall = rows.map(_.getLong(0)).toSet.intersect(brute).size
    assert(recall >= 7, s"binary recall@10 through a 50-candidate cut: $recall")
  }

  test("matryoshka truncation: coarse is the 16-dim dot, recall pinned") {
    val rows = SparkEntry.queries("ann_mrl_truncated")(spark, d).collect()
    spark.catalog.clearCache()
    assert(rows.length == 10)
    val (q, sims, brute) = bruteTop10
    val q16 = q.take(16)
    val embOf = Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
      .as[(Long, Seq[Double])].collect().toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val coarse = embOf(id).take(16).zip(q16).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
      assert(r.getDouble(1) == coarse, s"coarse != 16-dim dot for id $id")
      assert(r.getDouble(2) == sims(id), s"rescored sim differs from brute dot for id $id")
    }
    val recall = rows.map(_.getLong(0)).toSet.intersect(brute).size
    assert(recall >= 4, s"mrl recall@10 through a 50-candidate cut: $recall")
  }

  test("pq batch: one-scan batch equals Q independent pqSearch runs") {
    import graft.operators.ProductQuantization._
    val e = base.select($"vec_id".cast("long").as("vec_id"),
        $"embedding".cast("array<double>").as("embedding"))
      .withColumn("tenant", org.apache.spark.sql.functions.lit("all"))
    val books = pqTrainSampled(e, "tenant", "vec_id", "embedding", 4, 8, 256)
    val enc = pqEncode(e, "tenant", "vec_id", "embedding", books)
    val qids = Seq(0L, 1L, 2L)
    val qvs = Tables.embeddings(spark, d).filter($"vec_id".isin(qids: _*))
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val batch = pqSearchBatch(enc, e, books, "all",
        qids.map(i => (i, qvs(i))), 10, 50,
        idCol = "vec_id", embCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    qids.foreach { qid =>
      val single = pqSearch(enc, e, books, "all", qvs(qid), 10, 50,
          idCol = "vec_id", embCol = "embedding")
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1), r.getDouble(2)))
      assert(batch.filter(_._1 == qid).toSeq == single.toSeq,
        s"batch result diverged from single-query pqSearch for q=$qid")
    }
  }

  test("ivfpq batch: the q0 slice equals the single-query ann_ivfpq_topk gate") {
    val single = SparkEntry.queries("ann_ivfpq_topk")(spark, d).collect()
      .map(r => (0L, r.getLong(0), r.getDouble(1), r.getDouble(2)))
    spark.catalog.clearCache()
    val batch = SparkEntry.queries("ann_ivfpq_batch")(spark, d).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(batch.toSeq == single.toSeq,
      "ivfpq batch q0 slice diverged from the single-query path")
  }
}
