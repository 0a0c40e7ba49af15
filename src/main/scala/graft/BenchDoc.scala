package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Bpe, Dedup, TextAnalysis}

/** Document-curation scale bench — BENCHVEC's counterpart for the
  * text-pipeline ops: the sf0.1 documents table replicated to 500k
  * docs (100 replicas, distinct ids), so the sentence-clean shuffles,
  * the Gopher n-gram explodes (~50M gram rows), the funnel chain, BPE
  * training, and the shared-span gram join all run at a cardinality
  * where their shuffle/blocking structure — not constant overhead —
  * dominates. Writes BENCHDOC.json.
  *
  * Corpus A (curation): replica r of doc d gets id r·100000+d; every
  * replica with r % 10 != 0 appends a "rep<r>" token (so one doc in
  * ten is an EXACT copy of its original — the dedup legs bite at
  * scale), and %5/%7 ids get the boilerplate injections. Corpus B
  * (spans): bodies made replica-disjoint by suffixing every word with
  * the replica id, with the 16-token passage planted on ~10 sparse
  * ids — true pair overlap stays bounded, so the measurement is the
  * 500k-doc gram equi-join, not a quadratic duplicate-group blowup
  * (which `dd_shared_spans` would CORRECTLY report on a 100×
  * replicated corpus, at quadratic cost — that's what the LSH dedup
  * family is for).
  */
object BenchDoc {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val stats = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      timings(name) = (System.nanoTime() - t0) / 1e9
      r
    }
    def timedMin2[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); body
      val s1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); val r = body
      timings(name) = math.min(s1, (System.nanoTime() - t1) / 1e9)
      r
    }
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val NRep = 100

    // ---- corpus A: 100 replicas, one-in-ten an exact copy ----------
    val raw = Tables.documents(spark, sfDir).filter(col("n_chars") > 0)
      .select("doc_id", "text")
    val reps = spark.range(NRep).select(col("id").cast("int").as("r"))
    val corpus = timed("gen_corpus_500k") {
      val c = raw.crossJoin(broadcast(reps))
        .select((col("r").cast("long") * 100000L + col("doc_id")).as("doc_id"),
          when(col("r") % 10 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" rep"), col("r"))).as("text"))
        .withColumn("text",
          when(col("doc_id") % 5 === 0,
            concat(lit("subscribe to our newsletter for updates. "), col("text"),
              lit(". all rights reserved worldwide")))
          .when(col("doc_id") % 7 === 0,
            concat(lit("cookie policy accepted by continuing. "), col("text")))
          .otherwise(col("text")))
        .repartition(32).persist()
      stats("n_docs") = c.count().toString
      c
    }

    // sentence-level boilerplate clean: two hash shuffles at 500k docs
    val cleaned = timedMin2("sentence_clean_500k") {
      val cl = Dedup.sentenceClean(corpus, maxDocs = 3 * NRep)
      cl.count()
      cl
    }.persist()
    cleaned.count()

    // Gopher battery: the 2-gram + 5-gram explodes are ~50M gram rows
    val gopher = timedMin2("gopher_500k") {
      val g = TextAnalysis.gopherQuality(cleaned)
      stats("gopher_pass") = g.filter(col("passes") === 1).count().toString
      g
    }

    // full funnel: clean → gate → exact dedup → decontaminate
    timedMin2("funnel_500k") {
      val gpass = TextAnalysis.gopherQuality(cleaned)
        .filter(col("passes") === 1).select("doc_id")
      val s2 = cleaned.join(gpass, Seq("doc_id"))
      val s3 = s2.withColumn("_h", md5(col("text")))
        .withColumn("_rn", row_number().over(
          Window.partitionBy("_h").orderBy(col("doc_id").asc)))
        .filter(col("_rn") === 1).drop("_h", "_rn")
      val toks = filter(split(col("text"), " "), t => t =!= "")
      val ev = raw.filter(col("doc_id") % 97 === 0)
        .withColumn("etoks", slice(toks, 5, 21))
        .filter(size(toks) >= 25)
        .select(explode(transform(sequence(lit(0), size(col("etoks")) - 5),
          i => concat_ws(" ", (0 until 5).map(j =>
            element_at(col("etoks"), i + j + 1)): _*))).as("sh"))
        .distinct()
      val contaminated = s3
        .select(col("doc_id"), explode(transform(sequence(lit(0), size(toks) - 5),
          i => concat_ws(" ", (0 until 5).map(j =>
            element_at(toks, i + j + 1)): _*))).as("sh"))
        .join(ev, Seq("sh"), "left_semi")
        .select("doc_id").distinct()
      val s4 = s3.join(contaminated, Seq("doc_id"), "left_anti")
      stats("funnel_survivors") = s4.count().toString
    }

    // BPE training: 20 merges, each one explode+groupBy over the vocab
    timed("bpe_train20_500k") {
      val (merges, fin) = Bpe.train(corpus, 20)
      fin.unpersist()
      stats("bpe_top3") = merges.take(3)
        .map { case (_, l, r, c) => s"$l+$r:$c" }.mkString(" ")
    }

    // ---- corpus B: replica-disjoint bodies, sparse shared passage ---
    val passage = (0 until 16).map(i => f"span$i%02d").mkString(" ")
    val spansCorpus = raw.crossJoin(broadcast(reps))
      .select((col("r").cast("long") * 100000L + col("doc_id")).as("doc_id"),
        array_join(transform(filter(split(col("text"), " "), t => t =!= ""),
          t => concat(t, lit("x"), col("r"))), " ").as("text"))
      .withColumn("text",
        when(col("doc_id") % 50023 === 0, concat(col("text"), lit(" " + passage)))
          .otherwise(col("text")))
      .repartition(32).persist()
    spansCorpus.count()
    timedMin2("shared_spans_500k") {
      stats("spans_found") =
        Dedup.sharedSpans(spansCorpus, k = 5, minSpan = 8).count().toString
    }

    val json =
      "{\"timings_sec\":" +
        timings.map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}") +
        ",\"stats\":" +
        stats.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}") +
        "}"
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCHDOC.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
