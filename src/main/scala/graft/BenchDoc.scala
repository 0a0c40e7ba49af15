package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Dedup, Serving, TextAnalysis}

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
  * ids (all in replica 0) — true pair overlap stays bounded, so the measurement is the
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
      // Partition count must follow shuffle BYTES, not a constant: the
      // first 5M-doc run (round 10) pushed the prefix join's ~250M-row
      // shingle shuffles through 32 fixed partitions (~8M rows/task)
      // and fell off a spill cliff (40× the 500k time for 10× the
      // data). Giving AQE a high starting partition count lets it
      // coalesce small shuffles back down (500k legs keep their plans)
      // while wide shuffles get real parallelism — the same posture a
      // 1000-executor cluster needs, where ANY fixed number is wrong
      // at one end of the size spectrum.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      // heap comes from build.sbt's -Xmx (SPARK_DRIVER_MEM, default
      // 8g) — spark.driver.memory is ignored once the JVM is up
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Box-weather probes (BenchProbe — same probes as graft.Bench):
    // the CPU probe normalizes the compute legs, the disk probe the
    // epi_* store-episode legs (round-12 verdict task 8: episode
    // queries measured ~0.89× across windows while the CPU probe said
    // 1.53× — one probe cannot normalize both families).
    BenchProbe.calibrate(spark) // warmup
    val calSamples =
      scala.collection.mutable.ArrayBuffer(BenchProbe.calibrate(spark))
    val calDiskSamples =
      scala.collection.mutable.ArrayBuffer(BenchProbe.calibrateDisk())

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

    // full funnel: EXACTLY the curate_corpus_v2 stage chain (shared
    // code — the bench cannot drift from the oracle-pinned pipeline)
    timedMin2("funnel_500k") {
      val stages = Dedup.curationFunnelV2(corpus, raw, maxDocs = 3 * NRep)
      stats("funnel_survivors") = stages.last._2.count().toString
      stages.foreach { case (_, df) => df.unpersist() }
    }

    // BPE training: 20 merges, each one explode+groupBy over the vocab
    timed("bpe_train20_500k") {
      val (merges, fin) = Bpe.train(corpus, 20)
      stats("bpe_top3") = merges.take(3)
        .map { case (_, l, r, c) => s"$l+$r:$c" }.mkString(" ")
    }

    // Trained quality classifier at 500k docs, train and score timed
    // separately. Train: one 27M-token count + top-256 vocab (a full
    // explode + map-side-combined groupBy — the one corpus-scaling
    // aggregation). Score: the QcScore map-only projection — zero
    // shuffle, both keep stats folded in a single pass. Seed = the
    // sub-100 original ids in every replica (~2% of the corpus).
    val seeded = corpus.withColumn("source",
      when(col("doc_id") % 100000L < 100L, "seedsrc").otherwise("web"))
    val modelRows = timedMin2("qc_train_500k") {
      TextAnalysis.qualityModel(seeded, Seq("seedsrc")).collect()
    }
    val modelDf = spark.createDataFrame(
      spark.sparkContext.parallelize(modelRows.toSeq, 1),
      TextAnalysis.qualityModel(seeded, Seq("seedsrc")).schema)
    timedMin2("qc_score_500k") {
      val r = TextAnalysis.qualityClassify(seeded, modelDf)
        .agg(sum(col("keep")).as("k"), sum(col("sample_keep")).as("sk")).head()
      stats("qc_kept") = r.getLong(0).toString
      stats("qc_sample_kept") = r.getLong(1).toString
    }

    // CCNet perplexity filter at 500k docs, train and score timed
    // separately (the classifier's sibling): train = one seed-slice
    // bigram count collected at ≤258² rows; score = the BigramNll
    // map-only projection over the corpus — zero shuffle, the whole
    // 500k-doc NLL pass in one scan.
    timedMin2("ppl_train_500k") {
      graft.operators.Perplexity.perplexityModel(seeded, Seq("seedsrc"))
    }
    val pplModel = graft.operators.Perplexity.perplexityModel(seeded, Seq("seedsrc"))
    timedMin2("ppl_score_500k") {
      val r = graft.operators.Perplexity
        .perplexityScore(seeded.withColumn("lang", lit("xx")), pplModel)
        .agg(sum(col("nll_q")).as("nll"), sum(col("n_tokens")).as("nt")).head()
      stats("ppl_mean_xent8") = f3(r.getLong(0).toDouble / r.getLong(1).toDouble)
    }

    // ---- corpus B: replica-disjoint bodies, sparse shared passage ---
    val passage = (0 until 16).map(i => f"span$i%02d").mkString(" ")
    val spansCorpus = raw.crossJoin(broadcast(reps))
      .select((col("r").cast("long") * 100000L + col("doc_id")).as("doc_id"),
        array_join(transform(filter(split(col("text"), " "), t => t =!= ""),
          t => concat(t, lit("x"), col("r"))), " ").as("text"))
      .withColumn("text",
        // ~10 tagged docs, all in replica 0 (ids < 100000): 45 pairs,
        // comfortably under sharedSpans' top-100 cap so spans_found is
        // a real count, not a saturated limit
        when(col("doc_id") < 100000 && col("doc_id") % 499 === 0,
          concat(col("text"), lit(" " + passage)))
          .otherwise(col("text")))
      .repartition(32).persist()
    spansCorpus.count()
    timedMin2("shared_spans_500k") {
      // each replica carries the base corpus's natural 90+-token
      // near-dup pairs (~25 × 100 replicas), so the top-100 report
      // fills its cap with the longest spans — record the cap AND the
      // longest span so a quality regression is still visible
      val top = Dedup.sharedSpans(spansCorpus, k = 5, minSpan = 8)
        .select("span_tokens").collect().map(_.getLong(0))
      stats("spans_reported") = s"${top.length} (top-100 cap)"
      stats("spans_longest") = top.max.toString
    }

    // exact-substring dedup (Lee et al. mode) at 500k docs: ~125M
    // 20-gram anchor rows through groupBy-gram + semi-join + per-doc
    // island windows — the replica corpus makes nearly every gram
    // cross-doc-duplicated, so this is the WORST-case coverage load
    // (every position covered → maximal window/merge work). Driver
    // pulls aggregates only.
    timedMin2("substring_exact_500k") {
      val agg = Dedup.substringDedupSpans(corpus, "doc_id", "text",
          k = 20, minLen = 100)
        .agg(count(lit(1)).as("n"), sum(col("span_len")).as("chars")).head()
      stats("substring_spans") =
        s"${agg.getLong(0)} spans, ${agg.getLong(1)} chars covered"
    }
    // the SAME operator pair on corpus B — INTENDED as the sparse
    // regime, but the measurement refuted the premise: the replica-
    // suffixed words share their vocabulary across the 5k docs WITHIN
    // each replica, so this corpus is ~fully covered too (499,991
    // spans / 227M chars), and under total coverage the hashed mode's
    // verify pass re-pays the wide shuffle on top of the narrow one —
    // measured 2.39× SLOWER than exact (PERF.md r15). The pair stays
    // as the recorded refutation + degradation bound; the hashed
    // mode's winning regime (few-percent dup rates, real web text)
    // is not constructible from these synthetic tables.
    timedMin2("substring_exact_lowdup_500k") {
      val agg = Dedup.substringDedupSpans(spansCorpus, "doc_id", "text",
          k = 20, minLen = 60)
        .agg(count(lit(1)).as("n"), sum(col("span_len")).as("chars")).head()
      stats("substring_lowdup_spans") =
        s"${agg.getLong(0)} spans, ${agg.getLong(1)} chars covered"
    }
    timedMin2("substring_hashed_lowdup_500k") {
      val agg = Dedup.substringDedupSpansHashed(spansCorpus, "doc_id", "text",
          k = 20, minLen = 60)
        .agg(count(lit(1)).as("n"), sum(col("span_len")).as("chars")).head()
      stats("substring_lowdup_spans_hashed") =
        s"${agg.getLong(0)} spans, ${agg.getLong(1)} chars covered"
    }

    // ---- corpus S: GENUINELY sparse duplication (r15 verdict task 5)
    // The lowdup pair above refuted its own premise — replica-suffixed
    // words still share a vocabulary, so ~every position was covered.
    // This corpus makes background 20-gram sharing IMPOSSIBLE by
    // construction: every token is d%06dt%02d — a complete 7-char
    // doc-unique field sits at each token head, tokens are 13 chars
    // with the separator, and any 20-char window inside the token run
    // therefore contains a FULL doc field of some token (worst case:
    // 12 trailing chars of one token + space + the next token's first
    // 7 chars) — so background windows from different docs always
    // differ. The ONLY cross-doc duplication is a 119-char passage
    // appended to 1% of docs (doc_id % 100 == 0): candidate positions
    // are ~0.3% of the corpus — the hashed mode's design regime at
    // last. Expected output (measured on the 1k-doc smoke): one span
    // per injected doc, 119 chars + a few boundary chars where the
    // doc-field tail before the passage coincides (every injected id
    // ends in "00", and last-token indices repeat per id%7 class);
    // both modes identical by construction.
    val sparseCorpus = spark.range(500000L)
      .select(col("id").as("doc_id"),
        concat(
          array_join(transform(sequence(lit(0L), lit(23L) + pmod(col("id"), lit(7L))),
            j => format_string("d%06dt%02d", col("id"), j)), " "),
          when(pmod(col("id"), lit(100)) === 0,
            lit(" " + (0 until 24).map(i => f"sp$i%02d").mkString(" ")))
            .otherwise(lit(""))).as("text"))
      .repartition(32).persist()
    stats("sparse_n_docs") = sparseCorpus.count().toString
    timedMin2("substring_exact_sparse_500k") {
      val agg = Dedup.substringDedupSpans(sparseCorpus, "doc_id", "text",
          k = 20, minLen = 100)
        .agg(count(lit(1)).as("n"), sum(col("span_len")).as("chars")).head()
      stats("substring_sparse_spans") =
        s"${agg.getLong(0)} spans, ${agg.getLong(1)} chars covered"
    }
    timedMin2("substring_hashed_sparse_500k") {
      val agg = Dedup.substringDedupSpansHashed(sparseCorpus, "doc_id", "text",
          k = 20, minLen = 100)
        .agg(count(lit(1)).as("n"), sum(col("span_len")).as("chars")).head()
      stats("substring_sparse_spans_hashed") =
        s"${agg.getLong(0)} spans, ${agg.getLong(1)} chars covered"
    }
    sparseCorpus.unpersist()

    // ---- lexical-asset CDC maintenance flatness (r15 verdict task 2)
    // applyLexCdc at the SAME churn (500 docs: 250 re-texted updates,
    // 125 deletes, 125 inserts) against a 5k-doc and a 500k-doc
    // (100×) lex store: the apply is churn-bounded by construction
    // (preimage point-fetch + one delta segment + counter deltas), so
    // the pair must land in the same band — the postings-rebuild form
    // this replaces was O(corpus) per refresh. Store inits are the
    // one intentional O(corpus) stage, timed separately.
    def lexChurn(src: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_benchlex_$tag").toString
      val docs = src.withColumn("tenant", lit("all"))
        .select("tenant", "doc_id", "text")
      timed(s"lex_store_init_$tag") {
        operators.ByidStore.init(
          Serving.lexDocVectors(docs, "tenant", "doc_id", "text"),
          "id", s"$dir/lex", nFiles = 32)
      }
      var counters = Serving.lexCountersOf(docs, "tenant", "text")
      val churn = docs.orderBy("doc_id").limit(500).persist()
      churn.count()
      val ids = churn.select(col("doc_id").cast("long"))
        .collect().map(_.getLong(0)).sorted
      val upIds = ids.take(250); val delIds = ids.slice(250, 375)
      val insIds = ids.drop(375) // re-inserted post-delete as fresh rows
      timedMin2(s"lex_cdc_churn500_$tag") {
        val ups = churn.filter(col("doc_id").isin(upIds: _*))
          .withColumn("text", concat(lit("updated pass: "), col("text")))
        val ins = churn.filter(col("doc_id").isin(insIds: _*))
          .withColumn("doc_id", col("doc_id") + 10000000L)
        counters = Serving.applyLexCdc(spark, s"$dir/lex",
          (upIds ++ delIds).toSeq, ups.unionByName(ins), counters,
          "tenant", "doc_id", "text", maxSegments = 64)
      }
      stats(s"lex_counters_$tag") =
        counters.toSeq.sortBy(_._1).map { case (t, (n, sdl)) =>
          s"$t:($n,$sdl)" }.mkString(";")
      churn.unpersist()
    }
    lexChurn(raw, "5k")
    lexChurn(corpus, "500k")

    // ---- corpus C: planted ubiquitous gram — the 100 TB skew bomb --
    // a 12-token boilerplate on EVERY doc (gram df = 500k). Without
    // the df cap the gram self-join is a C(500k,2) single-key pair
    // explosion; the default maxGramDf=1000 prunes it up front, so
    // this leg must stay in the same runtime band as shared_spans_500k
    // and report the same sparse-passage spans.
    val boiler = (0 until 12).map(i => f"bp$i%02d").mkString(" ")
    val hotCorpus = spansCorpus
      .withColumn("text", concat(col("text"), lit(" " + boiler)))
    timedMin2("shared_spans_hotgram_500k") {
      val top = Dedup.sharedSpans(hotCorpus, k = 5, minSpan = 8)
        .select("span_tokens").collect().map(_.getLong(0))
      stats("hotgram_spans_reported") = s"${top.length} (top-100 cap)"
      stats("hotgram_spans_longest") = top.max.toString
    }

    // ---- MaxScore BM25 serving at 500k: one bounds pass + a pruned
    // full-scoring sliver — the lexical serving tier's scan economy --
    timedMin2("bm25_maxscore_500k") {
      val top = TextAnalysis
        .bm25MaxScore(corpus, Seq("join", "vector", "dup"), 20).collect()
      stats("maxscore_pruned") =
        s"${top.head.getLong(5)} of ${top.head.getLong(3)} candidates"
    }

    // ---- prefix set-similarity join at 500k ------------------------
    // Corpus D: the prefix filter's candidate bound assumes a
    // long-tail (zipf) token-frequency distribution — real web text —
    // where a set's rarest-half shingles have df = O(1). The base
    // corpus's 31-token vocabulary is the OPPOSITE (every shingle's
    // df is O(corpus): on corpora A/B the exact join is correctly
    // quadratic — that's what the LSH family is for). Corpus D
    // emulates the zipf tail the same way corpus B emulates
    // replica-disjointness: tokens suffixed per (base doc, replica
    // pair), so shingle df is ≤ 2, every replica pair (2r, 2r+1) of
    // an original is a true near-dup (they differ only in the repN
    // tail), and the measurement is the rarest-first prefix
    // self-join + verify over 500k docs / ~25M shingle rows with
    // ~240k true pairs out.
    // (the per-token suffix is computed BEFORE the id-aliasing select:
    // a lambda's col("doc_id") inside that select resolves against the
    // projection's own aliased output — the replica id — not the input)
    val setjoinCorpus = raw.crossJoin(broadcast(reps))
      .withColumn("suff", concat(lit("x"), col("doc_id"), lit("g"),
        (col("r") / 2).cast("int")))
      .select((col("r").cast("long") * 100000L + col("doc_id")).as("doc_id"),
        concat(
          array_join(transform(filter(split(col("text"), " "), t => t =!= ""),
            t => concat(t, col("suff"))), " "),
          lit(" rep"), col("r")).as("text"))
      .repartition(32).persist()
    setjoinCorpus.count()
    timedMin2("setjoin_prefix_500k") {
      val r = Dedup.prefixSetJoin(Dedup.shingleRel(setjoinCorpus))
      val rows = r.select("n_candidates").limit(1).collect()
      stats("setjoin_pairs") = r.count().toString
      stats("setjoin_candidates") =
        if (rows.isEmpty) "0" else rows.head.getLong(0).toString
    }

    // release the ~25M-row setjoin shingle cache AND prefixSetJoin's
    // three internal persists before the next timed leg — left pinned,
    // they squeezed the sorted-neighborhood leg's executor memory.
    // clearCache drops corpus A too, so re-materialize it (untimed).
    spark.catalog.clearCache()
    corpus.persist()
    corpus.count()

    // ---- multi-pass sorted-neighborhood at 500k --------------------
    // the duplicate-cluster shape the LSH family pays band-bucket
    // joins for: ~100 replicas of each base doc sort ADJACENTLY, and
    // the w=4 window bounds comparisons at O(n·w) regardless of
    // cluster size (the exact set join on this corpus is correctly
    // quadratic inside each replica cluster — see corpus D's note).
    // The two-phase rank — per-bucket partitioned windows + offsets
    // from the bounded bucket relation — is what lets the "global
    // sort" run as a range-partitioned sort at 100 TB.
    timedMin2("sorted_neighborhood_500k") {
      val r = Dedup.sortedNeighborhood(corpus)
      stats("snd_pairs") = r.count().toString
    }

    // perceptual-hash near-dup: one narrow fingerprint map + a band
    // equi-join + Hamming verify — the image-dedup shape at 500k docs
    // (exact-copy replicas collide in full-hash bands; the band key
    // bounds the join fan-out to per-bucket cliques)
    timedMin2("phash_neardup_500k") {
      val fp = operators.Multimodal.dHashFingerprint(
        corpus.filter(length(col("text")) >= 130)).persist()
      val a = fp.select(col("doc_id").as("id_a"), col("h").as("h_a"), col("band"))
      val b = fp.select(col("doc_id").as("id_b"), col("h").as("h_b"), col("band"))
      val pairs = a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
        .filter(expr("bit_count(h_a ^ h_b)").cast("long") <= 2)
      stats("phash_pairs") = pairs.count().toString
      fp.unpersist()
    }

    // ---- opt-in 5M-doc legs (SPARK_GRAFT_DOC5M=1) -------------------
    // The round-9 verdict's 10× linearity proof for the two slowest
    // 500k shapes. Both are O(n) by construction — sorted-neighborhood
    // compares w-1 neighbors per row per pass; the prefix join's
    // candidate bound is df≤2 per shingle on this corpus — so the 5M
    // legs must land ≤ ~12× their 500k numbers or there's a memory
    // cliff to find. Same corpus recipes, 1000 replicas instead of
    // 100; replica-pair suffixing keeps the setjoin's zipf tail (df≤2)
    // and grows TRUE pairs 10× (500 near-dup pairs per base doc).
    if (sys.env.contains("SPARK_GRAFT_DOC5M")) {
      spark.catalog.clearCache()
      val NRep5 = 1000
      val reps5 = spark.range(NRep5).select(col("id").cast("int").as("r"))
      val corpus5 = timed("gen_corpus_5m") {
        val c = raw.crossJoin(broadcast(reps5))
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
          .repartition(64).persist()
        stats("n_docs_5m") = c.count().toString
        c
      }
      timed("sorted_neighborhood_5m") {
        val r = Dedup.sortedNeighborhood(corpus5)
        stats("snd_pairs_5m") = r.count().toString
      }
      spark.catalog.clearCache()
      val setjoin5 = raw.crossJoin(broadcast(reps5))
        .withColumn("suff", concat(lit("x"), col("doc_id"), lit("g"),
          (col("r") / 2).cast("int")))
        .select((col("r").cast("long") * 100000L + col("doc_id")).as("doc_id"),
          concat(
            array_join(transform(filter(split(col("text"), " "), t => t =!= ""),
              t => concat(t, col("suff"))), " "),
            lit(" rep"), col("r")).as("text"))
        .repartition(64).persist()
      setjoin5.count()
      timed("setjoin_prefix_5m") {
        val r = Dedup.prefixSetJoin(Dedup.shingleRel(setjoin5))
        stats("setjoin_pairs_5m") = r.count().toString
      }
      spark.catalog.clearCache()
    }

    // ---- Store-episode FLATNESS (round-11 verdict task 6): the
    // bench's top queries are all fixed-cost disk episodes at sf0.1;
    // pin the "bounded by touched buckets + per-action constant"
    // claim by running the same churn episode against a sf0.1-sized
    // store (~5k docs, 16 buckets) and a 100×-doc store (500k docs,
    // 1,600 buckets — bucket count scales with the corpus so
    // OCCUPANCY is constant, the 100 TB posture). Episode legs:
    //   epi_upsert1      doc-granular upsert (write-audit-publish)
    //   epi_pointread    bucket-pruned read of the churned doc, both
    //                    snapshots (manifest = the pruning index)
    //   epi_softdelete6  merge-on-read dv write for 6 victims
    //   epi_cdc_feed     manifest-diff change feed across all three
    //                    transitions (O(churn) scan)
    // Flat = each leg's 500k/sf01 ratio ≈ 1 (PERF.md quotes the pair).
    locally {
      import graft.pipelines.{IndexPipeline, VersionedStore}
      // vtype/chunk_text present because the manifest-diff CDC digest
      // (snapshotCdcFeedFast) hashes the chunk rows of the vector
      // schema — the episode store carries one "chunk" row per doc
      def shape(dd: org.apache.spark.sql.DataFrame) =
        dd.select(col("doc_id"), concat(lit("o"),
            pmod(col("doc_id"), lit(20L))).as("owner"),
          md5(col("text")).as("text_md5"),
          lit("chunk").as("vtype"), md5(col("text")).as("chunk_text"))
      val small = shape(Tables.documents(spark, sfDir).filter(col("n_chars") > 0))
      val big = shape(corpus) // 500k replicas, same projection
      // untimed warm-up episode on a throwaway store: the FIRST store
      // action pays JIT + codec init, which otherwise lands entirely
      // on whichever scale runs first and distorts the ratio
      locally {
        val wdir = java.nio.file.Files
          .createTempDirectory("graft_bd_store_warm").toString + "/store"
        val w = small.filter(col("doc_id") < 50)
        VersionedStore.initialLoad(spark, wdir, w, nBuckets = 4)
        VersionedStore.upsertVersioned(spark, wdir,
          w.filter(col("doc_id") === w.select(min(col("doc_id"))).head().getLong(0))
            .withColumn("text_md5", lit("warm")), nBuckets = 4)
        VersionedStore.softDelete(spark, wdir, w.limit(2).select("doc_id"))
        IndexPipeline.snapshotCdcFeedFast(spark, wdir, 1, 2)._1.count()
      }
      for ((label, relDf, nB) <- Seq(("sf01", small, 16), ("500k", big, 1600))) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_bd_store_$label").toString + "/store"
        val lo = relDf.select(min(col("doc_id"))).head().getLong(0)
        timed(s"store_load_$label") {
          VersionedStore.initialLoad(spark, dir, relDf, nBuckets = nB)
        }
        val victim = lo + 7
        timed(s"epi_upsert1_$label") {
          VersionedStore.upsertVersioned(spark, dir,
            relDf.filter(col("doc_id") === victim)
              .withColumn("text_md5", lit("churned"))
              .withColumn("chunk_text", lit("churned")), nBuckets = nB)
        }
        timed(s"epi_pointread_$label") {
          Seq(1, 2).foreach { snap =>
            val man = VersionedStore.readManifestFull(spark, dir, snap)
              .filter(_.bucket == victim % nB)
            val n = VersionedStore.scanEntries(spark, dir, man)
              .filter(col("doc_id") === victim).count()
            require(n == 1, s"point read lost the doc: $n")
          }
        }
        timed(s"epi_softdelete6_$label") {
          VersionedStore.softDelete(spark, dir,
            relDf.filter(col("doc_id").isin(((lo + 1) to (lo + 6)): _*))
              .select("doc_id"))
        }
        timed(s"epi_cdc_feed_$label") {
          Seq((1, 2), (2, 3)).foreach { case (a, b) =>
            val (feed, changed, total) =
              IndexPipeline.snapshotCdcFeedFast(spark, dir, a, b)
            stats(s"cdc_${a}to${b}_${label}") =
              s"${feed.count()} rows, $changed of $total buckets"
          }
        }
        spark.catalog.clearCache()
      }
      for (leg <- Seq("epi_upsert1", "epi_pointread", "epi_softdelete6", "epi_cdc_feed"))
        stats(s"${leg}_ratio_500k_vs_sf01") =
          f3(timings(s"${leg}_500k") / timings(s"${leg}_sf01"))
    }

    calSamples += BenchProbe.calibrate(spark)
    calDiskSamples += BenchProbe.calibrateDisk()
    val json =
      "{\"calibration\":" + f3(calSamples.min) +
        ",\"calibration_disk\":" + f3(calDiskSamples.min) +
        ",\"timings_sec\":" +
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
