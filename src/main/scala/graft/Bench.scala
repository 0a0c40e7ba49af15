package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A full untimed warmup pass precedes the timed pass so JVM/codegen
  * warmup and first-touch parquet footer reads don't land on whichever
  * query happens to run first — reported numbers are steady-state.
  */
object Bench {
  /** One representative query per operator family for the compact
    * stdout line (the full per-query map goes to BENCH_DETAIL.json).
    * Spec-guarded to stay a subset of SparkEntry.queries. */
  val headline: Vector[String] = Vector(
    "v1_knn_topk", "v4_two_stage", "v6_rrf_fusion", "v8_multiquery_merge",
    "ann_bruteforce_batch", "ann_ivf_topk", "dd_exact", "dd_minhash_lsh",
    "dd_lsh_verify", "ta_simhash", "ta_quality_score", "t1_chunk_fixed",
    "x1_index_pipeline", "x2_standard_qa", "x5_clustering_job",
    "c7_hierarchical", "a1_system_stats", "a7_rollup", "j1_join_enrich",
    "j3_full_outer", "w2_top_per_group", "w6_topk_agg", "st_sessionize",
    "st_window_agg", "aj_asof_join", "rj_range_bucketed",
    "eval_retrieval_metrics", "skew_salted_agg", "curate_corpus",
    "ann_rp_lsh", "pp_token_budget", "v1_knn_768", "ann_rp_lsh_768",
    "emb_batched", "emb_fast", "c2h_hdbscan_eom", "ann_ivf_sampled",
    "st_index_incremental", "l11_response_cache", "ann_pq_topk",
    "ann_batch_topk", "curate_corpus_v2", "dd_shared_spans", "ts_bpe_train")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=a,b,c limits the run (local iteration only; the
    // driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Caches created inside a query (persisted multi-consumer
    // relations) are intra-query optimizations — clear between queries
    // so entries don't accumulate across 2×N runs and squeeze memory.
    // SPARK_GRAFT_PROGRESS=1 prints each query name to stderr before it
    // runs (local warning-attribution only; the driver never sets it,
    // keeping its parsed tail free of extra lines).
    val progress = sys.env.contains("SPARK_GRAFT_PROGRESS")
    def run(n: String, recordFailure: Boolean): Unit = {
      if (progress) System.err.println(s"[bench] >> $n")
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch {
        case e: Throwable =>
          if (recordFailure) failed += n
          System.err.println(s"[bench] $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      finally spark.catalog.clearCache()
    }
    // Calibration probe (round-9 verdict task 1): FIXED synthetic
    // CPU+shuffle work — 20M deterministic rows, an xxhash64 chain, a
    // 97,651-key hash aggregate, a global sort — entirely corpus- and
    // engine-code-independent, so its runtime measures only the BOX
    // (contention, thermal state). Every artifact carries it as a
    // top-level "calibration" field; round-over-round comparisons
    // divide per-query ratios by the calibration ratio
    // (scripts/compare_bench.py) instead of arguing box weather in
    // prose. Commit policy: the committed artifact's calibration must
    // be within ~1.2× of the best same-day run.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(20000000L)
        .select((col("id") % 97651L).as("k"),
          xxhash64(xxhash64(col("id")), col("id")).as("h"))
        .groupBy("k").agg(sum(col("h")).as("s"), count(lit(1)).as("c"))
        .orderBy(col("s")).count()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup pass (untimed)
    calibrate()
    names.foreach(run(_, recordFailure = false))
    // Two timed passes, report the per-query MIN: the driver invokes
    // Bench right after the test-suite JVM and single-pass numbers
    // carried 2-8× box-contention noise in rounds 2-3 (PERF.md) — the
    // min of two spaced samples is a steady-state estimate that
    // survives a contended box without needing a standalone rerun.
    def timedPass(): Seq[(String, Double)] = names.map { n =>
      val t0 = System.nanoTime()
      run(n, recordFailure = true)
      n -> (System.nanoTime() - t0) / 1e9
    }
    val c1 = calibrate()
    val p1 = timedPass()
    val c2 = calibrate()
    val p2 = timedPass()
    val c3 = calibrate()
    // min of three spaced samples, same steady-state logic as queries
    val calibration = Seq(c1, c2, c3).min
    val results = p1.zip(p2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Per-mode attribution for the eval grid (round-9 verdict task 6):
    // extra `eval_retrieval_metrics__*` entries in the DETAIL artifact
    // only — not headline queries, not counted in total/nqueries.
    val evalStages =
      if (only.isEmpty)
        try graft.evaluation.RetrievalEval.evaluateModeTimings(spark, sfDir)
        finally spark.catalog.clearCache()
      else Seq.empty
    val failedJson =
      if (failed.isEmpty) ""
      else failed.distinct.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    // Full per-query detail goes to a file; the stdout line must stay SHORT.
    // The driver parses the JSON line from a bounded tail (~2.9 KB) of the
    // sbt output: round-1 AND round-2 both produced parsed:null because the
    // all-queries map (~90 entries, ~3 KB) started before the tail window.
    // Print the headline queries (~28 entries, <1 KB line) plus the
    // all-queries total.
    val detail = s"""{"metric":"total","value":${f3(total)},"unit":"sec","calibration":${f3(calibration)},"nqueries":${results.size},"queries":${jsonMap(results ++ evalStages)}$failedJson,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    val headlined = results.filter(r => headline.contains(r._1))
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","calibration":${f3(calibration)},"nqueries":${results.size},"queries":${jsonMap(headlined)}$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
