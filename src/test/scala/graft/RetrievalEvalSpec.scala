package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.evaluation.RetrievalEval

class RetrievalEvalSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark

  test("hash-gated eval twin: all 5 modes, metric grid well-formed") {
    val rows = RetrievalEval.evaluateSynth(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("rrf_fusion", "hybrid", "summary_only", "chunks_only", "legacy"))
    rows.foreach { r =>
      val Seq(h1, h3, h5, h10, mrr, n5, n10) = (1 to 7).map(r.getDouble)
      Seq(h1, h3, h5, h10, mrr, n5, n10).foreach(v =>
        assert(v >= 0.0 && v <= 1.0, s"${r.getString(0)}: metric $v out of range"))
      assert(h1 <= h3 && h3 <= h5 && h5 <= h10, s"${r.getString(0)}: hit@k not monotone")
      assert(n5 <= n10 + 1e-12, s"${r.getString(0)}: ndcg5 > ndcg10")
      assert(mrr <= h10 + 1e-12, s"${r.getString(0)}: mrr exceeds hit10")
    }
    // the synthetic corpus still produces SOME hits (the grid isn't
    // vacuously zero)
    assert(rows.map(_.getDouble(4)).sum > 0.0, "every mode scored zero")
    spark.catalog.clearCache()
  }

  test("eval_modes_grid: QAdataset mode ordering holds per question type") {
    // columns: mode, qtype, hit1, hit3, hit5, hit10, mrr, ndcg5, ndcg10
    val rows = RetrievalEval.evalModesGrid(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(6), r.getDouble(8))).toMap
    val modes = Set("rrf_fusion", "hybrid", "summary_only", "chunks_only", "legacy")
    assert(rows.keySet == modes.flatMap(m => Seq(m -> "detail", m -> "thematic")))
    rows.foreach { case ((m, qt), (h1, mrr, n10)) =>
      Seq(h1, mrr, n10).foreach(v =>
        assert(v >= 0.0 && v <= 1.0, s"$m/$qt metric $v out of range"))
    }
    // the reference's regression signal (SURVEY §5.3): on DETAIL
    // questions fusion ≥ gated hybrid ≥ either single-branch mode
    def mrrD(m: String) = rows((m, "detail"))._2
    def h1D(m: String) = rows((m, "detail"))._1
    assert(mrrD("rrf_fusion") >= mrrD("hybrid"),
      s"rrf ${mrrD("rrf_fusion")} < hybrid ${mrrD("hybrid")} on detail MRR")
    assert(mrrD("hybrid") >= mrrD("summary_only") &&
      mrrD("hybrid") >= mrrD("chunks_only"),
      s"hybrid ${mrrD("hybrid")} below a single mode on detail MRR")
    assert(h1D("rrf_fusion") >= h1D("hybrid") &&
      h1D("hybrid") >= math.max(h1D("summary_only"), h1D("chunks_only")),
      "detail hit@1 ordering violated")
    // and THEMATIC questions are best served by the summary branch
    def mrrT(m: String) = rows((m, "thematic"))._2
    assert(modes.forall(m => mrrT("summary_only") >= mrrT(m)),
      "summary_only is not the best thematic mode")
    spark.catalog.clearCache()
  }

  test("5 search modes produce sane retrieval metrics on verbatim-snippet queries") {
    // columns: mode, hit1, hit3, hit5, hit10, mrr, ndcg5, ndcg10
    val r = RetrievalEval.evaluate(spark, "/root/testdata/sf0.001", nQueries = 20)
      .collect().map(row => row.getString(0) ->
        (row.getDouble(1), row.getDouble(3), row.getDouble(4),
          row.getDouble(5), row.getDouble(6), row.getDouble(7))).toMap
    assert(r.keySet == Set("rrf_fusion", "hybrid", "summary_only", "chunks_only", "legacy"))
    // a verbatim snippet must retrieve its source doc most of the time
    // in at least the chunk-aware modes
    val (h1c, h5c, _, mrrc, _, _) = r("chunks_only")
    assert(h5c >= 0.5, s"chunks_only hit@5 = $h5c")
    assert(mrrc > 0.0 && mrrc <= 1.0)
    r.values.foreach { case (h1, h5, h10, mrr, ndcg5, ndcg10) =>
      assert(h1 >= 0.0 && h1 <= 1.0 && h1 <= h5 && h5 <= h10 && h10 <= 1.0)
      assert(mrr <= 1.0 && ndcg5 <= ndcg10 && ndcg10 <= 1.0)
    }
  }

  test("rewrite A/B arms report sane metrics and a meaningful skip rate") {
    // columns: arm, hit5, mrr, skip_rate
    val r = RetrievalEval.evaluateRewriteAb(spark, "/root/testdata/sf0.001", nQueries = 20)
      .collect().map(row => row.getString(0) ->
        (row.getDouble(1), row.getDouble(2), row.getDouble(3))).toMap
    assert(r.keySet == Set("no_rewrite", "always_rewrite", "smart_trigger"))
    r.values.foreach { case (h5, mrr, sr) =>
      assert(h5 >= 0.0 && h5 <= 1.0 && mrr >= 0.0 && mrr <= 1.0 && sr >= 0.0 && sr <= 1.0)
    }
    // a verbatim snippet should mostly find its doc without rewriting
    assert(r("no_rewrite")._1 >= 0.5, s"no_rewrite hit@5 = ${r("no_rewrite")._1}")
    // The smart trigger is a per-query mixture of the two fixed arms:
    // smart_hit_q ∈ {base_hit_q, merged_hit_q} holds PER QUERY, but the
    // aggregate need not be bounded by min(base, merged) (each arm can
    // win on disjoint query subsets), so only a sanity envelope is
    // asserted here; the per-query mixture property is structural.
    val (h5n, _, _) = r("no_rewrite"); val (h5a, _, _) = r("always_rewrite")
    val (h5s, _, sr) = r("smart_trigger")
    assert(h5s >= 0.0 && h5s <= 1.0 && (h5s >= math.min(h5n, h5a) - 0.5))
    spark.catalog.clearCache()
  }

  test("answer-quality lexical metrics are bounded, populated, and mean-consistent") {
    // columns: q_id, n_contexts, relevancy, correctness, context_precision
    val rows = RetrievalEval.evaluateAnswerQuality(spark, "/root/testdata/sf0.001", nQueries = 20)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val (summary, perQuery) = rows.partition(_._1 == -1L)
    assert(summary.length == 1 && perQuery.length == 20)
    perQuery.foreach { case (_, n, rel, corr, cp) =>
      assert(n == 3, s"expected 3 contexts, got $n") // top-3 retrieval always fills
      assert(rel >= 0.0 && rel <= 1.0 && corr >= 0.0 && corr <= 1.0)
      assert(cp >= 0.0 && cp <= 1.0, s"context_precision $cp out of range")
    }
    // verbatim-snippet queries: the golden doc is usually retrieved, so
    // lexical overlap with it cannot be all-zero across 20 queries
    assert(perQuery.map(_._4).max > 0.0, "all correctness scores are zero")
    // ... and when it IS retrieved its 256-char prefix is a token
    // subset of the full text (rel = 1), so context_precision cannot be
    // all-zero either
    assert(perQuery.map(_._5).max > 0.0, "all context_precision scores are zero")
    val (_, nSum, relMean, corrMean, cpMean) = summary.head
    assert(nSum == perQuery.map(_._2).sum)
    assert(math.abs(relMean - perQuery.map(_._3).sum / 20) < 1e-9)
    assert(math.abs(corrMean - perQuery.map(_._4).sum / 20) < 1e-9)
    assert(math.abs(cpMean - perQuery.map(_._5).sum / 20) < 1e-9)
    spark.catalog.clearCache()
  }

  test("context_precision formula: rank-weighted precision on hand fixtures") {
    // three contexts, relevance pattern (1, 0, 1) ⇒
    //   precision@1 = 1/1, precision@3 = 2/3; cp = (1 + 2/3) / 2 = 5/6
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ctx = Seq(
      (10L, 1, "alpha beta"), (10L, 2, "zzz yyy"), (10L, 3, "alpha gamma"),
      (20L, 1, "zzz yyy"), (20L, 2, "qqq www"), (20L, 3, "rrr sss")
    ).toDF("q_id", "rank", "snip")
    val docs = Seq((10L, "alpha beta gamma delta"), (20L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val toks = (c: org.apache.spark.sql.Column) =>
      array_distinct(filter(split(c, " "), t => t =!= ""))
    val out = RetrievalEval.contextPrecision(ctx, docs, toks)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(10L) - 5.0 / 6.0) < 1e-12, s"got ${out(10L)}")
    assert(out(20L) == 0.0, s"all-irrelevant contexts must score 0, got ${out(20L)}")
  }
}
