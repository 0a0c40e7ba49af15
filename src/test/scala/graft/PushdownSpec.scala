package graft

import org.scalatest.funsuite.AnyFunSuite

/** Machine-checks the PERF.md pushdown/pruning claims: predicates
  * reach the parquet scan (`PushedFilters`) and scans read only the
  * referenced columns (`ReadSchema`) — at 100 TB an unpushed filter or
  * an unpruned wide column is the difference between scanning
  * gigabytes and scanning everything.
  */
class PushdownSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  private val d = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    // formatted mode prints PushedFilters/ReadSchema un-elided (the
    // default toString truncates long filter lists with "...")
    val p = SparkEntry.queries(name)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    spark.catalog.clearCache()
    p
  }

  test("p1 filter chain: predicates pushed to the documents scan") {
    val plan = executedPlan("p1_filter_conjunctive")
    assert(plan.contains("In(lang, [en,zh])"), "IN-list not pushed")
    assert(plan.contains("GreaterThanOrEqual(n_chars,100)"), "range lower bound not pushed")
    assert(plan.contains("LessThanOrEqual(n_chars,2000)"), "range upper bound not pushed")
  }

  test("j1 enrich: every dim scan is pruned to its join/projection columns") {
    val plan = executedPlan("j1_join_enrich")
    // orders: only custkey + totalprice (no o_orderdate/o_comment wide cols)
    assert(plan.contains("ReadSchema: struct<o_custkey:bigint,o_totalprice:double>"),
      s"orders scan not pruned")
    // customer: join keys only
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_nationkey:int>"),
      "customer scan not pruned")
    assert(!plan.contains("c_comment"), "customer comment column leaked into scan")
  }

  test("events range query: event_type equality pushed, schema pruned") {
    val plan = executedPlan("rj_range_bucketed")
    assert(plan.contains("EqualTo(event_type,"), "event_type filter not pushed")
    assert(!plan.contains("payload"), "unused payload column read")
  }

  test("ann_rp_lsh: embeddings scan pruned to id+vector, no text columns") {
    val plan = executedPlan("ann_rp_lsh")
    // the coding pass needs only vec_id + embedding — label must not be read
    assert(plan.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      "embeddings scan not pruned to vec_id+embedding")
  }

  test("pp_split_assign: documents scan pruned to doc_id+source") {
    val plan = executedPlan("pp_split_assign")
    // the split is hash-of-id: text (the wide column) must not be scanned
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      "documents scan not pruned to doc_id+source")
    assert(!plan.contains("text:string"), "wide text column leaked into the split scan")
  }
}
