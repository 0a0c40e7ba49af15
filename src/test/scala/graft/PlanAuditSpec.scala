package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale guardrail: no query may silently plan a cartesian product or
  * nested-loop join — at 100 TB those are outages, not slowdowns. The
  * allowlist names the queries whose cross joins are INTENTIONAL
  * (broadcast query-set × corpus batch scoring, where the broadcast
  * side is tiny and the plan is a map-only scan).
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark

  private val intendedCross = Set(
    "ann_bruteforce_batch",   // broadcast 5-query set × corpus scan
    "eval_retrieval_metrics", // broadcast 30-query golden set × corpus scan
    "eval_retrieval_exact",   // same scan, SQL-reconstructible embedder
    "eval_rewrite_ab",        // broadcast 90-variant query set × corpus scan
    "eval_rewrite_exact",     // same scan, SQL-reconstructible embedder
    "eval_answer_quality",    // broadcast 30-query golden set × corpus scan
    "eval_answer_exact",      // same scan, SQL-reconstructible embedder
    "eval_modes_grid",        // broadcast 120-question QA set × corpus scan
    "v14_late_interaction"    // broadcast 3-subvector query set × corpus scan
  )

  test("no accidental CartesianProduct / BroadcastNestedLoopJoin in any query plan") {
    val d = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, d).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      spark.catalog.clearCache()
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
      if (bad.nonEmpty && !intendedCross.contains(name)) Some(name -> bad) else None
    }
    assert(offenders.isEmpty,
      s"unexpected cross-join physicals: ${offenders.mkString(", ")}")
  }
}
