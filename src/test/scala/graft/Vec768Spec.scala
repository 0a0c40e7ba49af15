package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{RpLsh, SyntheticVec}

/** Reference-dimensionality (768-d, `embedding_service.py:17`) parity:
  * the fixture's engine-neutral construction and the kNN family's plan
  * shape at 12× the per-row dot cost. */
class Vec768Spec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  private val d = "/root/testdata/sf0.001"

  test("SyntheticVec column matches the driver-side construction, dim 768") {
    val rows = Tables.documents(spark, d).filter(col("doc_id") < 8)
      .select(col("doc_id"), SyntheticVec.vecCol(col("doc_id"), 768).as("v"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val got = r.getSeq[Double](1)
      val want = SyntheticVec.vecLocal(r.getLong(0), 768).toSeq
      assert(got.length == 768)
      assert(got == want, s"vec of doc ${r.getLong(0)} diverges")
      assert(got.forall(x => x == 1.0 || x == -1.0))
    }
  }

  test("768-d brute-force kNN never shuffles vector payloads (narrow fan-out + TakeOrdered)") {
    // r17: vecs768 fans the single-file scan out to session parallelism
    // BEFORE the 768-dim synthesis (guide §2.5 — the dot products ran
    // on one core), so ONE round-robin exchange of narrow (doc_id,
    // label) rows is the expected shape. The original invariant this
    // test pins is unchanged: no exchange may carry the synthesized
    // vectors (no hash/range repartition of payloads, no join
    // shuffle), and the top-k stays a TakeOrderedAndProject.
    val plan = SparkEntry.queries("v1_knn_768")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"v1_knn_768 must not shuffle by key:\n$plan")
    // any exchange present must sit BELOW the vector synthesis: the
    // dot-product projection appears only above the (single) exchange
    val exIdx = plan.indexOf("Exchange")
    val dotIdx = plan.indexOf("dotproduct")
    assert(exIdx == -1 || (dotIdx >= 0 && dotIdx < exIdx),
      s"vector payloads must not cross an exchange:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("rp768: 10 planes at 768-d, radius-2 multiprobe = 56 buckets") {
    val rp = new RpLsh(10, 768)
    assert(rp.planes.length == 10 && rp.planes.head.length == 768)
    val code = rp.codeOf(SyntheticVec.vecLocal(0, 768).toSeq)
    assert(code >= 0 && code < 1024)
    assert(rp.multiprobe(code, 2).size == 1 + 10 + 45)
    // probe fraction: 56/1024 ≈ 5.5% of buckets — sub-linear scan
    assert(rp.multiprobe(code, 2).forall(c => c >= 0 && c < 1024))
  }

  test("768-d dots are integer-valued (exact in any accumulation order)") {
    val sims = SparkEntry.queries("v1_knn_768")(spark, d)
      .select("sim").collect().map(_.getDouble(0))
    assert(sims.nonEmpty)
    sims.foreach(s => assert(s == math.rint(s), s"non-integer sim $s"))
    assert(sims.head == 768.0, "query doc must match itself at dot = dim")
  }
}
