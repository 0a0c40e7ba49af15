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

  test("768-d brute-force kNN stays shuffle-free (scan + TakeOrdered)") {
    val plan = SparkEntry.queries("v1_knn_768")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"v1_knn_768 must not shuffle:\n$plan")
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
