package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.evaluation.RetrievalEval

class RetrievalEvalSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark

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
}
