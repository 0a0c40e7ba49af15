package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ResponseCache

/** L11 cache-contract unit coverage (the driver query
  * `l11_response_cache` hash-gates the full replay; these pin the two
  * contracts at their boundaries). */
class ResponseCacheSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark

  test("TTL walk: strict expiry at ttl, anchor resets on miss, no refresh on hit") {
    val s = spark
    import s.implicits._
    // ai_response ttl = 900. Requests at 0, 899, 900(from anchor 0 →
    // miss? 900-0=900 NOT < 900 → miss, re-anchor), 1799 (hit vs 900),
    // 1800+900=2700 (miss again).
    val reqs = Seq(0L, 899L, 900L, 1799L, 2700L)
      .map(t => ("ai_response", "k1", t)).toDF("cache_type", "key", "t")
    val out = ResponseCache.replayTtl(reqs)
      .orderBy("t").select("t", "hit").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    assert(out.toSeq == Seq(
      0L -> false,   // cold
      899L -> true,  // 899 < 900 — still valid
      900L -> false, // strict: expired exactly at anchor+ttl, re-anchor
      1799L -> true, // 899 after the NEW anchor (not refreshed by the hit)
      2700L -> false // 1800 after anchor 900 — expired
    ))
  }

  test("TTL walk isolates entries by (cache_type, key)") {
    val s = spark
    import s.implicits._
    val reqs = Seq(
      ("ai_response", "a", 0L), ("ai_response", "b", 10L),
      ("schema", "a", 20L), ("ai_response", "a", 30L))
      .toDF("cache_type", "key", "t")
    val out = ResponseCache.replayTtl(reqs).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)), r.getBoolean(3))).toMap
    assert(!out(("ai_response", "a", 0L)) && !out(("ai_response", "b", 10L)) &&
      !out(("schema", "a", 20L)) && out(("ai_response", "a", 30L)))
  }

  test("LRU: hit refreshes recency, miss evicts the least-recent beyond maxsize") {
    val reqs = Seq("a", "b", "c", "a", "d", "b", "e").zipWithIndex
      .map { case (k, i) => (k, i.toLong) }
    val (out, state) = ResponseCache.replayLru(reqs, maxsize = 3)
    assert(out.map(_._3) == Seq(false, false, false, true, false, false, false))
    // walk: [a] [b,a] [c,b,a] hit-a→[a,c,b] d evicts b→[d,a,c]
    // hit... b? b was evicted → miss, evicts c → [b,d,a]; e evicts a
    assert(state == List("e", "b", "d"))
  }

  test("driver l11 query: stats are consistent and every type present") {
    val rows = SparkEntry.queries("l11_response_cache")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("ai_response", "document_content", "prompt_template", "query_embedding", "schema"))
    rows.foreach { r =>
      val (hits, misses, total) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hits + misses == total && total > 0)
      assert(math.abs(r.getDouble(4) - hits.toDouble / total) < 1e-15)
      if (r.getString(0) == "query_embedding") assert(r.getString(5).nonEmpty)
      else assert(r.isNullAt(5))
    }
    spark.catalog.clearCache()
  }
}
