package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ByidStore

/** CDC-maintained point-fetch store: delta segments + tombstones +
  * max-seg merge must serve exactly the post-churn corpus, and
  * compaction must fold without changing the logical view. */
class ByidStoreSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark

  private def freshDir(): String =
    Files.createTempDirectory("graft-byid-").toString

  private def corpus(ids: Seq[Long], tag: String) = {
    import spark.implicits._
    ids.map(i => (i, s"$tag-$i", i * 10)).toDF("id", "payload", "v")
  }

  test("init + fetch serves the base segment") {
    val path = freshDir()
    ByidStore.init(corpus(0L until 20L, "a"), "id", path, nFiles = 2)
    assert(ByidStore.segments(path) == Seq(0))
    val got = ByidStore.fetch(spark, path, Seq(3L, 7L, 19L), "id")
      .orderBy("id").collect()
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(3L, 7L, 19L))
    assert(got.forall(_.getAs[Int]("seg") == 0))
    assert(got.map(_.getAs[String]("payload")).toSeq == Seq("a-3", "a-7", "a-19"))
  }

  test("applyCdc: updates served from the delta, deletes tombstoned, others from base") {
    import spark.implicits._
    val path = freshDir()
    ByidStore.init(corpus(0L until 20L, "a"), "id", path, nFiles = 2)
    // batch: update ids 3,7 (preimage removal + postimage addition),
    // delete id 5, insert id 100
    val removals = Seq(3L, 7L, 5L).toDF("id")
    val additions = corpus(Seq(3L, 7L, 100L), "b")
    val b = ByidStore.applyCdc(spark, path, removals, additions, "id")
    assert(b == 1)
    val got = ByidStore.fetch(spark, path, Seq(3L, 5L, 7L, 9L, 100L), "id")
      .orderBy("id").collect()
    assert(got.map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
      r.getAs[Int]("seg"))).toSeq ==
      Seq((3L, "b-3", 1), (7L, "b-7", 1), (9L, "a-9", 0), (100L, "b-100", 1)))
  }

  test("re-insert after delete survives; empty batch writes nothing") {
    import spark.implicits._
    val path = freshDir()
    ByidStore.init(corpus(0L until 10L, "a"), "id", path, nFiles = 1)
    ByidStore.applyCdc(spark, path, Seq(4L).toDF("id"),
      corpus(Nil, "x"), "id") // delete 4
    assert(ByidStore.fetch(spark, path, Seq(4L), "id").count() == 0)
    ByidStore.applyCdc(spark, path, Seq.empty[Long].toDF("id"),
      corpus(Seq(4L), "c"), "id") // re-insert 4
    val r = ByidStore.fetch(spark, path, Seq(4L), "id").head()
    assert(r.getAs[String]("payload") == "c-4" && r.getAs[Int]("seg") == 2)
    // empty batch: no new segment or tombstone, returns 0
    val segsBefore = (ByidStore.segments(path), ByidStore.tombstones(path))
    assert(ByidStore.applyCdc(spark, path, Seq.empty[Long].toDF("id"),
      corpus(Nil, "x"), "id") == 0)
    assert((ByidStore.segments(path), ByidStore.tombstones(path)) == segsBefore)
  }

  test("compact folds to one base preserving the logical view; auto-compact honors threshold") {
    import spark.implicits._
    val path = freshDir()
    ByidStore.init(corpus(0L until 30L, "a"), "id", path, nFiles = 2)
    ByidStore.applyCdc(spark, path, Seq(1L, 2L).toDF("id"), corpus(Seq(1L), "b"), "id")
    ByidStore.applyCdc(spark, path, Seq.empty[Long].toDF("id"), corpus(Seq(40L), "b"), "id")
    val before = ByidStore.fetch(spark, path, (0L until 45L), "id")
      .select("id", "payload", "v").orderBy("id").collect().toSeq
    ByidStore.compact(spark, path, "id", nFiles = 2)
    assert(ByidStore.segments(path).size == 1 && ByidStore.tombstones(path).isEmpty)
    val after = ByidStore.fetch(spark, path, (0L until 45L), "id")
      .select("id", "payload", "v").orderBy("id").collect().toSeq
    assert(after == before)
    // auto-compact: threshold 2 segments → third segment triggers fold
    ByidStore.applyCdcAutoCompact(spark, path, Seq(3L).toDF("id"),
      corpus(Seq(50L), "c"), "id", maxSegments = 2, compactFiles = 2)
    assert(ByidStore.segments(path).size <= 2)
    val r = ByidStore.fetch(spark, path, Seq(3L, 50L), "id").orderBy("id").collect()
    assert(r.map(_.getAs[Long]("id")).toSeq == Seq(50L))
  }
}
