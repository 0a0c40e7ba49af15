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

  test("applyCdc launches at most 4 Spark jobs per churn batch (optimization r16/r17)") {
    import spark.implicits._
    val path = freshDir()
    ByidStore.init(corpus(0L until 20L, "a"), "id", path, nFiles = 2)
    // Count only THIS call's jobs via a job group (ADVICE r16: the
    // shared SparkContext serves every suite — an unfiltered listener
    // counts concurrent suites' jobs and flakes).
    val group = s"byid-cdc-guard-${System.nanoTime()}"
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")
        if (g == group)
          jobs.add(js.stageInfos.map(_.name).mkString(" | ")): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "applyCdc job-shape guard")
      ByidStore.applyCdc(spark, path, Seq(3L, 5L).toDF("id"),
        corpus(Seq(3L, 200L), "b"), "id")
      graft.BenchProbe.drainListenerBus(spark)
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
    // Exactly one action per input plan (raw additions stage, tombstone
    // write) + the coalesced dup-check aggregate + the shuffle-free
    // single-file layout rewrite = 4 jobs; staged counts are driver
    // footer reads. A regression to count-after-write, range-sampled
    // delta writes, or a shuffling layout pass (whose AQE stage
    // materialization adds jobs) shows up as extra jobs here.
    val got = jobs.toArray.map(_.toString)
    assert(got.length <= 4,
      s"applyCdc launched ${got.length} jobs (> 4):\n  ${got.mkString("\n  ")}")
  }

  test("applyCdc sizes the delta layout from staged bytes (r16 verdict task 6)") {
    import spark.implicits._
    val path = freshDir()
    ByidStore.init(corpus(0L until 4L, "a"), "id", path, nFiles = 1)
    val prev = spark.conf.getOption("spark.graft.byid.deltaTargetBytes")
    spark.conf.set("spark.graft.byid.deltaTargetBytes", "4096")
    try {
      // a "backfill-scale" batch relative to the 4 KB target: fat
      // payloads force staged bytes past several multiples of it
      val fat = (100L until 400L).map(i => (i, "x" * 200, i)).toDF("id", "payload", "v")
      val b = ByidStore.applyCdc(spark, path,
        Seq.empty[Long].toDF("id"), fat, "id")
      assert(b == 1)
      val segFiles = Option(new java.io.File(f"$path/seg_$b%05d").listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
      assert(segFiles.length > 1,
        s"backfill batch should parallelize into >1 sorted file, got ${segFiles.length}")
      // range-partitioned + sorted: per-file id ranges are disjoint, so
      // the point-fetch page pruning contract holds file by file
      val ranges = segFiles.map { f =>
        val df = spark.read.parquet(f.getAbsolutePath)
        val r = df.agg(org.apache.spark.sql.functions.min("id"),
          org.apache.spark.sql.functions.max("id")).head()
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo2, _)) => assert(hi < lo2,
          s"delta files must cover disjoint id ranges: ${ranges.toSeq}")
        case _ =>
      }
      // the resolved view still serves point fetches correctly
      val got = ByidStore.fetch(spark, path, Seq(2L, 150L, 399L), "id")
        .orderBy("id").collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("seg")))
      assert(got.toSeq == Seq((2L, 0), (150L, 1), (399L, 1)))
      // a churn-bounded batch (below target) keeps the 1-file layout
      spark.conf.set("spark.graft.byid.deltaTargetBytes", (128L * 1024 * 1024).toString)
      val b2 = ByidStore.applyCdc(spark, path,
        Seq.empty[Long].toDF("id"), corpus(Seq(500L), "c"), "id")
      val oneFile = Option(new java.io.File(f"$path/seg_$b2%05d").listFiles())
        .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
      assert(oneFile == 1, s"churn batch should stay one sorted file, got $oneFile")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.byid.deltaTargetBytes", v)
        case None => spark.conf.unset("spark.graft.byid.deltaTargetBytes")
      }
    }
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

  // ---- crash-injection (r14 verdict tasks 1 + 7): every partial
  // state a crash can leave must serve the pre-batch or post-batch
  // view, never a torn one ------------------------------------------

  private def view(path: String, ids: Seq[Long]): Seq[(Long, String)] =
    ByidStore.fetch(spark, path, ids, "id")
      .select("id", "payload").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("marker-less segment and tombstone dirs are invisible (task 7)") {
    import spark.implicits._
    val path = freshDir()
    ByidStore.init(corpus(0L until 10L, "a"), "id", path, nFiles = 1)
    val pre = view(path, 0L until 10L)
    // crash debris: a fully-written segment + tombstone WITHOUT the
    // commit marker (applyCdc died between rename and marker create)
    corpus(Seq(3L), "torn").write.parquet(s"$path/seg_00001")
    Seq(3L, 5L).toDF("id").write.parquet(s"$path/tomb_00001")
    assert(ByidStore.segments(path) == Seq(0))
    assert(ByidStore.tombstones(path) == Seq.empty)
    // the torn batch is entirely invisible: 3 keeps its old payload
    // AND 5 still serves (the delete must not outlive its lost update)
    assert(view(path, 0L until 10L) == pre)
  }

  test("crashed stage dirs are invisible and never re-numbered over") {
    import spark.implicits._
    val path = freshDir()
    ByidStore.init(corpus(0L until 10L, "a"), "id", path, nFiles = 1)
    // crash mid-staged-write: stage dir with a half-written file
    val stage = new java.io.File(s"$path/_stage_00001/seg")
    stage.mkdirs()
    Files.write(stage.toPath.resolve("part-garbage.parquet"), Array[Byte](1, 2))
    assert(view(path, 0L until 10L).size == 10) // reads unaffected
    // the next batch numbers PAST the debris (renaming onto it would
    // resurrect the crashed batch's rows)
    val b = ByidStore.applyCdc(spark, path, Seq(2L).toDF("id"),
      corpus(Seq(2L), "b"), "id")
    assert(b == 2)
    assert(view(path, Seq(2L)) == Seq((2L, "b-2")))
  }

  test("compact is crash-safe at every prefix of old-batch retirement") {
    import spark.implicits._
    val path = freshDir()
    ByidStore.init(corpus(0L until 20L, "a"), "id", path, nFiles = 2)
    // batch 1: update 3, delete 5; batch 2: insert 100, delete 7
    ByidStore.applyCdc(spark, path, Seq(3L, 5L).toDF("id"), corpus(Seq(3L), "b"), "id")
    ByidStore.applyCdc(spark, path, Seq(7L).toDF("id"), corpus(Seq(100L), "b"), "id")
    val allIds = (0L until 20L) ++ Seq(100L)
    val expected = view(path, allIds)
    assert(expected.contains((3L, "b-3")) && !expected.exists(_._1 == 5L) &&
      !expected.exists(_._1 == 7L) && expected.contains((100L, "b-100")))

    // run the REAL compact on a copy, then transplant its committed
    // new base back — reconstructing "crashed right after the new
    // base committed, before any old batch retired"
    val copy = freshDir()
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      Files.walk(from).forEach { p =>
        val t = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    copyTree(java.nio.file.Paths.get(path), java.nio.file.Paths.get(copy))
    ByidStore.compact(spark, copy, "id", nFiles = 2)
    val Seq(newBase) = ByidStore.segments(copy)
    assert(newBase == 3) // max existing batch + 1: outranks every old row
    copyTree(java.nio.file.Paths.get(f"$copy/seg_$newBase%05d"),
      java.nio.file.Paths.get(f"$path/seg_$newBase%05d"))
    Files.copy(java.nio.file.Paths.get(f"$copy/commit_$newBase%05d"),
      java.nio.file.Paths.get(f"$path/commit_$newBase%05d"))

    // crash window A: new base committed, ALL old dirs linger
    assert(ByidStore.segments(path) == Seq(0, 1, 2, 3))
    assert(view(path, allIds) == expected)
    // crash windows B..D: old batches retire in ASCENDING order,
    // marker first — the view must hold at every prefix
    Seq(0, 1, 2).foreach { n =>
      assert(new java.io.File(f"$path/commit_$n%05d").delete())
      assert(view(path, allIds) == expected,
        s"torn view after retiring batches <= $n")
    }
    // dirs themselves gone last — still the same view
    Seq(0, 1, 2).foreach { n =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(f"$path/seg_$n%05d"))
      rm(new java.io.File(f"$path/tomb_$n%05d"))
    }
    assert(view(path, allIds) == expected)
    assert(ByidStore.segments(path) == Seq(3) && ByidStore.tombstones(path).isEmpty)
  }

  test("auto-compact counts tombstone-only batches toward the threshold") {
    import spark.implicits._
    val path = freshDir()
    ByidStore.init(corpus(0L until 10L, "a"), "id", path, nFiles = 1)
    // three delete-only batches: no segments appended, but read
    // amplification grows one tombstone scan per batch — they must
    // trip the threshold (ADVICE r14)
    Seq(1L, 2L, 3L).foreach { i =>
      ByidStore.applyCdcAutoCompact(spark, path, Seq(i).toDF("id"),
        corpus(Nil, "x"), "id", maxSegments = 3, compactFiles = 1)
    }
    assert(ByidStore.segments(path).size + ByidStore.tombstones(path).size <= 3)
    assert(view(path, 0L until 10L).map(_._1) == Seq(0L) ++ (4L until 10L))
  }

  test("applyCdc rejects duplicate ids within one batch (r15 task 7)") {
    import spark.implicits._
    val path = freshDir()
    ByidStore.init(corpus(0L until 10L, "a"), "id", path, nFiles = 1)
    // two postimages for id 3 in one batch would tie on seg in the
    // merge window — no deterministic winner, so the apply must throw
    // BEFORE the batch becomes visible
    val ex = intercept[IllegalArgumentException] {
      ByidStore.applyCdc(spark, path, Seq(3L).toDF("id"),
        Seq((3L, "b-3", 30), (3L, "c-3", 31)).toDF("id", "payload", "v"), "id")
    }
    assert(ex.getMessage.contains("duplicate"))
    // nothing committed: the pre-batch view still serves
    assert(ByidStore.segments(path) == Seq(0))
    assert(ByidStore.fetch(spark, path, Seq(3L), "id")
      .select("payload").as[String].head() == "a-3")
  }

  test("two tenants claiming one id: checkpoint/compact loudly reject the collision (r15 task 7)") {
    import spark.implicits._
    def rows(ids: Seq[Long], tenant: String, tag: String) =
      ids.map(i => (i, tenant, s"$tag-$i")).toDF("id", "tenant", "payload")
    val path = freshDir()
    ByidStore.init(rows(0L until 6L, "acme", "a"), "id", path, nFiles = 1)
    // a SAME-tenant update is legitimate churn — compact stays green
    ByidStore.applyCdc(spark, path, Seq(2L).toDF("id"),
      rows(Seq(2L), "acme", "b"), "id")
    ByidStore.compact(spark, path, "id", nFiles = 1)
    assert(ByidStore.fetch(spark, path, Seq(2L), "id")
      .select("payload").as[String].head() == "b-2")
    // tenant "other" upserting acme's id 4 commits (the store cannot
    // know liveness O(1) at apply time) but the next fold REJECTS the
    // history instead of silently collapsing acme's row away
    ByidStore.applyCdc(spark, path, Seq(4L).toDF("id"),
      rows(Seq(4L), "other", "x"), "id")
    val ex = intercept[IllegalArgumentException] {
      ByidStore.checkpoint(spark, path, "id", nFiles = 1)
    }
    assert(ex.getMessage.contains("tenant"))
  }
}
