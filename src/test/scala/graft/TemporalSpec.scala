package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Conversations, Temporal}

class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  // (event_id, user_id, event_type, ts_us)
  private def events = Seq(
    (1L, 1L, "view", 100L),
    (2L, 1L, "purchase", 200L),  // asof view = 1 (gap 100)
    (3L, 1L, "view", 300L),
    (4L, 1L, "purchase", 300L),  // view 3 shares ts but sorts first (smaller id) → matched
    (5L, 2L, "purchase", 50L),   // user 2 has no preceding view → null
    (6L, 2L, "view", 60L),
    (7L, 2L, "purchase", 60L),   // view 6 at same ts, smaller id → matched, gap 0
    (8L, 3L, "click", 10L),
    (9L, 3L, "purchase", 20L)    // only clicks before → null view
  ).toDF("event_id", "user_id", "event_type", "ts_us")

  test("asofJoin: strictly-preceding-in-sort-order view per purchase") {
    val r = Temporal.asofJoin(events, "user_id", "ts_us", "event_id",
        isBuild = col("event_type") === "view",
        isProbe = col("event_type") === "purchase",
        attrs = Seq("event_id"))
      .select(col("event_id"), col("asof_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(r(2L).contains(1L))
    assert(r(4L).contains(3L)) // same-ts view with smaller id counts as preceding
    assert(r(5L).isEmpty)
    assert(r(7L).contains(6L))
    assert(r(9L).isEmpty)      // clicks never match
  }

  test("asofJoin matches a brute-force walk on a seeded random stream") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map { i =>
      (i, rnd.nextInt(5).toLong,
        if (rnd.nextBoolean()) "view" else "purchase", rnd.nextInt(500).toLong)
    }
    val got = Temporal.asofJoin(
        rows.toDF("event_id", "user_id", "event_type", "ts_us"),
        "user_id", "ts_us", "event_id",
        isBuild = col("event_type") === "view",
        isProbe = col("event_type") === "purchase",
        attrs = Seq("event_id"))
      .select(col("event_id"), col("asof_event_id"))
      .as[(Long, Option[Long])].collect().toMap

    val expected = rows.groupBy(_._2).values.flatMap { userRows =>
      var lastView: Option[Long] = None
      userRows.sortBy(r => (r._4, r._1)).flatMap { r =>
        val out = if (r._3 == "purchase") Some(r._1 -> lastView) else None
        if (r._3 == "view") lastView = Some(r._1)
        out
      }
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.exists(_.nonEmpty))
  }

  test("bucketed range join equals naive range join") {
    // Random-ish small stream; compare the bucketed plan against the
    // naive non-equi join on the same window [p-250, p).
    val ev = (1L to 200L).map { i =>
      (i, i % 7, if (i % 3 == 0) "purchase" else "click", (i * 97) % 1000)
    }.toDF("event_id", "user_id", "event_type", "ts_us")
    val bucket = 250L
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts_us".as("c_ts"), expr(s"ts_us div $bucket").as("bucket"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us".as("p_ts"))
      .withColumn("bucket", explode(array(expr(s"p_ts div $bucket - 1"), expr(s"p_ts div $bucket"))))
    val bucketed = purchases.join(clicks, Seq("user_id", "bucket"))
      .filter($"c_ts" >= $"p_ts" - bucket && $"c_ts" < $"p_ts")
      .groupBy("event_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap

    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id".as("pu"), $"ts_us".as("p_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts_us".as("c_ts"))
    val naive = p.join(c, $"cu" === $"pu" && $"c_ts" >= $"p_ts" - bucket && $"c_ts" < $"p_ts")
      .groupBy("event_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("lastN returns the whole array when shorter than n (MongoDB $slice:-n)") {
    val conv = Seq(
      (1L, Seq(10L, 20L, 30L, 40L)),
      (2L, Seq(10L, 20L)),
      (3L, Seq.empty[Long])
    ).toDF("conv_id", "messages")
    val r = Conversations.lastN(conv, 3)
      .select("conv_id", "recent").as[(Long, Seq[Long])].collect().toMap
    assert(r(1L) == Seq(20L, 30L, 40L))
    assert(r(2L) == Seq(10L, 20L)) // shorter than n → whole array, not empty
    assert(r(3L) == Seq.empty)
  }

  test("t14_scd2_intervals: contiguous, non-overlapping, change-only, one open tail") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("t14_scd2_intervals")(spark, d)
      .select("user_id", "version", "event_type", "from_us", "to_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, ivs0) =>
      val ivs = ivs0.sortBy(_._2)
      // versions are 1..n dense
      assert(ivs.map(_._2).toSeq == (1L to ivs.length.toLong))
      // exactly the LAST interval is open; every other to == next from
      ivs.init.zip(ivs.tail).foreach { case (a, b) =>
        assert(a._5.contains(b._4), s"user $u: interval v${a._2} not contiguous")
        assert(a._3 != b._3, s"user $u: consecutive intervals share event_type")
      }
      assert(ivs.last._5.isEmpty, s"user $u: tail interval must be open")
    }
  }

  test("t15_scd2_lookup: every purchase hits exactly its containing interval") {
    val d = "/root/testdata/sf0.001"
    val looked = SparkEntry.queries("t15_scd2_lookup")(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))))
    spark.catalog.clearCache()
    val intervals = SparkEntry.queries("t14_scd2_intervals")(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
    spark.catalog.clearCache()
    val purchases = graft.Tables.events(spark, d)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("event_id", "user_id", "ts_ns div 1000 as ts_us").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    spark.catalog.clearCache()
    assert(looked.nonEmpty && looked.length == purchases.size)
    // one row per purchase; the claimed (user, version) interval CONTAINS ts
    assert(looked.map(_._1).distinct.length == looked.length)
    looked.foreach { case (eid, (u, v, state, from)) =>
      val (pu, ts) = purchases(eid)
      assert(pu == u)
      val (ivState, ivFrom, ivTo) = intervals((u, v))
      assert(ivState == state && ivFrom == from)
      assert(ivFrom <= ts && ivTo.forall(ts < _),
        s"purchase $eid ts=$ts outside interval v$v [$ivFrom, $ivTo)")
    }
  }

  test("t16_peak_concurrency: sweep max equals a brute-force overlap count per day") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("t16_peak_concurrency")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    // brute force: per (user, day) interval, concurrency at every start
    val iv = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("date").cast("string").as("day"),
        expr("ts_ns div 1000").as("ts_us"))
      .groupBy("user_id", "day")
      .agg(min("ts_us").as("s"), max("ts_us").as("e"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    spark.catalog.clearCache()
    val byDay = iv.groupBy(_._1)
    rows.foreach { case (day, peak, nIv) =>
      val ivs = byDay(day).map(x => (x._2, x._3))
      assert(nIv == ivs.length.toLong)
      // concurrency peaks at some interval start (closed intervals)
      val brute = ivs.map { case (s0, _) =>
        ivs.count { case (s1, e1) => s1 <= s0 && s0 <= e1 }
      }.max
      assert(peak == brute.toLong, s"$day sweep $peak vs brute $brute")
      assert(peak >= 1 && peak <= nIv)
    }
  }
}
