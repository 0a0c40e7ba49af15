package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Temporal join operators Spark lacks as built-ins — as-of join and
  * range join — composed from existing operators (the preferred
  * strategy (a) of the build brief: declarative compose beats a custom
  * physical operator when semantics allow).
  *
  * As-of join (latest left-row at-or-before each right-row): the naive
  * form is a non-equi join (explodes to |user-history|² pairs). The
  * scalable form used here is union-then-window: tag both streams,
  * union, ONE shuffle on (key, time), and `last(..., ignoreNulls)` over
  * the per-key ordered window carries the most recent left attribute
  * forward. At 100 TB this is a single sort-shuffle — the same cost as
  * any windowed agg — with zero join explosion.
  *
  * Range join (pairs within a time window): the naive form is again a
  * non-equi join that Spark executes as BroadcastNestedLoop or a
  * cartesian fragment. The scalable form buckets time into
  * window-width cells: each probe row expands to 2 adjacent buckets,
  * the build side maps to 1, and the join becomes an EQUI-join on
  * (key, bucket) with a residual range filter — shuffle-hash-joinable
  * at any scale, with AQE handling per-bucket skew.
  *
  * All timestamps here are µs longs (events.parquet is TIMESTAMP(NANOS);
  * DuckDB reads it at µs — parity lives at µs, see Tables.events).
  */
object Temporal {

  private def eventsUs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))

  /** As-of enrich: for every row of `probe`, the latest `build` row with
    * the same key at-or-strictly-before it in (time, id) order. Both
    * inputs must carry (key, ts, id); `attrs` are the build columns
    * carried forward. */
  def asofJoin(all: DataFrame, keyCol: String, tsCol: String, idCol: String,
               isBuild: org.apache.spark.sql.Column,
               isProbe: org.apache.spark.sql.Column,
               attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val tagged = attrs.foldLeft(all) { (df, a) =>
      df.withColumn(s"_b_$a", when(isBuild, col(a)))
    }
    val carried = attrs.foldLeft(tagged) { (df, a) =>
      df.withColumn(s"asof_$a", last(col(s"_b_$a"), ignoreNulls = true).over(w))
    }
    carried.filter(isProbe).drop(attrs.map(a => s"_b_$a"): _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: each purchase attributed to the user's most recent
    // strictly-preceding view (classic attribution). One shuffle.
    "aj_asof_join" -> ((s, d) => {
      asofJoin(
        eventsUs(s, d),
        "user_id", "ts_us", "event_id",
        isBuild = col("event_type") === "view",
        isProbe = col("event_type") === "purchase",
        attrs = Seq("event_id", "ts_us"))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("view_id"),
          (col("ts_us") - col("asof_ts_us")).as("gap_us"))
        .orderBy("event_id")
    }),

    // Bucketed range join: clicks within the 10 minutes before each
    // purchase, per user. Probe explodes to 2 buckets; equi-join on
    // (user, bucket) + residual filter — no nested-loop join.
    "rj_range_bucketed" -> ((s, d) => {
      val bucketUs = 600000000L // 10 min
      val ev = eventsUs(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("c_ts"),
          expr(s"ts_us div $bucketUs").as("bucket"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us").as("p_ts"))
        .withColumn("bucket",
          explode(array(expr(s"p_ts div $bucketUs - 1"), expr(s"p_ts div $bucketUs"))))
      purchases.join(clicks, Seq("user_id", "bucket"))
        .filter(col("c_ts") >= col("p_ts") - bucketUs && col("c_ts") < col("p_ts"))
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_clicks"), min(col("p_ts") - col("c_ts")).as("min_gap_us"))
        .orderBy("event_id")
    }),

    // Ordered funnel over the events stream (signup → view → purchase).
    "st_funnel" -> ((s, d) => funnel(eventsUs(s, d))),

    // Peak concurrency per day via the BOUNDARY SWEEP — the classic
    // interval-overlap aggregation (max concurrent sessions / active
    // connections) that a naive interval self-join computes in O(n²):
    // each (user, day) activity interval [first event, last event]
    // emits +1 at its start and −1 just past its end (half-open, so
    // back-to-back intervals never overlap), one running sum over the
    // (t, delta, user) total order per day gives the concurrency
    // curve, and the per-day max is the peak. One sort-shuffle keyed
    // by day; at 100 TB the partition key is (day) or (day, shard)
    // with a per-shard max merged after — the sweep itself never
    // joins. All-integer.
    "t16_peak_concurrency" -> ((s, d) => {
      val ev = eventsUs(s, d)
        .select(col("user_id"), col("ts").cast("date").cast("string").as("day"),
          col("ts_us"))
      val iv = ev.groupBy("user_id", "day")
        .agg(min(col("ts_us")).as("s0"), max(col("ts_us")).as("e0"))
        .persist()
      val bounds = iv.select(col("day"), col("user_id"), explode(array(
        struct(col("s0").as("t"), lit(1).as("delta")),
        struct((col("e0") + 1).as("t"), lit(-1).as("delta")))).as("b"))
        .select(col("day"), col("user_id"),
          col("b.t").as("t"), col("b.delta").as("delta"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("day")
        .orderBy(col("t"), col("delta"), col("user_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val run = bounds.withColumn("run", sum(col("delta")).over(w))
      val nIv = iv.groupBy("day").agg(count(lit(1)).as("n_intervals"))
      run.groupBy("day").agg(max(col("run")).as("peak_concurrency"))
        .join(nIv, "day")
        .select("day", "peak_concurrency", "n_intervals")
        .orderBy("day")
    }),

    // SCD2 dimension build (warehouse staple Spark has no builtin
    // for): collapse each user's event_type history into validity
    // intervals [from_us, to_us) — a row per CHANGE, to_us = next
    // change (null while current), version = change ordinal. Two
    // windows over the SAME (user_id, time, id) sort order, so the
    // whole build is ONE sort-shuffle on the user key; at 100 TB
    // that's the same cost as any per-key windowed agg, and the
    // (ts, event_id) tiebreak makes the intervals total-order
    // deterministic. */
    "t14_scd2_intervals" -> ((s, d) =>
      scdIntervals(eventsUs(s, d)).orderBy("user_id", "version")),

    // Point-in-time (PIT) dimension lookup against the SCD2 table:
    // each purchase enriched with the interval valid at its
    // timestamp (from_us <= ts, ts < to_us-or-open). The naive form
    // is a non-equi interval join; the scalable form is the SAME
    // union-then-window shape as the as-of join — dim-change rows and
    // probe rows share ONE sort-shuffle on the user key, changes
    // ordered before probes at equal timestamps (inclusive-from
    // semantics), and `last(..., ignoreNulls)` carries the valid
    // version forward. Zero join explosion at any scale; empty
    // intervals (two changes at one µs) are skipped by construction,
    // exactly like the oracle's ts < to_us predicate.
    "t15_scd2_lookup" -> ((s, d) => {
      val ev = eventsUs(s, d)
      val dim = scdIntervals(ev)
        .select(col("user_id"), col("from_us").as("ts_w"), lit(0).as("ord"),
          col("version").as("tie"), col("version"),
          col("event_type").as("state_at"), col("from_us"),
          lit(null).cast("long").as("event_id"))
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("ts_w"), lit(1).as("ord"),
          col("event_id").as("tie"), lit(null).cast("long").as("version"),
          lit(null).cast("string").as("state_at"),
          lit(null).cast("long").as("from_us"), col("event_id"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_w").asc, col("ord").asc, col("tie").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      dim.union(probe)
        .withColumn("v", last(col("version"), ignoreNulls = true).over(w))
        .withColumn("st", last(col("state_at"), ignoreNulls = true).over(w))
        .withColumn("fr", last(col("from_us"), ignoreNulls = true).over(w))
        .filter(col("ord") === 1)
        .select(col("event_id"), col("user_id"), col("v").as("version"),
          col("st").as("state_at"), col("fr").as("from_us"))
        .orderBy("event_id")
    })
  )

  /** SCD2 validity-interval build (see t14): a row per change with
    * [from_us, to_us) and a per-user version ordinal — one
    * sort-shuffle on the user key. */
  def scdIntervals(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev.select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("to_us", lead(col("ts_us"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("version"), col("event_type"),
        col("ts_us").as("from_us"), col("to_us"))
  }

  private val funnelStages = Seq("signup", "view", "purchase")

  /** Classic ordered funnel: users who signed up, then viewed AFTER
    * the signup, then purchased AFTER that view. Each stage is a
    * conditional-min aggregation + equi-join on the key — no window,
    * no cross product; at scale each stage is one shuffle on user_id
    * (and AQE broadcasts the shrinking stage tables). */
  def funnel(ev: DataFrame): DataFrame = {
    val s1 = ev.filter(col("event_type") === funnelStages(0))
      .groupBy("user_id").agg(min(col("ts_us")).as("t0"))
    val s2 = ev.filter(col("event_type") === funnelStages(1))
      .join(s1, Seq("user_id")).filter(col("ts_us") > col("t0"))
      .groupBy("user_id").agg(min(col("ts_us")).as("t1"))
    val s3 = ev.filter(col("event_type") === funnelStages(2))
      .join(s2, Seq("user_id")).filter(col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min(col("ts_us")).as("t2"))
    s1.join(s2, Seq("user_id"), "left_outer")
      .join(s3, Seq("user_id"), "left_outer")
      .agg(count(lit(1)).as("n_signup"),
        count(col("t1")).as("n_view_after"),
        count(col("t2")).as("n_purchase_after"))
  }

  val oracles: Map[String, String] = Map(
    "aj_asof_join" ->
      """WITH w AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |    last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_id,
        |    last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_ts
        |  FROM events)
        |SELECT event_id, user_id, view_id, ts_us - view_ts AS gap_us
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "rj_range_bucketed" ->
      """SELECT p.event_id, count(*) AS n_clicks,
        |  min(epoch_us(p.ts) - epoch_us(c.ts)) AS min_gap_us
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - 600000000
        | AND epoch_us(c.ts) < epoch_us(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    // The boundary sweep replayed: same half-open +1/−1 emission, same
    // (t, delta, user) total order, per-day running-sum max.
    "t16_peak_concurrency" ->
      """WITH pce AS (
        |  SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |         epoch_us(ts) AS ts_us
        |  FROM events),
        |pci AS (
        |  SELECT user_id, day, min(ts_us) AS s0, max(ts_us) AS e0
        |  FROM pce GROUP BY user_id, day),
        |pcb AS (
        |  SELECT day, user_id, s0 AS t, 1 AS delta FROM pci
        |  UNION ALL
        |  SELECT day, user_id, e0 + 1, -1 FROM pci),
        |pcr AS (
        |  SELECT day, CAST(sum(delta) OVER (PARTITION BY day
        |    ORDER BY t, delta, user_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        |  FROM pcb),
        |pcn AS (SELECT day, CAST(count(*) AS BIGINT) AS n_intervals
        |        FROM pci GROUP BY day)
        |SELECT r.day, CAST(max(r.run) AS BIGINT) AS peak_concurrency,
        |       any_value(n.n_intervals) AS n_intervals
        |FROM pcr r JOIN pcn n USING (day)
        |GROUP BY r.day ORDER BY r.day""".stripMargin,
    "t14_scd2_intervals" ->
      """WITH ord AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev
        |  FROM events),
        |chg AS (
        |  SELECT user_id, event_id, ts_us, event_type FROM ord
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS BIGINT) AS version,
        |  event_type,
        |  ts_us AS from_us,
        |  lead(ts_us) OVER (
        |    PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS to_us
        |FROM chg ORDER BY user_id, version""".stripMargin,
    // interval join form: intervals partition each user's timeline
    // (half-open, empty ones unsatisfiable), so exactly one row
    // matches per purchase — the window form's carried state.
    "t15_scd2_lookup" ->
      """WITH ord AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev
        |  FROM events),
        |chg AS (
        |  SELECT user_id, event_id, ts_us, event_type FROM ord
        |  WHERE prev IS NULL OR prev <> event_type),
        |scd AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS BIGINT) AS version,
        |    event_type, ts_us AS from_us,
        |    lead(ts_us) OVER (
        |      PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS to_us
        |  FROM chg),
        |p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, s.version, s.event_type AS state_at,
        |       s.from_us
        |FROM p JOIN scd s ON s.user_id = p.user_id
        |  AND s.from_us <= p.ts_us AND (s.to_us IS NULL OR p.ts_us < s.to_us)
        |ORDER BY p.event_id""".stripMargin,
    "st_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t1
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t0
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t1
        |  GROUP BY e.user_id)
        |SELECT count(*) AS n_signup, count(t1) AS n_view_after,
        |       count(t2) AS n_purchase_after
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin
  )
}
