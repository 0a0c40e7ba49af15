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
    })
  )

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
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin
  )
}
