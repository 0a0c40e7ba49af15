package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-handling utilities for hot keys at 100 TB (builder-prompt
  * scale list: "skewed keys → salting or AQE skew-join").
  *
  * `saltedAggregate` is the classic two-phase pattern: a random-free
  * deterministic salt (hash of a secondary column mod S) spreads one
  * hot group across S reducers for the partial aggregate, then the
  * tiny salted partials are re-aggregated. Results are identical to a
  * direct groupBy (the oracle checks exactly that); the win is that no
  * single reducer ever sees a whole hot key. AQE's skew-join handles
  * the join-side equivalent automatically (enabled in Bench/Verify).
  */
object Skew {

  /** Two-phase salted sum/count grouped by `key`, salt fanout S. */
  def saltedAggregate(df: DataFrame, key: String, saltSrc: Column, s: Int,
                      valueCol: Column): DataFrame =
    df.withColumn("_salt", pmod(hash(saltSrc), lit(s)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_sum"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_sum")).as("sum_value"))

  /** Salted equi-join for a skewed probe side: the build side is
    * replicated saltFanout× (explode over the salt range), the probe
    * side gets a deterministic salt from a high-cardinality column,
    * and the join runs on (key, salt) — a hot key's rows spread over
    * saltFanout reducers instead of one. Identical rows to the
    * unsalted join (the oracle checks that); the cost is a bounded
    * build-side blowup, the win is no straggler reducer. (AQE's
    * skew-join split does this adaptively; explicit salting is the
    * form that also works mid-pipeline where AQE can't split, e.g.
    * under a cached or bucketed exchange.)
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeSaltSrc: Column, saltFanout: Int): DataFrame = {
    val salted = build.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFanout - 1))))
    probe.withColumn("_salt", pmod(hash(probeSaltSrc), lit(saltFanout)))
      .join(salted, Seq(key, "_salt"))
      .drop("_salt")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Salted aggregation over the (5-hot-key) event_type column —
    // oracle is the plain group-by, proving phase-2 exactness.
    "skew_salted_agg" -> ((s, d) =>
      saltedAggregate(Tables.events(s, d), "event_type", col("event_id"), 16,
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .select(col("event_type"), col("n"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy("event_type")),

    // Skew DIAGNOSIS — the profiling pass that decides whether salting
    // / AQE skew handling is needed at all: per-key-count distribution
    // summarized as key count, min/max rows per key, exact average,
    // and the max/avg skew factor. One partial-agg shuffle over the
    // key, one tiny global agg. All inputs exact integers; avg and
    // skew are single fixed division sequences.
    "skew_diagnose" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      counts.agg(
          count(lit(1)).as("n_keys"),
          min(col("n")).as("min_n"),
          max(col("n")).as("max_n"),
          sum(col("n")).as("total"))
        .select(col("n_keys"), col("min_n"), col("max_n"),
          (col("total").cast("double") / col("n_keys").cast("double")).as("avg_n"),
          (col("max_n").cast("double") /
            (col("total").cast("double") / col("n_keys").cast("double"))).as("skew_factor"))
    }),

    // Salted join: events (event_type is a 5-hot-key column) joined to
    // a per-type dimension through an 8-way salt; aggregating the
    // joined rows must reproduce the unsalted join exactly (the
    // oracle IS the unsalted join). Seconds-granularity gap sums keep
    // the total inside BIGINT.
    "skew_salted_join" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val dim = ev.groupBy("event_type").agg(min(col("ts_us")).as("first_ts"))
      saltedJoin(ev, dim, "event_type", col("event_id"), 8)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(expr("(ts_us - first_ts) div 1000000")).as("sum_gap_s"))
        .orderBy("event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "skew_diagnose" ->
      """WITH counts AS (
        |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  min(n) AS min_n, max(n) AS max_n,
        |  CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_n,
        |  CAST(max(n) AS DOUBLE)
        |    / (CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS skew_factor
        |FROM counts""".stripMargin,
    "skew_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type, min(epoch_us(ts)) AS first_ts
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum((epoch_us(e.ts) - d.first_ts) // 1000000) AS BIGINT) AS sum_gap_s
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY e.event_type ORDER BY event_type""".stripMargin
  )
}
