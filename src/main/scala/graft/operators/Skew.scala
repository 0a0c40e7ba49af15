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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Salted aggregation over the (5-hot-key) event_type column —
    // oracle is the plain group-by, proving phase-2 exactness.
    "skew_salted_agg" -> ((s, d) =>
      saltedAggregate(Tables.events(s, d), "event_type", col("event_id"), 16,
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .select(col("event_type"), col("n"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy("event_type"))
  )

  val oracles: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
