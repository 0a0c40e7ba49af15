package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Conversation-history operators (SURVEY.md §1.1 conversations row,
  * §2.6 W3): messages as `array<struct>` columns, append = union +
  * rewrite, last-N = `slice(col, -n, n)` (`crud_conversations.py:150-211`),
  * cached-docs enrichment = broadcast join (J7,
  * `qa_orchestrator.py:367-426`).
  */
object Conversations {

  /** Append messages: union new rows, then regroup into the ordered
    * array representation (idempotent rebuild — at scale this is an
    * append-only message log compacted per conversation). */
  def appendAndCompact(messageLog: DataFrame): DataFrame =
    messageLog
      .groupBy("conv_id")
      .agg(array_sort(collect_list(struct(col("seq"), col("role"), col("content"))))
        .as("messages"))

  /** Last-N messages per conversation ($slice: -n). MongoDB's $slice:-n
    * returns the WHOLE array when it has fewer than n elements, but
    * Spark's `slice(arr, -n, n)` returns empty there — guard on size. */
  def lastN(conversations: DataFrame, n: Int): DataFrame =
    conversations.withColumn("recent",
      when(size(col("messages")) <= n, col("messages"))
        .otherwise(slice(col("messages"), -n, n)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W3b — array-slice last-3: build per-user ordered message arrays
    // from events, slice the tail, explode back to scalar rows.
    "w3b_slice_messages" -> ((s, d) => {
      val conv = Tables.events(s, d)
        .groupBy(col("user_id").as("conv_id"))
        .agg(array_sort(collect_list(col("event_id"))).as("messages"))
      lastN(conv.withColumn("messages", col("messages")), 3)
        .select(col("conv_id"), posexplode(col("recent")).as(Seq("pos", "event_id")))
        .select(col("conv_id"), col("pos").cast("long").as("pos"), col("event_id"))
        .orderBy("conv_id", "pos")
    })
  )

  val oracles: Map[String, String] = Map(
    "w3b_slice_messages" ->
      """WITH conv AS (
        |  SELECT user_id AS conv_id, list(event_id ORDER BY event_id) AS messages
        |  FROM events GROUP BY user_id),
        |sliced AS (
        |  SELECT conv_id, messages[greatest(len(messages)-2, 1):] AS recent FROM conv)
        |SELECT conv_id, unnest(generate_series(0, len(recent)-1))::BIGINT AS pos,
        |       unnest(recent) AS event_id
        |FROM sliced ORDER BY conv_id, pos""".stripMargin
  )
}
