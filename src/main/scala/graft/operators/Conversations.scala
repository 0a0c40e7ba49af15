package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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
    }),

    // X9 — conversation append ROUND-TRIP (crud_conversations.py:118-177
    // add_message_to_conversation): the first half of the event log is
    // the persisted conversation state; the second half arrives as an
    // append batch. $push is only legal on an EXISTING conversation
    // (update_one matches {_id, user_id} and the write is dropped with
    // an error log otherwise) — mirrored as a semi-join of the batch on
    // base conv ids. The reread pins every $inc/$set effect per conv:
    // message_count (+= n_added), total_tokens (+= sum tokens),
    // updated_at (= max ts), plus the W3 last-N slice over the merged
    // ordered messages.
    "x9_conversation_roundtrip" -> ((s, d) => {
      val split = lit("2024-01-15 00:00:00").cast("timestamp")
      val ev = Tables.events(s, d).select(col("user_id").as("conv_id"),
        col("ts"), col("ts_ns"), col("event_id"), col("value"),
        concat(col("event_type"), lit(":"), col("event_id")).as("content"))
      val base = ev.filter(col("ts") < split)
      val accepted = ev.filter(col("ts") >= split)
        .join(base.select("conv_id").distinct(), Seq("conv_id"), "left_semi")
      val before = base.groupBy("conv_id").agg(count(lit(1)).as("n_before"))
      val delta = accepted.groupBy("conv_id").agg(count(lit(1)).as("n_added"))
      val after = base.unionByName(accepted).groupBy("conv_id").agg(
        count(lit(1)).as("message_count"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_tokens"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("updated_at_s"),
        array_sort(collect_list(struct(col("ts_ns"), col("event_id"), col("content"))))
          .as("messages"))
      lastN(after, 3)
        .join(before, Seq("conv_id"))
        .join(delta, Seq("conv_id"), "left")
        .select(col("conv_id"), col("n_before"),
          coalesce(col("n_added"), lit(0L)).as("n_added"),
          col("message_count"), col("total_tokens"), col("updated_at_s"),
          md5(array_join(transform(col("recent"), x => x.getField("content")), "|"))
            .as("last3_digest"))
        .orderBy("conv_id")
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
        |FROM sliced ORDER BY conv_id, pos""".stripMargin,

    "x9_conversation_roundtrip" ->
      """WITH ev AS (
        |  SELECT user_id AS conv_id, ts, epoch_ns(ts) AS ts_ns, event_id, value,
        |    event_type || ':' || CAST(event_id AS VARCHAR) AS content
        |  FROM events),
        |base AS (SELECT * FROM ev WHERE ts < TIMESTAMP '2024-01-15 00:00:00'),
        |accepted AS (
        |  SELECT e.* FROM ev e
        |  WHERE e.ts >= TIMESTAMP '2024-01-15 00:00:00'
        |    AND e.conv_id IN (SELECT DISTINCT conv_id FROM base)),
        |unioned AS (SELECT * FROM base UNION ALL SELECT * FROM accepted),
        |before AS (
        |  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_before
        |  FROM base GROUP BY conv_id),
        |delta AS (
        |  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_added
        |  FROM accepted GROUP BY conv_id),
        |aft AS (
        |  SELECT conv_id, CAST(count(*) AS BIGINT) AS message_count,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_tokens,
        |    strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS updated_at_s,
        |    list(content ORDER BY ts_ns, event_id) AS msgs
        |  FROM unioned GROUP BY conv_id),
        |sliced AS (
        |  SELECT conv_id, message_count, total_tokens, updated_at_s,
        |    CASE WHEN len(msgs) <= 3 THEN msgs ELSE msgs[len(msgs)-2:] END AS recent
        |  FROM aft)
        |SELECT s.conv_id, b.n_before, COALESCE(d.n_added, 0) AS n_added,
        |  s.message_count, s.total_tokens, s.updated_at_s,
        |  md5(array_to_string(s.recent, '|')) AS last3_digest
        |FROM sliced s JOIN before b USING (conv_id)
        |LEFT JOIN delta d USING (conv_id)
        |ORDER BY conv_id""".stripMargin
  )
}
