package graft.model

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** The typed §1.1 core model: the reference's document entity
  * (`document_models.py:25-108`) as a Spark schema + case-class family,
  * with the Mongo-isms mapped to columnar semantics:
  *
  *  - status enums (`DocumentStatus`/`VectorStatus`, `:7-23`) become
  *    validated string columns — enum sets exported for filters;
  *  - `Dict[str, Any]` escape hatches (`metadata`, `email_metadata`,
  *    `ai_analysis_output`) become `raw_json`-style STRING columns
  *    queried with get_json_object (T6) — open schema without a blob
  *    of MapType casts;
  *  - `enriched_data` (`:79-95`) and `cluster_info` (`:98-106`) are
  *    TYPED nested structs (the parts with a declared shape);
  *  - Mongo's "$exists: False" vs "field: null" distinction
  *    (`crud_documents.py:50-56`) COLLAPSES to SQL NULL: `normalize`
  *    projects any raw relation onto the full schema, so an absent
  *    column/field arrives as a typed NULL column — which is why P1's
  *    pending filter is the two-legged `isNull || = 'pending'` rather
  *    than Mongo's three-legged $or.
  */
object CoreModel {

  object DocumentStatus {
    val Uploaded = "uploaded"
    val PendingExtraction = "pending_extraction"
    val TextExtracted = "text_extracted"
    val ExtractionFailed = "extraction_failed"
    val PendingAnalysis = "pending_analysis"
    val Analyzing = "analyzing"
    val AnalysisCompleted = "analysis_completed"
    val AnalysisFailed = "analysis_failed"
    val ProcessingError = "processing_error"
    val Completed = "completed"
    val All: Seq[String] = Seq(Uploaded, PendingExtraction, TextExtracted,
      ExtractionFailed, PendingAnalysis, Analyzing, AnalysisCompleted,
      AnalysisFailed, ProcessingError, Completed)
  }

  object VectorStatus {
    val NotVectorized = "not_vectorized"
    val Processing = "processing"
    val Vectorized = "vectorized"
    val Failed = "vectorization_failed"
    val All: Seq[String] = Seq(NotVectorized, Processing, Vectorized, Failed)
  }

  object ClusteringStatus {
    val Pending = "pending"
    val Clustered = "clustered"
    val Excluded = "excluded"
    val All: Seq[String] = Seq(Pending, Clustered, Excluded)
  }

  /** `enriched_data.entities` (`document_models.py:84-92`). */
  case class Entities(vendor: Option[String], people: Seq[String],
                      locations: Seq[String], organizations: Seq[String],
                      items: Seq[String], amounts: Seq[Amount], dates: Seq[String])
  case class Amount(value: Option[Double], currency: Option[String])

  /** `enriched_data` (`document_models.py:79-95`). */
  case class EnrichedData(title: Option[String], summary: Option[String],
                          entities: Option[Entities], keywords: Seq[String],
                          embedding_generated: Option[Boolean])

  /** `cluster_info` (`document_models.py:98-106`). */
  case class ClusterInfo(cluster_id: Option[String], cluster_name: Option[String],
                         cluster_confidence: Option[Double],
                         clustered_at: Option[java.sql.Timestamp],
                         clustering_version: Option[String])

  /** `analysis` (`document_models.py:41-48`); the open-schema
    * `ai_analysis_output` dict is the `ai_output_json` escape hatch. */
  case class AnalysisInfo(tokens_used: Option[Long],
                          analysis_started_at: Option[java.sql.Timestamp],
                          analysis_completed_at: Option[java.sql.Timestamp],
                          error_message: Option[String],
                          analysis_model_used: Option[String],
                          ai_output_json: Option[String])

  /** The document entity (`document_models.py:25-108`). `id`/`owner_id`
    * are UUID strings; `metadata_json`/`email_metadata_json` are the
    * Dict escape hatches; `raw_json` preserves the whole source record
    * for fields outside the declared schema. */
  case class GraftDocument(
      id: String,
      filename: String,
      file_type: Option[String],
      size: Option[Long],
      uploader_device_id: Option[String],
      owner_id: String,
      tags: Seq[String],
      metadata_json: Option[String],
      created_at: Option[java.sql.Timestamp],
      updated_at: Option[java.sql.Timestamp],
      status: String,
      vector_status: String,
      file_path: Option[String],
      extracted_text: Option[String],
      text_extraction_completed_at: Option[java.sql.Timestamp],
      analysis: Option[AnalysisInfo],
      error_details: Option[String],
      email_source: Option[String],
      email_metadata_json: Option[String],
      email_synced_at: Option[java.sql.Timestamp],
      enriched_data: Option[EnrichedData],
      cluster_info: Option[ClusterInfo],
      clustering_status: Option[String],
      raw_json: Option[String])

  implicit val documentEncoder: Encoder[GraftDocument] = Encoders.product[GraftDocument]

  /** The canonical document StructType (encoder-derived, so the typed
    * Dataset API and the DataFrame API agree field-for-field). */
  val documentSchema: StructType = documentEncoder.schema

  /** Absent ⇒ NULL normalization: project ANY raw relation onto the
    * full document schema. A column the source never had (Mongo
    * "$exists: False") and a column explicitly null (Mongo
    * "field: None") both arrive as the same typed NULL — the
    * normalization `crud_documents.py:50-56` has to spell out as a
    * three-way $or happens here once, structurally. Present columns
    * are cast to the declared type (P9 coercion). */
  def normalize(raw: DataFrame): DataFrame = {
    val have = raw.columns.toSet
    raw.select(documentSchema.fields.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Parse a JSON-lines document feed onto the schema, keeping the
    * raw record as the `raw_json` escape hatch. */
  def parseDocuments(jsonLines: DataFrame, jsonCol: String = "value"): DataFrame = {
    val parsed = from_json(col(jsonCol),
      StructType(documentSchema.fields.filterNot(_.name == "raw_json")))
    jsonLines
      .withColumn("_p", parsed)
      .select((documentSchema.fields.filterNot(_.name == "raw_json")
        .map(f => col(s"_p.${f.name}")) :+ col(jsonCol).as("raw_json")): _*)
  }

  /** P1's pending leg (`crud_documents.py:50-56`): "not yet clustered"
    * means the status column is NULL (absent or explicit null in the
    * source — `normalize` collapsed both) OR literally 'pending'. */
  def pendingFilter(c: Column): Column = c.isNull || c === ClusteringStatus.Pending

  /** Status filter for any declared enum value; the pending value
    * routes through the three-way-null leg. */
  def clusteringStatusFilter(c: Column, status: String): Column =
    if (status == ClusteringStatus.Pending) pendingFilter(c)
    else c === status

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1b — the three-way pending-null semantics under an exact oracle
    // (SURVEY §7.4's Mongo-parity hard part). The fixture derives a
    // null-bearing clustering_status from the documents table
    // (doc_id % 4: 0 → NULL for "absent/None", 1 → pending, 2 →
    // clustered, 3 → excluded) and runs BOTH builder legs: the pending
    // leg must keep NULL and 'pending' rows, the direct leg must match
    // 'clustered' only. NULL statuses survive into the output so the
    // driver hash covers null handling end-to-end.
    "p1b_pending_null" -> ((s, d) => {
      val fixture = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 4 === 0, lit(null).cast("string"))
          .when(col("doc_id") % 4 === 1, ClusteringStatus.Pending)
          .when(col("doc_id") % 4 === 2, ClusteringStatus.Clustered)
          .otherwise(ClusteringStatus.Excluded).as("clustering_status"))
      val pendingLeg = fixture
        .filter(clusteringStatusFilter(col("clustering_status"), ClusteringStatus.Pending))
        .withColumn("leg", lit("pending"))
      val directLeg = fixture
        .filter(clusteringStatusFilter(col("clustering_status"), ClusteringStatus.Clustered))
        .withColumn("leg", lit("direct"))
      pendingLeg.unionByName(directLeg)
        .select("leg", "doc_id", "clustering_status")
        .orderBy("leg", "doc_id")
    }),

    // Core-model normalization — absent⇒NULL + enum/type coercion over
    // a raw relation that LACKS most schema columns and carries a
    // wrong-typed one (size as string): the normalized projection has
    // every declared column, with per-enum counts + null accounting as
    // the driver-visible digest.
    "p1c_normalize_digest" -> ((s, d) => {
      val raw = Tables.documents(s, d).select(
        concat(lit("00000000-0000-4000-8000-"), lpad(col("doc_id").cast("string"), 12, "0")).as("id"),
        concat(lit("doc_"), col("doc_id"), lit(".txt")).as("filename"),
        col("source").as("owner_id"),
        col("n_chars").cast("string").as("size"), // wrong type on purpose
        when(col("doc_id") % 3 === 0, DocumentStatus.Completed)
          .when(col("doc_id") % 3 === 1, DocumentStatus.Uploaded)
          .otherwise(DocumentStatus.AnalysisFailed).as("status"),
        when(col("doc_id") % 5 === 0, lit(null).cast("string"))
          .otherwise(ClusteringStatus.Pending).as("clustering_status"))
      val norm = normalize(raw)
      norm.groupBy("status").agg(
        count(lit(1)).as("n"),
        sum(col("size")).as("sum_size"),
        sum(when(col("clustering_status").isNull, 1L).otherwise(0L)).as("n_null_cs"),
        sum(when(col("enriched_data").isNull, 1L).otherwise(0L)).as("n_null_enriched"),
        count(col("vector_status")).as("n_vector_status"))
        .orderBy("status")
    })
  )

  val oracles: Map[String, String] = Map(
    "p1b_pending_null" ->
      """WITH fixture AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN NULL
        |         WHEN doc_id % 4 = 1 THEN 'pending'
        |         WHEN doc_id % 4 = 2 THEN 'clustered'
        |         ELSE 'excluded' END AS clustering_status
        |  FROM documents)
        |SELECT leg, doc_id, clustering_status FROM (
        |  SELECT 'pending' AS leg, doc_id, clustering_status FROM fixture
        |  WHERE clustering_status IS NULL OR clustering_status = 'pending'
        |  UNION ALL
        |  SELECT 'direct' AS leg, doc_id, clustering_status FROM fixture
        |  WHERE clustering_status = 'clustered')
        |ORDER BY leg, doc_id""".stripMargin,
    "p1c_normalize_digest" ->
      """WITH raw AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 3 = 0 THEN 'completed'
        |         WHEN doc_id % 3 = 1 THEN 'uploaded'
        |         ELSE 'analysis_failed' END AS status,
        |    CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 'pending' END AS clustering_status
        |  FROM documents)
        |SELECT status, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_size,
        |  CAST(sum(CASE WHEN clustering_status IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_cs,
        |  count(*) AS n_null_enriched,
        |  CAST(0 AS BIGINT) AS n_vector_status
        |FROM raw GROUP BY status ORDER BY status""".stripMargin
  )
}
