package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.CoreModel
import graft.model.CoreModel._

/** Typed §1.1 core model: schema shape, absent⇒NULL normalization (the
  * Mongo null-vs-missing collapse), JSON ingestion with the raw_json
  * escape hatch, and the typed round-trip. */
class CoreModelSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark

  test("document schema declares the typed nested parts and the escape hatches") {
    val s = documentSchema
    assert(s.fieldNames.toSet.contains("raw_json"))
    assert(s("tags").dataType == ArrayType(StringType, containsNull = true))
    val enriched = s("enriched_data").dataType.asInstanceOf[StructType]
    val entities = enriched("entities").dataType.asInstanceOf[StructType]
    assert(entities("amounts").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.toSeq == Seq("value", "currency"))
    assert(s("clustering_status").nullable, "clustering_status must admit NULL (Mongo absent/None)")
    assert(s("cluster_info").dataType.asInstanceOf[StructType]("cluster_confidence").dataType == DoubleType)
    assert(DocumentStatus.All.size == 10 && VectorStatus.All.size == 4)
  }

  test("normalize collapses Mongo's missing-vs-null distinction to one NULL") {
    import spark.implicits._
    // raw A: column entirely absent ($exists: False)
    val rawA = Seq(("a", "f.txt", "u1")).toDF("id", "filename", "owner_id")
    // raw B: column present but explicitly null (field: None)
    val rawB = Seq(("a", "f.txt", "u1", null: String))
      .toDF("id", "filename", "owner_id", "clustering_status")
    val na = normalize(rawA)
    val nb = normalize(rawB)
    assert(na.columns.toSeq == documentSchema.fieldNames.toSeq)
    assert(na.columns.toSeq == nb.columns.toSeq)
    assert(na.collect().toSeq == nb.collect().toSeq,
      "absent column and explicit null must normalize identically")
    val row = na.head()
    assert(row.isNullAt(row.fieldIndex("clustering_status")))
    assert(row.isNullAt(row.fieldIndex("enriched_data")))
    // both normalized forms pass the pending filter
    assert(na.filter(pendingFilter(col("clustering_status"))).count() == 1)
  }

  test("normalize coerces present columns to the declared type (P9)") {
    import spark.implicits._
    val raw = Seq(("a", "f.txt", "u1", "12345")).toDF("id", "filename", "owner_id", "size")
    val n = normalize(raw)
    assert(n.schema("size").dataType == LongType)
    assert(n.head().getAs[Long]("size") == 12345L)
  }

  test("parseDocuments keeps the full record in raw_json and types the rest") {
    import spark.implicits._
    val line = """{"id":"d1","filename":"a.pdf","owner_id":"u9","tags":["x","y"],
      |"size":77,"clustering_status":null,"unknown_field":42,
      |"enriched_data":{"title":"T","keywords":["k1"],"entities":{"vendor":"v",
      |"people":[],"locations":[],"organizations":[],"items":[],
      |"amounts":[{"value":80.0,"currency":"TWD"}],"dates":[]}}}""".stripMargin.replace("\n", "")
    val parsed = CoreModel.parseDocuments(Seq(line).toDF("value"))
    val r = parsed.head()
    assert(r.getAs[String]("id") == "d1")
    assert(r.getSeq[String](r.fieldIndex("tags")) == Seq("x", "y"))
    assert(r.getAs[Long]("size") == 77L)
    assert(r.isNullAt(r.fieldIndex("clustering_status")))
    val enriched = r.getStruct(r.fieldIndex("enriched_data"))
    assert(enriched.getAs[String]("title") == "T")
    val amounts = enriched.getStruct(enriched.fieldIndex("entities"))
      .getSeq[org.apache.spark.sql.Row](5)
    assert(amounts.head.getDouble(0) == 80.0 && amounts.head.getString(1) == "TWD")
    // the unknown field survives only in the escape hatch
    assert(!parsed.columns.contains("unknown_field"))
    assert(r.getAs[String]("raw_json").contains("unknown_field"))
  }

  test("typed Dataset round-trip through the encoder") {
    import spark.implicits._
    val doc = GraftDocument(
      id = "00000000-0000-4000-8000-000000000001", filename = "t.txt",
      file_type = Some("text/plain"), size = Some(10L),
      uploader_device_id = None, owner_id = "u1", tags = Seq("a"),
      metadata_json = Some("""{"exif":"none"}"""),
      created_at = None, updated_at = None,
      status = DocumentStatus.Uploaded, vector_status = VectorStatus.NotVectorized,
      file_path = None, extracted_text = Some("hello"),
      text_extraction_completed_at = None,
      analysis = Some(AnalysisInfo(Some(5L), None, None, None, Some("m1"), None)),
      error_details = None, email_source = None, email_metadata_json = None,
      email_synced_at = None,
      enriched_data = Some(EnrichedData(Some("T"), None,
        Some(Entities(Some("v"), Seq("p"), Nil, Nil, Nil,
          Seq(Amount(Some(80.0), Some("TWD"))), Nil)), Seq("k"), Some(true))),
      cluster_info = Some(ClusterInfo(Some("cluster_u1_0"), None, Some(0.9), None, Some("v1.0"))),
      clustering_status = None, raw_json = None)
    val ds = spark.createDataset(Seq(doc))
    assert(ds.schema == documentSchema)
    assert(ds.collect().head == doc)
    // the typed relation feeds the untyped builder legs directly
    assert(ds.toDF().filter(pendingFilter(col("clustering_status"))).count() == 1)
  }

  test("clusteringStatusFilter truth table (crud_documents.py:44-59)") {
    import spark.implicits._
    val df = Seq[(Long, String)]((0, null), (1, "pending"), (2, "clustered"), (3, "excluded"))
      .toDF("id", "cs")
    def ids(c: org.apache.spark.sql.Column) =
      df.filter(c).select("id").collect().map(_.getLong(0)).toSet
    assert(ids(clusteringStatusFilter(col("cs"), "pending")) == Set(0L, 1L))
    assert(ids(clusteringStatusFilter(col("cs"), "clustered")) == Set(2L))
    assert(ids(clusteringStatusFilter(col("cs"), "excluded")) == Set(3L))
  }
}
