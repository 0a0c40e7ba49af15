package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal column operators: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in executor-local batches.
  *
  * The decode step is a clearly-marked deterministic STUB (no media
  * libraries in this container); everything Spark-side is real:
  * schema, binary columns, mapPartitions batching (the JVM equivalent
  * of `mapInPandas` — decoder state initialized once per partition,
  * rows processed in batches of `batchSize`), and frame-sampling
  * explode. Swap `StubDecoder` for a JNI/FFI decoder at deployment;
  * the plan shape (map-only over the media scan, no shuffle) is
  * unchanged at 100 TB. Reference anchor: images skip text extraction
  * and flow to vision analysis (S5, `document_processing_service.py:93-121`).
  */
object Multimodal {

  /** Decoder contract: bytes → (width, height, channels). */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, Int)
  }

  /** STUB: deterministic pseudo-decode from byte length only (real
    * impl would parse the container header). Arithmetic is mirrored in
    * the DuckDB oracle, so the plumbing is verified end-to-end. */
  object StubDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      (64 + n % 512, 64 + (n / 2) % 512, 1 + n % 3)
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_bytes", LongType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  /** mapPartitions media decode: per-partition decoder init, batched
    * row processing (the mapInPandas batch shape, JVM-side). */
  def decodeMedia(media: DataFrame, decoder: MediaDecoder = StubDecoder,
                  batchSize: Int = 32): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id").cast("long"), col("content")).rdd
      .mapPartitions { it =>
        // decoder/codec context initialized once per partition
        val dec = decoder
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]](1)
            val (w, h, c) = dec.decode(bytes)
            Row(r.getLong(0), bytes.length.toLong, w, h, c)
          }
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Media table stand-in: document text bytes as the binary payload. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      encode(col("text"), "UTF-8").as("content"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("f0", DoubleType),
    StructField("f_sum", DoubleType)))

  /** Feature extraction (vision/audio-embedding stand-in): same
    * mapPartitions batch shape as decodeMedia — model weights would
    * load once per partition, rows run in batches. The STUB computes
    * `dim` deterministic pseudo-features from byte length with exact
    * integer arithmetic and ONE final double division, so the oracle
    * matches bit-for-bit. Emits (f0, f_sum) summaries, not the raw
    * array (array cells don't hash-compare portably). */
  def extractFeatures(media: DataFrame, dim: Int = 8, batchSize: Int = 32): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id").cast("long"), col("content")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val n = r.getAs[Array[Byte]](1).length.toLong
            val ints = (1 to dim).map(j => (n * j) % 997L)
            Row(r.getLong(0), ints.head.toDouble / 997.0, ints.sum.toDouble / 997.0)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Decode-metadata pass (stub arithmetic mirrored in the oracle —
    // verifies binary column plumbing + mapPartitions batch shape).
    "mm_decode_meta" -> ((s, d) =>
      decodeMedia(mediaTable(s, d)).orderBy("doc_id")),

    // Feature extraction over binary media (stubbed model, real
    // mapPartitions batch plumbing).
    "mm_feature_extract" -> ((s, d) =>
      extractFeatures(mediaTable(s, d)).orderBy("doc_id")),

    // Resize planning: target width 224, aspect-preserving integer
    // output dims from the decoded metadata (the pixel resample itself
    // is the stubbed device-side step; the plan is the map-only pass).
    "mm_resize" -> ((s, d) =>
      decodeMedia(mediaTable(s, d))
        .select(col("doc_id"), col("width"), col("height"),
          lit(224).as("out_w"),
          greatest(lit(1L), expr("CAST(height AS BIGINT) * 224 div width"))
            .cast("int").as("out_h"))
        .orderBy("doc_id")),

    // Frame sampling: 1 frame/sec capped at 10, byte length as
    // pseudo-duration-ms; 1 media row → N frame rows.
    "mm_frame_sample" -> ((s, d) =>
      mediaTable(s, d)
        .withColumn("duration_ms", length(col("content")).cast("long") * 10)
        .withColumn("n_frames",
          least(lit(10L), greatest(lit(1L), col("duration_ms") / lit(1000L))).cast("long"))
        .select(col("doc_id"), col("duration_ms"), col("n_frames"),
          posexplode(sequence(lit(0L), col("n_frames") - 1)).as(Seq("frame_idx", "k")))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          (col("k") * col("duration_ms") / col("n_frames")).cast("long").as("offset_ms"))
        .orderBy("doc_id", "frame_idx"))
  )

  val oracles: Map[String, String] = Map(
    "mm_decode_meta" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
        |  (64 + octet_length(encode(text)) % 512)::INT AS width,
        |  (64 + (octet_length(encode(text)) // 2) % 512)::INT AS height,
        |  (1 + octet_length(encode(text)) % 3)::INT AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_feature_extract" ->
      """SELECT doc_id,
        |  CAST((octet_length(encode(text))::BIGINT * 1) % 997 AS DOUBLE) / 997.0 AS f0,
        |  CAST(list_sum(list_transform(generate_series(1, 8),
        |         j -> (octet_length(encode(text))::BIGINT * j) % 997)) AS DOUBLE) / 997.0 AS f_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id,
        |  (64 + octet_length(encode(text)) % 512)::INT AS width,
        |  (64 + (octet_length(encode(text)) // 2) % 512)::INT AS height,
        |  224 AS out_w,
        |  greatest(1, ((64 + (octet_length(encode(text)) // 2) % 512)::BIGINT * 224)
        |              // (64 + octet_length(encode(text)) % 512))::INT AS out_h
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT * 10 AS duration_ms,
        |    least(10, greatest(1, (octet_length(encode(text))::BIGINT * 10) // 1000)) AS n_frames
        |  FROM documents)
        |SELECT doc_id, unnest(generate_series(0, n_frames - 1))::BIGINT AS frame_idx,
        |  (unnest(generate_series(0, n_frames - 1)) * duration_ms // n_frames)::BIGINT AS offset_ms
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin
  )
}
