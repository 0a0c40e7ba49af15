package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned-parquet scans over object
  * storage; all queries in this library filter/project before any
  * shuffle so Catalyst pushes predicates + column pruning into the
  * scan (verify with `.explain("formatted")` → `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  /** The events table's `ts` physical type has varied across testdata
    * generations: parquet TIMESTAMP(NANOS) (readable only as a long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`), and parquet
    * timestamp[us] (which Spark 4 reads as TIMESTAMP_NTZ when
    * isAdjustedToUTC=false). Normalize both to one contract:
    * `ts` is always a micros-precision TimestampType and `ts_ns` is
    * always exact epoch nanos. Sessions pin UTC, so the NTZ→LTZ cast
    * is an identity on the underlying micros value — and never use
    * `cast(ts as long)` (illegal for NTZ, epoch-*seconds* for LTZ).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", F.col("ts"))
          .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", F.col("ts").cast("timestamp"))
          .withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000L))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
