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
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark only reads via `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set in Verify/Bench/test sessions). Normalize: `ts` becomes a
    * micros-precision timestamp, `ts_ns` keeps the exact long for
    * precise ordering.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", F.col("ts"))
          .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
      case _ => raw.withColumn("ts_ns", F.col("ts").cast("long"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
