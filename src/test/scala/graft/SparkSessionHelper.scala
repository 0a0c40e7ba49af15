package graft

import org.apache.spark.sql.SparkSession

object SparkSessionHelper {
  // One session for every suite (never stopped mid-run: suites share
  // the JVM-wide SparkContext). Built with GraftExtensions so the
  // SQL-function registration is exercised by the shared session.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
    .withExtensions(new GraftExtensions)
    .getOrCreate()
}
