package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's flagship smoke check: a BARE session (no
  * engine-specific configs — notably no nanosAsLong flag) running
  * `SparkEntry.entry`, asserting rows > 0. Run before shipping a
  * round: `sbt "runMain graft.SmokeEntry"`. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
