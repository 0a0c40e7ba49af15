package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A full untimed warmup pass precedes the timed pass so JVM/codegen
  * warmup and first-touch parquet footer reads don't land on whichever
  * query happens to run first — reported numbers are steady-state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=a,b,c limits the run (local iteration only; the
    // driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Caches created inside a query (persisted multi-consumer
    // relations) are intra-query optimizations — clear between queries
    // so entries don't accumulate across 2×N runs and squeeze memory.
    def run(n: String, recordFailure: Boolean): Unit = {
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch {
        case e: Throwable =>
          if (recordFailure) failed += n
          System.err.println(s"[bench] $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      finally spark.catalog.clearCache()
    }
    // warmup pass (untimed)
    names.foreach(run(_, recordFailure = false))
    // timed pass
    val results = names.map { n =>
      val t0 = System.nanoTime()
      run(n, recordFailure = true)
      n -> (System.nanoTime() - t0) / 1e9
    }
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // Keep the line compact (3-decimal seconds): the driver parses it from
    // a bounded tail of the sbt output, so a bloated line gets truncated.
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
