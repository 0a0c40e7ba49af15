package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnostic: compare task-InputMetrics bytes vs Hadoop
  * FileSystem global statistics for one full parquet scan. */
object BytesProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          lBytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    })
    def fsBytes(): Long = {
      import scala.jdk.CollectionConverters._
      org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala
        .filter(_.getScheme == "file").map(_.getBytesRead).sum
    }
    def rchar(): Long =
      scala.io.Source.fromFile("/proc/self/io").getLines()
        .collectFirst { case l if l.startsWith("rchar:") =>
          l.stripPrefix("rchar:").trim.toLong }.get
    val df = spark.read.parquet("benchdata/vec768_500k")
      .select(col("vec_id"), col("embedding"))
    // pass 1 (cold), pass 2 (page-cached)
    for (p <- 1 to 2) {
      val l0 = lBytes.get(); val f0 = fsBytes(); val r0 = rchar()
      val n = df.withColumn("s", element_at(col("embedding"), 1)).agg(sum("s")).head()
      Thread.sleep(2000)
      println(s"pass$p listener=${lBytes.get() - l0} fsStats=${fsBytes() - f0} " +
        s"rchar=${rchar() - r0} r=$n")
    }
    // narrow projection: vec_id only — rchar should DROP if column
    // pruning reaches the scan
    val r0 = rchar()
    df.select("vec_id").agg(sum("vec_id")).head()
    Thread.sleep(2000)
    println(s"narrow rchar=${rchar() - r0}")
    spark.stop()
  }
}
