package graft

import org.apache.spark.sql.SparkSession

/** Per-query job attribution (local diagnosis only — never run by the
  * driver): runs each query named in SPARK_GRAFT_ONLY with a listener
  * that groups Spark jobs by the callsite of their result stage, so a
  * 150-job episode loop can be broken down to the exact code lines
  * launching jobs (guide §1: measure first, then optimize the biggest
  * source). Output: per query, total jobs + a callsite histogram.
  */
object JobDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
      .getOrElse(Seq.empty)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        // the result stage's callsite names the action; for AQE stage-
        // materialization jobs (generic callsite) fall back to the
        // first NON-generic stage name, which names the shuffle source
        val names = js.stageInfos.map(_.name)
        val generic = "withThreadLocalCaptured"
        val site = names.lastOption.filterNot(_.contains(generic))
          .orElse(names.find(!_.contains(generic)))
          .getOrElse(names.lastOption.getOrElse("?"))
        val nStages = js.stageInfos.size
        val nTasks = js.stageInfos.map(_.numTasks).sum
        jobs.add(s"$site\t$nStages\t$nTasks"): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (n <- names) {
      jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      BenchProbe.drainListenerBus(spark)
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val rows = jobs.toArray.map(_.toString)
      val hist = rows.groupBy(_.split("\t")(0)).toSeq
        .map { case (site, rs) =>
          (site, rs.length, rs.map(_.split("\t")(2).toInt).sum) }
        .sortBy(-_._2)
      println(s"== $n: ${rows.length} jobs, ${"%.2f".format(wall)} s " +
        s"(first run, incl. warmup)")
      hist.foreach { case (site, nJ, nT) =>
        println(f"   $nJ%4d jobs $nT%6d tasks  $site")
      }
    }
    spark.stop()
  }
}
