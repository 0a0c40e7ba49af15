package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Search}

/** Throwaway parameter sweep for the HNSW tier at BENCHVEC scale —
  * reads the cached benchdata layouts and prints recall/time per
  * schedule config. Not part of any driver contract. */
object HnswTune {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Dim = 768
    val NQ = 8
    def cluVec(id: Long): Array[Double] = {
      val c = BenchVec.hashUnitVec(9000000L + id % 1024, Dim)
      val n = BenchVec.hashUnitVec(4000000L + id, Dim)
      val v = Array.tabulate(Dim)(j => c(j) + 0.6 * n(j))
      val nn = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nn)
    }
    def cluQv(i: Int): Seq[Double] = {
      val t = cluVec(8000L * i)
      val noise = BenchVec.hashUnitVec(3100000L + i, Dim)
      val v = Array.tabulate(Dim)(j => t(j) + 0.5 * noise(j))
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val clu = spark.read.parquet("benchdata/vec768_500k_clu")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .persist()
    clu.count()
    val adjPath = "benchdata/vec768_500k_clu_hnsw_sib"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(adjPath))) {
      def mkPlanes(n: Int, seedBase: Long): Array[Array[Double]] =
        Array.tabulate(n)(p => BenchVec.hashUnitVec(seedBase + p, Dim))
      val hPlanes = mkPlanes(13, 7200000L)
      def codeOfLocal(planes: Array[Array[Double]], v: Seq[Double]): Long = {
        val a = v.toArray
        var code = 0L; var p = 0
        while (p < planes.length) {
          val pl = planes(p); var s = 0.0; var j = 0
          while (j < Dim) { s += a(j) * pl(j); j += 1 }
          if (s >= 0.0) code |= (1L << p)
          p += 1
        }
        code
      }
      val codeU = udf((e: Seq[Double]) => codeOfLocal(hPlanes, e))
      val t0 = System.nanoTime()
      Hnsw.build(clu, m = 8, maxLevel = 13, b0 = 13, siblingProbe = true,
          codeFn = c => codeU(c))
        .write.mode("overwrite").partitionBy("lvl").parquet(adjPath)
      println(f"r1 build sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val adj = spark.read.parquet(adjPath).persist()
    println(s"edges=${adj.count()}")
    val entry = Hnsw.entryOf(clu, 13)
    println(s"entry=$entry")
    import spark.implicits._
    val qdf = (0 until NQ).map(i => (i.toLong, cluQv(i))).toDF("q_id", "q_emb")
    val brute = Search.knnBatch(clu, (0 until NQ).map(i => (i.toLong, cluQv(i))), 10, -1.0)
      .select("q_id", "vec_id").collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    for ((wide, nf, nw, ef0, r0) <- Seq(
        (1024, 7, 128, 64, 3), (2048, 6, 192, 96, 3), (512, 8, 96, 48, 3),
        (2048, 6, 256, 128, 4))) {
      val sched = Hnsw.wideSchedule(13, wide, nf, nw, ef0, r0)
      val t0 = System.nanoTime()
      val hits = Hnsw.searchBatch(clu, adj, qdf, k = 10, maxLevel = 13,
          entry0 = entry, sched = sched)
        .select("q_id", "vec_id").collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val sec = (System.nanoTime() - t0) / 1e9
      val rec = (0 until NQ).map(i => (hits(i.toLong) & brute(i.toLong)).size / 10.0).sum / NQ
      val tgt = (0 until NQ).count(i => hits(i.toLong).contains(8000L * i)) / 8.0
      println(f"WIDE w=$wide nf=$nf nw=$nw ef0=$ef0 r0=$r0 -> recall=$rec%.3f target=$tgt%.3f sec=$sec%.1f")
    }
    spark.stop()
  }
}
