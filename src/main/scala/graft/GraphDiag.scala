package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-iteration plan evidence for the r16 graph pre-partition claim
  * (r16 verdict "what's wrong" #3): does the cached
  * `repartition(col("src"))` edge relation serve the per-round join
  * WITHOUT a fresh Exchange, or does the join re-shuffle it anyway?
  * Prints the FIRST-round join plan under both builds. Local
  * diagnosis only — never run by the driver. */
object GraphDiag {
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
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    val n = docs.count()
    val e = graft.operators.Graph.edges(docs, n).persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val docIds = docs.select(col("doc_id").as("id")).persist()
    val ranks0 = docIds.select(col("id"), (lit(1.0) / lit(n)).as("rank"))
    def round(eo: org.apache.spark.sql.DataFrame) =
      eo.join(ranks0, col("src") === col("id"))
        .select(col("dst"), col("src"),
          (col("rank") / col("out_deg").cast("double")).as("contrib"))
        .groupBy("dst")
        .agg(sum(col("contrib")).as("insum"))
    val withRep = e.join(outdeg, "src").repartition(col("src")).persist()
    withRep.count()
    println("===== WITH repartition(src).persist (r16 build) =====")
    round(withRep).explain("formatted")
    withRep.unpersist()
    val noRep = e.join(outdeg, "src").persist()
    noRep.count()
    println("===== WITHOUT repartition (persist only) =====")
    round(noRep).explain("formatted")
    spark.stop()
  }
}
