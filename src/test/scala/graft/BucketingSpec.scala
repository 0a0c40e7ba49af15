package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed co-located join — the 100 TB plan for the J1/J2 id joins
  * (SURVEY §4: "bucket by document_id for J1/J2"). Writing both sides
  * bucketed by the join key lets SortMergeJoin read co-located buckets
  * with NO shuffle exchange; this spec asserts the Exchange disappears
  * from the physical plan and results are unchanged.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is set (statically) in SparkSessionHelper; the
    // in-memory catalog is fresh each JVM, so stale table dirs from
    // earlier runs must be removed on disk too
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Seq("b_orders", "b_customer").foreach { t =>
      val p = java.nio.file.Paths.get(s"/tmp/graft-test-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }

    val d = "/root/testdata/sf0.001"
    Tables.orders(spark, d).write.bucketBy(8, "o_custkey")
      .sortBy("o_custkey").mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, d).write.bucketBy(8, "c_custkey")
      .sortBy("c_custkey").mode("overwrite").saveAsTable("b_customer")

    def joined = spark.table("b_orders")
      .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))

    // disable broadcast so the plan exercises the co-located
    // sort-merge path (the 100 TB case where neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side: no Exchange below
      // the SortMergeJoin (the final small groupBy may still exchange)
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), s"no SMJ in:\n$joinSection")
      assert(!joinSection.contains("Exchange"),
        s"unexpected shuffle under the bucketed join:\n$joinSection")
      assert(joinSection.contains("Bucketed: true"))

      // results identical to the unbucketed join
      val expected = Tables.orders(spark, d)
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").collect().toSeq
      assert(joined.orderBy("c_mktsegment").collect().toSeq == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
