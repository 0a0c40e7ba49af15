package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's scalar text functions, so
  * `spark.sql` users can run the full pipeline vocabulary without the
  * Scala API (the Catalyst expressions dot_product / l2_normalize are
  * registered separately via GraftExtensions and stay codegen'd):
  *
  *   graft.functions.SqlFunctions.registerAll(spark)
  *   spark.sql("SELECT explode(graft_chunk(text, 462, 50)) FROM docs")
  *
  * All are deterministic pure functions (TextOpsSpec pins semantics).
  */
object SqlFunctions {
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("graft_chunk",
      (text: String, size: Int, overlap: Int) => TextOps.chunkText(text, size, overlap))
    spark.udf.register("graft_truncate",
      (text: String, maxLen: Int) => TextOps.smartTruncate(text, maxLen))
    spark.udf.register("graft_compress_list",
      (items: Seq[String], maxLen: Int) => TextOps.smartCompressList(items, maxLen))
    spark.udf.register("graft_embed",
      (text: String) => new HashEmbedder(64).embed(text))
  }
}
