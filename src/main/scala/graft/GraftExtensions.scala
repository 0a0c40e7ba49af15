package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.{DotProduct, L2Normalize}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql` users get the
  * codegen'd hot path too:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   spark.sql("SELECT dot_product(embedding, other) ...")
  *
  * (Per SURVEY §4 no custom planner Strategy is required — every
  * operator compiles to existing physical nodes; a KNN strategy slot
  * would only be added alongside an index-backed scan source.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "dot_product"),
        (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("l2_normalize"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[L2Normalize].getName, "l2_normalize"),
        (children: Seq[Expression]) => L2Normalize(children.head)))
  }
}
