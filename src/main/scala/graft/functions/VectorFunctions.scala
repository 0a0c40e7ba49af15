package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

/** Vector primitives for the search operators (SURVEY.md §2.3, §2.12).
  *
  * The reference computes cosine similarity as the dot product of
  * L2-normalized vectors (`backend/app/services/vector/embedding_service.py:181-209`,
  * `normalize_embeddings=True` at `:124`). Here the hot path is a
  * codegen'd Catalyst `Expression` (stays inside whole-stage codegen;
  * no UDF serialization boundary), accumulating strictly
  * left-to-right in `double` — the same accumulation order DuckDB's
  * `list_inner_product(a::DOUBLE[], b::DOUBLE[])` uses, so oracle
  * comparisons are bit-exact.
  *
  * Scale note: a brute-force kNN scan is O(n·d) per query with zero
  * shuffle — the scan partitions evaluate the expression locally and
  * only top-k rows reach the driver (`TakeOrderedAndProject`). At
  * 100 TB the vectors table is partitioned by tenant (`owner_id`),
  * so partition pruning bounds each query to one tenant's shard.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemGetter(t: DataType, arr: String, i: String): String =
    t match {
      case ArrayType(FloatType, _)  => s"(double)$arr.getFloat($i)"
      case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
      case _ => throw new IllegalStateException(s"unsupported $t")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val yf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${elemGetter(left.dataType, a, i)} * ${elemGetter(right.dataType, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2-normalize an array<float|double> → array<double> (zero vector
  * stays zero, mirroring the reference's zero-vector fallback at
  * `embedding_service.py:114-115,129-130`). Interpreted eval only —
  * used in the (embed-bound) index pipeline, not the query hot path.
  */
case class L2Normalize(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val fl = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = x.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val xi = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = xi; ss += xi * xi; i += 1
    }
    if (ss > 0) {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < n) { out(i) *= inv; i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorFunctions {
  /** Cosine similarity of two pre-normalized vectors == dot product. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  def l2normalize(a: Column): Column =
    GraftBridge.column(L2Normalize(GraftBridge.expression(a)))

  /** Full cosine (un-normalized inputs): dot / (|a|·|b|), 0 on zero norm —
    * reference zero-norm guard `embedding_service.py:195-200`. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = F.sqrt(dot(a, a))
    val nb = F.sqrt(dot(b, b))
    F.when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }
}
