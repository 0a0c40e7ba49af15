package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen Catalyst expression — the
  * canonical-composition pass every multilingual corpus cleaning
  * pipeline runs before hashing/dedup (the same byte sequence can
  * arrive precomposed U+00E9 or decomposed e+U+0301; exact dedup and
  * fingerprinting treat them as different documents unless normalized
  * first). JDK `java.text.Normalizer` implements the standard
  * algorithm, so no library dependency; the already-normalized fast
  * path (the overwhelming majority of real text) returns the input
  * UTF8String without a copy.
  */
object UnicodeNorm {
  /** Static entry for generated code (object has no companion class,
    * so Scala emits a static forwarder reachable from Janino). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcCol(c: Column): Column =
    GraftBridge.column(NfcExpr(GraftBridge.expression(c)))
}

case class NfcExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
