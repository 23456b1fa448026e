package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftglue.ColumnGlue.{col => toCol, expr => toExpr}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization — the standard first
  * step of text cleaning for training corpora: visually identical strings
  * with different codepoint sequences (e + COMBINING ACUTE vs é) collapse
  * to one byte representation, so hashes, dedup and tokenization see one
  * form. Spark has no built-in normalizer; this wraps
  * java.text.Normalizer in a codegen-participating expression (same
  * pattern as the sketch expressions). Fast path: java.text.Normalizer
  * .isNormalized is O(n) with no allocation, and real-world corpora are
  * overwhelmingly already NFC. */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with EvalCallCodegen {
  override protected def castEval(src: String): String =
    s"(org.apache.spark.unsafe.types.UTF8String) $src"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
  override protected def withNewChildInternal(c: Expression)
      : NfcNormalizeExpr = copy(child = c)
}

object NfcNormalizeExpr {
  def nfc(c: Column): Column = toCol(NfcNormalizeExpr(toExpr(c)))
}
