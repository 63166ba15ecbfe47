package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string —
  * the canonical-composition pass every text-curation pipeline runs
  * before hashing or deduplicating ("café" typed as `e`+combining-acute
  * must equal "café" typed precomposed, or exact dedup silently splits
  * identical documents). Spark ships no normalization function; this
  * wraps `java.text.Normalizer` (Form.NFC), whose output is pinned by
  * the Unicode normalization stability policy — DuckDB's
  * `nfc_normalize` computes the identical string, which is what lets
  * the operator hash-oracle cross-engine.
  *
  * ASCII fast path: a pure-ASCII string (the overwhelming common case
  * in a crawl after language filtering) is returned as-is with no
  * decode — `Normalizer.isNormalized` would still walk the chars, and
  * ASCII is NFC by construction. Null → null. */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NormalizeNfc.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.engine.functions.NormalizeNfc.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  /** Shared by interpreted and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) {
        val str = s.toString
        val out = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
        return if (out == str) s else UTF8String.fromString(out)
      }
      i += 1
    }
    s // pure ASCII is NFC already
  }
}
