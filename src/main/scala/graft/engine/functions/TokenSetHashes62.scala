package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the sorted distinct [[PolyHash62]] set of
  * a document's whitespace tokens — the token-identity array the whole
  * MinHash pipeline consumes (signature input, identical-set grouping
  * key, exact-Jaccard verification operand).
  *
  * Value-identical to
  * `array_sort(array_distinct(transform(array_distinct(split(text, " ")),
  * poly_hash62)))` (pinned in FunctionsSpec): deduping token HASHES
  * equals deduping tokens first and hashes after, since equal tokens
  * hash equally — so the token-level distinct is skipped and the whole
  * thing is one pass over the UTF-8 bytes (byte-slice tokens, 0x20 never
  * occurs inside a multi-byte sequence) into a primitive long array,
  * sort, in-place dedupe. The composed form runs its lambdas INTERPRETED
  * (two array materializations plus per-element closure dispatch, outside
  * whole-stage codegen); this inlines into the surrounding stage.
  *
  * Tokenization matches Spark `split(text, " ", -1)`: empty tokens kept
  * (hash 0), the empty string is one empty token. Null → null. */
case class TokenSetHashes62(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_set_hashes62"

  override def nullSafeEval(input: Any): Any =
    TokenSetHashes62.hashes(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.engine.functions.TokenSetHashes62.hashes($s);")

  override protected def withNewChildInternal(newChild: Expression): TokenSetHashes62 =
    copy(child = newChild)
}

object TokenSetHashes62 {
  /** Shared by interpreted and generated code. */
  def hashes(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) n += 1; i += 1 }
    val h = new Array[Long](n + 1) // tokens = spaces + 1
    var k = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        h(k) = PolyHash62.hash(UTF8String.fromBytes(bytes, start, i - start))
        k += 1
        start = i + 1
      }
      i += 1
    }
    java.util.Arrays.sort(h)
    // in-place dedupe of the sorted run
    var w = 0
    var r = 0
    while (r < h.length) {
      if (r == 0 || h(r) != h(r - 1)) { h(w) = h(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(h, w))
  }
}
