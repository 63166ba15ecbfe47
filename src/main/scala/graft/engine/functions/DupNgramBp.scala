package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: duplicate-n-gram share of a document's
  * whitespace token stream, in floored basis points —
  * `floor((total − distinct)·10⁴ / total)`, 0 when no n-gram exists.
  *
  * Value-identical to the composed
  * `floor((size(g) − size(array_distinct(g)))·10⁴ / size(g))` over
  * `transform(arrays_zip(slice…), concat_ws(" ", …))` n-grams (pinned in
  * FunctionsSpec), but with none of its cost: the composed form runs its
  * lambdas interpreted and materializes every n-gram string twice. Here
  * an n-gram IS a byte slice of the original text (tokens joined by a
  * single space are literally the substring from token i's start to
  * token i+n−1's end), so the pass tokenizes once and counts distinct
  * slices as zero-copy `UTF8String` views in a hash set — exact string
  * distinct (no hash-collision approximation), one allocation per
  * DISTINCT gram view, nothing per duplicate. */
case class DupNgramBp(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int), got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dup_ngram_bp"

  override def nullSafeEval(text: Any, n: Any): Any =
    DupNgramBp.dupBp(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.engine.functions.DupNgramBp.dupBp($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DupNgramBp =
    copy(left = newLeft, right = newRight)
}

object DupNgramBp {
  /** Shared by interpreted and generated code. */
  def dupBp(s: UTF8String, n: Int): Long = {
    if (n <= 0) return 0L
    val bytes = s.getBytes
    // token start offsets (split(" ", -1) semantics: empties kept)
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) nTok += 1; i += 1 }
    if (nTok < n) return 0L
    val starts = new Array[Int](nTok + 1) // sentinel: end-of-text + 1
    var k = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(nTok) = bytes.length + 1
    val total = nTok - n + 1
    val seen = new java.util.HashSet[UTF8String](total * 2)
    var g = 0
    while (g < total) {
      // n-gram g spans token g's start to token (g+n-1)'s end — the end
      // is one byte before token (g+n)'s start (or end of text)
      val from = starts(g)
      val len = starts(g + n) - 1 - from
      seen.add(UTF8String.fromBytes(bytes, from, len))
      g += 1
    }
    val dup = total - seen.size
    // floor((dup * 1e4) / total) in exact integer arithmetic
    dup.toLong * 10000L / total.toLong
  }
}
