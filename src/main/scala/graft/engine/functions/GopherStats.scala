package graft.engine.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the per-document Gopher rule statistics in
  * one narrow pass — `struct(n_words, mean_len_x100, rep_x10000)` over
  * the whitespace token stream (empty tokens skipped).
  *
  * Value-identical to the composed aggregate form
  * (explode → count per (doc, token) → per-doc sum/sum/max → join back,
  * pinned in FunctionsSpec):
  *   - n_words       = count of non-empty tokens (multiplicity kept);
  *   - mean_len_x100 = floor(100.0 · Σ numChars(token) / n_words);
  *   - rep_x10000    = floor(10000.0 · max term frequency / n_words);
  * with mean/rep NULL when n_words = 0 (the composed form's left-join
  * null for token-less docs). The divisions replay the exact double
  * arithmetic of both the Column form (`floor(lit(100.0)·sum/n)`) and
  * the DuckDB oracle (`floor(100.0·sum_len/n_words)`), so the values
  * hash-oracle unchanged.
  *
  * Why native: the composed form is two corpus-wide shuffles (token
  * explode → (doc, token) aggregate → doc aggregate) plus a join back to
  * the id spine, all to compute a quantity that is a pure function of
  * one document. Here a token is a zero-copy byte slice of the text
  * (the DupNgramBp discipline), term frequencies live in a per-row hash
  * map, and the whole gate becomes one projection inside whole-stage
  * codegen — no exchange at any corpus size. */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = GopherStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gopher_stats"

  override def nullSafeEval(input: Any): Any =
    GopherStats.stats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.engine.functions.GopherStats.stats($s);")

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_len_x100", LongType, nullable = true),
    StructField("rep_x10000", LongType, nullable = true)))

  /** Shared by interpreted and generated code. */
  def stats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    var nWords = 0L
    var sumLen = 0L
    var maxTf = 0
    // term frequencies over zero-copy token views; 0x20 never occurs
    // inside a multi-byte UTF-8 sequence, so byte slicing is safe
    val tf = new java.util.HashMap[UTF8String, Int]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        if (i > start) { // skip empty tokens (the len(token) > 0 filter)
          val tok = UTF8String.fromBytes(bytes, start, i - start)
          nWords += 1
          sumLen += tok.numChars()
          val c = tf.merge(tok, 1, (a, b) => a + b)
          if (c > maxTf) maxTf = c
        }
        start = i + 1
      }
      i += 1
    }
    if (nWords == 0L) new GenericInternalRow(Array[Any](0L, null, null))
    else new GenericInternalRow(Array[Any](
      nWords,
      math.floor(100.0 * sumLen / nWords).toLong,
      math.floor(10000.0 * maxTf / nWords).toLong))
  }
}
