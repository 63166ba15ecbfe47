package graft.engine.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the per-document character-distribution
  * statistics behind the char-diversity gibberish gate in one pass —
  * `struct(n_chars_sig, n_distinct, sum_sq, max_cnt)` over the
  * document's non-space code points.
  *
  * Value-identical to the higher-order composition
  * (`split(regexp_replace(text,' ',''), '')` → distinct → per-char
  * `filter`+`size` counts → folds, pinned in PropertySpec):
  *   - n_chars_sig = count of non-space code points;
  *   - n_distinct  = distinct non-space code points;
  *   - sum_sq      = Σ count(c)² (the Gini–Simpson numerator);
  *   - max_cnt     = max count(c).
  * All BIGINT — the gate's simpson_ppm / maxfrac_bp divisions happen
  * downstream in the same integer arithmetic, so the oracle hash is
  * unchanged.
  *
  * Why native: the lambda form walks `filter(chars, x => x = c)` once
  * per DISTINCT character, interpreted — O(σ·len) uncompiled per row
  * (measured 5.9 s at sf0.1, slope 7.2 on the 10× ladder). Here the
  * counts live in a per-row int-keyed map filled in one byte walk, the
  * expression stays inside whole-stage codegen, and the cost is O(len):
  * measured back under the linear controls. */
case class CharDiversityStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = CharDiversityStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_diversity_stats"

  override def nullSafeEval(input: Any): Any =
    CharDiversityStats.stats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.engine.functions.CharDiversityStats.stats($s);")

  override protected def withNewChildInternal(newChild: Expression): CharDiversityStats =
    copy(child = newChild)
}

object CharDiversityStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars_sig", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("max_cnt", LongType, nullable = false)))

  /** Shared by interpreted and generated code. One UTF-8 walk; code
    * points decoded from the lead byte (continuation bytes 10xxxxxx are
    * consumed with their lead), spaces (0x20) skipped. */
  def stats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val counts = new java.util.HashMap[Integer, Integer]()
    var n = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      // decode one code point (the fixture is ASCII; multi-byte kept
      // correct so non-Latin corpora don't miscount)
      var cp = 0
      var len = 1
      if (b < 0x80) { cp = b }
      else if ((b & 0xE0) == 0xC0) { len = 2; cp = b & 0x1F }
      else if ((b & 0xF0) == 0xE0) { len = 3; cp = b & 0x0F }
      else { len = 4; cp = b & 0x07 }
      var j = 1
      while (j < len && i + j < bytes.length) {
        cp = (cp << 6) | (bytes(i + j) & 0x3F); j += 1
      }
      i += len
      if (cp != 0x20) {
        n += 1
        counts.merge(cp, 1, (a, b2) => a + b2)
      }
    }
    var sumSq = 0L
    var maxCnt = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      sumSq += c * c
      if (c > maxCnt) maxCnt = c
    }
    new GenericInternalRow(Array[Any](n, counts.size.toLong, sumSq, maxCnt))
  }
}
