package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the positioned n-gram array of a
  * document's whitespace token stream — `pos_grams(text, n, skip_empty)`
  * emits every run of `n` adjacent tokens joined by a single space, in
  * order, duplicates kept (positions matter to the consumers: anchor
  * diagonals in substring dedup / exact decontamination, collocation
  * counts in n-gram stats).
  *
  * Value-identical (pinned in FunctionsSpec) to the composed
  * `transform(arrays_zip(slice(t,1,sz−n+1) … slice(t,n,sz−n+1)),
  * concat_ws(" ", …))` over `t = split(text, " ")` — with
  * `skip_empty = true`, over `filter(t, length > 0)` — but with none of
  * its cost: the composed form evaluates its lambdas INTERPRETED (no
  * whole-stage codegen across a higher-order function) and materializes
  * every token once in the zip and again in the concat. Here
  * tokenization is one byte scan (0x20 never occurs inside a UTF-8
  * multi-byte sequence), and since tokens split on a single space,
  * `n` adjacent tokens joined by " " are literally the substring from
  * token i's first byte to token i+n−1's last — each gram a zero-copy
  * `UTF8String` view. With `skip_empty = true` a gram spanning filtered
  * empties (consecutive spaces in the original) is the one case that
  * allocates; runs of non-empty tokens still slice.
  *
  * Null text → null (the composed `when` form yields an empty array
  * instead; every consumer feeds a generator, where both vanish). */
case class PosGrams(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, BooleanType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int, boolean), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pos_grams"

  override def nullSafeEval(text: Any, n: Any, skipEmpty: Any): Any =
    PosGrams.grams(text.asInstanceOf[UTF8String], n.asInstanceOf[Int],
      skipEmpty.asInstanceOf[Boolean])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, sk) =>
      s"${ev.value} = graft.engine.functions.PosGrams.grams($t, $n, $sk);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PosGrams =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PosGrams {
  private val EMPTY = new GenericArrayData(new Array[Any](0))

  /** Shared by interpreted and generated code. */
  def grams(s: UTF8String, n: Int, skipEmpty: Boolean): ArrayData = {
    if (n <= 0) return EMPTY
    val bytes = s.getBytes
    // token start offsets, split(" ", -1) semantics (empties kept here;
    // sentinel start(nTok) = end-of-text + 1 so token k's last byte is
    // starts(k + 1) − 2)
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    var k = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(nTok) = bytes.length + 1
    if (!skipEmpty) {
      val total = nTok - n + 1
      if (total <= 0) return EMPTY
      val out = new Array[Any](total)
      var g = 0
      while (g < total) {
        val from = starts(g)
        out(g) = UTF8String.fromBytes(bytes, from, starts(g + n) - 1 - from)
        g += 1
      }
      return new GenericArrayData(out)
    }
    // skip_empty: gram over the NON-EMPTY token subsequence. Token spans
    // as (start, end) pairs of the kept tokens only.
    val ks = new Array[Int](nTok)
    val ke = new Array[Int](nTok)
    var m = 0
    var t = 0
    while (t < nTok) {
      val from = starts(t)
      val end = starts(t + 1) - 1
      if (end > from) { ks(m) = from; ke(m) = end; m += 1 }
      t += 1
    }
    val total = m - n + 1
    if (total <= 0) return EMPTY
    val out = new Array[Any](total)
    var g = 0
    while (g < total) {
      val from = ks(g)
      val end = ke(g + n - 1)
      // byte length of the joined gram: token bytes + n−1 single spaces
      var glen = n - 1
      var j = 0
      while (j < n) { glen += ke(g + j) - ks(g + j); j += 1 }
      if (end - from == glen) {
        // members are contiguous (every separator a single space in the
        // original) — zero-copy view
        out(g) = UTF8String.fromBytes(bytes, from, glen)
      } else {
        val buf = new Array[Byte](glen)
        var w = 0
        j = 0
        while (j < n) {
          if (j > 0) { buf(w) = 0x20; w += 1 }
          val len = ke(g + j) - ks(g + j)
          System.arraycopy(bytes, ks(g + j), buf, w, len)
          w += len
          j += 1
        }
        out(g) = UTF8String.fromBytes(buf)
      }
      g += 1
    }
    new GenericArrayData(out)
  }
}
