package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing fingerprint selection
  * (Schleimer-Wilkerson-Aiken) — `winnow_fps(text, k, w)` returns the
  * ordered `array<struct<pos, fp>>` of rightmost-minimal [[PolyHash31]]
  * k-token-gram hashes per w-wide sliding window, consecutive duplicate
  * selections collapsed (1-based gram positions).
  *
  * Value-identical (pinned in FunctionsSpec) to the composed
  * `array_distinct(transform(sequence(1, n_win), i -> struct(i +
  * size(win) − array_position(reverse(win), array_min(win)), …)))` over
  * `win = slice(hashes, i, w)`: docs with fewer than w grams get ONE
  * window over whatever exists, under-k-token docs yield the empty
  * array, and rightmost tie-breaking matches the reversed-window
  * first-occurrence arithmetic. The composed form evaluates its nested
  * lambdas INTERPRETED and copies w elements per window (slice +
  * reverse per window ⇒ O(n·w) allocations; measured 23 s at sf0.1);
  * here gram slicing reuses [[PosGrams]] zero-copy views, hashing is
  * the shared [[PolyHash31]] fold, and selection is the classic O(n)
  * monotonic deque (pop-while `h[back] >= h[new]`, so surviving fronts
  * are the RIGHTMOST minima), all inside whole-stage codegen.
  *
  * Null text → null. */
case class WinnowFps(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = WinnowFps.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(text: Any, k: Any, w: Any): Any =
    WinnowFps.fps(text.asInstanceOf[UTF8String], k.asInstanceOf[Int], w.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, w) =>
      s"${ev.value} = graft.engine.functions.WinnowFps.fps($t, $k, $w);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowFps =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowFps {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  private val EMPTY = new GenericArrayData(new Array[Any](0))

  /** Shared by interpreted and generated code. */
  def fps(s: UTF8String, k: Int, w: Int): ArrayData = {
    if (k <= 0 || w <= 0) return EMPTY
    val grams = PosGrams.grams(s, k, true)
    val n = grams.numElements()
    if (n == 0) return EMPTY
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = PolyHash31.hash(grams.getUTF8String(i)); i += 1 }
    // fewer grams than the window: one window over everything
    val wEff = if (n < w) n else w
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // live indices in deque([head, tail)), hashes strictly increasing
    val outPos = new Array[Long](n - wEff + 1)
    val outFp = new Array[Long](n - wEff + 1)
    var m = 0
    var last = -1
    i = 0
    while (i < n) {
      // >= pop keeps the NEWEST of equal hashes → fronts are rightmost minima
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i
      tail += 1
      val winStart = i - wEff + 1
      if (winStart >= 0) {
        while (deque(head) < winStart) head += 1
        val sel = deque(head)
        // selected indices are nondecreasing across windows, so
        // last-index comparison IS the array_distinct of the selections
        if (sel != last) {
          outPos(m) = sel + 1L
          outFp(m) = h(sel)
          m += 1
          last = sel
        }
      }
      i += 1
    }
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      rows(j) = new GenericInternalRow(Array[Any](outPos(j), outFp(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }
}
