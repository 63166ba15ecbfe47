package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: |a ∩ b| for two SORTED long arrays via a
  * single merge walk — no per-row hash set, no boxing, stays inside
  * whole-stage codegen.
  *
  * This is the hot kernel of LSH near-dup verification (SURVEY §2.2-I):
  * after banding, millions of candidate pairs each need an exact overlap
  * count between pre-hashed, pre-sorted token sets. Spark's built-in
  * `size(array_intersect(a, b))` builds an OpenHashSet per row; the merge
  * walk is O(|a|+|b|) with zero allocation, ~4× faster on 30–60 element
  * arrays and far better cache behavior at 100 TB fan-out.
  *
  * Contract: both inputs ascending-sorted with distinct elements (as
  * produced by `array_sort(array_distinct(...))`-shaped pipelines);
  * null array → null, element nulls are not expected (hash outputs).
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val n = ctx.freshName("n")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $n = 0;
         |final int $nx = $x.numElements();
         |final int $ny = $y.numElements();
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $x.getLong($i);
         |  final long $yv = $y.getLong($j);
         |  if ($xv < $yv) { $i++; } else if ($xv > $yv) { $j++; } else { $n++; $i++; $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}
