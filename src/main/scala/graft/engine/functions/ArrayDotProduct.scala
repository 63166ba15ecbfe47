package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two float/double arrays with
  * double accumulation, evaluated left-to-right — numerically identical to
  * the `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)` higher-order
  * fold it replaces, but without materializing the intermediate product
  * array per row.
  *
  * This is the hot kernel of every similarity operator (SURVEY §2.2-I):
  * brute-force kNN, all-pairs near-dup, LSH signatures and IVF assignment
  * all reduce to dots over 64-float embeddings. On quadratic pair stages
  * the higher-order form allocates a 64-element array per pair; this
  * expression is a single fused loop inside whole-stage codegen.
  *
  * Lengths must match (fixture embeddings are fixed-dim); if they differ
  * the shorter length bounds the loop, mirroring zip_with-with-nulls
  * never arising in our pipelines. Null array → null.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val fx = isFloat(left); val fy = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv: Double = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val getX = if (isFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($getX) * ($getY);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}
