package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: 64-bit random-hyperplane LSH signature of
  * an embedding vector — bit `j` is set iff `dot(v, plane_j) > 0`, with
  * the same left-to-right double accumulation as [[ArrayDotProduct]].
  *
  * The 64×64 plane matrix (fixed seed, generated once per JVM — every
  * plan and every executor sees identical values) rides along as a
  * codegen reference object, so the whole signature is ONE compact plan
  * node and one fused 4096-flop loop. The naive formulation — 64
  * separate `when(array_dot(v, <64-literal array>) > 0, 1L << j)` terms
  * — builds a ~4k-node expression tree that costs ~2 s of analysis +
  * codegen on EVERY query submission: pure driver overhead that never
  * amortizes with data size. Vectors shorter than 64 dims are dotted
  * over their length; longer ones use the first 64 dims. Null → null.
  */
case class HyperplaneSig64(child: Expression) extends UnaryExpression {

  import HyperplaneSig64._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig64"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), Dim)
    val fl = isFloat
    var sig = 0L
    var j = 0
    while (j < NBits) {
      var acc = 0.0
      var d = 0
      val base = j * Dim
      while (d < n) {
        val v = if (fl) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc += v * Planes(base + d)
        d += 1
      }
      if (acc > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val planes = ctx.addReferenceObj("hyperplanes", Planes, "double[]")
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig"); val base = ctx.freshName("base")
      val getV = if (isFloat) s"(double) $arr.getFloat($d)" else s"$arr.getDouble($d)"
      s"""
         |final int $n = java.lang.Math.min($arr.numElements(), $Dim);
         |long $sig = 0L;
         |for (int $j = 0; $j < $NBits; $j++) {
         |  double $acc = 0.0;
         |  final int $base = $j * $Dim;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += ($getV) * $planes[$base + $d];
         |  }
         |  if ($acc > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig64 =
    copy(child = newChild)
}

object HyperplaneSig64 {
  val NBits = 64
  val Dim = 64

  /** Fixed-seed Gaussian hyperplanes, row-major (plane j at [j*Dim, (j+1)*Dim)). */
  val Planes: Array[Double] = {
    val rnd = new scala.util.Random(1729)
    Array.fill(NBits * Dim)(rnd.nextGaussian())
  }
}
