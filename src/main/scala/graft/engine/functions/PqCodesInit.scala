package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: product-quantization assignment of an
  * embedding against the fixed-seed INITIAL sub-codebooks — for each of
  * the `NSub` contiguous `SubDim`-slices, the 1-based index of its
  * nearest sub-centroid (first-tie-lowest-code argmin, the IVF rule).
  *
  * The distance is the EXPANDED squared L2 — `‖x‖² − 2·⟨x,c⟩ + ‖c‖²`
  * with both folds accumulated left-to-right in double and the centroid
  * norms precomputed once — numerically identical to the Column-tree
  * formulation it replaces (`array_dot(sv,sv) − 2.0·array_dot(sv,c) +
  * lit(cn)`), which the DuckDB oracle replays term for term.
  *
  * Like [[HyperplaneSig64]], the codebook rides along as a codegen
  * reference object: the naive 8-branch × 16-distance literal tree is
  * ~6k expression nodes costing ~2-3 s of analysis/optimization on
  * EVERY submission — pure driver overhead, independent of data (
  * measured: q_pq_train 3.18 s steady at sf0.1 AND 2.34 s at sf0.001).
  * This node replaces it with one fused 1k-flop loop. Vectors shorter
  * than 64 dims treat missing components as absent from the folds
  * (slice semantics), and a NULL ELEMENT is treated the same way
  * (absent from both folds, deterministically — never an undefined
  * getFloat read) — NOTE the DuckDB oracle does NOT share either
  * lenience (an out-of-bounds index or null element NULL-poisons its
  * folds): the oracle contract assumes the fixture's fixed 64-dim
  * non-null embeddings. Null array → null.
  */
case class PqCodesInit(child: Expression) extends UnaryExpression {

  import PqCodesInit._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_codes_init"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val out = new Array[Long](NSub)
    var m = 0
    while (m < NSub) {
      // ‖sv‖² over the in-bounds slice elements, left-to-right
      var svv = 0.0
      var d = 0
      while (d < SubDim && m * SubDim + d < arr.numElements()) {
        if (!arr.isNullAt(m * SubDim + d)) {
          val v = if (fl) arr.getFloat(m * SubDim + d).toDouble
                  else arr.getDouble(m * SubDim + d)
          svv += v * v
        }
        d += 1
      }
      var best = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < NCodes) {
        var acc = 0.0
        var i = 0
        val base = (m * NCodes + j) * SubDim
        while (i < SubDim && m * SubDim + i < arr.numElements()) {
          if (!arr.isNullAt(m * SubDim + i)) {
            val v = if (fl) arr.getFloat(m * SubDim + i).toDouble
                    else arr.getDouble(m * SubDim + i)
            acc += v * Flat(base + i)
          }
          i += 1
        }
        val dist = svv - 2.0 * acc + Norm2(m * NCodes + j)
        if (dist < best) { best = dist; bestJ = j + 1 }
        j += 1
      }
      out(m) = bestJ.toLong
      m += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cb = ctx.addReferenceObj("pqInitCodebook", Flat, "double[]")
      val cn = ctx.addReferenceObj("pqInitNorm2", Norm2, "double[]")
      val out = ctx.freshName("out"); val m = ctx.freshName("m")
      val d = ctx.freshName("d"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val svv = ctx.freshName("svv")
      val acc = ctx.freshName("acc"); val dist = ctx.freshName("dist")
      val best = ctx.freshName("best"); val bestJ = ctx.freshName("bestJ")
      val base = ctx.freshName("base"); val ne = ctx.freshName("ne")
      val vv = ctx.freshName("vv")
      def getV(idx: String) =
        if (isFloat) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |final int $ne = $arr.numElements();
         |final long[] $out = new long[$NSub];
         |for (int $m = 0; $m < $NSub; $m++) {
         |  double $svv = 0.0;
         |  for (int $d = 0; $d < $SubDim && $m * $SubDim + $d < $ne; $d++) {
         |    if (!$arr.isNullAt($m * $SubDim + $d)) {
         |      final double $vv = ${getV(s"$m * $SubDim + $d")};
         |      $svv += $vv * $vv;
         |    }
         |  }
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestJ = 0;
         |  for (int $j = 0; $j < $NCodes; $j++) {
         |    double $acc = 0.0;
         |    final int $base = ($m * $NCodes + $j) * $SubDim;
         |    for (int $i = 0; $i < $SubDim && $m * $SubDim + $i < $ne; $i++) {
         |      if (!$arr.isNullAt($m * $SubDim + $i)) {
         |        $acc += (${getV(s"$m * $SubDim + $i")}) * $cb[$base + $i];
         |      }
         |    }
         |    final double $dist = $svv - 2.0 * $acc + $cn[$m * $NCodes + $j];
         |    if ($dist < $best) { $best = $dist; $bestJ = $j + 1; }
         |  }
         |  $out[$m] = (long) $bestJ;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodesInit =
    copy(child = newChild)
}

object PqCodesInit {
  val NSub = 8
  val SubDim = 8
  val NCodes = 16

  /** Fixed-seed Gaussian initial sub-codebooks, flat [m][j][i] layout —
    * scaled 0.125 to the component stddev of unit-ish 64-dim embeddings
    * (an unscaled seed collapses the argmin onto a handful of codes).
    * The SAME values are embedded as literals in the DuckDB oracle. */
  val Flat: Array[Double] = {
    val rnd = new scala.util.Random(13)
    Array.fill(NSub * NCodes * SubDim)(rnd.nextGaussian() * 0.125)
  }

  /** ‖c‖² per sub-centroid, left-to-right folds — the literal third term
    * of the expanded distance, shared with the oracle. */
  val Norm2: Array[Double] = {
    val out = new Array[Double](NSub * NCodes)
    var k = 0
    while (k < NSub * NCodes) {
      var s = 0.0
      var i = 0
      while (i < SubDim) { s += Flat(k * SubDim + i) * Flat(k * SubDim + i); i += 1 }
      out(k) = s
      k += 1
    }
    out
  }
}
