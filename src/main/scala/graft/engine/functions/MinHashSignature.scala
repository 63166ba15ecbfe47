package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the k=16 MinHash signature of a token-hash
  * set, as ONE fused pass over the array.
  *
  * Input: `array<bigint>` of (xx)hashed tokens. For each element `sh` the
  * base hash is `h = pmod(sh, 2^31-1)`; signature component `i` is
  * `min over tokens of (h * A(i) + B(i)) mod (2^61-1)` — the classic
  * affine-permutation family, with the 31-bit domain keeping `h * A(i)`
  * below 2^63 (no overflow, no ANSI interception).
  *
  * Why an expression and not an aggregate: the signature is a pure
  * function of one row's token array, so the natural Spark shape is a
  * scalar projection. The previous formulation (SURVEY §7.3's "v2
  * MinHash sketch" roadmap item, now shipped) had to `explode` the
  * array and run 16 separate `min` aggregates — one extra shuffle of
  * |corpus| × |tokens| rows and a 16-buffer hash-agg per group. This
  * expression removes that entire stage: signatures are computed inside
  * whole-stage codegen as rows stream out of the dedup group stage, and
  * the ONLY remaining shuffles in the minhash path are the group-by-set
  * collapse and the band self-join. At 100 TB that is the difference
  * between shuffling the tokenized corpus twice and shuffling it once.
  *
  * Bit-identical to the explode formulation by construction (same
  * constants, same arithmetic, same orderless min). Empty array →
  * all-Long.MaxValue signature (the explode form dropped such rows; the
  * caller never produces an empty token set because `split` of an empty
  * string yields `[""]`). Null array → null.
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  import MinHashSignature._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var j = 0
    while (j < n) {
      var h = arr.getLong(j) % HashDomain
      if (h < 0) h += HashDomain
      var i = 0
      while (i < NumPerms) {
        val v = (h * PermA(i) + PermB(i)) % MersennePrime
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val pa = ctx.addReferenceObj("minhashPermA", PermA, "long[]")
      val pb = ctx.addReferenceObj("minhashPermB", PermB, "long[]")
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $mins = new long[$NumPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $arr.getLong($j) % ${HashDomain}L;
         |  if ($h < 0) $h += ${HashDomain}L;
         |  for (int $i = 0; $i < $NumPerms; $i++) {
         |    final long $v = ($h * $pa[$i] + $pb[$i]) % ${MersennePrime}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val NumPerms = 16
  val MersennePrime: Long = (1L << 61) - 1
  val HashDomain: Long = 2147483647L // 2^31-1

  /** Fixed-seed affine permutation family (a ∈ [1, 2^31-1], b ∈ [0, 2^31-1)).
    * Seed 7 — the same family the explode formulation used, so signatures
    * are stable across engine versions. */
  val (permA, permB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(7)
    val pairs = Array.fill(NumPerms)((math.abs(rnd.nextLong()) % HashDomain + 1,
                                      math.abs(rnd.nextLong()) % HashDomain))
    (pairs.map(_._1), pairs.map(_._2))
  }
  private val PermA = permA
  private val PermB = permB
}
