package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the k-component MinHash signature of a
  * token-hash set, as ONE fused pass over the array (k = 16 by default,
  * parameterizable up to [[MinHashSignature.MaxK]] — r7 exposed the LSH
  * parameters so callers can trade recall against signature cost).
  *
  * Input: `array<bigint>` of (xx)hashed tokens. For each element `sh` the
  * base hash is `h = pmod(sh, p)` with `p = 2^31-1`; signature component
  * `i` is `min over tokens of (h * A(i) + B(i)) mod p` — the classic
  * Broder affine family over the PRIME domain: for A(i) ≢ 0 the map is a
  * genuine bijection of Z_p, so the k components behave as k independent
  * permutations and the LSH S-curve holds (spec-pinned in
  * MinHashParamSpec). The 31-bit domain keeps `h * A(i)` below 2^63 (no
  * overflow, no ANSI interception).
  *
  * HISTORY (r7 fix): the original family reduced mod 2^61-1 instead —
  * but `h * A(i) < 2^62` barely wraps that modulus, so the "perms" were
  * near order-preserving in h, every component shared one argmin, and
  * banding degenerated to ONE effective permutation (recall ≈ J instead
  * of 1-(1-J^r)^b, and band buckets blew up quadratically on shared
  * min-tokens — the property spec caught it). Signatures changed when
  * this was fixed; the DuckDB oracle replications changed in lockstep.
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
  * PREFIX STABILITY: the permutation family is one fixed-seed stream, so
  * `sig(k')` is a prefix of `sig(k)` for k' < k — a k=16 signature is
  * bit-identical whether requested directly or sliced from k=32
  * (spec-pinned). Existing fixtures and the DuckDB oracle constants are
  * therefore untouched by the parameterization.
  *
  * Bit-identical to the explode formulation by construction (same
  * constants, same arithmetic, same orderless min). Empty array →
  * all-Long.MaxValue signature (the explode form dropped such rows; the
  * caller never produces an empty token set because `split` of an empty
  * string yields `[""]`). Null array → null.
  */
case class MinHashSignature(child: Expression, k: Int = MinHashSignature.NumPerms)
    extends UnaryExpression {

  import MinHashSignature._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (k >= 1 && k <= MaxK) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be in [1, $MaxK], got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      var h = arr.getLong(j) % HashDomain
      if (h < 0) h += HashDomain
      var i = 0
      while (i < k) {
        val v = (h * PermA(i) + PermB(i)) % HashDomain
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
         |final long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $arr.getLong($j) % ${HashDomain}L;
         |  if ($h < 0) $h += ${HashDomain}L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    final long $v = ($h * $pa[$i] + $pb[$i]) % ${HashDomain}L;
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
  /** The default signature width — the value every existing fixture,
    * oracle constant and streaming operator is pinned to. */
  val NumPerms = 16
  /** Upper bound on the parameterized width; the fixed-seed family is
    * generated once at this length, so any k ≤ MaxK is a prefix. */
  val MaxK = 64
  /** The prime modulus AND hash domain (the Mersenne prime 2^31-1):
    * affine maps mod a prime with a ≠ 0 are bijections, which is what
    * makes the components independent permutations (see HISTORY). */
  val HashDomain: Long = 2147483647L // 2^31-1

  /** Fixed-seed affine permutation family (a ∈ [1, 2^31-1], b ∈ [0, 2^31-1)).
    * Seed 7, generated sequentially at MaxK length — the first NumPerms
    * pairs are the exact family the explode formulation used, so k=16
    * signatures are stable across engine versions (prefix property
    * spec-pinned). */
  val (permA, permB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(7)
    val pairs = Array.fill(MaxK)((math.abs(rnd.nextLong()) % HashDomain + 1,
                                  math.abs(rnd.nextLong()) % HashDomain))
    (pairs.map(_._1), pairs.map(_._2))
  }
  private val PermA = permA
  private val PermB = permB
}
