package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the 64-bit SimHash of a token-hash
  * multiset, as one fused pass over the array.
  *
  * Bit `p` of the result is set iff more than half of the input hashes
  * have bit `p` set (`2·ones_p > n`) — identical to the sign of the
  * classic Σ(±1) per-bit accumulation, with ties giving 0.
  *
  * Replaces a two-stage aggregation pipeline (per-(doc, segment) packed
  * 16-bit lane sums, then a per-doc 64-column unpack-and-total) that
  * existed only because expressing "64 per-bit counters" in SQL
  * aggregates forces either 64 buffer columns or lane packing with a
  * carry hazard above 2^16 tokens per segment. Here the counters are a
  * plain `int[64]` local: no shuffle, no lane carries, correct for any
  * document up to 2^31 tokens (the JVM array bound), and the signature
  * computes inside whole-stage codegen as rows stream past.
  *
  * Input carries multiplicities on purpose — SimHash weights a token by
  * its occurrence count, so callers pass `transform(split(text, " "),
  * xxhash64)`, NOT a deduplicated set. Null array → null; empty → 0
  * (every per-bit majority is vacuously false).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ones = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var p = 0
      while (p < 64) {
        ones(p) += ((h >>> p) & 1L).toInt
        p += 1
      }
      j += 1
    }
    var sig = 0L
    var p = 0
    while (p < 64) {
      if (2L * ones(p) > n) sig |= 1L << p
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val h = ctx.freshName("h")
      val ones = ctx.freshName("ones"); val sig = ctx.freshName("sig")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $ones = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $h = $arr.getLong($j);
         |  for (int $p = 0; $p < 64; $p++) {
         |    $ones[$p] += (int) (($h >>> $p) & 1L);
         |  }
         |}
         |long $sig = 0L;
         |for (int $p = 0; $p < 64; $p++) {
         |  if (2L * $ones[$p] > $n) $sig |= 1L << $p;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
