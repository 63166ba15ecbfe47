package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: engine-neutral 62-bit polynomial string
  * hash — two independent folds over the code points,
  * `h1 = fold (h·31 + cp) mod (2³¹−1)` and `h2 = fold (h·37 + cp) mod
  * (2³¹−1)`, combined as `h1·2³¹ + h2` ∈ [0, 2⁶²).
  *
  * Why it exists: [[PolyHash31]]'s single 31-bit fold is replicable in
  * DuckDB but collides trivially ("Aa" and "BB" both hash to 2112), and
  * at large-corpus vocabulary sizes the birthday bound makes colliding
  * token PAIRS common — inflating Jaccard estimates and, worse,
  * merging genuinely different documents whose token-hash SETS collide
  * into "exact duplicates" the oracle structurally cannot catch
  * (it replays the same hash). Requiring a simultaneous collision in
  * two independent-base polynomials pushes the collision probability to
  * ~2⁻⁶² — xxhash64 territory — while staying expressible as two
  * `list_reduce` folds in DuckDB SQL, so the whole LSH pipeline remains
  * value-oracled. Every intermediate fits BIGINT: h1 < 2³¹−1 so
  * h1·2³¹ + h2 < 2⁶², and downstream consumers either reduce mod 2³¹−1
  * before affine steps (MinHashSignature) or only read bits (SimHash64).
  *
  * ASCII fast path walks UTF-8 bytes directly (== code points);
  * anything multi-byte takes the code-point iterator. Null → null.
  */
case class PolyHash62(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash62"

  override def nullSafeEval(input: Any): Any =
    PolyHash62.hash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.engine.functions.PolyHash62.hash($s);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash62 =
    copy(child = newChild)
}

object PolyHash62 {
  val Mod: Long = 2147483647L // 2^31 - 1
  val Shift: Long = 2147483648L // 2^31

  /** Shared by interpreted and generated code (one implementation, no
    * drift between paths). */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h1 = 0L
    var h2 = 0L
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      val b = bytes(i)
      if (b < 0) ascii = false
      else { h1 = (h1 * 31 + b) % Mod; h2 = (h2 * 37 + b) % Mod; i += 1 }
    }
    if (ascii) h1 * Shift + h2
    else {
      var g1 = 0L
      var g2 = 0L
      val it = s.toString.codePoints().iterator()
      while (it.hasNext) {
        val c = it.next()
        g1 = (g1 * 31 + c) % Mod
        g2 = (g2 * 37 + c) % Mod
      }
      g1 * Shift + g2
    }
  }
}
