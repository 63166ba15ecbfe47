package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 64-bit SimHash of a document string,
  * fused end-to-end — space-tokenize, 62-bit double-poly hash
  * ([[PolyHash62]]), the two Knuth multiplicative half-mixes, and the
  * per-bit majority vote — in ONE pass over the UTF-8 bytes.
  *
  * Value-identical to `simhash64(tokenHash64(text))` (pinned in
  * FunctionsSpec), so the DuckDB oracle replays the same arithmetic
  * unchanged. What the fusion removes is plan overhead, not semantics:
  * the composed form is `transform(transform(split(text,' '), poly),
  * mix)` and Catalyst evaluates higher-order lambdas interpreted —
  * two intermediate arrays and per-element closure dispatch per row,
  * outside whole-stage codegen. Here tokens are byte slices of the
  * input (a 0x20 byte never occurs inside a multi-byte UTF-8 sequence,
  * so byte-splitting is code-point-correct), each token's hash feeds
  * the `int[64]` counters immediately, and the whole thing inlines
  * into the surrounding codegen stage.
  *
  * Tokenization matches Spark `split(text, " ", -1)`: empty tokens
  * between consecutive spaces and at the ends are kept (hash 0,
  * counted in n), and the empty string is one empty token. Null → null.
  */
case class SimHashText64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_text64"

  override def nullSafeEval(input: Any): Any =
    SimHashText64.signature(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.engine.functions.SimHashText64.signature($s);")

  override protected def withNewChildInternal(newChild: Expression): SimHashText64 =
    copy(child = newChild)
}

object SimHashText64 {
  private val HiMul = 2654435761L
  private val LoMul = 2246822519L
  private val Mod31 = 2147483648L // 2^31
  private val Mod32 = 4294967296L // 2^32

  /** The widened per-token hash: split poly_hash62's two 31-bit halves
    * and mix each across its full width (see Similarity.tokenHash64's
    * scaladoc for why raw folds lose top-bit entropy). All products
    * stay under 2^63; result ∈ [0, 2^63). */
  def mix(h: Long): Long = {
    val hi = ((h >> 31) * HiMul) % Mod31 // h ≥ 0, so % == pmod here
    val lo = ((h & 2147483647L) * LoMul) % Mod32
    hi * Mod32 + lo
  }

  /** Shared by interpreted and generated code (one implementation, no
    * drift between paths). */
  def signature(s: UTF8String): Long = {
    val bytes = s.getBytes
    val ones = new Array[Int](64)
    var n = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        val h = mix(PolyHash62.hash(UTF8String.fromBytes(bytes, start, i - start)))
        n += 1
        var p = 0
        while (p < 64) { ones(p) += ((h >>> p) & 1L).toInt; p += 1 }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < 64) { if (2L * ones(p) > n) sig |= 1L << p; p += 1 }
    sig
  }
}
