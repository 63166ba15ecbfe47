package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: engine-neutral polynomial string hash —
  * `h = fold over code points of (h·31 + cp) mod (2³¹−1)`, result in
  * `[0, 2³¹−1)`.
  *
  * Exists so the MinHash near-dup pipeline is REPLICABLE IN ANSI-ish
  * SQL: the same fold is one `list_reduce` over `unicode(c)` code
  * points in DuckDB, which lets the driver hash-compare the ENTIRE
  * LSH pipeline (signatures → bands → verified pairs) value-for-value
  * instead of settling for a rows-only check. xxhash64 is marginally
  * faster per token but exists in no other engine.
  *
  * The 31-bit range keeps every downstream affine step
  * (`h·a + b < 2⁶³`) overflow-free — the same domain contract the
  * previous `pmod(xxhash64(t), 2³¹−1)` base hash satisfied. ASCII fast
  * path walks UTF-8 bytes directly (== code points); anything
  * multi-byte takes the code-point iterator. Null → null.
  */
case class PolyHash31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash31"

  override def nullSafeEval(input: Any): Any =
    PolyHash31.hash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.engine.functions.PolyHash31.hash($s);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash31 =
    copy(child = newChild)
}

object PolyHash31 {
  val Mod: Long = 2147483647L // 2^31 - 1

  /** Shared by interpreted and generated code (one implementation, no
    * drift between paths). */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      val b = bytes(i)
      if (b < 0) ascii = false
      else { h = (h * 31 + b) % Mod; i += 1 }
    }
    if (ascii) h
    else {
      var g = 0L
      val it = s.toString.codePoints().iterator()
      while (it.hasNext) g = (g * 31 + it.next()) % Mod
      g
    }
  }
}
