package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the sorted distinct 64-bit hashes of a
  * string's RUN-CANONICAL ≤d-deletion neighborhood (d = 1 or 2) — the
  * FastSS/SymSpell variant keys `TextPipeline.fuzzyMatchDel1/Del2` join
  * candidates on.
  *
  * Same variant SET as the explode-chain formulation those operators
  * used (identity + single deletions + ordered double deletions at d=2,
  * keeping only the LEFTMOST position of any same-char run — see the
  * run-canonical argument at the call site), but the hash of each
  * variant is computed WITHOUT materializing the variant string: one
  * codepoint extraction plus prefix polynomial hashes H/P make every
  * deletion variant's hash an O(1) splice of three segment hashes, so
  * the whole ~len²/2 neighborhood costs O(len²) multiply-adds and ONE
  * allocation (the result array) instead of ~len²/2 substr+concat
  * UTF8String builds feeding xxhash64 (the measured dominant cost of
  * q_fuzzy_match2: ~84 s of task time at sf0.1, mostly allocation+GC).
  *
  * The hash value itself is NOT part of any output contract: candidate
  * generation only requires that equal variant strings hash equally on
  * both join sides (guaranteeing the FastSS superset property carries
  * over) and that unequal ones rarely collide (a collision only adds a
  * false candidate the exact thresholded Levenshtein verify discards).
  * Hashes are additionally deduped per record (sort + unique), which
  * drops the rare cross-run coincidence duplicates the old chain's
  * pair-level distinct absorbed — candidate SET unchanged.
  *
  * Codepoint-level deletions (matching the old chain's character
  * `substr` splices) so the neighborhood theory holds for non-ASCII
  * strings too. Null → null; empty string → [hash of ""] (the identity
  * variant, as before). */
case class DelVariantHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int), got (${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "del_variant_hashes"

  override def nullSafeEval(text: Any, d: Any): Any =
    DelVariantHashes.hashes(text.asInstanceOf[UTF8String], d.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) =>
      s"${ev.value} = graft.engine.functions.DelVariantHashes.hashes($t, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DelVariantHashes =
    copy(left = newLeft, right = newRight)
}

object DelVariantHashes {
  // odd 64-bit base; collisions over short attribute strings are
  // vanishingly rare and harmless (verify-side exact)
  private val B = 1099511628211L

  /** Shared by interpreted and generated code. */
  def hashes(s: UTF8String, d: Int): ArrayData = {
    require(d == 1 || d == 2, s"del_variant_hashes supports d in {1,2}, got $d")
    // codepoint extraction (substr in the old chain was codepoint-based)
    val str = s.toString
    val sl = str.length
    val cps = new Array[Int](s.numChars())
    var n = 0
    var ci = 0
    while (ci < sl) {
      val cp = str.codePointAt(ci)
      cps(n) = cp
      n += 1
      ci += Character.charCount(cp)
    }
    // prefix hashes over codepoints: H(k) = hash of cps[0..k), P(k) = B^k
    val H = new Array[Long](n + 1)
    val P = new Array[Long](n + 1)
    P(0) = 1L
    var k = 0
    while (k < n) {
      H(k + 1) = H(k) * B + (cps(k) + 1L)
      P(k + 1) = P(k) * B
      k += 1
    }
    // hash of the string with positions i<j deleted (j = -1: only i; both
    // -1: identity), via segment splicing: append(acc, seg[a..b)) =
    // acc*P(b-a) + (H(b) - H(a)*P(b-a)), all mod 2^64.
    def app(acc: Long, a: Int, b: Int): Long =
      acc * P(b - a) + (H(b) - H(a) * P(b - a))
    val maxOut = 1 + n + (if (d >= 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](maxOut)
    var w = 0
    out(w) = H(n); w += 1                       // identity
    var i = 0
    while (i < n) {                             // single deletion at i
      if (i == 0 || cps(i) != cps(i - 1)) {
        out(w) = app(H(i), i + 1, n); w += 1
      }
      i += 1
    }
    if (d >= 2) {                               // ordered double deletions
      i = 0
      while (i < n - 1) {
        if (i == 0 || cps(i) != cps(i - 1)) {
          val hi = H(i)
          var j = i + 1
          while (j < n) {
            if (j == i + 1 || cps(j) != cps(j - 1)) {
              out(w) = app(app(hi, i + 1, j), j + 1, n); w += 1
            }
            j += 1
          }
        }
        i += 1
      }
    }
    java.util.Arrays.sort(out, 0, w)
    var r = 0
    var u = 0
    while (r < w) {
      if (r == 0 || out(r) != out(r - 1)) { out(u) = out(r); u += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, u))
  }
}
