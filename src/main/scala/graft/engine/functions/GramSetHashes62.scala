package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the sorted distinct [[PolyHash62]] set of
  * a document's k-token SHINGLES — the shingle-identity array the
  * prefix-filtered exact-similarity join consumes
  * (`TextPipeline.jaccardPrefixJoin`).
  *
  * Value-identical (pinned in FunctionsSpec) to
  * `array_sort(array_distinct(transform(pos_grams(text, k, true),
  * poly_hash62)))` — deduping shingle HASHES equals deduping shingles
  * first and hashing after, since equal shingles hash equally — but the
  * composed form runs its lambda INTERPRETED (per-gram closure dispatch
  * outside whole-stage codegen, plus a materialized string array and a
  * second pass for the distinct). Here the gram views come from the
  * same zero-copy tokenizer [[PosGrams]] uses and the hashes land
  * straight in a primitive long array: sort, in-place dedupe, one
  * allocation. Null → null; fewer than k tokens → empty array (the
  * [[PosGrams]] contract). */
case class GramSetHashes62(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int), got (${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_set_hashes62"

  override def nullSafeEval(text: Any, k: Any): Any =
    GramSetHashes62.hashes(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.engine.functions.GramSetHashes62.hashes($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramSetHashes62 =
    copy(left = newLeft, right = newRight)
}

object GramSetHashes62 {
  /** Shared by interpreted and generated code. */
  def hashes(s: UTF8String, k: Int): ArrayData = {
    val grams = PosGrams.grams(s, k, true)
    val n = grams.numElements()
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = PolyHash62.hash(grams.getUTF8String(i)); i += 1 }
    java.util.Arrays.sort(h)
    var w = 0
    var r = 0
    while (r < h.length) {
      if (r == 0 || h(r) != h(r - 1)) { h(w) = h(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(h, w))
  }
}
