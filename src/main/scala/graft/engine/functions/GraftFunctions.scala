package graft.engine.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Scala-facing surface for the engine's native Catalyst expressions.
  * Everything goes through the public FunctionRegistry + `call_function`
  * path (no private Spark APIs), so the same functions are reachable from
  * SQL text and from the DataFrame API alike. */
object GraftFunctions {
  private[functions] val registry: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedLongIntersectSize].getName, "sorted_intersect_size"),
      (children: Seq[Expression]) => SortedLongIntersectSize(children(0), children(1))),
    (FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children: Seq[Expression]) => ArrayDotProduct(children(0), children(1))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => MinHashSignature(c)
        case Seq(c, kExpr) =>
          require(kExpr.foldable, "minhash_sig k must be a literal")
          val k = kExpr.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"minhash_sig k must be an integer literal, got $other")
          }
          MinHashSignature(c, k)
        case _ => throw new IllegalArgumentException(
          "minhash_sig expects (array<bigint>[, k])")
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children(0))),
    (FunctionIdentifier("hyperplane_sig64"),
      new ExpressionInfo(classOf[HyperplaneSig64].getName, "hyperplane_sig64"),
      (children: Seq[Expression]) => HyperplaneSig64(children(0))),
    (FunctionIdentifier("poly_hash31"),
      new ExpressionInfo(classOf[PolyHash31].getName, "poly_hash31"),
      (children: Seq[Expression]) => PolyHash31(children(0))),
    (FunctionIdentifier("poly_hash62"),
      new ExpressionInfo(classOf[PolyHash62].getName, "poly_hash62"),
      (children: Seq[Expression]) => PolyHash62(children(0))),
    (FunctionIdentifier("simhash_text64"),
      new ExpressionInfo(classOf[SimHashText64].getName, "simhash_text64"),
      (children: Seq[Expression]) => SimHashText64(children(0))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NormalizeNfc].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NormalizeNfc(children(0))),
    (FunctionIdentifier("token_set_hashes62"),
      new ExpressionInfo(classOf[TokenSetHashes62].getName, "token_set_hashes62"),
      (children: Seq[Expression]) => TokenSetHashes62(children(0))),
    (FunctionIdentifier("gram_set_hashes62"),
      new ExpressionInfo(classOf[GramSetHashes62].getName, "gram_set_hashes62"),
      (children: Seq[Expression]) => GramSetHashes62(children(0), children(1))),
    (FunctionIdentifier("del_variant_hashes"),
      new ExpressionInfo(classOf[DelVariantHashes].getName, "del_variant_hashes"),
      (children: Seq[Expression]) => DelVariantHashes(children(0), children(1))),
    (FunctionIdentifier("dup_ngram_bp"),
      new ExpressionInfo(classOf[DupNgramBp].getName, "dup_ngram_bp"),
      (children: Seq[Expression]) => DupNgramBp(children(0), children(1))),
    (FunctionIdentifier("pos_grams"),
      new ExpressionInfo(classOf[PosGrams].getName, "pos_grams"),
      (children: Seq[Expression]) => PosGrams(children(0), children(1), children(2))),
    (FunctionIdentifier("pq_codes_init"),
      new ExpressionInfo(classOf[PqCodesInit].getName, "pq_codes_init"),
      (children: Seq[Expression]) => PqCodesInit(children(0))),
    (FunctionIdentifier("gimg_decode"),
      new ExpressionInfo(classOf[GimgDecode].getName, "gimg_decode"),
      (children: Seq[Expression]) => GimgDecode(children(0))),
    (FunctionIdentifier("gopher_stats"),
      new ExpressionInfo(classOf[GopherStats].getName, "gopher_stats"),
      (children: Seq[Expression]) => GopherStats(children(0))),
    (FunctionIdentifier("char_diversity_stats"),
      new ExpressionInfo(classOf[CharDiversityStats].getName, "char_diversity_stats"),
      (children: Seq[Expression]) => CharDiversityStats(children(0))),
    (FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (children: Seq[Expression]) => WinnowFps(children(0), children(1), children(2))),
    // Spark's own Bloom-filter expression pair (the machinery behind its
    // runtime row-group filters), surfaced as callable functions: the
    // aggregate builds the filter DISTRIBUTED (per-partition sketches
    // merged by TypedImperativeAggregate — no driver-side item loop) and
    // the probe is a codegen'd bitset test over a broadcast-literal
    // filter. Used by TextPipeline.bloomDedup as the membership pre-pass
    // that lets an incremental exact-dedup skip the shuffle for the
    // non-duplicate majority of a 100 TB delta.
    (FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1))),
    (FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_contains"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))

  /** Register the engine functions into a session (idempotent). */
  def register(spark: SparkSession): Unit = registry.foreach { case (ident, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }

  /** |a ∩ b| for sorted long arrays — see [[SortedLongIntersectSize]].
    * Resolution needs the analyzing session to have [[register]]ed the
    * functions (Tables.load does this for every engine query; external
    * sessions use GraftExtensions or call register directly). */
  def sortedIntersectSize(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("sorted_intersect_size", a, b)
  }

  /** dot(a, b) with double accumulation — see [[ArrayDotProduct]].
    * Session-free: the column resolves at analysis against whichever
    * session runs the plan (registered via Tables.load / GraftExtensions). */
  def arrayDot(a: Column, b: Column): Column = call_function("array_dot", a, b)

  /** Constant-VALUED but non-foldable window partition key for
    * bounded-set ranks: a LITERAL key is constant-folded away and
    * WindowExec's no-partition warning returns; `pmod(hash(col), 1)`
    * survives optimization, costs one hash per row, and still routes
    * every row to one partition — which is the point for a ≤nCand
    * candidate rank. One helper so the idiom can't drift per call site. */
  def constWindowKey(c: Column): Column = {
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    pmod(hash(c), lit(1))
  }

  /** k-component MinHash signature of a hashed-token array (default
    * k=16; prefix-stable for larger k) — see [[MinHashSignature]]. */
  def minhashSig(spark: SparkSession, a: Column,
                 k: Int = MinHashSignature.NumPerms): Column = {
    register(spark)
    if (k == MinHashSignature.NumPerms) call_function("minhash_sig", a)
    else {
      import org.apache.spark.sql.functions.lit
      call_function("minhash_sig", a, lit(k))
    }
  }

  /** 64-bit SimHash of a hashed-token multiset — see [[SimHash64]]. */
  def simhash64(spark: SparkSession, a: Column): Column = {
    register(spark)
    call_function("simhash64", a)
  }

  /** Fused 64-bit SimHash straight from document text — see
    * [[SimHashText64]]. Value-identical to
    * `simhash64(Similarity.tokenHash64(text))` without the interpreted
    * lambda passes. */
  def simhashText64(spark: SparkSession, a: Column): Column = {
    register(spark)
    call_function("simhash_text64", a)
  }

  /** 64-bit random-hyperplane LSH signature of an embedding — see
    * [[HyperplaneSig64]]. */
  def hyperplaneSig64(spark: SparkSession, a: Column): Column = {
    register(spark)
    call_function("hyperplane_sig64", a)
  }
}

/** SQL-extension entry point (SURVEY §4.2's injection stub, now live):
  * `--conf spark.sql.extensions=graft.engine.functions.GraftExtensions`
  * makes the engine's native functions available to pure-SQL users. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registry.foreach(ext.injectFunction)
}
