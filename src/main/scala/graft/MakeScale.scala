package graft

import graft.engine.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the THIRD ScaleCheck rung (r8 verdict #7): a 3× replica of the
  * sf0.1 fixture at `target/testdata/sf0.3`, so the scale ladder gets a
  * curvature read (two points cannot distinguish linear-with-overhead
  * from soft-quadratic).
  *
  * NOT a new sample from the driver's generator (seed/recipe are
  * driver-side); instead three key-shifted replicas of sf0.1, built so
  * every workload's SHAPE scales honestly:
  *
  *  - All key domains shift by a per-replica offset, and foreign keys
  *    shift consistently (joins see 3× rows, same fan-out, 3× distinct
  *    keys — exactly how a bigger corpus behaves).
  *  - `documents.text` gets a per-replica TOKEN-LEVEL BIJECTION (a
  *    replica suffix on every token). Within a replica, token-set
  *    structure — and therefore shingles, Jaccard, MinHash/SimHash
  *    collision structure — is preserved EXACTLY; across replicas,
  *    token overlap drops to zero. Naive replication would make every
  *    doc a 3-way near-duplicate and quadratically inflate every LSH
  *    bucket — the one thing a scale AUDIT must not fabricate.
  *  - `embeddings.embedding`: replica 0 identity, replica 1 negation,
  *    replica 2 cyclic dimension roll. All three are isometries of the
  *    dot product, so within-replica cosine structure (cluster/cell
  *    shapes, top-k neighborhoods) is exact; cross-replica similarity
  *    is scrambled (negation flips sign; a roll decorrelates).
  *  - `nation`/`region` copy once: dimension tables don't scale with
  *    sf (TPC-H semantics), which is what keeps broadcast joins
  *    broadcastable at 100 TB.
  *
  * Deterministic (pure column transforms of a fixed input). Writes only
  * under `target/` — the driver fixture stays untouched.
  * Usage: `runMain graft.MakeScale [srcDir] [outDir] [replicas]`.
  */
object MakeScale {
  private val Off = 100000000L // key offset between replicas; far above any sf0.1 key

  private def keyShift(df: DataFrame, r: Int, longKeys: Seq[String],
                       userKeys: Seq[String] = Nil): DataFrame = {
    val shifted = longKeys.foldLeft(df) { (d, k) =>
      d.withColumn(k, col(k) + lit(r * Off))
    }
    userKeys.foldLeft(shifted) { (d, k) =>
      d.withColumn(k, col(k) + lit(r * 1000000L))
    }
  }

  /** Per-replica character rotation cipher: a LENGTH-PRESERVING
    * bijection on the token alphabet (the fixture text is plain
    * lowercase ASCII), so all within-replica set/shingle structure is
    * preserved verbatim AND the replica costs exactly the same bytes.
    * (A token-suffix disguise was measurably worse: +2 bytes on ~4-byte
    * tokens inflated string-heavy operators ~45% beyond the 3× data,
    * which a scale audit must not conflate with the operator's slope.)
    * Rotation has no fixed points, so no token maps to itself;
    * incidental cross-replica coincidences (a ciphered token equalling
    * some other real token) are ordinary shared-vocabulary noise, far
    * below shingle-level overlap. */
  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"
  private def disguiseText(df: DataFrame, r: Int): DataFrame =
    if (r == 0) df
    else {
      val shift = (r * 7) % 26
      val rotated = Alphabet.drop(shift) + Alphabet.take(shift)
      df.withColumn("text", translate(col("text"), Alphabet, rotated))
    }

  private def disguiseVec(df: DataFrame, r: Int): DataFrame = r match {
    case 0 => df
    case 1 => df.withColumn("embedding",
      transform(col("embedding"), x => -x))
    case _ => df.withColumn("embedding", // roll dimensions by r-1
      concat(slice(col("embedding"), lit(r), size(col("embedding")) - lit(r - 1)),
             slice(col("embedding"), lit(1), lit(r - 1))))
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/testdata/sf0.3")
    val replicas = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)

    def rep(table: String)(xform: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until replicas).map(r => xform(base, r))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      System.err.println(s"[makescale] $table x$replicas")
    }
    def copy(table: String): Unit = {
      spark.read.parquet(s"$src/$table.parquet")
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      System.err.println(s"[makescale] $table copied")
    }

    rep("documents") { (d, r) =>
      // n_chars == length(text) in the fixture; the rotation cipher is
      // length-preserving, so this recompute is a defensive invariant
      // check, not a correction
      disguiseText(keyShift(d, r, Seq("doc_id")), r)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    rep("embeddings") { (d, r) => disguiseVec(keyShift(d, r, Seq("vec_id")), r) }
    rep("events") { (d, r) => keyShift(d, r, Seq("event_id"), userKeys = Seq("user_id")) }
    rep("lineitem") { (d, r) => keyShift(d, r, Seq("l_orderkey", "l_partkey", "l_suppkey")) }
    rep("orders") { (d, r) => keyShift(d, r, Seq("o_orderkey", "o_custkey")) }
    // c_name must follow the shifted key (the fixture's `Customer#%09d`
    // pattern): naive replication would put 3 EXACT copies of every name
    // in the same nation, quadratically inflating fuzzy-match blocks —
    // the same fabricated-near-duplicate trap the documents disguise
    // exists to avoid. Rebuilding the name from the shifted key keeps
    // names unique, the pattern (and its distance-1 pair density)
    // intact, and the length unchanged (replica offsets stay within 9
    // digits).
    rep("customer") { (d, r) =>
      keyShift(d, r, Seq("c_custkey"))
        .withColumn("c_name",
          concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
    }
    rep("part") { (d, r) => keyShift(d, r, Seq("p_partkey")) }
    rep("supplier") { (d, r) => keyShift(d, r, Seq("s_suppkey")) }
    copy("nation"); copy("region")
    spark.stop()
    println(s"""{"makescale":"$out","replicas":$replicas}""")
  }
}
