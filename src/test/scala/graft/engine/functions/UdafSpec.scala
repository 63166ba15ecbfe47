package graft.engine.functions

import graft.SparkSuite
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exercises the engine's declared user-extension contract (SURVEY §2.2 /
  * §7.3): scalar extension via `udf()`, aggregate extension via a typed
  * `Aggregator` registered with `functions.udaf`. These are the sanctioned
  * escape hatches — everything in the engine itself uses built-ins or
  * native expressions, but users extending the engine get this surface. */
class UdafSpec extends SparkSuite {
  import spark.implicits._

  /** Weighted mean as a typed Aggregator — the canonical partial+merge
    * shape: (sum, weight) buffer merges associatively, so Spark runs it
    * map-side partial + reduce-side final like any built-in agg. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Double)): Double = if (r._2 == 0) 0.0 else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.product[(Double, Double)]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  test("typed Aggregator via functions.udaf: weighted mean matches closed form") {
    val wmean = udaf(WeightedMean)
    spark.udf.register("wmean", wmean)
    val df = Seq((1.0, 1.0), (3.0, 3.0)).toDF("v", "w") // weighted mean = (1+9)/4 = 2.5
    assert(df.agg(wmean(col("v"), col("w"))).head().getDouble(0) == 2.5)
    // registered-name SQL path
    df.createOrReplaceTempView("wm_in")
    assert(spark.sql("SELECT wmean(v, w) FROM wm_in").head().getDouble(0) == 2.5)
  }

  test("aggregator distributes: many partitions give the same result as one") {
    val wmean = udaf(WeightedMean)
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(1000)((rnd.nextDouble() * 100, rnd.nextDouble() + 0.1))
    val one = rows.toDF("v", "w").coalesce(1).agg(wmean(col("v"), col("w"))).head().getDouble(0)
    val many = rows.toDF("v", "w").repartition(13).agg(wmean(col("v"), col("w"))).head().getDouble(0)
    assert(math.abs(one - many) < 1e-9, "partial+merge must be order-insensitive within fp tolerance")
  }

  test("scalar udf registration: contract works but built-ins are preferred") {
    val slug = udf((s: String) => s.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
    spark.udf.register("slugify", slug)
    val r = spark.sql("SELECT slugify('Hello, Spark World!') AS s").head().getString(0)
    assert(r == "hello-spark-world-")
  }
}
