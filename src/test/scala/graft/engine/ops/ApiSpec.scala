package graft.engine.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The public operator API must work on arbitrary frames with arbitrary
  * column names — not just the fixture tables the driver binds. */
class ApiSpec extends SparkSuite {
  import spark.implicits._

  test("exactDedup and latestPerKey on a hand-built frame with renamed columns") {
    val df = Seq(
      (1L, "hello world", 10L), (2L, "hello world", 20L), (3L, "unique text", 30L)
    ).toDF("my_id", "body", "version")
    val deduped = TextPipeline.exactDedup(df, "my_id", "body")
    assert(deduped.count() == 2)
    assert(deduped.filter(col("text") === "hello world").head().getLong(0) == 1L)

    val latest = TextPipeline.latestPerKey(df.withColumn("k", lit("a")), "k", "version", "my_id")
    assert(latest.count() == 1 && latest.head().getAs[Long]("my_id") == 3L)
  }

  test("minhashNearDup finds a renamed-column duplicate pair") {
    val df = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (200L, "epsilon delta gamma beta alpha"), // same token set, shuffled
      (300L, "totally different words here now")
    ).toDF("pk", "content")
    val pairs = Similarity.minhashNearDup(df, "pk", "content", 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((100L, 200L, 1.0)), s"got $pairs")
  }

  test("knnCosine and embeddingNearDup on a tiny renamed-column vector set") {
    val mk = (s: Double) => Array.tabulate(64)(i => (i * s).toFloat)
    val df = Seq((0L, mk(1.0)), (1L, mk(1.0)), (2L, mk(-1.0)))
      .toDF("vid", "vec")
    val knn = Similarity.knnCosine(df, "vid", "vec", 0L, 2)
      .as[(Long, Double)].collect().toMap
    assert(knn(1L) == 1.0, s"identical vector must score 1.0: $knn")
    val dups = Similarity.embeddingNearDup(df, "vid", "vec", 0.99)
      .as[(Long, Long, Double)].collect().toSeq
    assert(dups.map(p => (p._1, p._2)) == Seq((0L, 1L)), s"got $dups")
  }

  test("fingerprint is order-sensitive on the API surface") {
    val df = Seq((1L, "a b c"), (2L, "c b a")).toDF("id", "t")
    val fps = TextPipeline.fingerprint(df, "id", "t")
      .select("fp").as[Long].collect().toSet
    assert(fps.size == 2, "permutations must fingerprint differently")
  }
}
