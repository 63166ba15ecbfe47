package graft.engine.io

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Demonstrates the 100 TB co-location layout the Tables registry is
  * designed to switch to (see Tables scaladoc): bucketing both join sides
  * on the join key removes the per-query shuffle entirely — at cluster
  * scale this converts every orders⋈customer-shaped join from a full
  * network shuffle into a local merge per bucket.
  *
  * Tables land in the session's default warehouse (gitignored
  * spark-warehouse/) and are dropped after the suite. */
class BucketingSpec extends SparkSuite with BeforeAndAfterAll {

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    super.afterAll()
  }

  /** The in-memory catalog forgets tables between JVMs but their
    * warehouse directories persist — remove both before (re)creating. */
  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(rmrf)
    p.delete(): Unit
  }

  private def writeBucketed(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    val wh = new java.io.File(new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
    Seq("b_orders", "b_customer").foreach(t => rmrf(new java.io.File(wh, t)))
    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sfDir)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
  }

  test("equi-join of co-bucketed tables runs with zero shuffle exchanges") {
    writeBucketed()
    // disable auto-broadcast so the dimension doesn't short-circuit the
    // co-location path being demonstrated (at 100 TB neither side fits)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))

      joined.collect() // execute so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      val joinShuffles = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(o_custkey") ||
        l.contains("Exchange hashpartitioning(c_custkey"))
      assert(joinShuffles == 0,
        s"co-bucketed join must not shuffle either side:\n${plan.take(2500)}")
      assert(plan.contains("SortMergeJoin"),
        s"expected a merge join over bucketed scans:\n${plan.take(1500)}")
      assert(plan.contains("Bucketed: true"), "scans must report bucketed reads")

      // value correctness vs the unbucketed plan
      val reference = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(reference).count() == 0 &&
             reference.exceptAll(joined).count() == 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    // the planner auto-disables bucketed scans when no join benefits;
    // force it on to demonstrate filter-driven bucket pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = spark.table("b_orders").filter(col("o_custkey") === 42)
      // formatted explain prints the full scan detail (tree string truncates)
      val formatted = one.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val line = formatted.linesIterator.find(_.contains("SelectedBucketsCount")).getOrElse("")
      assert(line.contains("1 out of 8"),
        s"bucket pruning expected, got: '$line'\n${formatted.take(1500)}")
    } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }
}
