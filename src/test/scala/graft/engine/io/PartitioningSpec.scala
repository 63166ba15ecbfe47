package graft.engine.io

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Demonstrates the date-partitioned layout SURVEY §4.2 commits to for the
  * 100 TB events table: static partition pruning (a date filter touches
  * only matching directories) and dynamic partition pruning (a join
  * against a filtered dimension prunes fact partitions at runtime). */
class PartitioningSpec extends SparkSuite {

  private lazy val factDir: String = {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sfDir)
      .withColumn("event_date", col("ts").cast("date"))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    dir
  }

  test("static partition pruning: a date predicate prunes directories at plan time") {
    val days = spark.read.parquet(factDir)
      .select(col("event_date")).distinct().count()
    assert(days > 1, "fixture must span multiple days for pruning to mean anything")

    val oneDay = spark.read.parquet(factDir)
      .filter(col("event_date") === spark.read.parquet(factDir)
        .agg(min("event_date")).head().getDate(0))
    val plan = oneDay.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("PartitionFilters: [isnotnull(event_date") ||
           plan.contains("PartitionFilters: [isnotnull(event_date"),
      s"date filter must become a partition filter:\n${plan.take(1500)}")
    // row-level check: only that day's rows are read
    val expected = spark.read.parquet(factDir)
      .withColumn("d", col("event_date"))
      .groupBy("d").count().orderBy("d").head().getLong(1)
    assert(oneDay.count() == expected)
  }

  test("dynamic partition pruning: a filtered dim join prunes fact partitions at runtime") {
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      val fact = spark.read.parquet(factDir)
      // independent date dimension on disk, with a selective predicate —
      // the shape DPP requires (filter on dim side, join on partition key)
      val dimDir = Files.createTempDirectory("graft-dim").toString
      val w = org.apache.spark.sql.expressions.Window.orderBy("event_date")
      fact.select(col("event_date")).distinct()
        .withColumn("day_no", row_number().over(w))
        .write.mode("overwrite").parquet(dimDir)
      val dim = spark.read.parquet(dimDir).filter(col("day_no") <= 2)
      val joined = fact.join(dim, Seq("event_date"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning") ||
             plan.toLowerCase.contains("dynamicpruningexpression"),
        s"expected a dynamic pruning subquery on the fact scan:\n${plan.take(2000)}")
    } finally spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
  }
}
