package graft.engine.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Runtime re-planning guarantees: AQE must split skewed join partitions
  * at execution time — the safety net under every shuffle join at 100 TB
  * when a hot key slips past manual salting. */
class AdaptiveSpec extends SparkSuite {
  import spark.implicits._

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the fixture-scale hot key counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of the left side lands on key 0 → one huge shuffle partition
      val left = spark.range(0, 200000)
        .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id")).as("k"),
                col("id").as("v"))
      val right = spark.range(0, 5000)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k").groupBy(lit(1)).agg(count(lit(1)).as("n"))
      // execute THIS QueryExecution, then read its (now final) adaptive plan
      val rows = j.collect()
      assert(rows.nonEmpty && rows(0).getLong(1) > 0)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") && finalPlan.contains("AQEShuffleRead skewed"),
        s"AQE skew-join split expected in the final plan:\n${finalPlan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter from a selective dim side prunes the fact scan") {
    // the 100 TB move DPP can't make: when the join key is NOT the
    // partition column, Catalyst can still build a bloom filter from the
    // filtered creation side and push a might-contain probe into the
    // application side's scan — rows that can't match die before the
    // shuffle. Thresholds lowered so fixture-scale sides qualify.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      // no broadcast: force the shuffle join the filter exists to thin
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def q = graft.engine.io.Tables.lineitem(spark, sfDir)
        .join(graft.engine.io.Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      val withFilter = q
      val got = withFilter.collect()
      val plan = withFilter.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter") ||
             plan.contains("might_contain"),
        s"runtime bloom filter expected in the plan:\n${plan.take(2500)}")
      // semantics unchanged: same aggregate with the optimizer rule off
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val base = q.collect()
      assert(got.map(_.toString).sorted.sameElements(base.map(_.toString).sorted))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
