package graft
import graft.engine.GraftSession

/** Dev-loop timer: `runMain graft.DevTime q_a q_b ...` times the named
  * SparkEntry queries (default sf0.1, override SPARK_GRAFT_SF_DIR),
  * two runs each, against the same noop-sink evaluation Bench uses.
  * Not part of the driver contract — local iteration only. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val names = if (args.nonEmpty) args.toSeq else Seq("q_agg_group")
    names.foreach { name =>
      // "<query>!explain" dumps the formatted plan instead of timing
      if (name.endsWith("!explain")) {
        val q = name.stripSuffix("!explain")
        System.err.println(s"DEVPLAN $q\n" +
          SparkEntry.queries(q)(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      } else {
        val fn = SparkEntry.queries(name)
        val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
        (1 to runs).foreach { i =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"DEVTIME $name run$i $dt%.2f s")
        }
      }
    }
    spark.stop()
  }
}
