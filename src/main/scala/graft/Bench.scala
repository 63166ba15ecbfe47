package graft
import graft.engine.GraftSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    // Untimed warmup: exercise the scan → shuffle-agg → window → join →
    // noop-sink stack once so JIT/codegen infrastructure compilation is
    // paid before the first measured query (it otherwise lands on
    // whichever query sorts first and distorts per-query attribution).
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(50000)
      l.groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("s"), count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(Window.partitionBy("l_returnflag").orderBy("n")))
        .join(broadcast(spark.read.parquet(s"$sfDir/region.parquet")),
              col("n") =!= col("r_regionkey"), "left_outer")
        .write.format("noop").mode("overwrite").save()
    }
    // Last round's full per-query map (sidecar) is the noise yardstick:
    // a query regressing far past its own trailing time with unchanged
    // code is almost always co-tenant interference, and r03 showed it
    // landing well below the old flat 5 s re-run threshold (0.72 s →
    // 2.67 s on an untouched projection). Absent or unparseable sidecar
    // (first run, older 45-entry format) degrades to the flat threshold.
    val sidecar = java.nio.file.Paths.get("BENCH_LAST.json")
    val prior: Map[String, Double] =
      try {
        if (java.nio.file.Files.exists(sidecar)) {
          import org.json4s._
          org.json4s.jackson.JsonMethods.parse(
            new String(java.nio.file.Files.readAllBytes(sidecar),
              java.nio.charset.StandardCharsets.UTF_8)) \ "queries" match {
            case JObject(fields) => fields.collect {
              case (k, JDouble(v)) => k -> v
              case (k, JInt(v)) => k -> v.toDouble
              case (k, JDecimal(v)) => k -> v.toDouble
            }.toMap
            case _ => Map.empty
          }
        } else Map.empty
      } catch { case _: Throwable => Map.empty }
    // noop sink forces full evaluation of every operator (count() would let
    // Catalyst prune projections and under-measure), still executor-side.
    // A failed run returns ok=false and its elapsed time — it must never be
    // min-replaced by a rerun nor silently counted as a ~0 s success.
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Shared-artifact attribution (r8 verdict #2): the memoized pair
    // graph / cluster table / eval-score table are built once per
    // session and read by several queries — whichever consumer sorted
    // first used to pay the whole build, making its per-query time
    // incomparable round-over-round. Force each build HERE, timed under
    // its own name; consumer queries then measure pure read-plus-own-work.
    // Build time still counts toward the reported total (it is real work
    // the round does), just under an honest label.
    val artifactTimes: Seq[(String, Double)] =
      graft.engine.ops.TextPipeline.sharedArtifactBuilders(spark, sfDir).map {
        case (scope, build) =>
          val t0 = System.nanoTime()
          try build().write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
          scope -> (System.nanoTime() - t0) / 1e9
      }
    val measured = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // A measurement far above steady state is almost always an external
      // stall (GC pause, page-cache eviction, co-tenant I/O) mis-attributed
      // to one query — r01 recorded a 0.6 s query at 94 s that way. Re-run
      // when the time is either absolutely large (> 5 s) or > 1.5× the
      // query's own prior-round time (with a 0.75 s floor so the many
      // sub-second queries' ±0.2 s wobble doesn't double the bench), and
      // report the min — but only across SUCCESSFUL runs: a throwing query
      // keeps its failure marker no matter how fast it died.
      def isNoisy(t: Double): Boolean = t > 5.0 ||
        prior.get(name).exists(p => t > math.max(1.5 * p, 0.75))
      // sidecar-relative suspicion only: the flat >5 s arm exists to
      // catch first-run stalls, but a genuinely-heavy query is >5 s
      // every round and must not be permanently "suspect"
      def vsPrior(t: Double): Boolean =
        prior.get(name).exists(p => t > math.max(1.5 * p, 0.75))
      val (t1, ok1) = timeOnce(fn)
      if (ok1 && isNoisy(t1)) {
        val (t2, ok2) = timeOnce(fn)
        val best2 = if (ok2) math.min(t1, t2) else t1
        // Third opinion: r04 recorded a 5.97 s entry for a 1.10 s query
        // because BOTH runs landed inside the same co-tenant load window
        // and min-of-2 couldn't see past it. If the min of two runs is
        // still noisy by the same yardstick, one more run decides.
        val best =
          if (ok2 && isNoisy(best2)) {
            val (t3, ok3) = timeOnce(fn)
            if (ok3) math.min(best2, t3) else best2
          } else best2
        // SUSPECT marker (r7 verdict): a sustained co-tenant load window
        // can outlast all three runs — r7 recorded 8.77 s for a 1.10 s
        // query that way and the round total carried it silently. If
        // even the min of the re-runs still exceeds 1.5× the query's own
        // prior-round time, the entry is flagged rather than trusted, so
        // a load-window round can't read as a code regression.
        (name, best, true, vsPrior(best))
      } else (name, t1, ok1, false)
    }
    val failed = measured.collect { case (n, _, false, _) => n }
    val suspect = measured.collect { case (n, _, true, true) => n }
    val results = measured.map { case (n, t, _, _) => n -> t }.toMap
    // Locale.ROOT explicitly: under a comma-decimal default locale a
    // locale-sensitive format would emit invalid JSON on stdout AND in
    // the sidecar the next run parses as its noise yardstick.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def toJson(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // The harness keeps only the last 2000 bytes of stdout and the JSON line
    // must survive intact inside that tail (r01's full per-query map pushed
    // the line past the buffer and it was never parsed). Report the slowest
    // 45 queries — a bounded-size headline set no matter how large the
    // inventory grows — and the exact total over ALL queries.
    val headline = results.toSeq.sortBy(-_._2).take(45).sortBy(_._1)
    // total = per-query sum + the shared-artifact builds: the same work
    // the r8 total contained (builds were inside consumer queries then),
    // so round-over-round totals stay comparable while per-query times
    // become build-free.
    val total = (if (results.nonEmpty) results.values.sum else 0.0) +
      artifactTimes.map(_._2).sum
    // "suspect" lists queries whose reported time is STILL >1.5× their
    // own sidecar yardstick after min-of-3 — load-window artifacts, not
    // code. Normally empty, so the stdout tail budget is untouched; the
    // queries map stays a flat name→seconds object for existing parsers.
    val suspectJson = suspect.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val artifactJson = toJson(artifactTimes)
    def jsonLine(qs: String) =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"errors":${failed.size},"suspect":$suspectJson,"artifact_build":$artifactJson,"queries":$qs,"sf":"$sfDir"}"""
    // Sidecar: the FULL per-query map (no stdout size constraint applies to
    // a file) — both the next run's noise yardstick and the round-over-round
    // comparison record for every query, not just the 45 slowest.
    java.nio.file.Files.write(sidecar,
      (jsonLine(toJson(results.toSeq.sortBy(_._1))) + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Stop Spark BEFORE printing: its shutdown INFO lines go to stderr after
    // this point, so the JSON stays the final stdout line of the process.
    spark.stop()
    println(jsonLine(toJson(headline)))
    System.out.flush()
  }
}
