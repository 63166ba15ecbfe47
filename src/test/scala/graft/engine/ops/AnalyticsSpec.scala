package graft.engine.ops

import graft.{SparkEntry, SparkSuite}
import graft.engine.io.Tables
import org.apache.spark.sql.functions._

/** Unit checks for the second-wave analytics operators (Analytics.scala):
  * algebraic invariants the DuckDB oracle can't isolate. */
class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("pivot cells reconcile with the unpivoted group totals") {
    val pivoted = run("q_pivot")
    // pivot cells are exact decimal sums cast to double once; re-summing
    // the 15 cell doubles in decimal keeps the comparison exact
    val cells = pivoted.select(
      (col("p_urgent") + col("p_high") + col("p_medium") + col("p_notspec") + col("p_low"))
        .cast("decimal(28,6)").as("row_sum"))
      .agg(sum("row_sum")).head().getDecimal(0)
    val direct = Tables.orders(spark, sfDir)
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).cast("decimal(38,6)")
        .cast("double").cast("decimal(28,6)")).head().getDecimal(0)
    // cells sum 15 already-rounded doubles; allow the few-ulp drift that
    // re-rounding introduces (exactness per cell is covered by the oracle)
    assert(cells.subtract(direct).abs().doubleValue() <= 0.01,
      s"pivot total $cells != direct $direct")
  }

  test("unpivot emits exactly 2 rows per order (one per measure)") {
    val n = Tables.orders(spark, sfDir).count()
    val u = run("q_unpivot")
    assert(u.count() == 2 * n)
    assert(u.groupBy("o_orderkey").count().filter(col("count") =!= 2).count() == 0)
  }

  test("hash sample is deterministic and roughly 10%") {
    val a = run("q_sample_hash").count()
    val b = run("q_sample_hash").count()
    val n = Tables.orders(spark, sfDir).count()
    assert(a == b)
    assert(a > n / 20 && a < n / 5, s"sample $a of $n out of expected band")
  }

  test("percentiles are ordered p25 <= p50 <= p75 <= p95 and within min/max") {
    val bad = run("q_agg_percentile")
      .filter(col("p25") > col("p50") || col("p50") > col("p75") || col("p75") > col("p95"))
      .count()
    assert(bad == 0)
  }

  test("top-3 per group: no group exceeds 3 rows, ranks are 1..k, values descend") {
    val t = run("q_topk_per_group")
    assert(t.groupBy("o_custkey").count().filter(col("count") > 3).count() == 0)
    val badRank = t.groupBy("o_custkey")
      .agg(max("rk").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(badRank == 0)
    // within each group the price at rank r is >= price at rank r+1
    val self = t.as("a").join(t.as("b"),
      $"a.o_custkey" === $"b.o_custkey" && $"a.rk" === $"b.rk" - 1)
    assert(self.filter($"a.o_totalprice" < $"b.o_totalprice").count() == 0)
  }

  test("string agg covers all 25 nations over 5 regions") {
    val r = run("q_str_agg")
    assert(r.count() == 5)
    assert(r.agg(sum("n_nations")).head().getLong(0) == 25)
    // CSV lists are sorted
    val unsorted = r.select(split(col("nations"), ",").as("a"))
      .filter(col("a") =!= array_sort(col("a"))).count()
    assert(unsorted == 0)
  }

  test("map column round-trips its entries") {
    val m = run("q_map_funcs")
    assert(m.filter(col("m_size") =!= 2).count() == 0)
    assert(m.filter(element_at(split(col("vs"), ","), 1) =!= col("status")).count() == 0)
  }

  test("sequence generator emits regionkey+1 rows per region") {
    val g = run("q_generator_seq")
    val bad = g.groupBy("r_name", "r_regionkey").count()
      .filter(col("count") =!= col("r_regionkey") + 1).count()
    assert(bad == 0)
  }

  test("correlated subquery result is a subset of orders above the global minimum bar") {
    val c = run("q_subquery_corr")
    // every returned order beats 1.5x its customer's average, recomputed directly
    val avgs = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg((avg("o_totalprice") * 1.5).as("bar"))
    val joined = c.join(avgs, "o_custkey")
    assert(joined.filter(col("o_totalprice") <= col("bar")).count() == 0)
  }

  test("IN-subquery equals the left-semi DataFrame formulation") {
    val viaSql = run("q_subquery_in").select("o_orderkey")
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val viaDf = o.join(c, o("o_custkey") === c("c_custkey"), "left_semi").select("o_orderkey")
    assert(viaSql.exceptAll(viaDf).count() == 0 && viaDf.exceptAll(viaSql).count() == 0)
  }

  test("sessionization: sessions partition each user's events, gaps only between sessions") {
    val sess = run("q_sessionize")
    val ev = Tables.events(spark, sfDir)
    // total events preserved
    assert(sess.agg(sum("n_events")).head().getLong(0) == ev.count())
    // session ids are 1..k per user
    val bad = sess.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad == 0)
    // sessions don't overlap in time per user
    val overlap = sess.as("a").join(sess.as("b"),
      $"a.user_id" === $"b.user_id" && $"a.session_id" === $"b.session_id" - 1)
      .filter($"b.start_s" <= $"a.end_s").count()
    assert(overlap == 0, "consecutive sessions must be time-ordered")
  }

  test("window distribution: percent_rank in [0,1], cume_dist monotone with value") {
    val d = run("q_window_dist")
    assert(d.filter(col("pr") < 0 || col("pr") > 1 || col("cd") <= 0 || col("cd") > 1).count() == 0)
  }

  test("range frame: every row's frame includes itself; counts within group size") {
    val r = run("q_window_range")
    assert(r.filter(col("n_within_50k") < 1).count() == 0)
    val sizes = Tables.orders(spark, sfDir).groupBy("o_custkey").count()
      .withColumnRenamed("count", "gsize")
    assert(r.join(sizes, "o_custkey").filter(col("n_within_50k") > col("gsize")).count() == 0)
  }

  test("max_by/min_by agree with window-rank formulation") {
    val m = run("q_agg_minmax_by")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val top = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("best_order"))
    assert(m.select("o_custkey", "best_order").exceptAll(top).count() == 0)
  }

  test("lateral join returns at most one row per customer, matching max_by") {
    val lat = run("q_lateral_join")
    assert(lat.groupBy("c_custkey").count().filter(col("count") > 1).count() == 0)
    val viaAgg = Tables.orders(spark, sfDir).groupBy(col("o_custkey").as("c_custkey"))
      .agg(max_by(col("o_orderkey"), col("o_totalprice")).as("o_orderkey"))
    assert(lat.count() == viaAgg.count(), "lateral must cover every customer with orders")
    assert(lat.select("c_custkey", "o_orderkey").exceptAll(viaAgg).count() == 0)
  }

  test("gap fill: spine is contiguous per user and zero-filled days carry forward values") {
    val g = run("q_gap_fill")
    // contiguous: per user, row count equals day span
    val span = g.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (datediff(max("day"), min("day")) + 1).as("expect"))
      .filter(col("n") =!= col("expect"))
    assert(span.count() == 0)
    // forward fill: sum_v_filled is only null before a user's first event day
    val firstReal = g.filter(col("n_events") > 0).groupBy("user_id").agg(min("day").as("d0"))
    val badNull = g.join(firstReal, "user_id")
      .filter(col("day") >= col("d0") && col("sum_v_filled").isNull)
    assert(badNull.count() == 0)
  }

  test("covar_samp/covar_pop match the exact co-moment formula") {
    // q_corr_covar's oracle checks the exact (integer-scaled) co-moments;
    // this pins the covariance aggregates themselves against those
    // ingredients
    val m = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(covar_samp("l_quantity", "l_extendedprice").as("covs"),
           covar_pop("l_quantity", "l_extendedprice").as("covp"),
           sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sq"),
           sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double").as("sp"),
           sum((col("l_quantity") * col("l_extendedprice")).cast("decimal(18,6)"))
             .cast("double").as("sqp"),
           count(lit(1)).cast("double").as("n"))
      .withColumn("covp_ref", (col("sqp") - col("sq") * col("sp") / col("n")) / col("n"))
      .withColumn("covs_ref", (col("sqp") - col("sq") * col("sp") / col("n")) / (col("n") - 1))
    val bad = m.filter(
      abs(col("covp") - col("covp_ref")) > abs(col("covp_ref")) * 1e-9 ||
      abs(col("covs") - col("covs_ref")) > abs(col("covs_ref")) * 1e-9)
    assert(bad.count() == 0)
  }

  test("union by name aligns reordered columns and null-fills the missing one") {
    val u = run("q_union_by_name")
    assert(u.columns.toSeq == Seq("o_orderkey", "o_totalprice", "src"))
    assert(u.filter(col("src").isNull).count() ==
      Tables.orders(spark, sfDir).filter(col("o_totalprice") < 1000).count())
  }

  test("as-of join: each purchase gets its user's LATEST prior view; both branches live") {
    val got = run("q_asof_join")
      .select("purchase_id", "user_id", "ev_value")
      .as[(Long, Long, Option[Double])].collect()
    val all = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "value", "event_type")
      .as[(Long, Long, java.sql.Timestamp, Double, String)].collect()
    val buys = all.filter(_._5 == "purchase")
    val viewsByUser = all.filter(_._5 == "view").groupBy(_._2)
    val byId = buys.map(b => b._1 -> (b._2, b._3)).toMap
    assert(got.length == buys.length)
    var matched = 0; var missing = 0
    got.foreach { case (pid, u, v) =>
      val (uu, t) = byId(pid)
      assert(u == uu)
      val expect = viewsByUser.get(u).toSeq.flatten
        .filter(e => !e._3.after(t)).sortBy(_._3.getTime).lastOption.map(_._4)
      assert(v == expect, s"purchase $pid user $u: got $v want $expect")
      if (v.isDefined) matched += 1 else missing += 1
    }
    // the r9 rebind exists because the old orders anchor matched NOTHING
    // (time-disjoint ranges) — the oracle passed without ever exercising
    // a hit; both branches must now carry real rows
    assert(matched > 0 && missing > 0, s"degenerate fixture: matched=$matched missing=$missing")
  }

  test("bitmap distinct rollup equals countDistinct exactly") {
    val bm = run("q_bitmap_distinct").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(bm == exact)
  }

  test("approx_top_k is exact when cardinality fits the sketch (the fixture regime)") {
    val approx = run("q_agg_approx_topk")
      .select("quantity", "n").as[(Long, Long)].collect().toSeq
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_quantity").cast("long").as("quantity"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("quantity").asc)
      .limit(10)
      .as[(Long, Long)].collect().toSeq
    // 50 distinct quantities << maxItemsTracked=10000: every counter is
    // exact, so the sketch must reproduce the exact top-10 verbatim
    assert(approx == exact, s"approx=$approx\nexact=$exact")
  }

  test("approx_count_distinct lands within 5% of exact per group") {
    val approx = run("q_agg_approx_distinct")
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"approx ${approx(k)} too far from exact $n for $k")
    }
  }

  test("approx_percentile brackets the exact percentiles within the accuracy contract") {
    val approx = run("q_agg_approx_percentile")
      .select("l_returnflag", "p25", "p50", "p75")
      .as[(String, Double, Double, Double)].collect()
    val exact = run("q_agg_percentile")
      .select("l_returnflag", "p25", "p50", "p75")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    approx.foreach { case (k, a25, a50, a75) =>
      val (_, e25, e50, e75) = exact(k)
      // approx_percentile(…, 1000) guarantees rank error <= n/1000; on
      // this distribution that is a small relative value error
      Seq((a25, e25), (a50, e50), (a75, e75)).foreach { case (a, e) =>
        assert(math.abs(a - e) <= math.max(1.0, e * 0.05),
          s"approx percentile $a drifted from exact $e for $k")
      }
    }
  }

  test("hll sketch union estimate lands within 5% of exact and equals the flat sketch") {
    val est = run("q_agg_hll_sketch").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"HLL estimate ${est(k)} too far from exact $n for $k")
    }
    // sketch-of-unions == union-of-sketches: re-aggregating stored daily
    // sketches must give the same estimate as sketching the raw column
    val flat = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .as[(String, Long)].collect().toMap
    assert(est == flat)
  }

  test("q_asof_join_forward matches each purchase to its user's earliest at-or-after signup; both branches live") {
    val got = run("q_asof_join_forward")
      .select("purchase_id", "user_id", "ev_value")
      .as[(Long, Long, Option[Double])].collect()
    val all = graft.engine.io.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "value", "event_type")
      .as[(Long, Long, java.sql.Timestamp, Double, String)].collect()
    val buys = all.filter(_._5 == "purchase")
    val signupsByUser = all.filter(_._5 == "signup").groupBy(_._2)
    val byId = buys.map(b => b._1 -> (b._2, b._3)).toMap
    assert(got.length == buys.length)
    var matched = 0; var exhausted = 0
    got.foreach { case (pid, u, v) =>
      val (uu, t) = byId(pid)
      assert(u == uu)
      val expect = signupsByUser.get(u).toSeq.flatten
        .filter(e => !e._3.before(t)) // ts >= purchase time (inclusive)
        .sortBy(_._3.getTime).headOption.map(_._4)
      assert(v == expect, s"purchase $pid user $u: got $v want $expect")
      if (v.isDefined) matched += 1 else exhausted += 1
    }
    assert(matched > 0 && exhausted > 0,
      s"degenerate fixture: matched=$matched exhausted=$exhausted")
  }

  test("q_asof_join_nearest picks the temporally closer click; ties go backward; both directions fire") {
    val got = run("q_asof_join_nearest")
      .select("purchase_id", "user_id", "ev_value", "diff_us")
      .as[(Long, Long, Option[Double], Option[Long])].collect()
    val all = graft.engine.io.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "value", "event_type")
      .as[(Long, Long, java.sql.Timestamp, Double, String)].collect()
    val buys = all.filter(_._5 == "purchase")
    val clicksByUser = all.filter(_._5 == "click").groupBy(_._2)
    val byId = buys.map(b => b._1 -> (b._2, b._3)).toMap
    assert(got.length == buys.length)
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
    var nBack = 0; var nFwd = 0
    got.foreach { case (pid, u, v, d) =>
      val (uu, t) = byId(pid)
      assert(u == uu)
      val cs = clicksByUser.get(u).toSeq.flatten
      val back = cs.filter(e => !e._3.after(t)).sortBy(e => -us(e._3)).headOption
      val fwd = cs.filter(e => !e._3.before(t)).sortBy(e => us(e._3)).headOption
      val expect = (back, fwd) match {
        case (None, f) => f
        case (b, None) => b
        case (Some(b), Some(f)) =>
          if (us(f._3) - us(t) < us(t) - us(b._3)) Some(f) else Some(b) // tie → backward
      }
      if (expect == back && back.isDefined) nBack += 1
      if (expect == fwd && expect != back) nFwd += 1
      assert(v == expect.map(_._4), s"purchase $pid user $u: got $v want $expect")
      assert(d == expect.map(e => math.abs(us(e._3) - us(t))),
        s"purchase $pid: diff mismatch $d vs $expect")
    }
    // the binding exists because BOTH scan directions win somewhere —
    // a fixture where one branch never fires proves half the operator
    assert(nBack > 0 && nFwd > 0, s"degenerate fixture: back=$nBack fwd=$nFwd")
  }

  test("q_asof_join_tolerance: fresh values pass, stale values null out, staleness reported raw") {
    val got = run("q_asof_join_tolerance")
      .select("purchase_id", "user_id", "ev_value", "stale_us", "fresh")
      .as[(Long, Long, Option[Double], Option[Long], Option[Boolean])].collect()
    val tol = 6L * 3600 * 1000000
    var fresh = 0; var stale = 0; var missing = 0
    got.foreach { case (pid, _, v, d, f) =>
      (d, f) match {
        case (None, None)        => assert(v.isEmpty); missing += 1
        case (Some(du), Some(fr)) =>
          assert(fr == (du <= tol), s"purchase $pid: verdict disagrees with staleness")
          if (fr) { assert(v.isDefined); fresh += 1 }
          else    { assert(v.isEmpty, s"stale value must NOT leak: $pid"); stale += 1 }
        case other => fail(s"purchase $pid: inconsistent nullity $other")
      }
    }
    assert(fresh > 0 && stale > 0 && missing > 0,
      s"all three branches must exercise: fresh=$fresh stale=$stale missing=$missing")
  }

  test("q_anomaly_windows: flagged hours satisfy the gate and reconcile with the window counts") {
    val got = run("q_anomaly_windows")
      .as[(Long, String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty, "fixture must exercise the anomaly branch")
    got.foreach { case (_, _, n, med, mad, score) =>
      assert(math.abs(n - med) > 2.0 * mad && score > 0.0)
    }
    // every flagged (type, hour) must carry the true hourly count
    val wc = graft.engine.io.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("h"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect()
      .map { case (h, t, n) => (h, t) -> n }.toMap
    got.foreach { case (h, t, n, _, _, _) => assert(wc((h, t)) == n) }
  }

  test("q_outlier_mad: flags exactly the docs beyond 2·MAD of their stratum median") {
    val docs = graft.engine.io.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars")
    val med = docs.groupBy("lang").agg(expr("percentile(n_chars, 0.5D)").as("med"))
    val dev = docs.join(med, "lang").withColumn("dev", abs(col("n_chars") - col("med")))
    val mad = dev.groupBy("lang").agg(expr("percentile(dev, 0.5D)").as("mad"))
    val expected = dev.join(mad, "lang")
      .filter(col("dev") > lit(2.0) * col("mad"))
      .select("doc_id").as[Long].collect().toSet
    val got = run("q_outlier_mad")
    val gotIds = got.select("doc_id").as[Long].collect().toSet
    assert(gotIds == expected)
    assert(gotIds.nonEmpty, "fixture must exercise the outlier branch")
    // the guarded score is monotone in the deviation and echoes the gate
    val rows = got.select("n_chars", "med", "mad", "mad_score")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.forall { case (n, m, a, s) =>
      math.abs(n - m) > 2.0 * a && s > 0.0 })
  }

  // r10: sweep-line invariants — the curve must genuinely overlap (the
  // vacuity rule: a coverage op whose max is 1 never exercised
  // concurrency), never go negative, and CLOSE (every +1 has its −1, so
  // the final boundary's running sum is exactly 0). The distributed
  // prefix sum reconciles against a driver-side flat scan.
  test("q_interval_coverage: overlaps exist, curve never negative, closes at zero") {
    val rows = run("q_interval_coverage")
      .as[(Long, Long, Long)].collect()   // (t_s, delta, n_open) ordered by t_s
    assert(rows.nonEmpty)
    assert(rows.map(_._3).max >= 2, "fixture must contain CONCURRENT sessions")
    assert(rows.forall(_._3 >= 0), "open-session count can never be negative")
    assert(rows.last._3 == 0, s"every session must close: final n_open=${rows.last._3}")
    // flat replication of the bucketed prefix sum
    var acc = 0L
    rows.foreach { case (_, d, n) => acc += d; assert(acc == n, s"prefix sum diverges at $n") }
  }

  // r10: both triangle regimes must be real — cliquish template
  // families AND triangle-free drift chains — or the canonicalization
  // signal the operator exists for is vacuous. Triangle count identity:
  // the per-node sum is 3x the number of triangles.
  test("q_graph_triangles: cliques and chains both present; per-node sum = 3 * triangles") {
    val rows = run("q_graph_triangles").as[(Long, Long)].collect()
    assert(rows.exists(_._2 == 0), "a triangle-free (chain) node must exist")
    assert(rows.exists(_._2 > 0), "a triangle-rich (family) node must exist")
    assert(rows.map(_._2).sum % 3 == 0,
      "each triangle contributes exactly once to each of its three nodes")
  }
}
