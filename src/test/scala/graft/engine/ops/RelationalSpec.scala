package graft.engine.ops

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Hand-computed unit checks per operator family on sf0.001 + tiny
  * in-memory frames — the granularity the DuckDB oracle can't isolate
  * (SURVEY §5.2 item 2). */
class RelationalSpec extends SparkSuite {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("every declared query executes and every oracled query is declared") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    assert(qs.size >= 50, s"inventory unexpectedly small: ${qs.size}")
  }

  test("merge upsert: actions partition the key space; inserts carry synthetic names") {
    val m = run("q_merge_upsert").select("c_custkey", "c_name", "merge_action")
      .as[(Long, String, String)].collect()
    val byAction = m.groupBy(_._3).map { case (k, v) => k -> v.length }
    // all three merge paths exercised on the fixture
    assert(byAction.keySet == Set("insert", "update", "unchanged"), s"got $byAction")
    // inserted keys sit past the shifted key space and carry NEW# names
    m.filter(_._3 == "insert").foreach { case (k, n, _) =>
      assert(k >= 1000000L && n == s"NEW#$k")
    }
    // merge is key-preserving: one output row per distinct merged key
    assert(m.map(_._1).distinct.length == m.length)
  }

  test("q_scan_count equals the documented sf0.001 row count") {
    assert(run("q_scan_count").head().getLong(0) == 6000L)
  }

  test("q_join_cross yields |region| × |nation| = 125 rows") {
    assert(run("q_join_cross").count() == 125L)
  }

  test("q_agg_group: group sums reconcile with the global filtered sum") {
    val df = run("q_agg_group")
    val total = df.agg(sum("count_order")).head().getLong(0)
    val direct = graft.engine.io.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == direct)
  }

  test("set algebra: |A∪B| = |A|+|B| (bag) and distinct ∪ ⊇ ∩") {
    val all = run("q_set_union_all").count()
    val o = graft.engine.io.Tables.orders(spark, sfDir)
    val a = o.filter(col("o_orderpriority") === "1-URGENT").count()
    val b = o.filter(col("o_orderstatus") === "F").count()
    assert(all == a + b)
    assert(run("q_set_union_distinct").count() >= run("q_set_intersect").count())
  }

  test("semi + anti partition the customer set") {
    val c = graft.engine.io.Tables.customer(spark, sfDir).count()
    assert(run("q_join_semi").count() + run("q_join_anti").count() == c)
  }

  test("rollup = groups + per-flag subtotals + grand total; cube adds the flipped hierarchy") {
    val groups = graft.engine.io.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_linestatus").distinct().count()
    val flags = graft.engine.io.Tables.lineitem(spark, sfDir)
      .select("l_returnflag").distinct().count()
    val statuses = graft.engine.io.Tables.lineitem(spark, sfDir)
      .select("l_linestatus").distinct().count()
    assert(run("q_agg_rollup").count() == groups + flags + 1)
    assert(run("q_agg_cube").count() == groups + flags + statuses + 1)
  }

  test("window rank: row_number is a 1..n permutation per partition") {
    val bad = run("q_window_rank")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"), min("rn").as("mn"),
           countDistinct("rn").as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
      .count()
    assert(bad == 0L)
  }

  test("ntile never differs by more than 1 in bucket size") {
    val sizes = run("q_window_rank").groupBy("o_custkey", "nt").count()
      .groupBy("o_custkey").agg((max("count") - min("count")).as("spread"))
      .filter(col("spread") > 1).count()
    assert(sizes == 0L)
  }

  test("q_topk returns exactly the 10 priciest orders") {
    val topk = run("q_topk").select("o_orderkey").as[Long].collect().toSet
    val brute = graft.engine.io.Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
      .select("o_orderkey").as[Long].collect().toSet
    assert(topk == brute)
  }

  test("q_dedup_exact is idempotent (dedup of dedup output is a no-op)") {
    val once = run("q_dedup_exact")
    assert(once.count() == once.dropDuplicates("text").count())
  }

  test("q_dedup_key keeps exactly one row per user") {
    val d = run("q_dedup_key")
    assert(d.count() == d.select("user_id").distinct().count())
  }

  test("join on tiny hand-built frames matches hand-computed result") {
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "lv")
    val r = Seq((1, "x"), (1, "y"), (4, "z")).toDF("id", "rv")
    assert(l.join(r, Seq("id"), "inner").count() == 2)
    assert(l.join(r, Seq("id"), "left_outer").count() == 4)
    assert(l.join(r, Seq("id"), "left_semi").count() == 1)
    assert(l.join(r, Seq("id"), "left_anti").as[(Int, String)].collect().map(_._1).sorted.toSeq == Seq(2, 3))
  }

  test("decimal sum path is exact: dsum equals integer arithmetic on a known frame") {
    val df = Seq(0.1, 0.2, 0.3).toDF("x")
    val got = df.agg(sum(col("x").cast("decimal(18,6)")).cast("decimal(38,6)")).head().getDecimal(0)
    assert(got.compareTo(new java.math.BigDecimal("0.600000")) == 0)
  }

  test("q_profile: one row per column; id column is unique; totals consistent") {
    val p = run("q_profile")
      .select("col_name", "n_rows", "n_nonnull", "n_distinct")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(p.keySet == Set("doc_id", "lang", "n_chars", "source", "text"))
    val nRows = p("doc_id")._2
    assert(p.values.forall(_._2 == nRows), "n_rows must be the table count on every row")
    assert(p.values.forall(r => r._3 <= nRows && r._4 <= r._3),
      "nonnull <= rows and distinct <= nonnull")
    // the fixture id column is dense and unique
    assert(p("doc_id")._4 == nRows)
  }

  test("zOrder2: bit-exact interleave and the per-range double-bound property") {
    // hand-computed Morton codes: x bits land on odd positions (<<1 side)
    val z = Seq((1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (1023L, 1023L))
      .toDF("x", "y")
      .select(Relational.zOrder2(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    //  (1,0)→10b=2; (0,1)→01b=1; (1,1)→11b=3; (2,3)→(spread2=4)<<1 | spread3=5 → 13
    assert(z == Seq(2L, 1L, 3L, 13L, (1L << 20) - 1))
    // q_zorder: zrange keeps the top 3 bits of BOTH 10-bit dims, so every
    // range bounds both dimensions inside an aligned 128-wide window —
    // the file-skipping guarantee a single-column sort can't give
    val stats = run("q_zorder")
      .select("n_rows", "cust_width", "day_width").as[(Long, Long, Long)].collect()
    assert(stats.nonEmpty)
    assert(stats.forall { case (_, cw, dw) => cw <= 127 && dw <= 127 })
    val total = stats.map(_._1).sum
    assert(total == graft.engine.io.Tables.orders(spark, sfDir).count())
  }
}
