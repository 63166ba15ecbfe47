package graft.engine.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.io.Tables

/** Relational operator inventory, SURVEY.md §2.2 sections A–H.
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame` built from
  * declarative Column expressions so Catalyst sees the whole plan
  * (pushdown, pruning, join selection are asserted in PlanShapeSpec).
  *
  * Determinism contract vs the DuckDB oracle (SURVEY §2.2):
  *  - every query ends in a total-order sort whose last key is unique;
  *  - SUMs of doubles go through DECIMAL(18,6): decimal addition is
  *    exact, so engine summation order cannot perturb the value (a raw
  *    double sum over 60k ~1e5-magnitude rows can drift > 1e-4 between
  *    engines, defeating ROUND(x,4)). The exact decimal is cast to DOUBLE
  *    in the final projection on BOTH sides — a correctly-rounded IEEE
  *    conversion of the same rational, hence bit-identical — because the
  *    driver comparator reads Spark parquet via pandas (DECIMAL → python
  *    Decimal objects) but the oracle via DuckDB (DECIMAL → float64), so
  *    a DECIMAL output column hash-mismatches on dtype alone;
  *  - AVG / stddev / ratios stay double but are ROUND(x,4)'d (their
  *    error is sum-error/n, far below 1e-4);
  *  - per-row arithmetic is left raw: identical IEEE ops on identical
  *    inputs are bit-equal across engines;
  *  - no raw TIMESTAMP column is ever output (cast to DATE instead);
  *  - integer-ish outputs are cast to BIGINT on both sides (DuckDB's
  *    sum(BIGINT)→HUGEINT, year()→BIGINT, Spark's row_number→INT etc.
  *    would otherwise mismatch the schema).
  */
object Relational {
  private type Q = (SparkSession, String) => DataFrame

  /** Exact deterministic sum of a double expression (see scaladoc). */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("decimal(38,6)").cast("double")
  /** SQL-side mirror of [[dsum]]. */
  private def dsumSql(e: String): String =
    s"CAST(CAST(sum(CAST($e AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)"

  // ---------------------------------------------------------------- A. scans
  private val qScanCount: Q = (s, d) =>
    Tables.lineitem(s, d).agg(count(lit(1)).as("n_rows"))

  private val qScanPrune: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_quantity") // 2 of 11 cols → pruned scan
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")

  /** A. scans, partitioned layout: the date-partitioned events directory
    * (SURVEY §4.2's 100 TB layout via [[Tables.eventsByDate]]) scanned
    * through dynamic partition pruning — the filtered date-dimension
    * join prunes fact directories at RUNTIME, so only the first two
    * days are ever read off disk no matter how many days the table
    * spans (the DPP subquery + static partition filter are pinned in
    * PlanShapeSpec). At 100 TB this is THE scan-pruning story: a year
    * of events is ~365 directories and a two-day query touches 2. */
  private val qScanPartitioned: Q = (s, d) => {
    val (fact, dim) = Tables.eventsByDate(s, d)
    fact.join(dim.filter(col("day_no") <= 2), Seq("event_date"))
      .groupBy("event_date", "event_type")
      .agg(count(lit(1)).as("n"), sum("user_id").as("sum_user"))
      .orderBy("event_date", "event_type")
  }

  // ---------------------------------------------------- B. project / filter
  private val qProjectArith: Q = (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"), col("l_discount"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
      (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"))
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "net_price", "charge")

  private val qFilterBasic: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter((col("l_quantity") < 24 && col("l_discount") >= 0.05) ||
              (col("l_returnflag") === "A" && col("l_linestatus") =!= "F" && !(col("l_tax") > 0.06)))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag", "l_linestatus", "l_tax")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag", "l_linestatus", "l_tax")

  private val qFilterInLikeBetween: Q = (s, d) =>
    Tables.orders(s, d)
      .filter((col("o_orderpriority").isin("1-URGENT", "2-HIGH") && !col("o_orderpriority").like("1-%")) ||
              (col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
               col("o_orderdate").between(lit("1996-01-01").cast("timestamp"), lit("1998-12-31").cast("timestamp"))))
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_orderpriority"), col("o_orderstatus"),
        expr("nullif(o_orderstatus,'P') IS NULL").as("is_pending"),
        col("o_orderpriority").like("1-%").as("is_top"),
        col("o_orderdate").cast("date").as("od"))
      .orderBy("o_orderkey")

  // ----------------------------------------------------------------- C. joins
  private val qJoinInner: Q = (s, d) => {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("c_mktsegment"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  private val qJoinLeft: Q = (s, d) => {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("c_custkey")
  }

  /** Error-tolerant scalar surface: `try_cast` / `try_divide` /
    * `try_element_at` return NULL where strict evaluation would raise —
    * the semantics malformed records demand at 100 TB (one bad row must
    * not kill a stage). DuckDB's default division-by-zero → NULL and
    * TRY_CAST line up exactly, so the whole query is oracle-checkable.
    *
    * The malformed input is a 1% MINORITY on purpose — the realistic
    * curation shape AND a measured cost cliff: Spark's try_cast
    * constructs a caught exception per FAILING row (~17 µs each), so an
    * all-malformed 150 k-row column costs ~2.6 s where the 1% mix costs
    * ~0.03 s (profiled at sf0.1). A pipeline try_casting a column that
    * is wholesale the wrong type should fix the schema, not eat
    * exception-throughput. */
  private val qTryFuncs: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      expr("try_cast(CASE WHEN o_orderkey % 100 = 0 THEN o_orderpriority " +
           "ELSE substring(o_orderpriority, 1, 1) END AS INT)").as("prio_int"),
      expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)").as("prio_num"),
      expr("try_divide(o_totalprice, CAST(o_custkey % 3 AS DOUBLE))").as("ratio"),
      expr("try_element_at(array(o_orderkey, o_custkey), CAST(o_custkey % 3 AS INT) + 1)").as("oob"))
      .orderBy("o_orderkey")

  /** C. joins, bucketed layout: lineitem ⋈ orders on the order key over
    * [[Tables.bucketedOrdersJoin]]'s co-located buckets — the join AND
    * the post-join per-order aggregation both run with ZERO shuffle
    * (the SMJ inherits the bucket partitioning; the groupBy key equals
    * the join key, so the agg reuses it; pinned in PlanShapeSpec as "no
    * Exchange hashpartitioning anywhere"). The merge hint keeps AQE
    * from broadcasting the small fixture side, because the point IS the
    * sort-merge path — at 100 TB neither side broadcasts, and bucketing
    * is what deletes the shuffle. */
  private val qJoinBucketed: Q = (s, d) => {
    val (l, o) = Tables.bucketedOrdersJoin(s, d)
    l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderkey")
  }

  /** FULL OUTER join with genuinely unmatched rows on BOTH sides
    * (BUILDING-segment customers vs urgent-order counts): the
    * null-completion semantics left/right joins can't express. The
    * pre-aggregated right side keeps the join 1:1, so the output key is
    * unique and the oracle sort total. */
  private val qJoinFull: Q = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_urgent"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(
        coalesce(c("c_custkey"), o("o_custkey")).as("k"),
        col("c_name"),
        coalesce(col("n_urgent"), lit(0L)).as("n_urgent"),
        when(c("c_custkey").isNull, "order_only")
          .when(o("o_custkey").isNull, "cust_only")
          .otherwise("both").as("side"))
      .orderBy("k")
  }

  /** Higher-order array functions (transform / filter / aggregate) over
    * the embeddings column — the lambda surface a user processes array
    * columns with when no built-in fits. The fold runs left-to-right in
    * both engines, so the double sum is bit-identical unrounded. */
  private val qHigherOrder: Q = (s, d) =>
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
      aggregate(transform(col("embedding"), x => x.cast("double")),
        lit(0.0), (a, x) => a + x).as("vec_sum"))
      .orderBy("vec_id")

  private val qJoinSemi: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment").orderBy("c_custkey")
  }

  private val qJoinAnti: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment").orderBy("c_custkey")
  }

  private val qJoinNonequi: Q = (s, d) => {
    val l = Tables.lineitem(s, d); val o = Tables.orders(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey") &&
              l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_late"))
      .orderBy("o_orderpriority")
  }

  private val qJoinCross: Q = (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select("r_name", "n_name").orderBy("r_name", "n_name")

  private val qJoinMulti: Q = (s, d) => {
    val c = Tables.customer(s, d); val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d); val n = Tables.nation(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  private val qJoinBroadcast: Q = (s, d) => {
    val l = Tables.lineitem(s, d); val p = Tables.part(s, d)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("p_brand")
  }

  // ----------------------------------------------------------- D. aggregates
  /** Flagship: TPC-H Q1 shape (SURVEY §2.2-D). */
  val qAggGroup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val qAggDistinct: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("distinct_parts"), count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  private val qAggStats: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_linestatus")
      .agg(min("l_extendedprice").as("min_price"), max("l_extendedprice").as("max_price"),
           round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
           round(var_samp(col("l_discount")), 4).as("var_disc"))
      .orderBy("l_linestatus")

  private val qAggHaving: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_suppkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"), round(avg("l_quantity"), 4).as("avg_qty"),
           count(lit(1)).as("n_rows"))
      .filter(col("avg_qty") > 25.5)
      .orderBy("l_suppkey")

  private val qAggRollup: Q = (s, d) =>
    Tables.lineitem(s, d).rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val qAggCube: Q = (s, d) =>
    Tables.lineitem(s, d).cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val qAggGroupingSets: Q = (s, d) =>
    s.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  count(*) AS n_rows
         |FROM parquet.`$d/lineitem.parquet`
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)

  /** Non-oracle (HLL estimates are engine-specific); rows-only check. */
  private val qAggApproxDistinct: Q = (s, d) =>
    Tables.events(s, d).groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"), count(lit(1)).as("n_rows"))
      .orderBy("event_type")

  // ------------------------------------------------------------- E. windows
  private val qWindowRank: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      row_number().over(w).cast("long").as("rn"),
      rank().over(w).cast("long").as("rk"),
      dense_rank().over(w).cast("long").as("drk"),
      ntile(4).over(w).cast("long").as("nt"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowAnalytic: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d).select(
      col("user_id"), col("event_id"), col("value"),
      lag("value", 1).over(w).as("prev_value"),
      lead("value", 1).over(w).as("next_value"),
      first("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_val"),
      last("value").over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)).as("last_val"))
      .orderBy("user_id", "event_id")
  }

  private val qWindowFrame: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("date").as("od"),
      round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4).as("running_total"),
      round(avg("o_totalprice").over(w.rowsBetween(-2, Window.currentRow)), 4).as("trail3_avg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // ------------------------------------------------------- F. sort / top-k
  private val qSortMulti: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
              col("o_orderdate").cast("date").as("od"), col("o_totalprice"))
      .orderBy(col("o_orderstatus").desc_nulls_last, col("o_orderpriority").asc_nulls_first,
               col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)

  private val qTopk: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

  // ------------------------------------------------------------ G. set ops
  private def urgentKeys(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
  private def buildingKeys(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")

  private val qSetUnionAll: Q = (s, d) => {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey", "o_totalprice")
      .unionAll(o.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_totalprice"))
      .orderBy("o_orderkey", "o_totalprice")
  }

  private val qSetUnionDistinct: Q = (s, d) =>
    buildingKeys(s, d).union(urgentKeys(s, d)).distinct().orderBy("c_custkey")

  private val qSetIntersect: Q = (s, d) =>
    buildingKeys(s, d).intersect(urgentKeys(s, d)).orderBy("c_custkey")

  private val qSetExcept: Q = (s, d) => {
    val withOrders = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
    val auto = Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
    withOrders.except(auto).orderBy("c_custkey")
  }

  /** Bag (ALL) set semantics: multiplicities are preserved — the
    * INTERSECT ALL / EXCEPT ALL pair completing the distinct variants
    * above. Aggregated to (key, count) so the oracle sort is total. */
  private val qSetIntersectAll: Q = (s, d) => {
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("k"))
    val high = Tables.orders(s, d).filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_custkey").as("k"))
    urgent.intersectAll(high).groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
  }

  private val qSetExceptAll: Q = (s, d) => {
    val all = Tables.orders(s, d).select(col("o_custkey").as("k"))
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("k"))
    all.exceptAll(urgent).groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
  }

  // ------------------------------------------------- H. scalar fns & more
  private val qStrFuncs: Q = (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("up_name"),
      lower(col("p_brand")).as("lo_brand"),
      substring(col("p_name"), 1, 8).as("name8"),
      length(col("p_name")).cast("long").as("name_len"),
      trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
      expr("replace(p_name, ' ', '_')").as("name_us"),
      lpad(col("p_brand"), 12, "*").as("brand_pad"),
      expr("split_part(p_type, ' ', 1)").as("first_word"),
      concat(col("p_brand"), lit("-"), col("p_size").cast("string")).as("brand_size"))
      .orderBy("p_partkey")

  private val qRegexp: Q = (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"), col("p_type"),
      regexp_extract(col("p_type"), "^(\\w+)", 1).as("first_tok"),
      col("p_type").rlike("^PROMO").as("is_promo"))
      .orderBy("p_partkey")

  private val qDateFuncs: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mo"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
      datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to_2002"),
      add_months(col("o_orderdate"), 3).cast("date").as("plus3m"))
      .orderBy("o_orderkey")

  private val qMathFuncs: Q = (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_quantity") - 25.0).as("abs_qty"),
      ceil(col("l_extendedprice")).as("ceil_price"),
      floor(col("l_extendedprice")).as("floor_price"),
      round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
      round(pow(col("l_extendedprice") / 1000.0, 2), 4).as("pow_price"),
      pmod(col("l_orderkey"), lit(7)).as("mod7"))
      .orderBy("l_orderkey", "l_linenumber", "abs_qty", "ceil_price", "sqrt_price")

  private val qCaseCast: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_totalprice") < 50000, "low")
        .when(col("o_totalprice") < 150000, "mid")
        .otherwise("high").as("band"),
      col("o_orderkey").cast("string").as("okey_str"),
      col("o_orderkey").cast("string").cast("long").as("okey_back"),
      col("o_totalprice").cast("long").as("price_int"),
      col("o_orderdate").cast("date").as("od"))
      .orderBy("o_orderkey")

  // slice() is exercised but projected back to scalars (size + last
  // element): the driver comparator cannot sort/hash array cells.
  private val qArrayFuncs: Q = (s, d) =>
    Tables.embeddings(s, d).select(
      col("vec_id"), col("label"),
      size(col("embedding")).cast("long").as("dim"),
      element_at(col("embedding"), 1).as("first_val"),
      size(slice(col("embedding"), 1, 3)).cast("long").as("first3_len"),
      element_at(slice(col("embedding"), 1, 3), 3).as("first3_last"),
      (element_at(col("embedding"), 1).cast("double") +
       element_at(col("embedding"), 2).cast("double") +
       element_at(col("embedding"), 3).cast("double")).as("sum3"))
      .orderBy("vec_id")

  private val qJsonFuncs: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"), round(avg("k"), 4).as("avg_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Malformed-payload ingestion accounting — the PERMISSIVE-mode
    * contract a 100 TB event firehose needs: a deterministic 1-in-97
    * slice of payloads arrives TRUNCATED (mid-object cut, the classic
    * producer-crash artifact), extraction yields null instead of
    * failing the job, and the per-type report carries the
    * valid/corrupt split plus the salvaged aggregate — the corruption-
    * rate dashboard that pages someone BEFORE the bad producer pollutes
    * a day of landing. One narrow projection + one hash agg; the
    * corrupt branch costs nothing extra (get_json_object already
    * null-rejects invalid input in a codegen'd pass). */
  private val qJsonMalformed: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("payload",
        when(pmod(col("event_id"), lit(97)) === 0,
          expr("substring(props, 1, length(props) - 2)"))
          .otherwise(col("props")))
      .select(col("event_type"),
        get_json_object(col("payload"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
           count(col("k")).as("n_valid"),
           (count(lit(1)) - count(col("k"))).as("n_corrupt"),
           sum("k").as("sum_k"))
      .orderBy("event_type")

  private val qExplodeTokens: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)

  private val qSubqueryScalar: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val g = o.agg(avg("o_totalprice").as("g"))
    o.crossJoin(broadcast(g)).filter(col("o_totalprice") > col("g"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** SCD-1 MERGE/upsert expressed as one full-outer coalesce join — the
    * engine-agnostic shape of `MERGE INTO` (no transactional table format
    * ships in this environment, so the merge RESULT is the operator):
    * matched keys take the update's values, source-only keys become
    * inserts, target-only keys pass through unchanged. The updates side
    * derives from orders (max price per customer), with keys ≡ 0 (mod 7)
    * shifted past the key space to exercise the insert path.
    *
    * Scale: a single equi-join on the merge key — AQE broadcasts the
    * updates side when small, else a standard shuffle join; exactly the
    * plan a MERGE rewrite lowers to. `max` (not a float sum) keeps the
    * updated balance bit-exact cross-engine. */
  private val qMergeUpsert: Q = (s, d) => {
    val upd = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(max("o_totalprice").as("u_bal"))
      .select(
        when(col("o_custkey") % 7 === 0, col("o_custkey") + 1000000L)
          .otherwise(col("o_custkey")).as("c_custkey"),
        col("u_bal"))
    Tables.customer(s, d).join(upd, Seq("c_custkey"), "full_outer")
      .select(
        col("c_custkey"),
        coalesce(col("c_name"), concat(lit("NEW#"), col("c_custkey"))).as("c_name"),
        coalesce(col("u_bal"), col("c_acctbal")).as("c_acctbal"),
        when(col("u_bal").isNull, "unchanged")
          .when(col("c_name").isNull, "insert")
          .otherwise("update").as("merge_action"))
      .orderBy("c_custkey")
  }

  /** Interleave the low 16 bits of `c` with zeros (Morton spread) using
    * the classic shift-or-mask ladder — pure BIGINT arithmetic, inside
    * whole-stage codegen, and replayable verbatim in ANSI SQL. */
  private def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(65535L))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(16711935L))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(252645135L))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(858993459L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(1431655765L))
  }

  /** Morton/Z-order key over two dimension codes: bit-interleaves them
    * so range-close points in EITHER dimension stay close in the single
    * sort key — the multi-dimensional clustering layout behind
    * Delta/Iceberg OPTIMIZE ZORDER. */
  private[engine] def zOrder2(x: Column, y: Column): Column =
    shiftleft(spread16(x), 1).bitwiseOR(spread16(y))

  /** Z-order layout audit — the data-skipping story made measurable:
    * orders keyed on (customer code, order-day code) via [[zOrder2]],
    * cut into 64 contiguous z-ranges (the "files" a writer laying out
    * by zkey would produce), and per range the min/max of BOTH source
    * dimensions — the per-file statistics a reader prunes on. Because
    * the z-curve alternates bits, every file bounds every dimension at
    * ~√(file share) of its domain, so a predicate on EITHER column
    * skips most files; a single-column sort gives this for one
    * dimension and nothing for the other (its width stays ~full-domain,
    * which this query exposes in `cust_width`/`day_width`).
    *
    * Scale shape: one narrow projection (the bit ladder is pure int
    * arithmetic in codegen) + one hash aggregate on the 64-value range
    * id. The real writer path is `repartitionByRange(zkey)` +
    * `sortWithinPartitions(zkey)` — same key, same stats, shown here as
    * the audit query so the oracle can replay it. */
  private val qZorder: Q = (s, d) => {
    val base = Tables.orders(s, d).select(
      pmod(col("o_custkey"), lit(1024L)).as("x"),
      pmod(datediff(to_date(col("o_orderdate")), lit(java.sql.Date.valueOf("1992-01-01"))).cast("long"),
        lit(1024L)).as("y"))
    base.withColumn("zrange", shiftright(zOrder2(col("x"), col("y")), 14))
      .groupBy("zrange")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_cust"), max("x").as("max_cust"),
        min("y").as("min_day"), max("y").as("max_day"),
        (max("x") - min("x")).as("cust_width"),
        (max("y") - min("y")).as("day_width"))
      .orderBy("zrange")
  }

  /** One-pass table profiling — the data-quality dashboard shape: for
    * every column, row count, non-null count, exact distinct count and
    * min/max (rendered as strings so heterogeneous columns share one
    * schema), computed in a SINGLE aggregate over the table and then
    * unpivoted driver-free (explode of a literal struct array over the
    * 1-row aggregate — no stack on a shuffled side, no per-column
    * re-scan).
    *
    * Scale shape: one scan; the multi-column distinct plans as Spark's
    * Expand (one duplicated stream per distinct column), so the shuffle
    * carries ~n_cols× the input — the standard exact-profile price. At
    * 100 TB you swap `countDistinct` for `approx_count_distinct` and
    * the plan collapses to a plain partial+final aggregate (that tier
    * is `q_agg_approx_distinct`); kept exact here so DuckDB can replay
    * it value-for-value. */
  private val qProfile: Q = (s, d) => {
    val df = Tables.documents(s, d)
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"nn_$c").as("n_nonnull"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_repr"),
        col(s"mx_$c").as("max_repr"))): _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  // ------------------------------------------------------------------ maps
  val queries: Map[String, Q] = Map(
    "q_profile" -> qProfile, "q_zorder" -> qZorder,
    "q_merge_upsert" -> qMergeUpsert,
    "q_scan_count" -> qScanCount, "q_scan_prune" -> qScanPrune,
    "q_scan_partitioned" -> qScanPartitioned,
    "q_join_bucketed" -> qJoinBucketed,
    "q_project_arith" -> qProjectArith, "q_filter_basic" -> qFilterBasic,
    "q_filter_in_like_between" -> qFilterInLikeBetween,
    "q_join_inner" -> qJoinInner, "q_join_left" -> qJoinLeft,
    "q_join_full" -> qJoinFull, "q_higher_order" -> qHigherOrder,
    "q_try_funcs" -> qTryFuncs,
    "q_join_semi" -> qJoinSemi, "q_join_anti" -> qJoinAnti,
    "q_join_nonequi" -> qJoinNonequi, "q_join_cross" -> qJoinCross,
    "q_join_multi" -> qJoinMulti, "q_join_broadcast" -> qJoinBroadcast,
    "q_agg_group" -> qAggGroup, "q_agg_distinct" -> qAggDistinct,
    "q_agg_stats" -> qAggStats, "q_agg_having" -> qAggHaving,
    "q_agg_rollup" -> qAggRollup, "q_agg_cube" -> qAggCube,
    "q_agg_grouping_sets" -> qAggGroupingSets, "q_agg_approx_distinct" -> qAggApproxDistinct,
    "q_window_rank" -> qWindowRank, "q_window_analytic" -> qWindowAnalytic,
    "q_window_frame" -> qWindowFrame,
    "q_sort_multi" -> qSortMulti, "q_topk" -> qTopk,
    "q_set_union_all" -> qSetUnionAll, "q_set_union_distinct" -> qSetUnionDistinct,
    "q_set_intersect" -> qSetIntersect, "q_set_except" -> qSetExcept,
    "q_set_intersect_all" -> qSetIntersectAll, "q_set_except_all" -> qSetExceptAll,
    "q_str_funcs" -> qStrFuncs, "q_regexp" -> qRegexp,
    "q_date_funcs" -> qDateFuncs, "q_math_funcs" -> qMathFuncs,
    "q_case_cast" -> qCaseCast, "q_array_funcs" -> qArrayFuncs,
    "q_json_funcs" -> qJsonFuncs, "q_json_malformed" -> qJsonMalformed,
    "q_explode_tokens" -> qExplodeTokens,
    "q_subquery_scalar" -> qSubqueryScalar,
  )

  val oracle: Map[String, String] = Map(
    // the same shift-or-mask ladder, spelled stepwise in CTE columns;
    // pmod guards replicated even though both dims are nonnegative on
    // the fixture (custkey ≥ 1, orderdate ≥ 1992-01-01)
    "q_zorder" ->
      """WITH dims AS (
        |  SELECT (((o_custkey % 1024) + 1024) % 1024) AS x,
        |         (((date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 1024) + 1024) % 1024) AS y
        |  FROM orders),
        |s1 AS (SELECT x, y, (x | (x << 8)) & 16711935 AS a, (y | (y << 8)) & 16711935 AS b FROM dims),
        |s2 AS (SELECT x, y, (a | (a << 4)) & 252645135 AS a, (b | (b << 4)) & 252645135 AS b FROM s1),
        |s3 AS (SELECT x, y, (a | (a << 2)) & 858993459 AS a, (b | (b << 2)) & 858993459 AS b FROM s2),
        |s4 AS (SELECT x, y, (a | (a << 1)) & 1431655765 AS a, (b | (b << 1)) & 1431655765 AS b FROM s3),
        |z AS (SELECT x, y, ((a << 1) | b) >> 14 AS zrange FROM s4)
        |SELECT zrange, count(*) AS n_rows,
        |  min(x) AS min_cust, max(x) AS max_cust,
        |  min(y) AS min_day, max(y) AS max_day,
        |  max(x) - min(x) AS cust_width, max(y) - min(y) AS day_width
        |FROM z GROUP BY zrange ORDER BY zrange""".stripMargin,

    // per-column UNION ALL replay of the one-pass profile; count(DISTINCT)
    // ignores nulls on both engines, CAST(min/max AS VARCHAR) renders
    // ints/strings identically (fixture corpus is ASCII)
    "q_profile" -> Seq("doc_id", "lang", "n_chars", "source", "text").map(c =>
      s"""SELECT '$c' AS col_name, (SELECT count(*) FROM documents) AS n_rows,
         |  count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_repr, CAST(max($c) AS VARCHAR) AS max_repr
         |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "q_scan_count" -> "SELECT count(*) AS n_rows FROM lineitem",

    "q_merge_upsert" ->
      """WITH u0 AS (SELECT o_custkey, max(o_totalprice) AS u_bal
        |            FROM orders GROUP BY o_custkey),
        |upd AS (SELECT CASE WHEN o_custkey % 7 = 0 THEN o_custkey + 1000000
        |               ELSE o_custkey END AS c_custkey, u_bal FROM u0)
        |SELECT COALESCE(c.c_custkey, u.c_custkey) AS c_custkey,
        |  COALESCE(c.c_name, 'NEW#' || COALESCE(c.c_custkey, u.c_custkey)) AS c_name,
        |  COALESCE(u.u_bal, c.c_acctbal) AS c_acctbal,
        |  CASE WHEN u.u_bal IS NULL THEN 'unchanged'
        |       WHEN c.c_name IS NULL THEN 'insert'
        |       ELSE 'update' END AS merge_action
        |FROM customer c FULL JOIN upd u ON c.c_custkey = u.c_custkey
        |ORDER BY c_custkey""".stripMargin,

    // replays the partitioned-layout query over raw events: the layout is
    // content-preserving (events + derived event_date), so the same
    // derivation + dim join reproduces it exactly
    "q_scan_partitioned" ->
      """WITH ev AS (SELECT ts::DATE AS event_date, event_type, user_id FROM events),
        |dim AS (
        |  SELECT event_date, row_number() OVER (ORDER BY event_date) AS day_no
        |  FROM (SELECT DISTINCT event_date FROM ev))
        |SELECT e.event_date, e.event_type, count(*) AS n,
        |       CAST(sum(e.user_id) AS BIGINT) AS sum_user
        |FROM ev e JOIN dim USING (event_date)
        |WHERE day_no <= 2
        |GROUP BY e.event_date, e.event_type
        |ORDER BY e.event_date, e.event_type""".stripMargin,

    "q_scan_prune" ->
      s"""SELECT l_returnflag, count(*) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_project_arith" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
        |  l_extendedprice * (1 - l_discount) AS net_price,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount, net_price, charge""".stripMargin,

    "q_filter_basic" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus, l_tax
        |FROM lineitem
        |WHERE (l_quantity < 24 AND l_discount >= 0.05)
        |   OR (l_returnflag = 'A' AND l_linestatus <> 'F' AND NOT (l_tax > 0.06))
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus, l_tax""".stripMargin,

    "q_filter_in_like_between" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus,
        |  nullif(o_orderstatus,'P') IS NULL AS is_pending,
        |  o_orderpriority LIKE '1-%' AS is_top,
        |  CAST(o_orderdate AS DATE) AS od
        |FROM orders
        |WHERE (o_orderpriority IN ('1-URGENT','2-HIGH') AND NOT o_orderpriority LIKE '1-%')
        |   OR (o_orderpriority IN ('1-URGENT','2-HIGH')
        |       AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31')
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_left" ->
      s"""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS sum_price
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_full" ->
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS k, c.c_name AS c_name,
        |  COALESCE(o.n_urgent, 0) AS n_urgent,
        |  CASE WHEN c.c_custkey IS NULL THEN 'order_only'
        |       WHEN o.o_custkey IS NULL THEN 'cust_only'
        |       ELSE 'both' END AS side
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') c
        |FULL JOIN (SELECT o_custkey, count(*) AS n_urgent FROM orders
        |           WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY k""".stripMargin,

    // the bucketed layout is content-preserving, so the co-located join
    // replays as a plain equi-join on the raw tables
    "q_join_bucketed" ->
      s"""SELECT o_orderkey, count(*) AS n_items,
         |  ${dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_try_funcs" ->
      """SELECT o_orderkey,
        |  TRY_CAST(CASE WHEN o_orderkey % 100 = 0 THEN o_orderpriority
        |           ELSE substring(o_orderpriority, 1, 1) END AS INT) AS prio_int,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
        |  o_totalprice / CAST(o_custkey % 3 AS DOUBLE) AS ratio,
        |  ([o_orderkey, o_custkey])[CAST(o_custkey % 3 AS INT) + 1] AS oob
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_higher_order" ->
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(embedding, x -> CAST(x AS DOUBLE))),
        |    (a, b) -> a + b) AS vec_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_nonequi" ->
      """SELECT o_orderpriority, count(*) AS n_late
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",

    "q_join_multi" ->
      s"""SELECT n_name,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_join_broadcast" ->
      s"""SELECT p_brand, count(*) AS n_items, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  round(avg(l_quantity), 4) AS avg_qty,
         |  round(avg(l_extendedprice), 4) AS avg_price,
         |  round(avg(l_discount), 4) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_stats" ->
      """SELECT l_linestatus, min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_discount), 4) AS var_disc
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_agg_having" ->
      s"""SELECT l_suppkey, ${dsumSql("l_quantity")} AS sum_qty,
         |  round(avg(l_quantity), 4) AS avg_qty, count(*) AS n_rows
         |FROM lineitem GROUP BY l_suppkey
         |HAVING round(avg(l_quantity), 4) > 25.5
         |ORDER BY l_suppkey""".stripMargin,

    "q_agg_rollup" ->
      s"""SELECT CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  l_returnflag, l_linestatus, count(*) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      s"""SELECT CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  l_returnflag, l_linestatus, count(*) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER w AS rn, rank() OVER w AS rk,
        |  dense_rank() OVER w AS drk, ntile(4) OVER w AS nt
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_analytic" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  first_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_val,
        |  last_value(value) OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_val
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
        |  round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
        |  round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS trail3_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, CAST(o_orderdate AS DATE) AS od, o_totalprice
        |FROM orders
        |ORDER BY o_orderstatus DESC NULLS LAST, o_orderpriority ASC NULLS FIRST,
        |  o_totalprice DESC NULLS LAST, o_orderkey ASC""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_set_union_all" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "q_set_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,

    "q_set_intersect_all" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '2-HIGH')
        |GROUP BY k ORDER BY k""".stripMargin,

    "q_set_except_all" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY k ORDER BY k""".stripMargin,

    "q_set_except" ->
      """SELECT o_custkey AS c_custkey FROM orders
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |ORDER BY c_custkey""".stripMargin,

    "q_str_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up_name, lower(p_brand) AS lo_brand,
        |  substr(p_name, 1, 8) AS name8,
        |  length(p_name) AS name_len,
        |  trim('  ' || p_name || '  ') AS trimmed,
        |  replace(p_name, ' ', '_') AS name_us,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  split_part(p_type, ' ', 1) AS first_word,
        |  p_brand || '-' || CAST(p_size AS VARCHAR) AS brand_size
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_regexp" ->
      """SELECT p_partkey, p_type,
        |  regexp_extract(p_type, '^(\w+)', 1) AS first_tok,
        |  regexp_matches(p_type, '^PROMO') AS is_promo
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25.0) AS abs_qty,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |  round(sqrt(l_extendedprice), 4) AS sqrt_price,
        |  round(pow(l_extendedprice / 1000.0, 2), 4) AS pow_price,
        |  l_orderkey % 7 AS mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, abs_qty, ceil_price, sqrt_price""".stripMargin,

    "q_case_cast" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000 THEN 'low'
        |       WHEN o_totalprice < 150000 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  CAST(o_orderkey AS VARCHAR) AS okey_str,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS okey_back,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
        |  CAST(o_orderdate AS DATE) AS od
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id, label,
        |  len(embedding) AS dim,
        |  embedding[1] AS first_val,
        |  len(embedding[1:3]) AS first3_len,
        |  embedding[1:3][3] AS first3_last,
        |  CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE) + CAST(embedding[3] AS DOUBLE) AS sum3
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_type, count(*) AS n_rows,
        |  round(avg(k), 4) AS avg_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // json_valid CASE-guard: DuckDB's extraction ERRORS on malformed
    // input where Spark's get_json_object null-rejects
    "q_json_malformed" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(k) AS n_valid, count(*) - count(k) AS n_corrupt,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (
        |  SELECT event_type,
        |    CASE WHEN json_valid(payload)
        |         THEN CAST(json_extract_string(payload, '$.k') AS BIGINT) END AS k
        |  FROM (
        |    SELECT event_type,
        |      CASE WHEN event_id % 97 = 0 THEN substr(props, 1, length(props) - 2)
        |           ELSE props END AS payload
        |    FROM events))
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_explode_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC""".stripMargin,

    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
  )
}
