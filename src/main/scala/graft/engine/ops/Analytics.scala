package graft.engine.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.io.Tables

/** Second-wave analytics operators extending SURVEY.md §2.2: reshaping
  * (pivot/unpivot), deterministic sampling, exact percentiles, per-group
  * top-k, ordered string aggregation, map-typed columns, sequence
  * generators, correlated/IN subqueries (exercising Catalyst
  * decorrelation), and a scalable as-of join.
  *
  * Scale notes:
  *  - the as-of join uses the union + keyed-window formulation: both
  *    sides shuffle ONCE by key and are merged by a single sort within
  *    partitions — no per-row range probe, no broadcast of the big side,
  *    no state blowup on skewed time ranges. This is the shape that
  *    survives 100 TB (a range-condition join would explode);
  *  - the hash sample is a pure narrow filter (no shuffle, fully
  *    pushdown-adjacent) and reproducible across engines/runs, unlike
  *    `TABLESAMPLE`, whose row set depends on partitioning;
  *  - pivot compiles to one hash aggregate with conditional partials —
  *    same cost as a plain groupBy, no extra pass per pivot value.
  *
  * Determinism contract identical to [[Relational]] (total-order sorts,
  * decimal sums via dsum-equivalent casts, ROUND(x,4) on doubles).
  */
object Analytics {
  private type Q = (SparkSession, String) => DataFrame

  // Final .cast("double") on both sides: the exact decimal sum converts to
  // the same IEEE double in either engine, and a DECIMAL output column would
  // hash-mismatch in the driver comparator on dtype alone (pandas Decimal
  // objects vs DuckDB float64). See Relational's determinism scaladoc.
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("decimal(38,6)").cast("double")
  private def dsumSql(e: String): String =
    s"CAST(CAST(sum(CAST($e AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)"

  // ------------------------------------------------------------ reshaping
  private val prios = Seq("1-URGENT" -> "p_urgent", "2-HIGH" -> "p_high",
    "3-MEDIUM" -> "p_medium", "4-NOT SPECIFIED" -> "p_notspec", "5-LOW" -> "p_low")

  private val qPivot: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", prios.map(_._1))
      .agg(dsum(col("o_totalprice")))
      .select(col("o_orderstatus") +: prios.map { case (v, a) => col(s"`$v`").as(a) }: _*)
      .orderBy("o_orderstatus")

  private val qUnpivot: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
              col("o_custkey").cast("double").as("o_custkey_d"))
      .unpivot(Array(col("o_orderkey")),
               Array(col("o_totalprice"), col("o_custkey_d")), "measure", "val")
      .orderBy("o_orderkey", "measure")

  // ------------------------------------------------------------- sampling
  /** Deterministic ~10% Bernoulli sample via multiplicative hashing of the
    * key — exact BIGINT arithmetic on both engines, reproducible at any
    * parallelism (unlike seeded `sample()`, whose outcome depends on
    * partition layout). The standard trick for repeatable pipeline
    * sampling at scale. */
  private val qSampleHash: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(TextPipeline.keyBucket(col("o_orderkey")) < 10)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")

  // ---------------------------------------------------------- percentiles
  /** Exact percentiles (linear interpolation) per group; the exact
    * baseline for approx_percentile-style sketches at scale. All four
    * points come from ONE percentile(array(...)) aggregate, so the
    * per-group value buffer is built once, not four times. */
  private val qAggPercentile: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D))").as("ps"),
        count(lit(1)).as("n_rows"))
      .select(
        col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"),
        round(element_at(col("ps"), 4), 4).as("p95"),
        col("n_rows"))
      .orderBy("l_returnflag")

  /** Quantile banding — the two-pass feature-engineering shape: exact
    * per-group quartiles aggregate once, broadcast back UNDER the fact
    * scan, and every row is banded by its group's boundaries. The fact
    * side never shuffles (group count is dimension-sized); per-band
    * counts reduce partial+final. Boundary determinism: quartiles either
    * land exactly on a data value (integer rank → identical in both
    * engines) or strictly between ¢-granular prices (ulp differences
    * can't flip a comparison), so the band verdict is exact without
    * rounding the boundary. */
  private val qQuantileBand: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val qs = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("ps"))
      .select(col("l_returnflag"),
        element_at(col("ps"), 1).as("p25"),
        element_at(col("ps"), 2).as("p50"),
        element_at(col("ps"), 3).as("p75"))
    li.join(broadcast(qs), Seq("l_returnflag"))
      .withColumn("band",
        when(col("l_extendedprice") <= col("p25"), "q1")
          .when(col("l_extendedprice") <= col("p50"), "q2")
          .when(col("l_extendedprice") <= col("p75"), "q3")
          .otherwise("q4"))
      .groupBy("l_returnflag", "band")
      .agg(count(lit(1)).as("n"),
           round(min("l_extendedprice"), 4).as("min_p"),
           round(max("l_extendedprice"), 4).as("max_p"))
      .orderBy("l_returnflag", "band")
  }

  /** The declared user-extension contract (SURVEY §2.2 UDF/UDAF note),
    * exercised end-to-end: a scalar `udf()` and an `Aggregator[IN,BUF,OUT]`
    * registered via `functions.udaf`, both in EXACT integer arithmetic so
    * the extension path itself is oracle-checkable. Built-ins are still
    * the house rule (a udf is an opaque box to Catalyst: no pushdown
    * through it, no codegen inside it) — this query exists to prove the
    * escape hatch works and costs what it costs, not to recommend it. */
  private val qUserExtensions: Q = (s, d) => {
    val polyUdf = udf((x: Long) => (x * 31L + 7L) % 1000003L)
    // exact sum of squares: BIGINT throughout (quantities are small ints)
    val sumSq = new org.apache.spark.sql.expressions.Aggregator[Long, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: Long): Long = b + a * a
      def merge(b1: Long, b2: Long): Long = b1 + b2
      def finish(r: Long): Long = r
      def bufferEncoder: org.apache.spark.sql.Encoder[Long] =
        org.apache.spark.sql.Encoders.scalaLong
      def outputEncoder: org.apache.spark.sql.Encoder[Long] =
        org.apache.spark.sql.Encoders.scalaLong
    }
    val sumSqUdaf = udaf(sumSq)
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q"),
        polyUdf(col("l_orderkey")).as("okey_hash"))
      .groupBy("l_returnflag")
      .agg(sumSqUdaf(col("q")).as("sum_q_sq"),
           sum("okey_hash").as("sum_hash"),
           count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Robust per-group outlier detection — median/MAD, the length-anomaly
    * gate of a corpus pipeline (mean/stddev outlier tests are themselves
    * dragged by the outliers they hunt; median absolute deviation has a
    * 50% breakdown point). A doc is an outlier in its `lang` stratum
    * when |n_chars − median| > k·MAD (k = 2 in the fixture binding —
    * its n_chars are near-uniform within a stratum, so MAD ≈ range/4
    * and the classic k = 3 selects nothing; on a production corpus with
    * a heavy tail k = 3–3.5 is the usual gate); the reported
    * `mad_score` divides
    * by `greatest(MAD, 0.5)` so a degenerate stratum (MAD = 0: more
    * than half the docs at the exact median) stays finite and any
    * deviation from it still surfaces.
    *
    * Scale shape: two grouped EXACT percentiles keyed by stratum plus
    * two joins against stratum-cardinality tables — both broadcast (a
    * model of one row per lang can never outgrow an executor). Exact
    * `percentile` shuffles each stratum's values to one reducer; at
    * 100 TB swap in `approx_percentile` (the q_agg_approx_percentile
    * tier) and the plan becomes a partial+final sketch merge with the
    * same downstream join shape. Exact kept here so DuckDB
    * `quantile_cont` replays it bit-for-bit (interpolated medians of
    * BIGINT land on .0/.5 — exact in double). */
  /** The per-stratum (median, MAD) robust-location model behind
    * [[qOutlierMad]] and the `s_stream_outlier` serve face — one row per
    * `groupCol` value, so the artifact always broadcasts. */
  def madModel(documents: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val med = documents.groupBy(groupCol)
      .agg(expr(s"percentile($valCol, 0.5D)").as("med"))
    documents.join(broadcast(med), groupCol)
      .withColumn("dev", abs(col(valCol) - col("med")))
      .groupBy(col(groupCol), col("med"))
      .agg(expr("percentile(dev, 0.5D)").as("mad"))
      .select(col(groupCol), col("med"), col("mad"))
  }

  /** The gate of the median/MAD outlier test, split from [[madModel]] so
    * the stream can serve an offline-trained model with the IDENTICAL
    * arithmetic (parity-pinned in StreamingSpec). */
  def madOutliers(documents: DataFrame, model: DataFrame, idCol: String,
                  groupCol: String, valCol: String, k: Double): DataFrame =
    documents.join(broadcast(model), groupCol)
      .withColumn("dev", abs(col(valCol) - col("med")))
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col(idCol), col(groupCol), col(valCol),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
        round(col("dev") / greatest(col("mad"), lit(0.5)), 4).as("mad_score"))
      .orderBy(idCol)

  private val qOutlierMad: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
    madOutliers(docs, madModel(docs, "lang", "n_chars"),
      "doc_id", "lang", "n_chars", k = 2.0)
  }

  /** Non-oracle (sketch is engine-specific): approx_percentile paired
    * with the exact q_agg_percentile baseline — at 100 TB the sketch is
    * what runs; the exact variant defines its error. */
  private val qAggApproxPercentile: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D), 1000)").as("ps"),
           count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        element_at(col("ps"), 1).as("p25"), element_at(col("ps"), 2).as("p50"),
        element_at(col("ps"), 3).as("p75"), col("n_rows"))
      .orderBy("l_returnflag")

  /** Non-oracle (sketch is engine-specific): approx_top_k — the
    * frequent-items sketch (the "what are the heavy hitters" question a
    * 100 TB scan answers without a full group-by+sort). Mergeable
    * partial sketches partial+final aggregate like any agg; at fixture
    * cardinality (50 distinct quantities ≪ maxItemsTracked) the sketch
    * is structurally exact, which is what its spec pins against the
    * exact group-by — the same pairing discipline as the other
    * sketches. */
  private val qAggApproxTopK: Q = (s, d) =>
    Tables.lineitem(s, d)
      .agg(expr("approx_top_k(CAST(l_quantity AS BIGINT), 10, 10000)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("quantity"), col("e.count").as("n"))
      .orderBy(col("n").desc, col("quantity").asc)

  /** Histogram: fixed-width value binning — exact integer arithmetic on
    * both engines (no float rounding in the bin key). */
  private val qHistogram: Q = (s, d) =>
    Tables.orders(s, d)
      .select((floor(col("o_totalprice") / 50000).cast("long") * 50000).as("bin_lo"))
      .groupBy("bin_lo").agg(count(lit(1)).as("n"))
      .orderBy("bin_lo")

  // -------------------------------------------------------- top-k per key
  /** Top-3 orders per customer by totalprice — the grouped top-k shape
    * (rank-filter prunes before any downstream join/sort). */
  private val qTopkPerGroup: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rk")
  }

  // -------------------------------------------------- ordered string agg
  /** Ordered string aggregation: nations per region as a CSV string.
    * collect_list is order-nondeterministic, so sort before joining —
    * same contract as SQL LISTAGG ... WITHIN GROUP (ORDER BY). */
  private val qStrAgg: Q = (s, d) => {
    val r = Tables.region(s, d); val n = Tables.nation(s, d)
    r.join(n, r("r_regionkey") === n("n_regionkey"))
      .groupBy("r_name")
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
           count(lit(1)).as("n_nations"))
      .orderBy("r_name")
  }

  // ------------------------------------------------------------ map funcs
  /** MapType surface: build a map column, extract, enumerate keys/values.
    * Output columns are scalars — key/value enumerations are joined to CSV
    * strings because the driver comparator cannot sort/hash array cells
    * (and map binary layouts differ across engines anyway). */
  private val qMapFuncs: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("m", map(
        lit("status"), col("o_orderstatus"),
        lit("prio"), col("o_orderpriority")))
      .select(
        col("o_orderkey"),
        element_at(col("m"), "status").as("status"),
        element_at(col("m"), "prio").as("prio"),
        array_join(map_keys(col("m")), ",").as("ks"),
        array_join(map_values(col("m")), ",").as("vs"),
        size(col("m")).cast("long").as("m_size"))
      .orderBy("o_orderkey")

  // ----------------------------------------------------------- generators
  /** Row generator beyond explode-of-data: per region emit regionkey+1
    * rows from a sequence — the lateral/table-function shape. */
  private val qGeneratorSeq: Q = (s, d) =>
    Tables.region(s, d)
      .select(col("r_name"), col("r_regionkey"),
              explode(sequence(lit(0L), col("r_regionkey"))).as("i"))
      .orderBy("r_name", "i")

  // ----------------------------------------------------------- subqueries
  /** Correlated scalar subquery (per-customer average) — exercises
    * Catalyst's RewriteCorrelatedScalarSubquery decorrelation. */
  private val qSubqueryCorr: Q = (s, d) =>
    s.sql(
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM parquet.`$d/orders.parquet` o
         |WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
         |                      FROM parquet.`$d/orders.parquet` o2
         |                      WHERE o2.o_custkey = o.o_custkey)
         |ORDER BY o_orderkey""".stripMargin)

  /** IN-subquery (compiles to left-semi) — SQL surface of q_join_semi. */
  private val qSubqueryIn: Q = (s, d) =>
    s.sql(
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM parquet.`$d/orders.parquet`
         |WHERE o_custkey IN (SELECT c_custkey FROM parquet.`$d/customer.parquet`
         |                    WHERE c_mktsegment = 'BUILDING')
         |ORDER BY o_orderkey""".stripMargin)

  // ------------------------------------------------------- time windows
  /** Event-time tumbling windows in BATCH mode — the same `window()`
    * operator the streaming surface uses (Streams.tumblingCounts), here
    * over the full history. Window starts are epoch-aligned, so the
    * oracle reproduces them with integer epoch arithmetic. */
  private val qTimeWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      // min/max are order-free and exact — full-precision doubles like
      // events.value make ANY rounded mean a cross-engine half-boundary
      // coin flip (see q_window_range history)
      .agg(count(lit(1)).as("n"), min("value").as("min_v"), max("value").as("max_v"))
      .select(col("w.start").cast("long").as("win_start_s"), col("event_type"),
              col("n"), col("min_v"), col("max_v"))
      .orderBy("win_start_s", "event_type")

  /** Temporal anomaly detection — the rate-spike monitor: hourly event
    * counts per type, gated by the SAME per-stratum median/MAD location
    * model as [[qOutlierMad]] (stratum = event_type, value = the
    * window's count). A traffic spike or outage hour surfaces as
    * |n − median| > 2·MAD of that type's hourly history — robust to the
    * spikes themselves, which drag a mean/stddev gate. Composes the
    * q_time_window aggregation with [[madModel]]; nothing new touches
    * the event stream beyond the one (type, hour) count.
    *
    * Scale: one keyed count over events (partial+final), percentiles
    * over the (type, hour) table — VASTLY smaller than events (bounded
    * by types × hours) — and a broadcast model join back. */
  private val qAnomalyWindows: Q = (s, d) => {
    val wc = Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("win_start_s"),
        col("event_type"), col("n"))
    madOutliers(wc, madModel(wc, "event_type", "n"),
      "win_start_s", "event_type", "n", k = 2.0)
      .orderBy("event_type", "win_start_s")
  }

  /** RFM customer-value segmentation — the mart staple: per customer,
    * Recency (days since last order against the corpus's latest date),
    * Frequency (order count) and Monetary value (integer cents —
    * per-order floor then integer sum, the dsum discipline, so the
    * aggregate is order-free), each banded 3/2/1 by FIXED business
    * thresholds into a segment label ("R3F2M1"). Fixed bands are the
    * honest mart semantics (thresholds are business decisions);
    * data-driven cuts would reuse the q_ppl_buckets exact-rank
    * histogram discipline — not a global sort either way.
    *
    * Scale: one customer-keyed partial+final aggregate + a 1-row
    * broadcast of the global max date; banding is pure projection. */
  private val qRfm: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val cust = o.groupBy("o_custkey")
      .agg(expr("max(unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 1000000)").as("last_s"),
           count(lit(1)).as("f_orders"),
           sum(expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)")).as("m_cents"))
    val gmax = o.agg(
      expr("max(unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 1000000)").as("gmax_s"))
    cust.crossJoin(broadcast(gmax))
      .withColumn("r_days", expr("(gmax_s - last_s) DIV 86400"))
      .withColumn("r_band",
        when(col("r_days") <= 95, 3L).when(col("r_days") <= 258, 2L).otherwise(1L))
      .withColumn("f_band",
        when(col("f_orders") >= 11, 3L).when(col("f_orders") >= 8, 2L).otherwise(1L))
      .withColumn("m_band",
        when(col("m_cents") >= 281000000L, 3L)
          .when(col("m_cents") >= 205000000L, 2L).otherwise(1L))
      .withColumn("segment",
        concat(lit("R"), col("r_band"), lit("F"), col("f_band"), lit("M"), col("m_band")))
      .select("o_custkey", "r_days", "f_orders", "m_cents", "segment")
      .orderBy("o_custkey")
  }

  /** Market-basket co-occurrence mining — the association-rules
    * support/lift primitive over order baskets: part pairs co-ordered
    * in the same order, kept at minimum support, scored by
    * `lift = P(p1,p2) / (P(p1)·P(p2))` in exact integer micro-units
    * (`(10⁶·c12·N) DIV (c1·c2)` — above 10⁶ genuinely associated,
    * below it anti-associated). The recommendation/substitution signal
    * a catalog team reads.
    *
    * Scale shape: the pair stage is a per-basket self-join BOUNDED by
    * basket size (TPC-H ≤ 7 items/order; a pathological basket takes
    * the familiar cap discipline), then partial+final pair counts;
    * minsup prunes BEFORE the lift join; the item-frequency table is
    * catalog-sized and broadcasts; N is one scalar broadcast back. */
  private val qMarketBasket: Q = (s, d) => {
    // the distinct basket frame feeds FOUR subtrees (both self-join
    // sides, the item counts, the order count); materialize it once
    // (r17) instead of paying the scan+distinct shuffle per reference —
    // ReuseExchange only collapses the two identical join-side
    // exchanges, not the differently-keyed item/order aggregates
    val b = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint()
    val nOrders = b.agg(countDistinct("l_orderkey").as("n_orders"))
    val items = b.groupBy("l_partkey").agg(count(lit(1)).as("c1"))
    val pairs = b.as("x").join(b.as("y"), "l_orderkey")
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("p1"), col("y.l_partkey").as("p2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 3)
    pairs
      .join(broadcast(items.select(col("l_partkey").as("p1"), col("c1").as("n1"))), "p1")
      .join(broadcast(items.select(col("l_partkey").as("p2"), col("c1").as("n2"))), "p2")
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("c12"),
        expr("(1000000 * c12 * n_orders) DIV (n1 * n2)").as("lift_x1e6"))
      .orderBy(col("lift_x1e6").desc, col("p1").asc, col("p2").asc)
  }

  /** Sequential changepoint detection — one-sided CUSUM over the hourly
    * per-type event rate, the monitor that catches a SUSTAINED rate
    * shift the [[qAnomalyWindows]] point gate cannot (each post-shift
    * hour may sit inside 2·MAD while their cumulative drift is
    * unmistakable). The clamped recurrence
    * `S_t = max(0, S_{t−1} + (n_t − mean))` is NOT a window sum — but
    * it has the exact closed form `S_t = P_t − min(0, min_{j≤t} P_j)`
    * over the UNCLAMPED deviation prefix P, so it compiles to two
    * cumulative windows per type (running sum + running min) instead
    * of a row-at-a-time recursion. Mean is the integer floor of the
    * type's total over its hours; everything stays integer, so the
    * oracle replays exactly.
    *
    * Scale: the (type, hour) table is bounded by types × hours — tiny
    * next to events — and the windows partition by type. */
  private val qRateCusum: Q = (s, d) => {
    val wc = Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("win_start_s"),
        col("event_type"), col("n"))
    // deviation scaled by the type's hour count so the mean is EXACT
    // (dev = n·nh − total ⇒ Σdev = 0): an integer-floored mean would
    // otherwise leak a systematic drift of up to 1 event/hour into the
    // statistic — at 677 fixture hours that pseudo-drift (~650) was the
    // same magnitude as a real shift. The readable cusum divides the
    // scale back out (floor), keeping everything integer-exact.
    val mean = wc.groupBy("event_type")
      .agg(sum("n").as("tot"), count(lit(1)).as("nh"))
    val wOrd = Window.partitionBy("event_type").orderBy("win_start_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wc.join(broadcast(mean), "event_type")
      .withColumn("dev", col("n") * col("nh") - col("tot"))
      .withColumn("p", sum("dev").over(wOrd))
      .withColumn("minp", min("p").over(wOrd))
      .withColumn("cusum", expr("(p - least(0L, minp)) DIV nh"))
      .select("event_type", "win_start_s", "n", "cusum")
      .orderBy("event_type", "win_start_s")
  }

  // -------------------------------------------------------- sessionization
  /** Batch sessionization (gaps-and-islands): events more than 30 min
    * apart per user open a new session; session id is the running count
    * of session-opens. One shuffle on user_id; both window passes reuse
    * the same (user_id | ts) sort order, so Spark sorts once. */
  private val qSessionize: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
             col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_s").over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).cast("long").as("start_s"),
           max(col("ts")).cast("long").as("end_s"))
      .orderBy("user_id", "session_id")
  }

  /** Inter-event gap histogram per user stream — the EVIDENCE behind a
    * sessionization threshold: the gap distribution is bimodal
    * (within-session seconds vs between-session hours) and the knee
    * between the modes is where the cutoff belongs; picking 30 min
    * without this plot is folklore. Gaps bucket by power-of-4 seconds
    * (integer `floor(log4)` via length of the base-4 representation —
    * replayed exactly as a WHILE-free integer ladder), counts per
    * bucket; the two-mode shape is visible in the fixture. One lag
    * window per user stream + one dimension-sized aggregate. */
  private val qSessionGaps: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .withColumn("gap_s", col("ts").cast("long") - col("prev_ts").cast("long"))
      .withColumn("bucket",
        when(col("gap_s") <= 0, lit(0L)).otherwise(
          (1 to 10).foldLeft(lit(0L): Column)((acc, i) =>
            when(col("gap_s") + 1 >= math.pow(4, i).toLong, lit(i.toLong))
              .otherwise(acc))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_gaps"),
           min("gap_s").as("min_gap_s"), max("gap_s").as("max_gap_s"))
      .orderBy("bucket")
  }

  /** Concurrency curve over session intervals (the sweep line): at every
    * boundary instant, how many sessions are open — max concurrent
    * users, capacity planning, overlap auditing. Sessions are the
    * [[qSessionize]] 30-min-gap intervals, closed on both ends
    * (`[start, end+1)` as half-open seconds), so single-event sessions
    * still contribute one second of presence.
    *
    * The running sum is a DISTRIBUTED PREFIX SUM, not a global-order
    * window (which plans a single-partition WindowExec — the one-reducer
    * cliff q_ppl_buckets' histogram discipline exists to avoid): the
    * boundary stream buckets by DAY; per-bucket delta totals form a
    * dimension-sized table whose exclusive running sum (the bucket's
    * starting offset) computes on the one tiny table and broadcasts
    * back; each bucket's interior then runs its own partition-local
    * window. At 100 TB the day count — not the boundary count — bounds
    * the only non-partitioned stage. */
  private val qIntervalCoverage: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(s, d)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
             col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_s").over(run))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).cast("long").as("start_s"),
           max(col("ts")).cast("long").as("end_s"))
    // both boundaries emit from ONE pass over the session table (r17):
    // the former two-select union re-executed the full sessionize
    // window chain once per branch; the exploded struct pair is the
    // same rows from a single execution. The bucketed delta table is
    // then materialized once — it feeds BOTH the offset table and the
    // final join, which otherwise re-run the whole chain again.
    val deltas = sess.select(explode(array(
        struct(col("start_s").as("t_s"), lit(1L).as("dd")),
        struct((col("end_s") + 1L).as("t_s"), lit(-1L).as("dd")))).as("b"))
      .select(col("b.t_s").as("t_s"), col("b.dd").as("dd"))
      .groupBy("t_s").agg(sum("dd").as("delta"))
      .withColumn("bkt", expr("t_s DIV 86400"))
      .localCheckpoint()
    val wB = Window
      .partitionBy(graft.engine.functions.GraftFunctions.constWindowKey(col("bkt")))
      .orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = deltas.groupBy("bkt").agg(sum("delta").as("btot"))
      .withColumn("offset", coalesce(sum("btot").over(wB), lit(0L)))
      .select("bkt", "offset")
    val wT = Window.partitionBy("bkt").orderBy("t_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.join(broadcast(offsets), "bkt")
      .select(col("t_s"), col("delta"),
        (col("offset") + sum("delta").over(wT)).as("n_open"))
      .orderBy("t_s")
  }

  /** Ordered conversion funnel over the event stream (view → click →
    * purchase): a user reaches stage k only via an event strictly after
    * their stage-k−1 time — the product-analytics staple. Each stage is
    * one user-keyed min-aggregate plus one user-keyed equi-join of the
    * NEXT stage's events against the previous stage's reach set, so the
    * whole funnel is a chain of partial+final aggs partitioned by
    * user_id: no window over the full event log, no per-user event
    * collection, and at 100 TB each stage's join input shrinks to the
    * funnel's surviving population. Lags are exact integer microseconds
    * (`unix_micros` ≡ DuckDB `epoch_us`), so the oracle hash is
    * arithmetic-identical. */
  private val qFunnel: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tus").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("tus") > col("t1"))
      .groupBy("user_id").agg(min("tus").as("t2"), min("t1").as("t1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("tus") > col("t2"))
      .groupBy("user_id").agg(min("tus").as("t3"), min("t2").as("t2"))
    v.agg(count(lit(1)).as("n_users"), sum(lit(0L)).as("sum_lag_us"))
      .select(lit("1_view").as("stage"), col("n_users"), col("sum_lag_us"))
      .unionByName(c.agg(count(lit(1)).as("n_users"),
          sum(col("t2") - col("t1")).as("sum_lag_us"))
        .select(lit("2_click").as("stage"), col("n_users"), col("sum_lag_us")))
      .unionByName(p.agg(count(lit(1)).as("n_users"),
          sum(col("t3") - col("t2")).as("sum_lag_us"))
        .select(lit("3_purchase").as("stage"), col("n_users"), col("sum_lag_us")))
      .orderBy("stage")
  }

  /** Weekly retention cohorts: users anchored to the week of their FIRST
    * event, counted distinctly in each later week-offset they appear —
    * the (cohort × age) matrix behind every retention curve. Week
    * arithmetic is pure integer `datediff DIV 7` on both engines (no
    * engine-specific week truncation rules to diverge on). Two
    * user-keyed hash aggregates and one user-keyed join; the output is
    * cohorts × offsets — tiny at any corpus size. */
  private val qRetention: Q = (s, d) => {
    // cohort on conversion-grade activity (value > 95): sparse enough
    // that first occurrences SPREAD across weeks — all-event anchoring
    // would collapse the fixture to one cohort and leave the cohort
    // grouping untested
    val ev = Tables.events(s, d)
      .filter(col("value") > 95)
      .select(col("user_id"), col("ts").cast("date").as("eday"))
    val firstDay = ev.groupBy("user_id").agg(min("eday").as("cohort_day"))
    ev.join(firstDay, "user_id")
      .select(col("user_id"),
        expr("CAST(datediff(cohort_day, DATE '2024-01-01') DIV 7 AS BIGINT)")
          .as("cohort_week"),
        expr("CAST(datediff(eday, cohort_day) DIV 7 AS BIGINT)").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  // ------------------------------------------- distribution window funcs
  private val qWindowDist: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("value").asc, col("event_id").asc)
    Tables.events(s, d).select(
      col("user_id"), col("event_id"), col("value"),
      round(percent_rank().over(w), 4).as("pr"),
      round(cume_dist().over(w), 4).as("cd"),
      nth_value(col("value"), 2).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("second_lowest"))
      .orderBy("user_id", "event_id")
  }

  /** RANGE frame: peers defined by value distance, not row position.
    * Partitioned by customer, NOT by the 3-value status column: Spark
    * recomputes bounded-start frame aggregates per row (O(rows × frame)),
    * so a coarse partition key turns a RANGE frame quadratic — with
    * per-customer partitions both rows-per-partition and frame size stay
    * small and constant as data grows. */
  private val qWindowRange: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").asc)
      .rangeBetween(-50000L, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      count(lit(1)).over(w).as("n_within_50k"),
      // exact decimal frame-sum: any float avg/round over a frame
      // eventually lands on a round-half boundary where engines disagree;
      // final double cast matches the oracle (see dsum note above)
      sum(col("o_totalprice").cast("decimal(18,6)")).over(w)
        .cast("decimal(38,6)").cast("double").as("sum_within_50k"))
      .orderBy("o_orderkey")
  }

  /** max_by/min_by (argmax aggregation); (o_custkey, o_totalprice) is
    * verified tie-free in the fixtures, so the arg is deterministic. */
  private val qAggMinmaxBy: Q = (s, d) =>
    Tables.orders(s, d).groupBy("o_custkey")
      .agg(max_by(col("o_orderkey"), col("o_totalprice")).as("best_order"),
           min_by(col("o_orderkey"), col("o_totalprice")).as("worst_order"),
           max("o_totalprice").as("best_price"),
           count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  // ------------------------------------------------------- null handling
  /** Null-handling scalar surface: coalesce / nullif / ifnull / greatest /
    * least with null propagation over synthesized nulls. */
  private val qNullFuncs: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      expr("nullif(o_orderstatus, 'P')").as("st_np"),
      coalesce(expr("nullif(o_orderstatus, 'P')"), lit("PENDING")).as("st_filled"),
      expr("ifnull(nullif(o_orderpriority, '5-LOW'), 'LOW')").as("prio_filled"),
      greatest(col("o_totalprice"), lit(100000.0)).as("hi"),
      least(col("o_totalprice"), lit(100000.0)).as("lo"),
      isnull(expr("nullif(o_orderstatus, 'P')")).as("is_p"))
      .orderBy("o_orderkey")

  // ----------------------------------------------------------- lateral join
  /** Correlated LATERAL subquery (top-1 order per customer) — the
    * "dependent join" surface; Catalyst decorrelates the limit-1 lateral
    * into a window/aggregate, no per-row re-execution. */
  private val qLateralJoin: Q = (s, d) =>
    s.sql(
      s"""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
         |FROM parquet.`$d/customer.parquet` c,
         |LATERAL (SELECT o_orderkey, o_totalprice FROM parquet.`$d/orders.parquet` o
         |         WHERE o.o_custkey = c.c_custkey
         |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
         |ORDER BY c_custkey""".stripMargin)

  // ----------------------------------------------------- statistical aggs
  /** Statistical aggregates. corr stays rounded (its sqrt denominator
    * makes an exact round-half-boundary landing impossible), but the
    * covariances are emitted as their exact decimal co-moment ingredients
    * (sum x, sum y, sum x*y + n): covariance over money values divides by
    * n = 2^a·5^b·…, which can terminate exactly on a 4-dp half boundary
    * where Spark (shortest-repr HALF_UP) and DuckDB (binary) disagree.
    * covar_samp/covar_pop themselves are pinned against the co-moment
    * formula in AnalyticsSpec. */
  /** Correlation plus the exact first moments it is built from. The
    * moments are integer-scaled BIGINT sums, not decimal sums: quantity
    * is integral and price has exactly 2 decimals, so ×100 scaling is
    * exact, stays far under 2⁶³, and keeps the aggregate in codegen'd
    * long arithmetic — the decimal-object path cost ~0.5 s/600 k rows
    * here (measured), and decimal exactness is already exercised where
    * it is genuinely needed (dsum in the price rollups). */
  private val qCorrCovar: Q = (s, d) => {
    val p100 = round(col("l_extendedprice") * 100).cast("long")
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qp"),
           sum(col("l_quantity").cast("long")).as("sum_q"),
           sum(p100).as("sum_p_x100"),
           sum(col("l_quantity").cast("long") * p100).as("sum_qp_x100"),
           count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  private val qBoolAgg: Q = (s, d) =>
    Tables.orders(s, d).groupBy("o_orderpriority")
      .agg(bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
           bool_or(col("o_orderstatus") === "P").as("any_pending"),
           count(lit(1)).as("n_rows"))
      .orderBy("o_orderpriority")

  // -------------------------------------------------------- union by name
  /** Schema-evolution union: right side has reordered columns and no
    * `src`; unionByName aligns by name and null-fills the gap. */
  private val qUnionByName: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_totalprice"), lit("hi").as("src"))
    val b = o.filter(col("o_totalprice") < 1000)
      .select(col("o_totalprice"), col("o_orderkey")) // reordered, no src
    a.unionByName(b, allowMissingColumns = true)
      .orderBy("o_orderkey")
  }

  // ------------------------------------------------------------- gap fill
  /** Time-series gap fill: per-user daily event spine (min..max day),
    * missing days zero-filled, the daily value total forward-filled with
    * last(ignoreNulls). Spine generation is `sequence`+`explode` per key
    * (executor-side, no driver calendar), fill is one keyed window.
    * The filled measure is an exact decimal day-sum (plus the count, from
    * which a consumer derives the mean) — a round(avg) over full-precision
    * doubles is a cross-engine round-half-boundary coin flip. */
  private val qGapFill: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
    // spine bounds come from the daily aggregate (~|users × days| rows),
    // not a second scan of the raw events table
    val spine = daily
      .groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left_outer")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("sum_v"), ignoreNulls = true).over(w).as("sum_v_filled"))
      .orderBy("user_id", "day")
  }

  // ------------------------------------------------------------ as-of join
  /** As-of join: for each purchase event, the value of the same user's
    * latest `view` at or before it — the feature-attachment shape
    * (state known as of decision time).
    *
    * Implementation is the union + keyed-window formulation: tag both
    * sides, union, and take last non-null view value over (key, time)
    * order. One shuffle on the key, one in-partition sort — the 100 TB
    * shape (see object scaladoc). Views sort before purchases at equal
    * timestamps (side 0 < 1), giving inclusive <= semantics; (user_id,
    * ts) is unique in the fixture so the match is deterministic.
    *
    * Anchored events←events since r9: the original orders←events anchor
    * is time-disjoint in the fixture (orders end 2001, events start
    * 2024), so every backward probe was null — an oracle that passed
    * without ever exercising a match. Here both the matched and the
    * no-prior-view branch carry real rows (spec-asserted). */
  private val qAsofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val views = ev.filter(col("event_type") === "view").select(
      col("user_id").as("u"), col("ts").as("t"), lit(0).as("side"),
      lit(null).cast("long").as("purchase_id"), col("value"))
    val buys = ev.filter(col("event_type") === "purchase").select(
      col("user_id").as("u"), col("ts").as("t"), lit(1).as("side"),
      col("event_id").as("purchase_id"), lit(null).cast("double").as("value"))
    val w = Window.partitionBy("u").orderBy(col("t").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionAll(buys)
      .withColumn("ev_value", last("value", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("purchase_id"), col("u").as("user_id"), col("ev_value"))
      .orderBy("purchase_id")
  }

  /** FORWARD as-of join — "the next event at-or-after": the label-join
    * shape of a training pipeline (features at time t join the first
    * OUTCOME observed ≥ t; a backward as-of would leak the past into
    * the label). Same union + keyed-window formulation as [[qAsofJoin]]
    * with the scan direction reversed: descending event-time order
    * makes the running `last(value)` carry the NEAREST later event, and
    * the side tiebreak (event before the probe at equal t) keeps the
    * match inclusive. One shuffle per side, no range probe — the shape
    * that survives 100 TB unchanged. Anchored purchases←signups (r9):
    * purchases both before and after a user's signups exist, so the
    * matched AND exhausted-future branches carry real rows. */
  private val qAsofJoinForward: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val signups = ev.filter(col("event_type") === "signup").select(
      col("user_id").as("u"), col("ts").as("t"), lit(0).as("side"),
      lit(null).cast("long").as("purchase_id"), col("value"))
    val buys = ev.filter(col("event_type") === "purchase").select(
      col("user_id").as("u"), col("ts").as("t"), lit(1).as("side"),
      col("event_id").as("purchase_id"), lit(null).cast("double").as("value"))
    val w = Window.partitionBy("u").orderBy(col("t").desc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    signups.unionAll(buys)
      .withColumn("ev_value", last("value", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("purchase_id"), col("u").as("user_id"), col("ev_value"))
      .orderBy("purchase_id")
  }

  /** NEAREST as-of join — completes the as-of family (backward =
    * latest-before, forward = first-after, nearest = whichever is
    * closer in time; ties go backward). The sensor-alignment shape:
    * attach to each order the reading closest to its date when
    * staleness is symmetric. One union pass, one shuffle on the key,
    * and TWO in-partition sorts over the same Exchange (Catalyst reuses
    * the shuffle for both window orderings): the ascending window
    * carries the latest event at-or-before as a (t, value) struct, the
    * descending one the first at-or-after, and a row-local comparison
    * picks the closer. `least()` skips nulls in both engines, so the
    * one-sided cases fall out of the same expression. No range probe,
    * no per-row subquery — the 100 TB shape of its siblings. */
  private val qAsofNearest: Q = (s, d) => {
    // events ← events (purchases against same-user clicks): both
    // directions carry real matches in the fixture, unlike the
    // orders↔events anchor whose date ranges are disjoint (every
    // backward probe there is null — one branch never exercised)
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click").select(
      col("user_id").as("u"), col("ts").as("t"), lit(0).as("side"),
      lit(null).cast("long").as("purchase_id"), col("value"))
    val buys = ev.filter(col("event_type") === "purchase").select(
      col("user_id").as("u"), col("ts").as("t"), lit(1).as("side"),
      col("event_id").as("purchase_id"), lit(null).cast("double").as("value"))
    val wb = Window.partitionBy("u").orderBy(col("t").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("u").orderBy(col("t").desc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val evrec = when(col("side") === 0, struct(col("t").as("et"), col("value").as("v")))
    clicks.unionAll(buys)
      .withColumn("back", last(evrec, ignoreNulls = true).over(wb))
      .withColumn("fwd", last(evrec, ignoreNulls = true).over(wf))
      .filter(col("side") === 1)
      .withColumn("bd", unix_micros(col("t")) - unix_micros(col("back.et")))
      .withColumn("fd", unix_micros(col("fwd.et")) - unix_micros(col("t")))
      .withColumn("ev_value",
        when(col("bd").isNull, col("fwd.v"))
          .when(col("fd").isNull, col("back.v"))
          .when(col("fd") < col("bd"), col("fwd.v"))
          .otherwise(col("back.v")))
      .withColumn("diff_us", least(col("bd"), col("fd")))
      .select(col("purchase_id"), col("u").as("user_id"),
              col("ev_value"), col("diff_us"))
      .orderBy("purchase_id")
  }

  /** TOLERANCE as-of join — backward as-of with a max-staleness bound,
    * the variant every feature store ships (pandas `merge_asof
    * tolerance=`, QuestDB/kdb equivalents): attach to each purchase the
    * user's latest prior `view`, but only admit it as a feature when it
    * is at most `TolUs` old — a reading staler than the bound is worse
    * than no reading (the model must learn the no-signal case, not
    * stale-signal leakage). Emits all three truths: the value (nulled
    * when stale), the raw staleness, and the freshness verdict, so a
    * pipeline can route fresh/stale/missing differently. Joins events
    * to events (purchases ← views), where the fixture has real matches
    * on every branch. Same union + keyed-window shape as its siblings:
    * one shuffle, no range probe. */
  private val TolUs = 6L * 3600 * 1000000 // 6 hours
  private val qAsofTolerance: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val views = ev.filter(col("event_type") === "view").select(
      col("user_id").as("u"), col("ts").as("t"), lit(0).as("side"),
      lit(null).cast("long").as("purchase_id"), col("value"))
    val buys = ev.filter(col("event_type") === "purchase").select(
      col("user_id").as("u"), col("ts").as("t"), lit(1).as("side"),
      col("event_id").as("purchase_id"), lit(null).cast("double").as("value"))
    val w = Window.partitionBy("u").orderBy(col("t").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viewrec = when(col("side") === 0, struct(col("t").as("vt"), col("value").as("v")))
    views.unionAll(buys)
      .withColumn("lastv", last(viewrec, ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("stale_us", unix_micros(col("t")) - unix_micros(col("lastv.vt")))
      .withColumn("fresh",
        when(col("stale_us").isNull, lit(null).cast("boolean"))
          .otherwise(col("stale_us") <= TolUs))
      .withColumn("ev_value", when(col("fresh"), col("lastv.v")))
      .select(col("purchase_id"), col("u").as("user_id"),
              col("ev_value"), col("stale_us"), col("fresh"))
      .orderBy("purchase_id")
  }

  // ---------------------------------------------------------- skew salting
  /** Salted join — the skew-mitigation pattern for joining a large fact
    * to a hot-keyed table when BOTH sides are too big to broadcast: the
    * dim side is replicated NSalt× (one copy per salt), the fact side
    * derives a deterministic salt from row identity, and the join key
    * becomes (key, salt) so one hot key fans out over NSalt shuffle
    * partitions instead of hammering one reducer. The `merge` hint forbids
    * the broadcast Catalyst would otherwise pick for this fixture-sized
    * dim, so the exercised path IS the two-big-tables shuffle path (plan
    * pinned in PlanShapeSpec). Salting never changes the result — each
    * fact row still meets exactly one dim copy — so the oracle is the
    * plain join. AQE's skewedJoin handles moderate skew adaptively; the
    * explicit salt is for the pathological hot key it cannot split. */
  /** Join-key SKEW AUDIT — the measurement you run BEFORE deciding to
    * salt (`q_skew_join`) or trust AQE: per candidate join key, the
    * top-10 heavy hitters with their row share in basis points, plus
    * the skew factor ⌊100·max/avg⌋ (how many average keys' worth of
    * rows the hottest key carries — >3-4× is where one reducer starts
    * pacing the stage; pathological hot keys need the explicit salt
    * AQE cannot split). One hash count per key column + a top-k —
    * the audit costs one scan however big the fact table. */
  private val qSkewAudit: Q = (s, d) => {
    def audit(df: DataFrame, keyCol: String): DataFrame = {
      val counts = df.groupBy(col(keyCol).cast("long").as("key"))
        .agg(count(lit(1)).as("n"))
      val stats = counts.agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"),
        max("n").as("max_n"))
      // TakeOrdered top-10 FIRST (never a full sort of the key table),
      // then the rank window runs over 10 rows (constWindowKey keeps
      // the bounded single-partition move from folding into a warning)
      val top = counts.orderBy(col("n").desc, col("key").asc).limit(10)
      top.crossJoin(broadcast(stats))
        .withColumn("share_bp", floor(lit(10000.0) * col("n") / col("n_rows")).cast("long"))
        .withColumn("skew_x100",
          floor(lit(100.0) * col("max_n") * col("n_keys") / col("n_rows")).cast("long"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(graft.engine.functions.GraftFunctions.constWindowKey(col("key")))
            .orderBy(col("n").desc, col("key").asc)).cast("long"))
        .select(lit(keyCol).as("key_col"), col("rk"), col("key"), col("n"),
          col("share_bp"), col("n_keys"), col("skew_x100"))
    }
    audit(Tables.lineitem(s, d), "l_suppkey")
      .unionAll(audit(Tables.events(s, d), "user_id"))
      .orderBy("key_col", "rk")
  }

  private val NSalt = 16
  private val qSkewJoin: Q = (s, d) => {
    val fact = Tables.lineitem(s, d).select(
      col("l_suppkey"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"),
      pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(NSalt)).as("salt"))
    val dimSalted = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("s_nationkey"))
      .withColumn("salt", explode(array((0 until NSalt).map(i => lit(i.toLong)): _*)))
    fact.hint("merge")
      .join(dimSalted, col("l_suppkey") === col("s_suppkey") && fact("salt") === dimSalted("salt"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"), dsum(col("net")).as("revenue"))
      .orderBy("s_nationkey")
  }

  // ------------------------------------------------------- misc aggregates
  /** Conditional / distinct / median aggregate surface: count_if, exact
    * interpolated median, sum(DISTINCT), per group. median interpolates
    * two 2-decimal money values (≤ 3 decimals) so round(,4) is exact.
    *
    * The distinct aggregate is computed in its OWN two-stage pass and
    * joined back on the (3-row) group key: combining sum(DISTINCT) with
    * the other aggregates makes Spark plan a FOUR-level
    * ObjectHashAggregate cascade that drags the median's whole-group
    * value buffer (a TypedImperativeAggregate) through every level with
    * a serialize/deserialize at each hop — measured 4.3 s combined vs
    * 3.5 s split (DevTime steady, sf0.1; the residual is the median
    * buffer itself). At 100 TB the same holds: the distinct pass is a
    * codegen'd hash agg on (group, value), the median pass buffers each
    * group once, and the join is group-cardinality-sized. */
  private val qAggMisc: Q = (s, d) => {
    // ONE groupBy carrying the distinct aggregate alongside the plain
    // ones (r17): Spark plans mixed distinct/non-distinct via a single
    // scan + Expand, which replaces the r16 shape's second full scan,
    // second shuffle and (l_linestatus)-keyed join — 2 exchanges + 1
    // join fewer, values identical (the oracle hash pins them).
    Tables.lineitem(s, d).groupBy("l_linestatus")
      .agg(count_if(col("l_quantity") > 25).as("n_big"),
           round(median(col("l_extendedprice")), 4).as("med_price"),
           sum_distinct(col("l_quantity").cast("long")).as("sum_dq"),
           count(lit(1)).as("n_rows"))
      .select(col("l_linestatus"), col("n_big"), col("med_price"),
        col("sum_dq"), col("n_rows"))
      .orderBy("l_linestatus")
  }

  /** Bitwise aggregates (bit_and / bit_or / bit_xor) per group — exact
    * integer semantics, identical across engines. */
  private val qBitAgg: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_linestatus")
      .agg(bit_and(col("l_orderkey")).as("k_and"),
           bit_or(col("l_orderkey")).as("k_or"),
           bit_xor(col("l_orderkey")).as("k_xor"),
           count(lit(1)).as("n"))
      .orderBy("l_linestatus")

  /** Exact distinct-count via mergeable roaring-style bitmaps — the
    * 100 TB distinct pattern: per-(group, 32k-bucket) bitmaps build with
    * partial aggregation on every executor, OR-merge in one shuffle, and
    * the final count is a cheap sum of per-bucket popcounts. Unlike
    * countDistinct's expand-based plan there is no per-value row
    * explosion past the first partial agg, and unlike HLL the result is
    * exact (oracled against DuckDB's count(DISTINCT)). */
  private val qBitmapDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"), bitmap_bucket_number(col("user_id")).as("bkt"))
      .agg(bitmap_count(bitmap_construct_agg(bitmap_bit_position(col("user_id")))).as("cnt"))
      .groupBy("event_type")
      .agg(sum("cnt").as("n_users"))
      .orderBy("event_type")

  /** HLL sketch build → union → estimate (the SURVEY §7.3 "HLL merge
    * across pre-aggregated sketches" item): per-(type, day) sketches are
    * the stored partial — re-aggregating to per-type needs only a
    * sketch union, never a re-scan of raw data. Non-oracle (DataSketches
    * binary images are engine-specific); AnalyticsSpec pins estimates to
    * within 5% of exact and the union-vs-flat-sketch identity. */
  private val qAggHllSketch: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .orderBy("event_type")

  val queries: Map[String, Q] = Map(
    "q_bitmap_distinct" -> qBitmapDistinct, "q_agg_hll_sketch" -> qAggHllSketch,
    "q_bit_agg" -> qBitAgg,
    "q_skew_join" -> qSkewJoin, "q_skew_audit" -> qSkewAudit,
    "q_agg_misc" -> qAggMisc,
    "q_pivot" -> qPivot, "q_unpivot" -> qUnpivot,
    "q_sample_hash" -> qSampleHash, "q_agg_percentile" -> qAggPercentile,
    "q_outlier_mad" -> qOutlierMad,
    "q_topk_per_group" -> qTopkPerGroup, "q_str_agg" -> qStrAgg,
    "q_map_funcs" -> qMapFuncs, "q_generator_seq" -> qGeneratorSeq,
    "q_subquery_corr" -> qSubqueryCorr, "q_subquery_in" -> qSubqueryIn,
    "q_null_funcs" -> qNullFuncs, "q_asof_join" -> qAsofJoin,
    "q_asof_join_forward" -> qAsofJoinForward,
    "q_asof_join_nearest" -> qAsofNearest,
    "q_asof_join_tolerance" -> qAsofTolerance,
    "q_sessionize" -> qSessionize, "q_window_dist" -> qWindowDist,
    "q_interval_coverage" -> qIntervalCoverage,
    "q_session_gaps" -> qSessionGaps,
    "q_window_range" -> qWindowRange, "q_agg_minmax_by" -> qAggMinmaxBy,
    "q_lateral_join" -> qLateralJoin, "q_corr_covar" -> qCorrCovar,
    "q_bool_agg" -> qBoolAgg, "q_union_by_name" -> qUnionByName,
    "q_gap_fill" -> qGapFill, "q_agg_approx_percentile" -> qAggApproxPercentile,
    "q_agg_approx_topk" -> qAggApproxTopK,
    "q_histogram" -> qHistogram, "q_time_window" -> qTimeWindow,
    "q_anomaly_windows" -> qAnomalyWindows,
    "q_rate_cusum" -> qRateCusum,
    "q_market_basket" -> qMarketBasket,
    "q_rfm" -> qRfm,
    "q_quantile_band" -> qQuantileBand,
    "q_user_extensions" -> qUserExtensions,
    "q_funnel" -> qFunnel, "q_retention" -> qRetention,
  )

  private def pivotCaseSql: String = prios.map { case (v, a) =>
    s"CAST(CAST(sum(CASE WHEN o_orderpriority = '$v' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS DOUBLE) AS $a"
  }.mkString(",\n  ")

  val oracle: Map[String, String] = Map(
    // l_quantity is integral-valued, so DuckDB's rounding double→BIGINT
    // cast and Spark's truncating one agree
    "q_user_extensions" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q_sq,
        |  CAST(sum((l_orderkey * 31 + 7) % 1000003) AS BIGINT) AS sum_hash,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_quantile_band" ->
      """WITH qs AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.25) AS p25,
        |    quantile_cont(l_extendedprice, 0.50) AS p50,
        |    quantile_cont(l_extendedprice, 0.75) AS p75
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  CASE WHEN l_extendedprice <= p25 THEN 'q1'
        |       WHEN l_extendedprice <= p50 THEN 'q2'
        |       WHEN l_extendedprice <= p75 THEN 'q3'
        |       ELSE 'q4' END AS band,
        |  count(*) AS n,
        |  round(min(l_extendedprice), 4) AS min_p,
        |  round(max(l_extendedprice), 4) AS max_p
        |FROM lineitem l JOIN qs ON l.l_returnflag = qs.l_returnflag
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_bit_agg" ->
      """SELECT l_linestatus,
        |  bit_and(l_orderkey) AS k_and, bit_or(l_orderkey) AS k_or,
        |  bit_xor(l_orderkey) AS k_xor, count(*) AS n
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    // the bitmap rollup is exact, so the oracle is a plain distinct count
    "q_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // salting is result-invariant: the oracle is the unsalted join
    "q_skew_join" ->
      s"""SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS n_items,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    // per key-column: top-10 heavy hitters with basis-point share and
    // the floored max/avg skew factor — all-integer except two floored
    // single IEEE divisions
    "q_skew_audit" ->
      """WITH audit AS (
        |  SELECT 'l_suppkey' AS key_col, CAST(l_suppkey AS BIGINT) AS key,
        |    CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY l_suppkey
        |  UNION ALL
        |  SELECT 'user_id', CAST(user_id AS BIGINT), CAST(count(*) AS BIGINT)
        |  FROM events GROUP BY user_id),
        |stats AS (
        |  SELECT key_col, CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(n) AS BIGINT) AS n_rows, CAST(max(n) AS BIGINT) AS max_n
        |  FROM audit GROUP BY key_col),
        |ranked AS (
        |  SELECT a.key_col, a.key, a.n,
        |    CAST(row_number() OVER (PARTITION BY a.key_col
        |      ORDER BY a.n DESC, a.key ASC) AS BIGINT) AS rk,
        |    s.n_keys, s.n_rows, s.max_n
        |  FROM audit a JOIN stats s ON a.key_col = s.key_col)
        |SELECT key_col, rk, key, n,
        |  CAST(floor(10000.0 * n / n_rows) AS BIGINT) AS share_bp,
        |  n_keys,
        |  CAST(floor(100.0 * max_n * n_keys / n_rows) AS BIGINT) AS skew_x100
        |FROM ranked WHERE rk <= 10 ORDER BY key_col, rk""".stripMargin,

    "q_agg_misc" ->
      """SELECT l_linestatus,
        |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
        |  round(median(l_extendedprice), 4) AS med_price,
        |  CAST(sum(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_dq,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_pivot" ->
      s"""SELECT o_orderstatus,
         |  $pivotCaseSql
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_unpivot" ->
      """SELECT o_orderkey, 'o_totalprice' AS measure, o_totalprice AS val FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'o_custkey_d' AS measure, CAST(o_custkey AS DOUBLE) AS val FROM orders
        |ORDER BY o_orderkey, measure""".stripMargin,

    "q_sample_hash" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE ${TextPipeline.keyBucketSql("o_orderkey")} < 10
        |ORDER BY o_orderkey""".stripMargin,

    // median/MAD replay: quantile_cont ≡ Spark's exact `percentile`
    // (both linear-interpolate), deviations of BIGINT from a .0/.5
    // median are exact doubles, so filter and score cannot diverge
    "q_outlier_mad" ->
      """WITH med AS (
        |  SELECT lang, quantile_cont(n_chars, 0.5) AS med
        |  FROM documents GROUP BY lang),
        |dev AS (
        |  SELECT d.doc_id, d.lang, d.n_chars, m.med,
        |         abs(d.n_chars - m.med) AS dev
        |  FROM documents d JOIN med m USING (lang)),
        |mad AS (
        |  SELECT lang, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY lang)
        |SELECT v.doc_id, v.lang, v.n_chars,
        |  round(v.med, 4) AS med, round(a.mad, 4) AS mad,
        |  round(v.dev / greatest(a.mad, 0.5), 4) AS mad_score
        |FROM dev v JOIN mad a USING (lang)
        |WHERE v.dev > 2 * a.mad
        |ORDER BY v.doc_id""".stripMargin,

    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q_str_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n_nations
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_map_funcs" ->
      """SELECT o_orderkey,
        |  o_orderstatus AS status,
        |  o_orderpriority AS prio,
        |  'status,prio' AS ks,
        |  o_orderstatus || ',' || o_orderpriority AS vs,
        |  CAST(2 AS BIGINT) AS m_size
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_generator_seq" ->
      """SELECT r_name, r_regionkey, unnest(generate_series(0, r_regionkey)) AS i
        |FROM region ORDER BY r_name, i""".stripMargin,

    "q_subquery_corr" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_subquery_in" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    "q_null_funcs" ->
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'P') AS st_np,
        |  coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS st_filled,
        |  ifnull(nullif(o_orderpriority, '5-LOW'), 'LOW') AS prio_filled,
        |  greatest(o_totalprice, 100000.0) AS hi,
        |  least(o_totalprice, 100000.0) AS lo,
        |  nullif(o_orderstatus, 'P') IS NULL AS is_p
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id, v.value AS ev_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY purchase_id""".stripMargin,

    // the >= direction: DuckDB ASOF picks the NEAREST event at-or-after
    "q_asof_join_forward" ->
      """SELECT p.event_id AS purchase_id, p.user_id, s.value AS ev_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND s.ts >= p.ts
        |ORDER BY purchase_id""".stripMargin,

    // staleness bound: ASOF backward + CASE on the 6 h tolerance; the
    // fixture populates all three branches (fresh / stale / no view)
    "q_asof_join_tolerance" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= 21600000000 THEN v.value END AS ev_value,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS stale_us,
        |  CASE WHEN v.ts IS NULL THEN NULL
        |       ELSE epoch_us(p.ts) - epoch_us(v.ts) <= 21600000000 END AS fresh
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY purchase_id""".stripMargin,

    // nearest = the closer of the two ASOF directions; least() skips
    // NULLs in both engines, covering the one-sided cases
    "q_asof_join_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT p.event_id, p.user_id, p.ts AS pt, c.ts AS bt, c.value AS bv
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts),
        |f AS (
        |  SELECT p.event_id, c.ts AS ft, c.value AS fv
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND c.ts >= p.ts)
        |SELECT b.event_id AS purchase_id, b.user_id,
        |  CASE WHEN bt IS NULL THEN fv
        |       WHEN ft IS NULL THEN bv
        |       WHEN epoch_us(ft) - epoch_us(pt)
        |            < epoch_us(pt) - epoch_us(bt) THEN fv
        |       ELSE bv END AS ev_value,
        |  least(epoch_us(pt) - epoch_us(bt),
        |        epoch_us(ft) - epoch_us(pt)) AS diff_us
        |FROM b JOIN f ON b.event_id = f.event_id
        |ORDER BY purchase_id""".stripMargin,

    "q_sessionize" ->
      """SELECT user_id, session_id, count(*) AS n_events,
        |  CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) AS end_s
        |FROM (
        |  SELECT user_id, ts,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      CASE WHEN prev_ts IS NULL
        |             OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |           THEN 1 ELSE 0 END AS new_s
        |    FROM (SELECT user_id, event_id, ts,
        |            lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |          FROM events)))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    // power-of-4 gap ladder replayed as the same integer CASE chain
    "q_session_gaps" ->
      """WITH g AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) AS gap_s
        |  FROM (SELECT ts, lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |        FROM events)
        |  WHERE prev_ts IS NOT NULL),
        |b AS (
        |  SELECT gap_s,
        |    CASE WHEN gap_s <= 0 THEN 0
        |         WHEN gap_s + 1 >= 1048576 THEN 10
        |         WHEN gap_s + 1 >= 262144 THEN 9
        |         WHEN gap_s + 1 >= 65536 THEN 8
        |         WHEN gap_s + 1 >= 16384 THEN 7
        |         WHEN gap_s + 1 >= 4096 THEN 6
        |         WHEN gap_s + 1 >= 1024 THEN 5
        |         WHEN gap_s + 1 >= 256 THEN 4
        |         WHEN gap_s + 1 >= 64 THEN 3
        |         WHEN gap_s + 1 >= 16 THEN 2
        |         WHEN gap_s + 1 >= 4 THEN 1
        |         ELSE 0 END AS bucket
        |  FROM g)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_gaps,
        |  min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // the sweep line replayed flat: the distributed prefix sum's bucket
    // decomposition is arithmetic-neutral, so one global running sum is
    // the exact oracle
    "q_interval_coverage" ->
      """WITH sess AS (
        |  SELECT user_id, session_id,
        |    CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
        |    CAST(floor(epoch(max(ts))) AS BIGINT) AS end_s
        |  FROM (
        |    SELECT user_id, ts,
        |      CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |    FROM (
        |      SELECT user_id, event_id, ts,
        |        CASE WHEN prev_ts IS NULL
        |               OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM (SELECT user_id, event_id, ts,
        |              lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |            FROM events)))
        |  GROUP BY user_id, session_id),
        |sdeltas AS (
        |  SELECT t_s, CAST(sum(dd) AS BIGINT) AS delta FROM (
        |    SELECT start_s AS t_s, 1 AS dd FROM sess
        |    UNION ALL SELECT end_s + 1, -1 FROM sess)
        |  GROUP BY t_s)
        |SELECT t_s, delta,
        |  CAST(sum(delta) OVER (ORDER BY t_s ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_open
        |FROM sdeltas ORDER BY t_s""".stripMargin,

    "q_window_dist" ->
      """SELECT user_id, event_id, value,
        |  round(percent_rank() OVER w, 4) AS pr,
        |  round(cume_dist() OVER w, 4) AS cd,
        |  nth_value(value, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_lowest
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_window_range" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  count(*) OVER w AS n_within_50k,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DECIMAL(38,6)) AS DOUBLE) AS sum_within_50k
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC
        |             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q_agg_minmax_by" ->
      """SELECT o_custkey,
        |  arg_max(o_orderkey, o_totalprice) AS best_order,
        |  arg_min(o_orderkey, o_totalprice) AS worst_order,
        |  max(o_totalprice) AS best_price,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000 AS bin_lo, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bin_lo""".stripMargin,

    "q_time_window" ->
      """SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS win_start_s,
        |  event_type, count(*) AS n, min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY 1, 2 ORDER BY win_start_s, event_type""".stripMargin,

    // hourly counts through the same quantile_cont median/MAD replay as
    // q_outlier_mad; counts are BIGINT so the gate cannot diverge
    // same epoch-second recency, per-order floored cents, fixed bands
    "q_rfm" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |    CAST(max(floor(epoch(o_orderdate))) AS BIGINT) AS last_s,
        |    count(*) AS f_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS m_cents
        |  FROM orders GROUP BY 1),
        |g AS (SELECT CAST(max(floor(epoch(o_orderdate))) AS BIGINT) AS gmax_s FROM orders)
        |SELECT o_custkey, r_days, f_orders, m_cents,
        |  'R' || r_band || 'F' || f_band || 'M' || m_band AS segment
        |FROM (
        |  SELECT o_custkey, (gmax_s - last_s) // 86400 AS r_days, f_orders, m_cents,
        |    CASE WHEN (gmax_s - last_s) // 86400 <= 95 THEN 3
        |         WHEN (gmax_s - last_s) // 86400 <= 258 THEN 2 ELSE 1 END AS r_band,
        |    CASE WHEN f_orders >= 11 THEN 3 WHEN f_orders >= 8 THEN 2 ELSE 1 END AS f_band,
        |    CASE WHEN m_cents >= 281000000 THEN 3
        |         WHEN m_cents >= 205000000 THEN 2 ELSE 1 END AS m_band
        |  FROM c CROSS JOIN g)
        |ORDER BY o_custkey""".stripMargin,

    // basket pairs, minsup prune, integer lift — identical chain
    "q_market_basket" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |no AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM b),
        |it AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c1 FROM b GROUP BY 1),
        |pr AS (SELECT x.l_partkey AS p1, y.l_partkey AS p2, CAST(count(*) AS BIGINT) AS c12
        |       FROM b x JOIN b y USING (l_orderkey)
        |       WHERE x.l_partkey < y.l_partkey
        |       GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p1, p2, c12,
        |  (1000000 * c12 * no.n_orders) // (i1.c1 * i2.c1) AS lift_x1e6
        |FROM pr JOIN it i1 ON i1.l_partkey = pr.p1
        |        JOIN it i2 ON i2.l_partkey = pr.p2
        |        CROSS JOIN no
        |ORDER BY lift_x1e6 DESC, p1 ASC, p2 ASC""".stripMargin,

    // the clamped CUSUM recurrence replayed via its closed form:
    // running sum minus running min of the unclamped deviation prefix
    "q_rate_cusum" ->
      """WITH wc AS (
        |  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start_s,
        |         event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |mu AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot,
        |              CAST(count(*) AS BIGINT) AS nh FROM wc GROUP BY 1),
        |dv AS (SELECT w.event_type, w.win_start_s, w.n, w.n * m.nh - m.tot AS dev, m.nh
        |       FROM wc w JOIN mu m USING (event_type)),
        |pref AS (
        |  SELECT event_type, win_start_s, n, nh,
        |    CAST(sum(dev) OVER (PARTITION BY event_type ORDER BY win_start_s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
        |  FROM dv),
        |pp AS (
        |  SELECT event_type, win_start_s, n, nh, p,
        |    CAST(min(p) OVER (PARTITION BY event_type ORDER BY win_start_s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS minp
        |  FROM pref)
        |SELECT event_type, win_start_s, n,
        |  (p - least(CAST(0 AS BIGINT), minp)) // nh AS cusum
        |FROM pp ORDER BY event_type, win_start_s""".stripMargin,

    "q_anomaly_windows" ->
      """WITH wc AS (
        |  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start_s,
        |         event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM wc GROUP BY 1),
        |dev AS (SELECT w.win_start_s, w.event_type, w.n, m.med,
        |               abs(w.n - m.med) AS dev
        |        FROM wc w JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT v.win_start_s, v.event_type, v.n,
        |  round(v.med, 4) AS med, round(a.mad, 4) AS mad,
        |  round(v.dev / greatest(a.mad, 0.5), 4) AS mad_score
        |FROM dev v JOIN mad a USING (event_type)
        |WHERE v.dev > 2 * a.mad
        |ORDER BY v.event_type, v.win_start_s""".stripMargin,

    "q_lateral_join" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |ORDER BY c_custkey""".stripMargin,

    "q_corr_covar" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_p_x100,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_qp_x100,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_bool_agg" ->
      """SELECT o_orderpriority,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_orderstatus = 'P') AS any_pending,
        |  count(*) AS n_rows
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_union_by_name" ->
      """SELECT o_orderkey, o_totalprice, 'hi' AS src FROM orders WHERE o_totalprice > 400000
        |UNION ALL BY NAME
        |SELECT o_totalprice, o_orderkey FROM orders WHERE o_totalprice < 1000
        |ORDER BY o_orderkey""".stripMargin,

    "q_gap_fill" ->
      s"""WITH daily AS (
        |  SELECT user_id, ts::DATE AS day, count(*) AS n, ${dsumSql("value")} AS sum_v
        |  FROM events GROUP BY user_id, ts::DATE
        |), spine AS (
        |  SELECT user_id, unnest(generate_series(min(ts::DATE), max(ts::DATE), INTERVAL 1 DAY))::DATE AS day
        |  FROM events GROUP BY user_id
        |)
        |SELECT s.user_id, s.day,
        |  coalesce(d.n, 0) AS n_events,
        |  last_value(d.sum_v IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_v_filled
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
        |ORDER BY s.user_id, s.day""".stripMargin,

    // stage times chain as strict-after minimums; lags are exact integer
    // microseconds (epoch_us ≡ Spark unix_micros)
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(v.t1) AS t1
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3, min(c.t2) AS t2
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
        |      GROUP BY e.user_id)
        |SELECT stage, n_users, sum_lag_us FROM (
        |  SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users,
        |         CAST(sum(0) AS BIGINT) AS sum_lag_us FROM v
        |  UNION ALL
        |  SELECT '2_click', CAST(count(*) AS BIGINT),
        |         CAST(sum(t2 - t1) AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT '3_purchase', CAST(count(*) AS BIGINT),
        |         CAST(sum(t3 - t2) AS BIGINT) FROM p)
        |ORDER BY stage""".stripMargin,

    // week arithmetic is integer day-diff DIV 7 on both engines — no
    // engine week-truncation rules involved
    "q_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS eday FROM events
        |            WHERE value > 95),
        |f AS (SELECT user_id, min(eday) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT date_diff('day', DATE '2024-01-01', f.cohort_day) // 7 AS cohort_week,
        |       date_diff('day', f.cohort_day, ev.eday) // 7 AS week_offset,
        |       CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
        |FROM ev JOIN f ON ev.user_id = f.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,
  )
}
