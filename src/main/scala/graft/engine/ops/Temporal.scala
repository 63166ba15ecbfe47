package graft.engine.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.io.Tables

/** Temporal operators beyond the as-of join / sessionization already in
  * [[Analytics]]: the native `session_window` generator in batch mode and
  * a banded range (interval) join.
  *
  * Scale notes:
  *  - `session_window` is the same operator the streaming surface uses
  *    (Streams session tests); in batch it compiles to one shuffle on the
  *    user key + an in-partition merge of overlapping windows — no
  *    quadratic self-join, and the SAME code path later absorbs the
  *    streaming state store. Its gap semantics differ from the
  *    gaps-and-islands formulation at exact-boundary events (a gap of
  *    exactly 30 min CLOSES a session window because windows are
  *    half-open `[ts, ts+gap)`, while `diff > 1800` keeps it open), which
  *    is why both shapes ship and both are oracled.
  *  - the range join brackets event time into band-width buckets and
  *    equi-joins on (key, bucket): each probe expands to exactly 2
  *    adjacent buckets, so the join stays a hash/sort-merge equi-join
  *    with a cheap residual filter instead of the O(n·m) per-key range
  *    probe a naive theta join degenerates to. At 100 TB the bucket id
  *    doubles as the partition key of the events layout, turning each
  *    probe into a partition-pruned read.
  */
object Temporal {
  private type Q = (SparkSession, String) => DataFrame

  /** Native session_window over events: 30-minute gap, per user. */
  private val qSessionWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           min("event_id").as("first_event"))
      .select(col("user_id"),
              col("sw.start").cast("long").as("start_s"),
              col("sw.end").cast("long").as("end_s"),
              col("n_events"), col("first_event"))
      .orderBy("user_id", "start_s")

  /** Banded range join: per purchase event, how many OTHER events its
    * user produced in the 3 days strictly before it, plus the exact
    * decimal sum of their values — the pre-decision activity feature.
    * Implemented as the 2-bucket equi-join described in the object
    * scaladoc; purchases with no prior-window events are kept
    * (zero-filled) via a final left join.
    *
    * Anchored events←events since r9: the original orders←events probe
    * was time-disjoint in the fixture (orders end 2001, events start
    * 2024), so the band matched NOTHING — n_ev was 0 and sum_v null on
    * every row, an oracle that passed without ever exercising a match.
    * Both branches now carry real rows (spec-asserted). */
  private val qRangeJoin: Q = (s, d) => {
    val W = 259200L // band = bucket width = 3 days, so 2 buckets cover any probe
    val ev = Tables.events(s, d).select(
      col("user_id").as("u"), col("ts"),
      (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(W))).as("bucket"),
      col("value"))
    val probes0 = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("u"),
              col("ts").as("t0"))
    val probes = probes0.select(col("purchase_id"), col("u"), col("t0"),
      explode(array(
        (col("t0").cast("long") - pmod(col("t0").cast("long"), lit(W))) - W,
        col("t0").cast("long") - pmod(col("t0").cast("long"), lit(W)))).as("bucket"))
    val matched = probes.join(ev, Seq("u", "bucket"))
      .filter(col("ts") >= col("t0") - expr("INTERVAL 3 DAYS") && col("ts") < col("t0"))
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_ev"),
           sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)")
             .cast("double").as("sum_v"))
    probes0.select("purchase_id").join(matched, Seq("purchase_id"), "left_outer")
      .select(col("purchase_id"),
              coalesce(col("n_ev"), lit(0L)).as("n_ev"), col("sum_v"))
      .orderBy("purchase_id")
  }

  /** Batch sliding windows: 12 h width sliding by 6 h, so every event
    * lands in exactly 2 epoch-aligned windows. Spark expands the event
    * via the same generator the tumbling case uses (no self-join); at
    * 100 TB the expansion factor is width/slide — bounded and chosen by
    * the caller, and the post-expansion aggregate is an ordinary
    * partial+final hash agg on (window, type). Exact outputs only
    * (count/min/max) per the q_time_window precedent. */
  private val qWindowSliding: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "12 hours", "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), min("value").as("min_v"), max("value").as("max_v"))
      .select(col("w.start").cast("long").as("win_start_s"), col("event_type"),
              col("n"), col("min_v"), col("max_v"))
      .orderBy("win_start_s", "event_type")

  /** SCD-2 validity intervals: each event becomes a versioned row whose
    * validity runs from its own timestamp to the next event's (NULL =
    * still current) — the slowly-changing-dimension history build every
    * warehouse pipeline runs over CDC feeds. One window over the natural
    * key, both outputs (`lead` + `row_number`) share the single sort, and
    * the shuffle key (user) is the same key downstream temporal queries
    * partition by. Timestamps are reported as epoch seconds (the
    * cross-engine-stable projection of a µs timestamp). */
  private val qScd2: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("valid_from_s"),
        col("valid_to_ts").cast("long").as("valid_to_s"),
        col("valid_to_ts").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  val queries: Map[String, Q] = Map(
    "q_session_window" -> qSessionWindow,
    "q_range_join" -> qRangeJoin,
    "q_window_sliding" -> qWindowSliding,
    "q_scd2_intervals" -> qScd2,
  )

  val oracle: Map[String, String] = Map(
    // session_window semantics: a session CLOSES when the next event is
    // >= gap after the previous one (half-open windows), unlike
    // q_sessionize's strict >. end = last event + gap.
    "q_session_window" ->
      """SELECT user_id,
        |  CAST(epoch_us(min(ts)) // 1000000 AS BIGINT) AS start_s,
        |  CAST((epoch_us(max(ts)) + 1800000000) // 1000000 AS BIGINT) AS end_s,
        |  count(*) AS n_events,
        |  min(event_id) AS first_event
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
        |           THEN 1 ELSE 0 END AS new_s
        |    FROM (SELECT user_id, event_id, ts,
        |            lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |          FROM events)))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, start_s""".stripMargin,

    "q_range_join" ->
      """SELECT p.event_id AS purchase_id,
        |  count(e.ts) AS n_ev,
        |  CAST(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_v
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN events e
        |  ON p.user_id = e.user_id
        | AND e.ts >= p.ts - INTERVAL 3 DAY
        | AND e.ts <  p.ts
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin,

    "q_scd2_intervals" ->
      """SELECT user_id, version, event_id, event_type,
        |  CAST(epoch_us(ts) // 1000000 AS BIGINT) AS valid_from_s,
        |  CAST(epoch_us(valid_to_ts) // 1000000 AS BIGINT) AS valid_to_s,
        |  valid_to_ts IS NULL AS is_current
        |FROM (
        |  SELECT user_id, event_id, event_type, ts,
        |    CAST(row_number() OVER w AS BIGINT) AS version,
        |    lead(ts, 1) OVER w AS valid_to_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |ORDER BY user_id, version""".stripMargin,

    // every event belongs to exactly 2 windows: the 6h-aligned start at
    // or before it, and the one 6h earlier (12h width / 6h slide)
    "q_window_sliding" ->
      """SELECT win_start_s, event_type, count(*) AS n,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM (
        |  SELECT unnest([
        |      CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT),
        |      CAST(floor(epoch(ts) / 21600) * 21600 - 21600 AS BIGINT)]) AS win_start_s,
        |    event_type, value
        |  FROM events)
        |GROUP BY win_start_s, event_type
        |ORDER BY win_start_s, event_type""".stripMargin,
  )
}
