package graft.engine.ops

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Semantics checks for the temporal operators: the native
  * session_window vs the gaps-and-islands formulation, the banded range
  * join vs a naive theta join, and sliding vs tumbling windows. */
class TemporalSpec extends SparkSuite {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("scd2 intervals: versions dense per user, intervals chain gaplessly, exactly one current") {
    val rows = run("q_scd2_intervals")
      .select("user_id", "version", "valid_from_s", "valid_to_s")
      .as[(Long, Long, Long, Option[Long])].collect()
    rows.groupBy(_._1).foreach { case (u, history) =>
      val h = history.sortBy(_._2)
      assert(h.map(_._2).toSeq == (1L to h.length).toSeq, s"versions not dense for user $u")
      // each version's valid_to equals the next version's valid_from
      h.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3), s"interval gap for user $u at v${a._2}")
        case _           =>
      }
      assert(h.count(_._4.isEmpty) == 1 && h.last._4.isEmpty,
        s"exactly the last version is current for user $u")
    }
  }

  test("session_window: sessions are disjoint per user and ordered, gap semantics hold") {
    val s = run("q_session_window")
      .select("user_id", "start_s", "end_s", "n_events")
      .as[(Long, Long, Long, Long)].collect()
    s.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          // next session starts at or after the previous window closed
          assert(s2 >= e1, s"overlapping session windows: end=$e1 next start=$s2")
        case _ => ()
      }
    }
    assert(s.forall { case (_, st, en, n) => en > st && n >= 1 })
  }

  test("session_window event counts conserve the corpus") {
    val total = run("q_session_window").agg(sum("n_events")).head().getLong(0)
    val events = graft.engine.io.Tables.events(spark, sfDir).count()
    assert(total == events, s"session windows lost events: $total != $events")
  }

  test("range join matches the naive theta-join formulation exactly, and both branches live") {
    val banded = run("q_range_join")
    val ev = graft.engine.io.Tables.events(spark, sfDir)
      .select(col("user_id").as("u"), col("ts"), col("value"))
    val probes = graft.engine.io.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("u2"),
              col("ts").as("t0"))
    val naive = probes.join(ev,
        col("u2") === ev("u") &&
          col("ts") >= col("t0") - expr("INTERVAL 3 DAYS") && col("ts") < col("t0"),
        "left_outer")
      .groupBy("purchase_id")
      .agg(count(col("ts")).as("n_ev"),
           sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)")
             .cast("double").as("sum_v"))
      .orderBy("purchase_id")
    val got = banded.collect().toSeq
    assert(got == naive.collect().toSeq)
    // the r9 rebind exists because the old orders anchor matched NOTHING
    // in its band (time-disjoint ranges): both branches must carry rows
    val nEvs = got.map(_.getLong(1))
    assert(nEvs.exists(_ > 0) && nEvs.contains(0L),
      s"degenerate fixture: matched=${nEvs.count(_ > 0)} empty=${nEvs.count(_ == 0)}")
  }

  test("sliding windows: every event lands in exactly width/slide windows") {
    val n = run("q_window_sliding").agg(sum("n")).head().getLong(0)
    val events = graft.engine.io.Tables.events(spark, sfDir).count()
    assert(n == 2 * events, s"12h/6h sliding must double-count: $n != 2*$events")
  }

  test("sliding windows contain the tumbling windows of the same width grid") {
    // every (6h-aligned start) tumbling bucket's count is <= the sliding
    // window count starting there (the sliding window covers 12h)
    val slide = run("q_window_sliding")
      .groupBy("win_start_s").agg(sum("n").as("n"))
      .as[(Long, Long)].collect().toMap
    val tumble = graft.engine.io.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long"), col("n"))
      .as[(Long, Long)].collect()
    tumble.foreach { case (start, n) =>
      assert(slide.getOrElse(start, 0L) >= n, s"window at $start dropped rows")
    }
  }
}
