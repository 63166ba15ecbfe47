package graft.engine

import org.apache.spark.sql.SparkSession

/** The blessed session configuration for the engine — one place for the
  * settings every entry point (Verify, Bench, Smoke, tests, library
  * users) must agree on:
  *
  *  - `shuffle.partitions` sized to the core count, not Spark's default
  *    200 (local mode; at cluster scale this is tuned to data volume);
  *  - UTC session timezone (the oracle determinism contract);
  *  - ANSI off for DuckDB-compatible cast/overflow semantics;
  *  - `nanosAsLong` because the events fixture carries TIMESTAMP(NANOS),
  *    which Spark 4 otherwise refuses to read (Tables.events then
  *    truncates ns→µs, matching DuckDB's read behavior);
  *  - µs parquet timestamps on write (INT96 would confuse comparators);
  *  - AQE on (runtime re-planning, skew handling, partition coalescing).
  */
object GraftSession {
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")

  /** Local session with `cores` worker threads (the driver-contract
    * shape: `local[n]` with shuffle partitions = n). */
  def local(cores: Int): SparkSession = {
    val spark = builder(s"local[$cores]", cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
