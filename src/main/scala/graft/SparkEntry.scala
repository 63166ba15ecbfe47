package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.io.Sources
import graft.engine.ops.{Analytics, Lines, Multimodal, Relational, Similarity, Temporal, TextPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory (SURVEY §2.2 A–I):
  * each key is a `(SparkSession, sfDir) => DataFrame` program; keys that
  * also appear in `oracleSql` are hash-compared against DuckDB running
  * the equivalent SQL on the same parquet (the correctness gate); the
  * rest (probabilistic / engine-specific ops) get rows-only checks.
  */
object SparkEntry {
  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextPipeline.queries ++ Similarity.queries ++ Multimodal.queries ++ Analytics.queries ++ Temporal.queries ++ Sources.queries ++ Lines.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx/LSH/stubbed queries) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextPipeline.oracle ++ Similarity.oracle ++ Multimodal.oracle ++ Analytics.oracle ++ Temporal.oracle ++ Sources.oracle ++ Lines.oracle
}
