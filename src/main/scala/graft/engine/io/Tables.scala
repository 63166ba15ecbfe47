package graft.engine.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table registry: the single place bench, verify and tests load
  * fixture tables from (SURVEY.md §7.1).
  *
  * Scale notes (100 TB design): each table is one parquet path today; at
  * cluster scale these become partitioned/ bucketed directories. Keeping
  * every query behind this registry means re-layout (date-partitioned
  * `events`, bucketed `lineitem`/`orders` on the join key) is a one-line
  * change here, invisible to operators. All reads are plain
  * `spark.read.parquet` so Catalyst column pruning + predicate pushdown
  * reach the scan (verified by plan tests in PlanShapeSpec).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every engine query loads through here → the session always has the
    // native functions (array_dot, sorted_intersect_size) registered
    graft.engine.functions.GraftFunctions.register(spark)
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 cannot read as a
    // timestamp; sessions set spark.sql.legacy.parquet.nanosAsLong=true and
    // we truncate ns→µs here — the same truncation DuckDB applies on read,
    // so both engines see the identical microsecond timeline.
    if (name == "events")
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register all fixture tables as temp views for `spark.sql` queries
    * (grouping-sets etc. are SQL-only surfaces). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
