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
    // events.ts arrives in one of two fixture layouts:
    //  - TIMESTAMP(NANOS): Spark 4 cannot read it as a timestamp; sessions
    //    set spark.sql.legacy.parquet.nanosAsLong=true so it surfaces as a
    //    BIGINT of nanos, and we truncate ns→µs here — the same truncation
    //    DuckDB applies on read, so both engines see the identical
    //    microsecond timeline.
    //  - TIMESTAMP(MICROS): surfaces as TIMESTAMP_NTZ; cast to the session
    //    TimestampType (session tz is UTC, so the cast is value-preserving)
    //    to keep every downstream operator on the same type either way.
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case TimestampNTZType | TimestampType =>
          // the NTZ→LTZ cast is value-preserving ONLY under a UTC
          // session (GraftSession pins it, but load accepts any
          // session) — fail fast instead of silently shifting the
          // whole events timeline by a wall-clock offset
          val tz = spark.conf.get("spark.sql.session.timeZone")
          if (tz != "UTC") throw new IllegalStateException(
            s"events.ts NTZ cast requires spark.sql.session.timeZone=UTC, session has '$tz'")
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case other =>
          // a regenerated fixture with an unexpected ts type must not be
          // silently coerced (a StringType would cast to mostly-nulls)
          throw new IllegalStateException(
            s"unexpected events.ts type ${other.simpleString}: expected nanos-as-long " +
              "(BIGINT under spark.sql.legacy.parquet.nanosAsLong) or TIMESTAMP(MICROS)")
      }
    } else raw
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

  /** The bucketed join layout SURVEY §4.2 commits to for the big-fact
    * joins: lineitem and orders CLUSTERED BY the order key into the same
    * bucket count, so an equi-join on that key reads co-located buckets
    * and needs NO shuffle on either side — at 100 TB the single biggest
    * join cost simply disappears from every query that joins on the
    * bucket key. `repartition(8, key)` before the bucketed write uses
    * the same murmur3 hash as the bucket assignment, so each task holds
    * exactly one bucket → one file per bucket → the scan also reports
    * per-bucket sort order and the join elides its sorts. Tables are
    * registered in the session catalog on first use (external, data
    * under `target/`), so bench reruns in one session pay the write
    * once. */
  def bucketedOrdersJoin(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val tag = new java.io.File(sfDir).getName.replace(".", "_").replace("-", "_")
    val base = new java.io.File(s"target/bucketed/$tag").getAbsolutePath
    def ensure(name: String, df: => DataFrame, key: String): DataFrame = {
      val full = s"${name}_$tag"
      this.synchronized {
        if (!spark.catalog.tableExists(full)) {
          val dir = new java.io.File(s"$base/$full")
          if (new java.io.File(dir, "_SUCCESS").exists()) {
            // data already bucketed on disk from an earlier session:
            // re-register the external table over it instead of rewriting
            // (a fresh JVM per bench/verify run must not pay the write)
            spark.sql(
              s"""CREATE TABLE $full (${df.schema.toDDL})
                 |USING PARQUET
                 |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
                 |LOCATION '${dir.getAbsolutePath}'""".stripMargin)
          } else {
            df.repartition(8, col(key))
              .write.mode("overwrite")
              .bucketBy(8, key).sortBy(key)
              .option("path", dir.getAbsolutePath)
              .saveAsTable(full)
          }
        }
      }
      spark.table(full)
    }
    (ensure("lineitem_bkt", lineitem(spark, sfDir), "l_orderkey"),
     ensure("orders_bkt", orders(spark, sfDir), "o_orderkey"))
  }

  /** The date-partitioned events layout SURVEY §4.2 commits to for the
    * 100 TB table, materialized once per sfDir under `target/` (plus the
    * tiny date dimension DPP needs): a directory per `event_date`, so a
    * date predicate prunes directories at PLAN time and a filtered-dim
    * join prunes them at RUN time (dynamic partition pruning). Returns
    * `(fact, dateDim)` readers over the partitioned layout. Contents are
    * exactly the events table plus the derived date column — queries over
    * this layout oracle against raw `events` with the same derivation. */
  def eventsByDate(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val tag = new java.io.File(sfDir).getName
    val base = new java.io.File(s"target/partitioned/$tag").getAbsolutePath
    val factDir = s"$base/events_by_date"
    val dimDir = s"$base/date_dim"
    val done = new java.io.File(s"$base/_BUILT")
    this.synchronized {
      if (!done.exists()) {
        val ev = events(spark, sfDir).withColumn("event_date", col("ts").cast("date"))
        ev.write.mode("overwrite").partitionBy("event_date").parquet(factDir)
        // the dim is ~366 distinct dates built once per sfDir;
        // constWindowKey keeps the single-partition rank warning-free
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(graft.engine.functions.GraftFunctions.constWindowKey(col("event_date")))
          .orderBy("event_date")
        ev.select(col("event_date")).distinct()
          .withColumn("day_no", row_number().over(w).cast("long"))
          .write.mode("overwrite").parquet(dimDir)
        done.createNewFile()
      }
    }
    (spark.read.parquet(factDir), spark.read.parquet(dimDir))
  }
}
