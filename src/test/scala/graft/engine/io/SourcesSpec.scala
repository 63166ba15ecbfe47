package graft.engine.io

import graft.{SparkEntry, SparkSuite}

/** Format-source coverage: every non-parquet reader must agree with the
  * parquet original in schema and cardinality (cell-level equality is
  * the DuckDB oracle's job), and its scan must carry the supplied
  * schema — never trigger inference. */
class SourcesSpec extends SparkSuite {

  private val cases = Seq(
    ("q_source_csv", "part", "csv"),
    ("q_source_json", "supplier", "json"),
    ("q_source_orc", "customer", "orc"))

  test("format roundtrips preserve schema and row count vs parquet") {
    cases.foreach { case (q, table, _) =>
      val got = SparkEntry.queries(q)(spark, sfDir)
      val ref = Tables.load(spark, sfDir, table)
      assert(got.schema == ref.schema, s"$q schema drift")
      assert(got.count() == ref.count(), s"$q row-count drift")
    }
  }

  test("format scans read through the declared format node") {
    cases.foreach { case (q, _, fmt) =>
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains(s"filescan $fmt"),
        s"$q should scan via $fmt: $plan")
    }
  }
}
