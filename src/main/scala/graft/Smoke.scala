package graft

import graft.engine.GraftSession

/** Driver-style smoke: builds the same kind of session the driver uses and
  * checks `SparkEntry.entry` returns rows (>0) at sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
