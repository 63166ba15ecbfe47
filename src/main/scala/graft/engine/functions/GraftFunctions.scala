package graft.engine.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Scala-facing surface for the engine's native Catalyst expressions.
  * Everything goes through the public FunctionRegistry + `call_function`
  * path (no private Spark APIs), so the same functions are reachable from
  * SQL text and from the DataFrame API alike. */
object GraftFunctions {
  private val registry: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedLongIntersectSize].getName, "sorted_intersect_size"),
      (children: Seq[Expression]) => SortedLongIntersectSize(children(0), children(1))))

  /** Register the engine functions into a session (idempotent). */
  def register(spark: SparkSession): Unit = registry.foreach { case (ident, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }

  /** |a ∩ b| for sorted long arrays — see [[SortedLongIntersectSize]].
    * Needs the owning session to resolve the registered function. */
  def sortedIntersectSize(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("sorted_intersect_size", a, b)
  }
}

/** SQL-extension entry point (SURVEY §4.2's injection stub, now live):
  * `--conf spark.sql.extensions=graft.engine.functions.GraftExtensions`
  * makes the engine's native functions available to pure-SQL users. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (FunctionIdentifier("sorted_intersect_size"),
        new ExpressionInfo(classOf[SortedLongIntersectSize].getName, "sorted_intersect_size"),
        (children: Seq[Expression]) => SortedLongIntersectSize(children(0), children(1))))
}
