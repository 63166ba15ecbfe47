package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Strips the origin statistics a Spark 4 `localCheckpoint`/`checkpoint`
  * carries into its `LogicalRDD` (`LogicalRDD.fromDataset` copies the
  * source plan's `Statistics` so a checkpoint keeps its estimates —
  * normally a planning feature).
  *
  * Why the engine needs the opposite for STANDING maintenance stores
  * (`graft.engine.stream.Streams`): a store checkpointed per micro-batch
  * and joined back into the next batch's plan forms a FEEDBACK LOOP in
  * the estimator. `SizeInBytesOnlyStatsPlanVisitor` multiplies children
  * sizes at every join, so when the standing table enters the batch
  * plan twice (the incremental-CC quotient translates BOTH edge
  * endpoints through it), the carried `sizeInBytes` roughly SQUARES
  * every batch — the estimate's bit-length doubles per batch, and by
  * batch ~30 the driver is grinding multi-hundred-MB `BigInteger`
  * multiplications inside join planning (observed: the 48-batch cluster
  * ladder spent 39 minutes planning one batch, then OOMed an 8 g heap
  * on statistics BigInts while the actual store held ~7k rows).
  * Stripping the carried stats resets each checkpoint to the default
  * leaf estimate, which does not compound: the in-batch plan has
  * bounded join depth, so estimates stay a few hundred bits forever.
  *
  * Runtime behavior is untouched — the same checkpointed RDD backs the
  * returned frame (so block release via the maintenance classes'
  * lease still works), only the estimator input changes; join-side
  * selection at these sizes is AQE's runtime call either way.
  *
  * Lives in `org.apache.spark.sql` because `classic.Dataset.ofRows` and
  * the `LogicalRDD` second constructor-parameter list are
  * `private[sql]` — the one place the engine needs package-private
  * Spark API, kept to this single file. */
object CkptStats {
  def stripCarriedStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[SparkSession]
        Dataset.ofRows(session,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(session, None, None))
      case _ => df
    }
}
