package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's `Column` wraps a `ColumnNode`
  * rather than an `Expression`; the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — this shim (inside the sql package tree) re-exports the
  * two conversions the graft's native Catalyst expressions need.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly free the executor-storage blocks behind a `localCheckpoint`-ed
    * DataFrame. `df.unpersist()` is NOT enough: checkpoint RDD blocks are
    * reclaimed only via ContextCleaner GC, so a long-lived session that
    * replaces checkpointed generations (IncrementalDedup's label table)
    * leaks storage until the driver GCs the RDD reference. The checkpointed
    * frame's analyzed plan is a `LogicalRDD` leaf wrapping the persisted
    * RDD — unpersist THAT. Safe only when the frame is truly dead:
    * a locally-checkpointed RDD cannot be recomputed after its blocks go. */
  def releaseLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df match {
      case d: org.apache.spark.sql.classic.Dataset[_] =>
        d.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking = false); ()
          case _ => ()
        }
      case _ => ()
    }

  /** Drain the async listener bus. Job-count evidence sampled from a
    * `SparkListener` counter immediately after an action can miss JobEnd
    * events still in flight (delivery is asynchronous) — profilers must
    * drain before reading. `SparkContext.listenerBus` is `private[spark]`,
    * hence the re-export from inside the package tree. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Never-throwing variant for cleanup paths (iterative operators,
    * streaming state maintenance) — a failed release is a leak, not an
    * error worth failing the job for. */
  def releaseLocalCheckpointQuietly(df: org.apache.spark.sql.DataFrame): Unit =
    try releaseLocalCheckpoint(df) catch { case _: Exception => () }
}
