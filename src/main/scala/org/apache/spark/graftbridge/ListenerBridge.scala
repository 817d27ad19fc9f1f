package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus.waitUntilEmpty()`, which is
  * `private[spark]` — the only reliable way to DRAIN the async
  * listener bus so a per-query task-metrics accumulation
  * ([[graft.bench.CpuTimeListener]]) reads a complete total before
  * the next query starts. Same access-qualifier pattern as
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]]. */
object ListenerBridge {
  /** Block until every queued listener event has been delivered (or
    * the bus's internal timeout elapses — in that case the reading is
    * a lower bound, never an over-count). */
  def flush(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
