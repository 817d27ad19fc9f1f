package graft.bench

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Sums task `executorCpuTime` (ns) and `executorRunTime` (ms) across
  * every completed task — the per-query CPU reading the bench emits
  * beside wall time (r13 verdict #3): wall time on a shared host
  * breathes with ambient load (three rounds of judge effort went into
  * re-adjudicating uniform ~1.3× wall swings as noise), while CPU
  * seconds consumed by the query's own tasks do not. Register once,
  * snapshot the counters around each query, and [[flush]] the async
  * listener bus before the closing snapshot so the delta is complete.
  *
  * Thread-safe (listener events arrive on the bus dispatch threads);
  * failed tasks still carry metrics and are counted — a retry burns
  * real CPU and should be visible in the reading. */
class CpuTimeListener extends SparkListener {
  private val cpuNs = new AtomicLong(0L)
  private val runMs = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      cpuNs.addAndGet(m.executorCpuTime)
      runMs.addAndGet(m.executorRunTime)
      ()
    }
  }

  /** (cpu seconds, run seconds) so far. Call [[flush]] first when the
    * reading must include everything up to "now". */
  def snapshot(): (Double, Double) =
    (cpuNs.get() / 1e9, runMs.get() / 1e3)

  /** Drain the listener bus so every completed task's metrics are in
    * the counters. */
  def flush(sc: SparkContext): Unit = ListenerBridge.flush(sc)
}
