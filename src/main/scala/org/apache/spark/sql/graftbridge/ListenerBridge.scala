package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus.waitUntilEmpty` (private[spark]):
  * the scheduler posts job/stage events asynchronously, so a profiler
  * that reads listener-maintained counters right after an action races
  * the bus. Draining it first makes per-run job/stage counts exact —
  * which Bench needs, because one miscounted run is indistinguishable
  * from a plan regression in the cross-round artifact diff.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
