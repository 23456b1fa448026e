package org.apache.spark.graftglue

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` SparkContext.listenerBus — the bench
  * instrumentation needs a flush barrier (listener events are delivered
  * asynchronously, so task metrics snapshotted right after an action can
  * miss the action's last tasks). Lives inside the org.apache.spark
  * package hierarchy purely to satisfy the access modifier; no Spark
  * internals are modified. */
object ListenerGlue {
  /** Block until every queued listener event has been delivered. */
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
