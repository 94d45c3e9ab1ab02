package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Minimal shim into the (private[spark]) LiveListenerBus: benchmark CPU
  * accounting reads SparkListener task-metric accumulators and must drain
  * the async bus before reading, or late task-end events are dropped from
  * the tally.
  */
object BusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
