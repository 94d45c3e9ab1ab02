package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only shim: QueryExecutionListener events ride the (private[spark])
  * LiveListenerBus asynchronously; plan-shape assertions must drain it first.
  */
object TestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
