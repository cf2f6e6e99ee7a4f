package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` surface (accessible from org.apache.spark
  * subpackages): deterministically drain the async listener bus so
  * SparkListener-based metrics attribute events to the right query and
  * plan assertions never race event delivery.
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
