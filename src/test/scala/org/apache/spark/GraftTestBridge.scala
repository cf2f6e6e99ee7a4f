package org.apache.spark

/** Test-only bridge into `private[spark]` surface: deterministically drain
  * the async listener bus so SparkListener-based plan assertions never race
  * event delivery (replaces fixed sleeps, which flaky-PASS on loaded boxes).
  */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
