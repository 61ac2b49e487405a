package org.apache.spark

/** Test-only bridge into `private[spark]` listener-bus internals: lets a
  * spec flush pending SparkListener events synchronously so a job counter
  * reads complete totals (listener delivery is async; polling with sleeps
  * is the flaky alternative). */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
