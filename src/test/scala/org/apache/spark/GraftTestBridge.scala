package org.apache.spark

/** Test-only bridge into `private[spark]` surface: lets specs drain the
  * listener bus before reading counters accumulated by listeners (both
  * `QueryExecutionListener` — which rides the shared LiveListenerBus since
  * Spark 3.0 — and plain `SparkListener`s). Without the drain, assertions
  * race the asynchronous listener dispatch. */
object GraftTestBridge {
  def waitListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
