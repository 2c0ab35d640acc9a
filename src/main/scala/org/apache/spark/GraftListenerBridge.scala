package org.apache.spark

/** Bridge into `private[spark]` surface: drains the listener bus so
  * callers accumulating counters via listeners (`QueryExecutionListener`
  * — which rides the shared LiveListenerBus since Spark 3.0 — and plain
  * `SparkListener`s) can read them without racing the asynchronous
  * dispatch. Load-bearing for `SoakAudit`'s executed-plan exchange
  * audit and the plan-invariants specs; same extension-shim pattern as
  * the sql-package bridges, no Spark internals modified. */
object GraftListenerBridge {
  def waitListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
