package org.apache.spark

/** `SparkContext.listenerBus` is private[spark]; the metrics harness
  * needs its deterministic `waitUntilEmpty` (sleeping races late
  * task-end events into the next query's counters). Same shim pattern
  * as `org.apache.spark.sql.GraftShims`. */
object GraftSparkShims {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
