package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge: QueryExecutionListener events ride the shared
  * (asynchronous) Spark listener bus, so a spec that asserts on what a
  * listener saw must drain the bus first. `listenerBus` is
  * private[spark]; this object lives in the repo's one bridge package
  * (beside GraftColumns) purely to expose the drain to tests.
  */
object ListenerFlush {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
