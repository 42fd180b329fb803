// Test-only shim: SparkContext.listenerBus is private[spark]; specs that
// assert on listener-observed job counts need a deterministic drain
// instead of a fixed sleep (which flakes on slow boxes).
package org.apache.spark.graftshim

import org.apache.spark.SparkContext

object TestListenerBus {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
