package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to the private[spark] listener bus. CountJobs is the
  * designated noise-immune adjudicator for sub-25% effects, so its
  * job/stage counts must be complete: a fixed Thread.sleep races the
  * async bus on a loaded host and can under-report. waitUntilEmpty is
  * the deterministic drain Spark's own test suites use.
  */
object ListenerBusBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
