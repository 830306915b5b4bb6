package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Accessor for the (`private[spark]`) listener-bus drain. Spark's
  * listener bus is asynchronous: a query's last `onTaskEnd`/
  * `onStageSubmitted` events can still be in flight when the next query
  * starts, so per-query counters read (or reset) without a drain
  * attribute tail events to the wrong query. Bench drains the bus after
  * each timed run (outside the measured window) before reading counts.
  */
object ListenerBridge {
  /** Returns false if the bus did not drain within the timeout (counts
    * may then be off by the in-flight tail — reported, never thrown).
    */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
