package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Package-local bridge to `SparkContext.listenerBus` (private[spark]):
  * lets tests drain the async listener bus DETERMINISTICALLY before
  * asserting on listener-observed state, instead of sleeping a fixed
  * interval that is both slow in every run and racy on a loaded box
  * (ADVICE r14 — the Round13Spec zero-jobs memoization check).
  */
object ListenerDrain {

  /** Block until every event posted so far has been delivered to every
    * registered listener.
    */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
