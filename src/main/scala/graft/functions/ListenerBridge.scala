package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `SparkContext.listenerBus` (`private[spark]`): lets the
  * bench drain pending listener events so per-query scan accounting
  * (bytes/records read, accumulated in a `SparkListener`) is exact, not
  * racing the async bus.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
