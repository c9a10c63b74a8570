package org.apache.spark

/** Minimal bridge to the `private[spark]` listener bus: lets the copy
  * progress reporter drain pending task-end events before detaching its
  * listener, so the final percent line is deterministic. */
object GraftListenerShim {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
