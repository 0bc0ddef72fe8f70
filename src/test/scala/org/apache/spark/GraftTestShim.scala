package org.apache.spark

/** Test-only accessor for the listener bus's drain barrier
  * (`listenerBus.waitUntilEmpty` is `private[spark]`). CurateForkSpec
  * counts source scans through a SparkListener, and the events are
  * posted asynchronously — without the barrier the count read after an
  * action races the bus.
  */
object GraftTestShim {
  def waitListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
