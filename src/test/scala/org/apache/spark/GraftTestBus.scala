package org.apache.spark

/** Test-only bridge to the `private[spark]` listener bus: lets specs that
  * count jobs via a SparkListener drain the async event queues
  * deterministically (`waitUntilEmpty`) instead of sleeping — a late
  * onJobStart delivered after listener removal would otherwise silently
  * under-count. */
object GraftTestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
