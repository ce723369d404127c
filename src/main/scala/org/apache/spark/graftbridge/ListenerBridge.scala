package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the bench's per-query
  * shuffle tally ([[graft.Bench.ShuffleTally]]) needs a deterministic flush
  * between queries so asynchronously-posted task-end events cannot bleed
  * across query boundaries. Same minimal-shim policy as the two
  * `org.apache.spark.sql.graftbridge` files: one method re-exported, no
  * other internals touched. */
object ListenerBridge {
  /** Block until every queued listener event has been delivered. A timeout
    * (bus wedged — never observed locally) degrades to a stale-but-bounded
    * tally rather than failing the bench. */
  def flush(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
