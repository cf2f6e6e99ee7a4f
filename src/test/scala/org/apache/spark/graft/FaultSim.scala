package org.apache.spark.graft

import org.apache.spark.{MapOutputTrackerMaster, SparkContext}

/** Test-only executor-loss simulation (package-placed for the same
  * reason as [[ListenerDrain]]: the map-output registry is
  * `private[spark]`). A real executor loss takes BOTH its cached blocks
  * and its shuffle map outputs; `unpersist` alone only drops the
  * former, so in local mode a "lost" RDD quietly recomputes its last
  * stage from still-registered shuffle files and a lineage-death test
  * never exercises lineage at all. Dropping the registered map outputs
  * forces the scheduler to resubmit the parent stages — the genuine
  * recompute path a cluster walks after a node dies. */
object FaultSim {
  /** Unregister every shuffle's map (and merge) outputs, forcing full
    * parent-stage recompute on the next action. */
  def dropAllShuffleOutputs(sc: SparkContext): Unit = {
    val tracker = sc.env.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    tracker.shuffleStatuses.keys.foreach(tracker.unregisterAllMapAndMergeOutput)
  }
}
