package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Package bridge: build a DataFrame from a hand-assembled logical
  * plan (`Dataset.ofRows` is `private[sql]`). Used by the snapshot
  * read path to re-wrap a plan after injecting optimizer statistics
  * into its scan ([[graft.sinks.SnapshotStats]]) — same bridge
  * pattern as [[ChangeFeedSource]]'s LogicalRDD re-leafing. */
object GraftPlans {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
