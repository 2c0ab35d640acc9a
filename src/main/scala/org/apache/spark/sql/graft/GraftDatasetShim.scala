package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * The one `private[sql]` door the library needs: turning a hand-built
 * [[LogicalPlan]] (e.g. [[graft.plans.AsOfJoinNode]]) into a DataFrame.
 * Spark exposes no public constructor for this; every extension library
 * that contributes logical plans ships exactly this shim. Nothing else
 * internal is accessed here.
 */
object GraftDatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
