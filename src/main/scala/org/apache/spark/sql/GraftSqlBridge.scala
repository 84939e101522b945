package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Same-package bridge to the `private[sql]` classic `Dataset.ofRows` —
  * the standard mechanism open-source Spark extension libraries use to
  * turn a custom `LogicalPlan` node back into a user-facing `DataFrame`.
  * This is the ONLY member of the project living outside the `graft`
  * namespace, and it adds no behavior: one delegating call.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The session's stable unique id (`private[sql]` on classic
    * SparkSession) — a memoization key that, unlike
    * `System.identityHashCode`, cannot be reused by a new session after
    * the old one is GC'd (ADVICE r09). */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID
}
