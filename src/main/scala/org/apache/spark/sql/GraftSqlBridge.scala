package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-private-access bridge: building a DataFrame from a custom
  * [[LogicalPlan]] goes through `Dataset.ofRows`, which Spark scopes
  * `private[sql]` — the standard extension-library pattern is a one-file
  * shim in the `org.apache.spark.sql` package (no Spark internals are
  * modified or shadowed here).
  */
object GraftSqlBridge {

  /** Wrap a custom logical plan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan of a DataFrame (resolved attributes to graft a
    * custom node onto). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
