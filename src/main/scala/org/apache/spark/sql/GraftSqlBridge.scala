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

  /** The UNRESOLVED Catalyst expression under a Column (Spark 4 scopes
    * the converter `private[sql]`) — lets planners pattern-match cheap
    * shapes (a key-probe `isin`) without a full analysis pass. */
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** The analyzed plan of a DataFrame (resolved attributes to graft a
    * custom node onto). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** A STREAMING-tagged DataFrame over an explicit parquet file list —
    * what a V1 streaming `Source.getBatch` must return (MicroBatchExecution
    * rejects a batch-tagged plan). This is exactly how Spark's own
    * FileStreamSource builds its batches: resolve a parquet relation over
    * the file list, wrap it in a LogicalRelation with isStreaming = true.
    * An empty file list becomes a streaming-tagged empty LocalRelation. */
  def streamingParquetBatch(
      spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      paths: Seq[String]): DataFrame = {
    val cls = spark.asInstanceOf[classic.SparkSession]
    if (paths.isEmpty) {
      ofRows(cls, org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
        Seq.empty, isStreaming = true))
    } else {
      val ds = org.apache.spark.sql.execution.datasources.DataSource(
        cls, className = "parquet", paths = paths, userSpecifiedSchema = Some(schema))
      ofRows(cls, org.apache.spark.sql.execution.datasources.LogicalRelation(
        ds.resolveRelation(checkFilesExist = false), isStreaming = true))
    }
  }

  /** Re-tag a computed BATCH DataFrame as a streaming micro-batch — the
    * inverse of [[asBatch]], for a V1 `Source.getBatch` whose delta is a
    * computation (joins/unions over manifests and sidecars) rather than a
    * raw file list. The plan stays lazy and distributed: the batch query's
    * RDD lineage is wrapped with isStreaming = true, exactly how Spark's
    * own memory/rate sources tag their batches. Sound for a source only
    * because manifests and data files are immutable after publish —
    * replaying the same offset range re-derives the identical rows (the
    * prefix-determinism the exactly-once contract needs). */
  def asStreaming(df: DataFrame): DataFrame = {
    val cls = df.asInstanceOf[classic.Dataset[Row]]
    cls.sparkSession.internalCreateDataFrame(
      cls.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Re-tag a streaming micro-batch DataFrame as a BATCH one — what a V1
    * `Sink.addBatch` needs before handing the rows to a batch writer (a
    * streaming-tagged Dataset refuses `.write`). Evaluates through the
    * batch's own query execution, so the rows are exactly the
    * micro-batch's. */
  def asBatch(df: DataFrame): DataFrame = {
    val cls = df.asInstanceOf[classic.Dataset[Row]]
    cls.sparkSession.internalCreateDataFrame(
      cls.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
