package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the events table (ts, user_id, event_type,
  * value, props). Batch-first; the streaming variants live in
  * [[graft.streaming.EventStreams]] and share these column expressions.
  */
object EventOps {

  import ExactSums.dsum

  /** Tumbling-window aggregate keyed by (window_start, event_type).
    * Uses date_trunc so the output schema stays flat (a plain timestamp
    * column, not Spark's window struct) — friendlier to downstream SQL
    * engines and to the oracle compare.
    */
  def tumblingCounts(events: DataFrame, unit: String = "hour"): DataFrame =
    events
      .groupBy(date_trunc(unit, col("ts")).as("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value")
      )

  /** Sessionization: a new session starts after `gapMinutes` of user
    * inactivity. Classic two-window formulation — lag to mark boundaries,
    * running sum to number sessions — shuffles once on user_id and sorts
    * within partitions (both windows share the same partitioning, so
    * Catalyst plans a single exchange).
    */
  def sessionize(
      events: DataFrame,
      gapMinutes: Int = 30,
      orderCols: Seq[String] = Seq("ts", "event_id")
  ): DataFrame = {
    // tie-break on event_id so row order (hence lag) is deterministic even
    // with equal timestamps — required for oracle-exact reproducibility
    val byUser = Window.partitionBy("user_id").orderBy(orderCols.map(col): _*)
    val gapMicros = gapMinutes * 60L * 1000000L // compare in exact integer micros
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1).otherwise(0))
      .withColumn("session_seq", sum("new_session").over(byUser))
  }

  /** Per-session rollup on top of [[sessionize]]. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id", "session_seq")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value")
      )

  /** Extract a typed field from the JSON-ish props column. */
  def propsField(props: Column, field: String): Column =
    get_json_object(props, s"$$.$field")
}
