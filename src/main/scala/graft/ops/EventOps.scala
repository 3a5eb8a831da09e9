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

  /** Built-in session-window aggregation (`session_window`): dynamic
    * windows `[first_ts, last_ts + gap)` that merge while consecutive
    * events are at most `gapMinutes` apart — the boundary is INCLUSIVE
    * (an event landing exactly on the previous window's end extends the
    * session; spec-pinned), so the sessions are identical to
    * [[sessionize]]'s `diff > gap starts new` rule and one
    * gaps-and-islands mirror serves both formulations.
    *
    * Scale shape: ONE hash aggregation with merging session state — no
    * per-user window sort, partials merge map-side — so session
    * assembly cost tracks events per user, never corpus order; this is
    * also the exact aggregation Structured Streaming runs for
    * `session_window` with a watermark.
    */
  def sessionWindowStats(events: DataFrame, gapMinutes: Int = 10): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Ordered conversion funnel: for each user, the earliest `steps(0)`
    * event, then the earliest `steps(1)` event STRICTLY after it, and
    * so on; only users completing the whole sequence survive, with
    * per-step timestamps and the total conversion time in exact integer
    * microseconds.
    *
    * Each stage is one filtered min-aggregate joined back on user_id —
    * k small hash aggregations co-partitioned on one key, no windows,
    * no per-user event sort. The frontier frame shrinks at every stage
    * (only users still in the funnel), so AQE broadcasts it into the
    * next stage's join; cost is O(events of that step) per stage.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val tsCols = steps.map(s => s"t_$s")
    var acc = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as(tsCols.head))
    steps.indices.drop(1).foreach { i =>
      val next = events.filter(col("event_type") === steps(i))
        .select(col("user_id"), col("ts"))
      acc = acc.join(next, Seq("user_id"))
        .filter(col("ts") > col(tsCols(i - 1)))
        .groupBy(col("user_id") +: tsCols.take(i).map(col): _*)
        .agg(min("ts").as(tsCols(i)))
    }
    acc.withColumn("funnel_micros",
      unix_micros(col(tsCols.last)) - unix_micros(col(tsCols.head)))
  }

  /** Latest record per key — "dedupe to current state", the CDC-compact
    * / dbt-dedupe pattern: ONE max(struct) hash aggregate with the
    * ordering columns leading the struct. `orderCols` must form a total
    * order (include a unique id), so payload columns are never reached
    * by the comparison and the winner is deterministic. Map-side
    * combine, ≤1 row per key per task shuffled — never a window sort
    * over the corpus (the w4/smp2 heap argument, at k=1).
    */
  def latestPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "latestPerKey needs ordering columns")
    df.groupBy(keyCols.map(col): _*)
      .agg(max(struct((orderCols ++ payloadCols).map(col): _*)).as("m"))
      .select(keyCols.map(col) ++
        (orderCols ++ payloadCols).map(c => col(s"m.$c").as(c)): _*)
  }

  /** Session PATH analysis — the product-analytics staple next to
    * funnel/retention: the top-k navigation sequences, where a
    * session's path is its first `maxSteps` event types joined with
    * '>' in (ts, event_id) order (the deterministic order the whole
    * event family uses). Funnels test a HYPOTHESIZED sequence; paths
    * DISCOVER the sequences users actually take.
    *
    * Shape: [[sessionize]]'s per-user window, a rank filter that keeps
    * ≤ maxSteps rows per session BEFORE any collection (per-group state
    * is bounded by maxSteps, never session length), one ordered-struct
    * sort per session (≤ maxSteps elements), and a hash aggregate over
    * the path strings. Ties impossible: event_id is unique. */
  def topPaths(events: DataFrame, gapMinutes: Int = 30,
      maxSteps: Int = 5, k: Int = 20): DataFrame = {
    val bySession = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    sessionize(events, gapMinutes)
      .withColumn("step", row_number().over(bySession))
      .filter(col("step") <= maxSteps)
      .groupBy("user_id", "session_seq")
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(concat_ws(">",
        expr("transform(evs, e -> e.event_type)")).as("path"))
      .groupBy("path").agg(count(lit(1)).cast("long").as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Multi-touch ATTRIBUTION — the marketing-analytics staple: each
    * conversion's value is credited back to the user's touchpoint
    * events strictly before it within a lookback window, under four
    * standard models computed side by side: first-touch (100% to the
    * earliest touch), last-touch (100% to the latest), linear (equal
    * split), and position-based / U-shaped (40% first, 40% last, 20%
    * split over the middles; 100% / 50-50 when only one / two touches
    * exist). Ties on timestamp break by event id, so every model is
    * deterministic.
    *
    * All credit arithmetic is exact integers: conversion value in
    * micros, splits by integer `div` (truncating — matches DuckDB `//`
    * bit-for-bit, the gr1 contract), so the per-channel sums replay in
    * the oracle exactly; split remainders vanish (documented — at most
    * n-1 micro-units per conversion). Sums accumulate as exact
    * DECIMAL(38,0) and surface as double (the dsum convention — exact
    * below 2^53, which a per-channel micro sum stays under at any
    * plausible SF). Shape: one bounded range join on
    * user_id (touch strictly before conversion, within the window —
    * per-user event counts bound the fan-out), one count/min/max
    * aggregate per conversion (min/max of (ts, id) structs — no window
    * sort), one join back, one final hash aggregate. Credit sums widen
    * through DECIMAL(38,0) (DuckDB sums BIGINT as HUGEINT). */
  def attribution(
      events: DataFrame,
      touchTypes: Seq[String],
      conversionType: String,
      lookbackDays: Int): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val conv = events.filter(col("event_type") === conversionType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("t_conv"),
        round(col("value") * lit(1000000L)).cast("long").as("v_micro"))
    val touch = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts").as("t_touch"), col("event_type").as("channel"))
    val joined = conv.join(touch, Seq("user_id"))
      .filter(col("t_touch") < col("t_conv") &&
        col("t_touch") >= col("t_conv") - expr(s"INTERVAL $lookbackDays DAYS"))
    val perConv = joined.groupBy("conv_id")
      .agg(count(lit(1)).as("n_touches"),
        min(struct(col("t_touch"), col("touch_id"))).as("first_k"),
        max(struct(col("t_touch"), col("touch_id"))).as("last_k"))
    val k = struct(col("t_touch"), col("touch_id"))
    val n = col("n_touches")
    val v = col("v_micro")
    joined.join(perConv, Seq("conv_id"))
      .withColumn("first_micro", when(k === col("first_k"), v).otherwise(lit(0L)))
      .withColumn("last_micro", when(k === col("last_k"), v).otherwise(lit(0L)))
      .withColumn("linear_micro", expr("v_micro div n_touches"))
      .withColumn("position_micro",
        when(n === 1, v)
          .when(n === 2, expr("v_micro div 2"))
          .otherwise(
            when(k === col("first_k") || k === col("last_k"),
              expr("(v_micro * 2) div 5"))
              .otherwise(expr("(v_micro div 5) div (n_touches - 2)"))))
      .groupBy("channel")
      .agg(count(lit(1)).cast("long").as("n_credited"),
        sum(col("first_micro").cast(dec)).cast("double").as("first_touch_micro"),
        sum(col("last_micro").cast(dec)).cast("double").as("last_touch_micro"),
        sum(col("linear_micro").cast(dec)).cast("double").as("linear_micro"),
        sum(col("position_micro").cast(dec)).cast("double").as("position_micro"))
  }

  /** Weekly retention cohort matrix: users grouped by the ISO week of
    * their FIRST event (the cohort), counted in each later week they
    * were active, keyed by integer week offset. All integer/date-trunc
    * arithmetic — no floats anywhere. Two hash aggregates + one join on
    * user_id; the distinct (user, week) frame bounds the join at
    * users × weeks.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val cohort = events.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("activity_week"))
      .distinct()
    active.join(cohort, Seq("user_id"))
      .select(col("cohort_week"),
        expr("CAST(datediff(activity_week, cohort_week) div 7 AS BIGINT)").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      // one row per (user, activity_week) after the distinct, so the
      // plain count IS the distinct-user count per cell
      .agg(count(lit(1)).cast("long").as("n_users"))
  }
}
