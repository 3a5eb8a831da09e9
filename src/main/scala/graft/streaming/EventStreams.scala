package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Per-event session input for [[EventStreams.sessionizeStream]].
  * Top-level (not nested in the object): Janino-generated encoder code
  * fails to resolve accessor methods on object-nested case classes.
  */
final case class StreamEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)

/** Emitted when a session closes (watermark passes gap timeout). */
final case class ClosedSession(
    user_id: Long,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp,
    n_events: Long,
    total_value: Double)

/** One open session per user held in the state store. */
final case class OpenSession(start: Long, end: Long, n: Long, total: Double)

/** Structured Streaming surface over the events schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming (SURVEY.md §2.7) — this is the §7.4
  * extension: the same event-time semantics as
  * [[graft.ops.EventOps]], expressed incrementally. Watermarks bound
  * state so a 100 TB/day stream holds only the open windows/sessions in
  * the state store, never history.
  */
object EventStreams {

  /** Tumbling one-hour event-time aggregation with a watermark.
    * Late data beyond `watermarkDelay` is dropped; state for closed
    * windows is evicted — bounded memory regardless of stream length.
    */
  def hourlyCounts(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming sessionization via flatMapGroupsWithState: the incremental
    * twin of [[graft.ops.EventOps.sessionize]]. State per user is one open
    * session (O(users) state, evicted on event-time timeout = the session
    * gap), sessions are emitted when closed by a gap or timeout.
    */
  def sessionizeStream(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int = 30,
      watermarkDelay: String = "1 hour"
  ): DataFrame = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .selectExpr("event_id", "ts", "user_id", "value")
      .as[StreamEvent]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[StreamEvent], state: GroupState[OpenSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the gap: close and emit the open session
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t >= s.start - gapMs && t - s.end <= gapMs =>
                  // within the gap of either end (late events may extend the
                  // session BACKWARDS, matching the batch operator)
                  cur = Some(s.copy(start = math.min(s.start, t), end = math.max(s.end, t),
                    n = s.n + 1, total = s.total + e.value))
                case Some(s) if t > s.end =>
                  // a gap after the open session: close it, start fresh
                  closed ::= ClosedSession(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.total)
                  cur = Some(OpenSession(t, t, 1, e.value))
                case Some(_) =>
                  // late event disjoint BEFORE the open session: without
                  // buffering it cannot merge with still-later arrivals, so
                  // emit it as its own session (bounded by the watermark)
                  closed ::= ClosedSession(userId, e.ts, e.ts, 1, e.value)
                case None =>
                  cur = Some(OpenSession(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
      .toDF()
  }

  /** Stream-stream interval join: for each left event, all right events
    * with the same key arriving within `withinSeconds` AFTER it.
    *
    * Both sides carry watermarks, and the time-range predicate bounds how
    * long either side's state can matter — Spark derives state-eviction
    * watermarks from exactly this (watermark + interval) arithmetic, so
    * state is O(events per horizon) on both sides, never unbounded.
    */
  def intervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      idCol: String,
      withinSeconds: Long,
      watermarkDelay: String = "1 hour"
  ): DataFrame = {
    val l = left.select(
      col(keyCol).as("k"), col(timeCol).as("l_ts"), col(idCol).as("l_id"))
      .withWatermark("l_ts", watermarkDelay)
    val r = right.select(
      col(keyCol).as("k2"), col(timeCol).as("r_ts"), col(idCol).as("r_id"))
      .withWatermark("r_ts", watermarkDelay)
    l.join(r,
      col("k") === col("k2") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(col("k").as(keyCol), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** Streaming exact dedup on an id column: duplicates arriving within the
    * watermark horizon are dropped; state for ids older than the watermark
    * is evicted (`dropDuplicatesWithinWatermark`), so state is O(ids per
    * horizon), not O(all ids ever) — the only viable contract for an
    * unbounded 100 TB/day stream.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String], watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** File-source convenience: stream a directory of event parquet files
    * through [[hourlyCounts]] into an in-memory table. Handles the
    * testdata's TIMESTAMP(NANOS) parquet the same way Tables.events does:
    * read nanos as long, convert with exact integer division.
    */
  def runHourlyFromParquet(
      spark: SparkSession,
      inputDir: String,
      queryName: String
  ): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(inputDir).schema
    val raw = spark.readStream.schema(schema).parquet(inputDir)
    val stream =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      else raw
    hourlyCounts(stream).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
