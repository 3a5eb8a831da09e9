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

  /** Streaming session windows via the BUILT-IN `session_window`
    * aggregate — the merging-state complement of [[sessionizeStream]]'s
    * explicit flatMapGroupsWithState: watermarked append-mode
    * aggregation; a session emits exactly once, when the watermark
    * passes its close (last event + gap), and its state evicts. Sessions
    * still open merge with in-gap arrivals across micro-batches
    * (spec-pinned). Same columns as the batch
    * [[graft.ops.EventOps.sessionWindowStats]], so a full drain answers
    * the same oracle.
    */
  def sessionWindowStream(
      events: DataFrame,
      gapMinutes: Int = 10,
      watermarkDelay: String = "60 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        graft.ops.ExactSums.dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

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
        graft.ops.ExactSums.dsum(col("value")).as("total_value"))
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
      .filter(col("ts").isNotNull) // a NULL ts sails past the watermark filter and would NPE below
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
            // interval-merge the open session with ALL batch events at once
            // (the batch operator's semantics): sort intervals by start and
            // merge neighbors within the gap — late events inside one batch
            // group together instead of each becoming a singleton session
            val singles = batch.map(e => OpenSession(e.ts.getTime, e.ts.getTime, 1, e.value)).toList
            val intervals = (state.getOption.toList ++ singles).sortBy(s => (s.start, s.end))
            val merged = intervals.foldLeft(List.empty[OpenSession]) {
              case (cur :: done, s) if s.start - cur.end <= gapMs =>
                cur.copy(end = math.max(cur.end, s.end), n = cur.n + s.n, total = cur.total + s.total) :: done
              case (acc, s) => s :: acc
            }.reverse
            // the latest interval stays open (future events may extend it);
            // earlier disjoint ones can no longer merge forward — close them.
            // (A still-later arrival that would bridge two closed sessions is
            // the documented buffering-free limitation, bounded by the
            // watermark.)
            val open = merged.last
            state.update(open)
            state.setTimeoutTimestamp(open.end + gapMs)
            merged.init.iterator.map(s =>
              ClosedSession(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.total))
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
    *
    * PERF CLOSE-OUT (round 4, after three rounds of tuning — do not
    * re-litigate): the bench drain's cost is FIXED streaming machinery,
    * not this operator. Measured min-of-3 across scale factors:
    * sf0.001 → 2.36 s, sf0.01 → 2.78 s, sf0.1 → 3.08 s, i.e. ~2.3 s on
    * near-zero data (state-store init for 8 partitions × both sides,
    * checkpoint-dir I/O, streaming-query lifecycle) plus ~0.7 s of
    * data-dependent join work at sf0.1 — which matches the BATCH range
    * join on the same data (rj1: 0.73 s). The join computation is at
    * batch parity; a custom stateful operator (transformWithState or a
    * drain-tuned StateStoreProvider) would shave only the machinery
    * constant, which a real deployment amortizes over an unbounded
    * stream. Earlier measured do-not-retries: state sizing (8 stores not
    * 32), bucketed equi-key (5×), RocksDB provider (15× worse on the
    * drain), right-side replication (~5% slower single-batch).
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
    // same coarse-bucket trick as the batch TemporalOps.rangeSelfJoin: the
    // join key is (key, time bucket). The stream-stream join's state
    // lookup is per equi-key, so without the bucket every probe scans ALL
    // stored rows of that key within the watermark horizon; with it,
    // candidates are bounded per bucket — measured 5× on the bench drain.
    // Which side to replicate into the two reachable buckets was
    // MEASURED, not assumed: replicating the right (each right row into
    // its own bucket and the one before) would halve state-SECONDS under
    // steady-state arrival, because left rows are retained
    // `withinSeconds` past the watermark awaiting matches while right
    // rows evict as soon as the watermark passes them. But on the
    // single-batch drain this bench exercises, nothing evicts mid-run,
    // the volume is symmetric, and the right-replication variant
    // measured ~5% SLOWER (6.40-6.44 s vs 6.08 s min-of-3 at sf0.1) —
    // so left replication ships; flip this for a long-running
    // steady-state deployment where eviction dominates
    val micros = withinSeconds * 1000000L
    val l = left.select(
      col(keyCol).as("k"), col(timeCol).as("l_ts"), col(idCol).as("l_id"))
      .withColumn("bucket", explode(array(
        (unix_micros(col("l_ts")) / micros).cast("long"),
        (unix_micros(col("l_ts")) / micros).cast("long") + 1)))
      .withWatermark("l_ts", watermarkDelay)
    val r = right.select(
      col(keyCol).as("k2"), col(timeCol).as("r_ts"), col(idCol).as("r_id"))
      .withColumn("bucket2", (unix_micros(col("r_ts")) / micros).cast("long"))
      .withWatermark("r_ts", watermarkDelay)
    l.join(r,
      col("k") === col("k2") && col("bucket") === col("bucket2") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(col("k").as(keyCol), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** LEFT OUTER stream-stream interval join: matched pairs emit as both
    * sides arrive; a left row with NO right row in its window emits
    * NULL-padded once the watermark proves the window can never fill
    * (watermark > l_ts + withinSeconds). The NULL emission is therefore
    * watermark-DRIVEN: a drain must push the watermark past every left
    * row's window (sentinel event or closing batch) or trailing unmatched
    * rows stay in state — st4 does exactly that.
    *
    * Deliberately NOT bucket-accelerated like [[intervalJoinStream]]: the
    * bucket trick replicates each left row into two join keys, and an
    * outer join would emit one NULL row per UNMATCHED REPLICA (duplicates,
    * plus spurious NULLs when only one replica matches). Outer semantics
    * need the true key, so probes scan the key's in-horizon state — the
    * watermark still bounds state size.
    */
  def leftOuterIntervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      idCol: String,
      withinSeconds: Long,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.select(
      col(keyCol).as("k"), col(timeCol).as("l_ts"), col(idCol).as("l_id"))
      .withWatermark("l_ts", watermarkDelay)
    val r = right.select(
      col(keyCol).as("k2"), col(timeCol).as("r_ts"), col(idCol).as("r_id"))
      .withWatermark("r_ts", watermarkDelay)
    l.join(r,
      col("k") === col("k2") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinSeconds SECONDS"),
      "left_outer")
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

  /** File-source event stream over a parquet directory. Handles the
    * testdata's TIMESTAMP(NANOS) parquet the same way Tables.events does:
    * read nanos as long, convert with exact integer division.
    */
  def eventParquetStream(spark: SparkSession, inputDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // read micros as TIMESTAMP (LTZ), not NTZ — same normalization as
    // Tables.load (watermarks/interval joins are built on the LTZ type)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val schema = spark.read.parquet(inputDir).schema
    val raw = spark.readStream.schema(schema).parquet(inputDir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else raw
  }

  /** Run a transformed stream into an in-memory table, draining all
    * available input (AvailableNow). */
  def runToMemory(df: DataFrame, queryName: String, outputMode: String): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Per-operator state meter of a drained query: (operatorName,
    * peak numRowsTotal across batches, final numRowsTotal). The scale
    * attribution tool for stateful drains (st4's 10× growth question):
    * OUTPUT-proportional growth is the data's, benign; PEAK-state
    * growth beyond the watermark horizon's share of the input means
    * eviction stopped working and the watermark delay needs tightening;
    * a FINAL state near zero proves the drain's closing watermark
    * advance (sentinel or real arrivals) evicted everything it should.
    * Also recorded in [[lastStateMeter]] for profiling harnesses. */
  def drainWithStateMeter(q: StreamingQuery): Seq[(String, Long, Long)] = {
    q.awaitTermination()
    val progs = q.recentProgress.toSeq
    val meter = progs.flatMap(_.stateOperators.toSeq.map(so =>
        (so.operatorName, so.numRowsTotal)))
      .groupBy(_._1)
      .map { case (n, rows) => (n, rows.map(_._2).max,
        progs.last.stateOperators.toSeq.collectFirst {
          case so if so.operatorName == n => so.numRowsTotal
        }.getOrElse(0L)) }
      .toSeq.sortBy(_._1)
    lastStateMeter = meter
    meter
  }

  /** The most recent [[drainWithStateMeter]] reading — profiling
    * harnesses read it after a bench key drains internally. */
  @volatile private[graft] var lastStateMeter: Seq[(String, Long, Long)] = Nil

  /** Convenience: hourly counts from an event parquet directory. */
  def runHourlyFromParquet(
      spark: SparkSession,
      inputDir: String,
      queryName: String
  ): StreamingQuery =
    runToMemory(hourlyCounts(eventParquetStream(spark, inputDir)), queryName, "append")
}
