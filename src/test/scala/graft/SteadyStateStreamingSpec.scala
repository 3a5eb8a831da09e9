package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.streaming.EventStreams

/** Multi-batch STEADY-STATE streaming: the single-batch drains (st1-st4,
  * MultimodalStreamingSpec's file-source test) prove semantics against
  * batch oracles but never evict state mid-run — the whole input arrives
  * in one trigger and the watermark only moves at the end. These tests
  * drive the same real-events file source through THREE time-ordered
  * arrival waves, so the watermark advances between micro-batches and
  * eviction fires while the stream is still running — the contract that
  * keeps an unbounded 100 TB/day deployment's state bounded. Assertions:
  * state rows are REMOVED mid-stream (not at close), retained state stays
  * far below the cumulative group count, and the final results still
  * match the batch computation exactly.
  */
class SteadyStateStreamingSpec extends SparkSpec {
  import spark.implicits._

  private val srcDir = "/root/testdata/sf0.001"

  // the sf0.001 events span 2024-01-01..01-30; cut into three ~10-day
  // waves (time-ordered arrival, like any real ingest)
  private def waves(ev: DataFrame): Seq[DataFrame] = {
    val c1 = lit("2024-01-11").cast("timestamp")
    val c2 = lit("2024-01-21").cast("timestamp")
    Seq(
      ev.filter(col("ts") < c1),
      ev.filter(col("ts") >= c1 && col("ts") < c2),
      ev.filter(col("ts") >= c2))
  }

  private def writeWave(df: DataFrame, dir: java.nio.file.Path): Unit =
    df.coalesce(1).write.mode("append").parquet(dir.toString)

  private def stateRows(q: StreamingQuery): Long =
    Option(q.lastProgress).toSeq.flatMap(_.stateOperators.map(_.numRowsTotal)).sum

  private def rowsRemovedSoFar(q: StreamingQuery): Long =
    q.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum

  test("st1 shape: hourly aggregation evicts closed windows mid-stream and lands on the batch result") {
    val staged = java.nio.file.Files.createTempDirectory("steady_st1")
    val ev = Tables.events(spark, srcDir).cache()
    val Seq(w1, w2, w3) = waves(ev)
    writeWave(w1, staged) // schema must exist before the stream starts
    try {
      val stream = EventStreams.eventParquetStream(spark, staged.toString)
      val q = EventStreams.hourlyCounts(stream, watermarkDelay = "2 hours")
        .writeStream.format("memory").queryName("steady_st1")
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        val stateAfterW1 = stateRows(q)
        writeWave(w2, staged)
        q.processAllAvailable()
        // wave 2's watermark (its max ts - 2h) is ~10 days past every
        // wave-1 window: they must be emitted AND removed MID-STREAM
        assert(rowsRemovedSoFar(q) > 0,
          "watermark eviction must fire between waves, not at close")
        writeWave(w3, staged)
        q.processAllAvailable()
        val totalGroups = graft.ops.EventOps.tumblingCounts(ev, "hour").count()
        val retained = stateRows(q)
        assert(retained < totalGroups / 4,
          s"state must hold only in-horizon windows: $retained of $totalGroups groups retained")
        assert(stateAfterW1 < totalGroups / 2,
          s"wave-1 state must not pre-accumulate the whole run: $stateAfterW1")
        // a far-future closer flushes the trailing open windows, then the
        // emitted set must equal the batch aggregate exactly
        val sentinel = Seq((999999L, Timestamp.valueOf("2024-03-15 00:00:00"),
          -1L, "sentinel", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        writeWave(sentinel.select(ev.columns.map(col): _*), staged)
        q.processAllAvailable()
        val streamed = spark.table("steady_st1")
          .filter(col("event_type") =!= "sentinel")
          .select("window_start", "event_type", "n_events", "total_value")
          .as[(Timestamp, String, Long, Double)].collect().toSet
        val batch = graft.ops.EventOps.tumblingCounts(ev, "hour")
          .select("window_start", "event_type", "n_events", "total_value")
          .as[(Timestamp, String, Long, Double)].collect().toSet
        assert(streamed === batch,
          s"steady-state drain must equal batch: ${streamed.size} vs ${batch.size} groups")
      } finally q.stop()
    } finally {
      ev.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
    }
  }

  test("drainWithStateMeter attributes st4 growth: peak bounded by the horizon's input share, final state evicted") {
    // the 10×-rehearsal attribution tool (VERDICT: is st4's sf1 growth
    // output rows or state?): the meter must report (peak, final) state
    // rows per operator, with peak bounded by the input the watermark
    // horizon can hold and final ~evicted once the closing sentinel
    // pushes the watermark past every window — a peak growing FASTER
    // than input at 10× would mean eviction stopped, the one failure
    // mode the meter exists to catch.
    val staged = java.nio.file.Files.createTempDirectory("steady_meter")
    val ev = Tables.events(spark, srcDir).cache()
    try {
      writeWave(ev, staged)
      val sentinel = Seq((999999L, Timestamp.valueOf("2024-03-15 00:00:00"),
        -1L, "sentinel", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      writeWave(sentinel.select(ev.columns.map(col): _*), staged)
      val stream = EventStreams.eventParquetStream(spark, staged.toString)
      val joined = EventStreams.leftOuterIntervalJoinStream(
        stream, stream, "user_id", "ts", "event_id",
        withinSeconds = 300L, watermarkDelay = "1 hour")
      val q = EventStreams.runToMemory(joined, "steady_meter", "append")
      val meter = EventStreams.drainWithStateMeter(q)
      assert(meter.nonEmpty, "a stream-stream join must report a state operator")
      val n = ev.count()
      meter.foreach { case (name, peak, fin) =>
        assert(peak > 0, s"$name: the join must have held state at some point")
        // both sides' state ≤ all events ever seen (plus the sentinel);
        // the real bound is the horizon's share — at this scale the whole
        // input fits one horizon, so 2n + slack is the sound ceiling
        assert(peak <= 2 * n + 16,
          s"$name peak state $peak exceeds both sides' input $n — eviction broken")
        assert(fin <= peak, s"$name final $fin above peak $peak")
        assert(fin < n / 2,
          s"$name final state $fin not evicted after the closing sentinel")
      }
      assert(EventStreams.lastStateMeter === meter,
        "profiling harnesses read the same meter the drain returned")
    } finally {
      ev.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
    }
  }

  test("st4 shape: left-outer interval join evicts join state mid-stream and lands on the batch left join") {
    val staged = java.nio.file.Files.createTempDirectory("steady_st4")
    val ev = Tables.events(spark, srcDir).cache()
    val Seq(w1, w2, w3) = waves(ev)
    writeWave(w1, staged)
    try {
      val stream = EventStreams.eventParquetStream(spark, staged.toString)
      val joined = EventStreams.leftOuterIntervalJoinStream(
        stream, stream, "user_id", "ts", "event_id",
        withinSeconds = 300L, watermarkDelay = "1 hour")
      val q = joined.writeStream.format("memory").queryName("steady_st4")
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        val peakAfterW1 = stateRows(q)
        writeWave(w2, staged)
        q.processAllAvailable()
        assert(rowsRemovedSoFar(q) > 0,
          "join state eviction must fire between waves, not at close")
        writeWave(w3, staged)
        q.processAllAvailable()
        // both sides' state is watermark-bounded: far below total rows ever
        // streamed (2 sides x 1000 events), and bounded by the per-horizon
        // volume regardless of how many waves went past
        val retained = stateRows(q)
        assert(retained < 500,
          s"join state must stay within the watermark horizon: $retained rows")
        assert(peakAfterW1 < 1500, s"wave-1 state unexpectedly large: $peakAfterW1")
        val sentinel = Seq((999999L, Timestamp.valueOf("2024-03-15 00:00:00"),
          -1L, "sentinel", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        writeWave(sentinel.select(ev.columns.map(col): _*), staged)
        q.processAllAvailable()
        val streamed = spark.table("steady_st4")
          .filter(col("user_id") >= 0) // drop the sentinel's own NULL row
          .select("user_id", "l_id", "r_id")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
        val l = ev.select(col("user_id").as("k"), col("ts").as("l_ts"), col("event_id").as("l_id"))
        val r = ev.select(col("user_id").as("k2"), col("ts").as("r_ts"), col("event_id").as("r_id"))
        val batch = l.join(r,
            col("k") === col("k2") && col("r_ts") > col("l_ts") &&
              col("r_ts") <= col("l_ts") + expr("INTERVAL 300 SECONDS"), "left_outer")
          .select(col("k"), col("l_id"), coalesce(col("r_id"), lit(-1L)).as("r_id"))
          .as[(Long, Long, Long)].collect().toSet
        assert(streamed === batch,
          s"steady-state left join must equal batch: ${streamed.size} vs ${batch.size} rows")
      } finally q.stop()
    } finally {
      ev.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
    }
  }
}
