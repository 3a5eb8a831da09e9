package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{ClassifyOps, ContaminationOps, DedupOps, EventOps, LakeOps, PackOps, QuantizeOps, SampleOps, SimilarityOps, TextOps}
import graft.EntryHelpers._

/** Driver-contract keys — event-time + Structured Streaming family: windows, sessions, funnels, stream joins, changefeed mirrors.
  *
  * Mechanically split out of SparkEntry (round 15) with ZERO behavior
  * change: entries are verbatim; [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] concatenate the families. Shared helper
  * builders live in [[EntryHelpers]].
  */
private[graft] object StreamKeys {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e4_sliding_window" -> ((s, dir) =>
      // 1h windows sliding every 30min: window() explodes each event into
      // its two containing windows — flattened to window_start
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value"))),

    "e1_tumbling_window" -> ((s, dir) => EventOps.tumblingCounts(t(s, dir, "events"), "hour")),

    "e2_sessions" -> ((s, dir) => EventOps.sessionStats(t(s, dir, "events"), gapMinutes = 30)),

    "e3_json_extract" -> ((s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        EventOps.propsField(col("props"), "k").cast("long").as("k_value"))),

    "e10_path_analysis" -> ((s, dir) =>
      // top-20 session paths (first 5 event types per 30-min session,
      // '>'-joined in (ts, event_id) order): funnels test a hypothesized
      // sequence, paths DISCOVER what users actually do. Rank-filter
      // bounds per-session state to 5 rows before any collection.
      EventOps.topPaths(t(s, dir, "events"),
        gapMinutes = 30, maxSteps = 5, k = 20)),

    "st7_stream_static_enrich" -> ((s, dir) => {
      // the third join mode beside st2/st4's stream-stream: STREAM-STATIC
      // enrichment — each micro-batch joins the static dimension with no
      // streaming state at all (the dimension broadcasts per batch; no
      // watermark needed on the static side). The classic shape: events
      // enriched with a user-tier dimension, aggregated per tier. The
      // oracle is the batch equivalent of the same join+aggregate.
      val staged = java.nio.file.Files.createTempDirectory("st7_events")
      staged.toFile.deleteOnExit()
      val copied = staged.resolve("part-0.parquet")
      copied.toFile.deleteOnExit()
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // static dimension: deterministic user tiers derived from customer
      // keys (c_custkey % 3) — a genuine second table on the join's
      // static side, not a projection of the stream
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"),
          concat(lit("tier_"), (col("c_custkey") % 3).cast("string")).as("tier"))
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val enriched = stream.join(dim, Seq("user_id"))
          .groupBy("tier")
          .agg(count(lit(1)).cast("long").as("n_events"),
            dsum(col("value")).as("total_value"))
        val q = graft.streaming.EventStreams.runToMemory(enriched, "st7_enrich", "complete")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
      s.table("st7_enrich")
    }),

    "st5_manifest_stream" -> ((s, dir) => {
      // the streaming CDC source over the manifest log (sources/
      // ManifestStream): three committed versions drain through
      // readStream with manifest VERSIONS as offsets, aggregated in
      // Complete mode — the result must hash-match the batch aggregate
      // over everything the three versions shipped. Offsets-as-versions
      // is what makes the source prefix-deterministic (immutable files,
      // immutable manifests), the property exactly-once rides on.
      val root = java.nio.file.Files.createTempDirectory("st5_manifest")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.filter(col("o_orderstatus") === "F"))
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderstatus") === "O"))
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderstatus") === "P"))
      // same state-store sizing note as st1: 3 grouping keys
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val stream = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .load(root.toString)
        val agg = stream.groupBy("o_orderstatus")
          .agg(count(lit(1)).cast("long").as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"))
        val q = graft.streaming.EventStreams.runToMemory(agg, "st5_manifest", "complete")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
      s.table("st5_manifest")
    }),

    "st6_manifest_replicate" -> ((s, dir) => {
      // exactly-once table-to-table streaming replication: manifest
      // source (versions as offsets) piped into the manifest SINK
      // (appendIdempotent — the batchId watermark rides the same atomic
      // publish as the data). The replica is then read BATCH-wise and
      // must hash-match the oracle over everything the source shipped.
      val srcRoot = java.nio.file.Files.createTempDirectory("st6_src")
      val dstRoot = java.nio.file.Files.createTempDirectory("st6_dst")
      val ckpt = java.nio.file.Files.createTempDirectory("st6_ckpt")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, srcRoot.toString,
        orders.filter(col("o_orderstatus") === "F"))
      graft.sources.ManifestTable.append(s, srcRoot.toString,
        orders.filter(col("o_orderstatus") === "O"))
      graft.sources.ManifestTable.append(s, srcRoot.toString,
        orders.filter(col("o_orderstatus") === "P"))
      val q = s.readStream
        .format("graft.sources.ManifestStreamSourceProvider")
        .load(srcRoot.toString)
        .writeStream
        .format("graft.sources.ManifestStreamSinkProvider")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dstRoot.toString)
      q.awaitTermination()
      graft.sources.ManifestTable.read(s, dstRoot.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
    }),

    "st9_stream_cdc_upsert" -> ((s, dir) => {
      // streaming CDC upsert: a change stream (updates to existing F
      // orders + O-order inserts) drains through foreachBatch, each
      // micro-batch MERGED by key into the base manifest table with the
      // txn watermark riding the same atomic commit (mergeIdempotent).
      // maxFilesPerTrigger=1 forces multiple batches; upsert semantics
      // make the final state independent of the batch split (each key
      // appears once across the whole change set). A crash-replay of
      // the full change set is then re-delivered and must be a NO-OP —
      // pinned into the face.
      val root = java.nio.file.Files.createTempDirectory("st9_base").toString
      val updDir = java.nio.file.Files.createTempDirectory("st9_upd").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st9_ckpt").toString
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root,
        orders.filter(col("o_orderstatus") === "F").repartition(2),
        statsColumns = Seq("o_orderkey"))
      val updates = orders.filter(col("o_orderstatus") === "F")
        .filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(col("o_orderstatus") === "O"))
      updates.repartition(2).write.mode("overwrite").parquet(updDir)
      val q = s.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1).parquet(updDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.sources.ManifestTable.mergeIdempotent(
            s, root, batch, "o_orderkey", "cdc", id,
            statsColumns = Seq("o_orderkey"))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val vBefore = graft.sources.ManifestTable.versions(s, root).max
      graft.sources.ManifestTable.mergeIdempotent(
        s, root, s.read.parquet(updDir), "o_orderkey", "cdc", 0L)
      val replayNoop = graft.sources.ManifestTable.versions(s, root).max == vBefore
      graft.sources.ManifestTable.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(replayNoop).as("replay_noop"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st10_changefeed_mirror" -> ((s, dir) => {
      // the delete-aware streaming pipeline end-to-end: the changeFeed
      // source streams deletion-vector diffs as tagged retractions
      // (where the plain source REFUSES past a MOR delete), and
      // applyChangesMor lands each micro-batch in ONE atomic commit —
      // grown vector + appended files + exactly-once watermark. Three
      // stream passes over an evolving source (initial load; a MOR
      // delete + an append; a second stacked delete spanning both), a
      // checkpointed restart between each; the mirror must equal the
      // source at every quiesce and a re-delivered batchId must not
      // commit. Steady-state cost tracks the CHANGE rate: each batch
      // reads only appended files plus the files the vector diff names.
      val src = java.nio.file.Files.createTempDirectory("st10_src").toString
      val dst = java.nio.file.Files.createTempDirectory("st10_dst").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st10_ckpt").toString
      val orders = t(s, dir, "orders")
      val f = orders.filter(col("o_orderstatus") === "F")
      graft.sources.ManifestTable.create(s, src, f)
      graft.sources.ManifestTable.create(s, dst, f.limit(0))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .option("changeFeed", "true").load(src)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            graft.sources.ManifestTable.applyChangesMor(
              s, dst, b, "o_orderkey", "mirror", id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial load (whole table tagged insert)
      graft.sources.ManifestTable.deleteMor(s, src, col("o_orderkey") % 3 === 0)
      graft.sources.ManifestTable.append(s, src,
        orders.filter(col("o_orderstatus") === "O"))
      drain() // retractions + inserts in one window
      graft.sources.ManifestTable.deleteMor(s, src, col("o_custkey") % 7 === 0)
      drain() // stacked delete spanning base and appended rows
      val tip = graft.sources.ManifestTable.versions(s, dst).max
      val watermark = graft.sources.ManifestTable
        .manifestMeta(s, dst, tip)("txn-mirror").toLong
      // crash-replay: re-deliver the last batchId — must not commit
      val vNoop = graft.sources.ManifestTable.applyChangesMor(s, dst,
        f.limit(0).withColumn("_change_type", lit("insert")),
        "o_orderkey", "mirror", watermark)
      val srcDf = graft.sources.ManifestTable.read(s, src)
      val dstDf = graft.sources.ManifestTable.read(s, dst)
      val mirrors = multisetEqual(dstDf, srcDf)
      dstDf.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(mirrors).as("mirrors_source"),
          lit(vNoop == tip).as("replay_noop"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st13_mirror_refresh" -> ((s, dir) => {
      // stream recovery ACROSS a refusal — st10's one operational hole
      // closed: an OVERWRITE window is not delta-expressible, and the
      // plain change feed kills the query there by design. Under
      // `onRefusal=refresh` the restarted stream drains that window as
      // ONE atomic 'refresh' batch (applyChangesMor lands it as a
      // watermarked overwrite), and the NEXT window resumes
      // incrementally — pins: the mirror equals the source at every
      // quiesce, exactly one apply-refresh commit in the mirror's
      // history, and the post-refresh delete window applied as a delta.
      val src = java.nio.file.Files.createTempDirectory("st13_src").toString
      val dst = java.nio.file.Files.createTempDirectory("st13_dst").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st13_ckpt").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val f = orders.filter(col("o_orderstatus") === "F")
      MT.create(s, src, f)
      MT.create(s, dst, f.limit(0))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .option("changeFeed", "true").option("onRefusal", "refresh").load(src)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            MT.applyChangesMor(s, dst, b, "o_orderkey", "mirror", id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial load
      MT.append(s, src, orders.filter(col("o_orderstatus") === "O"))
      drain() // incremental append window
      val m1 = {
        val srcDf = MT.read(s, src); val dstDf = MT.read(s, dst)
        multisetEqual(dstDf, srcDf)
      }
      MT.overwrite(s, src, orders.filter(col("o_orderstatus") === "P"))
      drain() // refusal window → one atomic refresh
      val m2 = {
        val srcDf = MT.read(s, src); val dstDf = MT.read(s, dst)
        multisetEqual(dstDf, srcDf)
      }
      MT.deleteMor(s, src, col("o_orderkey") % 4 === 0)
      drain() // post-refresh window resumes incrementally
      val ops = MT.history(s, dst).map(_.operation)
      val oneRefresh = ops.count(_ == "apply-refresh") == 1
      val lastIncremental = ops.last == "apply-changes"
      val dstDf = MT.read(s, dst)
      dstDf.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(m1 && m2).as("mirrors_at_quiesce"),
          lit(oneRefresh).as("one_refresh_commit"),
          lit(lastIncremental).as("resumes_incremental"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st14_rowid_mirror" -> ((s, dir) => {
      // identity-keyed mirroring (the Delta row-tracking consumer
      // contract): with `includeRowIds=true` the change feed exposes
      // the immutable `_row_id`, and the mirror applies changes keyed
      // on IDENTITY instead of a business key — the only sound binding
      // when business keys are NON-UNIQUE. The source holds every F
      // order TWICE (copy B repriced +1e6); a window deletes ONLY copy
      // B of every third key (a business-key-bound delete would kill
      // copy A too) with an OPTIMIZE mid-window (empty delta under
      // ids); then an O append. Pins: the mirror equals the source
      // exactly, duplicates included, copy-A survivors intact.
      val src = java.nio.file.Files.createTempDirectory("st14_src").toString
      val dst = java.nio.file.Files.createTempDirectory("st14_dst").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st14_ckpt").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val f = orders.filter(col("o_orderstatus") === "F")
      val dup = f.unionByName(
        f.withColumn("o_totalprice", col("o_totalprice") + 1000000.0))
      MT.create(s, src, dup.repartition(3))
      MT.enableRowTracking(s, src)
      MT.create(s, dst, MT.readWithRowIds(s, src).limit(0))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .option("changeFeed", "true").option("includeRowIds", "true").load(src)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            MT.applyChangesMor(s, dst, b, "_row_id", "mirror", id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial load: both copies of every key
      MT.deleteMor(s, src,
        col("o_totalprice") > 1000000.0 && col("o_orderkey") % 3 === 0)
      MT.compact(s, src, 64L * 1024 * 1024) // empty delta under ids
      drain()
      MT.append(s, src, orders.filter(col("o_orderstatus") === "O"))
      drain()
      val srcDf = MT.read(s, src)
      val dstDf = MT.read(s, dst).drop("_row_id")
      val mirrors = multisetEqual(dstDf, srcDf)
      dstDf.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(mirrors).as("mirrors_with_duplicates"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st11_changefeed_optimize" -> ((s, dir) => {
      // the change feed SURVIVING OPTIMIZE: with row tracking on, a
      // compaction mid-window is a provably EMPTY delta (ids verify
      // every row survived), so the mirror pipeline that st10 runs keeps
      // draining where the positional feed refuses. The window holds a
      // MOR delete, then a COMPACT that rewrites every file (positions
      // all move — the netting is id-based), then an append; one
      // checkpointed restart between passes.
      val src = java.nio.file.Files.createTempDirectory("st11_src").toString
      val dst = java.nio.file.Files.createTempDirectory("st11_dst").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st11_ckpt").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val f = orders.filter(col("o_orderstatus") === "F")
      MT.create(s, src, f.repartition(4))
      MT.enableRowTracking(s, src)
      MT.create(s, dst, f.limit(0))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .option("changeFeed", "true").load(src)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            MT.applyChangesMor(s, dst, b, "o_orderkey", "mirror", id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial load
      MT.deleteMor(s, src, col("o_orderkey") % 3 === 0)
      MT.compact(s, src, 64L * 1024 * 1024) // all positions move
      MT.append(s, src, orders.filter(col("o_orderstatus") === "O"))
      drain()
      val srcDf = MT.read(s, src)
      val dstDf = MT.read(s, dst)
      val mirrors = multisetEqual(dstDf, srcDf)
      dstDf.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(mirrors).as("mirrors_source"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st12_changefeed_merge" -> ((s, dir) => {
      // the change feed is now TOTAL under row tracking short of
      // OVERWRITE: a window holding a MERGE upsert (repriced F rows +
      // O inserts, st9's change set) AND a full COMPACT streams as the
      // merge's id-diff (delete old version + insert new) while the
      // compact contributes a verified-empty delta — the mirror applies
      // it all through applyChangesMor and must equal the source.
      val src = java.nio.file.Files.createTempDirectory("st12_src").toString
      val dst = java.nio.file.Files.createTempDirectory("st12_dst").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st12_ckpt").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val f = orders.filter(col("o_orderstatus") === "F")
      MT.create(s, src, f.repartition(2))
      MT.enableRowTracking(s, src)
      MT.create(s, dst, f.limit(0))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .option("changeFeed", "true").load(src)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            MT.applyChangesMor(s, dst, b, "o_orderkey", "mirror", id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial load
      val updates = f.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(col("o_orderstatus") === "O"))
      MT.merge(s, src, updates, "o_orderkey")
      MT.compact(s, src, 64L * 1024 * 1024) // empty delta, positions move
      drain()
      val srcDf = MT.read(s, src)
      val dstDf = MT.read(s, dst)
      val mirrors = multisetEqual(dstDf, srcDf)
      dstDf.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(mirrors).as("mirrors_source"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st1_stream_hourly" -> ((s, dir) => {
      // Structured Streaming under the SAME oracle as batch e1: drain the
      // events parquet through a file-source stream, aggregate in Complete
      // mode (all windows retained), return the result table — must
      // hash-match DuckDB exactly like the batch tumbling aggregate
      val staged = java.nio.file.Files.createTempDirectory("st1_events")
      staged.toFile.deleteOnExit()
      val copied = staged.resolve("part-0.parquet")
      copied.toFile.deleteOnExit()
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // stateful-stream shuffle width = state-store count; size it to the
      // key cardinality (24h × few event types), not the batch shuffle
      // width — 32 near-empty state stores would pay 4× the checkpoint IO.
      // NOTE: this set/restore mutates SESSION-global conf, which is safe
      // because the driver contract runs queries sequentially on one
      // session; concurrent execution would need spark.newSession() here
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val q = graft.streaming.EventStreams.runToMemory(
          EventOps.tumblingCounts(stream, "hour"), "st1_hourly", "complete")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
      s.table("st1_hourly")
    }),

    "st3_stream_update" -> ((s, dir) => {
      // the third output mode (st1 Complete, st2 Append): update-mode
      // aggregation emits only groups REVISED by each batch. An
      // AvailableNow drain of one file is a single batch, so every group
      // is revised exactly once and the result answers to the same batch
      // oracle — the multi-batch re-emission and late-drop semantics are
      // pinned by the update-mode spec in MultimodalStreamingSpec
      val staged = java.nio.file.Files.createTempDirectory("st3_events")
      staged.toFile.deleteOnExit()
      val copied = staged.resolve("part-0.parquet")
      copied.toFile.deleteOnExit()
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8") // state-store sizing, see st1
      try {
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val q = graft.streaming.EventStreams.runToMemory(
          EventOps.tumblingCounts(stream, "hour"), "st3_hourly", "update")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
      s.table("st3_hourly")
    }),

    "st2_stream_interval_join" -> ((s, dir) => {
      // stream-stream interval self-join drained through a file-source
      // stream — answers to the SAME oracle as the batch rj1 range join:
      // inner-join matches emit as both sides arrive, so draining the
      // whole file yields exactly the batch pair set
      val staged = java.nio.file.Files.createTempDirectory("st2_events")
      staged.toFile.deleteOnExit()
      val copied = staged.resolve("part-0.parquet")
      copied.toFile.deleteOnExit()
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // same sequential-driver assumption as st1's set/restore above
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val joined = graft.streaming.EventStreams.intervalJoinStream(
          stream, stream, "user_id", "ts", "event_id", withinSeconds = 300L)
        val q = graft.streaming.EventStreams.runToMemory(joined, "st2_pairs", "append")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
      s.table("st2_pairs")
        .select(col("user_id"), col("l_id").as("id_a"), col("r_id").as("id_b"),
          col("l_ts").as("t_a"), col("r_ts").as("t_b"))
    }),

    "st4_stream_left_interval_join" -> ((s, dir) => {
      // LEFT OUTER stream-stream interval join: NULL-padded rows for
      // left events with no follower are emitted only when the WATERMARK
      // proves the window closed — so the drain stages a sentinel event
      // past every real window (filtered back out below) to flush the
      // trailing state, and the result answers to the batch LEFT JOIN
      // oracle exactly
      // bench-harness artifact: the sentinel injection below stands in for
      // real watermark advancement — a production left-outer stream flushes
      // trailing state because new events keep arriving, not because anyone
      // appends a flush row (see EventStreams.leftOuterIntervalJoinStream)
      val staged = java.nio.file.Files.createTempDirectory("st4_events")
      val copied = staged.resolve("part-0.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // restored in the finally below: unlike rec1's lazy frame, every
      // read that needs this conf drains eagerly inside this closure.
      // Both conf reads happen BEFORE the try; both sets happen INSIDE it,
      // so a failure anywhere (including the eager sentinel-staging reads)
      // still hits the finally-restore and the shared session conf is
      // never left mutated on an exception path.
      val nanosPrev = s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
      // same sequential-driver assumption as st1/st2
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        // micros → LTZ, same normalization as Tables.load (sticky there,
        // so no restore needed for this one)
        s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        val raw = s.read.parquet(staged.toString)
        // sentinel ts > max + within + watermark delay: closes every window
        val marginSec = 300L + 3600L + 60L
        val sentinelTs =
          if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            lit(raw.agg(max("ts")).head().getLong(0) + marginSec * 1000000000L)
          else lit(new java.sql.Timestamp(
            raw.agg(max("ts")).head().getTimestamp(0).getTime + marginSec * 1000L))
        s.range(1).select(
            lit(-1L).as("event_id"), sentinelTs.as("ts"), lit(-1L).as("user_id"),
            lit("sentinel").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
          .coalesce(1).write.mode("append").parquet(staged.toString)
        s.conf.set("spark.sql.shuffle.partitions", "2")
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val joined = graft.streaming.EventStreams.leftOuterIntervalJoinStream(
          stream, stream, "user_id", "ts", "event_id", withinSeconds = 300L)
        val q = graft.streaming.EventStreams.runToMemory(joined, "st4_pairs", "append")
        // state-metered drain: peak/final state rows recorded in
        // EventStreams.lastStateMeter so scale rehearsals can attribute
        // 10× growth to output rows vs state-eviction failure
        graft.streaming.EventStreams.drainWithStateMeter(q)
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", nanosPrev)
        // the sentinel append added part files + _SUCCESS under `staged`,
        // so deleteOnExit (non-recursive) would leak a full events copy
        // per run — delete the staged dir recursively once drained (the
        // memory sink owns the results from here)
        org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
      }
      s.table("st4_pairs")
        .filter(col("user_id") >= 0) // drop the sentinel's own NULL row
        .select(col("user_id"), col("l_id").as("id_a"), col("r_id").as("id_b"),
          col("l_ts").as("t_a"), col("r_ts").as("t_b"))
    }),

    "st8_stream_session_window" -> ((s, dir) => {
      // streaming sessionization via the BUILT-IN session_window (the
      // merging-state aggregate; e2/sessionizeStream is the explicit-
      // state formulation): append-mode sessions emit only when the
      // watermark passes their close, so the drain stages one sentinel
      // event past max(ts) + gap + delay to flush every open session
      // (filtered back out below — sessions are per-user, so the
      // sentinel's own session can't touch a real one). Answers the
      // SAME oracle as batch e6.
      val staged = java.nio.file.Files.createTempDirectory("st8_events")
      val copied = staged.resolve("part-0.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val nanosPrev = s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        val raw = s.read.parquet(staged.toString)
        val marginSec = 600L + 60L + 60L // gap + watermark delay + slack
        val sentinelTs =
          if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            lit(raw.agg(max("ts")).head().getLong(0) + marginSec * 1000000000L)
          else lit(new java.sql.Timestamp(
            raw.agg(max("ts")).head().getTimestamp(0).getTime + marginSec * 1000L))
        s.range(1).select(
            lit(-1L).as("event_id"), sentinelTs.as("ts"), lit(-1L).as("user_id"),
            lit("sentinel").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
          .coalesce(1).write.mode("append").parquet(staged.toString)
        s.conf.set("spark.sql.shuffle.partitions", "8") // state-store sizing, see st1
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val sessions = graft.streaming.EventStreams.sessionWindowStream(stream, gapMinutes = 10)
        val q = graft.streaming.EventStreams.runToMemory(sessions, "st8_sessions", "append")
        q.awaitTermination()
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", nanosPrev)
        org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
      }
      s.table("st8_sessions").filter(col("user_id") >= 0)
    }),

    // ---- text analysis ----,

    "e5_count_anomalies" -> ((s, dir) => {
      // 3σ count-anomaly detection on the event stream, in PURE INTEGER
      // arithmetic: hour h of type t is anomalous iff
      // (n·c − S)² > 9·(n·Q − S²) — the population z-test cleared of
      // divisions (n hours, S = Σc, Q = Σc²), so the flag is exact with
      // no float rounding anywhere. Two hash aggregates + one broadcast
      // join; the per-type stats row is O(event types).
      val ev = t(s, dir, "events")
      val hourly = ev.groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"))
      val stats = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"), sum(col("n_events")).as("s"),
          sum(col("n_events") * col("n_events")).as("q"))
      val dev = col("n_hours") * col("n_events") - col("s")
      hourly.join(broadcast(stats), Seq("event_type"))
        .filter(dev * dev > lit(9L) * (col("n_hours") * col("q") - col("s") * col("s")))
        .select(col("event_type"), col("hour"), col("n_events"))
    }),

    "e6_session_window" -> ((s, dir) =>
      // built-in session_window aggregation: dynamic [first, last+gap)
      // windows computed by ONE merging-state hash aggregate — no
      // per-user window sort (e2's lag formulation is the two-window
      // alternative). The merge boundary is INCLUSIVE (spec-pinned), so
      // the oracle's gaps-and-islands mirror splits on strict > only.
      EventOps.sessionWindowStats(t(s, dir, "events"), gapMinutes = 10)),

    "e7_funnel" -> ((s, dir) =>
      // ordered conversion funnel view → click → purchase: earliest
      // step-1, earliest step-2 strictly after it, earliest step-3
      // strictly after that; conversion time in exact integer micros.
      // Three filtered min-aggregates chained on user_id — the frontier
      // shrinks each stage and broadcasts into the next join.
      EventOps.funnel(t(s, dir, "events"), Seq("view", "click", "purchase"))),

    "e8_retention_cohorts" -> ((s, dir) =>
      // weekly retention matrix: cohort = ISO week of first event,
      // counted per integer week offset — all date-trunc/datediff
      // integer arithmetic, no floats
      EventOps.retentionCohorts(t(s, dir, "events"))),

    "e9_attribution" -> ((s, dir) =>
      // multi-touch attribution: purchase value credited to the user's
      // view/click/signup touches in the prior 7 days under four models
      // at once (first/last/linear/U-shaped 40-40-20), all credit in
      // exact integer micros with truncating div — per-channel sums
      // replay exactly; (ts, event_id) breaks timestamp ties.
      EventOps.attribution(t(s, dir, "events"),
        Seq("view", "click", "signup"), "purchase", lookbackDays = 7))
  )

  def oracleSql: Map[String, String] = Map(
    "st2_stream_interval_join" -> // the streaming self-join answers to rj1's oracle
      ("SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b, a.ts AS t_a, b.ts AS t_b " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND epoch_us(b.ts) > epoch_us(a.ts) AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000"),

    "st4_stream_left_interval_join" -> // the outer drain answers to the
      // batch LEFT JOIN: every event appears, followers matched or NULL
      ("SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b, a.ts AS t_a, b.ts AS t_b " +
        "FROM events a LEFT JOIN events b ON a.user_id = b.user_id " +
        "AND epoch_us(b.ts) > epoch_us(a.ts) AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000"),

    "e4_sliding_window" ->
      (s"""WITH expanded AS (
         |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - i * INTERVAL 30 MINUTE AS window_start,
         |         event_type, value
         |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) probes
         |)
         |SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n_events,
         |       ${dsumSql("value")} AS total_value
         |FROM expanded GROUP BY 1, 2""").stripMargin,

    "e1_tumbling_window" ->
      (s"SELECT date_trunc('hour', ts) AS window_start, event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        s"${dsumSql("value")} AS total_value FROM events GROUP BY 1, 2"),

    "e2_sessions" ->
      (s"""WITH lagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events
         |), flagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
         |  FROM lagged
         |), numbered AS (
         |  SELECT user_id, ts, value,
         |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM flagged
         |)
         |SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
         |       CAST(count(*) AS BIGINT) AS n_events, ${dsumSql("value")} AS total_value
         |FROM numbered GROUP BY user_id, session_seq""").stripMargin,

    "e3_json_extract" ->
      "SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_value FROM events",

    "e10_path_analysis" -> // e2's sessionization mirror + a rank filter
      // to the first 5 steps + ordered string_agg — identical to Spark's
      // sort_array-of-structs then '>' join (event_id breaks ts ties)
      ("""WITH lagged AS (
         |  SELECT user_id, event_id, ts, event_type,
         |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events
         |), flagged AS (
         |  SELECT user_id, event_id, ts, event_type,
         |         CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
         |  FROM lagged
         |), numbered AS (
         |  SELECT user_id, event_id, ts, event_type,
         |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM flagged
         |), stepped AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS step
         |  FROM numbered
         |), paths AS (
         |  SELECT user_id, session_seq,
         |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
         |  FROM stepped WHERE step <= 5 GROUP BY user_id, session_seq
         |)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |FROM paths GROUP BY path
         |ORDER BY n_sessions DESC, path LIMIT 20""").stripMargin,

    "st7_stream_static_enrich" -> // the streamed enrichment answers to
      // the plain batch join+aggregate (inner join drops events whose
      // user_id has no customer row)
      (s"""SELECT 'tier_' || CAST(c_custkey % 3 AS VARCHAR) AS tier,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       ${dsumSql("e.value")} AS total_value
         |FROM events e JOIN customer c ON e.user_id = c.c_custkey
         |GROUP BY 1""").stripMargin,

    "st9_stream_cdc_upsert" -> // final table = F base with the %10 keys
      // repriced (+1000) plus the O inserts; the crash-replay no-op is
      // pinned TRUE. The upsert outcome is batch-split-independent
      // because every key appears once across the change set.
      (s"""WITH upd AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         o_totalprice + 1000.0 AS o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderstatus = 'O'
         |), final AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'F'
         |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM upd
         |)
         |SELECT TRUE AS replay_noop, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM final GROUP BY o_orderstatus""").stripMargin,

    "st12_changefeed_merge" -> // the mirror after the merge window:
      // F rows with %10 keys repriced (+1000) plus the O inserts — the
      // same final state as st9, reached through the CHANGE FEED
      // instead of a direct merge; mirrors_source pinned in-engine
      (s"""WITH upd AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         o_totalprice + 1000.0 AS o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderstatus = 'O'
         |), final AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'F'
         |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM upd
         |)
         |SELECT TRUE AS mirrors_source, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM final GROUP BY o_orderstatus""").stripMargin,

    "st10_changefeed_mirror" -> // the mirror tracked three windows:
      // initial F load; delete(key%3=0) + O append; delete(cust%7=0)
      // over base AND appended rows. mirrors_source + replay_noop are
      // pinned in-engine (mirror == source read; re-delivered batchId
      // did not commit).
      (s"""WITH survivors AS (
         |  SELECT o_orderstatus, o_custkey, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'F' AND o_orderkey % 3 <> 0
         |  UNION ALL
         |  SELECT o_orderstatus, o_custkey, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'O'
         |)
         |SELECT TRUE AS mirrors_source, TRUE AS replay_noop, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM survivors WHERE o_custkey % 7 <> 0
         |GROUP BY o_orderstatus""").stripMargin,

    "st13_mirror_refresh" -> // the mirror's final state: the P overwrite
      // minus the post-refresh key%4 delete; quiesce equality, the
      // single refresh commit, and incremental resumption pinned
      // in-engine
      (s"""SELECT TRUE AS mirrors_at_quiesce, TRUE AS one_refresh_commit,
         |       TRUE AS resumes_incremental,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |WHERE o_orderstatus = 'P' AND o_orderkey % 4 <> 0
         |GROUP BY o_orderstatus""").stripMargin,

    "st14_rowid_mirror" -> // the mirror's final state: copy A of every F
      // order, copy B (price +1e6) minus the key%3 deletes, plus the O
      // append; identity-keyed equality pinned in-engine
      (s"""WITH fin AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice + 1000000.0 FROM orders
         |  WHERE o_orderstatus = 'F' AND o_orderkey % 3 <> 0
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
         |)
         |SELECT TRUE AS mirrors_with_duplicates, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM fin GROUP BY o_orderstatus""").stripMargin,

    "st6_manifest_replicate" -> // the replica must hold exactly what the
      // source's three versions shipped — the whole orders table
      (s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "st5_manifest_stream" -> // the streamed manifest versions carry the
      // F create + O append + P append — i.e. the whole orders table;
      // the streaming aggregate answers to the plain batch oracle
      (s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "st1_stream_hourly" -> // the streaming path answers to the same oracle as batch e1
      (s"SELECT date_trunc('hour', ts) AS window_start, event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        s"${dsumSql("value")} AS total_value FROM events GROUP BY 1, 2"),

    "st3_stream_update" -> // single-batch update drain revises every group
      // exactly once — same batch aggregate, same oracle as e1/st1
      (s"SELECT date_trunc('hour', ts) AS window_start, event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        s"${dsumSql("value")} AS total_value FROM events GROUP BY 1, 2"),

    "e5_count_anomalies" -> // the division-free z-test replayed on exact
      // integers (DuckDB widens the sums to HUGEINT — same values)
      ("""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |         CAST(count(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 1, 2
         |), st AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
         |         sum(n_events) AS s, sum(n_events * n_events) AS q
         |  FROM hourly GROUP BY 1
         |)
         |SELECT h.event_type, h.hour, h.n_events
         |FROM hourly h JOIN st USING (event_type)
         |WHERE (n_hours * n_events - s) * (n_hours * n_events - s)
         |      > 9 * (n_hours * q - s * s)""").stripMargin,

    "e6_session_window" -> sessionWindowSql,

    "st8_stream_session_window" -> // the streamed session_window drain
      // answers to the SAME gaps-and-islands mirror as batch e6 (the
      // sentinel's user is filtered out and sessions are per-user)
      sessionWindowSql,

    "e7_funnel" -> // each stage re-derived: earliest step-k strictly
      // after the user's step-(k-1) timestamp; conversion time in exact
      // integer micros
      ("""WITH s1 AS (
         |  SELECT user_id, min(ts) AS t_view
         |  FROM events WHERE event_type = 'view' GROUP BY 1
         |), s2 AS (
         |  SELECT e.user_id, s1.t_view, min(e.ts) AS t_click
         |  FROM events e JOIN s1 ON e.user_id = s1.user_id
         |  WHERE e.event_type = 'click' AND e.ts > s1.t_view
         |  GROUP BY 1, 2
         |), s3 AS (
         |  SELECT e.user_id, s2.t_view, s2.t_click, min(e.ts) AS t_purchase
         |  FROM events e JOIN s2 ON e.user_id = s2.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
         |  GROUP BY 1, 2, 3
         |)
         |SELECT user_id, t_view, t_click, t_purchase,
         |       epoch_us(t_purchase) - epoch_us(t_view) AS funnel_micros
         |FROM s3""").stripMargin,

    "e8_retention_cohorts" -> // cohort week from min ts, offsets as
      // integer day-difference div 7; count(*) over the distinct
      // (user, week) frame IS the distinct-user count per cell
      ("""WITH cohort AS (
         |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
         |  FROM events GROUP BY 1
         |), active AS (
         |  SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
         |  FROM events
         |)
         |SELECT cohort_week,
         |       date_diff('day', cohort_week, activity_week) // 7 AS week_offset,
         |       CAST(count(*) AS BIGINT) AS n_users
         |FROM active JOIN cohort USING (user_id)
         |GROUP BY 1, 2""").stripMargin,

    "e9_attribution" -> // the same exact-integer credit arithmetic:
      // micros, truncating //, first/last by row_number over (ts, id) —
      // the window form of Spark's min/max-of-struct (no ties survive
      // because event_id is unique)
      ("""WITH conv AS (
         |  SELECT user_id, event_id AS conv_id, ts AS t_conv,
         |         CAST(round(value * 1000000) AS BIGINT) AS v_micro
         |  FROM events WHERE event_type = 'purchase'
         |), touch AS (
         |  SELECT user_id, event_id AS touch_id, ts AS t_touch,
         |         event_type AS channel
         |  FROM events WHERE event_type IN ('view', 'click', 'signup')
         |), joined AS (
         |  SELECT conv_id, v_micro, touch_id, t_touch, channel
         |  FROM conv JOIN touch USING (user_id)
         |  WHERE t_touch < t_conv
         |    AND t_touch >= t_conv - INTERVAL 7 DAY
         |), ranked AS (
         |  SELECT *,
         |    count(*) OVER (PARTITION BY conv_id) AS n,
         |    row_number() OVER (PARTITION BY conv_id
         |                       ORDER BY t_touch, touch_id) AS rn_first,
         |    row_number() OVER (PARTITION BY conv_id
         |                       ORDER BY t_touch DESC, touch_id DESC) AS rn_last
         |  FROM joined
         |), credited AS (
         |  SELECT channel,
         |    CASE WHEN rn_first = 1 THEN v_micro ELSE 0 END AS first_micro,
         |    CASE WHEN rn_last = 1 THEN v_micro ELSE 0 END AS last_micro,
         |    v_micro // n AS linear_micro,
         |    CASE WHEN n = 1 THEN v_micro
         |         WHEN n = 2 THEN v_micro // 2
         |         WHEN rn_first = 1 OR rn_last = 1 THEN (v_micro * 2) // 5
         |         ELSE (v_micro // 5) // (n - 2) END AS position_micro
         |  FROM ranked
         |)
         |SELECT channel, CAST(count(*) AS BIGINT) AS n_credited,
         |       CAST(sum(first_micro) AS DOUBLE) AS first_touch_micro,
         |       CAST(sum(last_micro) AS DOUBLE) AS last_touch_micro,
         |       CAST(sum(linear_micro) AS DOUBLE) AS linear_micro,
         |       CAST(sum(position_micro) AS DOUBLE) AS position_micro
         |FROM credited GROUP BY channel""").stripMargin,

    "st11_changefeed_optimize" -> // the mirror tracked: initial F load;
      // then delete(key%3=0) + COMPACT (empty delta, positions moved) +
      // O append in one window; mirrors_source pinned in-engine
      (s"""WITH final AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'F' AND o_orderkey % 3 <> 0
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'O'
         |)
         |SELECT TRUE AS mirrors_source, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM final GROUP BY o_orderstatus""").stripMargin
  )
}
