package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

class ManifestTableSpec extends SparkSpec {
  private def freshRoot(): String =
    Files.createTempDirectory("manifest_tbl").toFile.getAbsolutePath

  private def orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")

  test("create/append: latest read is the union; time travel reads each version exactly") {
    val root = freshRoot()
    val a = orders.filter(col("o_orderstatus") === "F")
    val b = orders.filter(col("o_orderstatus") === "O")
    val v1 = ManifestTable.create(spark, root, a)
    val v2 = ManifestTable.append(spark, root, b)
    assert(v1 === 1L && v2 === 2L)
    assert(ManifestTable.read(spark, root).count() === a.count() + b.count())
    assert(ManifestTable.read(spark, root, Some(1L)).count() === a.count())
    // version content is exact, not just counted
    assert(ManifestTable.read(spark, root, Some(1L)).exceptAll(a).isEmpty)
    assert(ManifestTable.read(spark, root).exceptAll(a.unionAll(b)).isEmpty)
  }

  test("overwrite replaces content at the tip; the old version stays readable") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(10))
    val replacement = orders.limit(3)
    val v2 = ManifestTable.overwrite(spark, root, replacement)
    assert(v2 === 2L)
    assert(ManifestTable.read(spark, root).count() === 3L)
    assert(ManifestTable.read(spark, root, Some(1L)).count() === 10L)
  }

  test("compact rewrites the layout, preserves content exactly, and versions the rewrite") {
    val root = freshRoot()
    // many small commits -> many small files
    ManifestTable.create(spark, root, orders.limit(40).repartition(4))
    (1 to 3).foreach(i => ManifestTable.append(spark, root, orders.limit(10 * i).repartition(4)))
    val before = ManifestTable.read(spark, root)
    val filesBefore = ManifestTable.manifestFiles(spark, root,
      ManifestTable.versions(spark, root).max).size
    val (v, filesAfter) = ManifestTable.compact(spark, root, 64L * 1024 * 1024)
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter")
    val after = ManifestTable.read(spark, root)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    // pre-compaction version still reads its exact old file set
    assert(ManifestTable.read(spark, root, Some(v - 1)).count() === before.count())
  }

  test("a torn write (staged data, no manifest) is invisible; vacuum reclaims it") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(10))
    val before = ManifestTable.read(spark, root).collect().toSet
    // crash simulation: the data-file write completed, the commit never ran
    ManifestTable.stage(spark, root, orders.limit(50))
    assert(ManifestTable.read(spark, root).collect().toSet === before,
      "orphaned tx files leaked into a read")
    val reclaimed = ManifestTable.vacuum(spark, root, keepVersions = 1)
    assert(reclaimed > 0, "vacuum failed to sweep the orphaned tx dir")
    assert(ManifestTable.read(spark, root).collect().toSet === before)
  }

  test("vacuum retains requested versions and drops unreferenced files with older manifests") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(10))   // v1
    ManifestTable.overwrite(spark, root, orders.limit(5)) // v2: v1's files unreferenced
    ManifestTable.append(spark, root, orders.limit(2))    // v3
    ManifestTable.vacuum(spark, root, keepVersions = 2)
    assert(ManifestTable.versions(spark, root) === Seq(2L, 3L))
    assert(ManifestTable.read(spark, root, Some(2L)).count() === 5L)
    assert(ManifestTable.read(spark, root).count() === 7L)
    intercept[IllegalArgumentException] {
      ManifestTable.read(spark, root, Some(1L))
    }
  }

  test("losing the publish race retries against the new tip (optimistic concurrency)") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(10))
    // simulate a concurrent winner: hand-publish v2 naming the same files
    // as v1, exactly what a racing appender's no-op commit would leave
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1Files = ManifestTable.manifestFiles(spark, root, 1L)
    val body = ("# graft-manifest version=2 op=append\n" + v1Files.mkString("\n") + "\n")
    val out = f.create(new org.apache.hadoop.fs.Path(s"$root/_graft_log/v00000002.manifest"), false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    // the append must land at v3 and carry v2's files forward
    val v = ManifestTable.append(spark, root, orders.limit(4))
    assert(v === 3L)
    assert(ManifestTable.read(spark, root).count() === 14L)
  }

  test("appendIdempotent lands a replayed batch exactly once (exactly-once sink contract)") {
    val root = freshRoot()
    val b0 = orders.limit(10)
    val b1 = orders.limit(25)
    ManifestTable.appendIdempotent(spark, root, b0, "w1", 0L)
    assert(ManifestTable.read(spark, root).count() === 10L)
    // crash-replay: batch 0 is re-delivered (foreachBatch at-least-once)
    val v = ManifestTable.appendIdempotent(spark, root, b0, "w1", 0L)
    assert(v === 1L, "replay must acknowledge the existing version, not commit")
    assert(ManifestTable.read(spark, root).count() === 10L, "replayed batch duplicated rows")
    // the next batch lands normally
    ManifestTable.appendIdempotent(spark, root, b1, "w1", 1L)
    assert(ManifestTable.read(spark, root).count() === 35L)
    // an out-of-order stale replay after progress is also dropped
    ManifestTable.appendIdempotent(spark, root, b0, "w1", 0L)
    assert(ManifestTable.read(spark, root).count() === 35L)
    // a DIFFERENT writer's batch 0 is independent state, not a replay
    ManifestTable.appendIdempotent(spark, root, orders.limit(5), "w2", 0L)
    assert(ManifestTable.read(spark, root).count() === 40L)
  }

  test("txn watermarks survive restore + vacuum: a replayed batch still lands exactly once") {
    val root = freshRoot()
    val b0 = orders.limit(10)
    ManifestTable.appendIdempotent(spark, root, b0, "w1", 0L) // v1, txn-w1=0
    ManifestTable.append(spark, root, orders.limit(3))        // v2: junk to rewind
    // the plain append carried the watermark forward (commit-level
    // carry, not appendIdempotent's doing)
    assert(ManifestTable.manifestMeta(spark, root, 2L).get("txn-w1") === Some("0"))
    ManifestTable.restore(spark, root, 1L)                    // v3 rewinds the junk
    assert(ManifestTable.manifestMeta(spark, root, 3L).get("txn-w1") === Some("0"))
    // vacuum retires every pre-restore manifest — including v1, the one
    // that originally recorded the watermark
    ManifestTable.vacuum(spark, root, keepVersions = 1)
    assert(ManifestTable.versions(spark, root) === Seq(3L))
    // the crash-replay of batch 0 must still be acknowledged, not landed
    // twice (before the carry-forward this duplicated the 10 rows)
    val v = ManifestTable.appendIdempotent(spark, root, b0, "w1", 0L)
    assert(v === 3L, "replay must acknowledge, not commit")
    assert(ManifestTable.read(spark, root).count() === 10L, "replayed batch duplicated rows")
    // progress still works, and a replayed batch can never REGRESS the
    // carried watermark below a later one
    ManifestTable.appendIdempotent(spark, root, orders.limit(5), "w1", 1L)
    assert(ManifestTable.manifestMeta(spark, root, 4L).get("txn-w1") === Some("1"))
    ManifestTable.appendIdempotent(spark, root, b0, "w1", 0L)
    assert(ManifestTable.read(spark, root).count() === 15L)
    assert(ManifestTable.manifestMeta(
      spark, root, ManifestTable.versions(spark, root).max).get("txn-w1") === Some("1"))
  }

  test("txn watermarks at beyond-2^21 batch ids: the tip-sum encoding of join-mart maintenance never overflows") {
    // maintainJoinMartTotal's batchId is aTip + bTip (replacing the
    // (aTip << 21) | bTip packing that hard-failed at b = 2^21 and
    // silently wrapped at a = 2^42) — the watermark machinery must
    // order and replay-gate ids of that magnitude like any other
    val root = freshRoot()
    val big = (1L << 22) + 7L // past the old encoding's hard-fail cliff
    ManifestTable.appendIdempotent(spark, root, orders.limit(10), "jm", big)
    assert(ManifestTable.read(spark, root).count() === 10L)
    // crash replay of the same window recomputes the same sum → no-op
    ManifestTable.appendIdempotent(spark, root, orders.limit(10), "jm", big)
    assert(ManifestTable.read(spark, root).count() === 10L)
    // the next window's strictly larger sum lands
    ManifestTable.appendIdempotent(spark, root, orders.limit(5), "jm", big + 1)
    assert(ManifestTable.read(spark, root).count() === 15L)
    // a stale window (e.g. one maintainer lagging another) acknowledges
    ManifestTable.appendIdempotent(spark, root, orders.limit(10), "jm", big)
    assert(ManifestTable.read(spark, root).count() === 15L)
  }

  test("per-root caches stay bounded: cycling many temp tables cannot grow driver state without bound") {
    // a long-lived JVM churning through millions of short-lived tables
    // (the tipCache/listingCounts leak class) — prime far past the LRU
    // capacity and prove eviction holds the line
    (1 to 10000).foreach(i => ManifestTable.primeTipForTest(s"/tmp/synthetic_root_$i", 1L))
    val (tips, listings) = ManifestTable.cachedRootCountsForTest()
    assert(tips <= 4096,
      s"tip cache must stay within the LRU bound after 10k roots (got $tips)")
    assert(listings <= 4096,
      s"listing meter must stay within the LRU bound (got $listings)")
    // a live root evicted from the tip cache self-heals via one listing
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(2).coalesce(1))
    (1 to 5000).foreach(i => ManifestTable.primeTipForTest(s"/tmp/synthetic_root_b$i", 1L))
    assert(ManifestTable.knownTipVersion(spark, root) === 1L,
      "an evicted tip must re-prime from a listing, not fail")
  }

  test("streamed foreachBatch ingest through appendIdempotent equals batch, including a replay") {
    val srcDir = Files.createTempDirectory("manifest_stream_src").toString
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("manifest_stream_ckpt").toString
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(srcDir)
    val stream = spark.readStream.schema(docs.select("doc_id", "text", "lang").schema)
      .parquet(srcDir)
    var lastBatch = -1L
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ManifestTable.appendIdempotent(spark, root, batch, "ingest", id)
        lastBatch = id
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      query.processAllAvailable()
      docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
      query.processAllAvailable()
    } finally query.stop()
    val n = ManifestTable.read(spark, root).count()
    assert(n === docs.count())
    // simulate the sink-side crash-replay of the LAST batch: re-deliver it
    ManifestTable.appendIdempotent(spark, root,
      docs.filter(col("doc_id") % 2 === 1), "ingest", lastBatch)
    assert(ManifestTable.read(spark, root).count() === n,
      "replayed final batch duplicated rows")
    assert(ManifestTable.read(spark, root).exceptAll(docs).isEmpty)
  }

  test("mergeIdempotent: a replayed CDC batch neither rewrites files nor re-fires a commit") {
    val root = freshRoot()
    val base = orders.filter(col("o_orderstatus") === "F")
    ManifestTable.create(spark, root, base, statsColumns = Seq("o_orderkey"))
    val upd = base.limit(5).withColumn("o_totalprice", col("o_totalprice") * 2)
    val v1 = ManifestTable.mergeIdempotent(spark, root, upd, "o_orderkey", "cdc", 0L,
      statsColumns = Seq("o_orderkey"))
    assert(v1 === 2L)
    val afterFirst = ManifestTable.read(spark, root).collect().toSet
    // crash-replay of the SAME batch: no new version, no content change
    val v2 = ManifestTable.mergeIdempotent(spark, root, upd, "o_orderkey", "cdc", 0L)
    assert(v2 === 2L, "replayed batch must not commit")
    assert(ManifestTable.read(spark, root).collect().toSet === afterFirst)
    // a LOWER batch id replays too (watermark, not equality)
    assert(ManifestTable.mergeIdempotent(spark, root, upd, "o_orderkey", "cdc", -1L) === 2L)
    // the next batch lands; a different writer is independent
    val ins = orders.filter(col("o_orderstatus") === "O").limit(3)
    assert(ManifestTable.mergeIdempotent(spark, root, ins, "o_orderkey", "cdc", 1L) === 3L)
    assert(ManifestTable.read(spark, root).count() === base.count() + 3)
    intercept[IllegalArgumentException] { // no base table — CDC needs one
      ManifestTable.mergeIdempotent(spark, freshRoot(), upd, "o_orderkey", "cdc", 0L)
    }
  }

  test("readChangesSince feeds exactly the appended batches; cursor-advance loop is lossless") {
    val root = freshRoot()
    val b1 = orders.limit(10)
    val b2 = orders.limit(25)
    val b3 = orders.limit(40)
    val v1 = ManifestTable.create(spark, root, b1)
    // consumer starts at v1, producer appends two batches
    ManifestTable.append(spark, root, b2)
    ManifestTable.append(spark, root, b3)
    val (delta, cursor) = ManifestTable.readChangesSince(spark, root, v1)
    assert(delta.count() === 65L, "delta must be batches 2+3, not the full table")
    assert(cursor === 3L)
    // caught up: the delta from the tip is empty but schema-correct
    val (empty, c2) = ManifestTable.readChangesSince(spark, root, cursor)
    assert(empty.count() === 0L && c2 === 3L)
    assert(empty.schema === orders.schema)
    // full stream = initial snapshot + every delta (losslessness)
    val all = ManifestTable.read(spark, root)
    assert(ManifestTable.read(spark, root, Some(v1)).unionAll(delta)
      .exceptAll(all).isEmpty)
  }

  test("readChangesSince refuses a non-append lineage (overwrite/compact) — full refresh required") {
    val root = freshRoot()
    val v1 = ManifestTable.create(spark, root, orders.limit(10))
    ManifestTable.append(spark, root, orders.limit(5))
    ManifestTable.overwrite(spark, root, orders.limit(3))
    intercept[graft.sources.NotDeltaExpressible] {
      ManifestTable.readChangesSince(spark, root, v1)
    }
    // compaction likewise rewrites files: structurally detected, not op-name trust
    val root2 = freshRoot()
    val w1 = ManifestTable.create(spark, root2, orders.limit(10).repartition(4))
    ManifestTable.append(spark, root2, orders.limit(5))
    ManifestTable.compact(spark, root2, 64L * 1024 * 1024)
    intercept[graft.sources.NotDeltaExpressible] {
      ManifestTable.readChangesSince(spark, root2, w1)
    }
    // a stale cursor (vacuumed-away version) is invalid, loudly
    intercept[graft.sources.NotDeltaExpressible] {
      ManifestTable.readChangesSince(spark, root, 99L)
    }
  }

  test("the schema rides the manifest: widening append back-fills NULL, time travel keeps old shapes") {
    import spark.implicits._
    val root = freshRoot()
    val gen1 = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val gen2 = Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "k", "score")
    ManifestTable.create(spark, root, gen1)
    val v2 = ManifestTable.append(spark, root, gen2)
    // the union schema is committed in the log, not sniffed from footers
    assert(ManifestTable.schemaOf(spark, root, v2).get.fieldNames.toSeq
      === Seq("id", "k", "score"))
    val tip = ManifestTable.read(spark, root)
    assert(tip.columns.toSeq === Seq("id", "k", "score"))
    assert(tip.count() === 4L)
    // gen1 files predate `score`: read as NULL against the stored schema
    assert(tip.filter(col("score").isNull).select("id")
      .as[Long].collect().toSet === Set(1L, 2L))
    // time travel reads version 1 with its OWN narrower schema
    assert(ManifestTable.read(spark, root, Some(1L)).columns.toSeq === Seq("id", "k"))
    // a type conflict on a shared column refuses loudly
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, root, Seq(("x", "y", 1.0)).toDF("id", "k", "score"))
    }
    // the change-data-feed across the widening reads the TIP schema
    val (delta, _) = ManifestTable.readChangesSince(spark, root, 1L)
    assert(delta.columns.toSeq === Seq("id", "k", "score") && delta.count() === 2L)
  }

  test("detail reports the tip's operational summary; row count only when every file has stats") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.repartitionByRange(4, col("o_orderdate")),
      statsColumns = Seq("o_orderdate"), bloomColumns = Seq("o_orderkey"))
    val d1 = ManifestTable.detail(spark, root)
    assert(d1.versions === 1 && d1.tipVersion === 1L && d1.tipOperation === "create")
    assert(d1.numFiles === 4 && d1.sizeBytes > 0)
    assert(d1.rowCount === Some(orders.count()))
    assert(d1.numColumns === Some(orders.columns.length))
    assert(d1.statsColumns === Seq("o_orderdate", "o_orderkey")) // blooms imply ranges
    assert(d1.bloomColumns === Seq("o_orderkey"))
    // an append WITHOUT stats makes the committed row count unknowable —
    // detail must say None, never a partial sum
    ManifestTable.append(spark, root, orders.limit(10))
    val d2 = ManifestTable.detail(spark, root)
    assert(d2.versions === 2 && d2.tipOperation === "append")
    assert(d2.rowCount === None)
  }

  test("empty-table guard: reading a non-table or an unknown version fails loudly") {
    val root = freshRoot()
    intercept[IllegalArgumentException] { ManifestTable.read(spark, root) }
    ManifestTable.create(spark, root, orders.limit(1))
    intercept[IllegalArgumentException] { ManifestTable.read(spark, root, Some(7L)) }
  }

  // ---- copy-on-write MERGE ------------------------------------------------

  test("merge: updates replace on key, inserts add, the rest carries; old version intact") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.repartitionByRange(8, col("o_orderkey")),
      statsColumns = Seq("o_orderkey"))
    val updates = orders.filter(col("o_orderkey") <= 100)
      .withColumn("o_orderstatus", lit("X"))
    val inserts = orders.filter(col("o_orderkey") <= 10)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000L)
    val (v, _) = ManifestTable.merge(spark, root,
      updates.unionByName(inserts), "o_orderkey", statsColumns = Seq("o_orderkey"))
    assert(v === 2L)
    val result = ManifestTable.read(spark, root)
    val expected = orders.filter(col("o_orderkey") > 100)
      .unionByName(updates).unionByName(inserts)
    assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty)
    // snapshot isolation: v1 still reads the pre-merge content
    assert(ManifestTable.read(spark, root, Some(1L)).exceptAll(orders).isEmpty)
  }

  test("merge rewrites only the files the key stats cannot clear (copy-on-write)") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.repartitionByRange(8, col("o_orderkey")),
      statsColumns = Seq("o_orderkey"))
    val before = ManifestTable.manifestFiles(spark, root, 1L)
    val batch = orders.filter(col("o_orderkey") <= 100)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    val (_, st) = ManifestTable.merge(spark, root, batch, "o_orderkey",
      statsColumns = Seq("o_orderkey"))
    assert(st.filesRewritten >= 1 && st.filesRewritten < before.size)
    assert(st.filesRewritten + st.filesUntouched === before.size)
    // carried files keep their PATHS (byte-identical, no rewrite) and
    // their committed stats entries
    val after = ManifestTable.manifestFiles(spark, root, 2L).toSet
    val carried = before.toSet.intersect(after)
    assert(carried.size === st.filesUntouched)
    val stats2 = ManifestTable.fileStats(spark, root, 2L)
    assert(carried.forall(stats2.contains))
    // skipping still works on the merged table (fresh stats on rewrites)
    val (_, dropped, _) = ManifestTable.pruneFiles(spark, root,
      col("o_orderkey") <= 100)
    assert(dropped.nonEmpty)
  }

  test("merge beyond the key cap falls back to a full rewrite, still exact") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.repartitionByRange(4, col("o_orderkey")),
      statsColumns = Seq("o_orderkey"))
    val batch = orders.filter(col("o_orderkey") <= 100)
      .withColumn("o_orderstatus", lit("X"))
    val (_, st) = ManifestTable.merge(spark, root, batch, "o_orderkey", maxKeys = 3)
    assert(st.filesUntouched === 0) // over cap: everything rewrote
    val result = ManifestTable.read(spark, root)
    val expected = orders.filter(col("o_orderkey") > 100).unionByName(batch)
    assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty)
  }

  test("delete: predicate rows go, NULL-predicate rows survive, only boundary files rewrite") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.repartitionByRange(8, col("o_orderdate")),
      statsColumns = Seq("o_orderdate"))
    val pred = col("o_orderdate") >= lit("1997-06-01").cast("timestamp")
    val (v, st) = ManifestTable.delete(spark, root, pred,
      statsColumns = Seq("o_orderdate"))
    assert(v === 2L)
    assert(st.filesRewritten >= 1 && st.filesUntouched >= 1)
    val result = ManifestTable.read(spark, root)
    val expected = orders.filter(not(coalesce(pred, lit(false))))
    assert(result.exceptAll(expected).isEmpty && expected.exceptAll(result).isEmpty)
    // time travel still serves the pre-delete content
    assert(ManifestTable.read(spark, root, Some(1L)).count() === orders.count())
    // NULL-predicate semantics: a delete keyed on a column with NULLs
    // keeps the NULL rows (SQL DELETE removes only WHERE pred IS TRUE)
    val root2 = freshRoot()
    import spark.implicits._
    val withNulls = Seq((1L, Some(5)), (2L, None), (3L, Some(99)))
      .toDF("id", "v")
    ManifestTable.create(spark, root2, withNulls)
    ManifestTable.delete(spark, root2, col("v") > 10)
    assert(ManifestTable.read(spark, root2).select("id")
      .as[Long].collect().toSet === Set(1L, 2L))
  }

  test("manifest stream: versions are offsets; appends arrive incrementally; restart resumes exactly-once") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("st5_ckpt").toFile.getAbsolutePath
    val f = orders.filter(col("o_orderstatus") === "F")
    val o = orders.filter(col("o_orderstatus") === "O")
    val p = orders.filter(col("o_orderstatus") === "P")
    ManifestTable.create(spark, root, f)
    def streamDf = spark.readStream
      .format("graft.sources.ManifestStreamSourceProvider").load(root)
      .select("o_orderkey")
    // foreachBatch (not the memory sink, which refuses checkpoint
    // recovery) so the restart leg below can resume the SAME checkpoint
    val arrived1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = streamDf.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => arrived1.add(r.getLong(0))); ()
      }
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(arrived1.size === f.count())
      // an append while the query runs arrives as its own delta batch
      ManifestTable.append(spark, root, o)
      q.processAllAvailable()
      assert(arrived1.size === f.count() + o.count())
    } finally q.stop()
    // data committed while the stream is DOWN, then a restart from the
    // same checkpoint into a FRESH collector: exactly the missed version
    // arrives — nothing replays, nothing is lost
    ManifestTable.append(spark, root, p)
    val arrived2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = streamDf.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => arrived2.add(r.getLong(0))); ()
      }
      .option("checkpointLocation", ckpt).start()
    try q2.processAllAvailable() finally q2.stop()
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    assert(arrived2.asScala.toSet === p.select("o_orderkey").as[Long].collect().toSet)
  }

  test("manifest stream refuses a non-append change mid-stream (delta no longer expressible)") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("st5_ckpt2").toFile.getAbsolutePath
    ManifestTable.create(spark, root, orders.filter(col("o_orderstatus") === "F"))
    val q = spark.readStream
      .format("graft.sources.ManifestStreamSourceProvider").load(root)
      .select("o_orderkey")
      .writeStream.format("memory").queryName("st5_refuse")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      ManifestTable.overwrite(spark, root, orders.limit(5))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
      assert((chain(e) ++ Option(q.exception.orNull).toSeq.flatMap(chain))
        .exists(m => m != null && m.contains("non-append")),
        s"expected the non-append refusal, got: ${chain(e)}")
    } finally q.stop()
  }

  test("manifest sink: a replayed addBatch lands exactly once; guards reject update mode and partitionBy") {
    val root = freshRoot()
    val batch = orders.filter(col("o_orderstatus") === "F").limit(10)
    val sink = new graft.sources.ManifestStreamSink(spark, root, "w1")
    sink.addBatch(0L, batch)
    val n = ManifestTable.read(spark, root).count()
    sink.addBatch(0L, batch) // at-least-once re-delivery after a crash
    assert(ManifestTable.read(spark, root).count() === n) // no duplicate
    sink.addBatch(1L, batch) // the NEXT batch still lands
    assert(ManifestTable.read(spark, root).count() === 2 * n)
    val provider = new graft.sources.ManifestStreamSinkProvider
    val ctx = spark.sqlContext
    intercept[IllegalArgumentException] {
      provider.createSink(ctx, Map("path" -> root), Seq.empty,
        org.apache.spark.sql.streaming.OutputMode.Update())
    }
    intercept[IllegalArgumentException] {
      provider.createSink(ctx, Map("path" -> root), Seq("o_orderstatus"),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
  }

  test("restore: an overwritten table comes back as a metadata-only commit; stats and history survive") {
    val root = freshRoot()
    val a = orders.filter(col("o_orderkey") < 3000L)
    val b = orders.filter(col("o_orderkey") >= 3000L)
    ManifestTable.create(spark, root,
      a.repartitionByRange(2, col("o_orderkey")), statsColumns = Seq("o_orderkey"))
    ManifestTable.append(spark, root,
      b.repartitionByRange(2, col("o_orderkey")), statsColumns = Seq("o_orderkey"))
    val v2Files = ManifestTable.manifestFiles(spark, root, 2L)
    ManifestTable.overwrite(spark, root, orders.limit(1)) // fat-finger
    val v = ManifestTable.restore(spark, root, 2L)
    assert(v === 4L)
    // identical file LIST — no data was copied
    assert(ManifestTable.manifestFiles(spark, root, v) === v2Files)
    // identical content
    val restored = ManifestTable.read(spark, root)
    assert(restored.exceptAll(orders).isEmpty && orders.exceptAll(restored).isEmpty)
    // stats came back with the files: pruning works on the restored tip
    val (kept, dropped, _) = ManifestTable.pruneFiles(spark, root, col("o_orderkey") === 17L)
    assert(dropped.nonEmpty, "restored stats must prune")
    assert(kept.size + dropped.size === v2Files.size)
    // the bad version remains time-travelable until vacuum
    assert(ManifestTable.read(spark, root, Some(3L)).count() === 1L)
    // restore reinstating dropped files is structurally non-append: a
    // CDF cursor parked at the overwrite must refuse
    intercept[graft.sources.NotDeltaExpressible] {
      ManifestTable.readChangesSince(spark, root, 3L)
    }
    // vacuum keeps the restored tip's files live
    ManifestTable.vacuum(spark, root, keepVersions = 1)
    assert(ManifestTable.read(spark, root).count() === orders.count())
  }

  test("history: one row per version with op and stats-derived row counts; unknown without stats") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(10), statsColumns = Seq("o_orderkey"))
    ManifestTable.append(spark, root, orders.limit(5), statsColumns = Seq("o_orderkey"))
    ManifestTable.compact(spark, root, targetFileBytes = Long.MaxValue,
      statsColumns = Seq("o_orderkey"))
    ManifestTable.restore(spark, root, 2L)
    val h = ManifestTable.history(spark, root)
    assert(h.map(_.version) === Seq(1L, 2L, 3L, 4L))
    assert(h.map(_.operation) === Seq("create", "append", "compact", "restore-v2"))
    assert(h.map(_.rowCount) === Seq(Some(10L), Some(15L), Some(15L), Some(15L)))
    // a version whose files carry no stats reports unknown, never 0
    val root2 = freshRoot()
    ManifestTable.create(spark, root2, orders.limit(3))
    assert(ManifestTable.history(spark, root2).head.rowCount === None)
  }

  test("restore refuses unknown versions") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(5))
    intercept[IllegalArgumentException] {
      ManifestTable.restore(spark, root, 7L)
    }
  }

  test("merge guards: schema mismatch and null keys are rejected") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders)
    intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, root, orders.drop("o_orderpriority"), "o_orderkey")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, root,
        orders.limit(5).withColumn("o_orderkey", lit(null).cast("long")), "o_orderkey")
    }
  }

  test("renameColumn is metadata-only: zero files rewritten, data rides under the new name") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(3))
    val filesBefore = ManifestTable.manifestFiles(spark, root, 1L)
    val v2 = ManifestTable.renameColumn(spark, root, "o_totalprice", "total_price")
    assert(v2 === 2L)
    assert(ManifestTable.manifestFiles(spark, root, v2) === filesBefore,
      "rename must not stage or drop any data file")
    val renamed = ManifestTable.read(spark, root)
    assert(renamed.columns.contains("total_price") && !renamed.columns.contains("o_totalprice"))
    assert(renamed.withColumnRenamed("total_price", "o_totalprice")
      .exceptAll(orders).isEmpty, "content must survive the rename byte-for-byte")
    // time travel still shows the OLD name at the old version
    assert(ManifestTable.read(spark, root, Some(1L)).columns.contains("o_totalprice"))
  }

  test("renameColumn keeps stats pruning: predicates on the NEW name skip files via OLD stats") {
    val root = freshRoot()
    val sorted = orders.orderBy("o_orderkey").repartitionByRange(4, col("o_orderkey"))
    ManifestTable.create(spark, root, sorted, statsColumns = Seq("o_orderkey"))
    ManifestTable.renameColumn(spark, root, "o_orderkey", "order_id")
    val (kept, dropped, _) = ManifestTable.pruneFiles(spark, root, col("order_id") === 17L)
    assert(dropped.nonEmpty, s"stats committed under the physical name must still prune (kept=${kept.size})")
    val rows = ManifestTable.readPruned(spark, root, col("order_id") === 17L).collect()
    assert(rows.length === 1 && rows(0).getAs[Long]("order_id") === 17L)
  }

  test("append after rename: logical-named batch stages physically; files stay homogeneous") {
    val root = freshRoot()
    val half = orders.filter(col("o_orderkey") < 700L)
    val rest = orders.filter(col("o_orderkey") >= 700L)
    ManifestTable.create(spark, root, half, statsColumns = Seq("o_orderkey"))
    ManifestTable.renameColumn(spark, root, "o_orderkey", "order_id")
    ManifestTable.append(spark, root,
      rest.withColumnRenamed("o_orderkey", "order_id"), statsColumns = Seq("order_id"))
    val all = ManifestTable.read(spark, root)
    assert(all.count() === orders.count())
    assert(all.filter(col("order_id").isNull).count() === 0L,
      "a physically-misnamed appended file would read its keys as NULL")
    // pruning works across BOTH file generations
    val (_, dropped, _) = ManifestTable.pruneFiles(spark, root, col("order_id") === 17L)
    assert(dropped.nonEmpty)
  }

  test("manifest stream reads through column mapping: renamed columns stream real bytes, tombstones hidden") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("st_rename_ckpt").toFile.getAbsolutePath
    val half = orders.filter(col("o_orderkey") < 700L)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val rest = orders.filter(col("o_orderkey") >= 700L)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    ManifestTable.create(spark, root, half)
    ManifestTable.renameColumn(spark, root, "o_totalprice", "total_price")
    ManifestTable.dropColumn(spark, root, "o_orderstatus")
    val stream = spark.readStream
      .format("graft.sources.ManifestStreamSourceProvider").load(root)
    // sourceSchema serves the VISIBLE logical schema: renamed name in,
    // tombstone out
    assert(stream.schema.fieldNames.toSeq === Seq("o_orderkey", "total_price"),
      s"stream schema must be the visible logical one, got ${stream.schema.fieldNames.mkString(",")}")
    val rows = new java.util.concurrent.atomic.AtomicLong()
    val nulls = new java.util.concurrent.atomic.AtomicLong()
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        rows.addAndGet(b.count())
        nulls.addAndGet(b.filter(col("total_price").isNull).count()); ()
      }
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(rows.get() === half.count())
      assert(nulls.get() === 0L,
        "renamed column must stream REAL bytes, not the all-NULL logical-name scan")
      // an append landed mid-stream reads through the mapping too
      ManifestTable.append(spark, root,
        rest.withColumnRenamed("o_totalprice", "total_price").drop("o_orderstatus"))
      q.processAllAvailable()
      assert(rows.get() === orders.count())
      assert(nulls.get() === 0L)
    } finally q.stop()
  }

  test("renameColumn guards: duplicates, missing columns, physical shadowing") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders)
    ManifestTable.renameColumn(spark, root, "o_orderpriority", "priority")
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "o_orderstatus", "priority") // logical collision
    }
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "nope", "x") // no such column
    }
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "o_orderstatus", "o_orderpriority") // physical shadow
    }
    intercept[IllegalArgumentException] {
      // a new appended column may not shadow a renamed column's disk name
      ManifestTable.append(spark, root,
        ManifestTable.read(spark, root).withColumn("o_orderpriority", lit("x")))
    }
    // renaming BACK to the disk name drops the mapping entirely
    ManifestTable.renameColumn(spark, root, "priority", "o_orderpriority")
    val s = ManifestTable.schemaOf(spark, root, ManifestTable.versions(spark, root).max).get
    assert(!s.fields.exists(_.metadata.contains("graft.physical")))
  }

  test("dropColumn is metadata-only: zero files rewritten, the column vanishes, the rest is intact") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(3))
    val filesBefore = ManifestTable.manifestFiles(spark, root, 1L)
    val v2 = ManifestTable.dropColumn(spark, root, "o_orderpriority")
    assert(v2 === 2L)
    assert(ManifestTable.manifestFiles(spark, root, v2) === filesBefore,
      "drop must not stage or drop any data file")
    val after = ManifestTable.read(spark, root)
    assert(!after.columns.contains("o_orderpriority"))
    assert(after.exceptAll(orders.drop("o_orderpriority")).isEmpty &&
      orders.drop("o_orderpriority").exceptAll(after).isEmpty,
      "remaining columns must survive byte-for-byte")
    // time travel still shows the column at the pre-drop version
    assert(ManifestTable.read(spark, root, Some(1L)).columns.contains("o_orderpriority"))
    // restore resurrects it with its values (schema rides restore's metadata)
    ManifestTable.restore(spark, root, 1L)
    assert(ManifestTable.read(spark, root).exceptAll(orders).isEmpty)
  }

  test("dropColumn resurrection guard: a new column may not take a tombstoned physical slot") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(20))
    ManifestTable.dropColumn(spark, root, "o_orderpriority")
    // widening append re-using the dropped on-disk name would serve the
    // dead bytes of every pre-drop file under the new column — refused
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, root, orders.limit(3))
    }
    // ...and so is a batch that names the tombstone slot itself
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, root,
        orders.limit(3).drop("o_orderpriority")
          .withColumn("graft__dropped__o_orderpriority", lit("x")))
    }
    // a batch simply WITHOUT the dropped column appends fine
    ManifestTable.append(spark, root, orders.limit(3).drop("o_orderpriority"))
    assert(ManifestTable.read(spark, root).count() === 23L)
  }

  test("dropColumn re-add workflow: fresh physical name + rename; old rows NULL, dead bytes stay dead") {
    val root = freshRoot()
    val a = orders.filter(col("o_orderkey") < 700L)
    val b = orders.filter(col("o_orderkey") >= 700L)
    ManifestTable.create(spark, root, a)
    ManifestTable.dropColumn(spark, root, "o_orderpriority")
    ManifestTable.append(spark, root,
      b.drop("o_orderpriority").withColumn("prio2", upper(col("o_orderstatus"))))
    ManifestTable.renameColumn(spark, root, "prio2", "o_orderpriority")
    val out = ManifestTable.read(spark, root)
    assert(out.columns.contains("o_orderpriority"))
    // pre-drop rows read NULL (their files have no prio2 column) — the
    // original priority strings can never resurface
    assert(out.filter(col("o_orderkey") < 700L)
      .filter(col("o_orderpriority").isNotNull).isEmpty)
    assert(out.filter(col("o_orderkey") >= 700L)
      .filter(col("o_orderpriority") =!= upper(col("o_orderstatus"))).isEmpty)
  }

  test("dropColumn of a RENAMED column tombstones its physical slot; CoW rewrite sheds the bytes") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(2))
    ManifestTable.renameColumn(spark, root, "o_orderpriority", "priority")
    ManifestTable.dropColumn(spark, root, "priority")
    // the tombstone holds the PHYSICAL name: re-using it is refused
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, root,
        orders.limit(3).drop("o_orderpriority")
          .withColumn("o_orderpriority", lit("x")))
    }
    // a full compaction rewrites every file from the VISIBLE projection —
    // the dropped physical column is physically gone from the new files
    // (Delta's REORG PURGE for free)
    ManifestTable.compact(spark, root, targetFileBytes = Long.MaxValue)
    val tip = ManifestTable.versions(spark, root).max
    val rewritten = ManifestTable.manifestFiles(spark, root, tip)
    val raw = spark.read.parquet(rewritten.map(p => s"$root/$p"): _*)
    assert(!raw.columns.contains("o_orderpriority") && !raw.columns.contains("priority"),
      s"compacted files must not carry the dropped column, got ${raw.columns.mkString(",")}")
    assert(ManifestTable.read(spark, root).count() === orders.count())
  }

  test("dropColumn keeps stats pruning on the remaining columns") {
    val root = freshRoot()
    val sorted = orders.orderBy("o_orderkey").repartitionByRange(4, col("o_orderkey"))
    ManifestTable.create(spark, root, sorted, statsColumns = Seq("o_orderkey"))
    ManifestTable.dropColumn(spark, root, "o_orderpriority")
    val (_, dropped, _) = ManifestTable.pruneFiles(spark, root, col("o_orderkey") === 17L)
    assert(dropped.nonEmpty, "remaining-column stats must still prune after a drop")
    val rows = ManifestTable.readPruned(spark, root, col("o_orderkey") === 17L).collect()
    assert(rows.length === 1)
  }

  test("dropColumn guards: missing, already-dropped, last visible column, clustered column, reserved prefix") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.select("o_orderkey", "o_orderstatus").limit(10))
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, root, "nope")
    }
    ManifestTable.dropColumn(spark, root, "o_orderstatus")
    intercept[IllegalArgumentException] { // already dropped
      ManifestTable.dropColumn(spark, root, "o_orderstatus")
    }
    intercept[IllegalArgumentException] { // last visible column
      ManifestTable.dropColumn(spark, root, "o_orderkey")
    }
    // a transform-clustered column refuses to drop (pruning would die)
    val root2 = freshRoot()
    ManifestTable.create(spark, root2, orders.limit(50), statsColumns = Seq("o_orderkey"))
    ManifestTable.optimizeClusterBy(spark, root2,
      graft.sources.BucketTransform(4, "o_orderkey"),
      targetFileBytes = Long.MaxValue, statsColumns = Seq("o_orderkey"))
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, root2, "o_orderkey")
    }
    // reserved tombstone prefix refused at create and append
    intercept[IllegalArgumentException] {
      ManifestTable.create(spark, freshRoot(),
        orders.limit(1).withColumn("graft__dropped__x", lit(1)))
    }
  }

  test("TIMESTAMP AS OF resolves by adjusted commit time; clock regressions stay monotonic; pre-history errors") {
    val root = freshRoot()
    val even = orders.filter(col("o_orderkey") % 2 === 0)
    ManifestTable.create(spark, root, even)
    ManifestTable.append(spark, root, orders.filter(col("o_orderkey") % 2 === 1))
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mpath(v: Long) = new org.apache.hadoop.fs.Path(
      s"$root/_graft_log/" + f"v$v%08d" + ".manifest")
    val t1 = hfs.getFileStatus(mpath(1L)).getModificationTime
    val t2 = hfs.getFileStatus(mpath(2L)).getModificationTime
    // pin distinct commit times so the boundary assertions are exact
    hfs.setTimes(mpath(2L), t1 + 10000, -1)
    assert(ManifestTable.versionAsOf(spark, root, t1) === 1L)
    assert(ManifestTable.versionAsOf(spark, root, t1 + 9999) === 1L)
    assert(ManifestTable.versionAsOf(spark, root, t1 + 10000) === 2L)
    assert(ManifestTable.readAsOf(spark, root, t1).count() === even.count())
    intercept[IllegalArgumentException] {
      ManifestTable.versionAsOf(spark, root, t1 - 1)
    }
    // Delta's monotonicity adjustment: set v2's mtime BEFORE v1's —
    // v2's effective time becomes v1's, and the ordering never inverts
    hfs.setTimes(mpath(2L), t1 - 50000, -1)
    assert(ManifestTable.versionAsOf(spark, root, t1) === 2L,
      "a later version whose clock regressed must take the running-max time")
    intercept[IllegalArgumentException] {
      ManifestTable.versionAsOf(spark, root, t1 - 50000)
    }
    assert(t2 >= t1) // sanity on the untouched original ordering
  }

  test("evolvePartitionSpec: metadata-only; new files prune on the new dimension, old files keep-biased, old transform still prunes") {
    val root = freshRoot()
    val even = orders.filter(col("o_orderkey") % 2 === 0)
    val odd = orders.filter(col("o_orderkey") % 2 === 1)
    ManifestTable.create(spark, root, even, statsColumns = Seq("o_orderkey"))
    ManifestTable.optimizeClusterBy(spark, root,
      graft.sources.BucketTransform(16, "o_orderkey"),
      targetFileBytes = math.max(1L, ManifestTable.tableBytes(spark, root) / 8),
      statsColumns = Seq("o_orderkey"))
    val filesBefore = ManifestTable.manifestFiles(spark, root,
      ManifestTable.versions(spark, root).max)
    val v = ManifestTable.evolvePartitionSpec(spark, root,
      graft.sources.BucketTransform(8, "o_custkey"))
    assert(ManifestTable.manifestFiles(spark, root, v) === filesBefore,
      "spec evolution must not stage or drop any file")
    assert(ManifestTable.transformsOf(spark, root, v).map(_.name) ===
      Seq("bucket_16_o_orderkey", "bucket_8_o_custkey"))
    // new data appends under BOTH transforms: cluster the batch by the
    // new dimension so its bucket ranges are narrow enough to prune
    ManifestTable.append(spark, root,
      odd.repartitionByRange(8, pmod(xxhash64(col("o_custkey")), lit(8L))),
      statsColumns = Seq("o_orderkey"))
    val probeCust = ManifestTable.read(spark, root)
      .select("o_custkey").orderBy("o_custkey").limit(1)
      .collect()(0).getLong(0)
    val (_, drCust, _) = ManifestTable.pruneFiles(spark, root,
      col("o_custkey") === probeCust)
    assert(drCust.nonEmpty, "new files must prune on the evolved dimension")
    // pre-evolution files carry no virtual stats for the new transform —
    // every one of them survives (keep-biased, never wrong)
    assert(filesBefore.forall(f => !drCust.contains(f)),
      "old files must be keep-biased on the new dimension")
    // the ORIGINAL transform still prunes the old files
    val (_, drKey, _) = ManifestTable.pruneFiles(spark, root,
      col("o_orderkey") === 16L)
    assert(drKey.exists(filesBefore.contains),
      "the original transform must keep pruning pre-evolution files")
    // correctness: the pruned point probe returns exactly the right rows
    val rows = ManifestTable.readPruned(spark, root,
      col("o_orderkey") === 16L).collect()
    assert(rows.length === 1)
    // guards: duplicate transform, unknown column
    intercept[IllegalArgumentException] {
      ManifestTable.evolvePartitionSpec(spark, root,
        graft.sources.BucketTransform(8, "o_custkey"))
    }
    intercept[IllegalArgumentException] {
      ManifestTable.evolvePartitionSpec(spark, root,
        graft.sources.BucketTransform(4, "nope"))
    }
    // DROP PARTITION FIELD: pruning on the dropped dimension stops
    // (keep-biased), the other transform keeps pruning, re-add resumes
    // using the virtual stats the files never lost
    ManifestTable.dropPartitionField(spark, root, "bucket_8_o_custkey")
    val (_, drCust2, _) = ManifestTable.pruneFiles(spark, root,
      col("o_custkey") === probeCust)
    assert(drCust2.isEmpty, "a dropped field must stop pruning")
    val (_, drKey2, _) = ManifestTable.pruneFiles(spark, root,
      col("o_orderkey") === 16L)
    assert(drKey2.nonEmpty, "the surviving transform must keep pruning")
    ManifestTable.evolvePartitionSpec(spark, root,
      graft.sources.BucketTransform(8, "o_custkey"))
    val (_, drCust3, _) = ManifestTable.pruneFiles(spark, root,
      col("o_custkey") === probeCust)
    assert(drCust3.nonEmpty, "re-adding the field must resume pruning from surviving stats")
    intercept[IllegalArgumentException] {
      ManifestTable.dropPartitionField(spark, root, "nope")
    }
  }

  test("compact and zorder CARRY the partition spec and re-collect its virtual stats") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders, statsColumns = Seq("o_orderkey"))
    ManifestTable.optimizeClusterBy(spark, root,
      graft.sources.BucketTransform(16, "o_orderkey"),
      targetFileBytes = math.max(1L, ManifestTable.tableBytes(spark, root) / 8),
      statsColumns = Seq("o_orderkey"))
    def specNames(v: Long) = ManifestTable.transformsOf(spark, root, v).map(_.name)
    assert(specNames(ManifestTable.versions(spark, root).max) ===
      Seq("bucket_16_o_orderkey"))
    // full compact: spec survives AND the rewritten files prune on it
    val (vC, _) = ManifestTable.compact(spark, root,
      targetFileBytes = math.max(1L, ManifestTable.tableBytes(spark, root) / 8),
      statsColumns = Seq("o_orderkey"))
    assert(specNames(vC) === Seq("bucket_16_o_orderkey"),
      "compact must carry the committed partition spec")
    // the rewritten files carry RE-COLLECTED virtual stats for the spec
    // (layout is compact's own, so pruning power varies — presence is
    // the contract)
    val statsC = ManifestTable.fileStats(spark, root, vC)
    assert(statsC.nonEmpty && statsC.values.forall(
      _.cols.contains("bucket_16_o_orderkey")),
      "compacted files must carry virtual transform stats")
    // zorder on another column: spec still survives alongside the layout
    val (vZ, _) = ManifestTable.optimizeZOrder(spark, root,
      Seq("o_custkey"), targetFileBytes = math.max(1L, ManifestTable.tableBytes(spark, root) / 8))
    assert(specNames(vZ) === Seq("bucket_16_o_orderkey"),
      "zorder must carry the committed partition spec")
  }

  test("CHECK constraints: add validates existing rows; append/merge/overwrite enforce; drop releases") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.filter(col("o_totalprice") > 0))
    // a constraint the current content violates is refused with the count
    intercept[IllegalArgumentException] {
      ManifestTable.addCheckConstraint(spark, root, "impossible", "o_totalprice > 1e12")
    }
    val v = ManifestTable.addCheckConstraint(spark, root, "positive_price", "o_totalprice > 0")
    assert(ManifestTable.manifestFiles(spark, root, v) ===
      ManifestTable.manifestFiles(spark, root, v - 1), "add_constraint must be metadata-only")
    val bad = orders.limit(2).withColumn("o_totalprice", lit(-5.0))
    intercept[IllegalArgumentException] { ManifestTable.append(spark, root, bad) }
    intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, root, bad, "o_orderkey")
    }
    intercept[IllegalArgumentException] { ManifestTable.overwrite(spark, root, bad) }
    // NULL passes (SQL CHECK semantics), valid rows land
    ManifestTable.append(spark, root,
      orders.limit(3).withColumn("o_totalprice", lit(null).cast("double")))
    ManifestTable.dropCheckConstraint(spark, root, "positive_price")
    ManifestTable.append(spark, root, bad) // constraint gone — lands
    assert(ManifestTable.read(spark, root)
      .filter(col("o_totalprice") < 0).count() === 2L)
  }

  test("CHECK constraints ride compaction, clustering, restore, and clone; block rename/drop of their columns") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders, statsColumns = Seq("o_orderkey"))
    ManifestTable.addCheckConstraint(spark, root, "key_pos", "o_orderkey >= 0")
    ManifestTable.compact(spark, root, targetFileBytes = Long.MaxValue)
    assert(ManifestTable.checkConstraintsOf(spark, root,
      ManifestTable.versions(spark, root).max) === Map("key_pos" -> "o_orderkey >= 0"),
      "constraints must survive a compaction rewrite")
    ManifestTable.optimizeClusterBy(spark, root,
      graft.sources.BucketTransform(4, "o_orderkey"),
      targetFileBytes = Long.MaxValue, statsColumns = Seq("o_orderkey"))
    assert(ManifestTable.checkConstraintsOf(spark, root,
      ManifestTable.versions(spark, root).max).contains("key_pos"))
    // enforcement still live after the rewrites
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, root,
        orders.limit(1).withColumn("o_orderkey", lit(-1L)))
    }
    // rename/drop of a constrained column refuse
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "o_orderkey", "order_id")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, root, "o_orderkey")
    }
    // an UNconstrained column still renames fine
    ManifestTable.renameColumn(spark, root, "o_orderpriority", "priority")
    // restore to the pre-constraint version drops it (metadata time travel)
    ManifestTable.restore(spark, root, 1L)
    assert(ManifestTable.checkConstraintsOf(spark, root,
      ManifestTable.versions(spark, root).max).isEmpty)
    // a clone carries the cloned version's constraints
    val root2 = freshRoot()
    ManifestTable.create(spark, root2, orders.limit(10))
    ManifestTable.addCheckConstraint(spark, root2, "key_pos", "o_orderkey >= 0")
    val dst = freshRoot()
    ManifestTable.shallowClone(spark, root2, dst)
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, dst,
        orders.limit(1).withColumn("o_orderkey", lit(-1L)))
    }
  }

  test("merge and delete on a renamed key column rewrite the minority and keep the mapping") {
    val root = freshRoot()
    val sorted = orders.orderBy("o_orderkey").repartitionByRange(4, col("o_orderkey"))
    ManifestTable.create(spark, root, sorted, statsColumns = Seq("o_orderkey"))
    ManifestTable.renameColumn(spark, root, "o_orderkey", "order_id")
    val src = ManifestTable.read(spark, root).filter(col("order_id") === 17L)
      .withColumn("o_orderstatus", lit("X"))
    val (_, mStats) = ManifestTable.merge(spark, root, src, "order_id",
      statsColumns = Seq("order_id"))
    assert(mStats.filesUntouched > 0, s"stats must prune the untouched files: $mStats")
    val upd = ManifestTable.read(spark, root).filter(col("order_id") === 17L)
      .select("o_orderstatus").collect().map(_.getString(0))
    assert(upd.toSeq === Seq("X"))
    val (_, dStats) = ManifestTable.delete(spark, root, col("order_id") === 17L,
      statsColumns = Seq("order_id"))
    assert(dStats.filesUntouched > 0)
    assert(ManifestTable.read(spark, root).filter(col("order_id") === 17L).isEmpty)
  }

  test("shallowClone: zero-copy commit, borrowed files absolute, content identical") {
    val src = freshRoot(); val dst = freshRoot()
    val sorted = orders.orderBy("o_orderkey").repartitionByRange(4, col("o_orderkey"))
    ManifestTable.create(spark, src, sorted, statsColumns = Seq("o_orderkey"))
    val v = ManifestTable.shallowClone(spark, src, dst)
    assert(v === 1L)
    val entries = ManifestTable.manifestFiles(spark, dst, 1L)
    assert(entries.nonEmpty && entries.forall(_.startsWith("/")),
      s"clone entries must be absolute: $entries")
    assert(!new java.io.File(s"$dst/data").exists(), "clone must copy zero data files")
    assert(ManifestTable.read(spark, dst).exceptAll(ManifestTable.read(spark, src)).isEmpty)
    // carried stats prune on the clone without any local collect
    val (_, dropped, _) = ManifestTable.pruneFiles(spark, dst, col("o_orderkey") === 17L)
    assert(dropped.nonEmpty, "carried stats must prune on the clone")
  }

  test("shallowClone: copy-on-write divergence — neither side sees the other's writes") {
    val src = freshRoot(); val dst = freshRoot()
    val sorted = orders.orderBy("o_orderkey").repartitionByRange(4, col("o_orderkey"))
    ManifestTable.create(spark, src, sorted, statsColumns = Seq("o_orderkey"))
    val n = orders.count()
    ManifestTable.shallowClone(spark, src, dst)
    // clone deletes: only the affected borrowed files rewrite, locally
    val (_, dStats) = ManifestTable.delete(spark, dst, col("o_orderkey") < 100L,
      statsColumns = Seq("o_orderkey"))
    assert(dStats.filesUntouched > 0, s"delete must carry the unaffected borrowed files: $dStats")
    assert(ManifestTable.read(spark, src).count() === n, "source must not see the clone's delete")
    // source appends: invisible to the clone
    ManifestTable.append(spark, src, orders.limit(5))
    assert(ManifestTable.read(spark, dst).count() ===
      orders.filter(col("o_orderkey") >= 100L).count())
    // vacuuming the CLONE reclaims nothing borrowed — source stays whole
    ManifestTable.vacuum(spark, dst, keepVersions = 1)
    assert(ManifestTable.read(spark, src).count() === n + 5)
  }

  test("shallowClone: clone-of-clone passes absolute entries through; guards fire") {
    val src = freshRoot(); val mid = freshRoot(); val dst = freshRoot()
    ManifestTable.create(spark, src, orders.limit(50))
    ManifestTable.shallowClone(spark, src, mid)
    ManifestTable.shallowClone(spark, mid, dst)
    assert(ManifestTable.read(spark, dst).count() === 50L)
    assert(ManifestTable.manifestFiles(spark, dst, 1L).forall(_.startsWith(src)),
      "grandchild entries must still point at the ORIGINAL files")
    intercept[IllegalArgumentException] {
      ManifestTable.shallowClone(spark, src, mid) // dest already a table
    }
    intercept[IllegalArgumentException] {
      ManifestTable.shallowClone(spark, freshRoot(), freshRoot()) // src not a table
    }
  }

  test("bucket-transform pruning survives a rename of the clustered source column") {
    import graft.sources.BucketTransform
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(4))
    val target = math.max(1L, ManifestTable.tableBytes(spark, root) / 8)
    ManifestTable.optimizeClusterBy(spark, root,
      BucketTransform(16, "o_orderkey"), target)
    ManifestTable.renameColumn(spark, root, "o_orderkey", "order_id")
    // the committed spec names the PHYSICAL column; the prune-time
    // attribute rewrite maps the logical probe onto it
    val (kept, dropped, _) = ManifestTable.pruneFiles(spark, root, col("order_id") === 17L)
    assert(dropped.nonEmpty, s"transform must still prune after rename (kept=${kept.size})")
    val rows = ManifestTable.readPruned(spark, root, col("order_id") === 17L).collect()
    assert(rows.length === 1)
  }
}
