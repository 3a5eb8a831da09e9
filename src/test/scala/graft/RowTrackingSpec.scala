package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Row tracking (Delta row tracking / Iceberg v3 row lineage): every row
  * gets a table-unique immutable id — fresh files as base + row_index,
  * rewrites via a materialized physical column — so id-preserving
  * rewrites (OPTIMIZE) become provably EMPTY deltas and the change feed
  * survives them. The battery pins the id invariants (uniqueness, block
  * allocation, preservation through every rewrite path, retirement on
  * content-changing ops), the walk's netting across a mid-window
  * compaction (the case positional CDF structurally cannot express),
  * and the high-water mark's monotonicity across RESTORE. */
class RowTrackingSpec extends SparkSpec {
  private def freshRoot(): String =
    Files.createTempDirectory("rowtrack").toFile.getAbsolutePath

  private def orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")

  private def idsOf(root: String): Set[Long] =
    ManifestTable.readWithRowIds(spark, root).select("_row_id")
      .collect().map(_.getLong(0)).toSet

  private def rowsWithIds(root: String): Set[(Long, Long)] =
    ManifestTable.readWithRowIds(spark, root).select("o_orderkey", "_row_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("enable assigns a block per existing file; ids are unique and position-derived") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(3))
    ManifestTable.enableRowTracking(spark, root)
    val n = orders.count()
    val ids = idsOf(root)
    assert(ids.size.toLong === n, "ids must be unique across the table")
    // ids live in per-file blocks of 2^36: block index < #files
    assert(ids.map(_ >> 36).forall(_ < 3), s"unexpected block ids: ${ids.map(_ >> 36)}")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.enableRowTracking(spark, root)
    }
    assert(e.getMessage.contains("already enabled"))
  }

  test("appends allocate fresh blocks; existing ids never move") {
    val root = freshRoot()
    val f = orders.filter(col("o_orderstatus") === "F")
    ManifestTable.create(spark, root, f)
    ManifestTable.enableRowTracking(spark, root)
    val before = rowsWithIds(root)
    ManifestTable.append(spark, root, orders.filter(col("o_orderstatus") === "O"))
    val after = rowsWithIds(root)
    assert(before.subsetOf(after), "appends must not disturb existing ids")
    assert(after.size.toLong ===
      orders.filter(col("o_orderstatus") isin ("F", "O")).count())
  }

  test("compact and zorder preserve every (row, id) pair bit-for-bit") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(4))
    ManifestTable.enableRowTracking(spark, root)
    val before = rowsWithIds(root)
    ManifestTable.compact(spark, root, 64L * 1024 * 1024)
    assert(rowsWithIds(root) === before, "compact must preserve row ids")
    ManifestTable.optimizeZOrder(spark, root, Seq("o_orderkey", "o_custkey"), 64L * 1024 * 1024)
    assert(rowsWithIds(root) === before, "zorder must preserve row ids")
    // plain read stays id-free: the materialized column is invisible
    assert(!ManifestTable.read(spark, root).columns.exists(_.contains("row_id")))
  }

  test("deleteMor removes exactly the deleted ids; purgeDeletes preserves the survivors'") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders)
    ManifestTable.enableRowTracking(spark, root)
    val before = rowsWithIds(root)
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 3 === 0)
    val survivors = rowsWithIds(root)
    assert(survivors === before.filter(_._1 % 3 != 0))
    ManifestTable.purgeDeletes(spark, root)
    assert(rowsWithIds(root) === survivors, "purge must preserve surviving ids")
  }

  test("walk: a compaction mid-window is an EMPTY delta; deletes net through moved positions") {
    val root = freshRoot()
    val f = orders.filter(col("o_orderstatus") === "F")
    ManifestTable.create(spark, root, f.repartition(3))
    ManifestTable.enableRowTracking(spark, root)
    val cursor = ManifestTable.versions(spark, root).max
    // pure-compaction window → zero change rows
    ManifestTable.compact(spark, root, 64L * 1024 * 1024)
    val (feed0, _) = ManifestTable.readChangesRowTracked(spark, root, cursor)
    assert(feed0.count() === 0, "an id-preserving rewrite must be an empty delta")
    // append, compact (positions move!), then delete rows from BOTH the
    // pre-cursor content and the appended batch through the rewrite
    ManifestTable.append(spark, root, orders.filter(col("o_orderstatus") === "O"))
    ManifestTable.compact(spark, root, 64L * 1024 * 1024)
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 5 === 0)
    val (feed, tipV) = ManifestTable.readChangesRowTracked(spark, root, cursor)
    val ins = feed.filter(col("_change_type") === "insert").drop("_change_type")
    val del = feed.filter(col("_change_type") === "delete").drop("_change_type")
    val expIns = orders.filter(col("o_orderstatus") === "O")
      .filter(col("o_orderkey") % 5 =!= 0)
    val expDel = f.filter(col("o_orderkey") % 5 === 0)
    assert(ins.exceptAll(expIns).isEmpty && expIns.exceptAll(ins).isEmpty)
    assert(del.exceptAll(expDel).isEmpty && expDel.exceptAll(del).isEmpty)
    // reconciliation: read(since) − deletes + inserts == read(tip)
    val reconciled = ManifestTable.read(spark, root, Some(cursor))
      .exceptAll(del).unionAll(ins)
    val now = ManifestTable.read(spark, root, Some(tipV))
    assert(reconciled.exceptAll(now).isEmpty && now.exceptAll(reconciled).isEmpty)
  }

  test("walk: delete-then-purge emits the deletes ONCE; restore resurrects as inserts") {
    val root = freshRoot()
    val f = orders.filter(col("o_orderstatus") === "F")
    ManifestTable.create(spark, root, f)
    ManifestTable.enableRowTracking(spark, root)
    val cursor = ManifestTable.versions(spark, root).max
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 2 === 0)
    val afterDelete = ManifestTable.versions(spark, root).max
    ManifestTable.purgeDeletes(spark, root) // materializes; must not re-emit
    val (feed, _) = ManifestTable.readChangesRowTracked(spark, root, cursor)
    assert(feed.filter(col("_change_type") === "insert").count() === 0)
    val del = feed.filter(col("_change_type") === "delete").drop("_change_type")
    val expDel = f.filter(col("o_orderkey") % 2 === 0)
    assert(del.exceptAll(expDel).isEmpty && expDel.exceptAll(del).isEmpty)
    // dv-only restore: resurrection inserts (cursor after the delete)
    val root2 = freshRoot()
    ManifestTable.create(spark, root2, f)
    ManifestTable.enableRowTracking(spark, root2)
    val vClean = ManifestTable.versions(spark, root2).max
    ManifestTable.deleteMor(spark, root2, col("o_orderkey") % 2 === 0)
    val cursor2 = ManifestTable.versions(spark, root2).max
    ManifestTable.restore(spark, root2, vClean)
    val (feed2, _) = ManifestTable.readChangesRowTracked(spark, root2, cursor2)
    assert(feed2.filter(col("_change_type") === "delete").count() === 0)
    val ins2 = feed2.filter(col("_change_type") === "insert").drop("_change_type")
    val exp2 = f.filter(col("o_orderkey") % 2 === 0)
    assert(ins2.exceptAll(exp2).isEmpty && exp2.exceptAll(ins2).isEmpty)
  }

  test("walk serves a MERGE as its id-diff: matched rows emit delete+insert, carried rows stay silent") {
    val root = freshRoot()
    val base = orders.filter(col("o_orderstatus") === "F")
    ManifestTable.create(spark, root, base)
    ManifestTable.enableRowTracking(spark, root)
    val cursor = ManifestTable.versions(spark, root).max
    val updates = base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(orders.filter(col("o_orderstatus") === "O")) // inserts
    ManifestTable.merge(spark, root, updates, "o_orderkey")
    val (feed, tipV) = ManifestTable.readChangesRowTracked(spark, root, cursor)
    val del = feed.filter(col("_change_type") === "delete").drop("_change_type")
    val ins = feed.filter(col("_change_type") === "insert").drop("_change_type")
    // deletes = the matched rows' OLD versions; inserts = the source rows
    val expDel = base.filter(col("o_orderkey") % 7 === 0)
    assert(del.exceptAll(expDel).isEmpty && expDel.exceptAll(del).isEmpty)
    assert(ins.exceptAll(updates).isEmpty && updates.exceptAll(ins).isEmpty)
    // carried (unmatched) rows are provably unchanged → silent; and the
    // delta reconciles: read(since) − deletes + inserts == read(tip)
    val reconciled = ManifestTable.read(spark, root, Some(cursor))
      .exceptAll(del).unionAll(ins)
    val now = ManifestTable.read(spark, root, Some(tipV))
    assert(reconciled.exceptAll(now).isEmpty && now.exceptAll(reconciled).isEmpty)
  }

  test("walk serves a COW DELETE as deletes only; OVERWRITE still refuses") {
    val root = freshRoot()
    val base = orders.filter(col("o_orderstatus") === "F")
    ManifestTable.create(spark, root, base)
    ManifestTable.enableRowTracking(spark, root)
    val cursor = ManifestTable.versions(spark, root).max
    ManifestTable.delete(spark, root, col("o_orderkey") % 4 === 0)
    val (feed, _) = ManifestTable.readChangesRowTracked(spark, root, cursor)
    assert(feed.filter(col("_change_type") === "insert").count() === 0,
      "a COW delete must not emit inserts (survivors kept their ids)")
    val del = feed.filter(col("_change_type") === "delete").drop("_change_type")
    val expDel = base.filter(col("o_orderkey") % 4 === 0)
    assert(del.exceptAll(expDel).isEmpty && expDel.exceptAll(del).isEmpty)
    ManifestTable.overwrite(spark, root, base.limit(10))
    val e = intercept[graft.sources.NotDeltaExpressible] {
      ManifestTable.readChangesRowTracked(spark, root, cursor)._1.count()
    }
    assert(e.getMessage.contains("full refresh"), e.getMessage)
  }

  test("RESTORE never regresses the id high-water mark: retired blocks stay retired") {
    val root = freshRoot()
    val f = orders.filter(col("o_orderstatus") === "F")
    ManifestTable.create(spark, root, f)
    ManifestTable.enableRowTracking(spark, root)
    val vBase = ManifestTable.versions(spark, root).max
    ManifestTable.append(spark, root, orders.filter(col("o_orderstatus") === "O"))
    val retired = idsOf(root) -- {
      ManifestTable.restore(spark, root, vBase)
      idsOf(root)
    }
    assert(retired.nonEmpty, "the dropped append must have owned ids")
    ManifestTable.append(spark, root, orders.filter(col("o_orderstatus") === "P"))
    val after = idsOf(root)
    assert(after.intersect(retired).isEmpty,
      "a post-restore append reused a retired id block")
  }

  test("compactSmall packs ONLY the small tail, carries the big file, preserves ids, empty delta") {
    val root = freshRoot()
    val f = orders.filter(col("o_orderstatus") === "F")
    // one big file + a 4-file small tail from per-batch appends
    ManifestTable.create(spark, root, f.repartition(1))
    ManifestTable.enableRowTracking(spark, root)
    (0 until 4).foreach(i => ManifestTable.append(spark, root,
      orders.filter(col("o_orderstatus") === "O")
        .filter(col("o_orderkey") % 4 === i).repartition(1)))
    val cursor = ManifestTable.versions(spark, root).max
    val files0 = ManifestTable.manifestFiles(spark, root, cursor)
    def sizeOf(p: String): Long = new java.io.File(s"$root/$p").length()
    val bigFile = files0.maxBy(sizeOf)
    val threshold = files0.filterNot(_ == bigFile).map(sizeOf).max + 1
    assert(threshold <= sizeOf(bigFile), "fixture needs a dominant big file")
    val before = rowsWithIds(root)
    val (v, st) = ManifestTable.compactSmall(spark, root,
      minFileBytes = threshold, targetFileBytes = 64L * 1024 * 1024)
    assert(st.filesRewritten === 4 && st.filesUntouched === 1,
      s"exactly the small tail must rewrite, got $st")
    assert(ManifestTable.manifestFiles(spark, root, v).contains(bigFile),
      "the right-sized file must carry byte-identical")
    assert(rowsWithIds(root) === before, "compactSmall must preserve ids")
    val (feed, _) = ManifestTable.readChangesRowTracked(spark, root, cursor)
    assert(feed.count() === 0, "a bin-packing rewrite must be an empty delta")
    // selectivity floor: nothing is smaller than 1 byte → structural no-op
    val (v2, st2) = ManifestTable.compactSmall(spark, root, 1L, 64L * 1024 * 1024)
    assert(v2 === v && st2.filesRewritten === 0,
      s"expected a no-op below every file size, got $st2")
  }

  test("re-enable after a pre-tracking RESTORE resumes the allocator past every granted block") {
    val root = freshRoot()
    val f = orders.filter(col("o_orderstatus") === "F")
    ManifestTable.create(spark, root, f)
    val vPre = ManifestTable.versions(spark, root).max // pre-tracking
    ManifestTable.enableRowTracking(spark, root)
    ManifestTable.append(spark, root, orders.filter(col("o_orderstatus") === "O"))
    val granted = idsOf(root)
    ManifestTable.restore(spark, root, vPre) // tracking drops with the restored meta
    assert(!ManifestTable.rowTrackingEnabled(spark, root,
      ManifestTable.versions(spark, root).max))
    ManifestTable.enableRowTracking(spark, root) // re-enable must not restart at 0
    ManifestTable.append(spark, root, orders.filter(col("o_orderstatus") === "P"))
    assert(idsOf(root).intersect(granted).isEmpty,
      "a re-enabled allocator minted ids an on-disk file already owns")
  }

  test("changeFeed stream survives OPTIMIZE on a row-tracked source (previously a refusal)") {
    val src = freshRoot()
    val dst = freshRoot()
    val ckpt = freshRoot()
    val f = orders.filter(col("o_orderstatus") === "F")
    ManifestTable.create(spark, src, f.repartition(4))
    ManifestTable.enableRowTracking(spark, src)
    ManifestTable.create(spark, dst, f.limit(0))
    def run(): Unit = {
      val q = spark.readStream
        .format("graft.sources.ManifestStreamSourceProvider")
        .option("changeFeed", "true").load(src)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          ManifestTable.applyChangesMor(spark, dst, b, "o_orderkey", "mirror", id); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    // the sequence the positional feed refuses: compact between deltas
    ManifestTable.deleteMor(spark, src, col("o_orderkey") % 3 === 0)
    ManifestTable.compact(spark, src, 64L * 1024 * 1024)
    ManifestTable.append(spark, src, orders.filter(col("o_orderstatus") === "O"))
    run()
    val srcDf = ManifestTable.read(spark, src)
    val dstDf = ManifestTable.read(spark, dst)
    assert(dstDf.exceptAll(srcDf).isEmpty && srcDf.exceptAll(dstDf).isEmpty,
      "mirror must converge across the OPTIMIZE")
  }

  test("includeRowIds: the feed exposes _row_id and an identity-keyed mirror survives DUPLICATE business keys") {
    val src = freshRoot()
    val dst = freshRoot()
    val ckpt = freshRoot()
    val f = orders.filter(col("o_orderstatus") === "F").limit(60)
    // every business key twice: copy B is distinguishable by price only
    val dup = f.unionByName(f.withColumn("o_totalprice", col("o_totalprice") + 1000000.0))
    ManifestTable.create(spark, src, dup.repartition(3))
    ManifestTable.enableRowTracking(spark, src)
    // the stream's schema carries _row_id before _change_type
    val stream = spark.readStream
      .format("graft.sources.ManifestStreamSourceProvider")
      .option("changeFeed", "true").option("includeRowIds", "true").load(src)
    assert(stream.schema.fieldNames.takeRight(2).toSeq === Seq("_row_id", "_change_type"))
    // mirror keyed on IDENTITY: its schema is the source's plus _row_id
    ManifestTable.create(spark, dst, ManifestTable.readWithRowIds(spark, src).limit(0))
    def run(): Unit = {
      val q = stream.writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          ManifestTable.applyChangesMor(spark, dst, b, "_row_id", "mirror", id); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def mirrorEquals(): Unit = {
      val s = ManifestTable.read(spark, src)
      val d = ManifestTable.read(spark, dst).drop("_row_id")
      assert(d.exceptAll(s).isEmpty && s.exceptAll(d).isEmpty,
        "identity-keyed mirror must equal the source EXACTLY, duplicates included")
    }
    run() // initial load carries both copies of every key
    assert(ManifestTable.read(spark, dst).count() === 2L * f.count())
    mirrorEquals()
    // delete ONLY copy B of every third key: a business-key-bound
    // delete would wrongly kill copy A too — identity binding must not
    ManifestTable.deleteMor(spark, src,
      col("o_totalprice") > 1000000.0 && col("o_orderkey") % 3 === 0)
    // and an OPTIMIZE mid-window: ids make it an empty delta
    ManifestTable.compact(spark, src, 64L * 1024 * 1024)
    run()
    mirrorEquals()
    val survivorsA = ManifestTable.read(spark, dst)
      .filter(col("o_orderkey") % 3 === 0 && col("o_totalprice") <= 1000000.0).count()
    assert(survivorsA > 0, "copy-A rows sharing the deleted keys must survive")
    // batch API symmetry: readChangesRowTracked(includeRowId) serves the
    // same ids the table reports
    ManifestTable.append(spark, src, dup.limit(7))
    val (feed, _) = ManifestTable.readChangesRowTracked(spark, src,
      ManifestTable.versions(spark, src).max - 1, includeRowId = true)
    assert(feed.columns.contains("_row_id"))
    assert(feed.filter(col("_row_id").isNull).count() === 0L)
    run()
    mirrorEquals()
  }
}
