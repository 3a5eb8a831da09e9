package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Merge-on-read DELETE (deletion vectors): a [[ManifestTable.deleteMor]]
  * commits NO data files — just a positional sidecar — and every read,
  * rewrite, and maintenance op must honor it. The battery pins the three
  * properties that make MOR safe: reads subtract exactly the deleted
  * positions, no rewrite path can resurrect them, and every consumer that
  * assumes append-only (CDF, streams) refuses rather than silently
  * missing the deletion. */
class DeletionVectorSpec extends SparkSpec {
  private def freshRoot(): String =
    Files.createTempDirectory("manifest_dv").toFile.getAbsolutePath

  private def orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")

  private def tipFiles(root: String): Seq[String] =
    ManifestTable.manifestFiles(spark, root,
      ManifestTable.versions(spark, root).max)

  test("deleteMor removes exactly the pred-true rows with ZERO data files written") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders, statsColumns = Seq("o_orderkey"))
    val before = tipFiles(root)
    val pred = col("o_orderkey") % 7 === 0
    val (v, st) = ManifestTable.deleteMor(spark, root, pred)
    assert(st.newFiles === 0, "MOR delete must stage no data files")
    assert(tipFiles(root).toSet === before.toSet, "file set must be unchanged")
    assert(ManifestTable.deletionVector(spark, root, v).isDefined)
    val expected = orders.filter(not(coalesce(pred, lit(false))))
    val got = ManifestTable.read(spark, root)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("zero-match deleteMor is invisible: no commit, no DvKey churn, incremental consumers unaffected") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders, statsColumns = Seq("o_orderkey"))
    // predicate matching nothing: no new version at all
    val (v1, st1) = ManifestTable.deleteMor(spark, root, col("o_orderkey") < 0)
    assert(v1 === 1L && st1.newFiles === 0,
      "a zero-match MOR delete must return the tip without committing")
    assert(ManifestTable.versions(spark, root) === Seq(1L))
    assert(ManifestTable.deletionVector(spark, root, v1).isEmpty)
    // a real delete, then the SAME predicate again: every matching
    // position is already in the vector, so the re-delete is a no-op
    // too — DvKey churn here would force spurious change-feed refusals
    val pred = col("o_orderkey") % 7 === 0
    val (v2, _) = ManifestTable.deleteMor(spark, root, pred)
    assert(v2 === 2L)
    val dv2 = ManifestTable.deletionVector(spark, root, v2)
    val (v3, st3) = ManifestTable.deleteMor(spark, root, pred)
    assert(v3 === v2 && st3.newFiles === 0,
      "re-deleting already-deleted rows must not commit")
    assert(ManifestTable.deletionVector(spark, root,
      ManifestTable.versions(spark, root).max) === dv2, "DvKey must not churn")
    // the change window over the no-op is empty, not a refusal
    val (feed, tip) = ManifestTable.readChangesWithDeletes(spark, root, v2)
    assert(tip === v2 && feed.isEmpty)
  }

  test("NULL predicate keeps the row (SQL DELETE semantics), same as COW") {
    val root = freshRoot()
    val base = orders.filter(col("o_orderkey") <= 500)
    ManifestTable.create(spark, root, base)
    // TRUE on 'F' rows, NULL otherwise: only the F rows may go
    val pred = when(col("o_orderstatus") === "F", lit(true))
      .otherwise(lit(null).cast("boolean"))
    ManifestTable.deleteMor(spark, root, pred)
    val got = ManifestTable.read(spark, root)
    val expected = base.filter(col("o_orderstatus") =!= "F")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("stacked MOR deletes union into ONE cumulative vector") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders)
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 7 === 0)
    val (v2, _) = ManifestTable.deleteMor(spark, root, col("o_orderstatus") === "F")
    val expected = orders
      .filter(col("o_orderkey") % 7 =!= 0)
      .filter(col("o_orderstatus") =!= "F")
    val got = ManifestTable.read(spark, root)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // one vector at the tip, not a chain — a read applies at most one
    assert(ManifestTable.deletionVector(spark, root, v2).isDefined)
  }

  test("append after deleteMor: new rows ALL visible (even pred-matching); vector carries") {
    val root = freshRoot()
    val half = orders.filter(col("o_orderkey") <= 3000)
    ManifestTable.create(spark, root, half)
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 5 === 0)
    val batch = orders.filter(col("o_orderkey") > 3000) // includes %5==0 keys
    ManifestTable.append(spark, root, batch)
    val expected = half.filter(col("o_orderkey") % 5 =!= 0).unionAll(batch)
    val got = ManifestTable.read(spark, root)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("merge after deleteMor cannot resurrect a deleted row") {
    val root = freshRoot()
    val base = orders.filter(col("o_orderkey") <= 800).coalesce(1)
    val n = base.count()
    ManifestTable.create(spark, root, base, statsColumns = Seq("o_orderkey"))
    val firstKey = base.agg(min("o_orderkey")).head().getLong(0)
    ManifestTable.deleteMor(spark, root, col("o_orderkey") === firstKey)
    // upsert a DIFFERENT key living in the same (single) file
    val someKey = base.agg(max("o_orderkey")).head().getLong(0)
    val src = base.filter(col("o_orderkey") === someKey)
      .withColumn("o_orderpriority", lit("updated"))
    ManifestTable.merge(spark, root, src, "o_orderkey")
    val got = ManifestTable.read(spark, root)
    assert(got.filter(col("o_orderkey") === firstKey).count() === 0,
      "merge rewrite resurrected a MOR-deleted row")
    assert(got.filter(col("o_orderkey") === someKey).head()
      .getAs[String]("o_orderpriority") === "updated")
    assert(got.count() === n - 1)
  }

  test("COW delete after deleteMor composes; vector still applies to untouched files") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders, statsColumns = Seq("o_orderkey"))
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 7 === 0)
    ManifestTable.delete(spark, root, col("o_orderstatus") === "P",
      statsColumns = Seq("o_orderkey"))
    val expected = orders
      .filter(col("o_orderkey") % 7 =!= 0)
      .filter(col("o_orderstatus") =!= "P")
    val got = ManifestTable.read(spark, root)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("compact reads THROUGH the vector and drops it — deletes materialize for free") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(4))
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 3 === 0)
    val before = ManifestTable.read(spark, root)
    val (v, _) = ManifestTable.compact(spark, root, 64L * 1024 * 1024)
    assert(ManifestTable.deletionVector(spark, root, v).isEmpty,
      "compact must not carry the vector over a full rewrite")
    val after = ManifestTable.read(spark, root)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
  }

  test("purgeDeletes rewrites ONLY the vector's files, clears the key, keeps content") {
    val root = freshRoot()
    // two disjoint key ranges in separate commits -> separate files;
    // stats let the delete prune to the low range only
    val low = orders.filter(col("o_orderkey") <= 2000)
    val high = orders.filter(col("o_orderkey") > 2000)
    ManifestTable.create(spark, root, low.coalesce(1), statsColumns = Seq("o_orderkey"))
    ManifestTable.append(spark, root, high.coalesce(1), statsColumns = Seq("o_orderkey"))
    ManifestTable.deleteMor(spark, root, col("o_orderkey") === 32) // a low key
    val before = ManifestTable.read(spark, root)
    val (v, st) = ManifestTable.purgeDeletes(spark, root, statsColumns = Seq("o_orderkey"))
    assert(st.filesRewritten === 1 && st.filesUntouched === 1,
      s"purge must rewrite only the DV'd file, got $st")
    assert(ManifestTable.deletionVector(spark, root, v).isEmpty)
    val after = ManifestTable.read(spark, root)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    // idempotent: purging a clean table is a metadata no-op
    val (v2, st2) = ManifestTable.purgeDeletes(spark, root)
    assert(v2 === v && st2.filesRewritten === 0)
  }

  test("time travel and RESTORE: pre-delete versions keep their rows; restore carries the vector") {
    val root = freshRoot()
    val v1 = ManifestTable.create(spark, root, orders.limit(100))
    val (v2, _) = ManifestTable.deleteMor(spark, root, col("o_orderkey") % 2 === 0)
    assert(ManifestTable.read(spark, root, Some(v1)).count() === 100)
    val n2 = ManifestTable.read(spark, root, Some(v2)).count()
    assert(n2 < 100)
    // restore to the pre-delete version resurrects the rows
    val v3 = ManifestTable.restore(spark, root, v1)
    assert(ManifestTable.deletionVector(spark, root, v3).isEmpty)
    assert(ManifestTable.read(spark, root).count() === 100)
    // restore back to the MOR version carries ITS vector
    val v4 = ManifestTable.restore(spark, root, v2)
    assert(ManifestTable.deletionVector(spark, root, v4).isDefined)
    assert(ManifestTable.read(spark, root).count() === n2)
  }

  test("readChangesSince refuses across a vector change; fine once the cursor passes it") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(50))
    val cursor = ManifestTable.versions(spark, root).max
    val (v2, _) = ManifestTable.deleteMor(spark, root, col("o_orderkey") % 2 === 0)
    val e = intercept[graft.sources.NotDeltaExpressible] {
      ManifestTable.readChangesSince(spark, root, cursor)
    }
    assert(e.getMessage.contains("deletion vector"), e.getMessage)
    // cursor AT the delete-mor version: subsequent appends stream fine
    ManifestTable.append(spark, root, orders.limit(10))
    val (delta, tip) = ManifestTable.readChangesSince(spark, root, v2)
    assert(delta.count() === 10 && tip === v2 + 1)
  }

  test("countWhere is exact on a MOR table (DV'd files demote from the stats fast path)") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders, statsColumns = Seq("o_orderkey"))
    val total = orders.count()
    // full-match fast path first: the whole range matches via stats
    val (n0, full0, _) = ManifestTable.countWhere(spark, root, col("o_orderkey") >= 0)
    assert(n0 === total && full0 > 0)
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 7 === 0)
    val expected = orders.filter(col("o_orderkey") % 7 =!= 0).count()
    val (n1, full1, res1) = ManifestTable.countWhere(spark, root, col("o_orderkey") >= 0)
    assert(n1 === expected, s"counted $n1, expected $expected")
    assert(res1 > 0, "DV'd files must be scanned, not answered from stale stats")
  }

  test("vacuum reclaims superseded vectors, keeps the live one") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(100))
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 2 === 0) // dv A
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 3 === 0) // dv B supersedes A
    val expected = ManifestTable.read(spark, root).collect().toSet
    val dvDir = new java.io.File(root, "_dv")
    assert(dvDir.listFiles().count(_.isDirectory) === 2)
    ManifestTable.vacuum(spark, root, keepVersions = 1)
    assert(dvDir.listFiles().count(_.isDirectory) === 1,
      "superseded vector must be reclaimed")
    assert(ManifestTable.read(spark, root).collect().toSet === expected)
  }

  test("shallow clone of a MOR table reads the source's vector by absolute path") {
    val src = freshRoot()
    val dst = freshRoot() + "/clone"
    ManifestTable.create(spark, src, orders.limit(100))
    ManifestTable.deleteMor(spark, src, col("o_orderkey") % 2 === 0)
    ManifestTable.shallowClone(spark, src, dst)
    val srcRows = ManifestTable.read(spark, src).collect().toSet
    assert(ManifestTable.read(spark, dst).collect().toSet === srcRows)
    // divergence: a purge on the clone rewrites into clone-local storage
    // and must not disturb the source
    ManifestTable.purgeDeletes(spark, dst)
    assert(ManifestTable.read(spark, dst).collect().toSet === srcRows)
    assert(ManifestTable.read(spark, src).collect().toSet === srcRows)
  }

  test("readChangesWithDeletes: the dv diff is the delete feed; net delta reconciles exactly") {
    val root = freshRoot()
    val p1 = orders.filter(col("o_orderkey") <= 3000)
    val p2 = orders.filter(col("o_orderkey") > 3000)
    ManifestTable.create(spark, root, p1)
    val cursor = ManifestTable.versions(spark, root).max
    ManifestTable.append(spark, root, p2)
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 5 === 0)
    val (feed, tip) = ManifestTable.readChangesWithDeletes(spark, root, cursor)
    val ins = feed.filter(col("_change_type") === "insert").drop("_change_type")
    val del = feed.filter(col("_change_type") === "delete").drop("_change_type")
    // inserts: the appended half minus its in-window deletions (net zero)
    val expIns = p2.filter(col("o_orderkey") % 5 =!= 0)
    assert(ins.exceptAll(expIns).isEmpty && expIns.exceptAll(ins).isEmpty)
    // deletes: rows the cursor SAW that are now gone
    val expDel = p1.filter(col("o_orderkey") % 5 === 0)
    assert(del.exceptAll(expDel).isEmpty && expDel.exceptAll(del).isEmpty)
    // reconciliation: read(since) − deletes + inserts == read(tip)
    val reconciled = ManifestTable.read(spark, root, Some(cursor))
      .exceptAll(del).unionAll(ins)
    val now = ManifestTable.read(spark, root, Some(tip))
    assert(reconciled.exceptAll(now).isEmpty && now.exceptAll(reconciled).isEmpty)
  }

  test("readChangesWithDeletes: a RESTORE past a MOR delete resurrects rows as inserts") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.filter(col("o_orderkey") <= 1000))
    val v1 = ManifestTable.versions(spark, root).max
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 2 === 0)
    val cursor = ManifestTable.versions(spark, root).max // post-delete view
    ManifestTable.restore(spark, root, v1) // rows come back
    val (feed, _) = ManifestTable.readChangesWithDeletes(spark, root, cursor)
    assert(feed.filter(col("_change_type") === "delete").count() === 0)
    val ins = feed.filter(col("_change_type") === "insert").drop("_change_type")
    val expected = orders.filter(col("o_orderkey") <= 1000)
      .filter(col("o_orderkey") % 2 === 0)
    assert(ins.exceptAll(expected).isEmpty && expected.exceptAll(ins).isEmpty)
  }

  test("readChangesWithDeletes still refuses file rewrites (only MOR deltas are row-exact)") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(100).repartition(4))
    val cursor = ManifestTable.versions(spark, root).max
    ManifestTable.compact(spark, root, 64L * 1024 * 1024)
    val e = intercept[graft.sources.NotDeltaExpressible] {
      ManifestTable.readChangesWithDeletes(spark, root, cursor)
    }
    assert(e.getMessage.contains("full refresh"), e.getMessage)
  }

  test("compactSmall pulls vector-referenced files into the rewrite regardless of size and drops the vector") {
    val root = freshRoot()
    val bulk = orders.filter(col("o_orderkey") % 10 =!= 0) // ~90% of rows
    val tail = orders.filter(col("o_orderkey") % 10 === 0) // ~10%
    ManifestTable.create(spark, root, bulk.repartition(1)) // one BIG file
    ManifestTable.deleteMor(spark, root, col("o_orderkey") % 7 === 0) // dv on it
    ManifestTable.append(spark, root, tail.repartition(1)) // small tail file
    val files = tipFiles(root)
    def sizeOf(p: String): Long = new java.io.File(s"$root/$p").length()
    val big = files.maxBy(sizeOf)
    val threshold = files.filterNot(_ == big).map(sizeOf).max + 1
    assert(threshold <= sizeOf(big), "fixture needs a dominant big file")
    val (v, st) = ManifestTable.compactSmall(spark, root, threshold, 64L * 1024 * 1024)
    // the big file is over-threshold but vector-referenced → rewritten too
    assert(st.filesRewritten === 2 && st.filesUntouched === 0, s"got $st")
    assert(ManifestTable.deletionVector(spark, root, v).isEmpty,
      "materializing every vector-referenced file must drop the vector")
    val expected = bulk.filter(col("o_orderkey") % 7 =!= 0).unionByName(tail)
    val got = ManifestTable.read(spark, root)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("history/detail report 'unknown' row counts on vector-bearing versions, never a lie") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(100), statsColumns = Seq("o_orderkey"))
    val (v2, _) = ManifestTable.deleteMor(spark, root, col("o_orderkey") % 2 === 0)
    val h = ManifestTable.history(spark, root)
    assert(h.find(_.version == 1L).get.rowCount === Some(100L))
    assert(h.find(_.version == v2).get.rowCount === None,
      "a DV'd version's committed counts are upper bounds — must read as unknown")
    assert(ManifestTable.detail(spark, root).rowCount === None)
  }
}
