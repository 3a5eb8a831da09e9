package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{ManifestCatalog, ManifestTable}
import graft.sources.ManifestCatalog.{AppendOp, OverwriteOp}

/** Multi-table transactions: the catalog version vector is the atomic
  * unit. The battery pins the crash windows — staged-but-unpublished is
  * invisible everywhere and GC-able; published-but-unbackfilled is
  * repaired by any reader; a direct write racing the catalog fails
  * loudly, never silently — and that no catalog version ever shows half
  * a transaction. */
class ManifestCatalogSpec extends SparkSpec {
  private def fresh(): String =
    Files.createTempDirectory("manifest_cat").toFile.getAbsolutePath

  private def orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")

  private def mkTables(): (String, String, String) = {
    val cat = fresh(); val fact = s"$cat/fact"; val mart = s"$cat/mart"
    ManifestTable.create(spark, fact, orders.filter(col("o_orderkey") % 3 === 0))
    ManifestTable.create(spark, mart,
      ManifestTable.read(spark, fact).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n")))
    (cat, fact, mart)
  }

  private def martOf(factDf: org.apache.spark.sql.DataFrame) =
    factDf.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

  test("create captures current tips; catalog reads equal direct reads") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    assert(ManifestCatalog.snapshot(spark, cat) === Map("fact" -> 1L, "mart" -> 1L))
    val a = ManifestCatalog.read(spark, cat, "fact").collect().toSet
    assert(a === ManifestTable.read(spark, fact).collect().toSet)
  }

  test("transact lands an append + overwrite atomically; old catalog versions keep the old cut") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    val b1 = orders.filter(col("o_orderkey") % 3 === 1)
    val newFact = orders.filter(col("o_orderkey") % 3 === 0).unionAll(b1)
    val v = ManifestCatalog.transact(spark, cat, Seq(
      AppendOp("fact", b1),
      OverwriteOp("mart", martOf(newFact))))
    assert(v === 2L)
    // new cut: both advanced together
    val factNow = ManifestCatalog.read(spark, cat, "fact")
    val martNow = ManifestCatalog.read(spark, cat, "mart")
    assert(factNow.count() === newFact.count())
    val recomputed = martOf(factNow)
    assert(martNow.exceptAll(recomputed).isEmpty && recomputed.exceptAll(martNow).isEmpty,
      "mart and fact must be mutually consistent at the same catalog version")
    // old cut: BOTH old — no version shows half the transaction
    val factOld = ManifestCatalog.read(spark, cat, "fact", Some(1L))
    val martOld = ManifestCatalog.read(spark, cat, "mart", Some(1L))
    val recomputedOld = martOf(factOld)
    assert(factOld.count() === orders.filter(col("o_orderkey") % 3 === 0).count())
    assert(martOld.exceptAll(recomputedOld).isEmpty && recomputedOld.exceptAll(martOld).isEmpty)
  }

  test("a staged-but-unpublished transaction is invisible and vacuumTxns reclaims it") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    // crash before the catalog publish: an orphaned txn dir
    val orphan = new java.io.File(s"$cat/_graft_txn/deadbeef-orphan")
    orphan.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(orphan.getPath, "fact.manifest"), "# torn")
    assert(ManifestCatalog.snapshot(spark, cat) === Map("fact" -> 1L, "mart" -> 1L))
    assert(ManifestCatalog.vacuumTxns(spark, cat) === 1)
    assert(!orphan.exists())
  }

  test("published-but-unbackfilled is repaired by ANY reader (recovery), idempotently") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    val b1 = orders.filter(col("o_orderkey") % 3 === 1)
    ManifestCatalog.transact(spark, cat, Seq(AppendOp("fact", b1)))
    val expected = ManifestCatalog.read(spark, cat, "fact").collect().toSet
    // simulate the crash window: the catalog published, the table-log
    // backfill never ran — delete the backfilled manifest
    val v2 = new java.io.File(s"$fact/_graft_log/v00000002.manifest")
    assert(v2.exists()); assert(v2.delete())
    assert(ManifestTable.versions(spark, fact) === Seq(1L))
    // any catalog read repairs it
    assert(ManifestCatalog.read(spark, cat, "fact").collect().toSet === expected)
    assert(ManifestTable.versions(spark, fact) === Seq(1L, 2L))
    // and again (idempotent content-compare path)
    assert(ManifestCatalog.read(spark, cat, "fact").collect().toSet === expected)
    // the staged body is still referenced — vacuumTxns must keep it
    assert(ManifestCatalog.vacuumTxns(spark, cat) === 0)
  }

  test("vacuumCatalog recovers BEFORE reclaiming: a crashed publish's staged references survive member vacuum") {
    val saved = ManifestTable.SegmentTargetSize
    ManifestTable.SegmentTargetSize = 8
    try {
      val cat = fresh(); val fact = s"$cat/fact"; val mart = s"$cat/mart"
      ManifestTable.create(spark, fact,
        orders.filter(col("o_orderkey") % 3 === 0).repartition(10)) // segmented
      ManifestTable.create(spark, mart, martOf(ManifestTable.read(spark, fact)))
      ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
      ManifestCatalog.transact(spark, cat,
        Seq(AppendOp("fact", orders.filter(col("o_orderkey") % 3 === 1).repartition(2))))
      val expected = ManifestCatalog.read(spark, cat, "fact").count()
      // crash window: catalog published, backfill lost — and long enough
      // ago that every staged file has aged past the GC grace
      val v2 = new java.io.File(s"$fact/_graft_log/v00000002.manifest")
      assert(v2.exists()); assert(v2.delete())
      val old = System.currentTimeMillis() - ManifestTable.SegmentGcGraceMs - 60000L
      def ageAll(dir: java.io.File): Unit = {
        val fs = dir.listFiles(); if (fs != null) fs.foreach { f =>
          if (f.isDirectory) ageAll(f) else { f.setLastModified(old); () } }
      }
      ageAll(new java.io.File(fact))
      // the catalog-aware vacuum backfills FIRST, so the staged body's
      // data and segment files are live by the time members vacuum
      ManifestCatalog.vacuumCatalog(spark, cat, keepVersions = 2)
      ManifestTable.dropResolvedCacheForTest()
      assert(ManifestCatalog.read(spark, cat, "fact").count() === expected,
        "vacuumCatalog must recover the crashed publish before any member reclaim")
      assert(ManifestTable.versions(spark, fact).contains(2L),
        "the staged target version must be backfilled, not reclaimed")
    } finally ManifestTable.SegmentTargetSize = saved
  }

  test("a direct write outside the catalog fails the next transaction loudly") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    ManifestTable.append(spark, fact, orders.limit(5)) // contract violation
    val e = intercept[IllegalStateException] {
      ManifestCatalog.transact(spark, cat,
        Seq(AppendOp("fact", orders.limit(3))))
    }
    assert(e.getMessage.contains("outside catalog"), e.getMessage)
  }

  test("a direct write squatting a staged target version fails recovery loudly, never silently") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    ManifestCatalog.transact(spark, cat,
      Seq(AppendOp("fact", orders.filter(col("o_orderkey") % 3 === 1))))
    // crash window again, but now a direct writer takes v2 with
    // DIFFERENT content before recovery runs
    val v2 = new java.io.File(s"$fact/_graft_log/v00000002.manifest")
    assert(v2.delete())
    ManifestTable.append(spark, fact, orders.limit(7))
    val e = intercept[IllegalArgumentException] {
      ManifestCatalog.read(spark, cat, "fact")
    }
    assert(e.getMessage.contains("OUTSIDE catalog"), e.getMessage)
  }

  test("table-level machinery rides transactions: generated columns computed in a txn append") {
    val cat = fresh(); val tRoot = s"$cat/t"
    ManifestTable.create(spark, tRoot,
      orders.limit(50).withColumn("o_year", year(col("o_orderdate"))))
    ManifestTable.addGeneratedColumn(spark, tRoot, "o_year", "year(o_orderdate)")
    ManifestCatalog.create(spark, cat, Seq("t" -> tRoot))
    ManifestCatalog.transact(spark, cat,
      Seq(AppendOp("t", orders.filter(col("o_orderkey") <= 200)))) // o_year omitted
    val got = ManifestCatalog.read(spark, cat, "t")
    assert(got.filter(col("o_year") =!= year(col("o_orderdate"))).count() === 0)
  }

  test("sequential transactions advance the vector; snapshot versions are per-cut") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    ManifestCatalog.transact(spark, cat,
      Seq(AppendOp("fact", orders.filter(col("o_orderkey") % 3 === 1))))
    ManifestCatalog.transact(spark, cat, Seq(
      AppendOp("fact", orders.filter(col("o_orderkey") % 3 === 2)),
      OverwriteOp("mart", martOf(orders))))
    assert(ManifestCatalog.versions(spark, cat) === Seq(1L, 2L, 3L))
    assert(ManifestCatalog.snapshot(spark, cat) === Map("fact" -> 3L, "mart" -> 2L))
    assert(ManifestCatalog.snapshot(spark, cat, Some(2L)) === Map("fact" -> 2L, "mart" -> 1L))
    assert(ManifestCatalog.read(spark, cat, "fact").count() === orders.count())
  }

  test("staged txn bodies over a segmented table stage in pointer form: zero full-body renders, reads exact, orphans GC") {
    import graft.sources.ManifestTable.ComposeMeters
    val saved = ManifestTable.SegmentTargetSize
    ManifestTable.SegmentTargetSize = 8
    try {
      val cat = fresh(); val fact = s"$cat/fact"; val mart = s"$cat/mart"
      // a 10-file fact: over the threshold, so its own log and every
      // staged txn body use the pointer form
      ManifestTable.create(spark, fact,
        orders.filter(col("o_orderkey") % 3 === 0).repartition(10))
      ManifestTable.create(spark, mart,
        martOf(ManifestTable.read(spark, fact)))
      ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
      val before = ComposeMeters.fullBodies.get
      val b1 = orders.filter(col("o_orderkey") % 3 === 1).repartition(2)
      val newFact = orders.filter(col("o_orderkey") % 3 === 0).unionAll(
        orders.filter(col("o_orderkey") % 3 === 1))
      val v2 = ManifestCatalog.transact(spark, cat, Seq(
        AppendOp("fact", b1), OverwriteOp("mart", martOf(newFact))))
      val b2 = orders.filter(col("o_orderkey") % 3 === 2).repartition(2)
      val v3 = ManifestCatalog.transact(spark, cat, Seq(AppendOp("fact", b2)))
      assert((v2, v3) === ((2L, 3L)))
      // the FACT's staged bodies never rendered its full file list (the
      // small mart's flat body is below-threshold and renders normally)
      val factRenders = {
        // pointer-form proof is structural: the published manifests for
        // v2/v3 of the fact are ` segs=1` headers
        def head(v: Long): String = {
          val src = scala.io.Source.fromFile(
            java.nio.file.Paths.get(fact, "_graft_log", f"v$v%08d.manifest").toFile)
          try src.getLines().next() finally src.close()
        }
        (head(2L), head(3L))
      }
      assert(factRenders._1.contains(" segs=1") && factRenders._2.contains(" segs=1"),
        s"staged fact bodies must publish in pointer form, got $factRenders")
      // full-body renders during both transactions: only the mart's
      // below-threshold overwrite (1) — never the segmented fact
      assert(ComposeMeters.fullBodies.get - before <= 1L,
        s"staging a segmented table must not render full bodies (${ComposeMeters.fullBodies.get - before})")
      // reads exact, warm and cold
      assert(ManifestCatalog.read(spark, cat, "fact").count() === orders.count())
      ManifestTable.dropResolvedCacheForTest()
      assert(ManifestCatalog.read(spark, cat, "fact").count() === orders.count(),
        "a cold reader must resolve the backfilled pointer body through its segments")
      // an ABANDONED transaction's staged segments are invisible orphans
      // in the fact's log dir; vacuumTxns reclaims the txn dir and the
      // table vacuum reclaims aged orphan segments
      val segsBefore = new java.io.File(s"$fact/_graft_log").listFiles()
        .count(f => f.getName.startsWith("seg-"))
      // ops stage in order: the fact's segments land FIRST, then the
      // mart op fails on a type conflict → abort before publish, the
      // fact's freshly staged segments become invisible orphans
      val failing = try {
        ManifestCatalog.transact(spark, cat, Seq(
          AppendOp("fact", b1.limit(5)),
          AppendOp("mart", b1.limit(5).select(
            col("o_orderkey").cast("double").as("n"), col("o_orderstatus"))))); false
      } catch { case _: Exception => true }
      assert(failing, "a bad op must abort the transaction before publish")
      assert(ManifestCatalog.versions(spark, cat).max === 3L,
        "an aborted transaction must not publish a catalog version")
      assert(ManifestCatalog.read(spark, cat, "fact").count() === orders.count())
      val segsAfter = new java.io.File(s"$fact/_graft_log").listFiles()
        .count(f => f.getName.startsWith("seg-"))
      if (segsAfter > segsBefore) {
        // age the orphans past the GC grace and vacuum the TABLE
        new java.io.File(s"$fact/_graft_log").listFiles()
          .filter(f => f.getName.startsWith("seg-"))
          .foreach(f => { f.setLastModified(
            System.currentTimeMillis() - ManifestTable.SegmentGcGraceMs - 60000L); () })
        ManifestTable.vacuum(spark, fact, keepVersions = 10)
        ManifestTable.dropResolvedCacheForTest()
        assert(ManifestCatalog.read(spark, cat, "fact").count() === orders.count(),
          "vacuum must keep every segment the retained manifests reference")
      }
    } finally ManifestTable.SegmentTargetSize = saved
  }

  test("a pending staged transaction steers direct member vacuum to vacuumCatalog; abandoned markers GC") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    // the crash window between staging and backfill, as the member sees
    // it: the txn dir and the member-side marker exist, the body was
    // never published into the member's log
    val txnId = "feedface-pending"
    new java.io.File(s"$cat/_graft_txn/$txnId").mkdirs()
    val marker = java.nio.file.Paths.get(
      s"$fact/_graft_log/.catalog-staged-$txnId")
    java.nio.file.Files.writeString(marker, cat)
    val e = intercept[IllegalStateException](
      ManifestTable.vacuum(spark, fact, keepVersions = 1))
    assert(e.getMessage.contains("vacuumCatalog"),
      s"refusal must steer to the safe entry point, got: ${e.getMessage}")
    // the catalog-aware vacuum clears the abandoned txn AND its marker
    // (nothing ever published it), then member vacuums proceed
    ManifestCatalog.vacuumCatalog(spark, cat, keepVersions = 1)
    assert(!java.nio.file.Files.exists(marker),
      "abandoned-txn GC must clear the member-side marker")
    assert(ManifestTable.vacuum(spark, fact, keepVersions = 1) >= 0)
  }

  test("an aborted transaction clears its member-side markers on the way out") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    // ops stage in order: fact stages (marker lands), mart's op fails on
    // a type conflict → the transaction aborts before publish
    val aborted = try {
      ManifestCatalog.transact(spark, cat, Seq(
        AppendOp("fact", orders.filter(col("o_orderkey") % 3 === 1)),
        AppendOp("mart", orders.limit(3).select(
          col("o_orderkey").cast("double").as("n"), col("o_orderstatus")))))
      false
    } catch { case _: Exception => true }
    assert(aborted, "the conflicting mart op must abort the transaction")
    val leftover = new java.io.File(s"$fact/_graft_log").listFiles()
      .filter(_.getName.startsWith(".catalog-staged-"))
    assert(leftover.isEmpty,
      s"aborted txns must not leave markers, found ${leftover.map(_.getName).mkString(",")}")
    // direct member vacuum is immediately usable again
    assert(ManifestTable.vacuum(spark, fact, keepVersions = 1) >= 0)
  }

  test("a backfill failure AFTER publish keeps the staged markers: recovery owns them, not the abort path") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    val b1 = orders.filter(col("o_orderkey") % 3 === 1)
    val expected = ManifestTable.read(spark, fact).count() + b1.count()
    // the window the published flag guards: publishCatalog succeeded (a
    // catalog version NAMES the txn), then the eager backfill dies on a
    // transient store error — transact throws, but this is NOT an abort
    ManifestCatalog.failNextBackfillForTest = true
    try {
      val e = intercept[java.io.IOException](
        ManifestCatalog.transact(spark, cat, Seq(AppendOp("fact", b1))))
      assert(e.getMessage.contains("injected"), e.getMessage)
    } finally ManifestCatalog.failNextBackfillForTest = false
    // the member-side witness MUST still stand — clearing it here would
    // let a direct member vacuum reclaim files only the staged body
    // references, before any reader's recovery backfills it
    def markers() = new java.io.File(s"$fact/_graft_log").listFiles()
      .filter(_.getName.startsWith(".catalog-staged-"))
    assert(markers().nonEmpty,
      "post-publish backfill failure must not clear the staged markers")
    val ve = intercept[IllegalStateException](
      ManifestTable.vacuum(spark, fact, keepVersions = 1))
    assert(ve.getMessage.contains("vacuumCatalog"), ve.getMessage)
    // any reader repairs it (recovery backfills, clears the marker), and
    // the transaction's rows are all there — nothing was lost
    assert(ManifestCatalog.read(spark, cat, "fact").count() === expected)
    assert(markers().isEmpty,
      "recovery must clear the marker once the staged body is backfilled")
  }

  test("backfill distinguishes a stuck in-flight copy (strict prefix, retryable) from an outside write (refused)") {
    val (cat, fact, mart) = mkTables()
    ManifestCatalog.create(spark, cat, Seq("fact" -> fact, "mart" -> mart))
    ManifestCatalog.transact(spark, cat,
      Seq(AppendOp("fact", orders.filter(col("o_orderkey") % 3 === 1))))
    // crash window: the backfilled member manifest is lost, and the slot
    // is re-occupied by a STRICT PREFIX of the staged body — the shape a
    // non-atomically-visible claim arm shows while the winner's copy is
    // still in flight (here frozen, so the bounded waits exhaust)
    val txnDirs = new java.io.File(s"$cat/_graft_txn").listFiles()
    assert(txnDirs.length === 1)
    val staged = java.nio.file.Files.readString(
      txnDirs(0).toPath.resolve("fact.manifest"))
    val slot = java.nio.file.Paths.get(s"$fact/_graft_log/v00000002.manifest")
    java.nio.file.Files.writeString(slot, staged.substring(0, staged.length / 2))
    ManifestTable.dropResolvedCacheForTest()
    val e = intercept[IllegalStateException](ManifestCatalog.read(spark, cat, "fact"))
    assert(e.getMessage.contains("strict prefix"),
      s"a frozen in-flight copy must surface the retryable message, got: ${e.getMessage}")
    assert(!e.getMessage.contains("OUTSIDE"),
      "a prefix occupant is not an outside write — the messages must not conflate")
    // once the winner's copy completes, the same recovery goes through
    java.nio.file.Files.writeString(slot, staged)
    ManifestTable.dropResolvedCacheForTest()
    assert(ManifestCatalog.read(spark, cat, "fact").count() > 0)
  }
}
