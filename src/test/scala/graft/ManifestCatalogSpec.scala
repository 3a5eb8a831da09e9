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
}
