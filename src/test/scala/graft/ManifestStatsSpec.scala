package graft

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Data-skipping off the manifest: per-file min/max/nullCount stats +
  * predicate pruning (sources/ManifestStats). The invariant every test
  * leans on: readPruned(filter) ≡ read().filter(filter) EXACTLY, for any
  * predicate — pruning may only change how many files are opened.
  */
class ManifestStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("manifest_stats").toFile.getAbsolutePath

  private def orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")

  /** Pruned and unpruned reads must agree exactly; returns (kept, total). */
  private def checkExact(root: String, filter: Column): (Int, Int) = {
    val pruned = ManifestTable.readPruned(spark, root, filter)
    val full = ManifestTable.read(spark, root).filter(filter)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty,
      s"pruned read diverged for $filter")
    val (kept, dropped, _) = ManifestTable.pruneFiles(spark, root, filter)
    (kept.size, kept.size + dropped.size)
  }

  test("range-clustered table: a selective range predicate skips most files, result exact") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.repartitionByRange(8, col("o_orderdate")),
      statsColumns = Seq("o_orderdate", "o_totalprice"))
    val f = col("o_orderdate") >= lit("1998-01-01").cast("timestamp")
    val (kept, total) = checkExact(root, f)
    assert(total === 8, s"expected 8 range-clustered files, got $total")
    assert(kept < total, s"range predicate pruned nothing ($kept/$total)")
    // a predicate outside every file's range keeps zero files
    val (kept2, _) = checkExact(root, col("o_orderdate") >= lit("2099-01-01").cast("timestamp"))
    assert(kept2 === 0)
  }

  test("predicate shapes: equality, flipped literal, In, Or, between — all exact, all prune") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.repartitionByRange(8, col("o_orderkey")),
      statsColumns = Seq("o_orderkey"))
    val shapes: Seq[Column] = Seq(
      col("o_orderkey") === 17L,
      lit(17L) > col("o_orderkey"), // flipped: attr must be BELOW the literal
      col("o_orderkey").isin(3L, 5L, 5999L),
      col("o_orderkey") < 10L || col("o_orderkey") > 5900L,
      col("o_orderkey").between(100L, 140L))
    shapes.foreach { f =>
      val (kept, total) = checkExact(root, f)
      assert(kept < total, s"no pruning for $f ($kept/$total)")
    }
    // unprunable shapes stay exact and keep everything (keep-biased)
    val (keptAll, totalAll) = checkExact(root, pmod(col("o_orderkey"), lit(7)) === 0)
    assert(keptAll === totalAll)
  }

  test("string stats: equality and prefix predicates prune on a sorted string layout") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.withColumn("status_key", concat(col("o_orderstatus"), lit("-"), col("o_orderkey")))
        .repartitionByRange(6, col("status_key")),
      statsColumns = Seq("status_key"))
    val (k1, t1) = checkExact(root, col("status_key") === "O-4")
    assert(k1 < t1)
    val (k2, t2) = checkExact(root, col("status_key").startsWith("P-"))
    assert(k2 < t2, s"prefix predicate pruned nothing ($k2/$t2)")
  }

  test("null stats: all-null files prune for null-rejecting predicates, IsNull keeps them") {
    val root = freshRoot()
    // file 1: all-null score; file 2: scores 10..19 non-null
    val withNulls = spark.range(0, 10).select(col("id"), lit(null).cast("double").as("score"))
    val noNulls = spark.range(10, 20).select(col("id"), col("id").cast("double").as("score"))
    ManifestTable.create(spark, root, withNulls.coalesce(1), statsColumns = Seq("id", "score"))
    ManifestTable.append(spark, root, noNulls.coalesce(1), statsColumns = Seq("id", "score"))
    val (k1, t1) = checkExact(root, col("score") > 0.0)
    assert(t1 === 2 && k1 === 1, "all-null file must prune for score > 0")
    val (k2, _) = checkExact(root, col("score").isNull)
    assert(k2 === 1, "IsNull must keep ONLY the file with nulls")
    val (k3, _) = checkExact(root, col("score").isNotNull)
    assert(k3 === 1, "IsNotNull must drop the all-null file")
    val (k4, _) = checkExact(root, col("score") <=> lit(null).cast("double"))
    assert(k4 === 1, "null-safe equality with NULL keeps exactly the null file")
  }

  test("stats carry across appends; files committed without stats are never pruned") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.filter(col("o_orderkey") < 3000).repartitionByRange(4, col("o_orderkey")),
      statsColumns = Seq("o_orderkey"))
    // append WITHOUT stats: its files must survive every prune
    ManifestTable.append(spark, root, orders.filter(col("o_orderkey") >= 3000).coalesce(1))
    val tip = ManifestTable.versions(spark, root).max
    assert(ManifestTable.fileStats(spark, root, tip).size === 4,
      "carried files lost their stats across the append")
    val f = col("o_orderkey") === 1L
    val (kept, total) = checkExact(root, f)
    assert(total === 5 && kept === 2,
      s"expected 1 stats-pruned survivor + 1 stats-less file, got $kept/$total")
  }

  test("widening append: a predicate on the new column cannot prune pre-widening files") {
    val root = freshRoot()
    val gen1 = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val gen2 = Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "k", "score")
    ManifestTable.create(spark, root, gen1.coalesce(1), statsColumns = Seq("id"))
    ManifestTable.append(spark, root, gen2.coalesce(1), statsColumns = Seq("id", "score"))
    // gen1 files read score as NULL: `score IS NULL` must keep them
    val (k1, _) = checkExact(root, col("score").isNull)
    assert(k1 >= 1)
    checkExact(root, col("score") > 35.0)
    checkExact(root, col("id") === 1L)
  }

  test("date and decimal domains round-trip through the manifest encoding") {
    val root = freshRoot()
    val df = spark.range(0, 100).select(
      col("id"),
      date_add(lit("2020-01-01").cast("date"), col("id").cast("int")).as("d"),
      (col("id") * 100).cast("decimal(12,2)").as("amt"))
    ManifestTable.create(spark, root, df.repartitionByRange(4, col("id")),
      statsColumns = Seq("d", "amt"))
    val (k1, t1) = checkExact(root, col("d") >= lit("2020-03-15").cast("date"))
    assert(k1 < t1)
    val (k2, t2) = checkExact(root, col("amt") < lit(500).cast("decimal(12,2)"))
    assert(k2 < t2)
  }

  test("compact re-collects stats on the rewritten layout; old versions keep theirs") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.repartitionByRange(8, col("o_orderkey")), statsColumns = Seq("o_orderkey"))
    val (v2, nAfter) = ManifestTable.compact(spark, root, 64L * 1024 * 1024,
      statsColumns = Seq("o_orderkey"))
    assert(ManifestTable.fileStats(spark, root, v2).size === nAfter)
    checkExact(root, col("o_orderkey") === 17L)
    // time travel to the pre-compact version still prunes on ITS stats
    val (kept, _, v) = ManifestTable.pruneFiles(spark, root, col("o_orderkey") === 17L, Some(v2 - 1))
    assert(v === v2 - 1 && kept.size < 8)
  }

  test("stats survive the manifest text round-trip byte-exactly (URL-encoded specials)") {
    val root = freshRoot()
    val tricky = Seq((1L, "a|b,c=d"), (2L, "line\nbreak"), (3L, "plain"))
      .toDF("id", "s")
    ManifestTable.create(spark, root, tricky.coalesce(1), statsColumns = Seq("id", "s"))
    val stats = ManifestTable.fileStats(spark, root, 1L)
    assert(stats.size === 1)
    val cs = stats.head._2.cols("s")
    assert(cs.min.contains("a|b,c=d") && cs.max.contains("plain"))
    checkExact(root, col("s") === "a|b,c=d")
  }

  test("bloom skipping: equality probes prune on a hash-clustered layout where ranges cannot") {
    val root = freshRoot()
    // even ids only, hash-clustered: every file spans ~the full range, so
    // min/max stats are useless for point lookups — the bloom is the
    // only thing that can prune
    val df = spark.range(0, 10000).select((col("id") * 2).as("k"),
      concat(lit("doc-"), col("id") * 2).as("name"))
    ManifestTable.create(spark, root, df.repartition(8, col("k")),
      statsColumns = Seq("k"), bloomColumns = Seq("k", "name"))
    // a PRESENT key lives in exactly one file; false positives may keep
    // a couple more, never all
    val (k1, t1) = checkExact(root, col("k") === 4242L)
    assert(t1 === 8 && k1 < 4, s"bloom kept $k1/$t1 files for a present key")
    // an ABSENT mid-range key (odd) is inside every file's [min,max] —
    // range stats keep all 8, the blooms drop essentially all
    val (k2, _) = checkExact(root, col("k") === 4243L)
    assert(k2 < 4, s"bloom kept $k2/8 files for an absent key")
    // string column probes prune the same way
    val (k3, _) = checkExact(root, col("name") === "doc-4242")
    assert(k3 < 4)
    // In-lists test each element; absent-only lists drop everything modulo FPs
    val (k4, _) = checkExact(root, col("k").isin(1L, 3L, 5L))
    assert(k4 < 4)
    val (k5, _) = checkExact(root, col("k").isin(4242L, 8888L))
    assert(k5 >= 1 && k5 <= 5)
  }

  test("bloom is not consulted across a type-coercion cast (rendering mismatch guard)") {
    val root = freshRoot()
    val df = spark.range(0, 1000).select(col("id").cast("int").as("k"))
    ManifestTable.create(spark, root, df.repartition(4, col("k")),
      bloomColumns = Seq("k"))
    // int column vs double literal coerces both sides to double — the
    // bloom hashed "17", the literal renders "17.0"; the guard must keep
    // the file holding 17 (exactness is the assertion that matters)
    val pruned = ManifestTable.readPruned(spark, root, col("k") === lit(17.0))
    assert(pruned.count() === 1L)
    // same-type probe does use the bloom
    val (kept, total) = checkExact(root, col("k") === 17)
    assert(total === 4 && kept < 4)
  }

  test("blooms round-trip the manifest text and carry across appends") {
    val root = freshRoot()
    val a = spark.range(0, 100).select(col("id").as("k"))
    val b = spark.range(100, 200).select(col("id").as("k"))
    ManifestTable.create(spark, root, a.coalesce(1), bloomColumns = Seq("k"))
    ManifestTable.append(spark, root, b.coalesce(1), bloomColumns = Seq("k"))
    val tip = ManifestTable.versions(spark, root).max
    val stats = ManifestTable.fileStats(spark, root, tip)
    assert(stats.size === 2 && stats.values.forall(_.cols("k").bloom.isDefined),
      "bloom lost in serialization or append carry")
    // probe keys present only in one generation prune the other
    val (k1, t1) = checkExact(root, col("k") === 150L)
    assert(t1 === 2 && k1 === 1)
    val (k2, _) = checkExact(root, col("k") === 50L)
    assert(k2 === 1)
  }

  test("bloom columns refuse non-string/integral types") {
    val root = freshRoot()
    val df = Seq((1L, 2.5)).toDF("id", "score")
    intercept[IllegalArgumentException] {
      ManifestTable.create(spark, root, df, bloomColumns = Seq("score"))
    }
  }

  test("z-order: a 2-d box predicate prunes files on BOTH dimensions; content is exact") {
    val root = freshRoot()
    // uniform 100x100 grid; linear clustering on x would leave y
    // predicates unprunable — the z-order curve serves both
    val grid = spark.range(0, 10000).select(
      (col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"),
      col("id").as("payload"))
    graft.sources.ManifestTable.create(spark, root, grid.repartition(4)) // unclustered
    val (v2, nFiles) = graft.sources.ManifestTable.optimizeZOrder(
      spark, root, Seq("x", "y"), 4L * 1024)
    assert(nFiles >= 8, s"want a multi-file layout to prune against, got $nFiles")
    // content unchanged by the rewrite
    val before = graft.sources.ManifestTable.read(spark, root, Some(1L))
    val after = graft.sources.ManifestTable.read(spark, root, Some(v2))
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    // a small box in (x, y) keeps a small corner of the files
    val box = col("x").between(10L, 20L) && col("y").between(10L, 20L)
    val (kb, tb) = checkExact(root, box)
    assert(kb * 2 < tb, s"2-d box kept $kb/$tb files — curve not localizing")
    // each single dimension prunes too (the z-curve's point over linear)
    val (kx, tx) = checkExact(root, col("x") < 10L)
    assert(kx < tx, s"x-only predicate kept $kx/$tx")
    val (ky, ty) = checkExact(root, col("y") < 10L)
    assert(ky < ty, s"y-only predicate kept $ky/$ty")
  }

  test("z-order handles temporal columns and refuses strings") {
    val root = freshRoot()
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    graft.sources.ManifestTable.create(spark, root, orders.repartition(4))
    val (_, n) = graft.sources.ManifestTable.optimizeZOrder(
      spark, root, Seq("o_orderdate", "o_totalprice"), 16L * 1024)
    assert(n >= 2)
    val f = (col("o_orderdate") >= lit("1997-01-01").cast("timestamp")) &&
      (col("o_totalprice") < 50000.0)
    val (kept, total) = checkExact(root, f)
    assert(kept < total, s"temporal z-order pruned nothing ($kept/$total)")
    intercept[IllegalArgumentException] {
      graft.sources.ManifestTable.optimizeZOrder(spark, root, Seq("o_orderstatus"), 16L * 1024)
    }
  }

  test("countWhere answers range counts mostly from metadata, exactly") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.repartitionByRange(8, col("o_orderkey")),
      statsColumns = Seq("o_orderkey", "o_orderdate"))
    def oracle(f: Column): Long = ManifestTable.read(spark, root).filter(f).count()
    // interior range: full files answer from the manifest, only the two
    // boundary files scan
    val f1 = col("o_orderkey").between(200L, 1200L)
    val (c1, full1, resid1) = ManifestTable.countWhere(spark, root, f1)
    assert(c1 === oracle(f1))
    assert(full1 >= 1, "no file resolved from metadata for an interior range")
    assert(resid1 <= 2, s"range count scanned $resid1 boundary files")
    // whole-table predicate: zero scans
    val f2 = col("o_orderkey") >= 0L
    val (c2, full2, resid2) = ManifestTable.countWhere(spark, root, f2)
    assert(c2 === oracle(f2) && c2 === 1500L)
    assert(full2 === 8 && resid2 === 0, "whole-table count should be scan-free")
    // empty predicate: zero scans, zero count
    val f3 = col("o_orderkey") > 999999L
    val (c3, _, resid3) = ManifestTable.countWhere(spark, root, f3)
    assert(c3 === 0L && resid3 === 0)
    // a predicate on an un-statted column stays exact via full scan
    val f4 = col("o_orderstatus") === "F"
    val (c4, full4, _) = ManifestTable.countWhere(spark, root, f4)
    assert(c4 === oracle(f4) && full4 === 0)
    // conjunction: stats column resolves the envelope, residual scan
    // applies the full predicate (never the envelope alone)
    val f5 = col("o_orderkey").between(200L, 1200L) && col("o_orderstatus") === "F"
    val (c5, full5, _) = ManifestTable.countWhere(spark, root, f5)
    assert(c5 === oracle(f5))
    assert(full5 === 0, "a conjunct the stats can't prove must not count files as full")
  }

  test("countWhere null semantics: IsNull/IsNotNull resolve from nullCount") {
    val root = freshRoot()
    val withNulls = spark.range(0, 10).select(col("id"), lit(null).cast("double").as("score"))
    val noNulls = spark.range(10, 20).select(col("id"), col("id").cast("double").as("score"))
    ManifestTable.create(spark, root, withNulls.coalesce(1), statsColumns = Seq("score"))
    ManifestTable.append(spark, root, noNulls.coalesce(1), statsColumns = Seq("score"))
    val (c1, full1, resid1) = ManifestTable.countWhere(spark, root, col("score").isNull)
    assert(c1 === 10L && full1 === 1 && resid1 === 0)
    val (c2, full2, resid2) = ManifestTable.countWhere(spark, root, col("score").isNotNull)
    assert(c2 === 10L && full2 === 1 && resid2 === 0)
    // value predicates never count null rows: the all-null file is
    // excluded, the value file resolves fully (nullCount == 0)
    val (c3, _, resid3) = ManifestTable.countWhere(spark, root, col("score") >= 10.0)
    assert(c3 === 10L && resid3 === 0)
  }

  test("analyze backfills stats on an existing table without rewriting any data file") {
    val root = freshRoot()
    // created with NO stats: nothing prunes
    ManifestTable.create(spark, root, orders.repartitionByRange(8, col("o_orderkey")))
    val f = col("o_orderkey") < 100L
    val (k0, t0) = checkExact(root, f)
    assert(k0 === t0, "stats-less table must keep everything")
    val filesBefore = ManifestTable.manifestFiles(spark, root, 1L)
    val v2 = ManifestTable.analyze(spark, root, Seq("o_orderkey"),
      bloomColumns = Seq("o_orderstatus"))
    // same files, new version, now skippable
    assert(ManifestTable.manifestFiles(spark, root, v2) === filesBefore,
      "analyze must not rewrite or reorder data files")
    val (k1, t1) = checkExact(root, f)
    assert(k1 < t1, "analyze did not make the table skippable")
    assert(ManifestTable.fileStats(spark, root, v2)
      .values.forall(_.cols("o_orderstatus").bloom.isDefined))
    // countWhere rides the backfilled stats too
    val (n, full, _) = ManifestTable.countWhere(spark, root, col("o_orderkey") >= 0L)
    assert(n === 1500L && full === 8)
    // the change-data-feed is unaffected: same file set is an append-safe lineage
    val (delta, _) = ManifestTable.readChangesSince(spark, root, 1L)
    assert(delta.count() === 0L)
  }

  test("readPrunedByKeys: a small dimension's keys prune the fact scan; join result exact") {
    val root = freshRoot()
    // fact table hash-clustered on the key with blooms — the DPP-analog
    // sweet spot: ranges overlap, blooms carry the pruning
    ManifestTable.create(spark, root, orders.repartition(8, col("o_custkey")),
      bloomColumns = Seq("o_custkey"))
    val dim = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .filter(col("c_custkey") < 5).select(col("c_custkey"))
    val prunedFacts = ManifestTable.readPrunedByKeys(spark, root, "o_custkey", dim)
    val fullFacts = ManifestTable.read(spark, root)
    // the inner join over the pruned scan equals the full-scan join
    val j1 = prunedFacts.join(dim, prunedFacts("o_custkey") === dim("c_custkey"))
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    val j2 = fullFacts.join(dim, fullFacts("o_custkey") === dim("c_custkey"))
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    assert(j1 === j2 && j1.nonEmpty)
    // and the scan really shrank: the pruned frame reads fewer files
    val keptFiles = prunedFacts.select(input_file_name()).distinct().count()
    assert(keptFiles < 8, s"key pruning kept all $keptFiles files")
    // empty key set: schema-correct empty fact frame
    assert(ManifestTable.readPrunedByKeys(spark, root, "o_custkey",
      dim.filter(lit(false))).count() === 0L)
    // over-cap key set falls back to the full read (keep-biased)
    val wide = spark.range(0, 50).select(col("id").as("k"))
    assert(ManifestTable.readPrunedByKeys(spark, root, "o_custkey", wide, maxKeys = 10)
      .count() === fullFacts.count())
  }

  test("big-IN prepared pruning ≡ union of singleton equality prunes (randomized), reads exact on both paths") {
    // the PreparedIn fast path (members canonicalized once, sorted in
    // the attribute's domain, binary-searched per file) must make
    // BIT-IDENTICAL keep/drop decisions to the plain O(k) path. The
    // pinning theorem: In's per-member semantics ARE EqualTo's
    // (both evaluate rangeMay), so for ANY value set,
    //   kept(col IN vs) == ∪_v kept(col = v)
    // — under-keeping (unsound) and over-keeping (perf regression)
    // both break the equality. Randomized over present/absent longs on
    // a bloom'd hash layout, plus the string domain, plus the <8-member
    // plain path for agreement across the threshold.
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(8, col("o_custkey")),
      statsColumns = Seq("o_custkey", "o_orderpriority"),
      bloomColumns = Seq("o_custkey"))
    val custs = orders.select("o_custkey").distinct()
      .as[Long].collect().sorted
    val rnd = new scala.util.Random(42)
    (1 to 6).foreach { round =>
      val k = 8 + rnd.nextInt(60)
      val present = Array.fill(k / 2)(custs(rnd.nextInt(custs.length)))
      val absent = Array.fill(k - k / 2)(900000L + rnd.nextInt(100000).toLong)
      val vals = (present ++ absent).toIndexedSeq
      val inKept = ManifestTable.pruneFiles(spark, root,
        col("o_custkey").isin(vals: _*))._1.toSet
      val unionKept = vals.map(v => ManifestTable.pruneFiles(spark, root,
        col("o_custkey") === v)._1.toSet).reduce(_ ++ _)
      assert(inKept === unionKept,
        s"round $round: IN kept ${inKept.size} files, singleton union ${unionKept.size}")
      checkExact(root, col("o_custkey").isin(vals: _*))
      ()
    }
    // string domain (UTF-8 byte order), both sides of the size threshold
    val small = Seq("1-URGENT", "5-LOW", "zzz-absent")
    checkExact(root, col("o_orderpriority").isin(small: _*))
    val big = small ++ (1 to 10).map(i => s"absent-$i")
    val keptSmall = ManifestTable.pruneFiles(spark, root,
      col("o_orderpriority").isin(small: _*))._1.toSet
    val keptBig = ManifestTable.pruneFiles(spark, root,
      col("o_orderpriority").isin(big: _*))._1.toSet
    assert(keptSmall.subsetOf(keptBig),
      "a superset of IN members must keep at least the subset's files")
    checkExact(root, col("o_orderpriority").isin(big: _*))
    // degenerate members ride along soundly: nulls contribute nothing,
    // a type-mismatched member disables only the bloom gate
    checkExact(root, col("o_custkey").isin(
      (custs.take(4).map(v => v: Any) ++ Seq(null) ++
        (1 to 8).map(i => (900000 + i).toLong: Any)): _*))
  }

  test("float bounds are exact binary values: a strict bound at the rendered value cannot prune") {
    val root = freshRoot()
    // 0.1f IS 0.100000001490116…; its toString renders "0.1". A strict
    // `> 0.1d` predicate matches the row, so the file must survive —
    // stats canonicalized via toString would prune it unsoundly
    val df = Seq(0.1f, 0.05f).toDF("f")
    ManifestTable.create(spark, root, df.coalesce(1), statsColumns = Seq("f"))
    val (kept, _) = checkExact(root, col("f") > lit(0.1d))
    assert(kept === 1, "exact-binary float bound was pruned away")
    assert(ManifestTable.readPruned(spark, root, col("f") > lit(0.1d)).count() === 1L)
  }

  test("string stats compare in UTF-8 byte order (astral plane sorts after U+FFFD, unlike UTF-16)") {
    val root = freshRoot()
    // U+1F600 GRINNING FACE: UTF-16 surrogates D83D DE00 sort BELOW
    // U+FFFD, UTF-8 bytes F0 9F 98 80 sort ABOVE it — Spark compares
    // bytes, so the predicate matches and the file must be kept
    val df = Seq("😀", "😀zz").toDF("s")
    ManifestTable.create(spark, root, df.coalesce(1), statsColumns = Seq("s"))
    val (kept, _) = checkExact(root, col("s") >= "\uFFFD")
    assert(kept === 1, "UTF-16 ordering pruned a byte-order-matching file")
    assert(ManifestTable.readPruned(spark, root, col("s") >= "\uFFFD").count() === 2L)
    // prefix probe on the astral string stays sound too
    checkExact(root, col("s").startsWith("😀"))
  }

  test("analyze after a widening append reads the committed schema, not one file's footer") {
    val root = freshRoot()
    val gen1 = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val gen2 = Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "k", "score")
    ManifestTable.create(spark, root, gen1.coalesce(1))
    ManifestTable.append(spark, root, gen2.coalesce(1))
    // stats on the WIDENED column: footer inference could pick the gen1
    // file and refuse; the committed schema knows better
    val v = ManifestTable.analyze(spark, root, Seq("id", "score"))
    val stats = ManifestTable.fileStats(spark, root, v)
    assert(stats.size === 2)
    // gen1's file reads score as all-NULL: stats must say exactly that
    val gen1Stats = stats.values.find(_.cols("score").min.isEmpty).get
    assert(gen1Stats.cols("score").nullCount === gen1Stats.rowCount)
    checkExact(root, col("score") > 35.0)
    val (n, _, resid) = ManifestTable.countWhere(spark, root, col("score").isNull)
    assert(n === 2L && resid === 0)
  }

  test("unsupported stats columns refuse loudly at write time") {
    val root = freshRoot()
    val df = Seq((1L, Array(1.0, 2.0))).toDF("id", "emb")
    intercept[IllegalArgumentException] {
      ManifestTable.create(spark, root, df, statsColumns = Seq("emb"))
    }
    intercept[IllegalArgumentException] {
      ManifestTable.create(spark, root, df, statsColumns = Seq("nope"))
    }
  }

  // ---- partition transforms (hidden partitioning) --------------------------

  test("bucket transform: driver literal path is bit-identical to Spark's xxhash64 expression") {
    import graft.sources.BucketTransform
    val tl = BucketTransform(16, "k")
    val longs = Seq(0L, 7L, 42L, 1337L, -1L, Long.MaxValue, Long.MinValue)
    val sparkLongs = longs.toDF("k").select(tl.expr.as("b")).as[Int].collect()
    assert(sparkLongs.toSeq === longs.map(v => tl.literal(v).get))
    val ti = BucketTransform(7, "k")
    val ints = Seq(0, 5, -3, Int.MaxValue)
    val sparkInts = ints.toDF("k").select(ti.expr.as("b")).as[Int].collect()
    assert(sparkInts.toSeq === ints.map(v => ti.literal(v).get))
    val ts = BucketTransform(32, "k")
    val strs = Seq("", "a", "hello", "naïve-ünïcode", "😀")
    val sparkStrs = strs.toDF("k").select(ts.expr.as("b")).as[Int].collect()
    assert(sparkStrs.toSeq === strs.map(v => ts.literal(v).get))
  }

  test("bucket-clustered table: point and IN probes on the SOURCE column prune exactly") {
    import graft.sources.BucketTransform
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(4))
    val target = math.max(1L, ManifestTable.tableBytes(spark, root) / 8)
    ManifestTable.optimizeClusterBy(spark, root,
      BucketTransform(16, "o_orderkey"), target)
    // a point probe must keep only the files whose bucket range covers
    // bucket(17) — exact, no blooms involved
    val (kept, total) = checkExact(root, col("o_orderkey") === 17L)
    assert(total >= 4, s"expected a multi-file layout, got $total")
    assert(kept <= 2, s"bucket transform pruned nothing ($kept/$total)")
    val (keptIn, _) = checkExact(root, col("o_orderkey").isin(7L, 42L, 1337L))
    assert(keptIn < total, s"IN probe pruned nothing ($keptIn/$total)")
    // conjunction with an unrelated predicate still prunes (And keeps
    // the translatable side)
    val (keptAnd, _) = checkExact(root,
      col("o_orderkey") === 17L && col("o_totalprice") > 0.0)
    assert(keptAnd <= 2)
  }

  test("bucket transform keep-bias: Or with an untranslatable side, and widened casts, prune nothing") {
    import graft.sources.BucketTransform
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(4))
    val target = math.max(1L, ManifestTable.tableBytes(spark, root) / 8)
    ManifestTable.optimizeClusterBy(spark, root,
      BucketTransform(16, "o_orderkey"), target)
    val (_, total) = checkExact(root, col("o_orderkey") === 17L)
    // Or needs BOTH branches translatable — the price branch isn't
    val (keptOr, _) = checkExact(root,
      col("o_orderkey") === 17L || col("o_totalprice") < 0.0)
    assert(keptOr === total, "Or with an untranslatable branch must keep everything")
    // a fractional literal widens the column side to double: the hash
    // domain changed, translation must refuse (and the result is exact)
    val (keptCast, _) = checkExact(root, col("o_orderkey") === lit(17.5))
    assert(keptCast === total, "widened comparison must not consult the transform")
    // range predicates don't map through a hash
    val (keptRange, _) = checkExact(root, col("o_orderkey") < 100L)
    assert(keptRange === total)
  }

  test("append to a transform-clustered table: spec carries, new files get virtual stats, probes stay exact") {
    import graft.sources.BucketTransform
    val root = freshRoot()
    val split = orders.filter(col("o_orderkey") < 3000L)
    val rest = orders.filter(col("o_orderkey") >= 3000L)
    ManifestTable.create(spark, root, split.repartition(2))
    val target = math.max(1L, ManifestTable.tableBytes(spark, root) / 6)
    ManifestTable.optimizeClusterBy(spark, root,
      BucketTransform(16, "o_orderkey"), target)
    ManifestTable.append(spark, root, rest.repartition(2))
    val tip = ManifestTable.versions(spark, root).max
    assert(ManifestTable.transformsOf(spark, root, tip).nonEmpty,
      "transform spec must survive an append")
    // the appended files are NOT re-clustered (their virtual range may
    // span buckets — sound, just wider); the clustered files still prune
    val (kept, total) = checkExact(root, col("o_orderkey") === 17L)
    assert(kept < total, s"clustered files must still prune after append ($kept/$total)")
  }

  test("bucket-transform pruning survives a RESTORE (spec and virtual stats ride the metadata commit)") {
    import graft.sources.BucketTransform
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(4))
    val target = math.max(1L, ManifestTable.tableBytes(spark, root) / 8)
    ManifestTable.optimizeClusterBy(spark, root,
      BucketTransform(16, "o_orderkey"), target)
    val clusteredV = ManifestTable.versions(spark, root).max
    ManifestTable.overwrite(spark, root, orders.limit(1)) // clustering lost
    ManifestTable.restore(spark, root, clusteredV)
    val tip = ManifestTable.versions(spark, root).max
    assert(ManifestTable.transformsOf(spark, root, tip).nonEmpty,
      "restore must reinstate the transform spec")
    val (kept, total) = checkExact(root, col("o_orderkey") === 17L)
    assert(kept < total, s"restored transform stats must prune ($kept/$total)")
  }

  test("COW merge on a bucket-clustered table rewrites only the probed buckets' files") {
    import graft.sources.BucketTransform
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(4))
    val target = math.max(1L, ManifestTable.tableBytes(spark, root) / 8)
    ManifestTable.optimizeClusterBy(spark, root,
      BucketTransform(16, "o_orderkey"), target)
    val src = ManifestTable.read(spark, root).filter(col("o_orderkey") === 17L)
      .withColumn("o_orderstatus", lit("X"))
    val (_, stats) = ManifestTable.merge(spark, root, src, "o_orderkey")
    assert(stats.filesUntouched > stats.filesRewritten,
      s"merge should rewrite a minority via the transform: $stats")
    val updated = ManifestTable.read(spark, root)
      .filter(col("o_orderkey") === 17L).select("o_orderstatus").as[String].collect()
    assert(updated.toSeq === Seq("X"))
  }

  test("ANALYZE on a transform-clustered table recomputes virtual stats — bucket pruning survives") {
    import graft.sources.BucketTransform
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.repartition(4))
    val target = math.max(1L, ManifestTable.tableBytes(spark, root) / 8)
    ManifestTable.optimizeClusterBy(spark, root,
      BucketTransform(16, "o_orderkey"), target)
    // ANALYZE replaces every file's stats wholesale; the transform spec
    // it carries forward is only useful if the virtual bucket column is
    // re-collected in the same pass
    ManifestTable.analyze(spark, root, statsColumns = Seq("o_totalprice"))
    val (kept, total) = checkExact(root, col("o_orderkey") === 17L)
    assert(kept < total, s"bucket pruning must survive ANALYZE ($kept/$total)")
  }

  test("table rollup: out-of-range predicates skip the whole table in O(columns)") {
    val root = freshRoot()
    val sorted = orders.orderBy("o_orderkey").repartitionByRange(4, col("o_orderkey"))
    ManifestTable.create(spark, root, sorted, statsColumns = Seq("o_orderkey"))
    val maxKey = orders.agg(max("o_orderkey")).collect()(0).getLong(0)
    assert(!ManifestTable.tableMayMatch(spark, root, col("o_orderkey") > maxKey),
      "rollup must prove the table irrelevant past its max key")
    assert(ManifestTable.tableMayMatch(spark, root, col("o_orderkey") === 17L))
    // the prune path takes the same short-circuit: everything drops
    val (kept, dropped, _) = ManifestTable.pruneFiles(spark, root, col("o_orderkey") > maxKey)
    assert(kept.isEmpty && dropped.nonEmpty)
    // count fast path: zero without touching files
    val (n, full, residual) = ManifestTable.countWhere(spark, root, col("o_orderkey") > maxKey)
    assert(n === 0L && full === 0 && residual === 0)
    // nullCount sums exactly: a non-null column prunes IS NULL table-wide
    assert(!ManifestTable.tableMayMatch(spark, root, col("o_orderkey").isNull))
  }

  test("table rollup recomputes at every commit — never rides a carried stats map stale") {
    val root = freshRoot()
    val low = orders.filter(col("o_orderkey") < 700L)
    ManifestTable.create(spark, root, low.repartitionByRange(2, col("o_orderkey")),
      statsColumns = Seq("o_orderkey"))
    assert(!ManifestTable.tableMayMatch(spark, root, col("o_orderkey") >= 700L))
    // append widens the table: the rollup must widen with it
    ManifestTable.append(spark, root,
      orders.filter(col("o_orderkey") >= 700L).repartitionByRange(2, col("o_orderkey")),
      statsColumns = Seq("o_orderkey"))
    assert(ManifestTable.tableMayMatch(spark, root, col("o_orderkey") >= 700L))
    // time travel still answers with the OLD rollup
    assert(!ManifestTable.tableMayMatch(spark, root, col("o_orderkey") >= 700L, Some(1L)))
    // a delete narrows it again — the carried stats map's stale rollup
    // must not survive into the delete's commit
    ManifestTable.delete(spark, root, col("o_orderkey") >= 700L,
      statsColumns = Seq("o_orderkey"))
    assert(!ManifestTable.tableMayMatch(spark, root, col("o_orderkey") >= 700L))
  }

  test("table rollup keep-bias: any stat-less file disables it; renamed columns still route") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders.limit(10)) // no stats at all
    assert(ManifestTable.tableMayMatch(spark, root, col("o_orderkey") > 999999L),
      "no rollup -> keep-biased true")
    val root2 = freshRoot()
    ManifestTable.create(spark, root2, orders.limit(10), statsColumns = Seq("o_orderkey"))
    ManifestTable.append(spark, root2, orders.limit(5)) // stat-less batch
    assert(ManifestTable.tableMayMatch(spark, root2, col("o_orderkey") > 999999L),
      "a stat-less file makes the table unbounded")
    // column mapping: the rollup answers under the LOGICAL name
    val root3 = freshRoot()
    ManifestTable.create(spark, root3, orders.limit(50), statsColumns = Seq("o_orderkey"))
    ManifestTable.renameColumn(spark, root3, "o_orderkey", "order_id")
    assert(!ManifestTable.tableMayMatch(spark, root3, col("order_id") > 999999L))
    assert(ManifestTable.tableMayMatch(spark, root3, col("order_id") >= 0L))
  }

  test("readCatalog routes through rollups: irrelevant tables never reach per-file planning") {
    // three per-range "daily" tables; a point probe touches exactly one
    val roots = (0 until 3).map(_ => freshRoot())
    roots.zipWithIndex.foreach { case (r, i) =>
      ManifestTable.create(spark, r,
        orders.filter(col("o_orderkey") % 3 === i).repartitionByRange(2, col("o_orderkey")),
        statsColumns = Seq("o_orderkey"))
    }
    val probe = orders.select("o_orderkey").as[Long].head()
    val hit = (probe % 3).toInt
    roots.zipWithIndex.foreach { case (r, i) =>
      assert(ManifestTable.tableMayMatch(spark, r, col("o_orderkey") === probe) === (i == hit),
        s"rollup routing wrong for table $i")
    }
    val rows = ManifestTable.readCatalog(spark, roots, col("o_orderkey") === probe).collect()
    assert(rows.length === 1 && rows(0).getAs[Long]("o_orderkey") === probe)
    // a predicate matching nothing anywhere returns schema-correct empty
    val maxKey = orders.agg(max("o_orderkey")).collect()(0).getLong(0)
    val none = ManifestTable.readCatalog(spark, roots, col("o_orderkey") > maxKey)
    assert(none.isEmpty && none.columns.contains("o_orderstatus"))
  }

  test("malformed transform spec lines degrade to no-pruning, never throw") {
    import graft.sources.PartitionTransform
    assert(PartitionTransform.parse("bucket:x:col").isEmpty)
    assert(PartitionTransform.parse("bucket:0:col").isEmpty)
    assert(PartitionTransform.parse("bucket:-4:col").isEmpty)
    assert(PartitionTransform.parse("truncate:8:col").isEmpty) // future kind
    assert(PartitionTransform.parse("bucket:16:col").nonEmpty)
  }

  // ---- footer fast path: stats derived from parquet footers must be
  // BYTE-identical to the scan's (collect with schema=Some forces the
  // scan — the gate only fast-paths schema-less fresh-stage calls) ----

  test("footer stats equal scan stats exactly: long, string (incl. astral), date, timestamp") {
    import graft.sources.ManifestStats
    val root = freshRoot()
    val df = spark.range(0, 1000).select(
        col("id").as("k"),
        concat(lit("vé-😀-"), col("id").cast("string")).as("s"),
        date_add(lit("2020-01-01").cast("date"), col("id").cast("int")).as("d"),
        timestamp_seconds(lit(1622548800L) + col("id")).as("ts"),
        when(col("id") % 7 === 0, lit(null)).otherwise(col("id") * 2).as("nully"))
      .repartition(3)
    val tmp = s"$root/data/tx-test"
    df.write.parquet(tmp)
    val files = new java.io.File(tmp).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => s"data/tx-test/${f.getName}").toSeq.sorted
    val cols = Seq("k", "s", "d", "ts", "nully")
    val footer = ManifestStats.collectFromFooters(spark, root, files, cols)
    val scan = ManifestStats.collect(spark, root, files, cols,
      schema = Some(df.schema)) // schema forces the scan path
    footer match {
      case Some(m) => assert(m === scan, "footer stats diverged from scan stats")
      case None =>
        // acceptable only if the writer produced INT96 timestamps (no
        // usable footer stats) — then drop ts and the rest must match
        val cols2 = cols.filterNot(_ == "ts")
        val f2 = ManifestStats.collectFromFooters(spark, root, files, cols2)
        val s2 = ManifestStats.collect(spark, root, files, cols2, schema = Some(df.schema))
        assert(f2.contains(s2), "footer stats diverged from scan stats (ts-less)")
    }
  }

  test("footer fast path refuses float/double columns (NaN-unsound bounds) and scans instead") {
    import graft.sources.ManifestStats
    val root = freshRoot()
    val df = spark.range(0, 100).select(
      col("id").as("k"),
      when(col("id") === 50, lit(Double.NaN)).otherwise(col("id").cast("double")).as("x"))
    val tmp = s"$root/data/tx-dbl"
    df.coalesce(1).write.parquet(tmp)
    val files = new java.io.File(tmp).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => s"data/tx-dbl/${f.getName}").toSeq
    assert(ManifestStats.collectFromFooters(spark, root, files, Seq("k", "x")).isEmpty,
      "double column must not fast-path")
    // the public collect falls back to the scan and keeps the NaN-safe
    // semantics: max bound dropped (None), file stays unprunable above
    val m = ManifestStats.collect(spark, root, files, Seq("x"))
    val cs = m(files.head).cols("x")
    assert(cs.max.isEmpty, s"NaN must leave the max unbounded, got ${cs.max}")
  }

  test("footer stats handle an all-null column and pruning over footer stats stays exact") {
    val root = freshRoot()
    ManifestTable.create(spark, root,
      orders.withColumn("maybe", when(col("o_orderkey") % 2 === 0, col("o_orderkey")))
        .repartitionByRange(4, col("o_orderkey")),
      statsColumns = Seq("o_orderkey", "maybe"))
    val (kept, total) = checkExact(root, col("o_orderkey") === 17L)
    assert(kept < total, s"footer-stats pruning dropped nothing ($kept/$total)")
    checkExact(root, col("maybe").isNull)
    checkExact(root, col("maybe") > 100L)
  }
}
