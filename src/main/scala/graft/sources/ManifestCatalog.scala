package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table TRANSACTIONS over [[ManifestTable]]s — the catalog-commit
  * design from the public lakehouse systems (Iceberg's REST-catalog
  * multi-table commits; Delta's coordinated commits): the unit of
  * atomicity moves UP from one table's manifest to a catalog VERSION
  * VECTOR naming one version of every member table, and the vector's
  * publish is the same rename-without-overwrite primitive the tables
  * already use. One rename makes an arbitrary set of table changes
  * visible together or not at all.
  *
  * Layout:
  * {{{
  *   <cat>/_graft_catalog/v00000001.catalog   one text file per version
  *   <cat>/_graft_txn/<txnId>/<table>.manifest  staged (unpublished) bodies
  * }}}
  *
  * A catalog file is `# graft-catalog version=N op=X`, one
  * `# table:<name>=<root>` line per member (roots are fixed at
  * [[create]]), then one vector line per table: `name=<version>` or —
  * for tables a transaction changed — `name=txn:<txnId>:<target>`,
  * pointing at a STAGED manifest body the transaction composed but did
  * not publish into the table's own log.
  *
  * Transaction protocol ([[transact]]):
  *  1. resolve the tip vector (running [[recovery]] first);
  *  2. per changed table: stage data + compose the would-be manifest
  *     body against the vector's version of that table (the table's
  *     whole prepare phase runs here — checks, generated columns,
  *     schema widening, stats — via [[ManifestTable.prepareAppend]] /
  *     prepareOverwrite), writing it under `_graft_txn/<txnId>/`;
  *  3. publish catalog version C+1 naming the staged bodies — THE
  *     atomic point. Losing the rename race re-resolves: disjoint
  *     concurrent transactions merge and retry, overlapping ones abort
  *     with the standard concurrent-modification conflict;
  *  4. backfill each staged body into its table's log (idempotent —
  *     content-compared, so any number of crashed/racing recoverers
  *     agree). A crash before 3 leaves staged orphans no reader ever
  *     sees; a crash after 3 is repaired by ANY later reader's
  *     recovery. There is no window where a catalog reader can observe
  *     half a transaction.
  *
  * The caller's contract (the same one Delta documents for coordinated
  * commits): member tables are written ONLY through their catalog.
  * A direct write to a member table races the backfill and fails it
  * loudly — never silently.
  *
  * At 100 TB everything here is driver-side metadata: the catalog file
  * is O(tables) text, staging costs what the table writes themselves
  * cost, and the atomic point is one rename. */
object ManifestCatalog {

  private val LogDir = "_graft_catalog"
  private val TxnDir = "_graft_txn"
  private val Suffix = ".catalog"
  private val TablePrefix = "# table:"
  private val MaxAttempts = 10

  /** One table's change inside a transaction. */
  sealed trait TableOp { def name: String }
  final case class AppendOp(name: String, df: DataFrame,
      statsColumns: Seq[String] = Nil, bloomColumns: Seq[String] = Nil) extends TableOp
  final case class OverwriteOp(name: String, df: DataFrame,
      statsColumns: Seq[String] = Nil, bloomColumns: Seq[String] = Nil) extends TableOp

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def catPath(cat: String, v: Long): Path =
    new Path(f"$cat/$LogDir/v$v%08d$Suffix")

  def versions(spark: SparkSession, cat: String): Seq[Long] = {
    val f = fs(spark, cat)
    val dir = new Path(s"$cat/$LogDir")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).iterator.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(Suffix))
      .map(n => n.stripPrefix("v").stripSuffix(Suffix).toLong)
      .toSeq.sorted
  }

  private def catalogText(spark: SparkSession, cat: String, v: Long): String = {
    val f = fs(spark, cat)
    val in = f.open(catPath(cat, v))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** Member tables (name → root) of `version` (fixed at [[create]]). */
  def tables(spark: SparkSession, cat: String, version: Option[Long] = None): Map[String, String] = {
    val v = resolveVersion(spark, cat, version)
    catalogText(spark, cat, v).linesIterator
      .filter(_.startsWith(TablePrefix))
      .map(_.stripPrefix(TablePrefix).split("=", 2))
      .collect { case Array(n, r) => n -> r }.toMap
  }

  private def resolveVersion(spark: SparkSession, cat: String, version: Option[Long]): Long = {
    val vs = versions(spark, cat)
    require(vs.nonEmpty, s"$cat is not a manifest catalog (no $LogDir)")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"catalog version $v not in log (have ${vs.mkString(",")})")
    v
  }

  /** The raw vector of `version`: table → Left(published version) or
    * Right((txnId, targetVersion)) for entries awaiting backfill. */
  private def rawVector(spark: SparkSession, cat: String,
      v: Long): Map[String, Either[Long, (String, Long)]] =
    catalogText(spark, cat, v).linesIterator
      .filterNot(l => l.startsWith("#") || l.isEmpty)
      .map(_.split("=", 2))
      .collect { case Array(n, ref) =>
        n -> (if (ref.startsWith("txn:")) {
          val Array(_, txnId, target) = ref.split(":", 3)
          Right((txnId, target.toLong))
        } else Left(ref.toLong))
      }.toMap

  /** Resolve `version`'s vector to pure table versions, BACKFILLING any
    * staged transaction manifests into their table logs first (the
    * recovery step — idempotent, any number of concurrent recoverers
    * agree by content compare). */
  def snapshot(spark: SparkSession, cat: String,
      version: Option[Long] = None): Map[String, Long] = {
    val v = resolveVersion(spark, cat, version)
    val roots = tables(spark, cat, Some(v))
    rawVector(spark, cat, v).map {
      case (n, Left(tv)) => n -> tv
      case (n, Right((txnId, target))) =>
        backfill(spark, cat, roots(n), n, txnId, target)
        n -> target
    }
  }

  /** Publish the staged body for (`txnId`, `name`) as `root`'s version
    * `target`; a taken slot must hold EXACTLY the staged body (another
    * recoverer) — anything else is a direct write racing the catalog,
    * refused loudly. */
  /** Test-only failure injection: the next backfill throws instead of
    * publishing — simulates the eager post-publish backfill dying on a
    * transient store error, the window where transact's abort cleanup
    * must NOT clear the member-side staged markers (a published catalog
    * version names the txn; recovery owns the markers from there). */
  private[graft] var failNextBackfillForTest: Boolean = false

  private def backfill(spark: SparkSession, cat: String, root: String,
      name: String, txnId: String, target: Long): Unit = {
    if (failNextBackfillForTest) {
      failNextBackfillForTest = false
      throw new java.io.IOException(s"injected backfill failure for '$name' (test)")
    }
    val staged = stagedBody(spark, cat, txnId, name)
    if (!ManifestTable.publishRaw(spark, root, target, staged)) {
      // a taken slot SHOULD hold exactly the staged body (every
      // backfiller publishes the same bytes). Through a claim arm whose
      // byte copy is not atomically visible, the other recoverer's
      // publish may still be in flight — a strict prefix of the staged
      // bytes (or empty). Re-read briefly before refusing: transient
      // prefix → the winner's copy completes; anything else is a direct
      // write racing the catalog, refused loudly.
      // a slot whose claim was decided but whose object is not visible
      // AT ALL yet reads as missing — treat that as an empty occupant
      // (the degenerate prefix) so it takes the wait path instead of
      // throwing FileNotFoundException past the retries
      def occupantText(): String =
        try ManifestTable.rawManifestText(spark, root, target)
        catch { case _: java.io.FileNotFoundException => "" }
      var occupant = occupantText()
      var waits = 0
      while (occupant != staged && staged.startsWith(occupant) && waits < 10) {
        waits += 1
        Thread.sleep(math.min(200L, 4L << waits))
        occupant = occupantText()
      }
      // two distinct failures: a slot still mid-copy after the bounded
      // waits (transient starvation — retryable) vs bytes that are NOT
      // a prefix of the staged body (a direct write racing the catalog
      // — a contract violation, never retryable)
      if (occupant != staged && staged.startsWith(occupant))
        throw new IllegalStateException(
          s"table '$name' version $target is still a strict prefix of the staged " +
            s"body after $waits bounded waits — the winning recoverer's copy has not " +
            "completed; re-run recovery (snapshot) once the store settles")
      require(occupant == staged,
        s"table '$name' version $target was published OUTSIDE catalog $cat — " +
          "member tables must be written only through their catalog")
    }
    // the staged body is in the member's own log now: direct vacuums on
    // the member are safe again (best-effort — a leftover marker only
    // steers to vacuumCatalog, whose recovery re-runs this delete)
    fs(spark, root).delete(ManifestTable.stagedMarkerPath(root, txnId), false)
    ()
  }

  private def stagedPath(cat: String, txnId: String, name: String): Path =
    new Path(s"$cat/$TxnDir/$txnId/$name.manifest")

  private def stagedBody(spark: SparkSession, cat: String, txnId: String, name: String): String = {
    val f = fs(spark, cat)
    val in = f.open(stagedPath(cat, txnId, name))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** Snapshot-consistent read of one member at a catalog version: every
    * table read at the SAME version lands on one transaction boundary. */
  def read(spark: SparkSession, cat: String, table: String,
      version: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, cat, version)
    require(snap.contains(table),
      s"no table '$table' in catalog (have ${snap.keys.mkString(", ")})")
    ManifestTable.read(spark, tables(spark, cat, version)(table), Some(snap(table)))
  }

  /** Create the catalog at version 1 over existing manifest tables,
    * capturing their current tips as the first consistent cut. */
  def create(spark: SparkSession, cat: String, members: Seq[(String, String)]): Long = {
    require(members.nonEmpty, "a catalog needs at least one member table")
    require(versions(spark, cat).isEmpty, s"$cat already has a catalog log")
    members.foreach { case (n, _) =>
      require(n.nonEmpty && !n.contains("=") && !n.contains(":") && !n.contains("/"),
        s"table name must be '='/':'/'/'-free, got '$n'")
    }
    val vector = members.map { case (n, r) =>
      val vs = ManifestTable.versions(spark, r)
      require(vs.nonEmpty, s"member '$n' at $r is not a manifest table")
      n -> vs.max
    }
    publishCatalog(spark, cat, 1L, "create",
      members.toMap, vector.map { case (n, v) => n -> s"$v" }.toMap)
    1L
  }

  private def publishCatalog(spark: SparkSession, cat: String, next: Long,
      op: String, roots: Map[String, String], entries: Map[String, String]): Boolean = {
    val body = new StringBuilder(s"# graft-catalog version=$next op=$op\n")
    roots.toSeq.sortBy(_._1).foreach { case (n, r) =>
      body.append(TablePrefix).append(n).append('=').append(r).append('\n') }
    entries.toSeq.sortBy(_._1).foreach { case (n, e) =>
      body.append(n).append('=').append(e).append('\n') }
    val f = fs(spark, cat)
    f.mkdirs(new Path(s"$cat/$LogDir"))
    val tmp = new Path(s"$cat/$LogDir/.tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(body.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // same slot primitive as the table log: POSIX rename OVERWRITES an
    // existing destination, so the local arm claims with link(2)
    val won = ManifestTable.atomicClaim(f, tmp, catPath(cat, next))
    f.delete(tmp, false)
    won
  }

  /** Commit `ops` ATOMICALLY across their tables (see the protocol in
    * the object doc). Returns the new catalog version. Concurrent
    * transactions on DISJOINT tables merge and both land; overlapping
    * ones surface the standard concurrent-modification conflict for
    * the caller to re-run. */
  def transact(spark: SparkSession, cat: String, ops: Seq[TableOp]): Long = {
    require(ops.nonEmpty, "empty transaction")
    require(ops.map(_.name).distinct.size == ops.size,
      "one op per table per transaction (compose batches before staging)")
    val roots = tables(spark, cat)
    ops.foreach(o => require(roots.contains(o.name),
      s"no table '${o.name}' in catalog (have ${roots.keys.mkString(", ")})"))
    val base = snapshot(spark, cat) // recovery ran; pure versions
    val txnId = UUID.randomUUID().toString
    val f = fs(spark, cat)
    f.mkdirs(new Path(s"$cat/$TxnDir/$txnId"))
    // an ABORT (staging failure, conflict, lost publish race) leaves a
    // txnId no catalog version will ever name: its member-side staged
    // markers are pure garbage and would block direct member vacuums
    // until the next vacuumTxns — clear the ones this txn wrote on the
    // way out (best-effort; a crash skips this and vacuumTxns covers it)
    val markered = scala.collection.mutable.Buffer.empty[String]
    def clearMarkers(): Unit = markered.foreach { root =>
      try { fs(spark, root).delete(ManifestTable.stagedMarkerPath(root, txnId), false); () }
      catch { case scala.util.control.NonFatal(_) => }
    }
    // Once publishCatalog succeeds, a catalog version NAMES this txnId
    // and its staged bodies are pending recovery — an exception AFTER
    // that point (eager backfill failing transiently) must NOT clear
    // the member-side markers, or a direct ManifestTable.vacuum could
    // reclaim files only the staged bodies reference before the next
    // reader's recovery backfills them. backfill/vacuumTxns own the
    // marker deletes from the moment of publication.
    var published = false
    try {
    // stage: the table's full prepare phase against the CATALOG's view
    // of it; a direct writer that advanced the table past the catalog
    // is the documented contract violation — caught here, not at backfill
    val targets: Map[String, Long] = ops.map { op =>
      val root = roots(op.name)
      val tableTip = ManifestTable.versions(spark, root).max
      if (tableTip != base(op.name)) throw new IllegalStateException(
        s"table '${op.name}' advanced outside catalog $cat (tip v$tableTip, catalog v${base(op.name)}) — " +
          "member tables must be written only through their catalog")
      val v0 = base(op.name)
      val (opName, (nf, b, m, st)) = op match {
        case AppendOp(_, df, sc, bc) =>
          "txn-append" -> ManifestTable.prepareAppend(spark, root, df, Map.empty, sc, bc)
        case OverwriteOp(_, df, sc, bc) =>
          "txn-overwrite" -> ManifestTable.prepareOverwrite(spark, root, df, Map.empty, sc, bc)
      }
      val meta = ManifestTable.metaWithTxnCarry(spark, root, v0, m(v0))
      // pointer form above the segment threshold: staging a big table is
      // O(delta + touched segments), not a full render of its file list
      val body = ManifestTable.composeStagedStored(
        spark, root, v0 + 1, opName, meta, b(v0) ++ nf, st(v0))
      val tmp = new Path(s"$cat/$TxnDir/$txnId/.tmp-${op.name}")
      val out = f.create(tmp, false)
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
      require(f.rename(tmp, stagedPath(cat, txnId, op.name)),
        s"failed to stage txn manifest for '${op.name}'")
      // member-side witness: a direct ManifestTable.vacuum on this
      // member refuses while the staged body is pending (the body
      // references data/segment files that vacuum would read as
      // unreferenced); cleared at backfill and by abandoned-txn GC
      val mf = fs(spark, root)
      val mOut = mf.create(ManifestTable.stagedMarkerPath(root, txnId), true)
      try mOut.write(cat.getBytes(StandardCharsets.UTF_8)) finally mOut.close()
      markered += root
      op.name -> (v0 + 1)
    }.toMap
    // publish: the atomic point. Retries merge with disjoint winners.
    var attempt = 0
    while (attempt < MaxAttempts) {
      attempt += 1
      val tip = resolveVersion(spark, cat, None)
      val cur = rawVector(spark, cat, tip)
      ops.foreach { op =>
        val curV = cur(op.name) match {
          case Left(v) => v
          case Right((_, t)) => t
        }
        if (curV != base(op.name)) throw new IllegalStateException(
          s"concurrent transaction modified '${op.name}' (catalog now at v$curV, planned v${base(op.name)}) — re-run")
      }
      val entries = cur.map {
        case (n, _) if targets.contains(n) => n -> s"txn:$txnId:${targets(n)}"
        case (n, Left(v)) => n -> s"$v"
        case (n, Right((tid, t))) => n -> s"txn:$tid:$t"
      }
      if (publishCatalog(spark, cat, tip + 1, "txn", roots, entries)) {
        published = true
        // eager backfill; any crash from here is repaired by readers
        targets.foreach { case (n, t) => backfill(spark, cat, roots(n), n, txnId, t) }
        return tip + 1
      }
    }
    throw new IllegalStateException(
      s"catalog commit lost $MaxAttempts races at $cat — sustained contention")
    } catch { case e: Throwable => if (!published) clearMarkers(); throw e }
  }

  /** Catalog-aware vacuum: run RECOVERY first (the tip snapshot
    * backfills every staged body into its table's own log, so nothing
    * readable references staged-only state), then vacuum each member
    * table and the staged txn dirs. This is the safe maintenance entry
    * point for catalog members — a direct [[ManifestTable.vacuum]] on a
    * member between a crashed catalog publish and the next reader's
    * recovery could reclaim data/segment files only the staged body
    * references once they age past the GC grace; recovering first
    * closes that window, because backfilled manifests put every
    * referenced file under the table vacuum's own live set. Time
    * travel to catalog cuts OLDER than the members' retained windows
    * degrades exactly as a direct member vacuum would — the tip (and
    * the last `keepVersions` member versions) stay exact. Returns
    * (files reclaimed across members, txn dirs removed). */
  def vacuumCatalog(spark: SparkSession, cat: String,
      keepVersions: Int = 2): (Int, Int) = {
    snapshot(spark, cat) // recovery: every staged body is now published
    // abandoned-txn GC FIRST: it clears the member-side staged markers
    // of transactions that never published, so the member vacuums below
    // don't refuse on witnesses nothing will ever backfill
    val txns = vacuumTxns(spark, cat)
    val reclaimed = tables(spark, cat).values
      .map(root => ManifestTable.vacuum(spark, root, keepVersions)).sum
    (reclaimed, txns)
  }

  /** Reclaim staged transaction dirs no retained catalog version
    * references (aborted or fully superseded transactions). Keeps every
    * txnId any retained vector names — their bodies are the recovery
    * source until backfilled AND remain the content-compare witness
    * after. Returns dirs removed. */
  def vacuumTxns(spark: SparkSession, cat: String): Int = {
    val f = fs(spark, cat)
    val live: Set[String] = versions(spark, cat).flatMap(v =>
      rawVector(spark, cat, v).values.collect { case Right((tid, _)) => tid }).toSet
    val dir = new Path(s"$cat/$TxnDir")
    var removed = 0
    val deadTxns = Seq.newBuilder[String]
    if (f.exists(dir)) f.listStatus(dir).foreach { d =>
      if (!live.contains(d.getPath.getName)) {
        deadTxns += d.getPath.getName
        f.delete(d.getPath, true); removed += 1
      }
    }
    // clear the dead transactions' member-side staged markers — an
    // abandoned (never-published) txn left witnesses nothing will ever
    // backfill, and they'd block direct member vacuums forever
    val dead = deadTxns.result()
    if (dead.nonEmpty) tables(spark, cat).values.foreach { root =>
      val mf = fs(spark, root)
      dead.foreach(tid =>
        mf.delete(ManifestTable.stagedMarkerPath(root, tid), false))
    }
    removed
  }
}
