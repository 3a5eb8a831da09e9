package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus clustering — bounded-round Lloyd's k-means (Lloyd 1982) over an
  * embedding column, in EXACT integer fixed point so every round replays
  * bit-for-bit in the DuckDB oracle (the GraphOps contract applied to
  * centroid iteration). Clustering is the curation primitive under
  * topic-balanced mixing, SemDeDup-style dedup, and per-cluster quality
  * audits; at 100 TB it must be a per-round "one broadcast + two
  * map-side-combined aggregates" job, never an all-pairs or driver-side
  * fit (the IVF coarse quantizer's driver Lloyd is deliberately O(sample);
  * this is the full-corpus counterpart).
  *
  * Fixed-point contract:
  *   - coordinates quantize once: `floor(x·10^6 + 0.5) + 2^20` — the sq1
  *     half-up tie rule on the same double both engines derive from the
  *     float32, then an offset that makes every coordinate NON-NEGATIVE
  *     (|x| < 1.048576 required), so the centroid division truncates
  *     identically under Spark's `div` and DuckDB's `//`;
  *   - distances are exact BIGINT sums of squared diffs (≤ 2^21 per
  *     coordinate → ≤ d·2^42, Long-safe through d ≈ 2M dims);
  *   - centroid update is `sum div count` with the sum widened through
  *     DECIMAL(38,0) (DuckDB's sum(BIGINT) is HUGEINT — the WordPiece
  *     overflow lesson: widen BEFORE the op, or Spark wraps where the
  *     oracle doesn't);
  *   - argmin ties break to the SMALLEST cluster id (min over
  *     (dist, cid) — exact lexicographic in both engines).
  *
  * Seeds are the k smallest-id vectors (rank-based, id-density-free);
  * a cluster that loses every member simply drops out of later rounds
  * in both engines (no respawn — deterministic beats clever here).
  *
  * Scale shape per round: one broadcast of k·d integers, one
  * map-side-combined argmin aggregate (k candidate rows per vector
  * reduce to 1 before the exchange), one co-partitioned join back to
  * the quantized corpus, and one (cid, dim) sum aggregate whose
  * exchange carries at most k·d rows per task. Centroids
  * localCheckpoint per round (the pageRank lineage discipline); the
  * quantized corpus persists once and is released when the rounds end.
  */
object ClusterOps {

  /** 1.0 of embedding space = 10^6 fixed-point units. */
  val CoordScale: Long = 1000000L

  /** Added after quantization so every coordinate is non-negative and
    * truncating division = floor division in both engines. Requires
    * |x| < CoordOffset/CoordScale = 1.048576 — embeddings are
    * unit-normalized-ish; a violated bound would break the div contract
    * SILENTLY, so quantization guards it with an in-plan raise_error
    * (codegen'd one-compare-per-element — failing fast beats a
    * probabilistic oracle mismatch). */
  val CoordOffset: Long = 1048576L

  /** (vid, qv): ids cast long, vectors quantized to the fixed-point
    * integer lattice; out-of-range coordinates fail the job loudly. */
  private def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("vid"),
      transform(col(vecCol), x => {
        val xd = x.cast("double")
        when(abs(xd) * CoordScale < CoordOffset,
          floor(xd * CoordScale + lit(0.5)).cast("long") + CoordOffset)
          .otherwise(raise_error(concat(
            lit(s"kmeans coordinate out of fixed-point range (|x| must be < ${CoordOffset.toDouble / CoordScale}): "),
            xd.cast("string"))).cast("long"))
      }).as("qv"))

  /** Exact squared L2 distance between two quantized vectors. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (s, t) => s + t)

  /** Nearest-centroid assignment: (vid, cid, dist), ties to smaller cid.
    * The k candidate rows per vector collapse map-side. */
  private def assign(q: DataFrame, cents: DataFrame): DataFrame =
    q.crossJoin(broadcast(cents))
      .select(col("vid"), col("cid"), sqDist(col("qv"), col("cv")).as("dist"))
      .groupBy("vid")
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("vid"), col("m.cid").as("cid"), col("m.dist").as("dist"))

  /** Gonzalez (1985) farthest-first traversal — k-CENTER seeding: start
    * from the min-id point, then k−1 times pick the point FARTHEST from
    * every seed chosen so far (exact integer squared L2; ties to the
    * smaller id). The classic 2-approximation to k-center, and the
    * deterministic answer to "give me k maximally diverse exemplars" —
    * the coreset/dedup-anchor selection a curation pass wants, where
    * k-means++'s D²-SAMPLING (random by construction) could never meet
    * an oracle. The returned radius sequence is non-increasing and
    * bounds the corpus coverage radius at every prefix.
    *
    * Scale shape: a running (vid, mind) state updated per round with
    * ONE broadcast seed row — `least(mind, dist-to-newest)` — so the
    * whole traversal is O(N·k) distance evaluations, k map-only passes
    * plus k 1-row argmax collects (the BPE bounded-collect precedent);
    * no all-pairs anything. Returns (seed_rank, vec_id, radius) with
    * radius NULL on the rank-1 seed (nothing to be far from yet). */
  def kCenterSeeds(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "kCenterSeeds needs k >= 1")
    val spark = df.sparkSession
    val pts = quantized(df, idCol, vecCol).localCheckpoint()
    def seedVec(id: Long) = pts.filter(col("vid") === id).select(col("qv").as("sv"))
    val first = pts.agg(min(col("vid"))).head().getLong(0)
    var picked = List[(Long, Long, Option[Long])]((1L, first, None))
    var state = pts.crossJoin(broadcast(seedVec(first)))
      .select(col("vid"), col("qv"), sqDist(col("qv"), col("sv")).as("mind"))
      .localCheckpoint()
    (2 to k).foreach { r =>
      val row = state
        .agg(max(struct(col("mind"), (-col("vid")).as("nv"))).as("m"))
        .select(col("m.mind"), (-col("m.nv")).as("pv")).head()
      val (rad, pid) = (row.getLong(0), row.getLong(1))
      picked ::= ((r.toLong, pid, Some(rad)))
      if (r < k) {
        state = state.crossJoin(broadcast(seedVec(pid)))
          .select(col("vid"), col("qv"),
            least(col("mind"), sqDist(col("qv"), col("sv"))).as("mind"))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    picked.reverse.toDF("seed_rank", "vec_id", "radius")
  }

  /** `rounds` Lloyd iterations from the k smallest-id seeds, then a final
    * assignment under the converged centroids. Returns the per-cluster
    * audit face: (cluster_id, n_members, inertia, centroid_sum) —
    * membership, exact total squared distance (DECIMAL(38,0): Long
    * would wrap at web scale), and the centroid coordinate checksum. */
  def kmeansSummary(df: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int): DataFrame = {
    val (fin, cents, release) = kmeansFit(df, idCol, vecCol, k, rounds)
    // exact DECIMAL(38,0) accumulation, double only at the face (the
    // ExactSums convention — identical exact integers convert to
    // identical doubles in both engines)
    val sizes = fin.groupBy("cid")
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist").cast(DecimalType(38, 0))).cast("double").as("inertia"))
    val out = sizes.join(
        cents.select(col("cid"),
          aggregate(col("cv"), lit(0L), (s, t) => s + t).as("centroid_sum")),
        Seq("cid"))
      .select(col("cid").as("cluster_id"), col("n_members"),
        col("inertia"), col("centroid_sum"))
      .localCheckpoint() // materialize before releasing the corpus block
    release()
    out
  }

  /** The fitted state: final assignment (vid, cid, dist), final centroids
    * (cid, cv), and a release handle for the persisted quantized corpus
    * — callers must invoke it after materializing what they need (the
    * GraphOps storage-pressure discipline). */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int): (DataFrame, DataFrame, () => Unit) = {
    require(k >= 1, "need at least one cluster")
    require(rounds >= 1, "need at least one Lloyd round")
    // the corpus feeds every round's assignment AND update join:
    // repartition by vid once so each round's join reuses the layout,
    // persist so rounds don't rescan parquet, release when done
    val q = quantized(df, idCol, vecCol)
      .repartition(col("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // rank-based seeding (k smallest ids): the TakeOrdered path — never
    // assumes dense 0-based ids. The k-row window is post-limit, so the
    // single-partition sort it implies is k rows, not the corpus.
    var cents = q.orderBy("vid").limit(k)
      .select(row_number().over(Window.orderBy("vid")).cast("long").as("cid"),
        col("qv").as("cv"))
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val members = assign(q, cents).select("vid", "cid")
      // per-dimension exact mean: sum widened to DECIMAL(38,0) before
      // the truncating div (both engines floor — coordinates are
      // non-negative by the offset contract)
      val upd = members.join(q, Seq("vid"))
        .select(col("cid"), posexplode(col("qv")).as(Seq("j0", "x")))
        .select(col("cid"), (col("j0") + 1).as("j"), col("x"))
        .groupBy("cid", "j")
        .agg(expr("CAST(sum(CAST(x AS DECIMAL(38,0))) div count(1) AS BIGINT)").as("cj"))
      cents = upd.groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("j"), col("cj")))),
          s => s.getField("cj")).as("cv"))
        .localCheckpoint()
    }
    val fin = assign(q, cents)
    (fin, cents, () => q.unpersist(blocking = false))
  }
}
