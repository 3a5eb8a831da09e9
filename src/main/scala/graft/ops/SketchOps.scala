package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketching with EXACT cross-engine replay — the
  * HyperLogLog (Flajolet et al. 2007) that an oracle CAN check.
  *
  * Sketches are usually the excuse for rows-only correctness gates
  * (`agg3` pins Spark's built-in `approx_count_distinct` by error bound
  * only, because its HLL implementation is engine-specific). This one is
  * built from primitives both engines compute bit-identically — md5 hex
  * nibbles for the hash, integer register maxes, one integer division
  * for the estimate — so the whole sketch, registers AND estimate,
  * replays in DuckDB.
  *
  * Layout (p = 6, m = 64 registers; standard error 1.04/√64 ≈ 13%):
  * bucket = first two md5 nibbles mod 64; rho = 1 + leading zero BITS of
  * the next 13 nibbles (52 bits, so rho ∈ [1, 53]), derived exactly from
  * the hex text: 4·(leading '0' chars) + zeros within the first nonzero
  * nibble. Estimate: Flajolet's α₆₄ = 0.709 — a PUBLISHED RATIONAL
  * constant, which is what makes the bias-corrected estimate an integer
  * division: E = 709·m²·2⁵³ / (1000·S_scaled) with S_scaled =
  * Σ 2^(53-R_j) a plain BIGINT sum (≤ 64·2⁵³ < 2⁶⁰). The small-range
  * branch (any empty register) is linear counting m·ln(m/V) under the
  * repo's 6-decimal scaled-ln contract. Estimates are micro-units
  * (×10⁶) so both branches stay integer end to end.
  *
  * Scale shape — the reason HLL exists at 100 TB: [[hllRegisters]] is
  * one map-side-combined hash aggregate whose exchange carries AT MOST
  * m rows per group, whatever the corpus size (a billion distinct values
  * shuffle as 64 register rows, vs. countDistinct's shuffle of every
  * distinct value); registers MERGE by union + max ([[hllMerge]]), the
  * property that lets per-partition / per-day sketches combine without
  * re-reading data. */
object SketchOps {

  /** Register count m = 2^6. */
  val M = 64

  /** 709·m²·2⁵³·10⁶ / (1000·10⁰) — the exact integer numerator of the
    * micro-unit raw estimate (26 digits, DECIMAL(38,0)-safe). */
  val RawNumerator = "26157483096520144191488000"

  private def rhoCols(value: Column): (Column, Column) = {
    val hx = md5(value.cast("string"))
    val bucket = conv(substring(hx, 1, 2), 16, 10).cast("long") % M
    val t = substring(hx, 3, 13)
    val z = length(regexp_extract(t, "^0*", 0))
    val n1 = t.substr(z + 1, lit(1))
    val inNibble = when(n1 === "1", 3)
      .when(n1.isin("2", "3"), 2)
      .when(n1.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rho = when(z === 13, lit(53)).otherwise(z * 4 + inNibble + lit(1)).cast("long")
    (bucket, rho)
  }

  /** The sketch: per group, one row per NON-EMPTY register —
    * (groupCols*, bucket, r). NULL values are ignored (SQL distinct-count
    * convention). One hash aggregate, exchange ≤ m rows per group. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val (bucket, rho) = rhoCols(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** Merge sketches: union the register frames, keep the per-bucket max.
    * Associative and idempotent — per-day / per-partition sketches
    * combine into exactly the sketch of the union (spec-pinned). */
  def hllMerge(registers: DataFrame*): DataFrame = {
    val all = registers.reduce(_.unionByName(_))
    val groupCols = all.columns.filterNot(c => c == "bucket" || c == "r")
    all.groupBy((groupCols :+ "bucket").map(col): _*).agg(max(col("r")).as("r"))
  }

  /** Fold a register frame to per-group (n_zero_registers, est_micro):
    * linear counting when any register is empty, the α₆₄ raw estimate
    * otherwise — both exact integer micro-units. The division runs in
    * DECIMAL(38,0) (the numerator is 26 digits) and the quotient lands
    * back in BIGINT: it is at most the numerator over S ≥ 64, i.e. only
    * a sketch whose registers are all astronomically deep could
    * overflow, which 2⁶⁴ distinct values cannot produce. */
  def hllEstimate(registers: DataFrame): DataFrame = {
    val groupCols = registers.columns.filterNot(c => c == "bucket" || c == "r")
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("nb"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))")).as("sp"))
      .select(groupCols.map(col) :+
        (lit(M.toLong) - col("nb")).cast("long").as("n_zero_registers") :+
        when(col("nb") < M,
          lit(M.toLong) *
            round(log(lit(M.toDouble) / (lit(M.toLong) - col("nb"))) * 1e6).cast("long"))
          .otherwise(expr(
            s"CAST(CAST('$RawNumerator' AS DECIMAL(38,0)) div CAST(sp AS DECIMAL(38,0)) AS BIGINT)"))
          .as("est_micro"): _*)
  }

  /** Convenience: sketch + estimate in one call. */
  def hllCountDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol))

  // ---------------------------------------------------------------- CMS

  /** Count-Min depth (independent hash rows) and width (counters per
    * row): d=4, w=256 → error ≤ N·e/w ≈ N/94 with prob 1−e⁻⁴ ≈ 98%. */
  val CmsDepth = 4
  val CmsWidth = 256

  private def cmsRowBuckets(value: Column): Column =
    array((0 until CmsDepth).map { i =>
      struct(lit(i).as("r"),
        conv(substring(md5(concat(lit(s"$i:"), value.cast("string"))), 1, 2), 16, 10)
          .cast("long").as("bucket"))
    }: _*)

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) with the agg9
    * replay contract: row hashes are md5 over a row-seeded prefix, so
    * the counters — and therefore every estimate — are deterministic
    * integers both engines derive identically. One hash aggregate;
    * the exchange carries ≤ d·w = 1024 counter rows per group whatever
    * the corpus size. Counters are LINEAR (sums), so sketches merge by
    * union + per-cell sum ([[cmsMerge]]) — the distributed-combine /
    * per-day-rollup property, and the reason CMS (not a hash map of the
    * full key space) is what a 100 TB frequency pass ships around.
    * Returns (groupCols*, r, bucket, c). */
  def cmsSketch(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ explode(cmsRowBuckets(col(valueCol))).as("rb"): _*)
      .select(groupCols.map(col) :+ col("rb.r").as("r") :+ col("rb.bucket").as("bucket"): _*)
      .groupBy((groupCols :+ "r" :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("c"))

  /** Merge sketches: union + per-cell sum (counter linearity). */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    val all = sketches.reduce(_.unionByName(_))
    val groupCols = all.columns.filterNot(c => c == "r" || c == "bucket" || c == "c")
    all.groupBy((groupCols :+ "r" :+ "bucket").map(col): _*).agg(sum(col("c")).as("c"))
  }

  // ----------------------------------------------- bottom-k quantiles

  /** Mergeable BOTTOM-K quantile sketch — the DETERMINISTIC member of
    * the quantile family (agg8 pins Spark's approx_percentile by error
    * bound only; its sketch is engine-specific): per group keep the k
    * rows whose Knuth hash of the row-identity column is SMALLEST, then
    * report exact rank quantiles OF THE KEPT SAMPLE. The hash order is
    * pseudo-random but fixed, so the kept set is a uniform sample AND a
    * true mergeable sketch — bottomK(A ∪ B) = bottomK(bottomK(A) ∪
    * bottomK(B)), associative/commutative/idempotent (the Theta-sketch
    * sampling core), which is exactly what the bounded `graft_topk`
    * heap computes map-side. Quantile q = the sample value at rank
    * ⌈q·n⌉ under the total order (value, id) — no interpolation — so
    * any engine replays the estimate bit-for-bit from the raw rows.
    *
    * Standard sample-quantile error: |F(est) − q| = O(1/√k) whp.
    *
    * At 100 TB: selection ships ≤k (hash, id) pairs per group per task
    * (no sort, no Window); the sampled ids (groups·k rows) come back
    * through one UN-HINTED semi join — AQE broadcasts it when the
    * observed size is small and shuffles it when group cardinality
    * makes it large; the final per-group sort is over ≤k values.
    * `idCol` must be row-unique, non-null, and non-negative (the sample
    * identity — non-null/non-negative enforced per row at hash time;
    * uniqueness is the caller's contract); `qs` in (0, 1]. */
  /** Output column name for quantile q: whole percents keep the familiar
    * "p95" shape; fractional percents carry the full q ("p99_6") so e.g.
    * qs = Seq(0.996, 1.0) can never collide into duplicate names. */
  private def quantileColName(q: Double): String = {
    val pct = q * 100
    val whole = math.rint(pct)
    if (math.abs(pct - whole) < 1e-9) "p" + whole.toLong
    else ("p" + pct).replace('.', '_')
  }

  def bottomKQuantiles(df: DataFrame, groupCols: Seq[String], idCol: String,
      valueCol: String, k: Int, qs: Seq[Double]): DataFrame = {
    require(k > 0, "k must be positive")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs must lie in (0, 1]")
    val names = qs.map(quantileColName)
    require(names.distinct.size == names.size,
      s"qs derive duplicate output column names: ${names.mkString(", ")}")
    graft.functions.NativeExpressions.register(df.sparkSession)
    // the sample identity contract enforced per row at hash time: a
    // negative (or NULL) id breaks knuth32's uniform-order guarantee, so
    // it fails loudly here instead of silently biasing the sample
    val checkedId = when(
      assert_true(col(idCol).isNotNull && col(idCol) >= 0,
        lit(s"bottomKQuantiles: idCol '$idCol' must be non-null and non-negative")).isNull,
      col(idCol))
    val picked = df
      .withColumn("__negh", negate(SampleOps.knuth32(checkedId).cast("double")))
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"graft_topk(__negh, `$idCol`, $k)").as("__top"))
    val ids = picked.select(explode(col("__top.payload")).as("__sid"))
    // no broadcast hint: the sampled-id frame is groups·k rows — tiny for
    // dashboard-shaped group counts, where AQE broadcasts it at runtime
    // from its OBSERVED size, but group-proportional in general (1M
    // groups × k=128 ≈ 1 GB), where a forced hint would pin a broadcast
    // AQE could never demote. Leaving the join un-hinted keeps the
    // operator safe at any group cardinality.
    val sample = df
      .select(groupCols.map(col) :+ col(idCol).cast("long").as("__sid") :+
        col(valueCol).cast("double").as("__v"): _*)
      .join(ids, Seq("__sid"), "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__v"), col("__sid")))).as("__vs"))
    val qCols = qs.zip(names).map { case (q, name) =>
      element_at(col("__vs"), ceil(lit(q) * size(col("__vs"))).cast("int"))
        .getField("__v").as(name)
    }
    sample.select(groupCols.map(col) ++
      (size(col("__vs")).cast("long").as("sample_n") +: qCols): _*)
  }

  /** Point-query the sketch: est(v) = min over rows of that row's
    * counter — never an undercount, over by at most the collisions the
    * (d, w) bound prices. `probes` supplies one row per queried value;
    * a value the sketch never saw estimates 0 (all its cells empty).
    * The probe side explodes to d rows each and joins the ≤ d·w-row
    * sketch — broadcast-sized by construction. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, valueCol: String): DataFrame = {
    val cells = probes.select(col(valueCol),
        explode(cmsRowBuckets(col(valueCol))).as("rb"))
      .select(col(valueCol), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    cells.join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
