package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage quantization (int8) — the standard compression step
  * of a large-scale vector corpus before ANN indexing.
  *
  * At 100 TB the embedding store is usually the single largest artifact
  * of a training-data pipeline: 64-dim float32 is 256 bytes/vector;
  * symmetric int8 cuts that 4× (codes + one scale per vector) at a
  * recall cost that sq2's gate measures in-query rather than assumes.
  * This is per-vector SCALAR quantization (every code decodes
  * independently — a pure projection, no codebook to train or ship);
  * IVF/PQ-style trained codebooks live with the quantizer in
  * SimilarityOps (ivfQuantize) — the two compose: IVF partitions,
  * int8 compresses the residuals.
  *
  * Determinism contract (same as SampleOps/ExactSums): every step is an
  * elementwise double op with an engine-independent result — cast to
  * double, one division, floor, clamp, multiply. No reduction whose
  * order could differ between engines or partitionings; max() over a
  * list is order-insensitive. The DuckDB oracle re-derives codes
  * bit-identically from the same formula.
  *
  * Scale shape: all of this is a narrow per-row projection — no
  * shuffle, no state, codegen'd end to end; it composes with any scan.
  */
object QuantizeOps {

  /** Per-vector symmetric scale: max|x| / 127 (double). Zero only for an
    * all-zero vector (degenerate input — codes all 0, recon exact). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** int8 codes: round-half-up(x / scale), clamped to [-127, 127].
    * Explicit floor(x/scale + 0.5) rather than round() so both engines
    * state the identical tie rule; clamp covers the ±ulp case where the
    * max element lands a hair above 127. */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0d, lit(0))
        .otherwise(greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") / scale + lit(0.5)))).cast("int")))

  /** Reconstruction: code * scale, as array<double> — what an ANN query
    * actually scores against after storage quantization. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** One-stop: (vec_id, n_dims, scale, codes, recon, max_abs_err) for a
    * corpus with an array<float> embedding column. max_abs_err is the
    * worst per-element reconstruction error — bounded by scale/2 + ulp
    * by construction (spec-pinned). */
  def quantizeCorpus(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol), vd.as("e"))
      .withColumn("scale", int8Scale(col("e")))
      .withColumn("codes", int8Codes(col("e"), col("scale")))
      .withColumn("recon", dequantize(col("codes"), col("scale")))
      .withColumn("max_abs_err",
        array_max(zip_with(col("e"), col("recon"), (x, r) => abs(x - r))))
  }

  // ---- product quantization (PQ) ----
  //
  // The next rung of the compression ladder: int8 above is 4×; PQ at
  // m=8 subspaces × k=16 centroids is one 4-bit code per subspace —
  // 64 float32 dims collapse to 8 small ints + a shared m×k×(dim/m)
  // codebook. The codebook is TRAINED (per-subspace k-means), so PQ
  // inherits the IVF quantizer's whole determinism discipline
  // (SimilarityOps.ivfQuantize): bounded positional-prefix sample with
  // zero extra jobs, single-task fit, fixed seed — the fitted codebook
  // (and every downstream result) is identical under local[4/32].
  // Encoding is per-subspace nearest-centroid via the SAME
  // graft_nearest_cells kernel the IVF probe uses, on sliced
  // subvectors. IVF and PQ compose into the standard IVF-PQ stack:
  // IVF partitions the corpus, PQ compresses within cells.

  /** Train the PQ codebook: `m` subspaces, `k` centroids each, fitted
    * on a bounded deterministic sample. Returns codebook(j)(c) = the
    * c-th centroid of subspace j (dim/m doubles).
    *
    * The fit runs ON THE DRIVER over the collected sample — a
    * deliberate exception to the no-collect rule, and the right shape:
    * the sample is O(1)-bounded by construction (≤ 4 × 40k rows
    * regardless of corpus size), and m subspaces × maxIter Lloyd
    * rounds through MLlib is 40+ tiny Spark jobs serializing on the
    * DAGScheduler event loop (measured 15-18 s at any SF — pure
    * scheduling latency, not compute). Seeded driver-side Lloyd's on
    * ~10k × 8-dim points is sub-second, bit-deterministic, and
    * parallelism-independent by construction (no distributed
    * reduction order to stabilize at all). */
  def pqFit(
      corpus: DataFrame,
      vecCol: String,
      dim: Int,
      m: Int = 8,
      k: Int = 16,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sd = dim / m
    // same sampling contract as SimilarityOps.ivfQuantize (see the
    // notes there): positional prefix of the raw scan partitioning,
    // constant budget, no count() job; row order inside the single
    // collected partition is file order — stable
    val sampleTarget = math.max(40L * k, 1024L)
    // cast to double IN THE PLAN (exact for float inputs) so both
    // array<float> and array<double> vector columns collect uniformly —
    // getSeq[Float] on a double column would ClassCastException at
    // collect time with an opaque message. The projection changes
    // neither partitioning nor row positions, so the positional sample
    // is untouched.
    val sample: Array[Array[Double]] = SampleOps.positionalPrefixSample(
        corpus.select(transform(col(vecCol), x => x.cast("double")).as("c_vec")),
        sampleTarget)
      .coalesce(1)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= k, s"PQ fit needs >= $k sample vectors, got ${sample.length}")
    (0 until m).toArray.map { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * sd, (j + 1) * sd))
      lloyd(pts, k, maxIter = 5, seed + j)
    }
  }

  /** Plain seeded Lloyd's iterations (the textbook k-means loop):
    * random-init from distinct sample points, assign to nearest
    * centroid by squared L2, recompute means; an emptied cluster keeps
    * its previous centroid. Sequential arithmetic in a fixed order —
    * nothing here can vary with partitioning or thread count. */
  private def lloyd(
      points: Array[Array[Double]], k: Int, maxIter: Int, seed: Long): Array[Array[Double]] = {
    val sd = points.head.length
    val rnd = new scala.util.Random(seed)
    val centroids = rnd.shuffle(points.indices.toVector).take(k)
      .map(i => points(i).clone).toArray
    val assign = new Array[Int](points.length)
    for (_ <- 0 until maxIter) {
      var p = 0
      while (p < points.length) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < sd) { val t = points(p)(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(p) = best
        p += 1
      }
      val sums = Array.fill(k)(new Array[Double](sd))
      val counts = new Array[Long](k)
      p = 0
      while (p < points.length) {
        val c = assign(p); counts(c) += 1
        var i = 0
        while (i < sd) { sums(c)(i) += points(p)(i); i += 1 }
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < sd) { centroids(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
    }
    centroids
  }

  /** A k×dim codebook as ONE literal Column (`typedLit`, not SQL text):
    * a 256×8 codebook rendered as `array(array(...))` source was ~40 KB
    * of text PER REFERENCE — with two references per subspace the sq3/
    * ann7 expressions ran to hundreds of KB that the SQL parser and
    * ConstantFolding chewed through on the driver every run. The typed
    * literal is the same ArrayType(ArrayType(Double)) value (Double
    * text round-trips exactly, so nothing else ever differed) with
    * zero parse/fold work. */
  private[graft] def centroidsLit(cb: Array[Array[Double]]): Column =
    typedLit[Seq[Seq[Double]]](cb.map(_.toSeq).toSeq)

  /** PQ codes for a float-vector column: array<int> of length m,
    * code j = nearest centroid of subspace j — the SAME
    * graft_nearest_cells kernel as the IVF probe, over sliced
    * subvectors. Callers must have run NativeExpressions.register. */
  def pqEncode(vecCol: String, codebook: Array[Array[Array[Double]]]): Column = {
    val sd = codebook.head.head.length
    val parts = codebook.indices.map { j =>
      element_at(call_function("graft_nearest_cells",
        slice(col(vecCol), j * sd + 1, sd), centroidsLit(codebook(j)), lit(1)), 1)
    }
    array(parts: _*)
  }

  /** Reconstruction from PQ codes: concatenate the coded centroids —
    * array<double> of the original dimension. The codebook ships as a
    * literal (m × k × dim/m doubles — small by construction).
    *
    * Feed this a MATERIALIZED codes column (from storage), not the
    * [[pqEncode]] expression inline: Catalyst collapses projections, so
    * `pqReconstruct(pqEncode(...))` would re-evaluate the whole
    * m-kernel encode under every element_at — m× redundant work
    * (measured 15 s vs 4 s at sf1). For encode→reconstruct in one
    * query use [[pqEncodeReconstruct]], which is fused. */
  def pqReconstruct(codes: Column, codebook: Array[Array[Array[Double]]]): Column = {
    val perSub: Seq[Column] = codebook.indices.map { j =>
      element_at(centroidsLit(codebook(j)), element_at(codes, j + 1) + 1)
    }
    flatten(array(perSub: _*))
  }

  /** Fused encode + reconstruct: each subspace's nearest-centroid kernel
    * runs exactly ONCE per row and indexes its own codebook directly —
    * the quantization-distortion path (sq3) with no intermediate codes
    * column to duplicate. */
  def pqEncodeReconstruct(vecCol: String, codebook: Array[Array[Array[Double]]]): Column = {
    val sd = codebook.head.head.length
    val perSub: Seq[Column] = codebook.indices.map { j =>
      val code = element_at(call_function("graft_nearest_cells",
        slice(col(vecCol), j * sd + 1, sd), centroidsLit(codebook(j)), lit(1)), 1)
      element_at(centroidsLit(codebook(j)), code + 1)
    }
    flatten(array(perSub: _*))
  }
}
