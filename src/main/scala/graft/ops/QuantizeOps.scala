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
}
