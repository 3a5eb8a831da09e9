package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** QuantizeOps (int8 embedding quantization): the error bound the scheme
  * promises, code-range/saturation invariants, exactness on constructed
  * vectors, and determinism under repartitioning (it must be a pure
  * projection — same codes on any physical layout).
  */
class QuantizeOpsSpec extends SparkSpec {
  import graft.ops.QuantizeOps

  private val dir = "/root/testdata/sf0.001"

  private def corpus = Tables.load(spark, dir, "embeddings")

  test("reconstruction error is bounded by scale/2 (plus one ulp of slack)") {
    val q = QuantizeOps.quantizeCorpus(corpus, "vec_id", "embedding")
    val bad = q.filter(col("max_abs_err") > col("scale") * 0.5 * (1.0 + 1e-12))
    assert(bad.count() === 0)
  }

  test("codes stay in [-127, 127]; every vector saturates on its max element") {
    val q = QuantizeOps.quantizeCorpus(corpus, "vec_id", "embedding")
    assert(q.filter(size(filter(col("codes"), c => abs(c) > 127)) > 0).count() === 0)
    // the element defining the scale must land on ±127 (give or take the
    // clamp), so at least one saturated code exists in every vector
    assert(q.filter(size(filter(col("codes"), c => abs(c) === 127)) === 0).count() === 0)
  }

  test("constructed vector quantizes exactly: known scale and codes") {
    import spark.implicits._
    // max|x| = 12.7 -> scale ~ 0.1; the other elements sit near integer
    // multiples of the scale (NOT near half-integers — the float32 cast
    // makes exact .5 ties fp-fragile, which is exactly why int8Codes
    // states floor(x/s + 0.5) explicitly instead of round())
    val df = Seq((1L, Array(12.7f, -6.3f, 0.0f, 3.1f))).toDF("vec_id", "embedding")
    val r = QuantizeOps.quantizeCorpus(df, "vec_id", "embedding")
      .select("scale", "codes", "max_abs_err").head()
    assert(math.abs(r.getDouble(0) - 0.1) < 1e-6)
    assert(r.getSeq[Int](1) === Seq(127, -63, 0, 31))
    assert(r.getDouble(2) <= r.getDouble(0) * 0.5 + 1e-12)
  }

  test("quantization is a pure projection: identical codes under any partitioning") {
    val a = QuantizeOps.quantizeCorpus(corpus, "vec_id", "embedding")
      .select(col("vec_id"), col("codes"))
    val b = QuantizeOps.quantizeCorpus(corpus.repartition(13), "vec_id", "embedding")
      .select(col("vec_id"), col("codes"))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("sq2 gate: quantized recall stays above 0.9 (4x compression, bounded quality cost)") {
    val Row(recall: Double, n: Long) =
      SparkEntry.queries("sq2_quantized_recall")(spark, dir).head()
    assert(n === 40L)
    assert(recall >= 0.9, s"quantized recall collapsed: $recall")
  }

  test("PQ: codebook shape, codes in range, recon concatenates coded centroids") {
    graft.functions.NativeExpressions.register(spark)
    val cb = QuantizeOps.pqFit(corpus, "embedding", dim = 64, m = 8, k = 16)
    assert(cb.length === 8)
    assert(cb.forall(_.length === 16) && cb.forall(_.forall(_.length === 8)))
    val enc = corpus.select(col("vec_id"), QuantizeOps.pqEncode("embedding", cb).as("codes"))
    assert(enc.filter(size(col("codes")) =!= 8).count() === 0)
    assert(enc.filter(size(filter(col("codes"), c => c < 0 || c >= 16)) > 0).count() === 0)
    val r = corpus.limit(1).select(
      QuantizeOps.pqEncodeReconstruct("embedding", cb).as("r"),
      QuantizeOps.pqEncode("embedding", cb).as("codes")).head()
    val recon = r.getSeq[Double](0); val codes = r.getSeq[Int](1)
    assert(recon.length === 64)
    // every reconstructed subvector IS the coded centroid, verbatim
    codes.zipWithIndex.foreach { case (c, j) =>
      assert(recon.slice(j * 8, j * 8 + 8) === cb(j)(c).toSeq)
    }
    // the fused path must equal decode-from-materialized-codes exactly
    // (localCheckpoint stops Catalyst inlining the encode under every
    // element_at — the trap pqEncodeReconstruct exists to avoid)
    val codesDf = corpus
      .select(col("vec_id"), QuantizeOps.pqEncode("embedding", cb).as("codes"))
      .localCheckpoint()
    val twoStep = codesDf.select(col("vec_id"),
      QuantizeOps.pqReconstruct(col("codes"), cb).as("r"))
    val fused = corpus.select(col("vec_id"),
      QuantizeOps.pqEncodeReconstruct("embedding", cb).as("r"))
    assert(twoStep.exceptAll(fused).count() === 0 && fused.exceptAll(twoStep).count() === 0)
  }

  test("PQ fit and encode are deterministic: two runs, identical codebook and codes") {
    graft.functions.NativeExpressions.register(spark)
    val cb1 = QuantizeOps.pqFit(corpus, "embedding", dim = 64)
    val cb2 = QuantizeOps.pqFit(corpus, "embedding", dim = 64)
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq === cb2.map(_.map(_.toSeq).toSeq).toSeq)
    val e1 = corpus.select(col("vec_id"), QuantizeOps.pqEncode("embedding", cb1).as("c"))
    val e2 = corpus.select(col("vec_id"), QuantizeOps.pqEncode("embedding", cb2).as("c"))
    assert(e1.exceptAll(e2).count() === 0 && e2.exceptAll(e1).count() === 0)
  }

  test("PQ fit accepts array<double> vectors and matches the float fit exactly") {
    // bruteForceTopK already supports double vectors (the HOF fallback);
    // the fit must too — and since float→double casting is exact, the
    // trained codebook is identical, not merely close
    val dbl = corpus.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val cbF = QuantizeOps.pqFit(corpus, "embedding", dim = 64)
    val cbD = QuantizeOps.pqFit(dbl, "embedding", dim = 64)
    assert(cbF.map(_.map(_.toSeq).toSeq).toSeq === cbD.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("ann7 gate: the composed IVF-PQ stack holds a floor and stays below its components") {
    graft.functions.NativeExpressions.register(spark)
    val Row(recall: Double, n: Long) =
      SparkEntry.queries("ann7_ivfpq_recall")(spark, dir).head()
    assert(n === 40L)
    assert(recall >= 0.25, s"IVF-PQ recall collapsed: $recall")
    // the composition cannot beat the pure-PQ arm (it scores the same
    // reconstructed vectors over a SUBSET of candidates)
    val Row(pqRecall: Double, _) = SparkEntry.queries("sq3_pq_recall")(spark, dir).head()
    assert(recall <= pqRecall + 1e-9, s"composition recall $recall above PQ-only $pqRecall")
  }

  test("ADC scoring equals reconstruction scoring exactly (per-subspace decomposition)") {
    graft.functions.NativeExpressions.register(spark)
    import graft.ops.SimilarityOps
    val emb = corpus
    val q = emb.filter(col("vec_id") < 8)
    def run(adc: Boolean) = SimilarityOps.ivfPqTopK(
      q, "vec_id", "embedding", emb, "vec_id", "embedding", k = 5, adc = adc)
      .select("q_id", "vec_id", "score", "rank")
    val a = run(adc = true); val r = run(adc = false)
    assert(a.exceptAll(r).count() === 0 && r.exceptAll(a).count() === 0,
      "ADC must reproduce reconstruction scoring bit-for-bit at round(4)")
  }

  test("sq3 gate: PQ-8bit recall holds its floor on this corpus") {
    val Row(recall: Double, n: Long) =
      SparkEntry.queries("sq3_pq_recall")(spark, dir).head()
    assert(n === 40L)
    // measured 0.625 at sf0.001 (golden in the oracle); the floor only
    // catches semantic collapse, the golden catches ANY drift
    assert(recall >= 0.4, s"PQ recall collapsed: $recall")
  }
}
