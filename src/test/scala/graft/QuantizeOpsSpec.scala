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
}
