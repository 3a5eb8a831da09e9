package graft

import org.apache.spark.sql.functions._

import graft.ops.SampleOps

/** Pins the deterministic-sampling semantics: the hash arithmetic is the
  * contract (the DuckDB oracle replays it), so these tests recompute it
  * independently in plain Scala and assert exact membership.
  */
class SampleOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation of the Knuth hash, independent of Spark. */
  private def knuth32(id: Long): Long = ((id % 2147483648L) * 2654435761L) % 4294967296L

  test("hashSplit is deterministic, disjoint-exhaustive, and near the target fraction") {
    val ids = (0L until 1000L).toDF("id")
    val out = SampleOps.hashSplit(ids, "id", 80)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(out.size === 1000)
    // exact agreement with the reference arithmetic, row by row
    out.foreach { case (id, split) =>
      val expected = if (knuth32(id) % 100 < 80) "train" else "holdout"
      assert(split === expected, s"id $id")
    }
    // multiplicative hashing spreads sequential ids: the split fraction
    // lands near 80% (binomial-ish band, not exact)
    val trainFrac = out.values.count(_ == "train") / 1000.0
    assert(trainFrac > 0.74 && trainFrac < 0.86, s"train fraction $trainFrac")
    // second run identical (pure projection, no rand())
    val again = SampleOps.hashSplit(ids, "id", 80)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(again === out)
  }

  test("perGroupCap keeps exactly n smallest-hash ids per group") {
    val rows = (for (g <- Seq("a", "b"); i <- 0L until 20L) yield (g, g.hashCode.toLong * 100 + i))
    val df = rows.toDF("grp", "id")
    val out = SampleOps.perGroupCap(df, Seq("grp"), "id", 3)
      .select("grp", "id").as[(String, Long)].collect()
    assert(out.length === 6)
    for (g <- Seq("a", "b")) {
      val groupIds = rows.collect { case (`g`, id) => id }
      val expected = groupIds.sortBy(id => (knuth32(id), id)).take(3).toSet
      val kept = out.collect { case (`g`, id) => id }.toSet
      assert(kept === expected, s"group $g")
    }
  }

  test("perGroupCap with n >= group size keeps everything") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("grp", "id")
    assert(SampleOps.perGroupCap(df, Seq("grp"), "id", 10).count() === 3)
  }

  test("redactPii masks emails and long digit runs, leaves short digits") {
    val df = Seq(
      (1L, "write to alice.smith+x@mail.example.org today"),
      (2L, "call 5551234567 or ext 123"),
      (3L, "nothing sensitive here")
    ).toDF("id", "t")
    val out = df.select(col("id"), graft.ops.TextOps.redactPii(col("t")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "write to <EMAIL> today")
    assert(out(2L) === "call <NUM> or ext 123")
    assert(out(3L) === "nothing sensitive here")
  }

  test("dsirWeights: hand-computed bucket model on a 2-doc raw / 1-doc target corpus") {
    // raw: doc 1 = "a a", doc 2 = "b"; target = "a a a".
    // nR = 3, nT = 3; cR(a)=2, cR(b)=1; cT(a)=3, cT(b)=0; B = 4096.
    // term(a) = ln(4/4099) - ln(3/4099) = ln(4/3) > 0 (target-favored);
    // term(b) = ln(1/4099) - ln(2/4099) = ln(1/2) < 0 (target-absent).
    // Per-term round to 6dp mirrors the implementation exactly.
    val raw = Seq((1L, "a a"), (2L, "b")).toDF("doc_id", "text")
    val target = Seq((9L, "a a a")).toDF("doc_id", "text")
    val out = SampleOps.dsirWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val termA = r6(math.log(4.0 / 4099) - math.log(3.0 / 4099))
    val termB = r6(math.log(1.0 / 4099) - math.log(2.0 / 4099))
    assert(out(1L)._1 === 2L)
    assert(math.abs(out(1L)._2 - 2 * termA) < 1e-9)
    assert(out(2L)._1 === 1L)
    assert(math.abs(out(2L)._2 - termB) < 1e-9)
    // the ranking property importance resampling relies on: the doc made
    // of target-present tokens outweighs the target-absent one
    assert(out(1L)._2 > out(2L)._2)
  }
}
