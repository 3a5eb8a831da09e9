package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the grouping-sets / gap-fill / dynamic-pivot /
  * stratified-sample breadth queries (their value-level correctness is
  * oracle-checked by the driver; these assert the structural invariants a
  * hash compare can't express — grid density, subtotal consistency,
  * discovered pivot schema, per-stratum subset semantics).
  */
class BreadthQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("ts1_gap_fill emits a dense hour×type grid that preserves totals") {
    val out = q("ts1_gap_fill").cache()
    try {
      val types = out.select("event_type").distinct().count()
      val hours = out.select("hour_start").distinct().count()
      assert(out.count() === types * hours, "grid must be dense: one row per (hour, type)")
      // the spine has no holes: hour count == span in hours
      val Array(lo, hi) = out.agg(min("hour_start"), max("hour_start")).head().toSeq.toArray
      val spanHours = (hi.asInstanceOf[java.sql.Timestamp].getTime -
        lo.asInstanceOf[java.sql.Timestamp].getTime) / 3600000L + 1
      assert(hours === spanHours)
      // zero-fill is additive only: total events match the raw table
      val total = out.agg(sum("n_events")).head().getLong(0)
      val raw = Tables.events(spark, dir).count()
      assert(total === raw)
      // at least one gap cell actually exercised the zero-fill arm
      assert(out.filter(col("n_events") === 0).count() > 0, "fixture should contain gaps")
    } finally out.unpersist()
  }

  test("agg10_grouping_sets subtotals are consistent across grouping ids") {
    val out = q("agg10_grouping_sets").cache()
    try {
      // gid semantics: 0 = (status, priority), 1 = (status) with priority
      // aggregated (LSB = last listed column), 3 = grand total
      val gids = out.select("gid").distinct().collect().map(_.getLong(0)).toSet
      assert(gids === Set(0L, 1L, 3L))
      val grand = out.filter(col("gid") === 3).agg(sum("n_orders")).head().getLong(0)
      val bySet = (g: Int) =>
        out.filter(col("gid") === g).agg(sum("n_orders")).head().getLong(0)
      assert(bySet(0) === grand, "leaf cells must sum to the grand total")
      assert(bySet(1) === grand, "status subtotals must sum to the grand total")
      // subtotal rows aggregate priority away -> NULL there, never in leaves
      assert(out.filter(col("gid") === 1 && col("o_orderpriority").isNotNull).count() === 0)
      assert(out.filter(col("gid") === 0 && col("o_orderpriority").isNull).count() === 0)
    } finally out.unpersist()
  }

  test("pvt1_dynamic_pivot discovers the status columns and matches the static a6 totals") {
    val out = q("pvt1_dynamic_pivot")
    // two-pass discovery: columns = key + sorted distinct pivot values
    val statuses = Tables.load(spark, dir, "orders")
      .select("o_orderstatus").distinct().collect().map(_.getString(0)).sorted
    assert(out.columns.toSeq === ("o_custkey" +: statuses.toSeq))
    // NULL cells coalesce to the same totals the else-0 static pivot (a6) computes
    val dynTotal = out.select(
      statuses.map(st => sum(coalesce(col(s"`$st`"), lit(0.0)))).reduce(_ + _).as("t"))
      .head().getDouble(0)
    val staticTotal = q("a6_pivot_sum").agg(sum("total_amount")).head().getDouble(0)
    assert(math.abs(dynTotal - staticTotal) < 1e-6)
  }

  test("dd5_passage_dup scores passage-level duplication in [0,1] with exact passage counts") {
    val out = q("dd5_passage_dup").cache()
    try {
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      // one row per non-empty doc; n_passages = ceil(tokens/8)
      assert(out.count() === docs.filter(col("n") > 0).count())
      val badCount = out.join(docs, "doc_id")
        .filter(col("n_passages") =!= ceil(col("n").cast("double") / 8.0).cast("long"))
        .count()
      assert(badCount === 0)
      assert(out.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() === 0)
      // the fixture contains planted near-exact duplicates: some doc must
      // score 1.0, and the bulk of the corpus must score 0
      assert(out.filter(col("dup_frac") === 1.0).count() > 0, "planted dups must score 1.0")
      assert(out.filter(col("dup_frac") === 0.0).count() > out.count() / 2)
    } finally out.unpersist()
  }

  test("smp4_target_mixture hits the per-language quotas exactly and deterministically") {
    val out = q("smp4_target_mixture").cache()
    try {
      val docs = Tables.load(spark, dir, "documents")
      // quotas recomputed independently: T = min(c/p), quota = floor(p*T)
      val counts = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
      val p = counts.keys.map(l => l -> (if (l == "en") 0.4 else 0.15)).toMap
      val t = counts.map { case (l, c) => c / p(l) }.min
      val kept = out.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      counts.keys.foreach { l =>
        assert(kept.getOrElse(l, 0L) === math.floor(p(l) * t).toLong,
          s"language $l missed its quota")
      }
      // subset + determinism
      assert(out.join(docs, Seq("doc_id"), "left_anti").count() === 0)
      assert(q("smp4_target_mixture").exceptAll(out).count() === 0)
      // resulting mix approximates the targets
      val total = out.count().toDouble
      assert(math.abs(kept("en") / total - 0.4) < 0.01, "en share must land on 40%")
    } finally out.unpersist()
  }

  test("smp3_stratified_sample keeps a deterministic per-stratum subset at the declared rates") {
    val out = q("smp3_stratified_sample").cache()
    try {
      val orders = Tables.load(spark, dir, "orders")
      // subset: every kept row exists in the source (anti join is empty)
      assert(out.join(orders, Seq("o_orderkey"), "left_anti").count() === 0)
      // deterministic: a second evaluation is identical
      assert(q("smp3_stratified_sample").exceptAll(out).count() === 0)
      // per-stratum rates hold within hash-uniformity tolerance
      val kept = out.groupBy("o_orderstatus").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val src = orders.groupBy("o_orderstatus").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rates = Map("F" -> 0.10, "O" -> 0.50, "P" -> 1.00)
      rates.foreach { case (st, rate) =>
        val frac = kept.getOrElse(st, 0L).toDouble / src(st)
        assert(math.abs(frac - rate) < 0.12, s"stratum $st kept $frac, wanted ~$rate")
      }
    } finally out.unpersist()
  }
}
