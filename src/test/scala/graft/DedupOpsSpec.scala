package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Pins the semantics of the dedup operators — especially the
  * hash/seed-dependent ones (MinHash, SimHash) that the DuckDB oracle
  * can't cover: ground truth here is constructed documents with known
  * overlap.
  */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while rain falls on the green hills near the old stone bridge"
  // near-dup of base: one word changed
  private val nearDup = base.replace("lazy", "sleepy")
  private val unrelated1 = "spark catalyst plans whole stage codegen across shuffle boundaries for distributed analytical query execution at scale"
  private val unrelated2 = "databases index columnar storage with vectorized scans and adaptive execution strategies improving throughput substantially"

  private lazy val docs = Seq(
    (0L, base), (1L, nearDup), (2L, unrelated1), (3L, unrelated2), (4L, base)
  ).toDF("doc_id", "text")

  test("shingles: distinct word n-grams, short docs yield empty") {
    val sh = spark.range(1).select(DedupOps.shingles(lit("a b c d"), 3).as("s"))
      .head.getSeq[String](0)
    assert(sh.toSet === Set("a b c", "b c d"))
    val short = spark.range(1).select(DedupOps.shingles(lit("a b"), 3).as("s"))
      .head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("exactDedup collapses identical texts, keeps min id") {
    val out = DedupOps.exactDedup(docs, "doc_id", Seq("text")).cache()
    assert(out.count() === 4) // 5 docs, one exact pair
    val dupRow = out.filter(col("n_copies") === 2).head
    assert(dupRow.getAs[Long]("doc_id") === 0L) // min of {0, 4}
  }

  test("ngramJaccardPairs finds the constructed near-dup and the exact dup, not unrelated") {
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minShared = 2, minJaccard = 0.1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // near-dup
    assert(pairs.contains((0L, 4L))) // exact dup (jaccard 1.0)
    assert(!pairs.exists(p => Set(2L, 3L).contains(p._1) && Set(0L, 1L, 4L).contains(p._2)))
    assert(!pairs.contains((2L, 3L)))
  }

  test("ngramJaccardPairs jaccard values are exact") {
    val j01 = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 1, 0.0)
      .filter(col("doc_a") === 0 && col("doc_b") === 4).head
    assert(j01.getAs[Double]("jaccard") === 1.0) // identical docs
  }

  test("crossCorpusNearDupPairs: planted cross hits found, within-corpus dups ignored, probe side broadcast") {
    // corpus: base + its exact dup (a WITHIN-corpus pair — must NOT
    // surface) + unrelated; probes: a near-dup of base + an unrelated doc
    val corpus = Seq((10L, base), (11L, base), (12L, unrelated1)).toDF("doc_id", "text")
    val probes = Seq((90L, nearDup), (91L, unrelated2)).toDF("doc_id", "text")
    val out = DedupOps.crossCorpusNearDupPairs(corpus, probes, "doc_id", "text",
      n = 3, minShared = 2, minJaccard = 0.1)
    val pairs = out.select("corpus_id", "probe_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((10L, 90L), (11L, 90L)),
      s"expected both base copies to hit the probe near-dup only, got $pairs")
    // jaccard exactness: identical text on both sides → 1.0
    val exact = DedupOps.crossCorpusNearDupPairs(corpus,
      Seq((95L, base)).toDF("doc_id", "text"), "doc_id", "text", 3, 1, 0.0)
      .filter(col("corpus_id") === 10L).head
    assert(exact.getAs[Double]("jaccard") === 1.0)
    // the probe side must broadcast (the production asymmetry)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"probe side not broadcast:\n$plan")
  }

  test("crossCorpusNearDupPairs: the corpus-df cap kills stop-shingle fan-out") {
    // 25 corpus docs all sharing one stop phrase; the probe contains it too
    val stop = "lorem ipsum dolor sit amet again"
    val corpus = (0 until 25).map(i => (i.toLong, s"$stop unique$i tail$i"))
      .toDF("doc_id", "text")
    val probes = Seq((99L, s"$stop probe tail")).toDF("doc_id", "text")
    val capped = DedupOps.crossCorpusNearDupPairs(corpus, probes, "doc_id", "text",
      n = 3, minShared = 1, minJaccard = 0.0, maxCorpusShingleFreq = 20L)
    assert(capped.count() === 0,
      "stop-shingles past the df cap must not generate pairs")
    val uncapped = DedupOps.crossCorpusNearDupPairs(corpus, probes, "doc_id", "text",
      n = 3, minShared = 1, minJaccard = 0.0, maxCorpusShingleFreq = 1000L)
    assert(uncapped.count() === 25, "with a high cap every corpus doc pairs with the probe")
  }

  test("minHash signature: identical texts identical sigs; est_jaccard tracks true jaccard") {
    val pairs = DedupOps.minHashNearDupPairs(docs, "doc_id", "text",
      numHashes = 64, bands = 16, minEstJaccard = 0.3).cache()
    val byPair = pairs.select("doc_a", "doc_b", "est_jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(byPair((0L, 4L)) === 1.0) // exact dup: all 64 minhashes equal
    // near-dup true 3-gram jaccard ≈ 0.56 (3 of 19 shingles differ per side)
    val est = byPair((0L, 1L))
    assert(est > 0.3 && est < 0.9, s"est_jaccard $est out of expected band")
    assert(!byPair.keySet.exists(p => Set(2L, 3L).contains(p._1)))
  }

  test("minHash signatures are deterministic across runs (fixed seed)") {
    val s1 = docs.select(DedupOps.minHashSignature(col("text")).as("sig")).collect().map(_.getSeq[Long](0))
    val s2 = docs.select(DedupOps.minHashSignature(col("text")).as("sig")).collect().map(_.getSeq[Long](0))
    assert(s1.toSeq.map(_.toSeq) === s2.toSeq.map(_.toSeq))
  }

  test("simHash: identical → hamming 0; near-dup close; unrelated far") {
    val sigs = docs.select(col("doc_id"), DedupOps.simHash(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(4L)) === 0)
    assert(ham(sigs(0L), sigs(1L)) < ham(sigs(0L), sigs(2L)))
    assert(ham(sigs(0L), sigs(2L)) > 10) // unrelated texts differ in many bits
  }

  test("simHashNearDupPairs surfaces exact dup via chunk banding") {
    val pairs = DedupOps.simHashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 4L)))
    assert(!pairs.contains((2L, 3L)))
  }

  test("nearDupSurvivors: clique keeps min id; chain over-drops greedily; singletons kept") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("doc_id")
    // clique {1,2,3}; chain 4-5 (only); 9 unpaired
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val kept = DedupOps.nearDupSurvivors(docs, "doc_id", pairs)
      .as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 9L))
  }

  test("connectedComponents: chain, vee, and separate cliques all root at the component min") {
    // chain 1-2-3; vee (4,6),(5,6) — 5 never appears as a doc_b;
    // clique {7,8}; 9 unpaired (no pair -> no label row)
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 6L), (5L, 6L), (7L, 8L)).toDF("doc_a", "doc_b")
    val labels = DedupOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L, 8L -> 7L))
  }

  test("connectedComponents converges on a long chain (worst-case diameter)") {
    val pairs = (1L until 16L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = DedupOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels.size === 16 && labels.values.forall(_ === 1L))
  }

  test("ccSurvivors keeps one doc per component where the greedy pass over-keeps") {
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    // vee: 1~3 and 2~3 but no (1,2) pair — transitively one cluster.
    // greedy keeps {1, 2} (2 never appears as a doc_b); CC keeps {1}
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    val greedy = DedupOps.nearDupSurvivors(docs, "doc_id", pairs).as[Long].collect().toSet
    val cc = DedupOps.ccSurvivors(docs, "doc_id", pairs).as[Long].collect().toSet
    assert(greedy === Set(1L, 2L, 9L))
    assert(cc === Set(1L, 9L))
  }

  test("ccSurvivors on an empty pair set keeps everything") {
    val docs = Seq(1L, 2L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DedupOps.ccSurvivors(docs, "doc_id", pairs).as[Long].collect().toSet === Set(1L, 2L))
  }

  test("prefixJaccardPairs equals the brute-force all-pairs join at several thresholds") {
    // the prefix filter is a no-miss optimization: its result must be
    // IDENTICAL to ngramJaccardPairs at (minShared=1, no cap) — exercised
    // across thresholds incl. t=1.0 (prefix length collapses to 1)
    for (t <- Seq(0.3, 0.5, 0.9, 1.0)) {
      val fast = DedupOps.prefixJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = t)
      val brute = DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minShared = 1L, minJaccard = t, maxShingleFreq = None)
      val f = fast.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(f === b, s"pair sets diverge at t=$t")
    }
    // exact dup pair (0,4) survives at every threshold; near-dup (0,1)
    // at t=0.5 but not t=1.0
    val strict = DedupOps.prefixJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict === Set((0L, 4L)))
  }

  // ---- duplicate-span excision (dd7) --------------------------------------

  // dupA and dupB are 8-token runs; doc 10 carries BOTH with a 10-token
  // unique gap, doc 11 re-uses dupA, doc 12 re-uses dupB — every span
  // boundary is hand-computable
  private val dupA = (1 to 8).map(i => s"a$i").mkString(" ")
  private val dupB = (1 to 8).map(i => s"b$i").mkString(" ")
  private val gap = (1 to 10).map(i => s"u$i").mkString(" ")
  private lazy val spanDocs = Seq(
    (10L, s"$dupA $gap $dupB"),
    (11L, s"x1 x2 x3 $dupA"),
    (12L, s"$dupB y1 y2 y3"),
    (13L, "z1 z2 z3 z4 z5 z6 z7 z8 z9") // clean, no duplicated 8-gram
  ).toDF("doc_id", "text")

  test("duplicateSpans: two separated spans stay separate, positions exact") {
    val spans = DedupOps.duplicateSpans(spanDocs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 10: dupA at tokens [1,9), dupB at [19,27) after the 10-token gap
    assert(spans === Set(
      (10L, 1, 9), (10L, 19, 27), (11L, 4, 12), (12L, 1, 9)))
  }

  test("duplicateSpans: overlapping marks merge to one maximal span") {
    // a 9-token duplicated run produces marks at pos 1 AND 2 (both
    // 8-grams recur in doc 21) — they must merge to one [1,10) span
    val run = (1 to 9).map(i => s"r$i").mkString(" ")
    val docs = Seq((20L, s"$run m1 m2 m3 m4 m5 m6 m7"), (21L, s"q1 q2 $run"))
      .toDF("doc_id", "text")
    val spans = DedupOps.duplicateSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans === Set((20L, 1, 10), (21L, 3, 12)))
  }

  test("duplicateSpanProfile: clean docs carry zeros, totals are exact") {
    val prof = DedupOps.duplicateSpanProfile(spanDocs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(prof(10L) === ((26L, 2L, 16L, 10L)))
    assert(prof(11L) === ((11L, 1L, 8L, 3L)))
    assert(prof(13L) === ((9L, 0L, 0L, 9L)))
  }

  test("exciseDuplicateSpans: survivors rejoin with single spaces; full dups go empty") {
    val out = DedupOps.exciseDuplicateSpans(spanDocs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) === gap) // both spans cut, the unique middle survives
    assert(out(11L) === "x1 x2 x3")
    assert(out(12L) === "y1 y2 y3")
    assert(out(13L) === "z1 z2 z3 z4 z5 z6 z7 z8 z9") // untouched
    // a doc that IS a duplicated run excises to the empty string
    val twins = Seq((30L, dupA), (31L, dupA)).toDF("doc_id", "text")
    val gone = DedupOps.exciseDuplicateSpans(twins, "doc_id", "text", n = 8)
      .collect().map(r => r.getString(1))
    assert(gone.toSet === Set(""))
  }

  test("exciseDuplicateSpans preserves extra columns and within-doc repeats count as duplicates") {
    // the SAME 8-gram twice in ONE doc: both occurrences are spans
    // (corpus-wide "more than once" includes within-doc recurrence)
    val doc = Seq((40L, s"$dupA c1 c2 c3 $dupA", "web"))
      .toDF("doc_id", "text", "source")
    val out = DedupOps.exciseDuplicateSpans(doc, "doc_id", "text", n = 8).head
    assert(out.getAs[String]("text") === "c1 c2 c3")
    assert(out.getAs[String]("source") === "web")
  }
}
