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
}
