package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identity, orthogonality, antiparallel") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0),
      (Array(3f, 4f), Array(3f, 4f), 1.0)
    ).toDF("a", "b", "expected")
    val rows = df.select(SimilarityOps.cosine(col("a"), col("b")).as("c"), col("expected"))
      .as[(Double, Double)].collect()
    rows.foreach { case (c, e) => assert(math.abs(c - e) < 1e-9, s"cosine $c != $e") }
  }

  test("bruteForceTopK returns exact neighbors in score order") {
    val corpus = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)),
      (3L, Array(-1f, 0f)),
      (4L, Array(0.8f, 0.6f))
    ).toDF("vec_id", "embedding")
    val res = SimilarityOps.bruteForceTopK(
      corpus.filter(col("vec_id") === 0), "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(res.map(_._2).toSeq === Seq(1L, 4L, 2L)) // by descending cosine to (1,0)
    assert(res.head._3 > 0.99)
  }

  test("lshTopK achieves reasonable recall vs brute force on real embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val exact = SimilarityOps.bruteForceTopK(queries, "vec_id", "embedding", emb, "vec_id", "embedding", k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityOps.lshTopK(queries, "vec_id", "embedding", emb, "vec_id", "embedding",
      k = 5, dim = 64)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 4 planes × 8 tables: per-neighbor capture 1-(1-p^4)^8. Floor pinned
    // from measurement; fails loudly on regression.
    assert(recall >= 0.5, s"LSH recall@5 degraded: $recall")
  }

  test("ivfTopK achieves reasonable recall vs brute force on real embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val exact = SimilarityOps.bruteForceTopK(queries, "vec_id", "embedding", emb, "vec_id", "embedding", k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityOps.ivfTopK(queries, "vec_id", "embedding", emb, "vec_id", "embedding",
      k = 5, nLists = 16, nProbe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // probing 4/16 cells; floor pinned from measurement
    assert(recall >= 0.5, s"IVF recall@5 degraded: $recall")
  }

  test("cosineNearDupPairs finds planted duplicates") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // plant: vec 9000 duplicates vec 0 exactly
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 0).select(lit(9000L).as("vec_id"), col("embedding"), col("label")))
    val pairs = SimilarityOps.cosineNearDupPairs(planted, "vec_id", "embedding",
      minCosine = 0.99, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 9000L)))
  }

  test("cn2 gate: hash sample is deterministic under repartitioning and re-evaluation") {
    val dir = "/root/testdata/sf0.001"
    // the sample predicate is a pure projection on vec_id — the sampled id
    // set must be identical however the input is partitioned, and the gate
    // row must be bit-identical across evaluations (it is a driver golden)
    val emb = Tables.load(spark, dir, "embeddings")
    val sampled = emb.filter(pmod(graft.ops.SampleOps.knuth32(col("vec_id")), lit(100L)) < 50)
      .select("vec_id").as[Long].collect().toSet
    val resampled = emb.repartition(13)
      .filter(pmod(graft.ops.SampleOps.knuth32(col("vec_id")), lit(100L)) < 50)
      .select("vec_id").as[Long].collect().toSet
    assert(sampled === resampled, "sample must not depend on partitioning")
    assert(sampled.nonEmpty && sampled.size < emb.count(), "sample must be a proper subset")
    val g1 = SparkEntry.queries("cn2_cosine_gate")(spark, dir).collect().toSeq
    val g2 = SparkEntry.queries("cn2_cosine_gate")(spark, dir).collect().toSeq
    assert(g1 === g2, "gate row must be reproducible")
  }

  test("golden-drift tripwire: the quantizer-fit sample input is pinned per SF") {
    // Every fit-dependent golden — ann3's neighbor identities, the
    // ann4/ann5/ann6/ann7/sq3 recall and balance constants — is keyed to
    // the positional-prefix sample of the embeddings corpus, which is a
    // function of the testdata FILE LAYOUT (scan splits + in-file row
    // order), not just its relational content. This pins a fingerprint
    // (row count + hash-sum of sampled vec_ids) of that sample at every
    // SF, with the SAME sampleTarget both trained fits use
    // (ivfQuantize nLists=16 and pqFit k=16 → max(40·16, 1024) = 1024).
    //
    // IF THIS FAILS: the testdata layout changed, so every golden above
    // is silently stale — RE-MEASURE them all (capture recipe in
    // NEXT.md), then re-pin this fingerprint. Do NOT just update the
    // numbers here to make it green.
    val sampleTarget = math.max(40L * 16, 1024L)
    // the hash covers the VECTORS, not just the ids: the sample turns out
    // to be rows 0-127 of the single scan split at every SF (so the id
    // set alone cannot distinguish a regenerated corpus), and the fit
    // consumes the embedding values — a content change with the same ids
    // must trip this too
    val expected = Map( // sf -> (sampled rows, hash-sum of (id, embedding))
      "sf0.001" -> (128L, "-23645448822391447438"),
      "sf0.01" -> (128L, "10200951378926726321"),
      "sf0.1" -> (128L, "-50628627438015118966"))
    val actual = expected.keys.map { sf =>
      val emb = Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      val r = graft.ops.SampleOps.positionalPrefixSample(
          emb.select(col("vec_id"), col("embedding")), sampleTarget)
        .agg(count(lit(1)),
          sum(xxhash64(col("vec_id"), col("embedding"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      sf -> (r.getLong(0), r.getDecimal(1).toPlainString)
    }.toMap
    assert(actual === expected,
      s"quantizer-fit sample drifted — testdata layout changed; re-measure " +
        s"all fit-dependent goldens, then re-pin. Actual: $actual")
  }

  test("labelCentroids: hand-computed per-dimension means, flat (label, pos) form") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f), "a"),
      (2L, Array(3.0f, 6.0f), "a"),
      (3L, Array(10.0f, -4.0f), "b")
    ).toDF("vec_id", "embedding", "label")
    val out = graft.ops.SimilarityOps.labelCentroids(vecs, "label", "embedding")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("a", 1)) === ((2L, 2.0)))   // (1+3)/2
    assert(out(("a", 2)) === ((2L, 4.0)))   // (2+6)/2
    assert(out(("b", 1)) === ((1L, 10.0)))
    assert(out(("b", 2)) === ((1L, -4.0)))
  }

  test("centroidConfusion: separable classes classify perfectly; equidistant ties break on class name") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f), "a"), (2L, Array(1.0f, 1.0f), "a"),
      (3L, Array(10.0f, 10.0f), "b"), (4L, Array(11.0f, 11.0f), "b")
    ).toDF("vec_id", "embedding", "label")
    val conf = graft.ops.ClassifyOps.centroidConfusion(vecs, "vec_id", "label", "embedding")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(conf === Set(("a", "a", 2L), ("b", "b", 2L)))
    // an exact distance tie must break to the lexicographically
    // smaller class: vec 2 sits 2.25 (squared) from BOTH centroids
    val tie2 = Seq(
      (1L, Array(0.0f, 0.0f), "a"), (2L, Array(1.5f, 0.0f), "b"),
      (3L, Array(1.5f, 3.0f), "b")
    ).toDF("vec_id", "embedding", "label")
    // centroids: a=(0,0), b=(1.5,1.5); vec 1 d2: a=0 -> a. vec 2: to a
    // 2.25, to b 2.25 — TIE -> "a" wins lexicographically
    val conf2 = graft.ops.ClassifyOps.centroidConfusion(tie2, "vec_id", "label", "embedding")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(conf2.contains(("b", "a", 1L)), s"tie must break to 'a': $conf2")
  }

  test("semanticDedup: planted duplicate removed within its cluster; assignment ties break to smaller seed") {
    import spark.implicits._
    // Seed rule: hash(id) = (id·2654435761) mod 2^32 < k·2^32 div N,
    // k = max(8, ceil(sqrt(N))). For N=10, ids 0..9: thr=3435973836 and
    // the seed set is exactly {0,1,2,4,5,6,7,9} — derive it here so the
    // spec breaks loudly if the rule drifts.
    val thr = (8L * 4294967296L) / 10L
    val expectSeeds = (0L to 9L).filter(i => (i * 2654435761L) % 4294967296L < thr || i == 0L)
    assert(expectSeeds === Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L, 9L))
    // The 8 seeds carry the ± one-hot directions of R^4 (pairwise
    // cosine 0 or -1, so every seed clusters to itself); the 2
    // non-seeds are the planted cases.
    val dirs = Map(0L -> (0, 1f), 1L -> (1, 1f), 2L -> (2, 1f), 4L -> (0, -1f),
      5L -> (1, -1f), 6L -> (2, -1f), 7L -> (3, 1f), 9L -> (3, -1f))
    val corpus = dirs.toSeq.map { case (id, (d, s)) =>
      (id, Array.tabulate(4)(i => if (i == d) s else 0f))
    } ++ Seq(
      (3L, Array(0f, 0f, 3f, 0f)),  // same DIRECTION as seed 2 (cos 1.0) -> duplicate of 2
      (8L, Array(1f, 1f, 1f, 1f))   // cos 0.5 with seeds 0,1,2,7: TIE -> cluster 0; survives at τ=0.6
    )
    val emb = corpus.toDF("vec_id", "embedding")
    val summary = graft.ops.SimilarityOps
      .semanticDedupSummary(emb, "vec_id", "embedding", minCosine = 0.6)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(summary.keySet === expectSeeds.toSet, s"one cluster per seed: $summary")
    assert(summary(2L) === ((2L, 1L, 1L, 3L)), s"cluster 2 must remove the planted dup: $summary")
    assert(summary(0L) === ((2L, 0L, 0L, -1L)), s"vec 8 ties to cluster 0 and survives: $summary")
    Seq(1L, 4L, 5L, 6L, 7L, 9L).foreach(c => assert(summary(c) === ((1L, 0L, 0L, -1L))))
    val survivors = graft.ops.SimilarityOps
      .semanticDedupSurvivors(emb, "vec_id", "embedding", minCosine = 0.6)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors === (0L to 9L).toSet - 3L)
  }

  test("semanticDedup: seed rule is id-density-free (offset ids still dedup)") {
    import spark.implicits._
    // ids start at 1000 — under the old `id < k` rule the seed set
    // would be EMPTY and every duplicate silently kept; the hash rule
    // selects ~k/N of any id population and min-id is always a seed.
    val emb = ((0 until 40).map { i =>
      (1000L + i, Array(math.cos(i / 7.0).toFloat, math.sin(i / 7.0).toFloat))
    } :+ (2000L, Array(math.cos(0.0).toFloat, math.sin(0.0).toFloat)))
      .toDF("vec_id", "embedding")
    val survivors = graft.ops.SimilarityOps
      .semanticDedupSurvivors(emb, "vec_id", "embedding", minCosine = 0.9999)
      .select("vec_id").as[Long].collect().toSet
    assert(!survivors.contains(2000L), "exact-direction dup of id 1000 must be removed")
    assert(survivors.contains(1000L))
  }

  test("signRandomProjection: hand-derived md5-parity signs, exact sums on exact binary floats") {
    import spark.implicits._
    def sign(i: Int, j: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}_$j".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) % 2 == 0) 1 else -1
    }
    // exact binary floats -> decimal casts and sums are exact, so the
    // double compare below is exact equality
    val emb = Seq((1L, Array(0.5f, -1.25f, 2.0f))).toDF("vec_id", "embedding")
    val out = graft.ops.SimilarityOps
      .signRandomProjection(emb, "vec_id", "embedding", outDims = 2)
      .as[(Long, Long, Double)].collect()
      .map(r => r._2 -> r._3).toMap
    val expected = (1 to 2).map { i =>
      i.toLong -> (sign(i, 1) * 0.5 + sign(i, 2) * -1.25 + sign(i, 3) * 2.0)
    }.toMap
    assert(out === expected)
  }

  test("signRandomProjection: partition-invariant on real embeddings (decimal reduce)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) = graft.ops.SimilarityOps
      .signRandomProjection(df, "vec_id", "embedding", outDims = 4)
      .collect().map(_.toSeq).toSet
    assert(run(emb.repartition(1)) === run(emb.repartition(5)))
  }

  test("semanticDedup: determinism under repartitioning (no window sort, tuple-max assignment)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) = graft.ops.SimilarityOps
      .semanticDedupSummary(df, "vec_id", "embedding", minCosine = 0.4)
      .collect().map(_.toSeq).toSet
    assert(run(emb.repartition(1)) === run(emb.repartition(7)))
  }

  private def power(vecs: Seq[Array[Float]], rounds: Int): Map[Long, Long] =
    SimilarityOps.gramTopComponent(
        vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding"),
        "vec_id", "embedding", rounds)
      .as[(Long, Long)].collect().toMap

  test("gramTopComponent: hand-traced diagonal Gram — the minor axis decays by the eigenvalue ratio each round") {
    // vectors 2×[1,0] + [0,1] → G = diag(2e12, 1e12); each round the
    // second entry halves: after 4 rounds [1e12, 1e12/16]
    val r = power(Seq(Array(1f, 0f), Array(1f, 0f), Array(0f, 1f)), 4)
    assert(r === Map(1L -> 1000000000000L, 2L -> 62500000000L))
  }

  test("gramTopComponent: negative entries divide toward zero — the floor-division replay hazard, pinned") {
    // vectors [1,−1] and [0.5,0]: hand-traced 3 rounds end at
    // (1e12, −878048780487); a floor division (DuckDB's bare //)
    // would give −...488 — this fixture fails if either engine's
    // division semantics drift
    val r = power(Seq(Array(1f, -1f), Array(0.5f, 0f)), 3)
    assert(r === Map(1L -> 1000000000000L, 2L -> -878048780487L))
  }

  test("gramTopComponent is partition-invariant") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) = graft.ops.SimilarityOps
      .gramTopComponent(df, "vec_id", "embedding", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(run(emb.repartition(1)) === run(emb.repartition(7)))
  }

  test("mmrSelect diversifies: a redundant near-duplicate loses to a less-relevant diverse doc") {
    import spark.implicits._
    // unit vectors: B (rel .96, the top pick), A (rel .95 but a
    // near-dup of B: sim ≈ .9994), C (rel .95, diverse: sim(C,B) ≈
    // .8246). At EQUAL relevance MMR (λ=0.7) must pick the diverse C
    // over the near-dup A in round 2:
    //   A: 7·9500 − 3·9994 = 36518  <  C: 7·9500 − 3·8246 = 41762
    val q = Seq((100L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.95f, 0.31225f, 0f)),
      (2L, Array(0.96f, 0.28f, 0f)),
      (3L, Array(0.95f, -0.31225f, 0f))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.mmrSelect(q, "vec_id", "embedding",
        corpus, "vec_id", "embedding", candidates = 3, k = 3)
      .orderBy("sel_rank")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toList
    assert(out === List(
      (2L, 1, 7L * 9600), (3L, 2, 41762L), (1L, 3, 36518L)))
  }
}
