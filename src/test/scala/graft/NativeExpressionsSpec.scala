package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions
import graft.ops.{DedupOps, SimilarityOps}

/** The native codegen'd expressions must agree exactly with the composed
  * higher-order-function reference implementations — those are the
  * executable spec; these are the fast path.
  */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    NativeExpressions.register(spark)
  }

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("graft_minhash matches the HOF minHashSignature on real documents") {
    val both = docs.select(
      expr("graft_minhash(text, 3, 64, 42)").as("native"),
      DedupOps.minHashSignature(col("text"), 64, 3, 42L).as("hof"))
    val mismatches = both.filter(col("native") =!= col("hof")).count()
    assert(mismatches === 0L)
  }

  test("graft_simhash64 matches the HOF simHash on real documents") {
    val both = docs.select(
      expr("graft_simhash64(text, 2)").as("native"),
      DedupOps.simHash(col("text"), 2).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0L)
  }

  test("graft_cosine matches the HOF cosine bit-for-bit on real embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val diff = pairs.select(
      expr("graft_cosine(va, vb)").as("native"),
      SimilarityOps.cosine(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact double equality
      .count()
    assert(diff === 0L)
  }

  test("graft_signbuckets matches the HOF tableBuckets on real embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val mismatches = emb.select(
      expr("graft_signbuckets(embedding, 64, 4, 8, 42L)").as("native"),
      SimilarityOps.tableBuckets(col("embedding"), 64, 4, 8, 42L).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches === 0L)
  }

  test("graft_nearest_cells matches the HOF probe-cell expression on real embeddings") {
    // deterministic fake centroids (the kernel contract is independent of
    // where they come from)
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    val centroidSql = centroids.map(_.map(d => s"${d}d").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val mismatches = emb.select(
      expr(s"graft_nearest_cells(embedding, $centroidSql, 4)").as("native"),
      SimilarityOps.probeCellsHOF(col("embedding"), centroids, 4).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches === 0L)
  }

  test("graft_topk equals the window top-k row-for-row and aggregates partially") {
    val dir = "/root/testdata/sf0.001"
    val agg = SparkEntry.queries("w4_topk_agg")(spark, dir)
    val win = SparkEntry.queries("w1_window_topk")(spark, dir)
    val a = agg.collect().map(_.toString).sorted
    val w = win.collect().map(_.toString).sorted
    assert(a.length === w.length && a.sameElements(w))
    // the scale property: ObjectHashAggregate partial+final (map-side
    // combine ships ≤k rows/group), no Window sort of all rows
    val plan = agg.queryExecution.executedPlan.toString
    // ≥2: partial + final (AQE's plan string may repeat both sections)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
    assert(!plan.contains("Window"), s"window sneaked in:\n$plan")
  }

  test("graft_topk heap semantics: k bound, tie-break, null skip") {
    import spark.implicits._
    val df = Seq(
      (1L, 10.0, 1L), (1L, 10.0, 2L), (1L, 30.0, 3L), (1L, 20.0, 4L), (1L, 5.0, 5L),
      (2L, 1.0, 9L)
    ).toDF("g", "v", "p")
      .union(Seq((2L, Option.empty[Double], Option(8L))).toDF("g", "v", "p"))
    val out = df.groupBy("g").agg(expr("graft_topk(v, p, 3)").as("top"))
      .select(col("g"), col("top")).as[(Long, Seq[(Double, Long)])].collect().toMap
    // best-first, value desc then payload asc; nulls contribute nothing
    assert(out(1L) === Seq((30.0, 3L), (20.0, 4L), (10.0, 1L)))
    assert(out(2L) === Seq((1.0, 9L)))
  }

  test("native expressions handle edge cases: empty and too-short text") {
    val edge = Seq((1L, ""), (2L, "one"), (3L, "two words")).toDF("id", "text")
    val rows = edge.select(col("id"),
      expr("graft_minhash(text, 3, 8, 42)").as("sig"),
      expr("graft_simhash64(text, 2)").as("sh")).collect()
    // too-short docs: empty shingle set -> min over empty = Long.MaxValue per slot; simhash votes all -1 -> 0
    rows.foreach { r =>
      assert(r.getSeq[Long](1).length === 8)
    }
    rows.filter(_.getLong(0) <= 2L).foreach { r =>
      assert(r.getSeq[Long](1).forall(_ == Long.MaxValue))
    }
    // the HOF must agree on the short-document case too (no length
    // pre-filter needed by direct callers)
    val hofParity = edge.select(
      expr("graft_minhash(text, 3, 8, 42)").as("native"),
      DedupOps.minHashSignature(col("text"), 8, 3, 42L).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(hofParity === 0L)
    val shTwo = rows.find(_.getLong(0) == 3L).get.getLong(2)
    assert(shTwo !== 0L) // "two words" has one 2-shingle
  }

  test("GraftExtensions injects every native function into a SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must not throw; builder path
    assert(NativeExpressions.functions.map(_._1.funcName).toSet ===
      Set("graft_minhash", "graft_simhash64", "graft_cosine", "graft_signbuckets",
        "graft_nearest_cells", "graft_topk", "graft_char_entropy", "graft_distinct_ngrams",
        "graft_bloom_build", "graft_bloom_text_hit", "graft_freq_sketch"))
  }

  test("graft_char_entropy matches the HOF charEntropy bit-for-bit on real documents") {
    // compare UNROUNDED values: the HOF column with its round(4) removed
    // against the raw kernel — exact double equality, so any ln/fold/order
    // divergence fails loudly rather than hiding under the round
    val chars = split(col("text"), "")
    val len = size(chars).cast("double")
    val counts = transform(array_distinct(chars),
      c => size(filter(chars, x => x === c)).cast("double"))
    val hofRaw = -aggregate(counts, lit(0.0), (acc, k) => acc + (k / len) * log(k / len))
    val mismatches = docs.select(
      expr("graft_char_entropy(text)").as("native"), hofRaw.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches === 0L)
    // and the full query-shaped columns (round + NULL guard) agree too
    val shaped = docs.select(
      graft.ops.TextOps.charEntropyNative("text").as("native"),
      graft.ops.TextOps.charEntropy(col("text")).as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(shaped === 0L)
  }

  test("graft_char_entropy edge cases: empty, single char, repeated char, unicode") {
    val edge = Seq((1L, ""), (2L, "a"), (3L, "aaaa"), (4L, "ab"), (5L, "héllo wörld"),
      (6L, "汉字 text 汉"), (7L, "a😀b😀")).toDF("id", "text")
    val both = edge.select(col("id"),
      graft.ops.TextOps.charEntropyNative("text").as("native"),
      graft.ops.TextOps.charEntropy(col("text")).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() === 0L)
    val byId = both.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(byId(1L).isEmpty)                       // empty -> NULL
    assert(byId(2L).contains(-0.0) || byId(2L).contains(0.0)) // single char -> zero entropy
    assert(byId(4L).exists(v => math.abs(v.asInstanceOf[Double] - StrictMath.log(2)) < 1e-4))
  }

  test("graft_distinct_ngrams equals size(shingles) on real documents and edges") {
    val onDocs = docs.select(
      expr("graft_distinct_ngrams(text, 3)").as("native"),
      size(DedupOps.shingles(col("text"), 3)).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(onDocs === 0L)
    val edge = Seq((1L, ""), (2L, "one"), (3L, "a b"), (4L, "a b c"), (5L, "a b c a b c a b c"),
      (6L, "x  y")).toDF("id", "text") // double space -> empty token, same as split
    val edgeDiff = edge.select(
      expr("graft_distinct_ngrams(text, 3)").as("native"),
      size(DedupOps.shingles(col("text"), 3)).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(edgeDiff === 0L)
    // and the repetition-filter column shape agrees end to end
    val shaped = edge.union(docs.select(col("doc_id"), col("text"))).select(
      graft.ops.TextOps.repetitionRatioNative("text", 3).as("native"),
      graft.ops.TextOps.repetitionRatio(col("text"), 3).as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(shaped === 0L)
  }

  test("bloom screen equals the exact contains() join, even when the filter is saturated") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val probes = docs.filter(col("doc_id") < 50 && length(col("text")) >= 20)
      .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 20).as("probe"))
    val exact = docs.join(broadcast(probes),
        col("text").contains(col("probe")) && col("doc_id") =!= col("probe_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_probe_hits"), min("probe_id").as("first_probe"))
    for (numBits <- Seq(64, 1 << 16)) { // 64 bits ~ saturated: many false positives
      val bloom = graft.ops.ContaminationOps.bloomScreen(
        docs, "doc_id", "text", probes, "probe_id", "probe",
        probeLen = 20, numBits = numBits, numHashes = 5)
      assert(bloom.exceptAll(exact).count() === 0L, s"numBits=$numBits extra rows")
      assert(exact.exceptAll(bloom).count() === 0L, s"numBits=$numBits missing rows")
    }
    assert(exact.count() > 0L) // non-vacuous: sf0.001 has real contamination
  }

  test("bloom window test has no false negatives on multi-byte text") {
    // planted contamination with UTF-8 text on BOTH sides: the window
    // walk must step code points, or a mid-document multi-byte char
    // shifts every later window off its substring boundary
    val docs = Seq(
      (1L, "prefix 汉字 the sécret pâyload here 汉"), // contains the probe mid-string
      (2L, "französische sätze ohne treffer über"),
      (3L, "das geheimnis: the sécret pâyload here"),
      (4L, "nothing to see")).toDF("doc_id", "text")
    val probes = Seq((100L, "the sécret pâyload")).toDF("probe_id", "probe")
    val probeChars = "the sécret pâyload".length
    val out = graft.ops.ContaminationOps.bloomScreen(
      docs, "doc_id", "text", probes, "probe_id", "probe",
      probeLen = probeChars, numBits = 1 << 12, numHashes = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 3L))
  }

  test("approx_count_distinct stays within 5% of exact on real data (agg3 contract)") {
    val rows = SparkEntry.queries("agg3_approx_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
    }
    assert(rows.nonEmpty)
  }

  test("approx_percentile stays within 1% of the exact quartiles (agg8 contract)") {
    val rows = SparkEntry.queries("agg8_approx_percentiles")(spark, "/root/testdata/sf0.001")
      .collect()
    rows.foreach { r =>
      for (p <- Seq("p25", "p50", "p75")) {
        val approx = r.getAs[Double](s"approx_${p}_cents")
        val exact = r.getAs[Double](s"exact_${p}_cents")
        assert(math.abs(approx - exact) / exact < 0.01, s"$p: approx $approx vs exact $exact")
      }
    }
    assert(rows.nonEmpty)
  }

  test("graft_freq_sketch: exact when vocab <= k, never overestimates, guaranteed set survives any partitioning") {
    NativeExpressions.register(spark)
    // vocab <= k: the sketch IS the exact wordcount
    val small = Seq("a", "a", "b", "c", "c", "c").toDF("t")
    val exactSmall = small.agg(expr("graft_freq_sketch(t, 8)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.count")).as[(String, Long)].collect().toSet
    assert(exactSmall === Set(("c", 3L), ("a", 2L), ("b", 1L)))
    // skewed stream, k = 4: two hot items above n/(k+1) must be present
    // with estimates <= true counts, under EVERY partitioning
    val hot = Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      (1 to 100).flatMap(i => Seq.fill(2)(s"cold$i")) // n = 700, n/5 = 140
    for (parts <- Seq(1, 3, 16)) {
      val got = hot.toDF("t").repartition(parts)
        .agg(expr("graft_freq_sketch(t, 4)").as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item"), col("e.count")).as[(String, Long)].collect().toMap
      assert(got.contains("hot1") && got.contains("hot2"),
        s"guaranteed items missing at $parts partitions: ${got.keySet}")
      assert(got("hot1") <= 300L && got("hot2") <= 200L, s"MG must underestimate: $got")
      assert(got.size <= 4, s"k bound violated: $got")
    }
    // the hh2 gate's theorem holds on the real corpus
    val gate = SparkEntry.queries("hh2_freq_gate")(spark, "/root/testdata/sf0.001").collect().head
    assert(gate.getLong(1) === gate.getLong(2), s"guaranteed item missing from sketch: $gate")
    assert(gate.getDouble(3) === 1.0)
  }

  test("expressions survive codegen (no fallback errors) in a full pipeline") {
    val out = DedupOps.minHashNearDupPairs(
      Seq((0L, "a b c d e f g h"), (1L, "a b c d e f g h"), (2L, "z y x w v u t s")).toDF("doc_id", "text"),
      "doc_id", "text", numHashes = 64, bands = 16, minEstJaccard = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out === Set((0L, 1L)))
  }
}
