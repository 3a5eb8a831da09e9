package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, from exact to
  * near-duplicate. Scale design notes per operator:
  *
  *  - Exact dedup: one hash-shuffle on the dedup key (partial+final
  *    hash aggregation; the map-side combine collapses duplicates before
  *    the shuffle, so shuffled bytes ≈ distinct keys, not rows).
  *  - n-gram Jaccard: candidate generation joins on *shingles*, so cost is
  *    Σ_shingle count² — bounded by shingle selectivity, never a blind
  *    n² cross join. Verification aggregates per candidate pair.
  *  - MinHash+LSH: signatures are computed in ONE narrow projection per
  *    document (nested higher-order functions, no explode, no shuffle);
  *    only the b band keys per doc are exploded for bucketing, so the
  *    shuffle is O(n·b) rows regardless of document length. This is the
  *    100 TB path: candidate pairs come from equal band buckets only.
  *  - SimHash: one 64-bit signature per doc, computed in one projection;
  *    candidates via pigeonhole banding over 4×16-bit chunks (hamming ≤ 3
  *    duplicates must collide on ≥1 chunk).
  */
object DedupOps {

  /** Repartition a SEVERELY under-split input up to the session's default
    * parallelism. Small local files arrive as one partition, which would
    * run every narrow per-document computation (shingling, signatures) on
    * a single core. The 4× threshold keeps this a no-op for merely
    * sub-optimal splits (e.g. 16 partitions on 32 cores), where the
    * repartition exchange would cost more than the idle cores — only
    * inputs with < cores/4 splits are worth shuffling to spread.
    */
  private[graft] def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // estimate the scan's split count from logical-plan size stats instead
    // of df.rdd.getNumPartitions: the RDD conversion forced a second
    // physical plan (pre-AQE) to be built per call, while stats come from
    // the already-computed optimized plan (file-size metadata, no job).
    // Order of magnitude is all the 4× threshold needs; unknown-size plans
    // estimate huge, which safely lands on the no-op branch.
    val maxPartitionBytes = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = (estBytes / BigInt(math.max(1L, maxPartitionBytes))).max(BigInt(1))
    if (estSplits * 4 <= BigInt(target)) df.repartition(target) else df
  }

  /** Exact dedup on arbitrary key columns: keeps the row with the minimum
    * `idCol` per key (deterministic winner), counts collapsed copies.
    */
  def exactDedup(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles of `text` as an array column. Docs with
    * fewer than n tokens yield an empty array (guarded: Spark's `sequence`
    * counts *down* when stop < start, which would make `slice` throw on
    * start 0).
    */
  def shingles(text: Column, n: Int): Column =
    // the split is BOUND to a lambda variable via a one-element transform
    // before the position loop consumes it: higher-order functions do not
    // CSE a repeated child expression, so referencing split(text) directly
    // inside the per-position lambda would re-run the split for every
    // position — O(len²) splits per document (measured 4.5× on the
    // bigram-LM key before the same fix)
    element_at(transform(array(split(text, " ")), toks => {
      val positions = sequence(lit(1), size(toks) - (n - 1))
      array_distinct(
        when(size(toks) >= n,
          transform(positions, i => array_join(slice(toks, i, lit(n)), " ")))
          .otherwise(array().cast("array<string>")))
    }), 1)

  /** Exact n-gram Jaccard similarity pairs: all document pairs sharing at
    * least `minShared` shingles, with jaccard ≥ `minJaccard`.
    *
    * Shape: explode shingles → self-equi-join on shingle (doc_a < doc_b) →
    * count shared per pair → join per-doc set sizes → jaccard. The only
    * quadratic term is per-shingle bucket size; a frequency cap
    * (`maxShingleFreq`) drops degenerate ultra-common shingles the way
    * production near-dup pipelines drop stop-shingles.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minShared: Long = 2L,
      minJaccard: Double = 0.1,
      maxShingleFreq: Option[Long] = None
  ): DataFrame = {
    // two independent narrow passes over the widened input: (a) exploded
    // (doc, shingle) rows for the candidate join, (b) per-doc set sizes as
    // size(shingle-array) WITHOUT explode — carrying the array (or its
    // size) through the Generate copies it per exploded row, measured 4×
    // slower than a second pass. The sizes table is |docs| rows, so AQE
    // broadcasts it onto the (much smaller) aggregated pair table.
    val base = widen(docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")))
    val exploded = base.select(col("doc_id"), explode(shingles(col("__text"), n)).as("shingle"))
    // pair generation via per-shingle doc-lists instead of a self-join:
    // grouping emits exactly C(k,2) ordered pairs per shingle where the
    // join would produce k² rows before its filter, and one aggregation
    // replaces two shuffled join sides (measured ~20% faster warm, ~2×
    // cold).
    val (grouped, sizes) = maxShingleFreq match {
      case Some(cap) =>
        // Capped path: ONE bounded aggregation replaces the former
        // frequency pass + equi-join + second shingling pass. The
        // graft_topk heap holds at most cap+1 docs per shingle
        // (value = -doc_id, payload = doc_id: the emitted list ascends by
        // doc, with the payload tiebreak keeping the order exact even
        // past double's 2^53), so a degenerate stop-shingle can never
        // blow an executor buffer, and a heap that FILLS to cap+1 proves
        // df > cap — exactly the drop condition. Doc set sizes are then
        // recounted from the surviving lists (a narrow explode of capped
        // lists, not a second pass over the corpus).
        require(cap > 0 && cap < Int.MaxValue, s"maxShingleFreq must be a positive Int, got $cap")
        graft.functions.NativeExpressions.register(docs.sparkSession)
        val capped = exploded.groupBy("shingle")
          .agg(expr(s"graft_topk(-CAST(doc_id AS DOUBLE), doc_id, ${cap + 1})").as("top"))
          .filter(size(col("top")) <= cap)
          .select(col("shingle"),
            transform(col("top"), t => t.getField("payload")).as("ds"))
        val sz = capped.select(explode(col("ds")).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        (capped.filter(size(col("ds")) >= 2), sz)
      case None =>
        // Uncapped path: per-shingle list size is bounded only by the
        // shingle's document frequency — production corpora should set
        // maxShingleFreq, which both drops stop-shingles and caps the
        // aggregation buffer.
        val g = exploded.groupBy("shingle")
          .agg(array_sort(collect_list("doc_id")).as("ds"))
          .filter(size(col("ds")) >= 2)
        (g, base.select(col("doc_id"), size(shingles(col("__text"), n)).as("n_sh")))
    }
    grouped.select(explode(flatten(
        transform(col("ds"), (x, i) =>
          transform(slice(col("ds"), i + lit(2), size(col("ds")) - i - 1),
            y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      // strict: duplicate doc_id input rows would otherwise emit (d, d)
      // self-pairs (the sorted slice only guarantees j > i positionally)
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared_shingles"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("shared_shingles").cast("double") /
          (col("n_a") + col("n_b") - col("shared_shingles")), 4))
      .filter(col("shared_shingles") >= minShared && col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "shared_shingles", "jaccard")
  }

  /** Exact n-gram Jaccard VERIFICATION of a candidate pair set — the
    * standard second stage after sketch-based candidate generation
    * (MinHash bands, SimHash chunks): join each (doc_a, doc_b) pair's
    * distinct shingle sets back and append the exact
    * `round(|A∩B| / |A∪B|, 4)` as `jaccard`. The sketch columns the
    * candidates carried (est_jaccard, hamming) pass through untouched.
    * O(candidates) with two broadcast-or-shuffle joins against the
    * per-doc set table — never corpus-quadratic; the pair set is the
    * sketch stage's bounded output. Exactly [[prefixJaccardPairs]]'s
    * verification arithmetic, so a DuckDB oracle re-deriving the same
    * formula from raw text hash-matches it (the dd2 recipe). */
  def exactJaccardFor(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3
  ): DataFrame = {
    // the candidate set is consumed THREE times (endpoint ids + both
    // verification joins): checkpoint it, or each consumer re-runs the
    // whole sketch pipeline that produced it. Then shingle ONLY the
    // candidate endpoints — the verification joins are inner on the
    // pair ids, so docs outside the pair set never contribute;
    // semi-joining first keeps the shingling pass O(endpoints), not
    // O(corpus) (corpus-wide shingling measured 2-4× on mh1/sh1 at 10×,
    // for rows the joins then discarded)
    val p = pairs.localCheckpoint()
    val ids = p.select(col("doc_a").as("doc_id"))
      .unionByName(p.select(col("doc_b").as("doc_id"))).distinct()
    val sets = widen(docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")))
      .join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingles(col("__text"), n).as("__set"))
    val inter = size(array_intersect(col("__sa"), col("__sb")))
    p
      .join(sets.select(col("doc_id").as("doc_a"), col("__set").as("__sa")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("__set").as("__sb")), Seq("doc_b"))
      .withColumn("jaccard", round(inter.cast("double") /
        (size(col("__sa")) + size(col("__sb")) - inter), 4))
      .drop("__sa", "__sb")
  }

  /** Prefix-filtered exact Jaccard similarity join — the AllPairs/PPJoin
    * candidate generation (Bayardo et al. WWW'07; Xiao et al. WWW'08
    * prefix filtering principle): order every document's shingle set by
    * a GLOBAL total order (document frequency ascending, shingle text
    * tiebreak — rarest first), and join only each set's PREFIX of length
    * |x| − ⌈t·|x|⌉ + 1. If J(x,y) ≥ t the two prefixes must share a
    * token under the common order, so no qualifying pair is missed;
    * candidates are then verified with the exact intersection over the
    * full sets (threshold applied UNROUNDED, matching the theorem).
    *
    * Same result as the brute-force [[ngramJaccardPairs]] at
    * (minShared=1, no cap) — spec-pinned equivalence — but the
    * candidate join touches only the ~(1−t) rarest fraction of each
    * set, and rarest-FIRST ordering makes those the smallest join
    * buckets: the design regime is a realistic zipfian vocabulary at
    * high t (0.7-0.9), where most shingles are rare and the candidate
    * fan-out collapses — why production set-similarity joins use this
    * instead of the all-shingle join. Honest measurement on THIS
    * repo's synthetic corpus (a ~30-word vocabulary, so every shingle
    * is hot and frequency order carries little information): at t=0.9
    * the prefix join only ties the uncapped brute force warm (1.9 vs
    * 1.4 s at sf0.1; cold 3.2 vs 6.9 favors it) — the corpus is the
    * adversarial case for prefix filtering, and the operator is here
    * for its algorithm, pinned exact. Verification carries each
    * candidate pair's two shingle arrays once.
    */
  def prefixJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJaccard: Double = 0.5
  ): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0, 1], got $minJaccard")
    val base = widen(docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")))
    val sets = base.select(col("doc_id"), shingles(col("__text"), n).as("__set"))
      .filter(size(col("__set")) >= 1)
    val exploded = sets.select(col("doc_id"), explode(col("__set")).as("shingle"))
    // shingle sets are distinct per doc, so count(*) IS document frequency
    val dfreq = exploded.groupBy("shingle").agg(count(lit(1)).as("df"))
    val ordered = exploded.join(dfreq, "shingle")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("__ord"))
    val prefixLen = (size(col("__ord")) -
      ceil(lit(minJaccard) * size(col("__ord"))) + 1).cast("int")
    val prefixTokens = ordered
      .select(col("doc_id"), explode(slice(col("__ord"), lit(1), prefixLen)).as("p"))
      .select(col("doc_id"), col("p.shingle").as("shingle"))
    // streaming self-equi-join on the prefix tokens (NOT the grouped
    // C(k,2) buffer dd2 uses: prefix buckets are unbounded and a k²
    // in-memory pair array per bucket is exactly the blowup the cap
    // protects dd2 from; the join streams)
    val cand = prefixTokens.alias("a").join(prefixTokens.alias("b"), Seq("shingle"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("__set").as("__sa")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("__set").as("__sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("long").as("shared_shingles"),
        (size(col("__sa")) + size(col("__sb"))).as("__tot"))
      .filter(col("shared_shingles") >= 1 &&
        col("shared_shingles").cast("double") /
          (col("__tot") - col("shared_shingles")) >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("shared_shingles"),
        round(col("shared_shingles").cast("double") /
          (col("__tot") - col("shared_shingles")), 4).as("jaccard"))
  }

  /** Cross-corpus near-duplicate pairs: every (corpus doc, probe doc)
    * sharing ≥ `minShared` shingles with jaccard ≥ `minJaccard` — the
    * NEAR-DUP tier of benchmark decontamination, catching lightly edited
    * benchmark copies that the exact n-gram containment screen
    * (ContaminationOps) misses. The kept corpus is
    * `corpus ANTI-JOIN pairs` exactly as in [[nearDupSurvivors]].
    *
    * Shape, for the production asymmetry (corpus = the 100 TB side,
    * probes = a benchmark suite, thousands of docs):
    *  1. the probe shingle table is tiny → BROADCAST; the corpus's
    *     exploded shingles semi-join against it first, so ~all corpus
    *     shingles die before anything aggregates — per-row work is the
    *     shingling itself, the exchange carries only probe-shingle hits;
    *  2. the stop-shingle cap is applied to the corpus document
    *     frequency OF THE SURVIVORS — identical semantics to capping on
    *     full-corpus df (a semi-join on shingle drops whole shingles,
    *     never a surviving shingle's documents) at a fraction of the
    *     cost;
    *  3. pair fan-out per shingle is then (df ≤ cap) × (probe df),
    *     bounded, and the pair aggregation shuffles (corpus_id,
    *     probe_id) rows only.
    */
  def crossCorpusNearDupPairs(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minShared: Long = 2L,
      minJaccard: Double = 0.1,
      maxCorpusShingleFreq: Long = 20L
  ): DataFrame = {
    require(maxCorpusShingleFreq > 0, "maxCorpusShingleFreq must be positive")
    val c = widen(corpus.select(col(idCol).as("corpus_id"), col(textCol).as("__text")))
    val p = probes.select(col(idCol).as("probe_id"), col(textCol).as("__text"))
    val cSh = c.select(col("corpus_id"), explode(shingles(col("__text"), n)).as("shingle"))
    val pSh = p.select(col("probe_id"), explode(shingles(col("__text"), n)).as("shingle"))
    val cSizes = c.select(col("corpus_id"), size(shingles(col("__text"), n)).as("n_c"))
    val pSizes = p.select(col("probe_id"), size(shingles(col("__text"), n)).as("n_p"))
    val hits = cSh.join(broadcast(pSh.select("shingle").distinct()), Seq("shingle"), "left_semi")
    // ONE bounded aggregation applies the df cap and collects the
    // surviving doc lists (dd2's capped-heap pattern): a separate
    // df-count pass would consume `hits` twice and Catalyst re-shingles
    // the whole corpus for each consumer — at 100 TB that doubles the
    // dominant scan+shingle cost. The graft_topk heap holds ≤ cap+1
    // corpus ids per shingle (a heap that FILLS to cap+1 proves
    // df > cap — the drop condition), so a stop-shingle can never blow
    // an executor buffer either.
    graft.functions.NativeExpressions.register(corpus.sparkSession)
    val kept = hits.groupBy("shingle")
      .agg(expr(s"graft_topk(-CAST(corpus_id AS DOUBLE), corpus_id, ${maxCorpusShingleFreq + 1})").as("top"))
      .filter(size(col("top")) <= maxCorpusShingleFreq)
      .select(col("shingle"),
        explode(transform(col("top"), t => t.getField("payload").cast("long"))).as("corpus_id"))
    kept.join(broadcast(pSh), Seq("shingle"))
      .groupBy("corpus_id", "probe_id")
      .agg(count(lit(1)).as("shared_shingles"))
      .join(cSizes, Seq("corpus_id"))
      .join(broadcast(pSizes), Seq("probe_id"))
      .withColumn("jaccard",
        round(col("shared_shingles").cast("double") /
          (col("n_c") + col("n_p") - col("shared_shingles")), 4))
      .filter(col("shared_shingles") >= minShared && col("jaccard") >= minJaccard)
      .select("corpus_id", "probe_id", "shared_shingles", "jaccard")
  }

  /** Greedy near-duplicate retention — the terminal step of every near-dup
    * pipeline: given candidate pairs with `doc_a < doc_b`, drop every
    * document that appears as the larger side of a pair. For a clique of
    * mutual duplicates this keeps exactly the minimum id; for a chain
    * a–b, b–c without a–c it drops b AND c (greedy over-drop relative to
    * full connected-components clustering — the standard one-pass
    * trade-off, since transitive closure needs iterative joins).
    * Shape: one anti join against the distinct doc_b set.
    */
  def nearDupSurvivors(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("doc_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Connected components over a near-dup pair set, via alternating
    * large-star / small-star rounds (the MapReduce CC algorithm of
    * Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC '14). Returns `(doc_id, component)` for every document that
    * appears in a pair, where `component` is the minimum doc id of its
    * connected component.
    *
    * Scale shape: each round is two self-joins keyed on a node id — a
    * bounded number of hash-shuffles over the PAIR set (orders of
    * magnitude smaller than the corpus), never over documents. The
    * algorithm converges in O(log n) rounds even on pathological chains;
    * real dup clusters (cliques and short chains) converge in 2-3. Each
    * round is `localCheckpoint`ed to truncate lineage (on a production
    * cluster with a checkpoint dir, `checkpoint` is the durable
    * equivalent); convergence is detected by an (edge-count, hash-sum)
    * fingerprint, one tiny action per round over the already-materialized
    * edge set.
    *
    * Edges are kept canonical (u < v) throughout:
    *  - large-star connects every neighbor LARGER than a node to the
    *    minimum of its neighborhood (including itself);
    *  - small-star connects every smaller neighbor (and the node) to the
    *    minimum of the smaller neighborhood.
    * At the fixpoint the edge set is a disjoint union of stars rooted at
    * each component's minimum id.
    */
  def connectedComponents(
      pairs: DataFrame,
      maxRounds: Int = 30,
      // profiling hook: accumulates nanoseconds spent in the per-round
      // convergence fingerprint action (graft.Profile measures what
      // fraction of the CC runtime the driver-visible .head() is)
      fingerprintNanos: Option[java.util.concurrent.atomic.AtomicLong] = None): DataFrame = {
    def fingerprint(e: DataFrame): (Long, String) = {
      val t0 = System.nanoTime()
      // hash-sum in DECIMAL(38,0): xxhash64 values span the full long
      // range, so a plain long sum overflows (ANSI mode throws)
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      fingerprintNanos.foreach(_.addAndGet(System.nanoTime() - t0))
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toPlainString)
    }
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min(col("v")).as("mv"))
      nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(least(col("u"), col("mv")).as("u"), col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("v").agg(min(col("u")).as("m"))
      val moved = e.join(mins, "v")
        .filter(col("u") =!= col("m"))
        .select(col("m").as("u"), col("u").as("v"))
      val self = mins.select(col("m").as("u"), col("v"))
      moved.union(self).distinct()
    }
    var edges = pairs
      .select(col("doc_a").cast("long").as("u"), col("doc_b").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)
    var prev = fingerprint(edges)
    var round = 0
    var stable = false
    while (round < maxRounds && !stable) {
      edges = smallStar(largeStar(edges)).localCheckpoint(true)
      val cur = fingerprint(edges)
      stable = cur == prev
      prev = cur
      round += 1
    }
    // a non-star edge set would yield silently WRONG components — fail
    // loudly instead. 30 rounds covers any realistic diameter (the
    // algorithm converges in O(log n) rounds; real dup clusters take
    // 2-4); hitting this means the input is pathological, not that the
    // answer should be guessed.
    require(stable,
      s"connectedComponents did not converge within $maxRounds rounds; raise maxRounds")
    // star fixpoint: every edge is (component root, member)
    edges.select(col("v").as("doc_id"), col("u").as("component"))
      .union(edges.select(col("u").as("doc_id"), col("u").as("component")))
      .distinct()
  }

  /** Cluster-aware near-duplicate retention: keeps exactly ONE document
    * (the minimum id) per connected component of the pair graph, fixing
    * [[nearDupSurvivors]]'s greedy over-drop — e.g. for pairs (1,3),(2,3)
    * the greedy pass keeps {1,2} (2 never appears as a doc_b) although
    * all three are transitively duplicates; CC keeps {1}.
    * Shape: one CC run over the pair set, then one anti join.
    */
  def ccSurvivors(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      fingerprintNanos: Option[java.util.concurrent.atomic.AtomicLong] = None): DataFrame = {
    val dropped = connectedComponents(pairs, fingerprintNanos = fingerprintNanos)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }

  /** Deterministic MinHash parameters: k affine hashes
    * h_i(x) = (a_i·x + b_i) mod p over 31-bit-reduced xxhash64 shingle
    * hashes, p = 2^31-1 (Mersenne). With a, b, x all < 2^31 every product
    * stays below 2^62 — no 64-bit overflow. Constants derive from a fixed
    * seed so signatures are reproducible across runs and clusters.
    */
  private val MinHashPrime = 2147483647L // 2^31 - 1

  private def hashParams(k: Int, seed: Long): Seq[(Long, Long)] = {
    // single source of truth shared with the native expressions — drift
    // here would silently break the HOF-as-executable-spec invariant
    val (as, bs) = graft.functions.HashKernels.affineParams(k, seed)
    as.toSeq.zip(bs.toSeq)
  }

  /** 31-bit shingle hashes of a text column (stage this as its OWN column
    * before fanning out to the k affine hashes: inlining it into all k
    * folds recomputes shingling k times — measured 60× slower).
    */
  def shingleHashes(text: Column, shingleSize: Int): Column =
    transform(shingles(text, shingleSize), s => pmod(xxhash64(s), lit(MinHashPrime)))

  /** MinHash signature (array<long>, length k) over a pre-materialized
    * [[shingleHashes]] column. */
  def minHashSignatureFromHashes(hashes31: Column, numHashes: Int, seed: Long): Column = {
    val sigParts: Seq[Column] = hashParams(numHashes, seed).map { case (a, b) =>
      // empty shingle set (doc shorter than the shingle size): array_min
      // yields NULL — coalesce to Long.MaxValue to stay bit-for-bit equal
      // to the native graft_minhash kernel's empty-set signature
      coalesce(
        array_min(transform(hashes31, x => pmod(lit(a) * x + lit(b), lit(MinHashPrime)))),
        lit(Long.MaxValue))
    }
    array(sigParts: _*)
  }

  /** MinHash signature straight from text — convenience for single-column
    * use; pipelines should stage [[shingleHashes]] first. */
  def minHashSignature(text: Column, numHashes: Int = 64, shingleSize: Int = 3, seed: Long = 42L): Column =
    minHashSignatureFromHashes(shingleHashes(text, shingleSize), numHashes, seed)

  /** MinHash+LSH near-duplicate candidate pairs.
    *
    * Signatures are banded into `bands` groups of `numHashes/bands` rows;
    * docs colliding on any band's hash become candidates; candidates are
    * scored by estimated jaccard = fraction of equal signature positions,
    * and kept above `minEstJaccard`.
    */
  def minHashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      minEstJaccard: Double = 0.5,
      seed: Long = 42L
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // native codegen'd signature (graft.functions.NativeExpressions) — the
    // HOF builders above stay as its executable specification
    graft.functions.NativeExpressions.register(docs.sparkSession)
    val sig = widen(docs)
      .filter(size(split(col(textCol), " ")) >= shingleSize) // too-short docs have no shingles
      .select(col(idCol).as("doc_id"),
        expr(s"graft_minhash(`$textCol`, $shingleSize, $numHashes, $seed)").as("sig"))
    // one narrow pass so far; now explode only the b band keys per doc
    val banded = sig.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        bIdx => xxhash64(
          concat_ws(",", transform(slice(col("sig"), bIdx * r + 1, lit(r)), x => x.cast("string"))),
          bIdx)))
    ).withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val left = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val right = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    // estimate + threshold BEFORE the dedup shuffle: re-estimating a pair
    // that collides in several bands is a map-side projection, while
    // deduplicating first would shuffle both k-long signatures per
    // candidate — the exchange carries only (doc_a, doc_b, est_jaccard)
    left.join(right, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("est_jaccard",
        round(aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, m) => acc + m).cast("double") / numHashes, 4))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("doc_a", "doc_b", "est_jaccard")
      .dropDuplicates("doc_a", "doc_b") // candidate may collide in several bands
  }

  /** 64-bit SimHash signature: sign-aggregated bitwise vote over shingle
    * hashes, one projection, no shuffle. For each bit position j, count
    * shingles with bit j set minus shingles with it unset; bit j of the
    * signature is 1 iff the vote is positive.
    */
  /** SimHash bits from a pre-materialized array of shingle hashes.
    * Statically unrolled over bit positions so shift counts are literals;
    * at true 100 TB scale this becomes one custom TypedImperativeAggregate
    * or Expression with doGenCode — the composition here is the semantics.
    */
  def simHashFromHashes(hs: Column): Column = {
    val bits: Seq[Column] = (0 until 64).map { j =>
      val vote = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  def simHash(text: Column, shingleSize: Int = 2): Column =
    simHashFromHashes(transform(shingles(text, shingleSize), s => xxhash64(s)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming ≤ maxHamming, candidates via
    * 4×16-bit chunk banding (pigeonhole: hamming ≤ 3 ⇒ some chunk equal).
    */
  def simHashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      shingleSize: Int = 2
  ): DataFrame = {
    // 4-chunk banding is complete only up to hamming 3 (pigeonhole needs
    // maxHamming+1 chunks); a larger threshold would silently drop pairs
    require(maxHamming <= 3, s"4-chunk banding supports maxHamming <= 3, got $maxHamming")
    graft.functions.NativeExpressions.register(docs.sparkSession)
    val sig = widen(docs)
      // too-short docs have an empty shingle set -> signature 0; without
      // this filter every pair of them would collide at hamming 0
      .filter(size(split(col(textCol), " ")) >= shingleSize)
      .select(col(idCol).as("doc_id"),
        expr(s"graft_simhash64(`$textCol`, $shingleSize)").as("sig"))
    val chunks: Seq[Column] = (0 until 4).map(c => shiftright(col("sig"), c * 16).bitwiseAND(0xffffL))
    val chunked = sig.select(col("doc_id"), col("sig"), posexplode(array(chunks: _*)))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "chunk_val"))
    val left = chunked.select(col("chunk"), col("chunk_val"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val right = chunked.select(col("chunk"), col("chunk_val"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    // same score-then-dedup shape as minHashNearDupPairs: the hamming
    // filter drops most candidates before the dedup exchange
    left.join(right, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .dropDuplicates("doc_a", "doc_b")
  }

  // ---- exact duplicate-SPAN dedup (sub-document granularity) --------------

  /** Maximal duplicated spans per document — the exact-substring dedup of
    * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better": remove any substring occurring verbatim more than once in
    * the corpus), re-expressed relationally at word n-gram granularity
    * instead of the paper's corpus-wide suffix array: a position is
    * duplicated iff the n-gram starting there occurs more than once in
    * the corpus (anywhere — another doc or elsewhere in the same doc),
    * and overlapping duplicated n-grams merge into one maximal span. Any
    * duplicated substring of ≥ n tokens is covered by ≥ 1 duplicated
    * n-gram at every token it spans, so span union ⊇ the paper's
    * ≥n-token duplicated substrings — same guarantee, no global sort.
    *
    * Returns one row per merged span: (idCol, span_start, span_end) with
    * 1-based token positions, end exclusive.
    *
    * Scale shape (the 100 TB story): grams explode to O(total tokens)
    * rows, but the shuffle carries only (hash, doc, pos) — the 16-byte
    * md5 of the n-gram, never its text (128 bits makes a collision across
    * even 10^15 grams a ~10^-9 event; md5 rather than xxhash64 so the
    * DuckDB oracle can replay the exact key). Duplicate detection is one
    * hash-aggregate with map-side combine (bytes ≈ distinct grams), the
    * doc→dup-gram association a co-partitioned semi join on that same
    * hash, and the span merge a per-doc window over only the DUPLICATED
    * positions (≪ tokens). Nothing is all-pairs, nothing collects.
    */
  def duplicateSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8
  ): DataFrame = {
    require(n >= 2, s"span n-gram size must be >= 2, got $n")
    // token array as a projected ATTRIBUTE, not an inline expression: a
    // lambda referencing split(...) directly re-runs the split per
    // element (no CSE across higher-order functions) — O(len²) per doc
    val tk = col("__toks")
    val grams = widen(docs)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .filter(size(tk) >= n)
      .select(col(idCol), posexplode(
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => unhex(md5(array_join(slice(tk, i, lit(n)), " "))))))
      .withColumnsRenamed(Map("pos" -> "pos0", "col" -> "h"))
      // posexplode is 0-based over the positions array; token space is 1-based
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("h"))
    val dup = grams.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("h")
    val marks = grams.join(dup, Seq("h"), "left_semi")
      .select(col(idCol), col("pos"), (col("pos") + n).as("fin"))
    // classic interval merge: a mark starts a new span iff it begins
    // strictly after every earlier mark's end (running max over the
    // preceding rows; the first row's empty-frame max is NULL -> not a
    // break -> span ids start at 0)
    val byPos = Window.partitionBy(idCol).orderBy("pos")
    val brk = when(
      col("pos") > max(col("fin")).over(byPos.rowsBetween(Window.unboundedPreceding, -1)),
      1).otherwise(0)
    marks
      .withColumn("span_id", sum(brk).over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("span_id"))
      .agg(min(col("pos")).as("span_start"), max(col("fin")).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Per-document duplicated-span profile over ALL docs (clean docs carry
    * zeros): (idCol, n_tokens, n_dup_spans, dup_tokens, kept_tokens).
    * Integer-exact — the hash-checked face of [[duplicateSpans]]. */
  def duplicateSpanProfile(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8
  ): DataFrame = {
    val perDoc = duplicateSpans(docs, idCol, textCol, n)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("span_end") - col("span_start")).as("dup_tokens"))
    docs.select(col(idCol), size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (col("n_tokens") - coalesce(col("dup_tokens"), lit(0L))).as("kept_tokens"))
  }

  /** The excision itself: every token inside a duplicated span is removed
    * and the survivors rejoin with single spaces — the output corpus the
    * paper's ExactSubstr pass produces. Span computation is the heavy
    * distributed part above; the cut is one narrow projection (the span
    * list per doc is bounded by doc length, carried as an array through a
    * single left join — no second pass over tokens leaves the executor).
    * Docs whose entire text is duplicated come back as the empty string.
    */
  def exciseDuplicateSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8
  ): DataFrame = {
    val spanSets = duplicateSpans(docs, idCol, textCol, n)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val toks = split(col(textCol), " ")
    val others = docs.columns.filterNot(c => c == idCol || c == textCol).map(col)
    docs.join(spanSets, Seq(idCol), "left")
      .select(col(idCol) +:
        when(col("__spans").isNull, col(textCol))
          .otherwise(array_join(
            filter(toks, (t, i) => !exists(col("__spans"),
              s => s("span_start") <= i + 1 && i + 1 < s("span_end"))),
            " "))
          .as(textCol) +: others: _*)
  }
}
