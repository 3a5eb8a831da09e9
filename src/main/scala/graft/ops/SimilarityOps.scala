package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Two paths, per the standard ANN playbook:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus; one narrow pass over the corpus, then a
  *    bounded-heap top-k aggregate (map-side partial, ≤k rows per query
  *    per task into the shuffle). The corpus is not shuffled
  *    by vector (only severely under-split local inputs are widened once;
  *    see DedupOps.widen) — only (q, k) result rows move. This is the
  *    correctness baseline and is itself 100 TB-viable when |queries| is
  *    modest (the scan is embarrassingly parallel).
  *  - [[lshTopK]] — random-hyperplane (sign) LSH bucketing: corpus and
  *    queries hash to sign-bit buckets; only same-bucket pairs are scored.
  *    Probing multiple bucket permutations trades recall for cost. This is
  *    the scale path when |queries| is large: the join is an equi-join on
  *    bucket id, so Catalyst shuffles by bucket instead of cross-joining.
  *
  * All math is done via codegen-friendly higher-order functions with
  * explicit double accumulation (deterministic left fold).
  */
object SimilarityOps {

  /** Dot product of two array<float/double> columns, accumulated in double
    * (sequential left fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-query top-k ranking of a scored candidate set via the bounded-heap
    * `graft_topk` TypedImperativeAggregate (functions/TopKAgg.scala).
    *
    * Why not `row_number() OVER (PARTITION BY q_id ...)`: the window must
    * shuffle and fully sort EVERY scored candidate to the reducer. The heap
    * aggregate partial-aggregates map-side, so each task ships at most k
    * rows per query into the exchange — the shuffle scales with
    * queries×k, not candidates. Tie-break (score desc, vec_id asc) matches
    * the window ordering exactly (TopKEntry.bestFirst), so results are
    * bit-identical to the window formulation (proven by w4_topk_agg's
    * oracle row and ann1's hash-match).
    *
    * Expects columns (q_id, vec_id: bigint, score: double); emits
    * (q_id, vec_id, score, rank) with rank 1-based, best first.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    graft.functions.NativeExpressions.register(scored.sparkSession)
    scored
      .groupBy("q_id")
      .agg(expr(s"graft_topk(score, vec_id, $k)").as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.payload").as("vec_id"),
        col("col.value").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param queries  (qIdCol, vecCol) — expected small (broadcast side)
    * @param corpus   (idCol, vecCol)
    * @param k        neighbors per query
    * @param excludeSelf drop rows where query id equals corpus id
    */
  def bruteForceTopK(
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    graft.functions.NativeExpressions.register(corpus.sparkSession)
    val q = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"))
    val c = widen(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec")))
    // the native kernel is float32-only; for double vectors (e.g. the
    // int8-reconstructed corpus in sq2) fall back to the HOF cosine —
    // the kernel's bit-parity executable spec, so scores are identical
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def isFloatVec(df: DataFrame, name: String): Boolean =
      df.schema(name).dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    val score =
      if (isFloatVec(q, "q_vec") && isFloatVec(c, "c_vec"))
        expr("graft_cosine(q_vec, c_vec)")
      else cosine(col("q_vec"), col("c_vec"))
    val scored = c.join(broadcast(q), if (excludeSelf) col("q_id") =!= col("vec_id") else lit(true))
      .withColumn("score", round(score, 4))
    rankTopK(scored.select("q_id", "vec_id", "score"), k)
  }

  /** Deterministic pseudo-random hyperplanes: `numPlanes` vectors of
    * dimension `dim`, seeded. Returned as a literal array-of-arrays column
    * so the comparison runs fully inside the executors (no driver loop).
    */
  private def hyperplanes(dim: Int, numPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id of a vector: bit i = sign(v · plane_i). */
  def signBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits: Seq[Column] = planes.toSeq.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toSeq.map(lit(_)): _*)
      when(dot(vec, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Multi-table bucket ids: one sign-bucket per table, each table with its
    * own plane set. Single-table sign-LSH has recall ≈ p^b per neighbor
    * (p = 1 - θ/π): for cos≈0.35 neighbors and 6 planes that is ~5% —
    * useless. L tables lift it to 1-(1-p^b)^L (e.g. b=4, L=8 → ~70%).
    * Returned as an array; explode to (table, bucket) rows for the join.
    */
  private[graft] def tableBuckets(vec: Column, dim: Int, numPlanes: Int, tables: Int, seed: Long): Column =
    array((0 until tables).map(t => signBucket(vec, hyperplanes(dim, numPlanes, seed + 1000L * t))): _*)

  /** Repartition an under-split input up to default parallelism (shared
    * helper — see DedupOps.widen for the rationale). */
  private def widen(df: DataFrame): DataFrame = DedupOps.widen(df)

  private def withTableBuckets(df: DataFrame, vecCol: String, dim: Int,
      numPlanes: Int, tables: Int, seed: Long): DataFrame = {
    // native kernel (graft.functions.NativeExpressions.SignBuckets) — the
    // HOF tableBuckets above stays as its executable specification
    graft.functions.NativeExpressions.register(df.sparkSession)
    widen(df).select(col("*"),
      posexplode(expr(s"graft_signbuckets(`$vecCol`, $dim, $numPlanes, $tables, ${seed}L)")))
      .withColumnsRenamed(Map("pos" -> "table_id", "col" -> "bucket"))
  }

  /** Approximate top-k via multi-table sign-LSH: candidates from equal
    * (table, bucket) buckets, deduplicated, then scored exactly. The join
    * is an equi-join on (table, bucket) — Catalyst shuffles by bucket,
    * never a blind n×m cross join; corpus replication factor is `tables`.
    */
  def lshTopK(
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      numPlanes: Int = 4,
      tables: Int = 8,
      seed: Long = 42L,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val q = withTableBuckets(
      queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec")),
      "q_vec", dim, numPlanes, tables, seed)
    val c = withTableBuckets(
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec")),
      "c_vec", dim, numPlanes, tables, seed)
    graft.functions.NativeExpressions.register(corpus.sparkSession)
    // score BEFORE deduplicating collisions: scoring is a map-side codegen'd
    // projection, so re-scoring a pair that collides in several tables is
    // cheaper than shuffling both embedding arrays through the dedup —
    // the exchange carries (q_id, vec_id, score), not 2×dim floats
    val scored = c.join(q, Seq("table_id", "bucket"))
      .filter(if (excludeSelf) col("q_id") =!= col("vec_id") else lit(true))
      .withColumn("score", round(expr("graft_cosine(q_vec, c_vec)"), 4))
      .select("q_id", "vec_id", "score")
      .dropDuplicates("q_id", "vec_id") // same pair may collide in several tables
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) approximate top-k: a coarse k-means quantizer
    * partitions the corpus into `nLists` cells; each query probes its
    * `nProbe` nearest cells and scores only those candidates.
    *
    * Scale shape: training samples a bounded fraction; assignment is one
    * narrow pass; the probe join is an equi-join on cell id, so the
    * shuffle is O(corpus + queries·nProbe) — candidate scoring touches
    * ~nProbe/nLists of the corpus instead of all of it. Deterministic via
    * the k-means seed. Centroids are small (nLists × dim) and ship to
    * executors as literals — no driver-side loop over data.
    */
  def ivfTopK(
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L,
      excludeSelf: Boolean = true
  ): DataFrame = {
    graft.functions.NativeExpressions.register(corpus.sparkSession)
    val (assigned, centroids) = ivfQuantize(corpus, idCol, vecCol, nLists, seed)

    // nProbe nearest centroids per query via the native kernel
    // (graft.functions.NativeExpressions.NearestCells) — [[probeCellsHOF]]
    // stays as its executable specification. Centroids ship to executors
    // as a typed literal (nLists × dim — small by construction; see
    // QuantizeOps.centroidsLit for why not SQL text).
    val q = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"))
      .select(col("q_id"), col("q_vec"),
        explode(call_function("graft_nearest_cells", col("q_vec"),
          QuantizeOps.centroidsLit(centroids), lit(nProbe))).as("cell"))

    val scored = assigned.join(q, Seq("cell"))
      .filter(if (excludeSelf) col("q_id") =!= col("vec_id") else lit(true))
      .withColumn("score", round(expr("graft_cosine(q_vec, c_vec)"), 4))
    rankTopK(scored.select("q_id", "vec_id", "score"), k)
  }

  /** IVF-PQ: the standard two-level ANN stack — the IVF coarse quantizer
    * routes each query to its nProbe nearest cells (exactly [[ivfTopK]]'s
    * candidate selection), and candidates are scored against their
    * PQ-RECONSTRUCTED vectors (QuantizeOps.pqEncodeReconstruct) instead
    * of raw ones. At 100 TB this is what actually ships: the raw
    * float32 corpus never has to exist at query time — cells hold 8-byte
    * PQ codes (32× smaller), and the probe join + scoring run entirely
    * against the compressed form. Queries stay full-precision (the
    * asymmetric setup, like sq2/sq3). Recall pays both the routing loss
    * (gated by ann5) and the quantization distortion (gated by sq3);
    * ann7 gates the composition end to end.
    */
  def ivfPqTopK(
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      kCodes: Int = 256,
      dim: Int = 64,
      seed: Long = 42L,
      excludeSelf: Boolean = true,
      adc: Boolean = true
  ): DataFrame = {
    graft.functions.NativeExpressions.register(corpus.sparkSession)
    val (assigned, centroids) = ivfQuantize(corpus, idCol, vecCol, nLists, seed)
    val codebook = QuantizeOps.pqFit(corpus, vecCol, dim, m, kCodes, seed)
    val sd = dim / m
    val centroidLit = QuantizeOps.centroidsLit(centroids)
    val probed = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("q_vec"))
    if (adc) {
      // ADC (asymmetric distance computation) — the production scoring
      // path: candidates carry only their m PQ CODES (m bytes, not a
      // dim-sized recon array — a 32× narrower probe-join shuffle at
      // these parameters), and each query precomputes one m×kCodes
      // lookup table of subspace dot products BEFORE the join. Because
      // the reconstruction is a concatenation, both the dot product and
      // the recon norm decompose per-subspace with zero cross terms, so
      // ADC cosine ≡ recon cosine exactly (spec-pinned parity; the
      // recon path below stays as the executable specification).
      val compressed = assigned.select(col("cell"), col("vec_id"),
        QuantizeOps.pqEncode("c_vec", codebook).as("codes"))
      // per-subspace dot-product LUT: luts[j][c] = q_subj · codebook[j][c]
      val luts = array(codebook.indices.map { j =>
        transform(QuantizeOps.centroidsLit(codebook(j)), c =>
          aggregate(
            zip_with(slice(col("q_vec"), j * sd + 1, sd), c,
              (x, y) => x.cast("double") * y),
            lit(0.0), (acc, v) => acc + v))
      }: _*)
      // centroid norm² tables are query-independent literals
      val norm2Lit = typedLit[Seq[Seq[Double]]](
        codebook.map(_.map(c => c.map(x => x * x).sum).toSeq).toSeq)
      val q = probed
        .select(col("q_id"), luts.as("luts"), norm(col("q_vec")).as("qnorm"),
          explode(call_function("graft_nearest_cells", col("q_vec"),
            centroidLit, lit(nProbe))).as("cell"))
      val dotSum = codebook.indices
        .map(j => element_at(element_at(col("luts"), j + 1),
          element_at(col("codes"), j + 1) + 1))
        .reduce(_ + _)
      val norm2Sum = codebook.indices
        .map(j => element_at(element_at(norm2Lit, j + 1),
          element_at(col("codes"), j + 1) + 1))
        .reduce(_ + _)
      val scored = compressed.join(q, Seq("cell"))
        .filter(if (excludeSelf) col("q_id") =!= col("vec_id") else lit(true))
        .withColumn("score", round(dotSum / (col("qnorm") * sqrt(norm2Sum)), 4))
      rankTopK(scored.select("q_id", "vec_id", "score"), k)
    } else {
      // reconstruction scoring — ADC's executable specification. The
      // dot product and recon norm² are computed in the SAME per-subspace
      // decomposition order as ADC (left fold within each subspace, then
      // a left-associated sum across subspaces): FP addition is
      // non-associative, so a flat 64-element fold could land a hair off
      // ADC near a round(4) boundary — summing in the identical order
      // makes the bit-for-bit parity spec a theorem, not a hope.
      val compressed = assigned.select(col("cell"), col("vec_id"),
        QuantizeOps.pqEncodeReconstruct("c_vec", codebook).as("recon"))
      val q = probed.select(col("q_id"), col("q_vec"),
        explode(call_function("graft_nearest_cells", col("q_vec"),
          centroidLit, lit(nProbe))).as("cell"))
      def subFold(j: Int)(f: (Column, Column) => Column): Column =
        aggregate(
          zip_with(slice(col("q_vec"), j * sd + 1, sd), slice(col("recon"), j * sd + 1, sd), f),
          lit(0.0), (acc, v) => acc + v)
      val dotSum = codebook.indices
        .map(j => subFold(j)((x, y) => x.cast("double") * y))
        .reduce(_ + _)
      val norm2Sum = codebook.indices
        .map(j => subFold(j)((_, y) => y * y))
        .reduce(_ + _)
      val scored = compressed.join(q, Seq("cell"))
        .filter(if (excludeSelf) col("q_id") =!= col("vec_id") else lit(true))
        .withColumn("score", round(dotSum / (norm(col("q_vec")) * sqrt(norm2Sum)), 4))
      rankTopK(scored.select("q_id", "vec_id", "score"), k)
    }
  }

  /** The IVF coarse quantizer: fit on a bounded positional sample, assign
    * every corpus vector to its nearest centroid. Shared by [[ivfTopK]]
    * and the cell-balance gate (ann6) so the gate audits EXACTLY the
    * quantizer the search path uses. Returns (assignment (vec_id, c_vec,
    * cell), centroids). Deterministic for a fixed seed and
    * parallelism-invariant (see the sampling notes inline).
    */
  private[graft] def ivfQuantize(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      seed: Long
  ): (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val corpusRaw = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"))
    val corpusVec = widen(corpusRaw).withColumn("features", array_to_vector(col("c_vec")))
    // coarse-quantizer training needs only a bounded sample (the standard
    // IVF recipe): ~40 points per centroid is plenty for cell assignment
    // quality, and keeps the fit O(sample) as the corpus grows — at
    // 100 TB the full-corpus fit would dominate the whole query.
    // Sampling is a positional prefix of the first few partitions
    // (spark_partition_id + the per-partition record number packed into
    // monotonically_increasing_id's low 33 bits): zero extra jobs, where
    // a count()-then-fraction sample costs a full corpus pass before any
    // work. Embedding values are independent of row position, so the
    // prefix is an unbiased value sample; even under a corpus sorted by
    // source, a skewed quantizer only degrades candidate routing
    // (recall), never the exactness of scoring within probed cells.
    //
    // PARALLELISM-INVARIANT by construction: the sample reads the RAW
    // scan partitioning (fixed by file splits) rather than the widened
    // one, the partition budget is a constant (not defaultParallelism),
    // and the fit runs as a single task — so the trained quantizer, and
    // with it every downstream result, is identical under local[4] and
    // local[32] (measured: the pre-fix sample made IVF recall differ by
    // core count, which would break any golden-value gate).
    val sampleTarget = math.max(40L * nLists, 1024L)
    val trainRaw = SampleOps.positionalPrefixSample(corpusRaw, sampleTarget)
      .withColumn("features", array_to_vector(col("c_vec")))
      .select("features")
    // the sample is tiny — one task makes the k-means reduction order
    // (and hence the centroids) bit-stable across parallelism levels
    val train = trainRaw.coalesce(1)
    // random init + few iterations: the coarse quantizer only partitions
    // space for candidate routing — k-means|| init would spend several
    // extra distributed passes to place centroids that nProbe-probing
    // makes insensitive anyway
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(5)
      .setInitMode("random").fit(train)
    val assigned = model.transform(corpusVec)
      .select(col("vec_id"), col("c_vec"), col("prediction").as("cell"))
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** Cell-balance audit for the IVF quantizer (the ann6 gate): one row of
    * corpus-level cell statistics from the SAME quantize path [[ivfTopK]]
    * uses. ann5 gates recall; this gates quantizer DEGENERACY — on a
    * skewed corpus a mega-cell silently guts recall (most candidates in
    * one probe) or blows a probe's memory, and empty cells waste routing.
    * One extra aggregate over the assignment the search already computes;
    * cost is O(corpus) regardless of nLists.
    */
  def ivfCellBalance(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    val (assigned, _) = ivfQuantize(corpus, idCol, vecCol, nLists, seed)
    assigned.groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(
        sum("n").cast("long").as("n_vectors"),
        count(lit(1)).cast("long").as("n_cells"),
        (lit(nLists) - count(lit(1))).cast("long").as("n_empty"),
        max("n").cast("long").as("max_cell"))
      .select(col("n_vectors"), col("n_cells"), col("n_empty"), col("max_cell"),
        round(col("max_cell").cast("double") / col("n_vectors"), 4).as("max_share"))
  }

  /** HOF reference for the native graft_nearest_cells kernel: squared-L2
    * distance to each centroid as a sequential fold, array_sort on the
    * (dist, cell) struct, slice to nProbe — the spec the kernel must match
    * bit-for-bit (see NativeExpressionsSpec). */
  private[graft] def probeCellsHOF(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column = {
    val distToCell: Seq[Column] = centroids.toSeq.zipWithIndex.map { case (cVec, cellId) =>
      val cLit = array(cVec.toSeq.map(lit(_)): _*)
      struct(
        aggregate(zip_with(vec, cLit, (x, y) => {
          val d = x.cast("double") - y
          d * d
        }), lit(0.0), (acc, v) => acc + v).as("dist"),
        lit(cellId).as("cell"))
    }
    slice(array_sort(array(distToCell: _*)), 1, nProbe)("cell")
  }

  /** Embedding-cosine near-duplicate pairs (all pairs above a threshold)
    * via multi-table LSH buckets — the embedding analogue of MinHash
    * near-dup. High-threshold pairs (cos ≥ 0.8) collide with high
    * probability per table, so few tables suffice.
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      dim: Int,
      numPlanes: Int = 6,
      tables: Int = 6,
      seed: Long = 42L
  ): DataFrame = {
    val withBucket = withTableBuckets(
      df.select(col(idCol).as("id"), col(vecCol).as("vec")),
      "vec", dim, numPlanes, tables, seed)
    val a = withBucket.select(col("table_id"), col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = withBucket.select(col("table_id"), col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    graft.functions.NativeExpressions.register(df.sparkSession)
    // score + threshold BEFORE the dedup shuffle: the exchange then carries
    // only surviving (id_a, id_b, score) triples instead of every candidate
    // with both embedding arrays attached (same result — scores are
    // deterministic per pair, so collisions dedup to identical rows)
    a.join(b, Seq("table_id", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(expr("graft_cosine(vec_a, vec_b)"), 4))
      .filter(col("score") >= minCosine)
      .select("id_a", "id_b", "score")
      .dropDuplicates("id_a", "id_b")
  }

  /** Per-group embedding centroids (mean pooling) in flat exploded form:
    * one row per (group, dimension) with the member count and the mean
    * component — the building block for prototype classifiers, cluster
    * summaries, and per-domain embedding drift monitoring. Exactness:
    * each float component casts to DECIMAL(18,8) (both engines round
    * ties away from zero — the ExactSums contract) and sums exactly, so
    * the only float op is one final exactly-rounded division, and the
    * result is reproducible under the DuckDB oracle regardless of
    * aggregation order. Shape: one posexplode + one hash aggregate with
    * map-side combine — shuffle is O(groups × dims), never O(vectors).
    */
  def labelCentroids(vectors: DataFrame, labelCol: String, vecCol: String): DataFrame =
    vectors
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos0", "x")))
      .select(col(labelCol), (col("pos0") + 1).as("pos"),
        col("x").cast(org.apache.spark.sql.types.DecimalType(18, 8)).as("xd"))
      .groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("xd")).as("s"))
      .select(col(labelCol), col("pos"), col("n_vectors"),
        round(col("s").cast("double") / col("n_vectors"), 6).as("centroid"))

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): partition the corpus into semantic clusters, then
    * within each cluster mark as duplicates the vectors whose cosine to
    * a SMALLER-id cluster member reaches `minCosine` (greedy min-id
    * retention, the dd1/dd3 winner rule). Clustering bounds the
    * quadratic comparison work per cluster — the paper's whole point:
    * all-pairs over the corpus is O(N²), all-pairs within k clusters is
    * O(N²/k) and embarrassingly parallel per cluster.
    *
    * The paper clusters with k-means; here assignment is nearest-SEED —
    * one cosine pass against ~`max(8, ceil(sqrt(N)))` deterministic
    * seed vectors — so the WHOLE pipeline, clustering included, replays
    * exactly in the DuckDB oracle (a k-means fit would make assignments
    * goldens; a seed rule makes them derivable — ann3 vs ann5 all over
    * again). Seeds are chosen by a Knuth-multiplicative-hash threshold
    * on the id (`hash(id) < k·2^32 div N`), NOT by id rank: the rule
    * holds on any id distribution (sparse, offset, filtered upstream),
    * costs a pure filter (no global sort), and the min-id vector is
    * always included so the seed set is never empty. Seed count ∝ √N
    * balances the two stages — assignment is O(N·√N) cosines against a
    * √N-row broadcast (linear broadcast growth per 10× corpus growth),
    * and expected cluster size √N makes the within-cluster pair stage
    * O(N^1.5) total, sharded across clusters by the cluster-key join.
    * The earlier N/16 seed rule kept clusters constant-size but made
    * assignment itself O(N²/16) with an unbounded broadcast — the
    * quadratic just moved one stage earlier.
    *
    * Determinism: similarities round to 6dp (assignment) / 4dp (dedup
    * threshold, the cn1/cn2 convention) before any compare; assignment
    * ties break to the smaller seed id via the max(struct) tuple — no
    * window sort, one map-side-combined aggregate.
    */
  private def semanticAssign(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    graft.functions.NativeExpressions.register(emb.sparkSession)
    val k1 = emb.agg(
      count(lit(1)).as("n"),
      greatest(lit(8L), ceil(sqrt(count(lit(1)))).cast("long")).as("k"),
      min(col(idCol)).cast("long").as("min_id"))
      // threshold widened through DECIMAL(38,0): k·2^32 overflows int64
      // only at astronomically large k, but the widening is free
      .select(col("min_id"),
        expr("CAST((CAST(k AS DECIMAL(38,0)) * 4294967296) div n AS BIGINT)").as("thr"))
    val seeds = emb.crossJoin(broadcast(k1))
      .filter(expr(s"pmod(pmod($idCol, 2147483648) * 2654435761, 4294967296)").cast("long") < col("thr")
        || col(idCol) === col("min_id"))
      .select(col(idCol).as("seed_id"), col(vecCol).as("seed_vec"))
    emb.select(col(idCol).as("vid"), col(vecCol).as("vec"))
      .crossJoin(broadcast(seeds))
      .select(col("vid"), col("seed_id"),
        round(expr("graft_cosine(vec, seed_vec)"), 6).as("sim"))
      .groupBy("vid")
      .agg(max(struct(col("sim"), (-col("seed_id")).as("ns"))).as("m"))
      .select(col("vid"), (-col("m.ns")).as("cluster"))
  }

  /** Johnson-Lindenstrauss sign random projection (Achlioptas 2001:
    * ±1 entries suffice for the JL guarantee): project d-dim embeddings
    * down to `outDims` using a PSEUDORANDOM sign matrix derived from
    * md5 parity — R(i,j) = +1 iff the first hex nibble of md5("i_j")
    * is even. No RNG state, no seed table to ship: the matrix is a pure
    * expression both engines evaluate identically, so the projection —
    * the standard pre-reduction before LSH/clustering at high d —
    * replays exactly under the oracle. Components cast to
    * DECIMAL(18,8) (labelCentroids' exactness contract) and sum
    * exactly; the final cell is the exact decimal cast to double with
    * NO rounding (the dsum convention — identical decimals convert to
    * identical doubles, while round-after-cast splits half-way values
    * across engines). Flat (id, proj_dim, value) form.
    *
    * Shape: the sign matrix has only outDims·d distinct entries, so it
    * is PRECOMPUTED once as a tiny broadcast table (one md5 per cell)
    * and the corpus joins it on j — the naive form evaluated the md5
    * per (row, i, j) instance, N·outDims·d hashes for a 512-entry
    * matrix. Then posexplode + one map-side-combined hash aggregate:
    * O(N·d·outDims) multiply-adds, shuffle O(N·outDims), zero
    * per-row hashing.
    */
  def signRandomProjection(
      df: DataFrame, idCol: String, vecCol: String, outDims: Int): DataFrame = {
    require(outDims >= 1, "need at least one output dimension")
    val spark = df.sparkSession
    val comps = df.select(col(idCol), posexplode(col(vecCol)).as(Seq("j0", "x")))
      .select(col(idCol), (col("j0") + 1).as("j"),
        col("x").cast(org.apache.spark.sql.types.DecimalType(18, 8)).as("xd"))
    // bounded 1-row collect: the widest vector fixes the sign table's j
    // range (ragged inputs just never probe the tail rows)
    val maxD = Option(df.agg(max(size(col(vecCol)))).head().get(0))
      .map(_.asInstanceOf[Int]).getOrElse(0)
    if (maxD == 0)
      return comps.select(col(idCol), col("j").cast("long").as("proj_dim"),
        lit(null).cast("double").as("value")).limit(0)
    val signs = spark.range(1, outDims.toLong + 1).select(col("id").as("i"))
      .crossJoin(spark.range(1, maxD.toLong + 1).select(col("id").cast("int").as("j")))
      .select(col("i"), col("j"),
        when(substring(md5(concat_ws("_", col("i"), col("j"))), 1, 1)
          .isin("0", "2", "4", "6", "8", "a", "c", "e"), lit(1))
          .otherwise(lit(-1)).as("sgn"))
    comps.join(broadcast(signs), Seq("j"))
      // branch on the precomputed sign instead of multiplying so the
      // term keeps the exact DECIMAL(18,8) type (and therefore the sum
      // type and final double) of the original formulation
      .select(col(idCol), col("i"),
        when(col("sgn") === 1, col("xd")).otherwise(-col("xd")).as("term"))
      .groupBy(col(idCol), col("i"))
      .agg(sum(col("term")).as("s"))
      .select(col(idCol), col("i").as("proj_dim"),
        col("s").cast("double").as("value"))
  }

  /** (cluster, id, vec) — the corpus with its cluster assignment joined
    * back on. */
  private def semanticClustered(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.join(semanticAssign(emb, idCol, vecCol), col(idCol) === col("vid"))
      .select(col("cluster"), col(idCol).as("id"), col(vecCol).as("vec"))

  /** Within-cluster duplicate pairs over a [[semanticClustered]] frame:
    * (cluster, id_a, id_b) with id_a < id_b and round(cos, 4) ≥
    * `minCosine`. The cluster-key self-join IS the bounded pair
    * enumeration. */
  private def semanticDupPairs(cl: DataFrame, minCosine: Double): DataFrame = {
    val a = cl.select(col("cluster"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = cl.select(col("cluster"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(expr("graft_cosine(vec_a, vec_b)"), 4) >= minCosine)
      .select("cluster", "id_a", "id_b")
  }

  /** The dedup decision per corpus vector: survivors = everything not
    * marked duplicate-of-a-smaller-id within its cluster. This is the
    * frame a pipeline consumes. */
  def semanticDedupSurvivors(
      emb: DataFrame, idCol: String, vecCol: String, minCosine: Double): DataFrame = {
    val removed = semanticDupPairs(semanticClustered(emb, idCol, vecCol), minCosine)
      .select(col("id_b").as("__rm")).distinct()
    emb.join(removed, col(idCol) === col("__rm"), "left_anti")
  }

  /** Per-cluster audit summary — the oracle-checkable face: cluster id,
    * member count, duplicate-pair count, vectors removed, and the
    * smallest removed id (NULL for clean clusters). Integer-exact
    * throughout; the two branches share the clustered subplan, so the
    * assignment exchange is planned once and reused. */
  def semanticDedupSummary(
      emb: DataFrame, idCol: String, vecCol: String, minCosine: Double): DataFrame = {
    val cl = semanticClustered(emb, idCol, vecCol)
    val sizes = cl.groupBy("cluster").agg(count(lit(1)).cast("long").as("n_vectors"))
    val rem = semanticDupPairs(cl, minCosine)
      .groupBy("cluster")
      .agg(count(lit(1)).cast("long").as("n_dup_pairs"),
        countDistinct(col("id_b")).cast("long").as("n_removed"),
        min(col("id_b")).as("min_removed"))
    sizes.join(rem, Seq("cluster"), "left")
      .select(col("cluster"), col("n_vectors"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        col("min_removed"))
  }

  /** Top principal direction of the embedding GRAM matrix by exact
    * integer fixed-point POWER ITERATION — the PCA-lite primitive under
    * dominant-direction removal ("all-but-the-top", Mu & Viswanath
    * 2018) and embedding-drift monitoring. Two pieces, both replayable:
    *
    * 1. Gram: components quantize half-up to the 10⁶ lattice (km1's
    *    cross-engine contract), then G(i,j) = Σ_v q_i·q_j — ONE
    *    map-side-combined aggregate whose exchange is d² cells
    *    (4096 rows) however large the corpus: the classic
    *    outer-product-accumulate shape that makes covariance/Gram
    *    computation embarrassingly scalable.
    * 2. Power iteration on the tiny matrix: x ← G·x, max-|·|
    *    normalized back to the 10¹² scale each round (the HITS
    *    pattern, EXTENDED TO SIGNED values: G is PSD but eigenvector
    *    entries go negative, and DuckDB's `//` floors where Spark's
    *    `div` truncates toward zero — so the oracle replays the
    *    division as sign·(|s| // mxp), which IS toward-zero, and both
    *    engines agree on every negative intermediate).
    *
    * Fixed `rounds` keeps it oracle-replayable; from an all-positive
    * start on a PSD matrix the iterate aligns with the dominant
    * eigenvector (up to the fixed-point lattice). Magnitude audit:
    * |G| ≤ N·(5·10⁶)² and |s| ≤ 64·|G|·10¹² stay far inside
    * DECIMAL(38,0)/HUGEINT for any corpus under ~10⁶⁰ rows... i.e.
    * always. Returns (dim_id, component_scaled) — d rows. */
  def gramTopComponent(emb: DataFrame, idCol: String, vecCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "gramTopComponent needs at least one round")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val flat = emb.select(col(idCol).as("v"), posexplode(
        transform(col(vecCol), x => round(x.cast("double") * 1e6).cast("long"))))
      .select(col("v"), (col("pos") + 1).cast("long").as("i"), col("col").as("q"))
    val gram = flat
      .join(flat.select(col("v"), col("i").as("j"), col("q").as("q2")), Seq("v"))
      .groupBy("i", "j")
      .agg(sum((col("q") * col("q2")).cast(dec)).as("g"))
      .localCheckpoint()
    var x = gram.select(col("j")).distinct()
      .select(col("j"), lit(1000000000000L).cast(dec).as("xv"))
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val s = gram.join(x, Seq("j")).groupBy("i")
        .agg(sum((col("g") * col("xv")).cast(dec)).as("s"))
      val mx = s.agg(max(greatest(col("s"), -col("s"))).as("mx"))
      x = s.crossJoin(broadcast(mx))
        .select(col("i").as("j"),
          expr("CAST(s div (mx div CAST(1000000000000 AS DECIMAL(38,0))) AS DECIMAL(38,0))")
            .as("xv"))
        .localCheckpoint()
    }
    x.select(col("j").as("dim_id"), col("xv").cast("long").as("component_scaled"))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein, SIGIR
    * 1998) — greedy diversified re-ranking: from an exact top-`candidates`
    * relevance pool, repeatedly pick
    * `argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`, so each pick is
    * relevant to the query but NOT redundant with what's already chosen
    * (the retrieval-side complement of k-center exemplar selection —
    * k-center diversifies a corpus, MMR diversifies an answer).
    *
    * Exact integer replay: relevance and pairwise similarity are the
    * 4dp-rounded cosine in basis points (the ann1 contract), λ = 0.7
    * enters as `7·rel_bp − 3·maxsim_bp` (×10 both terms — argmax
    * invariant), ties break by smallest id, and round 1 is the pure
    * relevance argmax (= rank 1 of the pool). Every round is one small
    * join + max-aggregate + 1-row-per-query argmin-of-struct on a
    * candidates-sized frame — k bounded rounds over queries×candidates
    * rows, metadata-sized next to the corpus scan that built the pool.
    *
    * Returns (q_id, vec_id, sel_rank, mmr_bp), `k` rows per query. */
  def mmrSelect(
      queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      candidates: Int, k: Int, lambda10: Int = 7): DataFrame = {
    require(k >= 1 && candidates >= k, "mmrSelect needs candidates >= k >= 1")
    require(lambda10 >= 0 && lambda10 <= 10, "lambda10 is tenths in [0, 10]")
    val cand = bruteForceTopK(queries, qIdCol, qVecCol,
        corpus, idCol, vecCol, candidates)
      .select(col("q_id"), col("vec_id"), col("rank"),
        round(col("score") * 10000).cast("long").as("rel_bp"))
      .localCheckpoint()
    val vecs = cand.join(
        corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")), Seq("vec_id"))
      .select(col("q_id"), col("vec_id"), col("v"))
    val sims = vecs.join(
        vecs.select(col("q_id"), col("vec_id").as("other_id"), col("v").as("v2")),
        Seq("q_id"))
      .filter(col("vec_id") =!= col("other_id"))
      .select(col("q_id"), col("vec_id"), col("other_id"),
        round(cosine(col("v"), col("v2")) * 10000).cast("long").as("sim_bp"))
      .localCheckpoint()
    // round 1 = the relevance argmax, which rank 1 already tie-breaks
    var sel = cand.filter(col("rank") === 1)
      .select(col("q_id"), col("vec_id"), lit(1).as("sel_rank"),
        (lit(lambda10) * col("rel_bp")).as("mmr_bp"))
      .localCheckpoint()
    (2 to k).foreach { r =>
      val remaining = cand
        .join(sel.select("q_id", "vec_id"), Seq("q_id", "vec_id"), "left_anti")
      val maxsim = sims
        .join(sel.select(col("q_id"), col("vec_id").as("other_id")),
          Seq("q_id", "other_id"))
        .groupBy("q_id", "vec_id").agg(max(col("sim_bp")).as("maxsim_bp"))
      val pick = remaining.join(maxsim, Seq("q_id", "vec_id"))
        .select(col("q_id"), col("vec_id"),
          (lit(lambda10) * col("rel_bp") -
            lit(10 - lambda10) * col("maxsim_bp")).as("mmr_bp"))
        .groupBy("q_id")
        .agg(min(struct((-col("mmr_bp")).as("neg"), col("vec_id").as("id"))).as("m"))
        .select(col("q_id"), col("m.id").as("vec_id"),
          lit(r).as("sel_rank"), (-col("m.neg")).as("mmr_bp"))
      sel = sel.unionByName(pick).localCheckpoint()
    }
    sel
  }
}
