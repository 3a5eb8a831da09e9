package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines:
  * reproducible train/holdout splits and per-group corpus caps.
  *
  * Both are built on a Knuth multiplicative hash of the id column rather
  * than `rand()`: the assignment is then a pure projection — stable
  * across runs, executors, retries, and engines (the DuckDB oracle can
  * replay the exact same arithmetic), and it needs no seed plumbed
  * through checkpoint/retry machinery. `rand()` in a distributed job is
  * only deterministic per-partition-id, which silently breaks the split
  * whenever the scan's partitioning changes.
  */
object SampleOps {

  /** 32-bit Knuth multiplicative hash of an id, in plain BIGINT
    * arithmetic both Spark and ANSI SQL reproduce exactly:
    * `((id mod 2^31) * 2654435761) mod 2^32`. The pre-reduction keeps
    * the product under 2^63 (no ANSI overflow); 2654435761 is the
    * golden-ratio multiplier. Ids are assumed non-negative.
    */
  def knuth32(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** Deterministic train/holdout split: rows whose hash bucket (0-99)
    * falls below `trainPct` land in "train", the rest in "holdout".
    * A pure narrow projection — no shuffle, no state, trivially
    * re-runnable on any subset of a 100 TB corpus with consistent
    * assignment.
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame = {
    require(trainPct > 0 && trainPct < 100, s"trainPct must be in (0,100), got $trainPct")
    df.withColumn("split",
      when(pmod(knuth32(col(idCol)), lit(100L)) < trainPct, "train").otherwise("holdout"))
  }

  /** Deterministic per-group downsample: keep the `n` rows with the
    * smallest id-hash per group (hash asc, id asc on ties) — e.g. cap
    * documents per source/domain to balance a corpus.
    *
    * Ranking uses the `graft_topk` bounded-heap aggregate (fed the
    * NEGATED hash, since the heap keeps largest values): each map task
    * ships at most n ids per group into the shuffle, where the usual
    * `row_number()` window would shuffle and sort EVERY row of every
    * group. The kept-id set is then semi-joined back — ids only, so the
    * second exchange never carries the document payload.
    */
  def perGroupCap(df: DataFrame, groupCols: Seq[String], idCol: String, n: Int): DataFrame = {
    require(groupCols.nonEmpty, "perGroupCap needs at least one group column")
    graft.functions.NativeExpressions.register(df.sparkSession)
    val kept = df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_topk",
        negate(knuth32(col(idCol)).cast("double")), col(idCol), lit(n)).as("top"))
      .select(explode(col("top.payload")).as(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** Bounded positional-prefix sample — THE sampling contract every
    * trained-quantizer fit uses (SimilarityOps.ivfQuantize,
    * QuantizeOps.pqFit): the first `4·ceil(target/32)` records of each of
    * the first 32 scan partitions (spark_partition_id + the per-partition
    * record number packed into monotonically_increasing_id's low 33
    * bits). Zero extra jobs (a count()-then-fraction sample costs a full
    * corpus pass first), O(1)-bounded however large the corpus, and
    * positionally deterministic for a fixed file layout.
    *
    * Centralized so the fit paths and the golden-drift tripwire spec
    * (QuantizeOpsSpec) stake the SAME predicate: per-SF recall goldens
    * (sq3/ann5/ann6/ann7) are keyed to the file-order sample this
    * returns, and a testdata layout change MUST trip the fingerprint
    * check rather than silently shift the goldens.
    */
  def positionalPrefixSample(df: DataFrame, sampleTarget: Long): DataFrame = {
    val sampleParts = 32L
    // 4× headroom so inputs with fewer live partitions than sampleParts
    // still reach the target; worst case the fit sees 4× target rows —
    // still O(sample), trivially small
    val perPartition = 4L * ((sampleTarget + sampleParts - 1) / sampleParts)
    df.filter(spark_partition_id() < sampleParts &&
      monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)) < perPartition)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed n-gram features are, then
    * resample the raw corpus by weight. The feature model is the paper's
    * bag of hashed unigrams: token → bucket via the first 3 md5 nibbles
    * (4096 buckets — md5 so the DuckDB oracle replays the exact bucket),
    * per-bucket probabilities under add-one smoothing on the target and
    * raw corpora, and
    *
    *   log w(x) = Σ_tokens [ ln p_T(bucket) − ln p_R(bucket) ]
    *
    * Per-bucket terms are rounded to 6 decimals and summed in
    * DECIMAL(18,6) (the ExactSums pattern) so the per-doc reduce is
    * exact and order-independent. Returns (idCol, n_feats, logw) for
    * every raw doc with ≥ 1 token; the caller ranks/thresholds (the
    * paper adds Gumbel noise; the deterministic engine surface is
    * top-k by weight).
    *
    * Scale shape: the bucket-count model is at most 4096 rows per corpus
    * (two map-side-combined aggregates + two 1-row totals, all
    * broadcast); scoring joins each token row to the broadcast term
    * table and hash-aggregates per doc — one shuffle by doc id, nothing
    * collects, model size is O(buckets) regardless of corpus size.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String, textCol: String): DataFrame = {
    val buckets = 4096L
    def feats(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(split(col(textCol), " ")).as("w"): _*)
        .withColumn("b", conv(substring(md5(col("w")), 1, 3), 16, 10).cast("long"))
    val rawF = feats(raw, col(idCol))
    val tgtF = feats(target)
    val cR = rawF.groupBy("b").agg(count(lit(1)).as("cr"))
    val cT = tgtF.groupBy("b").agg(count(lit(1)).as("ct"))
    val nR = rawF.agg(count(lit(1)).as("nr"))
    val nT = tgtF.agg(count(lit(1)).as("nt"))
    // buckets present in raw but absent from target score with ct = 0;
    // target-only buckets are unreachable by raw tokens and drop out
    val term = cR.join(cT, Seq("b"), "left")
      .crossJoin(broadcast(nR)).crossJoin(broadcast(nT))
      .select(col("b"),
        round(
          log((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("nt") + buckets)) -
          log((col("cr") + 1).cast("double") / (col("nr") + buckets)), 6).as("term"))
    rawF.join(term, Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("term").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("logw"))
  }
}
