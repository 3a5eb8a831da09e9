package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-engine text classification: multinomial Naive Bayes trained and
  * applied as plain relational operators (the classic bag-of-words
  * formulation — McCallum & Nigam 1998). No iterations, no driver-side
  * model state: the "model" is two aggregate tables (class priors and
  * per-class token counts) that join back onto the corpus for scoring —
  * which is what makes the whole train+predict pipeline exactly
  * replayable by the DuckDB oracle, and what a 100 TB deployment wants
  * anyway (the model tables are small and broadcast; scoring is one
  * explode + two joins + one argmax, all map-side-combinable).
  *
  * Determinism: every per-token log term is an ln of an exactly-rounded
  * integer ratio, rounded to 6 decimals and summed in DECIMAL (the
  * ExactSums pattern), so per-(doc, class) scores are exact and
  * order-independent; argmax ties break on the class name.
  */
object ClassifyOps {

  private val ScoreType = DecimalType(28, 6)

  /** Train on `docs` (label column + text column) and predict the label
    * of every document with add-one smoothing:
    *
    *   score(d, c) = ln P(c) + Σ_{tokens t of d} ln (count(t, c) + 1) / (n_c + V)
    *
    * where n_c is class c's total token count and V the corpus
    * vocabulary size. Returns one row per document:
    * (idCol, labelCol, predicted, score) — self-train/self-test on the
    * same frame (the engine-surface demonstration; callers split with
    * [[SampleOps.hashSplit]] for honest evaluation).
    */
  def naiveBayesPredict(
      docs: DataFrame,
      idCol: String,
      labelCol: String,
      textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val docToks = docs.select(col(idCol), col(labelCol), explode(toks).as("tok"))
    // model tables (all integer counts — the exactness anchor)
    val classes = docs.groupBy(col(labelCol).as("cls")).agg(count(lit(1)).as("n_docs"))
    val nTotal = docs.agg(count(lit(1)).as("n_total"))
    val tokCls = docToks.groupBy(col("tok"), col(labelCol).as("cls"))
      .agg(count(lit(1)).as("c"))
    val clsTotals = docToks.groupBy(col(labelCol).as("cls")).agg(count(lit(1)).as("n_c"))
    val vocab = docToks.agg(countDistinct(col("tok")).as("v"))
    // per-(doc, class) token terms: every doc token scores against EVERY
    // class (absent (tok, class) counts are zero under smoothing)
    val pairs = docToks.crossJoin(broadcast(classes.select(col("cls"))))
      .join(tokCls, Seq("tok", "cls"), "left")
      .join(clsTotals, Seq("cls"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col(labelCol), col("cls"),
        round(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("n_c") + col("v")).cast("double")), 6).cast(ScoreType).as("term"))
    val priors = classes.crossJoin(broadcast(nTotal))
      .select(col("cls"),
        round(log(col("n_docs").cast("double") / col("n_total").cast("double")), 6)
          .cast(ScoreType).as("prior"))
    val scored = pairs.groupBy(col(idCol), col(labelCol), col("cls"))
      .agg(sum(col("term")).cast(ScoreType).as("token_score"))
      .join(priors, Seq("cls"))
      .select(col(idCol), col(labelCol), col("cls"),
        (col("token_score") + col("prior")).cast(ScoreType).as("score"))
    // argmax per doc over a HANDFUL of classes: a doc-partitioned
    // window (score desc, class-name tie-break) — the partition is
    // |classes| rows, so this is a cheap local sort, not a global one
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("cls"))
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(labelCol), col("cls").as("predicted"),
        col("score").cast("double").as("score"))
  }

  /** The confusion matrix of [[naiveBayesPredict]] — the compact,
    * hash-checkable face of the classifier: (label, predicted, n_docs). */
  def naiveBayesConfusion(
      docs: DataFrame,
      idCol: String,
      labelCol: String,
      textCol: String): DataFrame =
    naiveBayesPredict(docs, idCol, labelCol, textCol)
      .groupBy(col(labelCol), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))

  /** Nearest-class-mean (prototype) classification over embeddings —
    * the Rocchio / nearest-centroid classifier: class prototypes from
    * [[SimilarityOps.labelCentroids]] (decimal-exact means), every
    * vector assigned to the prototype with the smallest squared L2
    * distance. Distance accumulates per (vector, class) as
    * round((x_d − c_d)², 8) DECIMAL terms — exact, order-independent,
    * oracle-replayable; argmin ties break on the class name. Shape:
    * the flat centroid table is O(classes × dims) and broadcasts; the
    * vector side is one posexplode + one hash aggregate per
    * (vector, class) + a |classes|-row argmin window per vector.
    * Returns the confusion matrix (labelCol, predicted, n_vectors).
    */
  def centroidConfusion(
      vectors: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String): DataFrame = {
    val cents = SimilarityOps.labelCentroids(vectors, labelCol, vecCol)
      .select(col(labelCol).as("cls"), col("pos"), col("centroid"))
    val comps = vectors
      .select(col(idCol), col(labelCol), posexplode(col(vecCol)).as(Seq("pos0", "x")))
      .select(col(idCol), col(labelCol), (col("pos0") + 1).as("pos"),
        col("x").cast("double").as("x"))
    val dist = comps.join(broadcast(cents), Seq("pos"))
      .select(col(idCol), col(labelCol), col("cls"),
        round((col("x") - col("centroid")) * (col("x") - col("centroid")), 8)
          .cast(DecimalType(28, 8)).as("term"))
      .groupBy(col(idCol), col(labelCol), col("cls"))
      .agg(sum(col("term")).cast(DecimalType(28, 8)).as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("d2"), col("cls"))
    dist.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col(labelCol), col("cls").as("predicted"))
      .agg(count(lit(1)).as("n_vectors"))
  }

  /** TRAINED quality classifier — a depth-2 decision tree (the CART
    * shape, Breiman et al. 1984) over hashed bag-of-words COUNT
    * features, split by exact misclassification count: the
    * weak-supervision bootstrap a pretraining pipeline runs (label a
    * corpus slice with a cheap heuristic, train a model that
    * generalizes it through feature collisions). cls1/cls2 are
    * closed-form count models; this one performs a greedy TRAINING
    * SEARCH — and the entire trainer contains ZERO floating-point
    * operations: candidate splits are ranked by an integer error count
    * with (err, bucket, threshold) lexicographic tie-break, so every
    * level replays bit-for-bit in the DuckDB oracle. (Gradient-descent
    * trainers were prototyped and rejected here: full-batch logistic
    * descent needs dozens of rounds at stability-bounded step sizes —
    * far past an oracle-replayable round budget — while greedy split
    * search converges by construction.)
    *
    *   features: token count per md5-nibble bucket (4096 buckets, the
    *     DSIR hashing — collisions are part of the model);
    *   candidates: (bucket b, threshold θ) → doc goes LEFT iff
    *     cnt(doc, b) ≥ θ;
    *   split score: min(pL,nL) + min(pR,nR) — leaves vote majority,
    *     ties predict −1.
    *
    * Train on the Knuth-hash `trainPct` split, confusion matrix on the
    * holdout (txt19's honest-evaluation split): (y_true, y_pred,
    * n_docs) with y ∈ {+1, −1} from `labelExpr`.
    *
    * Scale shape: one feature-build aggregate over the corpus; each of
    * the 3 split searches is ONE map-side-combined hash aggregate over
    * (bucket, θ) — ≤ 4096·|θ| groups in the exchange regardless of
    * corpus size — plus a 1-row argmin. The chosen splits come to the
    * driver as THREE bounded 1-row collects (the per-round limit(1)
    * BPE-training precedent), so membership tests are literal
    * predicates, not joins. The feature frame persists once, released
    * before returning.
    */
  def depth2TreeConfusion(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelExpr: Column,
      thresholds: Seq[Int] = Seq(1, 2),
      trainPct: Int = 80): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(_ >= 1), "thresholds must be >= 1")
    require(trainPct > 0 && trainPct < 100, "trainPct must split both ways")
    val feats = docs.select(col(idCol).as("did"),
        when(labelExpr, 1L).otherwise(-1L).as("y"),
        (pmod(SampleOps.knuth32(col(idCol)), lit(100L)) < trainPct).as("tr"),
        explode(split(col(textCol), " ")).as("w"))
      .withColumn("b", conv(substring(md5(col("w")), 1, 3), 16, 10).cast("long"))
      .groupBy("did", "y", "tr", "b").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val train = feats.filter(col("tr"))
    val thetas = thresholds.map(th => struct(lit(th.toLong).as("th")))

    /** Best (b, θ) over `f` docs (flagged rows only): one aggregate to
      * (b, θ) candidate counts, one 1-row argmin. `p`/`n` are the doc
      * totals of the subset. Returns (b, th, pL, nL). */
    def bestSplit(f: DataFrame, p: Long, n: Long): Option[(Long, Long, Long, Long)] = {
      val cand = f.select(col("y"), col("cnt"), explode(array(thetas: _*)).as("t"), col("b"))
        .select(col("b"), col("t.th").as("th"),
          when(col("y") === 1 && col("cnt") >= col("th"), 1L).otherwise(0L).as("isP"),
          when(col("y") === -1 && col("cnt") >= col("th"), 1L).otherwise(0L).as("isN"))
        .groupBy("b", "th")
        .agg(sum("isP").as("pL"), sum("isN").as("nL"))
        .select(col("b"), col("th"), col("pL"), col("nL"),
          (least(col("pL"), col("nL")) +
            least(lit(p) - col("pL"), lit(n) - col("nL"))).as("err"))
      val row = cand.agg(min(struct(col("err"), col("b"), col("th"), col("pL"), col("nL"))).as("m"))
        .select("m.b", "m.th", "m.pL", "m.nL").head()
      if (row.isNullAt(0)) None
      else Some((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)))
    }

    def totals(d: DataFrame): (Long, Long) = {
      val r = d.agg(
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("p"),
        sum(when(col("y") === -1, 1L).otherwise(0L)).as("n")).head()
      (if (r.isNullAt(0)) 0L else r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val trainDocs = train.select("did", "y").distinct()
    val (p0, n0) = totals(trainDocs)
    val root = bestSplit(train, p0, n0)
      .getOrElse(throw new IllegalArgumentException("no training features — empty corpus or split"))
    val (b0, th0, _, _) = root
    // side membership as ONE aggregate over the persisted features —
    // the chosen split is a literal predicate, no join
    val sides = train.groupBy("did", "y")
      .agg(max(when(col("b") === b0 && col("cnt") >= th0, 1L).otherwise(0L)).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-side second-level split + leaf votes (majority, ties vote -1);
    // an empty or unsplittable side votes -1 at both leaves
    val children: Map[Long, Child] = Seq(1L, 0L).map { s =>
      val sub = train.join(sides.filter(col("s") === s).select("did"), Seq("did"))
      val (p, n) = totals(sides.filter(col("s") === s).select("did", "y"))
      s -> (bestSplit(sub, p, n) match {
        case Some((b1, th1, pL, nL)) =>
          Child(Some((b1, th1)),
            voteYes = if (pL > nL) 1L else -1L,
            voteNo = if ((p - pL) > (n - nL)) 1L else -1L)
        case None => Child(None, -1L, -1L)
      })
    }.toMap
    sides.unpersist(blocking = false)
    // predict the holdout: all three splits are literal predicates, so
    // routing + voting is one aggregate + one projection
    def s2Agg(c: Child): Column = c.split match {
      case Some((b1, th1)) =>
        max(when(col("b") === b1 && col("cnt") >= th1, 1L).otherwise(0L))
      case None => max(lit(0L))
    }
    def leaf(c: Child, s2: Column): Column =
      when(s2 === 1, lit(c.voteYes)).otherwise(lit(c.voteNo))
    val out = feats.filter(!col("tr"))
      .groupBy("did", "y")
      .agg(
        max(when(col("b") === b0 && col("cnt") >= th0, 1L).otherwise(0L)).as("s"),
        s2Agg(children(1L)).as("s2l"), s2Agg(children(0L)).as("s2r"))
      .select(col("y").as("y_true"),
        when(col("s") === 1, leaf(children(1L), col("s2l")))
          .otherwise(leaf(children(0L), col("s2r"))).as("y_pred"))
      .groupBy("y_true", "y_pred")
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint()
    feats.unpersist(blocking = false)
    out
  }

  /** One fitted child of the depth-2 tree: its optional second-level
    * split and the two leaf votes. */
  private final case class Child(split: Option[(Long, Long)], voteYes: Long, voteNo: Long)
}
