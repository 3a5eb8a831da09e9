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
}
