package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting.
  *
  * All operators are pure column expressions built from codegen'd Spark
  * built-ins (no UDFs) — they stay inside WholeStageCodegen and scale as a
  * single narrow projection pass over the corpus: no shuffle, no
  * driver-side work, trivially parallel over 100 TB of documents.
  */
object TextOps {

  /** Whitespace tokenization (documents.text is space-separated lowercase). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Small function-word marker sets for the language-ID heuristic. A real
    * deployment would use character-n-gram profiles; the *shape* (argmax of
    * per-language evidence, computed as one projection) is identical.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est")
  )

  /** n-gram-heuristic language ID: argmax of marker-set hits with
    * deterministic precedence order on ties; 'und' (undetermined) when no
    * marker hits at all (ISO 639-3 convention).
    */
  def languageId(text: Column): Column = {
    val hits: Seq[(String, Column)] = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(tokens(text), t => markers.foldLeft(lit(false))((acc, m) => acc || (t === m))))
    }
    val maxHits = greatest(hits.map(_._2): _*)
    val firstMax = hits.foldRight(lit("und")) { case ((lang, h), elseCol) =>
      when(h === maxHits, lit(lang)).otherwise(elseCol)
    }
    when(maxHits === 0, lit("und")).otherwise(firstMax)
  }

  /** Quality features per document: char/token counts, mean token length,
    * stopword ratio, uppercase/punct ratios (0 on this corpus, kept for
    * generality). One projection, no shuffle.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def withQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nToks = size(toks)
    val stopHits = size(filter(toks, tk => Stopwords.foldLeft(lit(false))((acc, m) => acc || (tk === m))))
    df.withColumn("n_chars_computed", length(t))
      .withColumn("n_tokens", nToks)
      .withColumn("mean_token_len",
        round(length(regexp_replace(t, " ", "")).cast("double") / nToks, 4))
      .withColumn("stopword_ratio", round(stopHits.cast("double") / nToks, 4))
  }

  /** PII redaction as a pure codegen'd projection: emails → `<EMAIL>`,
    * then runs of 4+ digits (ids, phones, SSNs) → `<NUM>`. Email first,
    * so digits inside an address are consumed by the email mask. The
    * patterns use only constructs with identical semantics in Java
    * regex and RE2 (character classes, bounded repetition), so the op is
    * reproducible under the DuckDB oracle (`regexp_replace(..., 'g')`).
    * A production scrubber adds more patterns; the shape — stacked
    * regexp_replace, one narrow pass, no UDF — is the 100 TB design.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\d{4,}", "<NUM>")

  /** Exact content fingerprint (dedup key): md5 over the raw bytes. */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Rolling polynomial fingerprint (Rabin-Karp style) over characters —
    * a locality-insensitive 63-bit hash computed with the `aggregate`
    * higher-order function (left fold, codegen'd, no UDF).
    * hash = sum(c_i * 31^i) mod 1e9+7 evaluated as Horner's rule. The
    * modulus keeps the accumulator < 2^30 so `acc * 31 + c` never
    * overflows a long.
    */
  def rollingFingerprint(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31L + ascii(ch).cast("long"), p)
    )
  }

  /** Duplicate word-n-gram fraction within a document (the C4/Gopher-style
    * repetition filter): 1 − distinct/total n-grams. High values mark
    * boilerplate and degenerate repetition. One narrow projection — total
    * n-grams is arithmetic on the token count, distinct reuses
    * [[DedupOps.shingles]] (already array_distinct'ed). NULL for docs
    * shorter than n tokens (no n-grams to judge).
    */
  def repetitionRatio(text: Column, n: Int): Column = {
    val total = size(tokens(text)) - (n - 1)
    when(total >= 1,
      round(lit(1.0) - size(DedupOps.shingles(text, n)).cast("double") / total.cast("double"), 4))
      .otherwise(lit(null).cast("double"))
  }

  /** Per-document character-distribution Shannon entropy (nats) — a cheap
    * perplexity proxy: near-zero entropy marks degenerate repetition,
    * unusually high marks binary/garbled payloads. Computed entirely
    * inside one projection with higher-order functions (per-doc char
    * histogram via distinct-chars × count scan, O(len·alphabet) per doc,
    * alphabet ≤ ~100): no explode, no shuffle — at 100 TB this runs as a
    * map-only pass over the corpus.
    */
  def charEntropy(text: Column): Column = {
    val chars = split(text, "")
    val len = size(chars).cast("double")
    val counts = transform(array_distinct(chars),
      c => size(filter(chars, x => x === c)).cast("double"))
    when(length(text) >= 1,
      round(-aggregate(counts, lit(0.0), (acc, k) => acc + (k / len) * log(k / len)), 4))
      .otherwise(lit(null).cast("double"))
  }

  /** [[charEntropy]] through the native codegen'd kernel
    * (graft_char_entropy — bit-parity spec'd against the HOF above, which
    * stays as the executable specification). The HOF's interpreted
    * lambdas cost O(len·alphabet) calls per row and are never
    * whole-stage-codegen'd; the kernel is one byte scan inside the
    * generated code. Callers must have run NativeExpressions.register.
    */
  def charEntropyNative(textCol: String): Column =
    when(length(col(textCol)) >= 1,
      round(expr(s"graft_char_entropy(`$textCol`)"), 4))
      .otherwise(lit(null).cast("double"))

  /** [[repetitionRatio]] with the distinct-n-gram count from the native
    * kernel (graft_distinct_ngrams — exact string-distinct, same value as
    * size(DedupOps.shingles)). Same NULL-below-n-tokens contract. */
  def repetitionRatioNative(textCol: String, n: Int): Column = {
    val total = size(tokens(col(textCol))) - (n - 1)
    when(total >= 1,
      round(lit(1.0) -
        expr(s"graft_distinct_ngrams(`$textCol`, $n)").cast("double") / total.cast("double"), 4))
      .otherwise(lit(null).cast("double"))
  }

  /** The composed Gopher/C4-style quality GATE: length + stopword +
    * repetition + entropy thresholds in ONE narrow projection+filter pass
    * over the native kernels — no shuffle, no UDF, so it runs unchanged
    * over a batch corpus (pipe2) or inside a Structured Streaming ingest
    * (CorpusIngestSpec). Callers must have run NativeExpressions.register.
    */
  def qualityGate(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nToks = size(toks)
    val stopHits = size(filter(toks,
      tk => Stopwords.foldLeft(lit(false))((acc, m) => acc || (tk === m))))
    df.select(
        col(idCol),
        nToks.cast("long").as("n_tokens"),
        round(stopHits.cast("double") / nToks, 4).as("stopword_ratio"),
        repetitionRatioNative(textCol, 3).as("dup3_frac"),
        charEntropyNative(textCol).as("char_entropy"))
      .filter(gatePredicate(col("n_tokens"), col("stopword_ratio"),
        col("dup3_frac"), col("char_entropy")))
  }

  /** [[qualityGate]] as a pure FILTER that keeps every input column —
    * for pipeline composition (pipe3) where downstream stages still need
    * text/lang. Identical thresholds and feature expressions (single
    * source of truth via [[gatePredicate]]); still map-only, no shuffle.
    * Callers must have run NativeExpressions.register. */
  def qualityFilter(df: DataFrame, textCol: String): DataFrame =
    df.filter(gateOn(textCol))

  /** [[qualityFilter]] with in-flight metrics: input and kept counts
    * accumulate DURING the gate's single pass via `Dataset.observe`
    * (CollectMetrics — executor-side accumulators, no second job, no
    * re-scan). At 100 TB the naive alternative — count() before and
    * after — re-reads the corpus twice to answer "what did the gate
    * drop?"; this answers it for free with the run itself. Read the
    * metrics from the returned Observation AFTER an action on the
    * frame: `obs.get("n_in")`, `obs.get("n_kept")`. */
  def observedQualityFilter(
      df: DataFrame, textCol: String): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation("quality_gate")
    val pred = gateOn(textCol)
    val observed = df.observe(obs,
      count(lit(1)).as("n_in"),
      sum(when(pred, 1L).otherwise(0L)).as("n_kept"))
    (observed.filter(pred), obs)
  }

  /** The streaming-capable form of [[observedQualityFilter]]: a NAMED
    * observation (the `Observation` helper is batch-only). In a stream
    * the metrics surface per micro-batch on
    * `StreamingQueryProgress.observedMetrics(name)` — totals are the
    * sum over batches, which CorpusIngestSpec pins against the batch
    * counts. Same single pass, same predicate source of truth. */
  def qualityFilterNamedMetrics(df: DataFrame, textCol: String, name: String): DataFrame = {
    val pred = gateOn(textCol)
    df.observe(name,
        count(lit(1)).as("n_in"),
        sum(when(pred, 1L).otherwise(0L)).as("n_kept"))
      .filter(pred)
  }

  // the gate predicate over a raw text column — single source of truth
  // for qualityFilter and observedQualityFilter
  private def gateOn(textCol: String): Column = {
    val toks = tokens(col(textCol))
    val nToks = size(toks)
    val stopHits = size(filter(toks,
      tk => Stopwords.foldLeft(lit(false))((acc, m) => acc || (tk === m))))
    gatePredicate(
      nToks.cast("long"),
      round(stopHits.cast("double") / nToks, 4),
      repetitionRatioNative(textCol, 3),
      charEntropyNative(textCol))
  }

  // the Gopher/C4-style thresholds — one definition for both gate forms
  private def gatePredicate(
      nTokens: Column, stopwordRatio: Column,
      dup3Frac: Column, charEntropy: Column): Column =
    nTokens >= 25 && stopwordRatio >= 0.05 &&
      dup3Frac <= 0.05 && charEntropy >= 2.8

  /** Per-group quality report: how much of each group (source, domain,
    * language — the curation axis) survives the Gopher/C4 gate. The gate
    * predicate is THE same composed definition pipe2 filters with
    * (gateOn — one map-only pass over the native kernels); this rolls it
    * up instead of filtering, because "which domains are rotten" is the
    * question a curation pass asks before deciding what to drop. One
    * narrow pass + one tiny hash aggregate; callers must have run
    * NativeExpressions.register. */
  def qualityReport(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(gateOn(textCol), 1L).otherwise(0L)).as("n_pass"))
      .select(col(groupCol), col("n_docs"), col("n_pass"),
        round(col("n_pass").cast("double") / col("n_docs"), 4).as("pass_share"))

  /** Corpus-trained bigram language-model score per document — the
    * CCNet-style quality signal (Wenzek et al. 2020, "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data": rank
    * documents by LM perplexity; improbable text is boilerplate or
    * gibberish). CCNet scores against a pre-trained KenLM; here the
    * n-gram model is TRAINED ON THE CORPUS ITSELF in the same job —
    * the self-supervised variant — with add-one smoothing:
    *
    *   P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
    *
    * where c(·) are corpus occurrence counts and V the vocabulary size.
    * The score is the total negative log-likelihood Σ −ln P over the
    * document's bigrams (monotone in perplexity given n_bigrams, which is
    * returned alongside). Each term is rounded to 6 decimals and
    * accumulated in DECIMAL(18,6) — the [[ExactSums]] pattern — so the
    * sum is exact and order-independent: the one float op per DISTINCT
    * bigram is an ln of an exactly-rounded integer ratio, reproducible
    * across engines to the rounding guard.
    *
    * Scale shape: two hash-aggregates build the model (bigram counts and
    * context counts, both map-side combined — shuffle ≈ distinct grams,
    * not corpus tokens); scoring is two co-partitioned shuffle joins on
    * the gram/context keys plus a broadcast of the 1-row vocabulary
    * count; the per-doc reduce is one more hash-aggregate. Nothing
    * collects, nothing is quadratic; model size is O(distinct bigrams),
    * partitioned — never a driver-side table. Documents with fewer than
    * two tokens have no bigrams and are absent from the output.
    */
  /** BPE merge-rule LEARNING (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units") — trains the merge
    * table txt6-style tokenizers apply: start from characters, repeatedly
    * take the most frequent adjacent symbol pair (weighted by word
    * frequency; ties broken lexicographically) and merge it everywhere.
    * Returns the ordered merge table (merge_rank, lhs, rhs, freq).
    *
    * Representation is the whole trick: a word is a STRING of
    * separator-wrapped symbols (`⟨s⟩` per symbol, U+001F separator), so
    * one merge round is a plain `replace(seq, ⟨l⟩⟨r⟩, ⟨lr⟩)` — and
    * `replace` is left-to-right non-overlapping in both Spark and
    * DuckDB, which is EXACTLY BPE's greedy merge semantics ("a a a"
    * merges to "[aa] a", and a symbol whose text extends past the pair
    * boundary can never false-match because both of its separators are
    * part of the pattern). The oracle replays every round with the same
    * replace.
    *
    * Scale shape: the corpus is touched ONCE (word counts); training
    * runs on the VOCABULARY table (distinct words — millions of rows at
    * 100 TB, not billions), one pair-count aggregation + one argmax +
    * one narrow replace per round, lineage truncated per round. This is
    * the standard industrial BPE-trainer shape (corpus → word counts →
    * iterate on vocab). Documents must not contain U+001F (the separator
    * contract; whitespace-tokenized corpora satisfy it).
    */
  def bpeLearnMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame =
    bpeTrain(docs, textCol, numMerges)._1.drop("score")

  /** WordPiece merge-rule learning (Schuster & Nakajima 2012 — the BERT
    * tokenizer's trainer): BPE's greedy loop with LIKELIHOOD scoring —
    * each round merges the pair maximizing freq(l,r) / (count(l) ·
    * count(r)) (the pair whose merge most increases corpus likelihood
    * under a unigram model) instead of raw frequency, so a rare but
    * EXCLUSIVE pair beats a frequent pair of common symbols. Scoring is
    * EXACT integer fixed-point: score = freq·10^12 div (count(l) ·
    * count(r)) — the numerator widens through DECIMAL(38,0) (HUGEINT in
    * the oracle) so nothing overflows at any corpus size, and the
    * truncating div is the gr1 cross-engine contract. Ties break
    * (score, lhs, rhs). Merge application, the separator
    * representation, and the scale shape are exactly [[bpeLearnMerges]];
    * the oracle replays every round including both count tables. */
  def wordpieceLearnMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame =
    bpeTrain(docs, textCol, numMerges, wordpiece = true)._1

  /** The segmentation the learned merges induce: one row per distinct
    * word with its corpus count and its subword split after `numMerges`
    * merges — i.e. the trained tokenizer's output on the training
    * vocabulary (applying it to new text is the same replace cascade in
    * merge order). Subwords join with "." for a flat, exactly
    * comparable rendering ('.' cannot appear inside a symbol on a
    * space-tokenized corpus of word characters; the training separator
    * stays the non-printing U+001F either way). */
  def bpeSegment(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val Sep = "\u001f"
    val (_, vocab) = bpeTrain(docs, textCol, numMerges)
    vocab.select(col("word"), col("w").as("n_occurrences"),
      call_function("replace", trim(col("seq"), Sep), lit(Sep + Sep), lit(".")).as("segmentation"))
  }

  /** Apply LEARNED merges to arbitrary NEW text — the inference half of
    * the tokenizer: every word re-runs the same replace cascade in merge
    * order (BPE application is exactly training's merge step without the
    * counting), so words never seen in training still segment by the
    * learned subwords. `merges` is the (lhs, rhs) list in rank order —
    * collect it once from [[bpeLearnMerges]]; the cascade compiles to k
    * chained `replace` calls per word inside one narrow projection (no
    * shuffle, no state — the trained tokenizer IS a column expression).
    * Adds `outCol`: the text with words re-joined by spaces and subwords
    * marked with ".". */
  def bpeApply(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      outCol: String = "segmented"): DataFrame = {
    val Sep = "\u001f"
    def segmentWord(w: Column): Column = {
      val wrapped = regexp_replace(w, "(.)", Sep + "$1" + Sep)
      val mergedSeq = merges.foldLeft(wrapped) { case (c, (l, r)) =>
        call_function("replace", c, lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
      }
      call_function("replace", trim(mergedSeq, Sep), lit(Sep + Sep), lit("."))
    }
    df.withColumn(outCol,
      array_join(transform(split(col(textCol), " "), w => segmentWord(w)), " "))
  }

  private def bpeTrain(
      docs: DataFrame, textCol: String, numMerges: Int,
      wordpiece: Boolean = false): (DataFrame, DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val Sep = "\u001f"
    val spark = docs.sparkSession
    val words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("w"))
      .select(col("word"),
        regexp_replace(col("word"), "(.)", Sep + "$1" + Sep).as("seq"), col("w"))
    var vocab = words.localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val syms = col("__syms")
      val exploded = vocab
        .select(col("w"), split(trim(col("seq"), Sep), Sep + Sep).as("__syms"))
      val pairFreqs = exploded
        .filter(size(syms) >= 2)
        .select(col("w"), explode(transform(sequence(lit(1), size(syms) - 1),
          i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum(col("w")).as("freq"))
      val best =
        if (!wordpiece)
          pairFreqs
            .withColumn("score", col("freq"))
            .orderBy(col("freq").desc, col("lhs"), col("rhs"))
            .limit(1).collect()
        else {
          // likelihood scoring consults the CURRENT per-symbol
          // occurrence counts — single-symbol words included, they
          // hold count mass
          val symCounts = exploded
            .select(explode(col("__syms")).as("sym"), col("w"))
            .groupBy("sym").agg(sum(col("w")).cast("long").as("c"))
          pairFreqs
            .join(symCounts.select(col("sym").as("lhs"), col("c").as("cl")), Seq("lhs"))
            .join(symCounts.select(col("sym").as("rhs"), col("c").as("cr")), Seq("rhs"))
            .withColumn("score",
              // denominator widened too: cl*cr as BIGINT*BIGINT wraps
              // silently in non-ANSI mode once two symbol counts'
              // product exceeds 2^63 (two ~3e9-count symbols at web
              // scale) — DECIMAL(38,0)*BIGINT holds any int64 pair
              expr("CAST((CAST(freq AS DECIMAL(38,0)) * 1000000000000) div (CAST(cl AS DECIMAL(38,0)) * cr) AS BIGINT)"))
            .orderBy(col("score").desc, col("lhs"), col("rhs"))
            .select(col("lhs"), col("rhs"), col("freq"), col("score"))
            .limit(1).collect()
        }
      if (best.isEmpty) exhausted = true
      else {
        val row = best(0)
        val (l, r) = (row.getAs[String]("lhs"), row.getAs[String]("rhs"))
        merges += ((rank, l, r, row.getAs[Long]("freq"), row.getAs[Long]("score")))
        vocab = vocab.select(col("word"),
          call_function("replace", col("seq"),
            lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep)).as("seq"),
          col("w")).localCheckpoint(true)
        rank += 1
      }
    }
    import spark.implicits._
    (merges.toSeq.toDF("merge_rank", "lhs", "rhs", "freq", "score"), vocab)
  }

  def bigramLmScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize the token array as a projected attribute BEFORE the
    // lambda consumes it: a lambda body referencing the raw split(...)
    // EXPRESSION re-evaluates the split per element (codegen does not CSE
    // across higher-order functions), turning an O(len) pass into
    // O(len²) splits per document — measured 6.1 s vs 0.9 s at sf0.1
    val tk = col("__toks")
    val w = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(tk) >= 2)
    val grams = w
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(tk) - 1),
          i => struct(element_at(tk, i).as("w1"),
            concat_ws(" ", element_at(tk, i), element_at(tk, i + 1)).as("bg")))).as("g"))
      .select(col(idCol), col("g.w1").as("w1"), col("g.bg").as("bg"))
    val allToks = docs.select(explode(tokens(col(textCol))).as("w"))
    val c2 = grams.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = allToks.groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = allToks.agg(countDistinct(col("w")).as("v"))
    val term = -log((col("c2") + 1).cast("double") / (col("c1") + col("v")).cast("double"))
    grams.join(c2, "bg")
      .join(c1, col("w1") === col("w"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(round(term, 6).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("nll"))
  }

  /** Trigram LM with "stupid backoff" (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the web-scale scheme:
    * unnormalized relative frequencies with a constant backoff factor,
    * no discounting to tune): per held-out document, the total negative
    * log-score under a model counted from the TRAIN split of the same
    * corpus. Splitting matters: txt15 trains and scores on the same
    * rows, so every observed n-gram has count ≥ 1 and backoff would be
    * dead code — here the model comes from the Knuth-hash train
    * partition (smp1's split rule, so the split replays exactly) and
    * only holdout docs are scored, where unseen trigrams genuinely back
    * off. Scoring per trigram position (w1 w2 w3):
    *   S = c3(w1w2w3)/c2(w1w2)                 when the trigram was seen
    *     | α·(c2(w2w3)/c1(w2))                 else, when the bigram was
    *     |                                     seen (its context w2
    *     |                                     necessarily was too)
    *     | α·(α·((c1(w3)+1)/(N+V)))            else — add-one smoothed
    *                                           unigram so OOV words stay
    *                                           finite (txt15 convention)
    * with α = 0.4, the paper's constant. Expression nesting is pinned
    * (α·(α·(ratio))) because double multiplication is not associative —
    * the oracle replays the same tree. Terms round to 6dp and sum as
    * exact DECIMAL (the ExactSums/txt15 contract: order-independent
    * reduce, identical decimals cast to identical doubles).
    *
    * Scale: count tables are n-gram-VOCABULARY-sized, built with
    * map-side-combined aggregates; scoring is five co-partitioned hash
    * joins on gram keys (no broadcast of anything corpus-sized — only
    * the 1-row (N, V) frame). Work is O(tokens), shuffle O(gram types).
    */
  def trigramBackoffScores(docs: DataFrame, idCol: String, textCol: String,
      trainPct: Int = 80, alpha: Double = 0.4): DataFrame = {
    require(trainPct > 0 && trainPct < 100, "trainPct must split both ways")
    val tk = col("__toks")
    val withToks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"),
      (expr(s"pmod(pmod($idCol, 2147483648) * 2654435761, 4294967296) % 100") < trainPct).as("__tr"))
    val train = withToks.filter(col("__tr"))
    val uni = train.select(explode(tk).as("w"))
    val c1 = uni.groupBy("w").agg(count(lit(1)).as("c1"))
    val nv = uni.agg(count(lit(1)).as("n_tokens"), countDistinct(col("w")).as("v"))
    val c2 = train.filter(size(tk) >= 2)
      .select(explode(transform(sequence(lit(1), size(tk) - 1),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1)))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
    val c3 = train.filter(size(tk) >= 3)
      .select(explode(transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))).as("tg"))
      .groupBy("tg").agg(count(lit(1)).as("c3"))
    val occ = withToks.filter(!col("__tr")).filter(size(tk) >= 3)
      .select(col(idCol), explode(transform(sequence(lit(1), size(tk) - 2), i =>
        struct(
          concat_ws(" ", element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)).as("tg"),
          concat_ws(" ", element_at(tk, i), element_at(tk, i + 1)).as("ctx2"),
          concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2)).as("bg23"),
          element_at(tk, i + 1).as("w2"),
          element_at(tk, i + 2).as("w3")))).as("g"))
      .select(col(idCol), col("g.tg").as("tg"), col("g.ctx2").as("ctx2"),
        col("g.bg23").as("bg23"), col("g.w2").as("w2"), col("g.w3").as("w3"))
    val joined = occ
      .join(c3.select(col("tg").as("__tg"), col("c3")), col("tg") === col("__tg"), "left")
      .join(c2.select(col("bg").as("__ctx2"), col("c2").as("c2ctx")), col("ctx2") === col("__ctx2"), "left")
      .join(c2.select(col("bg").as("__bg23"), col("c2").as("c2_23")), col("bg23") === col("__bg23"), "left")
      .join(c1.select(col("w").as("__w2"), col("c1").as("c1_2")), col("w2") === col("__w2"), "left")
      .join(c1.select(col("w").as("__w3"), col("c1").as("c1_3")), col("w3") === col("__w3"), "left")
      .crossJoin(broadcast(nv))
    val s = when(col("c3").isNotNull,
        col("c3").cast("double") / col("c2ctx").cast("double"))
      .when(col("c2_23").isNotNull,
        lit(alpha) * (col("c2_23").cast("double") / col("c1_2").cast("double")))
      .otherwise(lit(alpha) * (lit(alpha) *
        ((coalesce(col("c1_3"), lit(0L)) + 1).cast("double") /
          (col("n_tokens") + col("v")).cast("double"))))
    joined.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(round(-log(s), 6).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("nll"))
  }

  /** Interpolated Kneser-Ney trigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999's interpolated formulation — the KenLM-class quality
    * scorer real curation stacks use where txt19's stupid backoff is
    * the cheap approximation). Model counted from the Knuth-hash TRAIN
    * split, holdout docs scored. Absolute discount D = 0.75 (exactly
    * representable in binary — 3/4 — so the discounted numerators are
    * bit-identical cross-engine):
    *
    * {{{
    *   P1(w3)       = (N1+(·w3) + 1) / (N1+(··) + V + 1)      [add-one floor keeps OOV finite]
    *   P2(w3|w2)    = max(N1+(·w2w3)-D, 0)/N1+(·w2·)
    *                  + D·N1+(w2·)/N1+(·w2·) · P1(w3)          when N1+(·w2·) exists, else P1
    *   P3(w3|w1w2)  = max(c3-D, 0)/c2(w1w2)
    *                  + D·N1+(w1w2·)/c2(w1w2) · P2(w3|w2)      when c2 AND N1+(w1w2·) exist, else P2
    * }}}
    *
    * The top level also requires N1+(w1w2·) — a train bigram occurring
    * only at document ends has no trigram extension, and without the
    * guard its λ would be 0 and the whole probability 0 (the role
    * sentence-end markers play in the textbook formulation); backing
    * off to P2 instead keeps every score finite and positive. All
    * probability expressions are built from the SAME SQL text in both
    * engines (pinned nesting — double arithmetic is not associative);
    * per-term round(-ln·,6) summed as exact DECIMAL (the txt15
    * contract).
    *
    * Scale: six count/continuation tables, all n-gram-VOCABULARY-sized
    * map-side-combined aggregates over the distinct trigram/bigram TYPE
    * tables; scoring is seven co-partitioned gram-key hash joins plus
    * one 1-row broadcast. Work O(tokens), shuffle O(gram types).
    */
  def kneserNeyScores(docs: DataFrame, idCol: String, textCol: String,
      trainPct: Int = 80): DataFrame = {
    require(trainPct > 0 && trainPct < 100, "trainPct must split both ways")
    val tk = col("__toks")
    val withToks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"),
      (expr(s"pmod(pmod($idCol, 2147483648) * 2654435761, 4294967296) % 100") < trainPct).as("__tr"))
    val train = withToks.filter(col("__tr"))
    val uni = train.select(explode(tk).as("w"))
    val c2 = train.filter(size(tk) >= 2)
      .select(explode(transform(sequence(lit(1), size(tk) - 1),
        i => struct(element_at(tk, i).as("b1"), element_at(tk, i + 1).as("b2")))).as("g"))
      .select(col("g.b1").as("b1"), col("g.b2").as("b2"))
    val tri = train.filter(size(tk) >= 3)
      .select(explode(transform(sequence(lit(1), size(tk) - 2),
        i => struct(element_at(tk, i).as("t1"), element_at(tk, i + 1).as("t2"),
          element_at(tk, i + 2).as("t3")))).as("g"))
      .select(col("g.t1").as("t1"), col("g.t2").as("t2"), col("g.t3").as("t3"))
    val c3 = tri.groupBy("t1", "t2", "t3").agg(count(lit(1)).as("c3"))
    val c2cnt = c2.groupBy("b1", "b2").agg(count(lit(1)).as("c2"))
    val triTypes = c3.select("t1", "t2", "t3") // distinct trigram types
    val bigTypes = c2cnt.select("b1", "b2")    // distinct bigram types
    val n1mid = triTypes.groupBy(col("t2").as("m2"), col("t3").as("m3"))
      .agg(count(lit(1)).as("n1mid"))          // N1+(·w2w3)
    val n1ctx = triTypes.groupBy(col("t2").as("x2"))
      .agg(count(lit(1)).as("n1ctx"))          // N1+(·w2·)
    val n1right = triTypes.groupBy(col("t1").as("r1"), col("t2").as("r2"))
      .agg(count(lit(1)).as("n1right"))        // N1+(w1w2·)
    val ntypes = bigTypes.groupBy(col("b1").as("y2"))
      .agg(count(lit(1)).as("ntypes"))         // N1+(w2·)
    val n1luni = bigTypes.groupBy(col("b2").as("u3"))
      .agg(count(lit(1)).as("n1luni"))         // N1+(·w3)
    val totals = bigTypes.agg(count(lit(1)).as("n1all"))
      .crossJoin(broadcast(uni.agg(countDistinct(col("w")).as("v"))))
    val occ = withToks.filter(!col("__tr")).filter(size(tk) >= 3)
      .select(col(idCol), explode(transform(sequence(lit(1), size(tk) - 2),
        i => struct(element_at(tk, i).as("w1"), element_at(tk, i + 1).as("w2"),
          element_at(tk, i + 2).as("w3")))).as("g"))
      .select(col(idCol), col("g.w1").as("w1"), col("g.w2").as("w2"), col("g.w3").as("w3"))
    val joined = occ
      .join(c3.select(col("t1"), col("t2"), col("t3"), col("c3")),
        col("w1") === col("t1") && col("w2") === col("t2") && col("w3") === col("t3"), "left")
      .join(c2cnt.select(col("b1").as("p1c"), col("b2").as("p2c"), col("c2")),
        col("w1") === col("p1c") && col("w2") === col("p2c"), "left")
      .join(n1mid, col("w2") === col("m2") && col("w3") === col("m3"), "left")
      .join(n1ctx, col("w2") === col("x2"), "left")
      .join(n1right, col("w1") === col("r1") && col("w2") === col("r2"), "left")
      .join(ntypes, col("w2") === col("y2"), "left")
      .join(n1luni, col("w3") === col("u3"), "left")
      .crossJoin(broadcast(totals))
    // the SAME expression text the oracle runs — pinned nesting
    val scored = joined
      .withColumn("p1", expr(
        "CAST(coalesce(n1luni, 0) + 1 AS DOUBLE) / CAST(n1all + v + 1 AS DOUBLE)"))
      .withColumn("p2", expr(
        """CASE WHEN n1ctx IS NOT NULL
          |     THEN (greatest(CAST(coalesce(n1mid, 0) AS DOUBLE) - 0.75E0, 0E0) / CAST(n1ctx AS DOUBLE))
          |          + ((0.75E0 * (CAST(coalesce(ntypes, 0) AS DOUBLE) / CAST(n1ctx AS DOUBLE))) * p1)
          |     ELSE p1 END""".stripMargin))
      .withColumn("p3", expr(
        """CASE WHEN c2 IS NOT NULL AND n1right IS NOT NULL
          |     THEN (greatest(CAST(coalesce(c3, 0) AS DOUBLE) - 0.75E0, 0E0) / CAST(c2 AS DOUBLE))
          |          + ((0.75E0 * (CAST(n1right AS DOUBLE) / CAST(c2 AS DOUBLE))) * p2)
          |     ELSE p2 END""".stripMargin))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(round(-log(col("p3")), 6).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("nll"))
  }

  /** Unigram-LM (SentencePiece-style, Kudo 2018 "Subword
    * Regularization") tokenizer training, hard-EM variant: seed the
    * vocabulary with all word substrings up to `maxPieceLen`, then
    * alternate (E) Viterbi-segmenting every distinct word under the
    * current piece costs with (M) recounting pieces from the chosen
    * segmentations, pruning to single chars plus the `vocabTarget`
    * most-used multi-char pieces each round. Viterbi counts replace the
    * paper's forward-backward expectations (hard EM — the recognized
    * deterministic simplification); single-char pieces persist with a
    * floor count of 1 so every word stays segmentable (the paper's
    * character-coverage guarantee).
    *
    * Exactness contract (what lets a DuckDB oracle replay EVERY round):
    * a piece's cost is the INTEGER `round(-ln(c/total)·10^6)` — both
    * engines produce the identical BIGINT from the identical double —
    * and the DP state at position i is the single integer
    * `enc = pathCost·32 + backpointer`, so `min(enc)` IS the
    * lexicographic (cost, smaller-j) tie-break with no float compare
    * and no argmin construct anywhere. Path costs stay far below the
    * 2^63/32 encoding headroom (costs ≤ ~5·10^7, ≤ maxWordLen terms).
    * Words longer than `maxWordLen` (31 max, for the backpointer
    * bit-budget) are excluded from training — the SentencePiece
    * max-sentence-length contract.
    *
    * Scale: the E-step is one pass over distinct WORDS (not tokens) —
    * a piece-key hash join builds each word's span→cost map (≤
    * maxWordLen·maxPieceLen entries), and the Viterbi DP + backtrack
    * run as codegen'd HOF lambdas inside the row, no per-position
    * shuffle. Per round: O(distinct words · maxWordLen · maxPieceLen)
    * work, shuffle O(distinct words + vocabulary). The M-step is a
    * vocabulary-sized aggregate. Nothing is ever corpus-length ×
    * rounds.
    */
  /** One Viterbi E-step: (word, w) × vocab(piece, cost) →
    * (word, w, pieces) where `pieces` is the min-cost segmentation in
    * REVERSE order (backtrack emission; callers reverse for display).
    * One piece-key hash join to build each word's span→cost map, then
    * the forward DP and backtrack run as codegen'd HOF lambdas inside
    * the row — enc = pathCost·32 + backpointer (see [[unigramLearn]]).
    */
  private def viterbiPieces(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val spans = words
      .select(col("word"), col("w"),
        explode(expr(
          s"""flatten(transform(sequence(0, length(word) - 1), j ->
             |  transform(sequence(j + 1, least(j + $maxPieceLen, length(word))), i ->
             |    named_struct('k', j * 32 + i,
             |                 'piece', substring(word, j + 1, i - j)))))""".stripMargin)).as("s"))
      .select(col("word"), col("w"), col("s.k").as("k"), col("s.piece").as("piece"))
      .join(vocab.select(col("piece"), col("cost")), Seq("piece"))
      .groupBy(col("word"), col("w"))
      .agg(map_from_arrays(collect_list(col("k")), collect_list(col("cost"))).as("cm"))
    // Viterbi forward: bests[pos+1] = enc at pos; enc = cost*32 + bp
    spans.withColumn("bests", expr(
      """aggregate(
        |  sequence(1, length(word)),
        |  array(CAST(0 AS BIGINT)),
        |  (acc, i) -> array_append(acc,
        |    aggregate(
        |      sequence(greatest(0, i - 4), i - 1),
        |      CAST(4611686018427387903 AS BIGINT),
        |      (m, j) -> CASE WHEN element_at(cm, CAST(j * 32 + i AS INT)) IS NOT NULL
        |                     THEN least(m, (element_at(acc, CAST(j + 1 AS INT)) div 32
        |                                    + element_at(cm, CAST(j * 32 + i AS INT))) * 32 + j)
        |                     ELSE m END)))""".stripMargin
        .replace("i - 4", s"i - $maxPieceLen")))
      // backtrack: walk bp's from the last position, emit the pieces
      .withColumn("pieces", expr(
        """aggregate(
          |  sequence(1, length(word)),
          |  named_struct('pos', CAST(length(word) AS INT),
          |               'ps', CAST(array() AS ARRAY<STRING>)),
          |  (st, x) -> IF(st.pos <= 0, st,
          |    named_struct(
          |      'pos', CAST(element_at(bests, st.pos + 1) % 32 AS INT),
          |      'ps', array_append(st.ps,
          |        substring(word,
          |          CAST(element_at(bests, st.pos + 1) % 32 AS INT) + 1,
          |          st.pos - CAST(element_at(bests, st.pos + 1) % 32 AS INT))))),
          |  st -> st.ps)""".stripMargin))
      .select(col("word"), col("w"), col("pieces"))
  }

  def unigramLearn(docs: DataFrame, textCol: String,
      rounds: Int = 2, maxPieceLen: Int = 4, maxWordLen: Int = 16,
      vocabTarget: Int = 200): DataFrame = {
    val (_, vocab) = unigramCore(docs, textCol, rounds, maxPieceLen, maxWordLen, vocabTarget)
    vocab.orderBy(col("c").desc, col("piece")).limit(64)
      .select(col("piece"), col("c").as("n_uses"), col("cost"))
  }

  /** Segment the corpus's words with the FINAL trained unigram vocab —
    * one more Viterbi E-step after the last M-step (the tokenizer a
    * pipeline actually ships). Face mirrors bpeSegment: (word,
    * n_occurrences, dot-joined segmentation), fully derivable. */
  def unigramSegment(docs: DataFrame, textCol: String,
      rounds: Int = 2, maxPieceLen: Int = 4, maxWordLen: Int = 16,
      vocabTarget: Int = 200): DataFrame = {
    val (words, vocab) = unigramCore(docs, textCol, rounds, maxPieceLen, maxWordLen, vocabTarget)
    viterbiPieces(words, vocab, maxPieceLen)
      .select(col("word"), col("w").as("n_occurrences"),
        array_join(reverse(col("pieces")), ".").as("segmentation"))
  }

  private def unigramCore(docs: DataFrame, textCol: String,
      rounds: Int, maxPieceLen: Int, maxWordLen: Int,
      vocabTarget: Int): (DataFrame, DataFrame) = {
    require(maxWordLen <= 31, "backpointers are encoded in 5 bits")
    require(rounds >= 1 && maxPieceLen >= 1 && vocabTarget >= 1)
    val spark = docs.sparkSession
    val words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")).between(1, maxWordLen))
      .groupBy("word").agg(count(lit(1)).as("w"))
      .localCheckpoint(true) // every round re-reads the word table
    // seed counts: all substrings up to maxPieceLen, weighted by word freq
    val subs = words
      .select(col("word"), col("w"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(word)), i ->
             |  transform(sequence(1, least($maxPieceLen, length(word) - i + 1)), l ->
             |    substring(word, i, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("w")).as("c"))
    val chars = subs.filter(length(col("piece")) === 1).select("piece")
      .localCheckpoint(true)
    def withCosts(cnt: DataFrame): DataFrame = {
      val total = cnt.agg(sum(col("c")).as("t"))
      cnt.crossJoin(broadcast(total))
        .select(col("piece"), col("c"),
          expr("CAST(round(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000) AS BIGINT)")
            .as("cost"))
    }
    var vocab = withCosts(subs).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val pieces = viterbiPieces(words, vocab, maxPieceLen)
        .select(col("w"), explode(col("pieces")).as("piece"))
      val used = pieces.groupBy("piece").agg(sum(col("w")).as("c"))
      // chars persist at a floor of 1; multis survive only if used
      val cnt = chars
        .join(used.filter(length(col("piece")) === 1), Seq("piece"), "left")
        .select(col("piece"), greatest(coalesce(col("c"), lit(0L)), lit(1L)).as("c"))
        .unionByName(used.filter(length(col("piece")) > 1))
      val keptMultis = cnt.filter(length(col("piece")) > 1)
        .orderBy(col("c").desc, col("piece")).limit(vocabTarget)
      val kept = cnt.filter(length(col("piece")) === 1).unionByName(keptMultis)
      vocab = withCosts(kept).localCheckpoint(true)
    }
    (words, vocab)
  }

  /** Document-level PMI word associations (Church & Hanks 1990) — the
    * collocation signal under phrase mining and topic drift checks:
    * for words x, y co-occurring in at least `minSupport` documents,
    *
    *   PMI(x, y) = ln( c(x,y)·N / (c(x)·c(y)) )
    *
    * with c(·) document frequencies and N the doc count — one ln of a
    * ratio of exact integers, under the 6-decimal scaled-ln contract
    * (pmi_micro BIGINT), so the whole table replays. The integer
    * product c(x)·c(y) ≤ N² stays in BIGINT for any N < 3·10⁹ docs
    * (DuckDB would error loudly, not wrap, past that).
    *
    * Scale shape: the distinct (doc, word) frame self-joins on the doc
    * key — fan-out C(distinct words per doc, 2), the co-occurrence
    * regime (cap membership upstream for pathological docs, the dd2
    * pattern); pair counts aggregate map-side to ≤ vocab² rows; the
    * word table broadcasts twice; the 1-row N broadcasts.
    * Returns (w1, w2, cxy, pmi_micro) with w1 < w2. */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      minSupport: Long = 5L): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val dw = docs.select(col(idCol).as("did"), explode(tokens(col(textCol))).as("w"))
      .distinct()
    val cw = dw.groupBy("w").agg(count(lit(1)).cast("long").as("cw"))
    val n = dw.agg(countDistinct(col("did")).cast("long").as("n"))
    dw.join(dw.select(col("did"), col("w").as("w2")), Seq("did"))
      .filter(col("w") < col("w2"))
      .groupBy(col("w").as("w1"), col("w2"))
      .agg(count(lit(1)).cast("long").as("cxy"))
      .filter(col("cxy") >= minSupport)
      .join(broadcast(cw.select(col("w").as("w1"), col("cw").as("c1"))), Seq("w1"))
      .join(broadcast(cw.select(col("w").as("w2"), col("cw").as("c2"))), Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("cxy"),
        round(log(col("cxy").cast("double") * col("n") / (col("c1") * col("c2"))) * 1e6)
          .cast("long").as("pmi_micro"))
  }

  /** BM25 retrieval scoring (Robertson & Zaragoza 2009, the Okapi
    * formulation with Lucene's +1 idf so no term scores negative) —
    * the ranked-retrieval primitive under contamination screening and
    * curriculum selection ("score every training doc against the eval
    * queries"). The standard constants k1 = 1.2 and b = 0.75 are
    * RATIONAL, which clears the saturation term of floats entirely:
    * with N docs, L total corpus tokens (so avgdl = L/N),
    *
    * {{{
    *   tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))
    *     = 22·tf·L / (10·tf·L + 3·L + 9·len·N)       — exact integers
    * }}}
    *
    * and the only transcendental is idf = ln((2N+2)/(2·df+1)) — one ln
    * of a ratio of integers, under the repo's 6-decimal scaled-ln
    * contract (idf_micro BIGINT), so per-term scores are integer
    * micro-units and per-doc sums replay bit-for-bit. Duplicate query
    * terms are deduped (unweighted query tf — the common case).
    *
    * Scale shape: tf/df/totals are one aggregate each; scoring is a
    * broadcast of the tiny (term, idf) query frame into the tf table —
    * only docs containing a query term ever materialize a row — then
    * one map-side-combined sum per (query, doc). Nothing corpus-sized
    * shuffles beyond the tf aggregate itself.
    * Returns (query_id, idCol, score_micro). */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, String)]): DataFrame = {
    require(queries.nonEmpty, "bm25Scores needs at least one query")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("len"),
        explode(col("__toks")).as("term"))
    val tf = w.groupBy(col(idCol), col("len"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val totals = w.agg(count(lit(1)).cast("long").as("bigl"),
      countDistinct(col(idCol)).cast("long").as("n"))
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.toDF("query_id", "q_text")
      .select(col("query_id"), explode(split(col("q_text"), " ")).as("term"))
      .distinct()
    val idf = dfT.crossJoin(broadcast(totals))
      .select(col("term"),
        round(log((lit(2.0) * col("n") + 2.0) / (lit(2.0) * col("df") + 1.0)) * 1e6)
          .cast("long").as("idf_micro"),
        col("bigl"), col("n"))
    broadcast(q.join(idf, Seq("term")))
      .join(tf, Seq("term"))
      .select(col("query_id"), col(idCol),
        expr("""CAST((CAST(idf_micro AS DECIMAL(38,0)) * 22 * tf * bigl)
                div (CAST(10 AS DECIMAL(38,0)) * tf * bigl + CAST(3 AS DECIMAL(38,0)) * bigl
                     + CAST(9 AS DECIMAL(38,0)) * len * n) AS BIGINT)""").as("term_micro"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("term_micro").cast(dec)).cast("long").as("score_micro"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    * corpus-level keywords by PageRank over the word CO-OCCURRENCE
    * graph — an undirected, unweighted, deduplicated edge between every
    * pair of ADJACENT tokens (window 2, the paper's base setting). The
    * unsupervised keyword scorer: no training data, no tf-idf corpus
    * statistics — a word ranks high when it neighbors many other
    * well-connected words.
    *
    * Graph construction is one zip-of-adjacent-slices explode plus a
    * distinct; ranking reuses [[GraphOps.pageRank]]'s integer
    * fixed-point rounds (node ids here are the words themselves), so
    * the whole pipeline — tokenize, pair, rank — replays exactly in the
    * oracle. At scale: the explode is corpus-linear, the distinct
    * bounds the graph at the vocabulary's adjacency (≪ token count),
    * and each rank round is one co-partitioned join + map-side-combined
    * aggregate over that vocabulary-sized edge list. Face: top `k`
    * words, total-ordered (rank desc, word asc). */
  def textRankKeywords(docs: DataFrame, textCol: String,
      iterations: Int = 3, k: Int = 20): DataFrame = {
    val adj = docs.select(tokens(col(textCol)).as("t"))
      .select(expr("slice(t, 1, size(t)-1)").as("x"),
        expr("slice(t, 2, size(t)-1)").as("y"))
      .select(explode(arrays_zip(col("x"), col("y"))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .filter(col("x") =!= col("y"))
    val pairs = adj
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))
      .distinct()
    val edges = pairs.unionAll(pairs.select(col("v").as("u"), col("u").as("v")))
    GraphOps.pageRank(edges, iterations)
      .orderBy(col("pr").desc, col("u"))
      .limit(k)
      .select(col("u").as("word"), col("pr").as("rank_scaled"))
  }

  /** Reciprocal rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner: each input ranking
    * contributes `1/(rrfK + rank)` per (query, doc) and the fused score
    * is the sum, so a doc surfaced by SEVERAL rankers beats one ranker's
    * favorite without any score calibration across systems (the whole
    * point — BM25 micro-units and cosine live on incomparable scales;
    * only the RANKS fuse).
    *
    * Exact integers throughout: the contribution is `1000000 div
    * (rrfK + rank)` — one integral division per entry, bit-identical in
    * any engine — and missing legs contribute 0 (a doc in one ranking
    * only still fuses). Final ties break by smallest doc id, the repo's
    * ranking convention.
    *
    * Scale shape: each input is already a bounded top-N per query (the
    * rankers' own heaps), so the fusion joins frames of queries×N rows —
    * metadata-sized next to the corpus — and the final top-k is the
    * bounded [[graft.functions.TopKByValue]] heap aggregate, never a
    * global sort.
    *
    * @param rankings frames of (query_id, doc_id, rank), rank 1-based
    * @return (query_id, doc_id, rrf_micro, rank) top-k per query */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0 && rrfK >= 0, "rrfFuse needs k > 0 and rrfK >= 0")
    graft.functions.NativeExpressions.register(rankings.head.sparkSession)
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("doc_id"),
        expr(s"CAST(1000000 div ($rrfK + rank) AS BIGINT)").as(s"contrib_$i"))
    }
    val joined = contribs.reduce((a, b) =>
      a.join(b, Seq("query_id", "doc_id"), "full_outer"))
    val fusedScore = contribs.indices
      .map(i => coalesce(col(s"contrib_$i"), lit(0L))).reduce(_ + _)
    joined.select(col("query_id"), col("doc_id"), fusedScore.as("rrf_micro"))
      .groupBy("query_id")
      .agg(expr(s"graft_topk(CAST(rrf_micro AS DOUBLE), doc_id, $k)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.payload").as("doc_id"),
        col("col.value").cast("long").as("rrf_micro"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
