package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{ClassifyOps, ContaminationOps, DedupOps, EventOps, LakeOps, PackOps, QuantizeOps, SampleOps, SimilarityOps, TextOps}
import graft.EntryHelpers._

/** Driver-contract keys — text-analysis family: quality, langid, fingerprints, tokenizers, LM scoring, sampling/mixtures, packing, pipelines.
  *
  * Mechanically split out of SparkEntry (round 15) with ZERO behavior
  * change: entries are verbatim; [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] concatenate the families. Shared helper
  * builders live in [[EntryHelpers]].
  */
private[graft] object TextKeys {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "smp3_stratified_sample" -> ((s, dir) => {
      // stratified deterministic sampling: per-stratum keep rates over
      // the same Knuth hash as smp1 — rebalances the class mix (downsample
      // the dominant statuses, keep all of the rare one) as a pure
      // projection+filter: no shuffle, reproducible on any partitioning
      // or subset of a 100 TB corpus
      val rate = when(col("o_orderstatus") === "F", lit(10L))
        .when(col("o_orderstatus") === "O", lit(50L))
        .otherwise(lit(100L))
      t(s, dir, "orders")
        .filter(pmod(SampleOps.knuth32(col("o_orderkey")), lit(100L)) < rate)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    }),

    "smp4_target_mixture" -> ((s, dir) => {
      // data-derived mixture resampling: hit target language proportions
      // (en 40%, others 15%) with maximum retention — T = min(count/p)
      // is the largest feasible total, per-language quota = floor(p*T),
      // rows picked by Knuth-hash rank (deterministic on any
      // partitioning). The quota derivation runs on the 5-row language
      // aggregate (an unpartitioned window over 5 rows, not a join);
      // the corpus-side cost is one per-language rank window
      val docs = t(s, dir, "documents")
      val target = when(col("lang") === "en", lit(0.4)).otherwise(lit(0.15))
      val wAll = Window.partitionBy() // 5 rows: one per language
      val quotas = docs.groupBy("lang").agg(count(lit(1)).cast("double").as("c"))
        .withColumn("p", target)
        .withColumn("n_keep", floor(col("p") * min(col("c") / col("p")).over(wAll)))
        .select("lang", "n_keep")
      val byHash = Window.partitionBy("lang")
        .orderBy(SampleOps.knuth32(col("doc_id")), col("doc_id"))
      docs.withColumn("rk", row_number().over(byHash))
        .join(broadcast(quotas), "lang")
        .filter(col("rk") <= col("n_keep"))
        .select("doc_id", "lang")
    }),

    "smp6_temperature_mixture" -> ((s, dir) => {
      // temperature-scaled multilingual mixing (the mBERT/XLM-R
      // resampling rule at T = 0.5): per-language share ∝ sqrt(c_i)
      // instead of c_i — upsamples tail languages, downsamples the
      // head; budget = half the corpus, quotas capped at availability.
      // Cross-engine exactness: sqrt is IEEE-correctly-rounded, the
      // rounded weights become DECIMAL(18,6) so their SUM is exact
      // (float addition of the weights would be summation-order-
      // dependent — the one step smp4's min() never had to worry
      // about), and the final quota arithmetic is the same left-assoc
      // double expression in both engines. Rows picked by Knuth-hash
      // rank, the smp1/smp2/smp4 convention.
      val docs = t(s, dir, "documents")
      val wAll = Window.partitionBy()
      val quotas = docs.groupBy("lang").agg(count(lit(1)).cast("double").as("c"))
        .withColumn("w",
          round(sqrt(col("c")), 6).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .withColumn("n_keep", least(col("c"),
          floor(lit(0.5) * sum(col("c")).over(wAll) * col("w").cast("double")
            / sum(col("w")).over(wAll).cast("double"))).cast("long"))
        .select("lang", "n_keep")
      val byHash = Window.partitionBy("lang")
        .orderBy(SampleOps.knuth32(col("doc_id")), col("doc_id"))
      docs.withColumn("rk", row_number().over(byHash))
        .join(broadcast(quotas), "lang")
        .filter(col("rk") <= col("n_keep"))
        .select("doc_id", "lang")
    }),

    "txt14_normalize" -> ((s, dir) =>
      // corpus text normalization: lowercase, strip non-alphanumerics,
      // collapse whitespace — the standard pre-tokenization cleanup as a
      // pure codegen'd projection (the dirty JSON props column is the
      // fixture). Patterns use only Java-regex/RE2-common constructs,
      // like txt8
      t(s, dir, "events").select(
        col("event_id"),
        trim(regexp_replace(regexp_replace(lower(col("props")),
          "[^a-z0-9 ]+", " "), " +", " ")).as("norm"))),

    "pack1_sequence_packing" -> ((s, dir) =>
      // GPT-style concat-and-chunk sequence packing: per-shard token
      // streams cut into 512-token blocks; emits the (block, doc, span)
      // manifest a training loader consumes. See PackOps for the
      // shard-parallel 100 TB design.
      PackOps.packSequences(t(s, dir, "documents"), "doc_id", "text", 8, 512)),

    "pack2_document_packing" -> ((s, dir) =>
      // boundary-respecting next-fit packing: documents never split
      // across bins (cf. pack1's concat-and-chunk). Sequential recurrence
      // per shard -> the one genuine mapPartitions case; the DuckDB
      // oracle replays it with a recursive CTE
      PackOps.packDocuments(t(s, dir, "documents"), "doc_id", "text", 8, 512)),

    "pipe2_quality_filter" -> ((s, dir) => {
      // the composed Gopher/C4-style quality GATE with the native
      // kernels (txt2/txt10/txt11 thresholds in ONE map-only pass); the
      // same TextOps.qualityGate also runs inside the streaming ingest
      // (CorpusIngestSpec)
      graft.functions.NativeExpressions.register(s)
      TextOps.qualityGate(t(s, dir, "documents"), "doc_id", "text")
    }),

    "txt5_string_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowels"),
        instr(col("p_name"), "widget").cast("long").as("widget_pos"),
        length(col("p_name")).cast("long").as("name_len"))),

    "txt6_bpe_tokens" -> ((s, dir) => {
      // BPE-ish pre-tokenization (GPT-2 style splitter shape): letter runs,
      // digit runs, punctuation runs — counted per document
      val pattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
      t(s, dir, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pattern), lit(0))).cast("long").as("n_bpe_tokens"))
    }),

    // ---- temporal joins (operators Spark lacks natively) ----,

    "txt1_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_computed"))),

    "txt2_quality" -> ((s, dir) =>
      TextOps.withQualityFeatures(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("mean_token_len"), col("stopword_ratio"))),

    "txt3_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), TextOps.languageId(col("text")).as("lang_guess"))),

    "txt4_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), TextOps.fingerprint(col("text")).as("content_md5"))),

    "txt7_rolling_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.rollingFingerprint(col("text")).as("rolling_hash"))),

    "txt10_repetition" -> ((s, dir) => {
      // C4/Gopher-style repetition filter: duplicate 3-gram fraction.
      // Native distinct-shingle kernel — the HOF+widen() formulation
      // moved the interpreted cost across cores; the kernel removes it
      // (structural fix per round-3 verdict), so no repartition exchange
      // is needed at all
      graft.functions.NativeExpressions.register(s)
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.repetitionRatioNative("text", 3).as("dup3_frac"))
    }),

    "txt11_char_entropy" -> ((s, dir) => {
      // perplexity proxy: per-doc character-distribution entropy through
      // the codegen'd graft_char_entropy kernel (bit-parity spec vs the
      // HOF histogram, which was the #2 bench cost at 3.05 s — the
      // interpreted lambdas were the scale-killer, not the partitioning)
      graft.functions.NativeExpressions.register(s)
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.charEntropyNative("text").as("char_entropy"))
    }),

    "txt8_redact_pii" -> ((s, dir) => {
      // PII scrubbing under the oracle: the corpus carries no PII, so the
      // query plants a deterministic email + numeric id per doc (same
      // concat both engines), then redacts — the regex path is
      // hash-checked end to end, not vacuously
      val dirty = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com ref "), (col("doc_id") * 10000 + 1234).cast("string")).as("dirty"))
      dirty.select(col("doc_id"), TextOps.redactPii(col("dirty")).as("clean"))
        .withColumn("clean_len", length(col("clean")).cast("long"))
    }),

    "txt9_tfidf" -> ((s, dir) => {
      // classic tf-idf feature table: tf per (doc, term), document
      // frequency per term, idf = ln((N+1)/(df+1)). Shapes: one explode +
      // two aggregations; the vocabulary table joins by term (AQE
      // broadcasts it when small); the 1-row corpus count broadcasts.
      // Both ln inputs are exactly-rounded double divisions of integers,
      // so the oracle reproduces the value bit-for-bit (round 4 guards
      // the sub-ulp libm edge)
      val docs = t(s, dir, "documents")
      val terms = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // document frequency derives from tf — its rows are already the
      // distinct (doc, term) pairs, so a second explode+distinct pass
      // over the corpus would be pure waste
      val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val total = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(dfq, "term")
        .crossJoin(broadcast(total))
        .select(col("doc_id"), col("term"), col("tf").cast("bigint").as("tf"),
          round(col("tf").cast("double") *
            log((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")), 4).as("tfidf"))
    }),

    "smp5_dsir_select" -> ((s, dir) => {
      // DSIR importance resampling: target = the English slice, raw =
      // the whole corpus; hashed-unigram bucket model, add-one
      // smoothing, per-doc log importance weight, deterministic top-100
      // (logw desc, doc_id tiebreak — the engine's rankable surface for
      // the paper's Gumbel-noise sampling). The oracle replays bucket
      // hashing (md5-nibble arithmetic), both corpus models, and the
      // exact DECIMAL term sum.
      val docs = t(s, dir, "documents")
      SampleOps.dsirWeights(docs, docs.filter(col("lang") === "en"), "doc_id", "text")
        .orderBy(col("logw").desc, col("doc_id"))
        .limit(100)
    }),

    "txt23_pmi" -> ((s, dir) =>
      // collocation mining: document-level PMI pairs (min support 5),
      // one ln of exact integer counts per pair — fully replayed.
      // Face = top-20 by (pmi desc, pair), total-ordered.
      TextOps.pmiPairs(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
        .limit(20)),

    "txt24_textrank" -> ((s, dir) =>
      // TextRank keywords: integer fixed-point PageRank (gr1's kernel)
      // over the corpus word co-occurrence graph — adjacent-token
      // edges, undirected, deduplicated. Tokenize→pair→3 rank rounds
      // all replay in the oracle as chained CTEs. Face = top-20 words,
      // total-ordered (rank desc, word asc).
      TextOps.textRankKeywords(t(s, dir, "documents"), "text",
        iterations = 3, k = 20)),

    "txt16_bpe_learn" -> ((s, dir) =>
      // tokenizer TRAINING (Sennrich et al. BPE): 8 merge rounds learned
      // from the corpus word counts. The separator-wrapped-string
      // representation makes each round's merge a plain replace() —
      // left-to-right non-overlapping in both engines, which IS BPE's
      // greedy semantics — so the oracle replays all 8 rounds exactly
      TextOps.bpeLearnMerges(t(s, dir, "documents"), "text", numMerges = 8)),

    "txt17_bpe_segment" -> ((s, dir) =>
      // the trained tokenizer's OUTPUT: every vocabulary word with its
      // subword segmentation after the 8 learned merges (the apply half
      // of txt16's train half). Same replayed-round oracle, read at the
      // final vocab state
      TextOps.bpeSegment(t(s, dir, "documents"), "text", numMerges = 8)),

    "txt18_wordpiece_learn" -> ((s, dir) =>
      // WordPiece training (the BERT tokenizer's trainer): BPE's greedy
      // loop with LIKELIHOOD scoring — freq·10^12 div (count(l)·count(r))
      // in exact fixed-point, so a rare-but-exclusive pair beats a
      // frequent pair of common symbols. The oracle replays all 8
      // rounds including both count tables and the integer score.
      TextOps.wordpieceLearnMerges(t(s, dir, "documents"), "text", numMerges = 8)),

    "txt20_unigram_learn" -> ((s, dir) =>
      // unigram-LM (SentencePiece-style) tokenizer training, hard-EM:
      // substring-seeded vocabulary, per-word Viterbi segmentation
      // under integer fixed-point costs (enc = cost·32 + backpointer,
      // min = exact tie-break), recount + char-floor + top-K prune per
      // round. The oracle replays both EM rounds including every DP
      // frontier as chained CTEs.
      TextOps.unigramLearn(t(s, dir, "documents"), "text")),

    "txt21_unigram_segment" -> ((s, dir) =>
      // the trained unigram tokenizer APPLIED: one more Viterbi E-step
      // under the final vocab segments every corpus word (bpeSegment's
      // face: word, occurrences, dot-joined pieces) — what a pipeline
      // actually ships to tokenize with.
      TextOps.unigramSegment(t(s, dir, "documents"), "text")),

    "txt22_kneser_ney" -> ((s, dir) =>
      // interpolated Kneser-Ney trigram scoring (Chen & Goodman 1999)
      // — the KenLM-class quality signal: absolute discount 0.75
      // (exact in binary), continuation counts at the lower orders,
      // add-one floor on the continuation unigram so OOV stays finite.
      // Model from the train split, holdout scored; the probability
      // expressions are the SAME SQL text in both engines.
      TextOps.kneserNeyScores(t(s, dir, "documents"), "doc_id", "text")),

    "txt15_lm_nll" -> ((s, dir) =>
      // CCNet-style LM quality signal, self-trained: corpus bigram model
      // with add-one smoothing, per-doc total negative log-likelihood.
      // Terms are rounded to 6dp and summed in DECIMAL (ExactSums
      // pattern) so the reduce is order-independent; the oracle replays
      // model training AND scoring from the same corpus
      TextOps.bigramLmScores(t(s, dir, "documents"), "doc_id", "text")),

    "txt19_trigram_backoff" -> ((s, dir) =>
      // trigram LM with stupid backoff (Brants et al. 2007): model
      // counted from the Knuth-hash TRAIN split, holdout docs scored —
      // unseen trigrams genuinely back off through bigram to add-one
      // unigram, α=0.4 with a pinned expression tree. 6dp-rounded terms
      // summed as exact DECIMAL; the oracle replays split, counts, and
      // the full backoff CASE.
      TextOps.trigramBackoffScores(t(s, dir, "documents"), "doc_id", "text")),

    "smp1_hash_split" -> ((s, dir) =>
      // deterministic train/holdout assignment; aggregated so the split
      // FRACTIONS are what the oracle checks (the per-row assignment is a
      // pure projection replayed identically by the SQL)
      SampleOps.hashSplit(t(s, dir, "documents"), "doc_id", 80)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("bigint").as("total_chars"))),

    "smp2_per_group_cap" -> ((s, dir) =>
      // corpus balancing: at most 15 docs per source, deterministic
      // (smallest id-hash wins) — the heap-aggregate path answers to the
      // oracle's row_number() formulation
      SampleOps.perGroupCap(t(s, dir, "documents"), Seq("source"), "doc_id", 15)
        .select("source", "doc_id")),

    "pipe3_full_pipeline" -> ((s, dir) => {
      // the COMPLETE training-data run as one query — what a real corpus
      // build executes end to end: quality gate → CC near-dup survivors →
      // contamination screen → target-mixture resample → boundary-
      // respecting pack. Every stage is an operator that passes its own
      // oracle; this key proves the COMPOSITION under the same hash gate.
      //
      // Plan shape (audited in PlanAuditSpec): the mixture stage is a
      // diamond — it needs the clean set twice (per-language quotas AND
      // per-language ranking), and Catalyst duplicates diamond subtrees,
      // which would re-execute the whole gate→dedup→screen upstream per
      // branch. The fix is the same one a production run uses: an explicit
      // MATERIALIZATION BOUNDARY at the cleaned corpus (lazy
      // localCheckpoint — dd4's CC iteration already relies on the same
      // mechanism). Token counts are computed BEFORE the boundary, so the
      // checkpoint holds three longs + a language per doc, never the
      // text. Upstream of the boundary the corpus is scanned exactly 3
      // times (pair generation, survivor anti-join, 50-row probe side) —
      // each a different projection, none redundant.
      graft.functions.NativeExpressions.register(s)
      val docs = t(s, dir, "documents")
      val gated = TextOps.qualityFilter(docs, "text")
      val survivors = DedupOps.ccSurvivors(gated, "doc_id",
        DedupOps.ngramJaccardPairs(gated, "doc_id", "text",
          n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L)))
      val probes = docs.filter(col("doc_id") < 50)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 20).as("probe"))
      val clean = survivors
        .join(broadcast(probes),
          col("text").contains(col("probe")) && col("doc_id") =!= col("probe_id"),
          "left_anti")
        .select(col("doc_id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .localCheckpoint(false) // stage 1-3 output: computed once, shared
      val target = when(col("lang") === "en", lit(0.4)).otherwise(lit(0.15))
      val wAll = Window.partitionBy() // 5 rows: one per language
      val quotas = clean.groupBy("lang").agg(count(lit(1)).cast("double").as("c"))
        .withColumn("p", target)
        .withColumn("n_keep", floor(col("p") * min(col("c") / col("p")).over(wAll)))
        .select("lang", "n_keep")
      val byHash = Window.partitionBy("lang")
        .orderBy(SampleOps.knuth32(col("doc_id")), col("doc_id"))
      val sampled = clean.withColumn("rk", row_number().over(byHash))
        .join(broadcast(quotas), "lang")
        .filter(col("rk") <= col("n_keep"))
        .select("doc_id", "n_tokens")
      PackOps.packCounted(sampled, "doc_id", "n_tokens", 8, 512)
    }),

    "pipe1_clean_corpus" -> ((s, dir) => {
      // the composed training-data cleaning pipeline: quality features →
      // language filter → threshold filter → exact dedup (keep min id) —
      // the end-to-end shape the individual txt*/dd* operators exist for
      val featured = TextOps.withQualityFeatures(t(s, dir, "documents"), "text")
        .withColumn("lang_guess", TextOps.languageId(col("text")))
      val kept = featured.filter(
        col("lang_guess") === "en" && col("n_tokens") >= 20 && col("stopword_ratio") >= 0.05)
      DedupOps.exactDedup(kept, "doc_id", Seq("text"))
        .select(col("doc_id").as("keep_doc_id"), col("n_copies"))
    }),

    "txt12_edit_distance" -> ((s, dir) => {
      // exact edit-distance VERIFICATION of near-dup candidates — the
      // standard second stage after shingle-based candidate generation:
      // O(len²) Levenshtein is unaffordable corpus-wide but fine on the
      // bounded candidate pair set; both the codegen'd levenshtein and
      // the join-texts-back shape are what a production verifier runs
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L))
      pairs
        .join(docs.select(col("doc_id").as("doc_a"), col("text").as("text_a")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("text").as("text_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_distance"),
          round(lit(1.0) - levenshtein(col("text_a"), col("text_b")).cast("double") /
            greatest(length(col("text_a")), length(col("text_b"))), 4).as("edit_similarity"))
    }),

    "txt13_chunking" -> ((s, dir) => {
      // context-window chunking for training pipelines: overlapping
      // token windows (size 32, stride 24), one output row per chunk —
      // a narrow explode whose fan-out is bounded by n_tokens/stride,
      // no shuffle
      val toks = TextOps.tokens(col("text"))
      val starts = sequence(lit(1), size(toks), lit(24))
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(transform(starts, i => slice(toks, i, lit(32)))))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          array_join(col("col"), " ").as("chunk_text"),
          size(col("col")).cast("long").as("chunk_tokens"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "pipe2_quality_filter" -> // txt2 + txt10 + txt11 formulations composed
      // under one gate, same thresholds
      ("""WITH t AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS toks, string_split(text, '') AS chars FROM documents
         |), f AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
         |    CASE WHEN len(toks) - 2 >= 1 THEN
         |      round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
         |          i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
         |        / CAST(len(toks) - 2 AS DOUBLE), 4)
         |    ELSE NULL END AS dup3_frac,
         |    CASE WHEN length(text) >= 1 THEN
         |      round(-list_sum(list_transform(list_distinct(chars),
         |        ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
         |              * ln(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars)))), 4)
         |    ELSE NULL END AS char_entropy
         |  FROM t
         |)
         |SELECT * FROM f
         |WHERE n_tokens >= 25 AND stopword_ratio >= 0.05
         |  AND dup3_frac <= 0.05 AND char_entropy >= 2.8""").stripMargin,

    "txt5_string_funcs" ->
      ("SELECT p_partkey, upper(p_name) AS name_upper, substring(p_name, 1, 5) AS name_prefix, " +
        "concat_ws('/', p_brand, p_type) AS brand_type, " +
        "regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels, " +
        "CAST(strpos(p_name, 'widget') AS BIGINT) AS widget_pos, " +
        "CAST(length(p_name) AS BIGINT) AS name_len FROM part"),

    "txt6_bpe_tokens" ->
      ("SELECT doc_id, CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) " +
        "AS n_bpe_tokens FROM documents"),

    "txt1_token_count" ->
      ("SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(length(text) AS BIGINT) AS n_chars_computed FROM documents"),

    "txt2_quality" ->
      ("""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 4) AS mean_token_len,
         |  round(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio
         |FROM documents""").stripMargin,

    "txt3_langid" ->
      ("""WITH hits AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'and', 'of', 'to', 'a', 'in', 'is'))) AS en_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('der', 'die', 'und', 'das', 'ist', 'ein'))) AS de_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('el', 'la', 'de', 'que', 'y', 'es'))) AS es_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('le', 'la', 'et', 'les', 'des', 'est'))) AS fr_h
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CASE WHEN greatest(en_h, de_h, es_h, fr_h) = 0 THEN 'und'
         |       WHEN en_h = greatest(en_h, de_h, es_h, fr_h) THEN 'en'
         |       WHEN de_h = greatest(en_h, de_h, es_h, fr_h) THEN 'de'
         |       WHEN es_h = greatest(en_h, de_h, es_h, fr_h) THEN 'es'
         |       ELSE 'fr' END AS lang_guess
         |FROM hits""").stripMargin,

    "txt4_fingerprint" ->
      "SELECT doc_id, md5(text) AS content_md5 FROM documents",

    "txt7_rolling_fingerprint" -> // Horner's rule over code points, mod 1e9+7
      ("SELECT doc_id, list_reduce(" +
        "list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))), " +
        "(acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_hash FROM documents"),

    "txt10_repetition" -> // same 3-gram construction as dd2's shingle CTE
      ("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         |SELECT doc_id,
         |  CASE WHEN len(toks) - 2 >= 1 THEN
         |    round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
         |        i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
         |      / CAST(len(toks) - 2 AS DOUBLE), 4)
         |  ELSE NULL END AS dup3_frac
         |FROM t""").stripMargin,

    "txt11_char_entropy" -> // same first-occurrence-ordered histogram fold;
      // round(4) absorbs any reassociation-level fp difference in the sum
      ("""WITH c AS (SELECT doc_id, text, string_split(text, '') AS chars FROM documents)
         |SELECT doc_id,
         |  CASE WHEN length(text) >= 1 THEN
         |    round(-list_sum(list_transform(list_distinct(chars),
         |      ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
         |            * ln(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars)))), 4)
         |  ELSE NULL END AS char_entropy
         |FROM c""").stripMargin,

    "txt8_redact_pii" -> // same planted PII, same stacked regex (RE2 needs
      // the explicit 'g' flag to match Spark's replace-all semantics)
      ("""WITH dirty AS (
         |  SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |    '@example.com ref ' || CAST(doc_id * 10000 + 1234 AS VARCHAR) AS dirty
         |  FROM documents
         |)
         |SELECT doc_id,
         |  regexp_replace(
         |    regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\d{4,}', '<NUM>', 'g') AS clean,
         |  CAST(length(regexp_replace(
         |    regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\d{4,}', '<NUM>', 'g')) AS BIGINT) AS clean_len
         |FROM dirty""").stripMargin,

    "txt9_tfidf" ->
      ("""WITH terms AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
         |), tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
         |), dfq AS (
         |  SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1
         |), tot AS (
         |  SELECT count(*) AS n_docs FROM documents
         |)
         |SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
         |  round(tf.tf * ln(CAST(tot.n_docs + 1 AS DOUBLE) / CAST(dfq.df + 1 AS DOUBLE)), 4) AS tfidf
         |FROM tf JOIN dfq USING (term) CROSS JOIN tot""").stripMargin,

    "smp5_dsir_select" -> // hashed-unigram DSIR replayed: bucket = first
      // 3 md5 nibbles (strpos arithmetic — DuckDB has no conv()), target
      // and raw bucket models with add-one smoothing over 4096 buckets,
      // per-token term join, exact DECIMAL sum, deterministic top-100
      ("""WITH toks AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
         |), feats AS (
         |  SELECT doc_id, lang,
         |         (strpos('0123456789abcdef', substring(md5(w), 1, 1)) - 1) * 256
         |       + (strpos('0123456789abcdef', substring(md5(w), 2, 1)) - 1) * 16
         |       + (strpos('0123456789abcdef', substring(md5(w), 3, 1)) - 1) AS b
         |  FROM toks
         |), cr AS (
         |  SELECT b, count(*) AS cr FROM feats GROUP BY 1
         |), ct AS (
         |  SELECT b, count(*) AS ct FROM feats WHERE lang = 'en' GROUP BY 1
         |), nr AS (
         |  SELECT count(*) AS nr FROM feats
         |), nt AS (
         |  SELECT count(*) AS nt FROM feats WHERE lang = 'en'
         |), term AS (
         |  SELECT cr.b,
         |         round(ln(CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) / (nt.nt + 4096))
         |             - ln(CAST(cr.cr + 1 AS DOUBLE) / (nr.nr + 4096)), 6) AS term
         |  FROM cr LEFT JOIN ct USING (b) CROSS JOIN nr CROSS JOIN nt
         |)
         |SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |       CAST(sum(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS logw
         |FROM feats f JOIN term USING (b)
         |GROUP BY f.doc_id
         |ORDER BY logw DESC, f.doc_id
         |LIMIT 100""").stripMargin,

    "txt17_bpe_segment" -> // the final vocab state of the same replayed
      // rounds, rendered as dot-joined subwords
      bpeSegmentSql(8),

    "txt18_wordpiece_learn" -> wordpieceSql(8),

    "txt20_unigram_learn" -> unigramSql(2),

    "txt21_unigram_segment" -> unigramSegmentSql(2),

    "smp6_temperature_mixture" -> // the T=0.5 quota derivation replayed:
      // IEEE sqrt, round-6 weights summed as exact DECIMAL (float
      // addition of the weights would be order-dependent), the same
      // left-assoc double expression, Knuth-hash ranks
      ("""WITH counts AS (
         |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY 1
         |), w AS (
         |  SELECT lang, c, CAST(round(sqrt(c), 6) AS DECIMAL(18,6)) AS w FROM counts
         |), q AS (
         |  SELECT lang,
         |         CAST(least(c, floor(0.5 * (SELECT sum(c) FROM w) * CAST(w AS DOUBLE)
         |              / CAST((SELECT sum(w) FROM w) AS DOUBLE))) AS BIGINT) AS n_keep
         |  FROM w
         |), ranked AS (
         |  SELECT doc_id, lang,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296, doc_id) AS rk
         |  FROM documents
         |)
         |SELECT r.doc_id, r.lang
         |FROM ranked r JOIN q USING (lang) WHERE r.rk <= q.n_keep""").stripMargin,

    "txt24_textrank" -> textrankSql(3),

    "txt23_pmi" -> // doc-level pair counts, word doc-frequencies, one
      // 6dp-ln per pair — the same double expression text both engines
      // evaluate: CAST(cxy AS DOUBLE) * n / (c1 * c2)
      """WITH dw AS MATERIALIZED (
        |  SELECT DISTINCT did, w FROM (
        |    SELECT doc_id AS did, unnest(string_split(text, ' ')) AS w
        |    FROM documents)
        |), cw AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cw FROM dw GROUP BY 1
        |), nn AS (
        |  SELECT CAST(count(DISTINCT did) AS BIGINT) AS n FROM dw
        |), pairs AS (
        |  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS cxy
        |  FROM dw a JOIN dw b ON a.did = b.did AND a.w < b.w
        |  GROUP BY 1, 2 HAVING count(*) >= 5
        |)
        |SELECT p.w1, p.w2, p.cxy,
        |       CAST(round(ln(CAST(p.cxy AS DOUBLE) * nn.n / (c1.cw * c2.cw)) * 1000000) AS BIGINT) AS pmi_micro
        |FROM pairs p
        |JOIN cw c1 ON c1.w = p.w1
        |JOIN cw c2 ON c2.w = p.w2, nn
        |ORDER BY pmi_micro DESC, w1, w2 LIMIT 20""".stripMargin,

    "txt16_bpe_learn" -> // all 8 learned merges replayed round by round
      // (pair counts weighted by word frequency, lexicographic
      // tie-break, greedy left-to-right merge via replace)
      bpeSql(8),

    "txt15_lm_nll" -> // the whole self-trained LM replayed: bigram counts
      // c2, context counts c1 (all corpus occurrences of the context
      // token), vocabulary V, add-one smoothing, per-term round(…,6) into
      // an exact DECIMAL sum. Docs with < 2 tokens have no bigrams and
      // are absent on both sides
      ("""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, unnest(range(1, len(toks))) AS i, toks FROM w
         |), big AS (
         |  SELECT doc_id, toks[i] AS w1, array_to_string(toks[i:i+1], ' ') AS bg FROM g
         |), c2 AS (
         |  SELECT bg, count(*) AS c2 FROM big GROUP BY 1
         |), c1 AS (
         |  SELECT tok AS w, count(*) AS c1
         |  FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY 1
         |), voc AS (
         |  SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM w)
         |)
         |SELECT big.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       CAST(sum(CAST(round(-ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + voc.v)), 6)
         |                     AS DECIMAL(18,6))) AS DOUBLE) AS nll
         |FROM big JOIN c2 USING (bg) JOIN c1 ON big.w1 = c1.w CROSS JOIN voc
         |GROUP BY big.doc_id""").stripMargin,

    "txt22_kneser_ney" -> // the full interpolated-KN replay: counts,
      // continuation counts, the guarded CASE cascade, and the pinned
      // probability expression text shared with the engine
      ("""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |         (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 % 100 < 80 AS is_train
         |  FROM documents
         |), tr AS (
         |  SELECT toks FROM w WHERE is_train
         |), uni AS (
         |  SELECT unnest(toks) AS tok FROM tr
         |), big AS (
         |  SELECT toks[i] AS b1, toks[i+1] AS b2
         |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tr)
         |), trg AS (
         |  SELECT toks[i] AS t1, toks[i+1] AS t2, toks[i+2] AS t3
         |  FROM (SELECT toks, unnest(range(1, len(toks) - 1)) AS i FROM tr)
         |), c3 AS (SELECT t1, t2, t3, count(*) AS c3 FROM trg GROUP BY 1, 2, 3
         |), c2 AS (SELECT b1, b2, count(*) AS c2 FROM big GROUP BY 1, 2
         |), n1mid AS (SELECT t2 AS m2, t3 AS m3, count(*) AS n1mid FROM c3 GROUP BY 1, 2
         |), n1ctx AS (SELECT t2 AS x2, count(*) AS n1ctx FROM c3 GROUP BY 1
         |), n1right AS (SELECT t1 AS r1, t2 AS r2, count(*) AS n1right FROM c3 GROUP BY 1, 2
         |), ntypes AS (SELECT b1 AS y2, count(*) AS ntypes FROM c2 GROUP BY 1
         |), n1luni AS (SELECT b2 AS u3, count(*) AS n1luni FROM c2 GROUP BY 1
         |), tot AS (
         |  SELECT (SELECT count(*) FROM c2) AS n1all,
         |         (SELECT count(DISTINCT tok) FROM uni) AS v
         |), occ AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
         |        FROM w WHERE NOT is_train)
         |), joined AS (
         |  SELECT occ.doc_id, c3.c3, c2.c2, n1mid.n1mid, n1ctx.n1ctx,
         |         n1right.n1right, ntypes.ntypes, n1luni.n1luni, tot.n1all, tot.v
         |  FROM occ
         |  LEFT JOIN c3 ON occ.w1 = c3.t1 AND occ.w2 = c3.t2 AND occ.w3 = c3.t3
         |  LEFT JOIN c2 ON occ.w1 = c2.b1 AND occ.w2 = c2.b2
         |  LEFT JOIN n1mid ON occ.w2 = n1mid.m2 AND occ.w3 = n1mid.m3
         |  LEFT JOIN n1ctx ON occ.w2 = n1ctx.x2
         |  LEFT JOIN n1right ON occ.w1 = n1right.r1 AND occ.w2 = n1right.r2
         |  LEFT JOIN ntypes ON occ.w2 = ntypes.y2
         |  LEFT JOIN n1luni ON occ.w3 = n1luni.u3
         |  CROSS JOIN tot
         |), probs AS (
         |  SELECT doc_id,
         |         CASE WHEN c2 IS NOT NULL AND n1right IS NOT NULL
         |              THEN (greatest(CAST(coalesce(c3, 0) AS DOUBLE) - 0.75E0, 0E0) / CAST(c2 AS DOUBLE))
         |                   + ((0.75E0 * (CAST(n1right AS DOUBLE) / CAST(c2 AS DOUBLE))) * p2)
         |              ELSE p2 END AS p3
         |  FROM (
         |    SELECT *,
         |           CASE WHEN n1ctx IS NOT NULL
         |                THEN (greatest(CAST(coalesce(n1mid, 0) AS DOUBLE) - 0.75E0, 0E0) / CAST(n1ctx AS DOUBLE))
         |                     + ((0.75E0 * (CAST(coalesce(ntypes, 0) AS DOUBLE) / CAST(n1ctx AS DOUBLE))) * p1)
         |                ELSE p1 END AS p2
         |    FROM (SELECT *,
         |                 CAST(coalesce(n1luni, 0) + 1 AS DOUBLE) / CAST(n1all + v + 1 AS DOUBLE) AS p1
         |          FROM joined))
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |       CAST(sum(CAST(round(-ln(p3), 6) AS DECIMAL(18,6))) AS DOUBLE) AS nll
         |FROM probs GROUP BY doc_id""").stripMargin,

    "txt19_trigram_backoff" -> // split, counts, and the three-way
      // backoff CASE replayed; the α·(α·(ratio)) nesting matches the
      // engine's pinned double expression tree
      ("""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |         (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 % 100 < 80 AS is_train
         |  FROM documents
         |), tr AS (
         |  SELECT toks FROM w WHERE is_train
         |), uni AS (
         |  SELECT unnest(toks) AS tok FROM tr
         |), c1 AS (
         |  SELECT tok AS wd, count(*) AS c1 FROM uni GROUP BY 1
         |), nv AS (
         |  SELECT count(*) AS n_tokens, count(DISTINCT tok) AS v FROM uni
         |), c2 AS (
         |  SELECT array_to_string(toks[i:i+1], ' ') AS bg, count(*) AS c2
         |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tr) GROUP BY 1
         |), c3 AS (
         |  SELECT array_to_string(toks[i:i+2], ' ') AS tg, count(*) AS c3
         |  FROM (SELECT toks, unnest(range(1, len(toks) - 1)) AS i FROM tr) GROUP BY 1
         |), occ AS (
         |  SELECT doc_id,
         |         array_to_string(toks[i:i+2], ' ') AS tg,
         |         array_to_string(toks[i:i+1], ' ') AS ctx2,
         |         array_to_string(toks[i+1:i+2], ' ') AS bg23,
         |         toks[i+1] AS w2, toks[i+2] AS w3
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
         |        FROM w WHERE NOT is_train)
         |), scored AS (
         |  SELECT occ.doc_id,
         |         CASE WHEN c3.c3 IS NOT NULL
         |                THEN CAST(c3.c3 AS DOUBLE) / CAST(cx.c2 AS DOUBLE)
         |              WHEN b23.c2 IS NOT NULL
         |                THEN CAST(0.4 AS DOUBLE) * (CAST(b23.c2 AS DOUBLE) / CAST(k2.c1 AS DOUBLE))
         |              ELSE CAST(0.4 AS DOUBLE) * (CAST(0.4 AS DOUBLE) *
         |                (CAST(coalesce(k3.c1, 0) + 1 AS DOUBLE) / CAST(nv.n_tokens + nv.v AS DOUBLE)))
         |         END AS s
         |  FROM occ
         |  LEFT JOIN c3 ON occ.tg = c3.tg
         |  LEFT JOIN c2 cx ON occ.ctx2 = cx.bg
         |  LEFT JOIN c2 b23 ON occ.bg23 = b23.bg
         |  LEFT JOIN c1 k2 ON occ.w2 = k2.wd
         |  LEFT JOIN c1 k3 ON occ.w3 = k3.wd
         |  CROSS JOIN nv
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |       CAST(sum(CAST(round(-ln(s), 6) AS DECIMAL(18,6))) AS DOUBLE) AS nll
         |FROM scored GROUP BY doc_id""").stripMargin,

    "smp1_hash_split" -> // same Knuth multiplicative hash, plain BIGINT ops
      ("""SELECT
         |  CASE WHEN (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 % 100 < 80
         |       THEN 'train' ELSE 'holdout' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1""").stripMargin,

    "smp2_per_group_cap" -> // the heap aggregate answers to the window SQL
      ("""WITH h AS (
         |  SELECT source, doc_id,
         |         (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 AS hv
         |  FROM documents
         |), r AS (
         |  SELECT source, doc_id,
         |         row_number() OVER (PARTITION BY source ORDER BY hv ASC, doc_id ASC) AS rn
         |  FROM h
         |)
         |SELECT source, doc_id FROM r WHERE rn <= 15""").stripMargin,

    "pipe3_full_pipeline" -> // the verified per-stage oracle formulations
      // (pipe2 gate, dd4 recursive closure, ctm1 anti via NOT EXISTS,
      // smp4 quotas, pack2 next-fit walk) chained over each other's output
      ("""WITH RECURSIVE t0 AS (
         |  SELECT doc_id, lang, text, string_split(text, ' ') AS toks, string_split(text, '') AS chars FROM documents
         |), gated AS (
         |  SELECT doc_id, lang, text, toks FROM t0
         |  WHERE CAST(len(toks) AS BIGINT) >= 25
         |    AND round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 4) >= 0.05
         |    AND (CASE WHEN len(toks) - 2 >= 1 THEN
         |      round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
         |          i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
         |        / CAST(len(toks) - 2 AS DOUBLE), 4)
         |    ELSE NULL END) <= 0.05
         |    AND (CASE WHEN length(text) >= 1 THEN
         |      round(-list_sum(list_transform(list_distinct(chars),
         |        ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
         |              * ln(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars)))), 4)
         |    ELSE NULL END) >= 2.8
         |), idx AS (
         |  SELECT doc_id, toks AS t, unnest(range(1, len(toks) - 1)) AS i FROM gated
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT doc_a, doc_b FROM pr
         |  JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |  WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1
         |), edges AS MATERIALIZED (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), reach(src, dst) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
         |), survivors AS (
         |  SELECT g.doc_id, g.lang, g.text, g.toks FROM gated g
         |  WHERE g.doc_id NOT IN (SELECT src FROM reach GROUP BY src HAVING min(dst) < src)
         |), probes AS (
         |  SELECT doc_id AS probe_id, substring(text, 1, 20) AS probe FROM documents WHERE doc_id < 50
         |), clean AS (
         |  SELECT s.doc_id, s.lang, s.toks FROM survivors s
         |  WHERE NOT EXISTS (SELECT 1 FROM probes p WHERE contains(s.text, p.probe) AND s.doc_id <> p.probe_id)
         |), counts AS (
         |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM clean GROUP BY 1
         |), p AS (
         |  SELECT lang, c, CASE lang WHEN 'en' THEN 0.4 ELSE 0.15 END AS p FROM counts
         |), quotas AS (
         |  SELECT lang, floor(p * (SELECT min(c / p) FROM p)) AS n_keep FROM p
         |), ranked AS (
         |  SELECT doc_id, lang, toks,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296, doc_id) AS rk
         |  FROM clean
         |), sampled AS (
         |  SELECT r.doc_id, r.toks FROM ranked r JOIN quotas q USING (lang) WHERE r.rk <= q.n_keep
         |-- MATERIALIZED: the recursive walk below joins tt once per row
         |-- rank; DuckDB inlines plain CTEs into EVERY recursive step, so
         |-- without it each iteration re-evaluates the whole upstream
         |-- pipeline (measured ~85 min at sf0.1; 3.8 s materialized)
         |), tt AS MATERIALIZED (
         |  SELECT doc_id, doc_id % 8 AS shard, CAST(len(toks) AS BIGINT) AS n,
         |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
         |  FROM sampled WHERE len(toks) > 0
         |), walk AS (
         |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT) AS bin_id, n AS fill
         |  FROM tt WHERE rn = 1
         |  UNION ALL
         |  SELECT tt.shard, tt.rn, tt.doc_id, tt.n,
         |         CASE WHEN w.fill + tt.n > 512 THEN w.bin_id + 1 ELSE w.bin_id END,
         |         CASE WHEN w.fill + tt.n > 512 THEN tt.n ELSE w.fill + tt.n END
         |  FROM walk w JOIN tt ON tt.shard = w.shard AND tt.rn = w.rn + 1
         |)
         |SELECT CAST(shard AS BIGINT) AS shard, bin_id, doc_id, n AS n_tokens
         |FROM walk""").stripMargin,

    "pipe1_clean_corpus" -> // txt2's features + txt3's langid + dd1's dedup, composed
      ("""WITH hits AS (
         |  SELECT doc_id, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'and', 'of', 'to', 'a', 'in', 'is'))) AS en_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('der', 'die', 'und', 'das', 'ist', 'ein'))) AS de_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('el', 'la', 'de', 'que', 'y', 'es'))) AS es_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('le', 'la', 'et', 'les', 'des', 'est'))) AS fr_h
         |  FROM documents
         |), kept AS (
         |  SELECT doc_id, text FROM hits
         |  WHERE greatest(en_h, de_h, es_h, fr_h) > 0 AND en_h = greatest(en_h, de_h, es_h, fr_h)
         |    AND n_tokens >= 20 AND stopword_ratio >= 0.05
         |)
         |SELECT CAST(min(doc_id) AS BIGINT) AS keep_doc_id, CAST(count(*) AS BIGINT) AS n_copies
         |FROM kept GROUP BY text""").stripMargin,

    "txt12_edit_distance" -> // dd2's capped pair CTE + texts joined back +
      // Levenshtein (identical edit-distance definition both engines)
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT doc_a, doc_b FROM pr
         |  JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |  WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1
         |)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
         |  round(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE) /
         |        greatest(length(da.text), length(db.text)), 4) AS edit_similarity
         |FROM pairs p
         |JOIN documents da ON p.doc_a = da.doc_id
         |JOIN documents db ON p.doc_b = db.doc_id""").stripMargin,

    "txt13_chunking" -> // same 32-token windows at stride 24; DuckDB list
      // slicing is inclusive and truncates at the list end, like slice()
      ("""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), c AS (
         |  SELECT doc_id, unnest(range(1, len(toks) + 1, 24)) AS start, toks FROM t
         |)
         |SELECT doc_id,
         |  CAST((start - 1) // 24 AS BIGINT) AS chunk_idx,
         |  array_to_string(toks[start:start+31], ' ') AS chunk_text,
         |  CAST(len(toks[start:start+31]) AS BIGINT) AS chunk_tokens
         |FROM c""").stripMargin,

    "smp3_stratified_sample" -> // smp1's Knuth hash, per-stratum rates
      ("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |WHERE (((o_orderkey % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 % 100 <
         |      CASE o_orderstatus WHEN 'F' THEN 10 WHEN 'O' THEN 50 ELSE 100 END""").stripMargin,

    "smp4_target_mixture" -> // same double arithmetic order both sides:
      // T = min(c/p), quota = floor(p*T); smp1's Knuth hash ranks rows
      ("""WITH counts AS (
         |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY 1
         |), p AS (
         |  SELECT lang, c, CASE lang WHEN 'en' THEN 0.4 ELSE 0.15 END AS p FROM counts
         |), quotas AS (
         |  SELECT lang, floor(p * (SELECT min(c / p) FROM p)) AS n_keep FROM p
         |), ranked AS (
         |  SELECT doc_id, lang,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296, doc_id) AS rk
         |  FROM documents
         |)
         |SELECT r.doc_id, r.lang
         |FROM ranked r JOIN quotas q USING (lang) WHERE r.rk <= q.n_keep""").stripMargin,

    "txt14_normalize" -> // DuckDB regexp_replace needs the 'g' flag for
      // replace-all (Spark's default)
      ("""SELECT event_id,
         |  trim(regexp_replace(regexp_replace(lower(props), '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g')) AS norm
         |FROM events""").stripMargin,

    "pack1_sequence_packing" -> // same shard/order/offset arithmetic; DuckDB
      // `//` is floor division on BIGINT, matching Spark's `DIV` for the
      // non-negative offsets here
      ("""WITH t AS (
         |  SELECT doc_id, doc_id % 8 AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) > 0
         |), c AS (
         |  SELECT doc_id, shard, n,
         |         CAST(sum(n) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS e
         |  FROM t
         |), s AS (
         |  SELECT doc_id, shard, n, e - n AS b, e FROM c
         |)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |       CAST(blk AS BIGINT) AS block_id,
         |       doc_id,
         |       CAST(least(e, (blk + 1) * 512) - greatest(b, blk * 512) AS BIGINT) AS tokens_in_block
         |FROM s, UNNEST(generate_series(b // 512, (e - 1) // 512)) AS u(blk)""").stripMargin,

    "pack2_document_packing" -> // the next-fit recurrence as a recursive
      // CTE: all shards walk in parallel rows, rn joins each step to the
      // next document in the shard
      // t is MATERIALIZED: DuckDB inlines plain CTEs into EVERY
      // iteration of a recursive CTE, re-tokenizing the corpus per row
      // rank (the pipe3 lesson — same fix)
      ("""WITH RECURSIVE t AS MATERIALIZED (
         |  SELECT doc_id, doc_id % 8 AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
         |  FROM documents WHERE len(string_split(text, ' ')) > 0
         |), walk AS (
         |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT) AS bin_id, n AS fill
         |  FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.shard, t.rn, t.doc_id, t.n,
         |         CASE WHEN w.fill + t.n > 512 THEN w.bin_id + 1 ELSE w.bin_id END,
         |         CASE WHEN w.fill + t.n > 512 THEN t.n ELSE w.fill + t.n END
         |  FROM walk w JOIN t ON t.shard = w.shard AND t.rn = w.rn + 1
         |)
         |SELECT CAST(shard AS BIGINT) AS shard, bin_id, doc_id, n AS n_tokens
         |FROM walk""").stripMargin
  )
}
