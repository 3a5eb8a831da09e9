package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{ClassifyOps, ContaminationOps, DedupOps, EventOps, LakeOps, PackOps, QuantizeOps, SampleOps, SimilarityOps, TextOps}
import graft.EntryHelpers._

/** Driver-contract keys — deduplication family: exact, n-gram Jaccard, MinHash/SimHash, cross-corpus, incremental, contamination screening.
  *
  * Mechanically split out of SparkEntry (round 15) with ZERO behavior
  * change: entries are verbatim; [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] concatenate the families. Shared helper
  * builders live in [[EntryHelpers]].
  */
private[graft] object DedupKeys {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd5_passage_dup" -> ((s, dir) => {
      // cross-document boilerplate score: fraction of a document's
      // 8-token passages that appear verbatim in at least one OTHER
      // document (near-exact dups score 1.0). Shape: ONE corpus scan +
      // bounded explode (fan-out = tokens/8), then a (doc, passage)
      // aggregate whose rows flow through a passage-partitioned window
      // (distinct-doc count, no self-join — a join back onto the explode
      // would re-scan and re-tokenize the corpus) into the per-doc
      // aggregate; exchanges carry (passage, doc_id, k) rows only
      val passages = t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) > 0)
        .select(col("doc_id"), col("ts"),
          explode(sequence(lit(1L),
            ceil(size(col("ts")).cast("double") / 8.0).cast("long"))).as("i"))
        .select(col("doc_id"),
          concat_ws(" ", slice(col("ts"), ((col("i") - 1) * 8 + 1).cast("int"), lit(8)))
            .as("passage"))
      val perDoc = passages.groupBy("doc_id", "passage")
        .agg(count(lit(1)).as("k")) // a doc may repeat a passage internally
      val nd = count(lit(1)).over(Window.partitionBy("passage")) // rows = distinct docs
      perDoc.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(sum("k").cast("long").as("n_passages"),
          round(sum(when(col("nd") >= 2, col("k")).otherwise(lit(0L))).cast("double") /
            sum("k"), 4).as("dup_frac"))
    }),

    "dd9_semdedup" -> ((s, dir) =>
      // SemDeDup (Abbas et al. 2023): semantic clusters bound the
      // quadratic near-dup comparison — nearest-SEED assignment against
      // ~sqrt(N) hash-thresholded seeds (O(N^1.5) total across both
      // stages, sqrt(N)-row broadcast) + within-cluster cosine ≥ 0.4
      // pairs, greedy min-id retention. Per-cluster audit summary is
      // the face; the whole pipeline, clustering included, replays in
      // the oracle (no k-means goldens needed).
      SimilarityOps.semanticDedupSummary(
        t(s, dir, "embeddings"), "vec_id", "embedding", minCosine = 0.4)),

    "ctm1_contamination" -> ((s, dir) => {
      // benchmark-contamination screen: which corpus docs contain any
      // probe string (here: 20-char prefixes of a 50-doc probe set).
      // The probe set broadcasts (bounded by construction — eval suites
      // are small); the scan side stays narrow; contains() is codegen'd.
      // This broadcast nested-loop shape is the exact-match BASELINE;
      // ctm2_bloom_screen is the production path — probe n-grams in a
      // Bloom filter, per-row cost independent of |probes|
      val docs = t(s, dir, "documents")
      val probes = docs.filter(col("doc_id") < 50)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 20).as("probe"))
      docs.join(broadcast(probes),
          col("text").contains(col("probe")) && col("doc_id") =!= col("probe_id"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_probe_hits"), min("probe_id").as("first_probe"))
    }),

    "ctm2_bloom_screen" -> ((s, dir) => {
      // the Bloom upgrade ctm1's comment promises: probe 20-grams go into
      // a Bloom filter built by a distributed aggregate; the corpus is
      // prefiltered by an O(len) sliding-window membership test that does
      // not scale with |probes|; exact contains() verification on the few
      // candidates kills false positives — same deterministic answer as
      // the exact formulation, same oracle shape. Probes are fixed-length
      // (length(text) >= 20 guard), the real decontamination contract.
      val docs = t(s, dir, "documents")
      val probes = docs.filter(col("doc_id") < 50 && length(col("text")) >= 20)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 20).as("probe"))
      ContaminationOps.bloomScreen(docs, "doc_id", "text",
        probes, "probe_id", "probe", probeLen = 20)
    }),

    "ctm3_incremental_screen" -> ((s, dir) => {
      // the INCREMENTALLY-MAINTAINED decontamination screen: the eval
      // suite is an append-only manifest table; each window ORs the
      // batch's Bloom words into a single-row sketch mart in
      // O(batch + registers) — never re-sketching the whole benchmark
      // set — with the consumed-version cursor riding the same atomic
      // commit. Pins: after three windows the stored words are
      // BITWISE-identical to the from-scratch filter (the OR-fold is
      // associative/commutative/idempotent); a replay call is a no-op;
      // the screen itself (prefilter + exact verify join at the
      // cursor's probe snapshot) equals ctm2's exact answer, which is
      // how the oracle replays it.
      val docs = t(s, dir, "documents")
      val probes = docs.filter(col("doc_id") < 50 && length(col("text")) >= 20)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 20).as("probe"))
      val pRoot = java.nio.file.Files.createTempDirectory("ctm3_probes").toString
      val sRoot = java.nio.file.Files.createTempDirectory("ctm3_sketch").toString
      val MT = graft.sources.ManifestTable
      def slice(i: Int) = probes.filter(pmod(col("probe_id"), lit(3)) === i)
      def maintain() = graft.ops.LakeOps.maintainContaminationSketch(
        s, pRoot, sRoot, "probe")
      MT.create(s, pRoot, slice(0))
      maintain() // bootstrap
      MT.append(s, pRoot, slice(1))
      maintain()
      MT.append(s, pRoot, slice(2))
      val (c2, _) = maintain()
      val replayNoop = maintain() == ((c2, 0L))
      graft.functions.NativeExpressions.register(s)
      // sketch-sized driver compares (1024 longs), the agg9/hh3 class
      val scratch = probes.agg(expr("graft_bloom_build(probe, 65536, 5)")
        .as("words")).collect()(0).getSeq[Long](0)
      val stored = MT.read(s, sRoot).collect()(0).getSeq[Long](0)
      val bitExact = stored == scratch
      graft.ops.LakeOps.screenWithContaminationSketch(
          s, sRoot, pRoot, docs, "doc_id", "text", "probe_id", "probe", probeLen = 20)
        .select(lit(bitExact).as("sketch_bit_exact"),
          lit(replayNoop).as("replay_noop"),
          col("doc_id"), col("n_probe_hits"), col("first_probe"))
    }),

    // ---- dedup ----,

    "dd1_exact_dedup" -> ((s, dir) =>
      DedupOps.exactDedup(t(s, dir, "documents"), "doc_id", Seq("text"))
        .select(col("doc_id").as("keep_doc_id"), col("n_copies"))),

    "dd2_ngram_jaccard" -> ((s, dir) =>
      // maxShingleFreq bounds the per-shingle doc-list buffer (and the
      // C(k,2) pair fan-out): without it one degenerate stop-shingle
      // OOMs an executor at scale. 20 is active at sf0.1 (max df 25)
      // and a semantic no-op at smaller SFs (max df 9)
      DedupOps.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L))),

    "dd10_incremental_neardup" -> ((s, dir) => {
      // INCREMENTAL cross-batch near-dup discovery ("dedup the daily
      // crawl against the corpus without re-scanning the corpus"): a
      // shingle index mart (range-clustered + stats on shingle, so the
      // probe reads only overlapping buckets) and a pairs mart are
      // maintained over an append-only docs table; each window adds
      // new⋈old pairs (index probe) and new⋈new pairs (batch only) —
      // pair statistics are pair-local under the uncapped contract, so
      // the pairs mart is append-only IVM. Pins: after three windows
      // the mart equals the from-scratch uncapped ngramJaccardPairs
      // bit-exactly; a replay call is a no-op; window-2's doc count is
      // a literal mirror the oracle re-derives. Face: the pairs mart,
      // replayed relationally by DuckDB over the whole corpus.
      val docsR = java.nio.file.Files.createTempDirectory("dd10_docs").toString
      val idxR = java.nio.file.Files.createTempDirectory("dd10_idx").toString
      val pairsR = java.nio.file.Files.createTempDirectory("dd10_pairs").toString
      val docs = t(s, dir, "documents")
      val MT = graft.sources.ManifestTable
      def slice(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === i)
      def maintain() = graft.ops.LakeOps.maintainNearDupPairs(
        s, docsR, idxR, pairsR, "doc_id", "text")
      MT.create(s, docsR, slice(0))
      maintain() // bootstrap
      MT.append(s, docsR, slice(1))
      maintain()
      MT.append(s, docsR, slice(2))
      val (c2, d2, _) = maintain()
      val replayNoop = maintain() == ((c2, 0L, 0L))
      val scratch = DedupOps.ngramJaccardPairs(MT.read(s, docsR), "doc_id", "text",
        n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = None)
      val m = MT.read(s, pairsR)
      val matches = multisetEqual(m, scratch)
      m.select(lit(matches).as("matches_scratch"), lit(replayNoop).as("replay_noop"),
        lit(d2).as("window2_docs"),
        col("doc_a"), col("doc_b"), col("shared_shingles"), col("jaccard"))
    }),

    "dd11_incremental_neardup_capped" -> ((s, dir) => {
      // the CAPPED contract maintained incrementally — the variant a
      // production corpus runs (dd10's uncapped output is quadratic in
      // hot-shingle df; the cap bounds it, but a shingle CROSSING the
      // cap as the corpus grows retracts pairs and shrinks sizes, which
      // append-only IVM cannot express). maintainNearDupPairsCapped
      // does the semi-join-restricted recompute over crosser
      // neighborhoods with a pairs/sizes/index watermark ladder. Pins:
      // after three windows the mart equals the from-scratch CAPPED
      // ngramJaccardPairs; a replay call is a no-op; the number of
      // shingles that crossed the cap after window 1 is a literal the
      // oracle re-derives (at sf0.1 the cap is active and crossings are
      // plentiful; the equality holds at every SF either way). Face:
      // the pairs mart, replayed relationally by DuckDB with the same
      // cap over the whole corpus.
      val docsR = java.nio.file.Files.createTempDirectory("dd11_docs").toString
      val idxR = java.nio.file.Files.createTempDirectory("dd11_idx").toString
      val szR = java.nio.file.Files.createTempDirectory("dd11_sz").toString
      val pairsR = java.nio.file.Files.createTempDirectory("dd11_pairs").toString
      val docs = t(s, dir, "documents")
      val MT = graft.sources.ManifestTable
      val cap = 5L
      def slice(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === i)
      def maintain() = graft.ops.LakeOps.maintainNearDupPairsCapped(
        s, docsR, idxR, szR, pairsR, "doc_id", "text", maxShingleFreq = cap)
      MT.create(s, docsR, slice(0))
      maintain() // bootstrap
      MT.append(s, docsR, slice(1))
      maintain()
      MT.append(s, docsR, slice(2))
      val (c2, _, _) = maintain()
      val replayNoop = maintain() == ((c2, 0L, 0L))
      val scratch = DedupOps.ngramJaccardPairs(MT.read(s, docsR), "doc_id", "text",
        n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(cap))
      val m = MT.read(s, pairsR).drop("pair_key")
      val matches = multisetEqual(m, scratch)
      // crossing witness: shingles under the cap over windows 0+1 that
      // the full corpus pushed over it — the retraction-triggering set
      val ex = docs.select(col("doc_id"),
        explode(DedupOps.shingles(col("text"), 3)).as("shingle"))
      val crossed = ex.groupBy("shingle")
        .agg(count(lit(1)).as("df_all"),
          count(when(pmod(col("doc_id"), lit(3)) < 2, lit(1))).as("df_w1"))
        .filter(col("df_all") > cap && col("df_w1") <= cap)
        .count()
      m.select(lit(matches).as("matches_scratch"), lit(replayNoop).as("replay_noop"),
        lit(crossed).as("crossed_after_w1"),
        col("doc_a"), col("doc_b"), col("shared_shingles"), col("jaccard"))
    }),

    "dd6_cross_corpus" -> ((s, dir) => {
      // benchmark decontamination at the NEAR-DUP tier (ctm1/ctm2 are the
      // exact-containment tier): corpus docs near-dupping any probe doc.
      // Probe set = doc_id % 37 == 0 (a deterministic stand-in benchmark
      // suite), corpus = the rest — disjoint, so every pair is a genuine
      // cross-corpus hit. Jaccard uses FULL shingle-set sizes on both
      // sides (the cap only bounds which shingles may generate pairs) —
      // mirrored in the oracle.
      val docs = t(s, dir, "documents")
      DedupOps.crossCorpusNearDupPairs(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 3, minShared = 2L, minJaccard = 0.1,
        maxCorpusShingleFreq = 20L)
    }),

    "dd8_prefix_jaccard" -> ((s, dir) =>
      // the PPJoin-family prefix-filtered similarity join at t=0.9 (the
      // family's design regime — near-duplicate detection; prefixes are
      // ~a tenth of each set): result-identical to the exact all-pairs
      // join, which is how the oracle computes it (threshold unrounded)
      DedupOps.prefixJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.9)),

    "dd7_span_excision" -> ((s, dir) =>
      // sub-document dedup (Lee et al. 2021 ExactSubstr, word-8-gram
      // granularity): every position whose 8-gram recurs ANYWHERE in the
      // corpus is duplicated; overlapping marks merge to maximal spans.
      // The profile is integer-exact (span count, tokens inside spans,
      // survivors) and the oracle replays the whole pipeline — gram
      // hashing, duplicate detection, interval merge — in SQL. The
      // excised TEXT itself is spec-checked (DedupOpsSpec) on fixtures
      // where the span structure is hand-computable.
      DedupOps.duplicateSpanProfile(t(s, dir, "documents"), "doc_id", "text", n = 8)),

    "dd3_neardup_survivors" -> ((s, dir) => {
      // the terminal dedup deliverable: the KEPT document set after
      // dropping greater-id members of each near-dup pair
      val docs = t(s, dir, "documents")
      DedupOps.nearDupSurvivors(docs, "doc_id",
          DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
            n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L)))
        .select(col("doc_id"))
    }),

    "dd4_cc_survivors" -> ((s, dir) => {
      // cluster-aware retention: connected components over the dd2 pair
      // graph (large-star/small-star), keep the min id per component —
      // fixes dd3's greedy over-drop on transitive chains
      val docs = t(s, dir, "documents")
      DedupOps.ccSurvivors(docs, "doc_id",
          DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
            n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L)))
        .select(col("doc_id"))
    }),

    "mh1_minhash_neardup" -> ((s, dir) => {
      // under the oracle via the ann3 recipe: the banded-LSH pair SET is
      // deterministic given the pinned seed (per-SF golden identities,
      // with est_jaccard a golden alongside — the affine-hash RNG is not
      // SQL-expressible), and the exact-verification stage appends a
      // jaccard the oracle RE-DERIVES from raw text (dd2's formula), so
      // a golden pair that stopped being similar in the data fails loudly
      val docs = t(s, dir, "documents")
      DedupOps.exactJaccardFor(
        DedupOps.minHashNearDupPairs(docs, "doc_id", "text",
          numHashes = 64, bands = 16, minEstJaccard = 0.4),
        docs, "doc_id", "text", n = 3)
    }),

    "sh1_simhash_neardup" -> ((s, dir) => {
      // same oracle recipe as mh1: golden pair identities + hamming (the
      // simhash kernel is not SQL-expressible), exact jaccard re-derived
      // by the oracle from raw text
      val docs = t(s, dir, "documents")
      DedupOps.exactJaccardFor(
        DedupOps.simHashNearDupPairs(docs, "doc_id", "text", maxHamming = 3),
        docs, "doc_id", "text", n = 3)
    }),

    "mh2_minhash_gate" -> ((s, dir) => {
      // ann4's gate pattern for the MinHash family: precision/recall of
      // mh1's banded candidates against the EXACT 3-gram jaccard pair
      // set at the same 0.4 threshold, computed in-query. n_exact
      // re-derives in the oracle's SQL; the candidate/true-positive
      // counts and P/R are per-SF measured goldens (the affine-hash RNG
      // is not SQL-expressible) — a determinism/regression gate over the
      // whole signature→band→candidate pipeline
      val docs = t(s, dir, "documents")
      val mh = DedupOps.minHashNearDupPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, minEstJaccard = 0.4)
      // ground truth uses the SHIPPED dd2 definition (stop-shingle cap
      // 20): the uncapped exact side re-creates the quadratic stop-
      // shingle fan-out the cap exists to prevent
      val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minShared = 1L, minJaccard = 0.4, maxShingleFreq = Some(20L))
      val nEx = exact.agg(count(lit(1)).cast("long").as("n_exact"))
      val nMh = mh.agg(count(lit(1)).cast("long").as("n_candidates"))
      val nTp = mh.join(exact.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).cast("long").as("n_true_pos"))
      nEx.crossJoin(nMh).crossJoin(nTp).select(
        col("n_exact"), col("n_candidates"), col("n_true_pos"),
        round(col("n_true_pos").cast("double") / col("n_candidates"), 4).as("precision"),
        round(col("n_true_pos").cast("double") / col("n_exact"), 4).as("recall"))
    }),

    "sh2_simhash_gate" -> ((s, dir) => {
      // the SimHash gate: sh1's hamming<=3 candidates vs the exact
      // 2-gram jaccard pair set at 0.5 — same golden scheme as mh2
      val docs = t(s, dir, "documents")
      val sh = DedupOps.simHashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      // SAME canonical near-dup truth as mh2 (capped 3-gram jaccard at
      // 0.4): both sketches chase the same duplicates, so one truth set
      // makes their P/R comparable. (A 2-gram truth was tried and
      // rejected: uncapped it re-creates the quadratic stop-shingle
      // fan-out — measured 46 s at sf0.1 — and capped it stops being a
      // near-dup set at all, since dropping common shingles inflates
      // the jaccard of rare-shingle pairs.)
      val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minShared = 1L, minJaccard = 0.4, maxShingleFreq = Some(20L))
      val nEx = exact.agg(count(lit(1)).cast("long").as("n_exact"))
      val nSh = sh.agg(count(lit(1)).cast("long").as("n_candidates"))
      val nTp = sh.join(exact.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).cast("long").as("n_true_pos"))
      nEx.crossJoin(nSh).crossJoin(nTp).select(
        col("n_exact"), col("n_candidates"), col("n_true_pos"),
        round(col("n_true_pos").cast("double") / col("n_candidates"), 4).as("precision"),
        round(col("n_true_pos").cast("double") / col("n_exact"), 4).as("recall"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "dd9_semdedup" -> // the WHOLE SemDeDup pipeline replayed: ~sqrt(N)
      // Knuth-hash-thresholded seeds (min-id always in), nearest-seed
      // assignment at round-6 cosine with smaller-seed tie-break,
      // within-cluster round-4 cosine pairs, greedy min-id removal
      ("""WITH nn AS (
         |  SELECT count(*) AS n,
         |         greatest(8, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k,
         |         CAST(min(vec_id) AS BIGINT) AS min_id
         |  FROM embeddings
         |), thr AS (
         |  SELECT min_id, CAST(CAST(k AS HUGEINT) * 4294967296 // n AS BIGINT) AS thr FROM nn
         |), e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |), seeds AS (
         |  SELECT vec_id AS seed_id, v AS sv FROM e, thr
         |  WHERE (((vec_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 < thr
         |     OR vec_id = min_id
         |), scored AS (
         |  SELECT e.vec_id, s.seed_id,
         |         round(list_inner_product(e.v, s.sv) /
         |               (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(s.sv, s.sv))), 6) AS sim
         |  FROM e CROSS JOIN seeds s
         |), assign AS (
         |  SELECT vec_id, seed_id AS cluster FROM (
         |    SELECT vec_id, seed_id,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, seed_id) AS rn
         |    FROM scored) WHERE rn = 1
         |), cl AS (
         |  SELECT a.cluster, e.vec_id AS id, e.v FROM assign a JOIN e ON a.vec_id = e.vec_id
         |), pairs AS (
         |  SELECT a.cluster, a.id AS id_a, b.id AS id_b
         |  FROM cl a JOIN cl b ON a.cluster = b.cluster AND a.id < b.id
         |  WHERE round(list_inner_product(a.v, b.v) /
         |        (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 4) >= 0.4
         |), sizes AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS n_vectors FROM cl GROUP BY 1
         |), rem AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS n_dup_pairs,
         |         CAST(count(DISTINCT id_b) AS BIGINT) AS n_removed,
         |         CAST(min(id_b) AS BIGINT) AS min_removed
         |  FROM pairs GROUP BY 1
         |)
         |SELECT s.cluster, s.n_vectors,
         |       coalesce(r.n_dup_pairs, 0) AS n_dup_pairs,
         |       coalesce(r.n_removed, 0) AS n_removed,
         |       r.min_removed
         |FROM sizes s LEFT JOIN rem r ON s.cluster = r.cluster""").stripMargin,

    "ctm1_contamination" ->
      ("""WITH probes AS (
         |  SELECT doc_id AS probe_id, substring(text, 1, 20) AS probe
         |  FROM documents WHERE doc_id < 50
         |)
         |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_probe_hits,
         |       min(p.probe_id) AS first_probe
         |FROM documents d JOIN probes p
         |  ON contains(d.text, p.probe) AND d.doc_id <> p.probe_id
         |GROUP BY 1""").stripMargin,

    "ctm2_bloom_screen" -> // the Bloom pass is false-negative-free and the
      // verify join kills false positives, so the oracle is the same exact
      // join as ctm1 restricted to the fixed-length (>= 20 chars) probes
      ("""WITH probes AS (
         |  SELECT doc_id AS probe_id, substring(text, 1, 20) AS probe
         |  FROM documents WHERE doc_id < 50 AND length(text) >= 20
         |)
         |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_probe_hits,
         |       min(p.probe_id) AS first_probe
         |FROM documents d JOIN probes p
         |  ON contains(d.text, p.probe) AND d.doc_id <> p.probe_id
         |GROUP BY 1""").stripMargin,

    "ctm3_incremental_screen" -> // the maintained sketch's screen equals
      // the exact contamination join over the full probe set (the Bloom
      // tier is false-negative-free; the verify join kills false
      // positives); bit-exactness and replay no-op are pinned in-engine
      ("""WITH probes AS (
         |  SELECT doc_id AS probe_id, substring(text, 1, 20) AS probe
         |  FROM documents WHERE doc_id < 50 AND length(text) >= 20
         |)
         |SELECT TRUE AS sketch_bit_exact, TRUE AS replay_noop,
         |       d.doc_id, CAST(count(*) AS BIGINT) AS n_probe_hits,
         |       min(p.probe_id) AS first_probe
         |FROM documents d JOIN probes p
         |  ON contains(d.text, p.probe) AND d.doc_id <> p.probe_id
         |GROUP BY d.doc_id""").stripMargin,

    "dd1_exact_dedup" ->
      "SELECT CAST(min(doc_id) AS BIGINT) AS keep_doc_id, CAST(count(*) AS BIGINT) AS n_copies FROM documents GROUP BY text",

    "dd6_cross_corpus" -> // the cap is computed on CORPUS document
      // frequency (equal on survivors to the full-corpus df, since a
      // probe semi-join drops whole shingles, never a shingle's docs);
      // jaccard uses full shingle-set sizes on both sides
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), csh AS (
         |  SELECT doc_id AS corpus_id, shingle FROM sh0 WHERE doc_id % 37 <> 0
         |), psh AS (
         |  SELECT doc_id AS probe_id, shingle FROM sh0 WHERE doc_id % 37 = 0
         |), kept AS (
         |  SELECT shingle FROM csh GROUP BY shingle HAVING count(*) <= 20
         |), pr AS (
         |  SELECT corpus_id, probe_id, count(*) AS shared
         |  FROM csh JOIN kept USING (shingle) JOIN psh USING (shingle)
         |  GROUP BY 1, 2
         |), csz AS (
         |  SELECT doc_id AS corpus_id, count(*) AS n_c FROM sh0
         |  WHERE doc_id % 37 <> 0 GROUP BY 1
         |), psz AS (
         |  SELECT doc_id AS probe_id, count(*) AS n_p FROM sh0
         |  WHERE doc_id % 37 = 0 GROUP BY 1
         |)
         |SELECT corpus_id, probe_id, CAST(shared AS BIGINT) AS shared_shingles,
         |       round(CAST(shared AS DOUBLE) / (n_c + n_p - shared), 4) AS jaccard
         |FROM pr JOIN csz USING (corpus_id) JOIN psz USING (probe_id)
         |WHERE shared >= 2
         |  AND CAST(shared AS DOUBLE) / (n_c + n_p - shared) >= 0.1""").stripMargin,

    "dd8_prefix_jaccard" -> // the prefix filter is an OPTIMIZATION with a
      // no-miss theorem, so the oracle is the plain exact all-pairs
      // join: every pair sharing >= 1 shingle with unrounded jaccard
      // >= 0.9 (rounding applied only to the output column)
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b USING (shingle)
         |  WHERE a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared_shingles,
         |       round(CAST(shared AS DOUBLE) / (x.n + y.n - shared), 4) AS jaccard
         |FROM pr JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
         |WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.9""").stripMargin,

    "dd7_span_excision" -> // full relational replay of the span dedup:
      // positions 1..len-7 carry the md5 of their word 8-gram; a hash
      // seen more than once corpus-wide marks [pos, pos+8); marks merge
      // via the running-max interval walk; docs without marks carry zeros
      ("""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, unnest(range(1, greatest(len(toks) - 6, 1))) AS pos, toks FROM w
         |), hashed AS (
         |  SELECT doc_id, pos, md5(array_to_string(toks[pos:pos+7], ' ')) AS h FROM g
         |), dup AS (
         |  SELECT h FROM hashed GROUP BY h HAVING count(*) > 1
         |), marks AS (
         |  SELECT doc_id, pos, pos + 8 AS fin FROM hashed JOIN dup USING (h)
         |), grp AS (
         |  SELECT doc_id, pos, fin,
         |         CASE WHEN pos > max(fin) OVER (PARTITION BY doc_id ORDER BY pos
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |              THEN 1 ELSE 0 END AS brk
         |  FROM marks
         |), spans AS (
         |  SELECT doc_id, min(pos) AS span_start, max(fin) AS span_end
         |  FROM (SELECT doc_id, pos, fin,
         |               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
         |        FROM grp)
         |  GROUP BY doc_id, span_id
         |), per_doc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         |         CAST(sum(span_end - span_start) AS BIGINT) AS dup_tokens
         |  FROM spans GROUP BY doc_id
         |)
         |SELECT w.doc_id, CAST(len(w.toks) AS BIGINT) AS n_tokens,
         |       coalesce(p.n_dup_spans, 0) AS n_dup_spans,
         |       coalesce(p.dup_tokens, 0) AS dup_tokens,
         |       CAST(len(w.toks) AS BIGINT) - coalesce(p.dup_tokens, 0) AS kept_tokens
         |FROM w LEFT JOIN per_doc p USING (doc_id)""").stripMargin,

    "dd2_ngram_jaccard" ->
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
         |)
         |SELECT doc_a, doc_b, CAST(pr.shared AS BIGINT) AS shared_shingles,
         |       round(pr.shared / (sa.n + sb.n - pr.shared), 4) AS jaccard
         |FROM pr JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1""").stripMargin,

    "dd10_incremental_neardup" -> // the incrementally-maintained pairs
      // mart must equal the UNCAPPED n-gram Jaccard pairs over the whole
      // corpus (dd2's SQL without the stop-shingle cap); the maintenance
      // probes (equivalence, replay no-op) are pinned in-engine and
      // window-2's doc count is re-derived from the pmod slicing
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT TRUE AS matches_scratch, TRUE AS replay_noop,
         |       (SELECT CAST(count(*) AS BIGINT) FROM documents
         |        WHERE doc_id % 3 = 2) AS window2_docs,
         |       doc_a, doc_b, CAST(pr.shared AS BIGINT) AS shared_shingles,
         |       round(pr.shared / (sa.n + sb.n - pr.shared), 4) AS jaccard
         |FROM pr JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1""").stripMargin,

    "dd11_incremental_neardup_capped" -> // the incrementally-maintained
      // CAPPED pairs mart must equal dd2's capped SQL at cap 5 over the
      // whole corpus; crossed_after_w1 re-derives the retraction
      // witness (shingles ≤ cap over windows 0+1, > cap over all three)
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 5
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), crossed AS (
         |  SELECT CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT shingle FROM sh0 GROUP BY shingle
         |    HAVING count(*) > 5 AND count(*) FILTER (doc_id % 3 < 2) <= 5
         |  )
         |)
         |SELECT TRUE AS matches_scratch, TRUE AS replay_noop,
         |       (SELECT c FROM crossed) AS crossed_after_w1,
         |       doc_a, doc_b, CAST(pr.shared AS BIGINT) AS shared_shingles,
         |       round(pr.shared / (sa.n + sb.n - pr.shared), 4) AS jaccard
         |FROM pr JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1""").stripMargin,

    "dd3_neardup_survivors" -> // dd2's pair SQL as a CTE, then the anti join
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
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_b FROM pairs)""").stripMargin,

    "dd4_cc_survivors" -> // dd2's pairs, then a recursive transitive
      // closure: a doc is dropped iff it can REACH a smaller doc id in
      // the (bidirected) pair graph — exactly "not the component min"
      ("""WITH RECURSIVE toks AS (
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
         |), edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), reach(src, dst) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
         |)
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (
         |  SELECT src FROM reach GROUP BY src HAVING min(dst) < src)""").stripMargin,

    "mh2_minhash_gate" -> // n_exact re-derives the SHIPPED (capped)
      // 3-gram jaccard pair count; candidate/TP/P/R are per-SF measured
      // goldens (the affine-hash RNG is not SQL-expressible),
      // cpus-invariance verified
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
         |), ex AS (
         |  SELECT count(*) AS n FROM pr
         |  JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |  WHERE round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.4
         |)
         |SELECT CAST(ex.n AS BIGINT) AS n_exact,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 28 WHEN 60000 THEN 25 WHEN 600000 THEN 256 END AS BIGINT) AS n_candidates,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 28 WHEN 60000 THEN 25 WHEN 600000 THEN 256 END AS BIGINT) AS n_true_pos,
         |  CAST(CASE WHEN (SELECT count(*) FROM lineitem) IN (6000, 60000, 600000) THEN 1.0 END AS DOUBLE) AS precision,
         |  CAST(CASE WHEN (SELECT count(*) FROM lineitem) IN (6000, 60000, 600000) THEN 1.0 END AS DOUBLE) AS recall
         |FROM ex""").stripMargin,

    "sh2_simhash_gate" -> // the SAME capped 3-gram truth as mh2 anchors
      // the oracle — one truth set makes the two sketches' P/R comparable
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
         |), ex AS (
         |  SELECT count(*) AS n FROM pr
         |  JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |  WHERE round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.4
         |)
         |SELECT CAST(ex.n AS BIGINT) AS n_exact,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 19 WHEN 60000 THEN 13 WHEN 600000 THEN 112 END AS BIGINT) AS n_candidates,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 19 WHEN 60000 THEN 13 WHEN 600000 THEN 112 END AS BIGINT) AS n_true_pos,
         |  CAST(CASE WHEN (SELECT count(*) FROM lineitem) IN (6000, 60000, 600000) THEN 1.0 END AS DOUBLE) AS precision,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 0.6786 WHEN 60000 THEN 0.52 WHEN 600000 THEN 0.4375 END AS DOUBLE) AS recall
         |FROM ex""").stripMargin,

    "mh1_minhash_neardup" -> // the ann3 recipe for the MinHash-LSH
      // pair set: identities and est_jaccard are per-SF goldens (the
      // affine-hash RNG is not SQL-expressible; the banded pair SET is a
      // deterministic function of data + pinned seed, restart-stable by
      // construction — pure hashing, no sampling), while the exact
      // jaccard of every golden pair is RE-DERIVED from raw text with
      // dd2's proven formula — a pinned pair that stopped being similar
      // fails loudly. An unknown SF yields zero golden rows and fails
      // the rows check. Regenerate with graft.tools.DumpGoldens.
      ("""WITH golden AS (
         |  SELECT * FROM (VALUES
         |    (0,50,0.9375),(0,82,1),(5,450,1),(8,12,0.9844),(8,120,0.9844),(8,360,0.9844),(12,120,0.9844),(12,360,1),
         |    (16,369,1),(26,176,0.9531),(33,436,0.9063),(45,487,0.9688),(50,82,0.9375),(56,157,0.9844),(77,459,0.9688),
         |    (89,114,0.9063),(99,174,0.9844),(110,467,1),(119,425,0.9531),(120,360,0.9844),(144,161,1),(211,404,1),
         |    (229,263,0.9688),(260,391,0.9844),(270,329,0.9688),(328,428,0.9688),(349,411,1),(474,498,1)
         |  ) g(doc_a, doc_b, est) WHERE (SELECT count(*) FROM lineitem) = 6000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (8,245,0.9688),(26,455,0.9688),(31,383,0.9531),(44,446,0.9844),(45,267,0.9844),(45,413,1),(58,293,1),
         |    (61,185,0.9688),(70,447,0.9688),(72,377,0.9688),(87,134,0.9844),(92,450,0.9531),(98,290,1),(107,387,0.9844),
         |    (120,332,0.9531),(152,178,0.9844),(166,323,1),(267,413,0.9844),(285,301,0.9844),(295,374,0.9688),
         |    (310,389,0.9531),(326,457,0.9688),(393,420,0.9844),(435,486,0.9844),(458,462,0.9844)
         |  ) g(doc_a, doc_b, est) WHERE (SELECT count(*) FROM lineitem) = 60000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (11,4686,0.9844),(17,3383,1),(28,3006,0.9844),(37,3162,0.9688),(48,3900,1),(63,2932,0.9844),(68,1356,0.9531),
         |    (72,4099,0.9844),(87,4037,0.9844),(98,954,1),(126,1282,0.9688),(128,2773,0.9688),(143,4596,0.9688),
         |    (160,1389,0.9688),(162,3123,1),(170,3680,0.8906),(179,2063,0.9219),(179,2523,1),(216,3049,0.9688),(221,4344,1),
         |    (246,491,0.9688),(247,3576,1),(248,1273,1),(254,3460,1),(257,2307,0.9844),(268,2542,1),(292,2301,0.9688),
         |    (297,2624,0.9844),(307,4756,0.9844),(379,771,0.9844),(381,2978,1),(425,1071,0.9688),(430,1267,1),(430,4740,1),
         |    (455,933,1),(455,1985,1),(455,4017,0.9688),(466,4829,0.875),(472,2689,0.9844),(540,630,1),(553,2451,0.9844),
         |    (555,1819,0.9688),(561,895,1),(570,4941,1),(610,4092,0.9844),(617,2333,0.9844),(619,2000,0.9375),
         |    (621,1051,0.9844),(627,2690,0.9688),(644,1204,0.9688),(646,1783,0.9844),(653,2320,0.9688),(669,1641,1),
         |    (669,1673,0.9688),(670,3378,0.9531),(684,1590,0.9688),(703,2170,0.9531),(706,1033,1),(716,1887,0.9844),
         |    (724,4259,0.9844),(729,1039,0.9219),(731,2641,0.9531),(732,2684,0.9844),(752,1405,0.9844),(755,787,0.8906),
         |    (763,4993,0.9375),(775,2179,0.9375),(800,3828,0.9844),(803,1670,1),(820,3264,1),(830,4719,0.9688),
         |    (862,4670,0.9844),(874,4273,0.9844),(879,4278,0.9688),(894,2629,0.9063),(900,4743,1),(901,2008,1),(908,4155,1),
         |    (917,2418,0.9531),(932,2302,0.9844),(932,4556,1),(933,1985,1),(933,4017,0.9688),(941,1730,1),(996,2305,1),
         |    (1018,1083,0.9063),(1038,1131,1),(1041,4446,1),(1053,1882,0.9531),(1053,4677,0.9531),(1073,4937,1),
         |    (1081,1373,0.9688),(1090,3022,0.9688),(1097,1413,0.9375),(1101,4438,1),(1102,3115,0.9531),(1103,1568,0.9219),
         |    (1103,2466,0.8906),(1132,1630,0.9844),(1150,3701,0.9688),(1154,3759,1),(1165,4437,0.9844),(1166,4828,0.9688),
         |    (1171,1427,0.9063),(1177,3387,1),(1181,2649,0.9688),(1237,4246,1),(1240,4368,0.8594),(1267,4740,1),
         |    (1275,1992,0.9063),(1285,2766,0.9531),(1287,1513,1),(1290,3624,0.9375),(1294,2192,0.9844),(1316,1817,0.9844),
         |    (1342,2661,0.875),(1360,2428,0.9688),(1363,3879,0.9844),(1390,4391,0.9844),(1395,2328,0.9844),
         |    (1406,1424,0.9688),(1415,2798,0.9844),(1436,1456,1),(1440,4016,1),(1445,4724,1),(1450,4542,1),(1452,2505,1),
         |    (1460,2551,0.9219),(1477,2521,0.9844),(1494,3958,1),(1540,1828,1),(1568,2466,0.8281),(1600,4650,0.9844),
         |    (1619,2875,1),(1619,3394,0.9688),(1634,2562,0.9844),(1641,1673,0.9688),(1716,4758,0.8906),(1760,4613,0.9531),
         |    (1769,2203,0.9688),(1793,3517,1),(1796,3886,0.9844),(1806,4612,1),(1824,1942,0.9688),(1824,2221,1),
         |    (1827,2377,0.9844),(1843,4795,1),(1882,4677,1),(1886,2052,0.9688),(1900,4153,0.9844),(1902,2728,1),
         |    (1905,3870,0.9688),(1910,1917,1),(1910,3562,1),(1917,3562,1),(1920,4942,1),(1942,2221,0.9688),
         |    (1962,2789,0.9844),(1970,2990,0.9844),(1981,3973,0.9688),(1985,4017,0.9688),(1987,4918,0.9844),
         |    (2004,2918,0.9375),(2019,3038,0.9844),(2025,3954,0.9688),(2028,4455,0.9844),(2063,2523,0.9219),(2064,4003,1),
         |    (2081,4948,0.9531),(2108,2612,0.9844),(2126,3112,1),(2130,2940,0.9219),(2147,3401,0.9219),(2159,3269,0.9688),
         |    (2164,4199,1),(2173,4129,0.9844),(2182,3447,0.9844),(2183,4031,0.9844),(2194,3101,0.9531),(2196,3481,0.9688),
         |    (2226,4225,0.9688),(2256,4337,0.9688),(2302,4556,0.9844),(2326,3377,0.9063),(2366,3166,0.9531),
         |    (2423,3373,0.9844),(2430,3212,0.9844),(2441,4864,1),(2460,3224,0.9531),(2465,4576,0.8906),(2644,4165,0.9844),
         |    (2676,4317,0.9844),(2687,4065,0.9531),(2700,3017,1),(2705,3015,1),(2713,3319,0.9375),(2719,4189,0.9688),
         |    (2770,3674,0.8906),(2801,3703,0.9688),(2815,3647,1),(2859,3106,0.9688),(2862,3329,1),(2863,4095,1),
         |    (2865,3992,1),(2875,3394,0.9688),(2900,3091,0.9844),(2913,4034,1),(2933,4494,0.9531),(2968,4954,0.9531),
         |    (2971,3223,0.9375),(2988,4764,0.9844),(3018,4343,0.9688),(3026,3848,0.9844),(3027,3668,0.9531),
         |    (3062,3354,0.9219),(3087,3947,0.9219),(3151,3896,0.9688),(3152,4771,0.9844),(3157,4044,0.9844),(3175,3304,1),
         |    (3178,4702,1),(3266,3345,1),(3267,3735,1),(3279,4476,0.9531),(3280,3989,0.9531),(3293,3591,0.9844),
         |    (3346,3402,0.9844),(3362,3555,0.9844),(3427,4969,0.9375),(3436,4599,0.8594),(3524,3776,1),(3532,3646,0.9844),
         |    (3566,4666,0.9844),(3605,4138,0.9688),(3711,4923,0.9375),(3743,4492,0.9844),(3747,4976,0.9844),(3751,4545,1),
         |    (3765,4331,0.9844),(3849,4901,0.9219),(3885,4132,1),(3898,4750,0.9844),(3911,4415,0.9531),(4048,4385,1),
         |    (4057,4179,0.9844),(4146,4430,1),(4164,4241,0.9063),(4175,4730,0.9531),(4414,4838,0.9844),(4460,4487,1),
         |    (4485,4832,0.9844),(4488,4922,1),(4546,4847,0.9531),(4667,4991,0.9688),(4705,4769,0.9063),(4833,4912,1)
         |  ) g(doc_a, doc_b, est) WHERE (SELECT count(*) FROM lineitem) = 600000
         |), toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), inter AS (
         |  SELECT g.doc_a, g.doc_b, count(*) AS shared
         |  FROM golden g JOIN sh a ON a.doc_id = g.doc_a
         |                JOIN sh b ON b.doc_id = g.doc_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2
         |)
         |SELECT CAST(g.doc_a AS BIGINT) AS doc_a, CAST(g.doc_b AS BIGINT) AS doc_b,
         |       CAST(g.est AS DOUBLE) AS est_jaccard,
         |       round(coalesce(inter.shared, 0) / (sa.n + sb.n - coalesce(inter.shared, 0)), 4) AS jaccard
         |FROM golden g
         |LEFT JOIN inter ON inter.doc_a = g.doc_a AND inter.doc_b = g.doc_b
         |JOIN sz sa ON sa.doc_id = g.doc_a
         |JOIN sz sb ON sb.doc_id = g.doc_b""").stripMargin,

    "sh1_simhash_neardup" -> // mh1's recipe for the SimHash chunk-banded
      // pair set: identities + hamming are per-SF goldens (the simhash
      // kernel is not SQL-expressible), exact jaccard re-derived from
      // raw text per pair. Regenerate with graft.tools.DumpGoldens.
      ("""WITH golden AS (
         |  SELECT * FROM (VALUES
         |    (8,12,1),(8,120,2),(8,360,1),(12,120,3),(12,360,0),(16,369,0),(26,176,3),(45,487,3),(77,459,2),(89,114,2),
         |    (99,174,3),(110,467,3),(120,360,3),(144,161,2),(211,404,0),(229,263,1),(260,391,2),(328,428,2),(349,411,3)
         |  ) g(doc_a, doc_b, ham) WHERE (SELECT count(*) FROM lineitem) = 6000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (8,245,1),(31,383,2),(58,293,2),(70,447,2),(72,377,1),(87,134,2),(98,290,2),(120,332,3),(166,323,2),
         |    (285,301,1),(326,457,3),(393,420,1),(458,462,1)
         |  ) g(doc_a, doc_b, ham) WHERE (SELECT count(*) FROM lineitem) = 60000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (11,4686,2),(28,3006,3),(48,3900,1),(68,1356,1),(98,954,2),(128,2773,2),(143,4596,2),(162,3123,2),(179,2523,0),
         |    (221,4344,1),(246,491,3),(247,3576,2),(248,1273,2),(254,3460,2),(257,2307,1),(381,2978,1),(455,933,2),
         |    (455,1985,2),(455,4017,3),(540,630,1),(553,2451,3),(561,895,1),(570,4941,3),(627,2690,2),(669,1641,0),
         |    (669,1673,3),(684,1590,0),(706,1033,1),(731,2641,3),(763,4993,3),(803,1670,3),(830,4719,1),(900,4743,3),
         |    (932,4556,0),(933,1985,0),(933,4017,3),(996,2305,2),(1041,4446,2),(1073,4937,0),(1081,1373,0),(1097,1413,2),
         |    (1101,4438,3),(1132,1630,3),(1165,4437,2),(1237,4246,0),(1267,4740,3),(1275,1992,2),(1285,2766,1),
         |    (1287,1513,3),(1316,1817,3),(1360,2428,2),(1363,3879,3),(1415,2798,3),(1440,4016,2),(1445,4724,2),
         |    (1452,2505,2),(1540,1828,3),(1619,2875,0),(1641,1673,3),(1760,4613,2),(1769,2203,3),(1796,3886,2),
         |    (1806,4612,3),(1824,1942,0),(1824,2221,0),(1843,4795,2),(1882,4677,0),(1900,4153,3),(1902,2728,2),
         |    (1905,3870,2),(1910,1917,2),(1910,3562,2),(1917,3562,0),(1942,2221,0),(1962,2789,2),(1981,3973,1),
         |    (1985,4017,3),(2019,3038,3),(2028,4455,0),(2064,4003,3),(2108,2612,1),(2126,3112,0),(2164,4199,2),
         |    (2182,3447,3),(2183,4031,1),(2196,3481,2),(2423,3373,3),(2430,3212,1),(2687,4065,2),(2705,3015,1),
         |    (2713,3319,3),(2815,3647,3),(2863,4095,2),(2865,3992,3),(2971,3223,2),(3018,4343,1),(3027,3668,2),
         |    (3151,3896,1),(3175,3304,3),(3267,3735,3),(3280,3989,3),(3427,4969,1),(3436,4599,3),(3524,3776,2),
         |    (3532,3646,3),(3743,4492,2),(3849,4901,2),(4048,4385,1),(4146,4430,0),(4460,4487,2),(4546,4847,3),
         |    (4667,4991,3)
         |  ) g(doc_a, doc_b, ham) WHERE (SELECT count(*) FROM lineitem) = 600000
         |), toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), inter AS (
         |  SELECT g.doc_a, g.doc_b, count(*) AS shared
         |  FROM golden g JOIN sh a ON a.doc_id = g.doc_a
         |                JOIN sh b ON b.doc_id = g.doc_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2
         |)
         |SELECT CAST(g.doc_a AS BIGINT) AS doc_a, CAST(g.doc_b AS BIGINT) AS doc_b,
         |       CAST(g.ham AS INTEGER) AS hamming,
         |       round(coalesce(inter.shared, 0) / (sa.n + sb.n - coalesce(inter.shared, 0)), 4) AS jaccard
         |FROM golden g
         |LEFT JOIN inter ON inter.doc_a = g.doc_a AND inter.doc_b = g.doc_b
         |JOIN sz sa ON sa.doc_id = g.doc_a
         |JOIN sz sb ON sb.doc_id = g.doc_b""").stripMargin,

    "dd5_passage_dup" -> // list_slice mirrors slice(start,8) (both
      // truncate at the end); 1-indexed inclusive bounds
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts,
         |         CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT) AS n_p
         |  FROM documents WHERE len(string_split(text, ' ')) > 0
         |), passages AS (
         |  SELECT doc_id,
         |         array_to_string(list_slice(ts, (i - 1) * 8 + 1, i * 8), ' ') AS passage
         |  FROM toks, UNNEST(generate_series(1, n_p)) AS u(i)
         |), df AS (
         |  SELECT passage, count(DISTINCT doc_id) AS nd FROM passages GROUP BY 1
         |)
         |SELECT p.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_passages,
         |       round(CAST(sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_frac
         |FROM passages p JOIN df USING (passage)
         |GROUP BY 1""").stripMargin
  )
}
