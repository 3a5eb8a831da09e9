package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{ClassifyOps, ContaminationOps, DedupOps, EventOps, LakeOps, PackOps, QuantizeOps, SampleOps, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query keys map 1:1 onto SURVEY.md §2's operator inventory (prefix =
  * operator id) plus the §7.4 extension surface; the complete
  * key→implementation→spec map is SURVEY §8. Families:
  *
  *  - p/f/j/a/mart/q: the reference-parity surface (§2.2-2.6)
  *  - w1-w5/set/sj/d1/u1/x1/dt1/agg1-7: windows (row+range frames, heap
  *    top-k UDAF), set ops, distinct, explode, dates, agg breadth (rollup,
  *    cube, percentiles, exact moments, argmax UDAF)
  *  - e1-e4/st1-st2: event-time ops batch + Structured Streaming drains
  *  - aj1/aj2/rj1/sk1: temporal joins (composition AND the custom
  *    AsOfJoinExec physical operator), range join, salted skew join
  *  - txt1-9/dd1-4/pipe1/smp1-2/ctm1: text analysis (incl. PII redaction,
  *    tf-idf), dedup (exact, jaccard pairs, greedy survivors,
  *    connected-components survivors), the composed cleaning pipeline,
  *    deterministic hash split + per-group corpus caps, benchmark-
  *    contamination screening
  *  - mh1/sh1/ann1-3/cn1/v1: MinHash/SimHash near-dup, ANN (brute force,
  *    LSH, IVF), cosine near-dup, vector math
  *  - mm1/mm2, src1-3: multimodal binary plumbing; JSON/CSV/partitioned
  *    source round-trips
  *
  * Oracle notes (SURVEY §7.5 + NEXT.md §6): money/quantity sums accumulate
  * in DECIMAL (ExactSums); moments use exact integer sums with textually
  * identical double formulas; counts cast to BIGINT both sides; window
  * ranks carry total-order tie-breaks; DATEs cast to TIMESTAMP. Three
  * keys are rows-only (agg3/agg8 replay Spark-internal HLL/KLL sketches,
  * hh1's MG candidate set is merge-order-dependent), each family gated
  * by a deterministic oracle-checked companion. Every hash/seed-dependent
  * NEAR-DUP key (ann2/ann3, mh1, sh1, cn1) is oracle-checked via per-SF
  * identity goldens with every data-derivable score (exact cosine, exact
  * jaccard) re-derived by DuckDB from the raw parquet — any ranking or
  * pair-set change moves an identity and fails the hash. Regenerate
  * goldens with graft.tools.DumpGoldens.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The customer-360 mart shape (SURVEY §2: J1+J2+A1-A5) on the testdata
    * star schema.
    */
  def entry(spark: SparkSession): DataFrame =
    EntryHelpers.customer360(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — the
    * concatenation of the per-family key registries (graft/entry/),
    * split mechanically in round 15 with zero behavior change. Each
    * family owns its queries AND their oracle SQL side by side. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreKeys.queries ++ RelationalKeys.queries ++ DedupKeys.queries ++
      SimilarityKeys.queries ++ TextKeys.queries ++ MultimodalKeys.queries ++
      LakeKeys.queries ++ StreamKeys.queries

  /** ANSI SQL oracles, keyed like [[queries]] (3 keys are rows-only:
    * agg3/agg8 replay Spark-internal sketches, hh1's candidate set is
    * merge-order-dependent — see EntrySmokeSpec for the pinned set). */
  def oracleSql: Map[String, String] =
    CoreKeys.oracleSql ++ RelationalKeys.oracleSql ++ DedupKeys.oracleSql ++
      SimilarityKeys.oracleSql ++ TextKeys.oracleSql ++ MultimodalKeys.oracleSql ++
      LakeKeys.oracleSql ++ StreamKeys.oracleSql
}
