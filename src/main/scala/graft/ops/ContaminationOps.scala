package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening: find corpus documents that contain
  * any probe string (n-gram) from an evaluation suite.
  *
  * Two tiers:
  *  - exact broadcast nested-loop `contains()` (the ctm1 baseline):
  *    O(|probes| · len) per document — fine for tens of probes, wrong
  *    shape for a real eval suite with millions of probe n-grams;
  *  - [[bloomScreen]]: hash the probe n-grams into a Bloom filter (built
  *    by a distributed aggregate), prefilter documents with an O(len)
  *    sliding-window membership test that is INDEPENDENT of |probes|,
  *    then verify the few candidates with the exact contains() join.
  *    Bloom filters have no false negatives, and the verify join kills
  *    the false positives, so the result is exactly the baseline's —
  *    deterministic, same oracle.
  */
object ContaminationOps {

  /** Bloom-prefiltered contamination screen over fixed-length probes.
    *
    * `probes` must carry probe strings of exactly `probeLen` CHARACTERS
    * (the fixed-n-gram contract real decontamination pipelines use —
    * variable-length probes belong in the exact tier). Result: one row
    * per contaminated document with the hit count and first probe id —
    * identical to the exact-join formulation.
    *
    * Scale shape: the filter is built by [[graft.functions.BloomBuildAgg]]
    * (partial buffers OR together; no driver collect), ships to the scan
    * via a broadcast of the ONE-ROW aggregate result, and the scan-side
    * test reads the words in place. Size `numBits` ≈ 10 bits per expected
    * probe for ~1% false positives — false positives only cost verify-join
    * work, never correctness.
    *
    * Measured (sf0.1, min-of-3 warm, |probes| 50→200→500): exact tier
    * 0.77→0.97→1.61 s (linear in probes, as its per-row contains() loop
    * predicts); this screen 0.46→0.42→0.68 s — scan cost flat, the small
    * rise at 500 being the verify join over the larger TRUE candidate set
    * (probes drawn from the corpus ⇒ more real hits), not the prefilter.
    */
  def bloomScreen(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeIdCol: String,
      probeCol: String,
      probeLen: Int,
      numBits: Int = 1 << 16,
      numHashes: Int = 5
  ): DataFrame = {
    graft.functions.NativeExpressions.register(docs.sparkSession)
    val bloom = probes.agg(
      expr(s"graft_bloom_build(`$probeCol`, $numBits, $numHashes)").as("__bloom"))
    val candidates = docs
      .join(broadcast(bloom)) // one-row cross join: the filter rides the broadcast
      .filter(expr(s"graft_bloom_text_hit(`$textCol`, __bloom, $probeLen, $numHashes)"))
      .drop("__bloom")
    candidates
      .join(broadcast(probes),
        col(textCol).contains(col(probeCol)) && col(idCol) =!= col(probeIdCol))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_probe_hits"), min(probeIdCol).as("first_probe"))
  }
}
