package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate the token stream of a
  * document shard and cut it into fixed-size blocks (the GPT-style
  * concat-and-chunk loader). Output is the block manifest — one row per
  * (block, contributing document) with the token span each document
  * contributes — which is what a data loader needs to assemble batches.
  *
  * Scale design: a single global token order would need one total sort, so
  * the corpus is packed per SHARD (`id mod numShards`) — each shard's
  * token stream is independent, block ids are (shard, local index), and
  * the plan is one hash exchange on shard + per-partition sort + a narrow
  * explode whose fan-out is n_tokens/blockSize. This mirrors production
  * packing, which runs per output file: at 100 TB you set numShards to the
  * writer parallelism and no machine ever sees more than one shard's
  * running offset. Within a shard, documents are ordered by id, so the
  * packing is deterministic under any input partitioning.
  */
object PackOps {

  /** Pack `textCol`'s whitespace tokens into `blockSize`-token blocks over
    * `numShards` independent shards. Returns
    * (shard, block_id, idCol, tokens_in_block); every interior block sums
    * to exactly `blockSize` tokens (LakeOpsSpec pins the invariant).
    * Zero-token documents contribute nothing and are dropped.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numShards: Int,
      blockSize: Int): DataFrame = {
    val b = lit(blockSize.toLong)
    val counted = df
      .select(
        col(idCol),
        pmod(col(idCol), lit(numShards.toLong)).as("shard"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n"))
      .filter(col("n") > 0)
    val w = Window.partitionBy("shard").orderBy(idCol)
    counted
      .withColumn("e", sum("n").over(w))
      .withColumn("b", col("e") - col("n"))
      // a document spanning [b, e) touches blocks floor(b/B)..floor((e-1)/B)
      .select(
        col("shard"), col(idCol), col("b"), col("e"),
        explode(sequence(expr("b DIV " + blockSize), expr("(e - 1) DIV " + blockSize)))
          .as("block_id"))
      .select(
        col("shard"),
        col("block_id"),
        col(idCol),
        (least(col("e"), (col("block_id") + 1) * b) -
          greatest(col("b"), col("block_id") * b)).as("tokens_in_block"))
  }

  /** Document-boundary-respecting next-fit packing: within each shard,
    * walk documents in id order and open a new bin whenever the current
    * one can't hold the whole document (a document longer than `capacity`
    * gets a bin to itself). The alternative to [[packSequences]] for
    * loaders that never split documents — trades padding waste for
    * boundary integrity.
    *
    * Next-fit is a sequential recurrence (bin state depends on every
    * prior document in the shard), so no window formulation exists; this
    * is the genuine per-partition-imperative case: ONE hash exchange on
    * shard, sort within partitions, then a single forward scan with two
    * longs of state. Each shard lands wholly in one task (hash on shard),
    * so the result is deterministic under any input partitioning; scale
    * by raising `numShards` exactly as with [[packSequences]].
    */
  def packDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numShards: Int,
      capacity: Int): DataFrame =
    packCounted(
      df.select(col(idCol), TextOps.tokenCount(col(textCol)).cast("long").as("__graft_n")),
      idCol, "__graft_n", numShards, capacity)

  /** [[packDocuments]] over an already-token-counted input (`nCol`) — for
    * pipelines that computed counts upstream (pipe3 counts before its
    * materialization boundary so the checkpoint holds three longs per doc,
    * not the text). Same recurrence, same determinism contract. */
  def packCounted(
      df: DataFrame,
      idCol: String,
      nCol: String,
      numShards: Int,
      capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counted = df
      .select(
        col(idCol).cast("long"),
        pmod(col(idCol), lit(numShards.toLong)).as("shard"),
        col(nCol).cast("long").as("n"))
      .filter(col("n") > 0)
      .as[(Long, Long, Long)]
    counted
      .repartition(col("shard"))
      .sortWithinPartitions("shard", idCol)
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (id, shard, n) =>
          if (shard != curShard) { curShard = shard; bin = 0L; fill = n }
          else if (fill + n > capacity) { bin += 1; fill = n }
          else fill += n
          (shard, bin, id, n)
        }
      }
      .toDF("shard", "bin_id", idCol, "n_tokens")
  }
}
