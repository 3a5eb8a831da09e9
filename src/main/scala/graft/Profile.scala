package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted profiling main — answers specific "what fraction of this
  * query is THAT piece" questions with measurements instead of
  * reasoning (the round-4/5 verdict standard: a cost claim must carry a
  * number).
  *
  * Currently: the dd4 connected-components convergence fingerprint —
  * the CC loop runs one driver-visible `.head()` per round over the
  * already-checkpointed edge set; this measures how much of dd4's
  * runtime those actions are.
  *
  * Usage: Profile <sfDir> [repeat=3]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeat = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ops.DedupOps
    def dd4(fp: Option[AtomicLong]): Unit = {
      val docs = Tables.load(spark, sfDir, "documents")
      DedupOps.ccSurvivors(docs, "doc_id",
          DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
            n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L)),
          fingerprintNanos = fp)
        .select(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }

    dd4(None) // warmup: Janino/JIT, file-listing caches
    val runs = (1 to repeat).map { _ =>
      val fp = new AtomicLong
      val t0 = System.nanoTime()
      dd4(Some(fp))
      val total = (System.nanoTime() - t0) / 1e9
      (total, fp.get() / 1e9)
    }
    runs.zipWithIndex.foreach { case ((total, fpSec), i) =>
      println(f"[profile] dd4 run ${i + 1}: total $total%.3f s, " +
        f"fingerprint $fpSec%.3f s (${100 * fpSec / total}%.1f%%)")
    }
    val best = runs.minBy(_._1)
    println(f"[profile] dd4 best-of-$repeat: total ${best._1}%.3f s, " +
      f"fingerprint ${best._2}%.3f s (${100 * best._2 / best._1}%.1f%%) sf=$sfDir")
    spark.stop()
  }
}
