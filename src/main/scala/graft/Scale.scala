package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: replicate an sf directory N× with
  * shifted keys, so the suite can be benchmarked at ~10× without new
  * source data. Growth is modeled the way real corpora grow — MORE
  * entities (customers, users, orders, documents, vectors), not hotter
  * ones: every entity/fact key is offset by copy × 10^9, so each copy
  * joins within itself, per-user event density and per-window load stay
  * constant per copy, and the catalog dimensions (nation/region) stay
  * fixed exactly as TPC-H scales them. Text/embedding payloads repeat
  * across copies (content-level duplicate rate rises — harmless for
  * timing, and the capped shingle path drops cross-copy stop-shingles
  * the same way it drops any common shingle).
  *
  * Output layout: `<table>.parquet` per table as in /root/testdata, but
  * as a DIRECTORY of `filesPerTable` parts by default — 10× data arrives
  * as more files in production, and a single file caps scan parallelism
  * at split granularity (the round-5 txt8 ×13.9 growth artifact).
  * `events.parquet` always stays ONE file (written via coalesce(1) +
  * rename) so st2/st4's single-file staging copy works unchanged; pass
  * filesPerTable=1 to reproduce the fully single-file round-5 layout.
  *
  * Usage: Scale <srcSfDir> <outDir> [copies=10] [filesPerTable=16]
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Off = 1000000000L // per-copy key offset: far above any source key

    // key columns to shift per table; absent tables are copied verbatim
    val shifts: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "nation" -> Nil, // catalog dims stay fixed (TPC-H scaling)
      "region" -> Nil)

    // files per table (4th arg, default 16): a 10× corpus arriving as ONE
    // parquet file per table is not how 10× data shows up in production —
    // it caps the scan at file-split granularity and serializes
    // regex/parse-heavy map work (round-5's txt8 ×13.9 growth band was
    // exactly this artifact, not operator cost; see SURVEY §8.3).
    // events ALWAYS stays one file: st2/st4's staging logic copies
    // `events.parquet` as a single file by java.nio path.
    val filesPerTable = if (args.length > 3) args(3).toInt else 16

    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(out))
    shifts.foreach { case (table, keys) =>
      val base = spark.read.parquet(s"$src/$table.parquet")
      val scaled: DataFrame =
        if (keys.isEmpty) base
        else (0 until copies).map { k =>
          keys.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(k * Off)))
        }.reduce(_ unionByName _)
      val nFiles = if (table == "events") 1 else filesPerTable
      val dest = new Path(s"$out/$table.parquet")
      if (nFiles > 1) {
        // multi-file layout: `<table>.parquet` is a DIRECTORY of parts —
        // spark.read.parquet handles both shapes transparently
        fs.delete(dest, true)
        scaled.repartition(nFiles).write.mode("overwrite").parquet(dest.toString)
      } else {
        // single-file layout: write a one-part dir, then promote the part.
        // Small row groups (2 MB vs the 128 MB default): a Spark scan
        // task must own WHOLE row groups, so one coalesce(1) file with
        // one giant row group caps the scan at 1 task no matter what
        // maxPartitionBytes says — measured at sf1: vr1 8.1→2.6 s,
        // txt14 2.1→1.4 s once the single events file had >1 row group.
        // Production files carry many row groups; this makes the
        // rehearsal's one mandated single-file table behave like them.
        val tmp = new Path(s"$out/__tmp_$table")
        scaled.coalesce(1).write.mode("overwrite")
          .option("parquet.block.size", 2L * 1024 * 1024)
          .parquet(tmp.toString)
        val part = fs.listStatus(tmp).map(_.getPath)
          .find(_.getName.startsWith("part-")).get
        // recursive: dest may be a DIRECTORY left by a prior multi-file run
        // in the same out dir (filesPerTable 16 -> 1 switch)
        fs.delete(dest, true)
        require(fs.rename(part, dest), s"rename failed for $table")
        fs.delete(tmp, true)
      }
      println(s"[scale] $table: ${scaled.columns.length} cols, $nFiles file(s) -> $dest")
    }
    spark.stop()
  }
}
