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
  * Output layout matches /root/testdata: ONE parquet FILE per table named
  * `<table>.parquet` (written via coalesce(1) + rename), so every query's
  * staging logic (st2/st4 file copy) works unchanged.
  *
  * Usage: Scale <srcSfDir> <outDir> [copies=10]
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

    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(out))
    shifts.foreach { case (table, keys) =>
      val base = spark.read.parquet(s"$src/$table.parquet")
      val scaled: DataFrame =
        if (keys.isEmpty) base
        else (0 until copies).map { k =>
          keys.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(k * Off)))
        }.reduce(_ unionByName _)
      // single-file layout: write a one-part dir, then promote the part
      val tmp = new Path(s"$out/__tmp_$table")
      scaled.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.startsWith("part-")).get
      val dest = new Path(s"$out/$table.parquet")
      fs.delete(dest, false)
      require(fs.rename(part, dest), s"rename failed for $table")
      fs.delete(tmp, true)
      println(s"[scale] $table: ${scaled.columns.length} cols -> $dest")
    }
    spark.stop()
  }
}
