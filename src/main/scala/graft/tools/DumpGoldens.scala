package graft.tools

import org.apache.spark.sql.SparkSession

/** Golden-capture tool for the hash/seed-dependent near-dup keys (the
  * ann3 oracle recipe): runs mh1/sh1/cn1/ann2 at each given SF dir and
  * prints their deterministic identity sets as paste-ready SQL VALUES
  * tuples, keyed by the SF's lineitem row count. Scores the oracle can
  * re-derive from raw parquet (exact jaccard, exact cosine) are NOT
  * dumped — only identities and the non-SQL-expressible sketch columns
  * (est_jaccard, hamming) that ride as golden literals.
  *
  * Usage: runMain graft.tools.DumpGoldens /root/testdata/sf0.001 ...
  * Re-run whenever a kernel seed or the test data changes, and paste the
  * output into SparkEntry.oracleSql.
  */
object DumpGoldens {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Any): String = v match {
      case d: Double => BigDecimal(d).underlying().stripTrailingZeros().toPlainString
      case x => x.toString
    }
    args.foreach { dir =>
      val li = spark.read.parquet(s"$dir/lineitem.parquet").count()
      println(s"== $dir (lineitem=$li)")
      def dump(key: String, cols: Seq[String]): Unit = {
        val rows = graft.SparkEntry.queries(key)(spark, dir)
          .selectExpr(cols: _*).orderBy(cols.head, cols(1)).collect()
        val tuples = rows.map(r =>
          "(" + cols.indices.map(i => fmt(r.get(i))).mkString(",") + ")")
        println(s"-- $key rows=${rows.length}")
        // wrap at ~110 chars for readable embedding
        val sb = new StringBuilder
        var line = new StringBuilder
        tuples.foreach { t =>
          if (line.nonEmpty && line.length + t.length + 1 > 110) {
            sb.append(line).append('\n'); line = new StringBuilder
          }
          if (line.nonEmpty) line.append(',')
          line.append(t)
        }
        sb.append(line)
        println(sb.toString)
      }
      dump("mh1_minhash_neardup", Seq("doc_a", "doc_b", "est_jaccard"))
      dump("sh1_simhash_neardup", Seq("doc_a", "doc_b", "hamming"))
      dump("cn1_cosine_neardup", Seq("id_a", "id_b"))
      dump("ann2_lsh_topk", Seq("q_id", "rnk", "vec_id"))
    }
    spark.stop()
  }
}
