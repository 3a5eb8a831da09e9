package graft

import org.apache.spark.sql.SparkSession

import graft.models.Jaffle
import graft.quality.Checks
import graft.seed.SeedLoader

/** CLI entry: the engine's `dbt seed + run + test` in one pass
  * (reference workflow: README.md:46-61).
  *
  * Usage: JaffleMain <seedDir> <outDir>
  *   seedDir — directory with raw_customers.csv / raw_orders.csv / raw_payments.csv
  *   outDir  — warehouse dir; seeds land in <outDir>/seeds, marts in <outDir>/marts
  */
object JaffleMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: JaffleMain <seedDir> <outDir>")
    val Array(seedDir, outDir) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-jaffle")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // seed (dbt seed): CSV -> typed parquet
      val seeds = SeedLoader.materialize(
        spark, SeedLoader.loadJaffleSeeds(spark, seedDir), s"$outDir/seeds")
      seeds.toSeq.sortBy(_._1).foreach { case (n, df) => println(f"[seed] $n%-14s ${df.count()}%5d rows") }
      // run (dbt run): topo-ordered DAG, views lazy, marts -> parquet
      val rel = Jaffle.registry.run(spark, seeds, tableDir = Some(s"$outDir/marts"))
      Seq("customers", "orders").foreach { n => println(f"[mart] $n%-14s ${rel(n).count()}%5d rows") }
      // test (dbt test): the 20 declarative checks
      val results = Checks.jaffleSuite(rel).map(c => (c.name, c.passes))
      results.foreach { case (n, ok) => println(s"[test] ${if (ok) "PASS" else "FAIL"} $n") }
      val failed = results.count(!_._2)
      println(s"[done] ${results.size} tests, $failed failed")
      // docs (dbt docs generate): write the model catalog
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/catalog.md"), Jaffle.registry.renderDocs)
      println(s"[docs] $outDir/catalog.md")
      if (failed > 0) sys.exit(1)
    } finally spark.stop()
  }
}
