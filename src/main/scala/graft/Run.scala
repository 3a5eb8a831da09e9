package graft

import org.apache.spark.sql.SparkSession

/** Result-inspection main: runs selected SparkEntry queries and prints
  * their rows (golden re-pinning, quick behavior checks — the driver's
  * Verify/oracle path stays the correctness gate).
  *
  * Usage: Run <sfDir> <queryName> [queryName ...]
  */
object Run {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val wanted = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    wanted.foreach { name =>
      println(s"\n========== $name ==========")
      try SparkEntry.queries(name)(spark, sfDir).show(100, truncate = false)
      catch { case e: Throwable => println(s"run failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
