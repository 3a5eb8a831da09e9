package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's testdata tables under /root/testdata/sf{N}
  * (one parquet per table — see TESTDATA.md / FIXTURES.md).
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's schema converter
    * rejects outright. Read the raw nanos as long (legacy conf) and convert
    * with integer division — NOT `/` (double division would lose precision:
    * epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact-integer range).
    * Truncation matches DuckDB's own ns→µs handling bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
