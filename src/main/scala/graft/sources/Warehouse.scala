package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse-layout helpers: partitioned and bucketed parquet tables.
  *
  * These are the two physical-layout levers that matter at 100 TB:
  *
  *  - **Partitioning** (`partitionBy`) turns predicates on the partition
  *    column into directory pruning — a scan over 3 years of data with a
  *    one-day filter reads one directory, not 1000. Verified by spec: the
  *    scan's `PartitionFilters` prunes before any I/O.
  *  - **Bucketing** (`bucketBy`) pre-shuffles a table by join/agg key at
  *    write time. Two tables bucketed the same way join with ZERO runtime
  *    Exchange — the single biggest shuffle eliminator for repeated
  *    fact-fact joins. Verified by spec: the joined plan contains no
  *    ShuffleExchange.
  *
  * Bucketed tables must go through the session catalog (`saveAsTable`) —
  * bucket metadata lives there, not in the parquet footers.
  */
object Warehouse {

  /** Write a date/hour/category-partitioned parquet table. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Register a bucketed + sorted catalog table backed by parquet at
    * `path`. Pick `numBuckets` to match the partner tables it will join —
    * equal bucket counts on the join key are what eliminate the exchange.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      numBuckets: Int,
      path: Option[String] = None
  ): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(tableName)
  }

  def readTable(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
