package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Z-order (Morton) clustering value over numeric/timestamp columns:
    * each column is min/max-scaled to a `bits`-wide integer (one cheap
    * min/max aggregation pass supplies the ranges), then the bits are
    * interleaved. Rows close in z-value are close in EVERY clustered
    * dimension, so sorting files by z-value keeps per-file min/max ranges
    * tight on all columns at once — the third layout lever after
    * partitioning (one column, exact pruning) and bucketing (join
    * co-location): multi-column data skipping from parquet min/max stats.
    * NULLs in any clustered column yield a NULL z-value (sorted first).
    */
  def zOrderValue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"need 1..${63 / math.max(1, bits)} columns at $bits bits")
    val aggs = cols.map(c => min(col(c).cast("double")).as(s"__min_$c")) ++
      cols.map(c => max(col(c).cast("double")).as(s"__max_$c"))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val maxVal = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, j) =>
      // NULL min/max (empty or all-NULL input): any range works — every
      // surviving row's z-value is NULL-guarded below anyway
      val lo = if (r.isNullAt(j)) 0.0 else r.getDouble(j)
      val hi = if (r.isNullAt(cols.size + j)) 1.0 else r.getDouble(cols.size + j)
      val span = if (hi > lo) hi - lo else 1.0
      least(greatest(
        (((col(c).cast("double") - lit(lo)) / lit(span)) * maxVal).cast("long"),
        lit(0L)), lit(maxVal))
    }
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      j <- 0 until n
    } yield shiftleft(shiftright(scaled(j), i).bitwiseAND(lit(1L)), i * n + j)
    // explicit NULL guard: greatest/least SKIP nulls, which would
    // otherwise cluster NULL rows silently into the min corner
    when(cols.map(col(_).isNotNull).reduce(_ && _), terms.reduce(_ bitwiseOR _))
      .otherwise(lit(null))
  }

  /** Write parquet clustered by z-value: range-partition into `numFiles`
    * z-ranges and sort within each, so every file covers a tight
    * hyper-rectangle of the clustered columns. Readers need no special
    * support — parquet min/max stats skip for them.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 16
  ): Unit =
    df.withColumn("__z", zOrderValue(df, zCols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
