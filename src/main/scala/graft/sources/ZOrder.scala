package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) clustering for [[ManifestTable]] layouts — the
  * OPTIMIZE ZORDER analog from the public Delta/lakehouse design: range
  * clustering gives tight per-file min/max on ONE column; interleaving
  * the bits of several columns' bucket ranks gives files that are small
  * hyper-rectangles in ALL of them, so predicates on any subset of the
  * z-columns prune files via the same [[ManifestStats]] ranges.
  *
  * Pipeline (all declarative, no custom shuffle):
  *  1. one aggregation job computes each z-column's min/max;
  *  2. each column maps to an equi-width bucket rank in [0, 2^bits)
  *     (`width_bucket` — codegen'd builtin; equi-DEPTH ranks would need
  *     a global sort per column, and the curve only needs locality, not
  *     balance: the subsequent range partition on the z-key re-balances
  *     rows per file whatever the bucket occupancy);
  *  3. bucket bits interleave into the Morton key with shift/or terms
  *     (bits × cols literal expression tree, whole-stage codegen);
  *  4. `repartitionByRange` + `sortWithinPartitions` on the key — ONE
  *     shuffle total, same cost shape as a plain compact-with-sort.
  *
  * Numeric, date, and timestamp columns are supported (temporals bucket
  * on their epoch scalars). Strings are refused — a bucketable total
  * order needs a fixed-width embedding and the range path already
  * serves string prefixes well.
  */
object ZOrder {

  /** Per-column bucket rank in [0, 2^bits) as a long Column. */
  private def bucketExpr(c: String, dt: DataType, mn: Column, mx: Column, bits: Int): Column = {
    val buckets = 1 << bits
    val scalar = bucketScalar(c, dt)
    // width_bucket yields 1..buckets inside [mn,mx] (degenerate mn=mx → all
    // bucket 1); NULLs order first (bucket 0) so all-null files stay tight
    val b = when(scalar.isNull || mx <= mn, lit(1L))
      .otherwise(width_bucket(scalar, mn, mx, lit(buckets)))
    least(greatest(b - 1L, lit(0L)), lit((buckets - 1).toLong))
  }

  /** The Morton key: bit i of column j lands at position i*nCols + j. */
  private def interleave(bucketCols: Seq[Column], bits: Int): Column = {
    val n = bucketCols.size
    val terms = for {
      i <- 0 until bits
      (bc, j) <- bucketCols.zipWithIndex
    } yield shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** `df` reordered along the Morton curve of `zCols` into `nFiles`
    * range-partitioned, internally sorted output partitions. Exposed for
    * direct use on non-manifest writes too. `bits` per column bounds the
    * curve resolution (default 8 → 256 buckets/column). */
  def cluster(df: DataFrame, zCols: Seq[String], nFiles: Int, bits: Int = 8): DataFrame = {
    require(zCols.nonEmpty, "z-order needs at least one column")
    require(zCols.size * bits <= 62, s"z-key overflows a long: ${zCols.size} cols x $bits bits")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    zCols.foreach(c => require(types.contains(c), s"z-order column '$c' not in schema"))
    // one job: global min/max per z-column (broadcast back as literals
    // via a 1-row crossJoin — no collect of data rows, only the bounds)
    val aggs = zCols.flatMap(c => Seq(
      min(bucketScalar(c, types(c))).as(s"__zmin_$c"),
      max(bucketScalar(c, types(c))).as(s"__zmax_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val bucketCols = zCols.zipWithIndex.map { case (c, i) =>
      val mn = lit(Option(bounds.get(bounds.fieldIndex(s"__zmin_$c"))).map(_.toString.toDouble).getOrElse(0.0))
      val mx = lit(Option(bounds.get(bounds.fieldIndex(s"__zmax_$c"))).map(_.toString.toDouble).getOrElse(0.0))
      bucketExpr(c, types(c), mn, mx, bits)
    }
    val zkey = interleave(bucketCols, bits)
    df.withColumn("__zkey", zkey)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** The double-domain scalar [[bucketExpr]] buckets on, for the bounds
    * aggregation (must match bucketExpr's mapping exactly). */
  private def bucketScalar(c: String, dt: DataType): Column = dt match {
    case DateType => datediff(col(c), lit("1970-01-01").cast("date")).cast("double")
    case TimestampType => unix_micros(col(c)).cast("double")
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType | _: DecimalType =>
      col(c).cast("double")
    case other => throw new IllegalArgumentException(s"z-order column '$c' has unsupported type $other")
  }
}
