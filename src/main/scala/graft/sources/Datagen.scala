package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-data source as a full DataSourceV2 connector —
  * the source-side analog of the custom physical operator tier: a
  * TableProvider whose ScanBuilder implements filter pushdown
  * (SupportsPushDownFilters) and column pruning
  * (SupportsPushDownRequiredColumns) for real, not as plan decoration.
  *
  * Rows are a pure function of `id` (category/bucket/price derived with
  * integer arithmetic), so results are identical under any partitioning —
  * and SQL-expressible, which keeps the source under the DuckDB oracle
  * (generate_series replays the generator).
  *
  * Scale story: pushed id bounds INTERSECT the per-partition id ranges at
  * planning time, so `WHERE id < k` plans only ceil(k/rowsPerPartition)
  * input partitions instead of all of them (DatagenSpec asserts the
  * partition count). That is the parquet-min/max-skipping contract
  * generalized to a generator: at 100 TB of synthetic training data the
  * cluster only runs tasks for the id range the query touches. Column
  * pruning materializes only the projected fields (a 2-column projection
  * never formats the string column).
  *
  * Usage: spark.read.format(classOf[DatagenTableProvider].getName)
  *   .option("numRows", n).option("numPartitions", p).load()
  */
class DatagenTableProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DatagenTable.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DatagenTable(
      properties.getOrDefault("numRows", "1000").toLong,
      properties.getOrDefault("numPartitions", "8").toInt,
      properties.getOrDefault("aggMode", "complete"))
}

object DatagenTable {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("category", StringType, nullable = false)))

  // the row generator, shared by every reader: pure integer arithmetic on
  // id so DuckDB's generate_series reproduces it exactly
  def bucket(id: Long): Long = id % 100L
  def price(id: Long): Double = (id * 7919L % 100000L).toDouble / 100.0
  def category(id: Long): String = "cat_" + (id % 4L)
}

class DatagenTable(numRows: Long, numPartitions: Int, aggMode: String = "complete")
    extends Table with SupportsRead {
  override def name(): String = s"graft_datagen($numRows)"
  override def schema(): StructType = DatagenTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DatagenScanBuilder(numRows, numPartitions, aggMode)
}

class DatagenScanBuilder(numRows: Long, numPartitions: Int, aggMode: String = "complete")
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var lo: Long = 0L           // inclusive pushed lower id bound
  private var hi: Long = numRows      // exclusive pushed upper id bound
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = DatagenTable.Schema
  private var pushedAgg: Option[Array[AggregateFunc]] = None

  /** LIMIT k without an ordering may return any k rows, so serving the
    * first k of the (already filter-narrowed) id range is exact — the
    * range shrinks and partitions outside it are never planned.
    * Saturating add: a pushed filter can drive `lo` near Long.MaxValue
    * (`id >= MaxValue-1` + LIMIT), which must plan a clamped scan, not
    * throw ArithmeticException at planning time. */
  override def pushLimit(limit: Int): Boolean = {
    val bound = if (lo > Long.MaxValue - limit.toLong) Long.MaxValue else lo + limit.toLong
    hi = math.min(hi, bound)
    true // fully pushed: the scan emits exactly `limit` rows (or fewer)
  }

  /** Accept only id-range conjuncts; everything else stays a residual
    * Filter above the scan (Spark re-applies whatever we return). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushed, residual) = filters.partition {
      case EqualTo("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case GreaterThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    // saturating +1: v = Long.MaxValue must clamp, not wrap to MinValue
    // (id <= Long.MaxValue would otherwise silently return zero rows)
    def inc(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    pushed.foreach {
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, inc(v))
      case GreaterThan("id", v: Long) => lo = math.max(lo, inc(v))
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, inc(v))
      case _ =>
    }
    accepted = pushed
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) / MIN(id) / MAX(id) / SUM(id) over the pushed id range
    * are CLOSED FORM for a range generator — the deepest pushdown tier:
    * the scan returns the answer and generates NOTHING. GROUP BY over
    * bucket and/or category is equally closed-form: both are residue
    * classes of id (mod 100 and mod 4, and 4 | 100), so every group is
    * a union of ≤100 arithmetic progressions over [lo, hi) — the scan
    * emits the pre-aggregated group rows and Spark plans NO aggregate
    * at all. Spark only offers aggregate pushdown when every filter was
    * pushed (a residual predicate blocks it upstream in
    * V2ScanRelationPushDown), so the range bounds are always exact
    * here. Anything else — group-bys on non-residue columns (price),
    * DISTINCT sums, other aggregates — is declined and planned
    * normally (spec-pinned fallback).
    */
  private def isNamed(e: V2Expression, name: String): Boolean = e match {
    case nr: NamedReference => nr.fieldNames.sameElements(Array(name))
    case _ => false
  }

  private def pushable(agg: Aggregation): Boolean = {
    val gb = agg.groupByExpressions
    val groupOk = gb.forall(g => isNamed(g, "bucket") || isNamed(g, "category")) && gb.length <= 2
    groupOk && agg.aggregateExpressions.forall {
      case _: CountStar => true
      case m: Min => isNamed(m.column, "id")
      case m: Max => isNamed(m.column, "id")
      case s: Sum => isNamed(s.column, "id") && !s.isDistinct
      case _ => false
    }
  }

  /** aggMode = "partial" demonstrates the OTHER pushdown tier: the
    * source accepts the aggregation (pushAggregation true) but declines
    * the complete form (supportCompletePushDown false) — the scan then
    * emits per-input-partition pre-aggregated rows and SPARK plans the
    * final merge (count partials re-aggregate via SUM upstream). This
    * is the tier a sharded store lives in: shards can aggregate
    * locally but cannot see each other to merge. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    pushable(agg) && aggMode == "complete"

  override def pushAggregation(agg: Aggregation): Boolean =
    if (pushable(agg)) {
      pushedAgg = Some(agg.aggregateExpressions)
      groupCols = agg.groupByExpressions.map(g =>
        if (isNamed(g, "bucket")) "bucket" else "category")
      true
    } else false

  private var groupCols: Array[String] = Array.empty

  override def build(): Scan = pushedAgg match {
    case Some(aggs) if aggMode == "partial" =>
      new DatagenPartialAggScan(numRows, numPartitions,
        math.max(lo, 0L), math.max(hi, lo), groupCols, aggs)
    case Some(aggs) if groupCols.nonEmpty =>
      new DatagenGroupAggScan(math.max(lo, 0L), math.max(hi, lo), groupCols, aggs)
    case Some(aggs) => new DatagenAggScan(math.max(lo, 0L), math.max(hi, lo), aggs)
    case None => new DatagenScan(numRows, numPartitions, lo, hi, required)
  }
}

/** Complete-pushdown aggregate scan: one partition, one row, zero
  * generated data — count/min/max over [lo, hi) in closed form. */
class DatagenAggScan(lo: Long, hi: Long, aggs: Array[AggregateFunc]) extends Scan with Batch {

  override def readSchema(): StructType = StructType(aggs.map {
    case _: CountStar => StructField("count_star", LongType, nullable = false)
    case _: Min => StructField("min_id", LongType, nullable = true)
    case _: Max => StructField("max_id", LongType, nullable = true)
    case _: Sum => StructField("sum_id", LongType, nullable = true)
    case other => throw new IllegalArgumentException(s"unpushable aggregate $other")
  })

  override def description(): String =
    s"graft_datagen pushed_aggregation=[${aggs.mkString(", ")}] pushed_id_range=[$lo,$hi)"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(DatagenPartition(0L, 1L)) // one row regardless of the range

  override def createReaderFactory(): PartitionReaderFactory =
    new DatagenAggReaderFactory(DatagenClosedForm.globalRow(lo, hi, aggs))
}

/** GROUP BY complete pushdown over residue-class columns: bucket
  * (id % 100) and category (id % 4, and 4 | 100) partition [lo, hi)
  * into ≤100 arithmetic progressions, so every requested group is a
  * UNION of residue classes whose count/min/max/sum all have closed
  * forms — the scan emits the pre-aggregated group rows (empty groups
  * omitted, per GROUP BY semantics) and generates no detail rows at
  * all. Class stats merge per group with the usual monoid (sum of
  * counts/sums, min of mins, max of maxs). */
class DatagenGroupAggScan(
    lo: Long, hi: Long, groupCols: Array[String], aggs: Array[AggregateFunc])
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(
    groupCols.map {
      case "bucket" => StructField("bucket", LongType, nullable = false)
      case "category" => StructField("category", StringType, nullable = false)
      case other => throw new IllegalArgumentException(s"unpushable group column $other")
    } ++ aggs.map {
      case _: CountStar => StructField("count_star", LongType, nullable = false)
      case _: Min => StructField("min_id", LongType, nullable = true)
      case _: Max => StructField("max_id", LongType, nullable = true)
      case _: Sum => StructField("sum_id", LongType, nullable = true)
      case other => throw new IllegalArgumentException(s"unpushable aggregate $other")
    })

  override def description(): String =
    s"graft_datagen pushed_aggregation=[${aggs.mkString(", ")}] " +
      s"group_by=[${groupCols.mkString(",")}] pushed_id_range=[$lo,$hi)"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(DatagenPartition(0L, 1L)) // ≤100 output rows: one task

  override def createReaderFactory(): PartitionReaderFactory =
    new DatagenGroupAggReaderFactory(DatagenClosedForm.groupRows(lo, hi, groupCols, aggs))
}

/** The closed-form arithmetic shared by the complete and partial
  * aggregate scans: residue-class stats over an id range, merged into
  * the requested grouping. */
object DatagenClosedForm {
  /** Arithmetic-series sum n·(first+last)/2 with an overflow check: for
    * pushed id ranges past ~2^31 rows the product sits near 2^63, and a
    * silent Long wraparound would return a WRONG pushed-down SUM — the
    * one failure mode an aggregate pushdown must never have. BigInt the
    * intermediate (runs once per residue class at plan time — ≤100
    * evaluations, cost irrelevant) and fail loudly past Long range. */
  private def seriesSum(n: Long, first: Long, last: Long): Long = {
    val s = BigInt(n) * (BigInt(first) + BigInt(last)) / 2
    require(s.isValidLong,
      s"datagen pushed SUM overflows BIGINT for n=$n over [$first,$last]; " +
        "decline the aggregate pushdown for ranges this large")
    s.toLong
  }

  private case class ClassStats(n: Long, first: Long, last: Long) {
    def sum: Long = seriesSum(n, first, last)
  }

  /** One pre-aggregated row per non-empty group over [lo, hi). */
  def groupRows(
      lo: Long, hi: Long,
      groupCols: Array[String], aggs: Array[AggregateFunc]): Array[Array[Any]] = {
    // per-residue-class (mod 100) stats: first/last member, count,
    // arithmetic-series sum
    val classes: Seq[(Long, ClassStats)] = (0L until 100L).flatMap { b =>
      val first = lo + ((b - lo % 100L) + 100L) % 100L
      val last = (hi - 1) - (((hi - 1) % 100L - b) + 100L) % 100L
      if (first > last) None
      else Some(b -> ClassStats((last - first) / 100L + 1L, first, last))
    }
    classes
      .groupBy { case (b, _) =>
        groupCols.toSeq.map {
          case "bucket" => b
          case "category" => DatagenTable.category(b) // id ≡ b (mod 100) ⇒ id % 4 = b % 4
        }
      }
      .toSeq.sortBy(_._1.mkString(","))
      .map { case (key, members) =>
        val stats = members.map(_._2)
        val keyVals: Seq[Any] = key.map {
          case s: String => UTF8String.fromString(s)
          case v => v
        }
        val aggVals: Seq[Any] = aggs.toSeq.map[Any] {
          case _: CountStar => stats.map(_.n).sum
          case _: Min => stats.map(_.first).min
          case _: Max => stats.map(_.last).max
          case _: Sum => stats.map(_.sum).foldLeft(0L)((a, b) => math.addExact(a, b))
          case other => throw new IllegalArgumentException(s"unpushable aggregate $other")
        }
        (keyVals ++ aggVals).toArray
      }.toArray
  }

  /** The single ungrouped row over [lo, hi) — count 0 / NULL min-max-sum
    * on an empty range (SQL aggregate semantics). */
  def globalRow(lo: Long, hi: Long, aggs: Array[AggregateFunc]): Array[Any] = {
    val empty = hi <= lo
    val n = math.max(0L, hi - lo)
    aggs.map[Any] {
      case _: CountStar => n
      case _: Min => if (empty) null else lo
      case _: Max => if (empty) null else hi - 1
      case _: Sum => if (empty) null else seriesSum(n, lo, hi - 1)
      case other => throw new IllegalArgumentException(s"unpushable aggregate $other")
    }
  }
}

/** PARTIAL aggregate pushdown (supportCompletePushDown = false): the
  * scan keeps the pruned input-partition layout and each partition
  * emits its own closed-form pre-aggregated rows; SPARK plans the
  * final merge on top (count partials re-sum upstream). The shape a
  * sharded store lives in — local aggregation per shard, global merge
  * in the engine. An empty range still plans one partition so the
  * ungrouped COUNT merges to 0, not NULL. */
class DatagenPartialAggScan(
    numRows: Long, numPartitions: Int, lo: Long, hi: Long,
    groupCols: Array[String], aggs: Array[AggregateFunc]) extends Scan with Batch {

  override def readSchema(): StructType = StructType(
    groupCols.map {
      case "bucket" => StructField("bucket", LongType, nullable = false)
      case "category" => StructField("category", StringType, nullable = false)
      case other => throw new IllegalArgumentException(s"unpushable group column $other")
    } ++ aggs.map {
      case _: CountStar => StructField("count_star", LongType, nullable = false)
      case _: Min => StructField("min_id", LongType, nullable = true)
      case _: Max => StructField("max_id", LongType, nullable = true)
      case _: Sum => StructField("sum_id", LongType, nullable = true)
      case other => throw new IllegalArgumentException(s"unpushable aggregate $other")
    })

  override def description(): String =
    s"graft_datagen pushed_aggregation=[${aggs.mkString(", ")}] mode=partial " +
      s"group_by=[${groupCols.mkString(",")}] pushed_id_range=[$lo,$hi)"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (numRows + numPartitions - 1) / numPartitions)
    val live = (0 until numPartitions).iterator
      .map { p =>
        val start = math.max(p * per, lo)
        val end = math.min(math.min((p + 1) * per, numRows), hi)
        DatagenPartition(start, end)
      }
      .filter(p => p.start < p.end)
      .toArray[InputPartition]
    if (live.isEmpty) Array(DatagenPartition(lo, lo)) else live
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DatagenPartialAggReaderFactory(groupCols, aggs)
}

class DatagenPartialAggReaderFactory(groupCols: Array[String], aggs: Array[AggregateFunc])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DatagenPartition]
    val rows: Array[Array[Any]] =
      if (groupCols.nonEmpty) DatagenClosedForm.groupRows(p.start, p.end, groupCols, aggs)
      else Array(DatagenClosedForm.globalRow(p.start, p.end, aggs))
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = InternalRow.fromSeq(rows(i).toSeq)
      override def close(): Unit = ()
    }
  }
}

class DatagenGroupAggReaderFactory(rows: Array[Array[Any]]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = InternalRow.fromSeq(rows(i).toSeq)
      override def close(): Unit = ()
    }
}

class DatagenAggReaderFactory(values: Array[Any]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
      override def close(): Unit = ()
    }
}

class DatagenScan(
    numRows: Long, numPartitions: Int, lo: Long, hi: Long, required: StructType)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** Exact statistics for the pushed range, so the optimizer can see that
    * a narrowed scan is small — e.g. auto-broadcast it in joins (spec'd).
    * Row width is the projected fields' fixed widths (strings estimated). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    private val width = required.fields.map(_.dataType.defaultSize).sum.toLong.max(1L)
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(rows * width)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
  }

  override def description(): String =
    s"graft_datagen rows=$numRows pushed_id_range=[$lo,$hi) columns=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  /** Static range partitioning intersected with the pushed bounds —
    * partitions entirely outside [lo, hi) are never planned. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (numRows + numPartitions - 1) / numPartitions)
    (0 until numPartitions).iterator
      .map { p =>
        val start = math.max(p * per, lo)
        val end = math.min(math.min((p + 1) * per, numRows), hi)
        DatagenPartition(start, end)
      }
      .filter(p => p.start < p.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DatagenReaderFactory(required)
}

case class DatagenPartition(start: Long, end: Long) extends InputPartition

class DatagenReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DatagenPartition]
    // bind column generators once per partition, only for projected fields
    val gens: Array[Long => Any] = required.fields.map { f =>
      f.name match {
        case "id" => (id: Long) => id
        case "bucket" => (id: Long) => DatagenTable.bucket(id)
        case "price" => (id: Long) => DatagenTable.price(id)
        case "category" => (id: Long) => UTF8String.fromString(DatagenTable.category(id))
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    }
    new PartitionReader[InternalRow] {
      // standard V2 reader pattern: ONE mutable row reused across get()
      // calls (the consumer copies what it keeps) — no per-row allocation
      // in the generate loop
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(gens.length)
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        var i = 0
        while (i < gens.length) { row.update(i, gens(i)(cur)); i += 1 }
        row
      }
      override def close(): Unit = ()
    }
  }
}
