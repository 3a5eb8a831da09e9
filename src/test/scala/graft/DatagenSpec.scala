package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.{DatagenScan, DatagenTableProvider}

/** The custom DataSourceV2 connector must do what it claims: pushed id
  * bounds prune input partitions at PLANNING time (not just filter rows),
  * column pruning reaches the reader, non-id predicates stay residual,
  * and the generated values match the documented arithmetic.
  */
class DatagenSpec extends SparkSpec {

  private def read(numRows: Long, numPartitions: Int): DataFrame =
    spark.read.format(classOf[DatagenTableProvider].getName)
      .option("numRows", numRows).option("numPartitions", numPartitions).load()

  private def datagenScan(df: DataFrame): DatagenScan = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case b: BatchScanExec => b.scan }
      .collectFirst { case s: DatagenScan => s }
      .getOrElse(fail("no DatagenScan in plan"))
  }

  test("pushed id bounds prune input partitions at planning time") {
    // 1M rows over 64 partitions = 16384 rows each; id < 16384 is exactly
    // the first partition — 63 of 64 tasks must never be planned
    val df = read(1L << 20, 64).filter(col("id") < 16384L)
    val scan = datagenScan(df)
    assert(scan.planInputPartitions().length === 1,
      s"expected 1 surviving partition, scan: ${scan.description()}")
    assert(scan.description().contains("pushed_id_range=[0,16384)"))
    assert(df.count() === 16384L)
    // a range in the middle prunes both ends
    val mid = read(1L << 20, 64).filter(col("id") >= 100000L && col("id") <= 120000L)
    assert(datagenScan(mid).planInputPartitions().length === 2) // spans parts 6..7
    assert(mid.count() === 20001L)
    // an empty range plans zero partitions
    val empty = read(1L << 20, 64).filter(col("id") === -5L)
    assert(datagenScan(empty).planInputPartitions().length === 0)
    assert(empty.count() === 0L)
  }

  test("column pruning reaches the reader; residual predicates are re-applied") {
    val df = read(10000, 4).filter(col("id") >= 5000L && col("bucket") === 3L)
      .select("id", "bucket")
    val scan = datagenScan(df)
    // only the projected+filtered columns survive into the scan schema
    assert(scan.readSchema().fieldNames.toSet === Set("id", "bucket"))
    // the bucket predicate was NOT pushed (only id bounds are), yet must
    // still hold in the result — Spark re-applies it above the scan
    assert(df.filter(col("bucket") =!= 3L).count() === 0)
    assert(df.count() === 50L) // 5000..9999, every 100th
  }

  test("count/min/max push into the source completely: no aggregate in the plan, zero rows generated") {
    val agged = read(1L << 20, 64)
      .filter(col("id") >= 1000L && col("id") < 500000L)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    val plan = agged.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"),
      s"aggregate must be fully pushed into the scan:\n$plan")
    assert(plan.contains("pushed_aggregation"), s"scan must report the pushed aggregation:\n$plan")
    assert(agged.head() === org.apache.spark.sql.Row(499000L, 1000L, 499999L))
    // empty range: count 0, NULL min/max — same as any SQL aggregate
    val empty = read(1L << 20, 64).filter(col("id") < 0L)
      .agg(count(lit(1)), min("id"), max("id"))
    assert(empty.head() === org.apache.spark.sql.Row(0L, null, null))
    // a residual (non-pushable) predicate blocks aggregate pushdown and
    // the query falls back to a normal plan with correct results
    val residual = read(10000, 4).filter(col("bucket") === 3L)
      .agg(count(lit(1)).as("n"))
    assert(residual.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(residual.head().getLong(0) === 100L)
    // group-bys the source can't answer (price is not a residue class
    // of id) are declined (supportCompletePushDown false) and planned
    // normally
    val grouped = read(1000, 4).groupBy("price").agg(count(lit(1)).as("n"))
    assert(grouped.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(grouped.count() === read(1000, 4).select("price").distinct().count())
  }

  test("closed-form SUM is exact near Long range and fails loudly past it") {
    // n = 2^32 ids: sum = n(n-1)/2 ≈ 9.22e18, a hair UNDER Long.MaxValue —
    // the naive n*(first+last)/2 overflows its intermediate product at a
    // quarter of that. BigInt the expectation independently.
    val n = 1L << 32
    val pushed = read(n, 64).agg(expr("sum(id)").as("s"))
    assert(pushed.queryExecution.executedPlan.toString.contains("pushed_aggregation"))
    val expected = (BigInt(n) * BigInt(n - 1) / 2).toLong
    assert(pushed.head().getLong(0) === expected)
    // one row more and the true sum crosses 2^63: the scan must refuse
    // with a clear message, never return a wrapped-around Long
    val over = read(n + 2, 64).agg(expr("sum(id)").as("s"))
    val e = intercept[Exception] { over.head() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("overflows")),
      s"expected a loud overflow refusal, got: ${e.getMessage}")
  }

  test("GROUP BY bucket pushes completely: <=100 pre-aggregated rows, no aggregate planned") {
    val grouped = read(1L << 20, 64).filter(col("id") >= 1000L && col("id") < 5250L)
      .groupBy("bucket").agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    val plan = grouped.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"),
      s"grouped aggregate must be fully pushed into the scan:\n$plan")
    assert(plan.contains("group_by=[bucket]"), s"scan must report the pushed group-by:\n$plan")
    // closed-form check: [1000, 5250) covers 42 full centuries + a half;
    // buckets 0-49 get 43 rows, 50-99 get 42
    val rows = grouped.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.size === 100)
    assert(rows(7L) === ((43L, 1007L, 5207L)))
    assert(rows(73L) === ((42L, 1073L, 5173L)))
    // empty groups are OMITTED, not emitted as zero: a 30-id range has
    // exactly 30 groups
    val sparse = read(1L << 20, 64).filter(col("id") >= 100L && col("id") < 130L)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    assert(sparse.count() === 30L)
    // parity with the unpushed plan: the residual bucket predicate blocks
    // aggregate pushdown (trivially true, so the row set is identical),
    // forcing real generation + HashAggregate — results must match
    val unpushed = read(1L << 20, 64)
      .filter(col("id") >= 1000L && col("id") < 5250L && col("bucket") >= 0L)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    assert(unpushed.queryExecution.executedPlan.toString.contains("HashAggregate"))
    val unpushedRows = unpushed.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows === unpushedRows)
  }

  test("multi-column GROUP BY and SUM push: residue-class unions, monoid-merged") {
    // category = id % 4 and 4 | 100, so (category, bucket) still yields
    // 100 groups while category alone merges 25 classes per group
    val pair = read(1L << 20, 64).filter(col("id") >= 1000L && col("id") < 5250L)
      .groupBy("category", "bucket").agg(count(lit(1)).as("n"), sum("id").as("s"))
    val pairPlan = pair.queryExecution.executedPlan.toString
    assert(!pairPlan.contains("HashAggregate"), s"pair group-by must push:\n$pairPlan")
    assert(pairPlan.contains("group_by=[category,bucket]"))
    val pairRows = pair.collect()
    assert(pairRows.length === 100)
    // bucket 7 ids in [1000, 5250): 1007, 1107, ..., 5207 — 43 terms
    val b7 = pairRows.find(_.getLong(1) === 7L).get
    assert(b7.getString(0) === "cat_3") // 7 % 4
    assert(b7.getLong(2) === 43L && b7.getLong(3) === (1007L + 5207L) * 43L / 2)
    val catOnly = read(1L << 20, 64).filter(col("id") >= 1000L && col("id") < 5250L)
      .groupBy("category").agg(count(lit(1)).as("n"), sum("id").as("s"))
    assert(!catOnly.queryExecution.executedPlan.toString.contains("HashAggregate"))
    // parity for both shapes against the residual-blocked (generated) plan
    def gen(cols: String*) = read(1L << 20, 64)
      .filter(col("id") >= 1000L && col("id") < 5250L && col("bucket") >= 0L)
      .groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"), sum("id").as("s"))
      .collect().map(r => r.toSeq.init.mkString("|") -> r.getLong(r.length - 1)).toMap
    def pushedMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.init.mkString("|") -> r.getLong(r.length - 1)).toMap
    assert(pushedMap(catOnly) === gen("category"))
    assert(pushedMap(pair) === gen("category", "bucket"))
    // global SUM also answers closed-form: no aggregate in the plan
    val g = read(1L << 20, 64).filter(col("id") >= 1000L && col("id") < 5250L)
      .agg(sum("id").as("s"))
    assert(!g.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(g.head().getLong(0) === (1000L + 5249L) * 4250L / 2)
  }

  test("partial aggregate pushdown: scan emits per-partition partials, Spark merges") {
    def readPartial(n: Long, parts: Int) =
      spark.read.format(classOf[graft.sources.DatagenTableProvider].getName)
        .option("numRows", n.toString).option("numPartitions", parts.toString)
        .option("aggMode", "partial").load()
    // grouped: each of the pruned partitions emits its own group rows;
    // the final HashAggregate (planned by SPARK, unlike complete mode)
    // must merge them to exactly the complete-mode answer
    val part = readPartial(1L << 20, 64).filter(col("id") >= 1000L && col("id") < 5250L)
      .groupBy("bucket").agg(count(lit(1)).as("n"), min("id").as("lo"),
        max("id").as("hi"), sum("id").as("s"))
    val plan = part.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"partial mode needs Spark's final merge:\n$plan")
    assert(plan.contains("mode=partial"), s"scan must report partial mode:\n$plan")
    val complete = read(1L << 20, 64).filter(col("id") >= 1000L && col("id") < 5250L)
      .groupBy("bucket").agg(count(lit(1)).as("n"), min("id").as("lo"),
        max("id").as("hi"), sum("id").as("s"))
    assert(part.collect().toSet === complete.collect().toSet)
    // ungrouped: count partials must re-merge via SUM — and an empty
    // range still answers 0, not NULL (the scan plans one partition)
    val g = readPartial(1L << 20, 64).filter(col("id") >= 1000L && col("id") < 5250L)
      .agg(count(lit(1)), min("id"), max("id"), sum("id"))
    assert(g.head() === org.apache.spark.sql.Row(4250L, 1000L, 5249L, (1000L + 5249L) * 4250L / 2))
    val empty = readPartial(1L << 20, 64).filter(col("id") < 0L)
      .agg(count(lit(1)), min("id"), max("id"))
    assert(empty.head() === org.apache.spark.sql.Row(0L, null, null))
  }

  test("limit pushes into the source: the range shrinks and partitions drop") {
    val limited = read(1L << 20, 64).filter(col("id") >= 32768L).limit(100)
    val scan = datagenScan(limited)
    assert(scan.description().contains("pushed_id_range=[32768,32868)"),
      s"limit must shrink the pushed range: ${scan.description()}")
    assert(scan.planInputPartitions().length === 1)
    assert(limited.count() === 100L)
    // limit larger than the range is a no-op
    val big = read(1000, 4).limit(5000)
    assert(big.count() === 1000L)
    // a pushed lower bound near Long.MaxValue must saturate, not throw
    // ArithmeticException at planning time: the scan clamps to an empty
    // range (lo > numRows) and the query returns zero rows
    val nearMax = read(1000, 4).filter(col("id") >= Long.MaxValue - 1L).limit(3)
    assert(datagenScan(nearMax).planInputPartitions().length === 0)
    assert(nearMax.count() === 0L)
  }

  test("reported statistics let the optimizer broadcast a narrowed scan") {
    val dim = read(1L << 20, 64).filter(col("id") < 200L)
    val scan = datagenScan(dim)
    val stats = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong === 200L)
    // a fact table large enough that broadcasting IT would be wrong
    val fact = spark.range(0, 500000).select(
      (col("id") % 200).as("id"), (col("id") * 3).as("payload"))
    val joined = fact.join(read(1L << 20, 64).filter(col("id") < 200L), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the 200-row pruned scan must broadcast:\n$plan")
    assert(joined.count() === 500000L)
  }

  test("generated values match the documented arithmetic on every partitioning") {
    val expected = spark.range(0, 2000).select(
      col("id"),
      (col("id") % 100).as("bucket"),
      ((col("id") * 7919L % 100000L).cast("double") / 100.0).as("price"),
      concat(lit("cat_"), (col("id") % 4).cast("string")).as("category"))
    for (parts <- Seq(1, 7, 32)) {
      val got = read(2000, parts)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"value mismatch at numPartitions=$parts")
    }
  }
}
