package graft

import org.apache.spark.sql.functions._

import graft.sources.Warehouse

/** Physical-layout capabilities: partition pruning and shuffle-free
  * bucketed joins — asserted against the actual physical plans, not just
  * results.
  */
class WarehouseSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("warehouse").toString

  test("partitioned write + predicate -> partition pruning in the scan") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("order_year", year(col("o_orderdate")))
    Warehouse.writePartitioned(orders, s"$tmp/orders_by_year", Seq("order_year"))

    val pruned = Warehouse.readPartitioned(spark, s"$tmp/orders_by_year")
      .filter(col("order_year") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("order_year"),
      s"expected partition pruning in plan:\n$plan")
    // pruning must not change results
    val expected = orders.filter(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() === expected)
    assert(expected > 0)
  }

  test("bucketed tables sort-merge join with no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    Warehouse.writeBucketed(Tables.load(spark, dir, "lineitem"),
      "lineitem_b", "l_orderkey", numBuckets = 4, Some(s"$tmp/lineitem_b"))
    Warehouse.writeBucketed(
      Tables.load(spark, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
      "orders_b", "l_orderkey", numBuckets = 4, Some(s"$tmp/orders_b"))

    // force a merge join (broadcast would trivially avoid the exchange)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Warehouse.readTable(spark, "lineitem_b")
        .join(Warehouse.readTable(spark, "orders_b"), Seq("l_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderstatus")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should have no shuffle exchange:\n$plan")

      // and the result matches the plain (shuffling) join
      val plain = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"), col("o_orderstatus"))
      assert(joined.count() === plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("mergeSchema read: union schema, NULL back-fill, pushdown and pruning intact") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    orders.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/evo/gen1")
    orders.filter(col("o_orderkey") % 2 =!= 0)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$tmp/evo/gen2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$tmp/evo/gen1", s"$tmp/evo/gen2")
    // union of the generations' schemas, in first-seen order
    assert(merged.columns.toSeq ===
      Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"))
    // pre-evolution rows surface NULL for the added column; no row lost
    assert(merged.count() === orders.count())
    assert(merged.filter(col("o_orderstatus").isNull).count() ===
      orders.filter(col("o_orderkey") % 2 === 0).count())
    // the evolved scan is still a real columnar scan: filters on shared
    // columns reach parquet and unused columns are pruned
    val filtered = merged.filter(col("o_custkey") === 7L).select("o_orderkey", "o_orderstatus")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)"),
      s"filter not pushed through mergeSchema scan:\n$scan")
    assert(!scan.contains("o_totalprice"), s"unused column not pruned:\n$scan")
  }

  test("zOrderValue interleaves bits exactly (Morton code)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L)).toDF("x", "y")
    // min 0, max 3, bits 2 -> scaling is the identity on 0..3
    val z = df.select(col("x"), col("y"),
      Warehouse.zOrderValue(df, Seq("x", "y"), bits = 2).as("z"))
      .as[(Long, Long, Long)].collect().map { case (x, y, zv) => (x, y) -> zv }.toMap
    // bit i of x lands at position 2i, bit i of y at 2i+1
    assert(z((0L, 0L)) === 0L)
    assert(z((3L, 0L)) === 5L)  // 0b0101
    assert(z((0L, 3L)) === 10L) // 0b1010
    assert(z((3L, 3L)) === 15L) // 0b1111
    assert(z((2L, 1L)) === 6L)  // x=0b10 -> 0b0100; y=0b01 -> 0b0010
  }

  test("zOrderValue: NULL in any clustered column yields a NULL z-value") {
    import spark.implicits._
    val df = Seq((Option(1L), Option(2L)), (None, Option(2L)), (Option(1L), None))
      .toDF("x", "y")
    val zs = df.select(Warehouse.zOrderValue(df, Seq("x", "y"), bits = 2).as("z"))
      .as[Option[Long]].collect()
    assert(zs.count(_.isEmpty) === 2 && zs.count(_.isDefined) === 1)
  }

  test("z-ordered layout keeps per-file ranges tight on BOTH columns (data skipping)") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
    val nFiles = 16

    def meanFileCoverage(path: String, probeCol: String): Double = {
      val df = spark.read.parquet(path)
      val ranges = df.groupBy(input_file_name().as("f"))
        .agg(min(col(probeCol)).as("lo"), max(col(probeCol)).as("hi"))
        .select("lo", "hi").collect().map(r => (r.getLong(0), r.getLong(1)))
      // range-boundary sampling may merge a few of the requested splits
      assert(ranges.length >= nFiles / 2, s"expected ≥${nFiles / 2} files, got ${ranges.length}")
      // probe a spread of actual values: fraction of files whose [lo, hi]
      // would have to be read for an equality predicate on that value
      val probes = df.select(probeCol).distinct().orderBy(col(probeCol))
        .collect().map(_.getLong(0)).grouped(30).map(_.head).toSeq
      probes.map(v => ranges.count { case (lo, hi) => lo <= v && v <= hi }.toDouble / ranges.length)
        .sum / probes.size
    }

    Warehouse.writeZOrdered(events, s"$tmp/events_z", Seq("user_id", "t"), nFiles)
    // baseline: single-column sort — perfect on user_id, useless on t
    events.repartitionByRange(nFiles, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(s"$tmp/events_lin")

    val zUser = meanFileCoverage(s"$tmp/events_z", "user_id")
    val zTime = meanFileCoverage(s"$tmp/events_z", "t")
    val linTime = meanFileCoverage(s"$tmp/events_lin", "t")
    // the linear layout spreads every time value across ~all files; the
    // z-order trades a little user_id locality for skipping on BOTH
    assert(linTime > 0.9, s"linear layout should cover ~all files per t probe, got $linTime")
    assert(zTime < 0.6, s"z-order should skip time-probing files, got $zTime")
    assert(zUser < 0.6, s"z-order should skip user-probing files, got $zUser")
    // clustering must not lose rows
    assert(spark.read.parquet(s"$tmp/events_z").count() === events.count())
  }
}
