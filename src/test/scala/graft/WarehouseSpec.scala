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
}
