package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.TemporalOps

class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin attaches the most recent right row; equal time matches; no prior -> NULL") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:05")),
      (2L, 10L, ts("2024-01-01 10:01:00")),
      (3L, 10L, ts("2024-01-01 09:59:00")), // before any quote
      (4L, 20L, ts("2024-01-01 10:00:00"))  // equal-time match
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100.0),
      (10L, ts("2024-01-01 10:00:30"), 101.0),
      (20L, ts("2024-01-01 10:00:00"), 55.0)
    ).toDF("qsym", "qt", "price")
    val out = TemporalOps.asOfJoin(trades, "sym", "t", quotes, "qsym", "qt", Seq("price"))
      .select("trade_id", "price").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(100.0)) // 10:00:05 -> quote at 10:00:00
    assert(out(2L) === Some(101.0)) // 10:01:00 -> quote at 10:00:30
    assert(out(3L) === None)        // nothing at or before 09:59
    assert(out(4L) === Some(55.0))  // equal time is inclusive
  }

  test("asOfJoin preserves every left row (left-outer semantics)") {
    val left = Seq((1L, 99L, ts("2024-01-01 00:00:00"))).toDF("id", "k", "t")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("rk", "rt", "v")
    val out = TemporalOps.asOfJoin(left, "k", "t", right, "rk", "rt", Seq("v"))
    assert(out.count() === 1L) // key 99 has no right rows, row kept with NULL v
    assert(out.head.isNullAt(out.columns.indexOf("v")))
  }

  test("asOfJoinNative: plan uses AsOfJoinExec and matches the composition on edge cases") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:05")),
      (2L, 10L, ts("2024-01-01 10:01:00")),
      (3L, 10L, ts("2024-01-01 09:59:00")),
      (4L, 20L, ts("2024-01-01 10:00:00")),
      (5L, 99L, ts("2024-01-01 10:00:00")) // key with no right rows
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100.0),
      (10L, ts("2024-01-01 10:00:30"), 101.0),
      (10L, ts("2024-01-01 10:00:30"), 102.0), // duplicate (key, time): greatest payload wins
      (20L, ts("2024-01-01 10:00:00"), 55.0)
    ).toDF("qsym", "qt", "price")
    val native = TemporalOps.asOfJoinNative(trades, "sym", "t", quotes, "qsym", "qt", Seq("price"))
    // nodeName strips the Exec suffix in plan strings
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin "))
    val out = native.select("trade_id", "price").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(100.0))
    assert(out(2L) === Some(102.0)) // duplicate-time tie-break
    assert(out(3L) === None)
    assert(out(4L) === Some(55.0))
    assert(out(5L) === None)
    val composed = TemporalOps.asOfJoin(trades, "sym", "t", quotes, "qsym", "qt", Seq("price"))
      .select("trade_id", "price").as[(Long, Option[Double])].collect().toMap
    assert(out === composed)
  }

  test("asOfJoinNative: NULL left key/time get NULL payload; NULL right key/time dropped") {
    val left = Seq(
      (1L, Option(10L), Option(ts("2024-01-01 10:00:05"))),
      (2L, None: Option[Long], Option(ts("2024-01-01 10:00:05"))), // NULL key
      (3L, Option(10L), None: Option[Timestamp]) // NULL time
    ).toDF("id", "k", "t")
    val right = Seq(
      (Option(10L), Option(ts("2024-01-01 10:00:00")), 1.0),
      (None: Option[Long], Option(ts("2024-01-01 09:00:00")), 2.0), // NULL key: never matches
      (Option(10L), None: Option[Timestamp], 3.0) // NULL time: never matches
    ).toDF("rk", "rt", "v")
    val out = TemporalOps.asOfJoinNative(left, "k", "t", right, "rk", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("asOfJoinNative matches the composition row-for-row on real data (aj1 shape)") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val lastOrders = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate").as("last_order_date"))
      .agg(max("o_orderkey").as("last_order_key"))
    val cols = Seq("event_id", "user_id", "ts", "last_order_date", "last_order_key")
    val native = TemporalOps.asOfJoinNative(events, "user_id", "ts",
      lastOrders, "o_custkey", "last_order_date", Seq("last_order_date", "last_order_key"))
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    val composed = TemporalOps.asOfJoin(events, "user_id", "ts",
      lastOrders, "o_custkey", "last_order_date", Seq("last_order_date", "last_order_key"))
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    assert(native.length === composed.length)
    assert(native.sameElements(composed))
  }

  test("asOfJoinNative: LocalLimit pushes through to the left side (custom optimizer rule)") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val lastOrders = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate").as("last_order_date"))
      .agg(max("o_orderkey").as("last_order_key"))
    val limited = TemporalOps.asOfJoinNative(events, "user_id", "ts",
      lastOrders, "o_custkey", "last_order_date", Seq("last_order_date", "last_order_key"))
      .limit(7)
    val pushed = limited.queryExecution.optimizedPlan.collect {
      case aj: graft.plans.AsOfJoin =>
        aj.left.collectFirst { case l: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => l }
    }
    assert(pushed.nonEmpty && pushed.head.isDefined,
      s"expected LocalLimit below AsOfJoin:\n${limited.queryExecution.optimizedPlan}")
    // rows still carry correct as-of matches: every returned row must agree
    // with the full (unlimited) join on its event_id
    val full = TemporalOps.asOfJoinNative(events, "user_id", "ts",
      lastOrders, "o_custkey", "last_order_date", Seq("last_order_date", "last_order_key"))
      .collect().map(r => r.getLong(0) -> r.toString).toMap
    val rows = limited.collect()
    assert(rows.length === 7)
    rows.foreach(r => assert(full(r.getLong(0)) === r.toString))
  }

  test("asOfJoinNative: left-only filters push below the join; payload filters stay above") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val lastOrders = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate").as("last_order_date"))
      .agg(max("o_orderkey").as("last_order_key"))
    def join() = TemporalOps.asOfJoinNative(events, "user_id", "ts",
      lastOrders, "o_custkey", "last_order_date", Seq("last_order_date", "last_order_key"))

    // left-only predicate lands below the AsOfJoin node
    val leftFiltered = join().filter(col("user_id") < 100)
    val pushedDown = leftFiltered.queryExecution.optimizedPlan.collect {
      case aj: graft.plans.AsOfJoin =>
        aj.left.collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }
    }
    assert(pushedDown.nonEmpty && pushedDown.head.isDefined,
      s"left filter not pushed:\n${leftFiltered.queryExecution.optimizedPlan}")
    // and results match filtering after the fact
    val expected = join().collect().filter(_.getLong(1) < 100).map(_.toString).sorted
    assert(leftFiltered.collect().map(_.toString).sorted.sameElements(expected))

    // payload predicate must NOT push (it depends on the match)
    val payloadFiltered = join().filter(col("last_order_key") > 0)
    val wronglyPushed = payloadFiltered.queryExecution.optimizedPlan.collect {
      case aj: graft.plans.AsOfJoin =>
        aj.left.collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }
    }
    assert(wronglyPushed.forall(_.isEmpty),
      s"payload filter wrongly pushed:\n${payloadFiltered.queryExecution.optimizedPlan}")
  }

  test("asOfJoinNative survives aggressive AQE partition coalescing (co-partitioning)") {
    // force AQE to coalesce the post-shuffle partitions hard; if it ever
    // coalesced the two sides differently, the exec's zipPartitions would
    // throw — and results must stay identical to the composition
    val prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256MB")
    try {
      val dir = "/root/testdata/sf0.001"
      val events = Tables.events(spark, dir).select("event_id", "user_id", "ts")
      val lastOrders = Tables.load(spark, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate").as("last_order_date"))
        .agg(max("o_orderkey").as("last_order_key"))
      val native = TemporalOps.asOfJoinNative(events, "user_id", "ts",
        lastOrders, "o_custkey", "last_order_date", Seq("last_order_date", "last_order_key"))
        .collect().map(_.toString).sorted
      val composed = TemporalOps.asOfJoin(events, "user_id", "ts",
        lastOrders, "o_custkey", "last_order_date", Seq("last_order_date", "last_order_key"))
        .collect().map(_.toString).sorted
      assert(native.sameElements(composed))
    } finally spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)
  }

  test("rangeSelfJoin: strict lower bound, inclusive upper, cross-bucket pairs found") {
    val events = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:04:59")), // within 5min of 1 (cross-bucket likely)
      (3L, 7L, ts("2024-01-01 10:05:00")), // exactly +5min of 1 -> inclusive
      (4L, 7L, ts("2024-01-01 10:10:01")), // > 5min after 3 -> no pair with 3
      (5L, 8L, ts("2024-01-01 10:00:30"))  // other key
    ).toDF("event_id", "user_id", "t")
    val pairs = TemporalOps.rangeSelfJoin(events, "user_id", "t", "event_id", 300L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L))) // 3->4 is 301s; strict > excludes self
  }

  test("rangeSelfJoin matches a brute-force computation on real events") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val fast = TemporalOps.rangeSelfJoin(events, "user_id", "ts", "event_id", 300L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = events.select(col("user_id").as("k"), col("event_id").as("id_a"), col("ts").as("t_a"))
    val b = events.select(col("user_id").as("k"), col("event_id").as("id_b"), col("ts").as("t_b"))
    val brute = a.join(b, Seq("k"))
      .filter(unix_micros(col("t_b")) > unix_micros(col("t_a")) &&
        unix_micros(col("t_b")) <= unix_micros(col("t_a")) + 300000000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(fast === brute)
  }
}
