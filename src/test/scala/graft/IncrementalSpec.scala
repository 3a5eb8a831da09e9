package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{IncrementalStrategy, Materialization, Model, Registry}

/** Incremental materialization contract (dbt `materialized: incremental`,
  * delete+insert merge on a unique key): first run = full build; later
  * runs see the current table as ref("this"), return only the new batch,
  * and the registry replaces matched keys wholesale and appends new ones.
  * The invariant that matters: an incremental run must land on EXACTLY
  * the state a from-scratch rebuild over the full source produces.
  */
class IncrementalSpec extends SparkSpec {

  import spark.implicits._

  private def src(rows: Seq[(Long, String, Int)]): DataFrame =
    rows.toDF("id", "payload", "updated_at")

  // the model: latest payload per id, taking only rows newer than the
  // table's high-water mark when running incrementally (the standard
  // dbt is_incremental() filter shape)
  private val stateModel = Model(
    name = "state",
    deps = Seq("events_src"),
    materialization = Materialization.Incremental(IncrementalStrategy.DeleteInsert("id")),
    build = refs => {
      val events = refs("events_src")
      val batch = refs.get("this") match {
        case Some(existing) =>
          val hwm = existing.agg(max("updated_at")).head().getInt(0)
          events.filter(col("updated_at") > hwm)
        case None => events
      }
      batch.groupBy("id").agg(
        max(struct(col("updated_at"), col("payload"))).as("s"))
        .select(col("id"), col("s.payload").as("payload"), col("s.updated_at").as("updated_at"))
    })

  test("incremental run converges to the from-scratch rebuild") {
    val dir = Files.createTempDirectory("graft_incr").toString
    val reg = new Registry(Seq(stateModel))

    val gen1 = Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 11))
    val run1 = reg.run(spark, Map("events_src" -> src(gen1)), Some(dir))("state")
    assert(run1.count() === 3)

    // second generation: id=2 updated, id=4 new, id=1/3 untouched
    val gen2 = gen1 ++ Seq((2L, "b2", 12), (4L, "d", 13))
    val run2 = reg.run(spark, Map("events_src" -> src(gen2)), Some(dir))("state")

    val fromScratch = {
      val freshDir = Files.createTempDirectory("graft_incr_fresh").toString
      reg.run(spark, Map("events_src" -> src(gen2)), Some(freshDir))("state")
    }
    assert(run2.exceptAll(fromScratch).isEmpty && fromScratch.exceptAll(run2).isEmpty,
      "incremental state must equal the from-scratch rebuild")
    // the updated key carries the new payload; untouched keys survive
    assert(run2.filter(col("id") === 2).select("payload").head().getString(0) === "b2")
    assert(run2.filter(col("id") === 1).select("payload").head().getString(0) === "a")
    assert(run2.count() === 4)
  }

  test("incremental model sees only the post-high-water-mark batch") {
    val dir = Files.createTempDirectory("graft_incr2").toString
    var batchSizes = List.empty[Long]
    val spying = stateModel.copy(build = refs => {
      val out = stateModel.build(refs)
      if (refs.contains("this")) batchSizes ::= out.count()
      out
    })
    val reg = new Registry(Seq(spying))
    val gen1 = Seq((1L, "a", 10), (2L, "b", 10))
    reg.run(spark, Map("events_src" -> src(gen1)), Some(dir))
    val gen2 = gen1 ++ Seq((3L, "c", 15))
    reg.run(spark, Map("events_src" -> src(gen2)), Some(dir))
    assert(batchSizes === List(1L), "second run must process only the 1-row batch")
    // a no-op run (no rows past the high-water mark) leaves the table intact
    val out = reg.run(spark, Map("events_src" -> src(gen2)), Some(dir))("state")
    assert(out.count() === 3)
  }

  test("append strategy accumulates batches without touching existing rows") {
    val dir = Files.createTempDirectory("graft_incr_app").toString
    val appendModel = stateModel.copy(
      materialization = Materialization.Incremental(IncrementalStrategy.Append))
    val reg = new Registry(Seq(appendModel))
    val gen1 = Seq((1L, "a", 10), (2L, "b", 10))
    reg.run(spark, Map("events_src" -> src(gen1)), Some(dir))
    // id=1 re-observed later: append KEEPS both versions (event-log
    // semantics), unlike delete+insert
    val gen2 = gen1 ++ Seq((1L, "a2", 12))
    val out = reg.run(spark, Map("events_src" -> src(gen2)), Some(dir))("state")
    assert(out.count() === 3)
    assert(out.filter(col("id") === 1).count() === 2)
    assert(!new java.io.File(s"$dir/state__staging").exists())
  }

  test("the Jaffle orders mart runs incrementally and lands on the full rebuild") {
    import graft.models.Jaffle
    val seeds = graft.seed.SeedLoader.loadJaffleSeeds(spark, "/root/reference/seeds")
    // incremental variant of the reference orders mart: batch = orders
    // past the mart's order_date high-water mark, re-pivoted against the
    // full payments feed (the join restricts it to the batch orders)
    val incOrders = Model(
      name = "orders",
      deps = Seq("stg_orders", "stg_payments"),
      materialization = Materialization.Incremental(IncrementalStrategy.DeleteInsert("order_id")),
      build = refs => {
        val stgOrders = refs.get("this") match {
          case Some(existing) =>
            val hwm = existing.agg(max("order_date")).head().getDate(0)
            refs("stg_orders").filter(col("order_date") > lit(hwm))
          case None => refs("stg_orders")
        }
        Jaffle.orders(stgOrders, refs("stg_payments"))
      })
    val staging = Seq(
      Model("stg_orders", Seq("raw_orders"), Materialization.View,
        refs => Jaffle.stgOrders(refs("raw_orders"))),
      Model("stg_payments", Seq("raw_payments"), Materialization.View,
        refs => Jaffle.stgPayments(refs("raw_payments"))))
    val reg = new Registry(staging :+ incOrders)

    val dir = Files.createTempDirectory("graft_incr_jaffle").toString
    val cutoff = java.sql.Date.valueOf("2018-03-01")
    val earlySeeds = seeds + ("raw_orders" ->
      seeds("raw_orders").filter(col("order_date") < lit(cutoff)))
    val run1 = reg.run(spark, earlySeeds, Some(dir))("orders")
    val run1Count = run1.count()
    assert(run1Count > 0 && run1Count < 99, "cutoff must split the seed orders")

    val incremental = reg.run(spark, seeds, Some(dir))("orders")
    val fullRebuild = Jaffle.registry
      .run(spark, seeds, Some(Files.createTempDirectory("graft_full_jaffle").toString))("orders")
    assert(incremental.count() === 99)
    assert(incremental.exceptAll(fullRebuild).isEmpty &&
      fullRebuild.exceptAll(incremental).isEmpty,
      "incremental orders mart must equal the from-scratch reference mart")
  }

  test("schema drift: a batch with a new column widens the table, old rows back-fill NULL") {
    val dir = Files.createTempDirectory("graft_incr_drift").toString
    val reg = new Registry(Seq(stateModel.copy(build = refs => {
      val base = stateModel.build(refs)
      // generation 2 of the producer adds a column the table predates
      if (refs("events_src").columns.contains("region"))
        base.join(refs("events_src").select("id", "region").distinct(), Seq("id"), "left")
      else base
    })))
    reg.run(spark, Map("events_src" -> src(Seq((1L, "a", 10), (2L, "b", 10)))), Some(dir))
    val drifted = src(Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 15)))
      .withColumn("region", concat(lit("r"), col("id")))
    val out = reg.run(spark, Map("events_src" -> drifted), Some(dir))("state")
    assert(out.columns.contains("region"), "table schema must widen")
    assert(out.filter(col("id") === 3).select("region").head().getString(0) === "r3")
    assert(out.filter(col("id") === 1).select("region").head().get(0) == null,
      "pre-drift rows must back-fill NULL")
    assert(out.count() === 3)
  }

  test("crash recovery: an orphaned staging dir is promoted as the table") {
    val dir = Files.createTempDirectory("graft_incr_crash").toString
    val reg = new Registry(Seq(stateModel))
    val gen1 = Seq((1L, "a", 10), (2L, "b", 10))
    reg.run(spark, Map("events_src" -> src(gen1)), Some(dir))
    // simulate a swap that died between its two renames: the live table
    // is gone, the complete new state sits in __staging
    assert(new java.io.File(s"$dir/state")
      .renameTo(new java.io.File(s"$dir/state__staging")))
    val out = reg.run(spark, Map("events_src" -> src(gen1 :+ ((3L, "c", 11)))), Some(dir))("state")
    // recovery promoted staging, then the run proceeded INCREMENTALLY
    // (3 rows, not a 1-row first-run rebuild of the filtered source)
    assert(out.count() === 3)
    assert(out.filter(col("id") === 1).count() === 1, "pre-crash rows must survive recovery")
    assert(!new java.io.File(s"$dir/state__staging").exists())
    assert(!new java.io.File(s"$dir/state__retired").exists())
  }

  test("a failed staging swap never corrupts the table: staging dir is separate") {
    val dir = Files.createTempDirectory("graft_incr3").toString
    val reg = new Registry(Seq(stateModel))
    val gen1 = Seq((1L, "a", 10))
    reg.run(spark, Map("events_src" -> src(gen1)), Some(dir))
    // after a successful incremental run, no staging residue remains
    reg.run(spark, Map("events_src" -> src(gen1 :+ ((2L, "b", 11)))), Some(dir))
    assert(!new java.io.File(s"$dir/state__staging").exists())
    assert(spark.read.parquet(s"$dir/state").count() === 2)
  }
}
