package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.models.Jaffle
import graft.quality.Checks
import graft.seed.SeedLoader

/** Golden-output parity tests against the reference's own seed data
  * (SURVEY.md §5). Every expected value below is fully determined by the
  * three CSVs under /root/reference/seeds (data, not code).
  */
class JaffleParitySpec extends SparkSpec {

  private val seedDir = "/root/reference/seeds"

  private lazy val rel: Map[String, org.apache.spark.sql.DataFrame] = {
    val seeds = SeedLoader.loadJaffleSeeds(spark, seedDir)
    Jaffle.registry.run(spark, seeds, tableDir = None)
  }

  test("seeds load with golden row counts 100/99/113") {
    assert(rel("raw_customers").count() === 100L)
    assert(rel("raw_orders").count() === 99L)
    assert(rel("raw_payments").count() === 113L)
  }

  test("staging models rename and type correctly") {
    assert(rel("stg_customers").columns.toSeq === Seq("customer_id", "first_name", "last_name"))
    assert(rel("stg_orders").columns.toSeq === Seq("order_id", "customer_id", "order_date", "status"))
    assert(rel("stg_payments").columns.toSeq === Seq("payment_id", "order_id", "payment_method", "amount"))
    // cents -> dollars is exact decimal, not double (SURVEY.md §1.4)
    assert(rel("stg_payments").schema("amount").dataType === graft.schema.Schemas.money)
  }

  test("customers mart: 100 rows, 38 orderless customers keep NULL (not 0) aggregates") {
    val c = rel("customers").cache()
    assert(c.count() === 100L)
    val orderless = c.filter(col("number_of_orders").isNull).cache()
    assert(orderless.count() === 38L)
    // NULL discipline: all aggregate columns NULL together for orderless rows
    assert(orderless.filter(
      col("first_order").isNotNull || col("most_recent_order").isNotNull ||
        col("customer_lifetime_value").isNotNull).count() === 0L)
    assert(c.columns.toSeq === Seq("customer_id", "first_name", "last_name",
      "first_order", "most_recent_order", "number_of_orders", "customer_lifetime_value"))
  }

  test("orders mart: 99 rows, pivot columns reconcile with total") {
    val o = rel("orders").cache()
    assert(o.count() === 99L)
    assert(o.columns.toSeq === Seq("order_id", "customer_id", "order_date", "status",
      "credit_card_amount", "coupon_amount", "bank_transfer_amount", "gift_card_amount", "amount"))
    // every order has >=1 payment (SURVEY.md §1.2) so no NULL amounts
    assert(o.filter(col("amount").isNull).count() === 0L)
    // pivot-sum invariant: methods are exhaustive, so parts sum to the total
    val broken = o.filter(
      col("credit_card_amount") + col("coupon_amount") +
        col("bank_transfer_amount") + col("gift_card_amount") =!= col("amount"))
    assert(broken.count() === 0L)
  }

  test("money reconciles end-to-end: sum(orders.amount) == sum(raw_payments.amount)/100") {
    val fromMart = rel("orders").agg(sum("amount")).head.getDecimal(0)
    val fromRaw = rel("raw_payments").agg((sum("amount") / 100).cast(graft.schema.Schemas.money))
      .head.getDecimal(0)
    assert(fromMart.compareTo(fromRaw) === 0)
  }

  test("spot-check: customer 1 computed by hand from the CSVs") {
    // customer 1 (Michael P.) has orders 1 (2018-01-01, returned) and
    // 37 (2018-02-10, completed); payments 1 (credit_card, 1000c) and
    // 42 (credit_card, 2300c) -> CLV 33.00
    val row: Row = rel("customers").filter(col("customer_id") === 1).head
    assert(row.getAs[String]("first_name") === "Michael")
    assert(row.getAs[java.sql.Date]("first_order").toString === "2018-01-01")
    assert(row.getAs[java.sql.Date]("most_recent_order").toString === "2018-02-10")
    assert(row.getAs[Long]("number_of_orders") === 2L)
    assert(row.getAs[java.math.BigDecimal]("customer_lifetime_value").doubleValue() === 33.0)
  }

  test("multi-payment orders aggregate, including same-method pairs (orders 18/49/51/79)") {
    val o = rel("orders")
    // order 18 has two credit_card payments (SURVEY.md §1.2) — a true SUM, not pick-one
    val r18 = o.filter(col("order_id") === 18).head
    val cc = r18.getAs[java.math.BigDecimal]("credit_card_amount")
    assert(cc.compareTo(r18.getAs[java.math.BigDecimal]("amount")) === 0)
  }

  test("all 20 reference schema tests pass (Q1-Q4 operators)") {
    val suite = Checks.jaffleSuite(rel)
    assert(suite.size === 20)
    val failures = suite.filterNot(_.passes).map(_.name)
    assert(failures.isEmpty, s"failing checks: $failures")
  }

  test("quality operators actually detect violations (negative cases)") {
    import spark.implicits._
    val dirty = Seq((1, "a"), (1, "b"), (2, null.asInstanceOf[String]))
      .toDF("id", "v")
    assert(Checks.unique(dirty, "id").count() === 1L)      // id=1 duplicated
    assert(Checks.notNull(dirty, "v").count() === 1L)
    assert(Checks.acceptedValues(dirty, "v", Seq("a")).count() === 1L) // "b"; NULL passes
    val parent = Seq(1).toDF("pk")
    assert(Checks.relationships(dirty, "id", parent, "pk").count() === 1L) // id=2 orphan
  }

  test("registry topo-orders the DAG and rejects cycles") {
    val order = Jaffle.registry.topoOrder.map(_.name)
    def before(a: String, b: String) = order.indexOf(a) < order.indexOf(b)
    assert(before("stg_customers", "customers"))
    assert(before("stg_orders", "customers"))
    assert(before("stg_payments", "orders"))
    val cyclic = new graft.model.Registry(Seq(
      graft.model.Model("a", Seq("b"), graft.model.Materialization.View, _("b")),
      graft.model.Model("b", Seq("a"), graft.model.Materialization.View, _("a"))))
    intercept[IllegalArgumentException](cyclic.topoOrder)
  }

  test("renderDocs carries the reference doc blocks: status taxonomy verbatim from models/docs.md, overview, doc-ref resolution") {
    val catalog = Jaffle.registry.renderDocs
    // the `{% docs orders_status %}` table, re-parsed from the REFERENCE
    // file itself so drift in either direction fails: every (status,
    // description) row of models/docs.md:1-14 must appear in the render
    val docsMd = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/models/docs.md")), "UTF-8")
    val refRows = docsMd.linesIterator
      .filter(l => l.startsWith("|") && !l.startsWith("|--") && !l.contains("description"))
      .map(_.split("\\|").map(_.trim).filter(_.nonEmpty))
      .collect { case Array(status, desc) => (status, desc) }
      .toSeq
    assert(refRows.map(_._1) === Jaffle.OrderStatuses,
      "the taxonomy's statuses must match the reference block, in order")
    refRows.foreach { case (status, desc) =>
      assert(catalog.contains(s"| $status | $desc |"),
        s"rendered catalog is missing the reference's doc row for '$status'")
    }
    // the orders.status column doc resolves THROUGH the named block (the
    // `{{ doc("orders_status") }}` reference form), with the multi-line
    // block rendered as its own section
    assert(catalog.contains("### orders.status"))
    assert(catalog.contains("Orders can be one of the following statuses:"))
    assert(!catalog.contains("""doc("orders_status")"""),
      "the doc reference must resolve, not render literally")
    // the `__overview__` analog (models/overview.md:1-11) heads the catalog
    assert(catalog.contains("## Data Documentation for Jaffle Shop"))
    assert(catalog.contains("`jaffle_shop` is a fictional ecommerce store."))
    assert(catalog.indexOf("Data Documentation") < catalog.indexOf("## stg_"),
      "the overview must render before the model sections")
    // an unknown doc reference fails the render loudly (dbt compile error)
    val broken = new graft.model.Registry(Seq(
      graft.model.Model("m", Nil, graft.model.Materialization.View, _ => null,
        columnDocs = Map("c" -> """doc("nope")"""))))
    val e = intercept[IllegalArgumentException](broken.renderDocs)
    assert(e.getMessage.contains("nope"))
  }
}
