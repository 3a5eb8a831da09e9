package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{Materialization, Model, Registry}
import graft.schema.Schemas

/** The five jaffle-shop models re-expressed as pure DataFrame
  * transformations (SURVEY.md §2). Each function cites the reference model
  * it reproduces; none of it is a translation — the SQL semantics are
  * re-derived in the DataFrame API and left declarative so Catalyst owns
  * planning (SURVEY.md §4).
  */
object Jaffle {

  /** The static pivot dimension — the engine's single source of truth for
    * payment methods, shared by the orders pivot and the accepted_values
    * test (reference: orders.sql:1 `{% set payment_methods = [...] %}`,
    * models/staging/schema.yml:30-31).
    */
  val PaymentMethods: Seq[String] = Seq("credit_card", "coupon", "bank_transfer", "gift_card")

  /** Order-status taxonomy (reference: models/schema.yml:56-57 and the
    * status doc block at models/docs.md:1-14). */
  val OrderStatuses: Seq[String] = Seq("placed", "shipped", "completed", "return_pending", "returned")

  /** Per-status descriptions — the `{% docs orders_status %}` block's
    * table rows (reference: models/docs.md:1-14, verbatim including the
    * reference's own "has ben shipped" typo — this is ported METADATA,
    * not prose of ours). Keyed off [[OrderStatuses]] so the taxonomy has
    * one source of truth; the zip is order-aligned by construction. */
  val OrderStatusDocs: Map[String, String] = OrderStatuses.zip(Seq(
    "The order has been placed but has not yet left the warehouse",
    "The order has ben shipped to the customer and is currently in transit",
    "The order has been received by the customer",
    "The customer has indicated that they would like to return the order, but it has not yet been received at the warehouse",
    "The order has been returned by the customer and received at the warehouse"
  )).toMap

  /** The named doc blocks the registry renders — `{% docs %}` analogs.
    * `orders_status` reproduces the reference's status table
    * (models/docs.md:1-14); the overview reproduces
    * models/overview.md:1-11's `__overview__` block. */
  val DocBlocks: Map[String, String] = Map(
    "orders_status" -> (
      "Orders can be one of the following statuses:\n\n" +
        "| status | description |\n|---|---|\n" +
        OrderStatuses.map(s => s"| $s | ${OrderStatusDocs(s)} |").mkString("\n")))

  val Overview: String =
    """## Data Documentation for Jaffle Shop
      |
      |`jaffle_shop` is a fictional ecommerce store.
      |
      |This project re-expresses the dbt demo's models as a Spark-native
      |registry; the source models are the five under the reference's
      |`models/` directory.""".stripMargin

  /** reference: models/staging/stg_customers.sql:13-16 — rename projection
    * `id -> customer_id`. */
  def stgCustomers(rawCustomers: DataFrame): DataFrame =
    rawCustomers.select(
      col("id").as("customer_id"),
      col("first_name"),
      col("last_name")
    )

  /** reference: models/staging/stg_orders.sql:13-17 — rename projection
    * `id -> order_id`, `user_id -> customer_id`. */
  def stgOrders(rawOrders: DataFrame): DataFrame =
    rawOrders.select(
      col("id").as("order_id"),
      col("user_id").as("customer_id"),
      col("order_date"),
      col("status")
    )

  /** reference: models/staging/stg_payments.sql:13-19 — rename projection
    * plus cents→dollars (`amount / 100 as amount`, line 18-19).
    * Deliberate semantics (SURVEY.md §1.4/§7.5): exact DecimalType(16,2),
    * not Spark's default int/int→double.
    */
  def stgPayments(rawPayments: DataFrame): DataFrame =
    rawPayments.select(
      col("id").as("payment_id"),
      col("order_id"),
      col("payment_method"),
      (col("amount") / lit(100)).cast(Schemas.money).as("amount")
    )

  /** reference: models/customers.sql — customer 360 mart.
    *
    * CTE `customer_orders` (lines 21-29): per-customer min/max order date +
    * order count. CTE `customer_payments` (lines 33-44): payments left-join
    * orders, then sum amount grouped by the *right side's* customer_id —
    * kept as a left join so a payment with no order would surface in a
    * NULL-key group rather than vanish (SURVEY.md §2.3 J1). Final (lines
    * 46-69): customers left-join both aggregates; the 38 orderless
    * customers keep NULL aggregates — including NULL (not 0)
    * `number_of_orders` — exactly as the reference does (SURVEY.md §1.2).
    *
    * Scale: both aggregates shuffle on customer_id; Catalyst plans
    * partial+final hash aggregation, and the two joins share the
    * customer_id key so AQE can pick broadcast vs sort-merge per actual
    * sizes. No hints needed (SURVEY.md §4).
    */
  def customers(stgCustomers: DataFrame, stgOrders: DataFrame, stgPayments: DataFrame): DataFrame = {
    val customerOrders = stgOrders
      .groupBy("customer_id")
      .agg(
        min("order_date").as("first_order"),
        max("order_date").as("most_recent_order"),
        count("order_id").as("number_of_orders")
      )

    val customerPayments = stgPayments
      .join(stgOrders.select("order_id", "customer_id"), Seq("order_id"), "left")
      .groupBy("customer_id")
      .agg(sum("amount").as("total_amount"))

    stgCustomers
      .join(customerOrders, Seq("customer_id"), "left")
      .join(customerPayments, Seq("customer_id"), "left")
      .select(
        col("customer_id"),
        col("first_name"),
        col("last_name"),
        col("first_order"),
        col("most_recent_order"),
        col("number_of_orders"),
        col("total_amount").as("customer_lifetime_value") // customers.sql:57
      )
  }

  /** reference: models/orders.sql — order mart with fixed-width payment
    * pivot.
    *
    * The Jinja loop (orders.sql:20-22) becomes a Scala map over
    * [[PaymentMethods]] — a *statically declared* pivot, deliberately not
    * `groupBy().pivot()` whose column set is data-driven: a method with no
    * payments must still produce a column of 0s, and the output schema must
    * never depend on the data (SURVEY.md §2.4 A6). `else 0` semantics give
    * 0 (not NULL) for unused methods; an order with no payments at all
    * keeps NULLs from the left join (orders.sql:48-52).
    */
  def orders(stgOrders: DataFrame, stgPayments: DataFrame): DataFrame = {
    val methodAmounts = PaymentMethods.map { m =>
      sum(when(col("payment_method") === m, col("amount")).otherwise(lit(0)))
        .as(s"${m}_amount") // orders.sql:20-22
    }
    val orderPayments = stgPayments
      .groupBy("order_id")
      .agg(methodAmounts.head, (methodAmounts.tail :+ sum(col("amount")).as("total_amount")): _*)

    stgOrders
      .join(orderPayments, Seq("order_id"), "left")
      .select(
        (Seq(col("order_id"), col("customer_id"), col("order_date"), col("status")) ++
          PaymentMethods.map(m => col(s"${m}_amount")) :+
          col("total_amount").as("amount")): _* // orders.sql:46
      )
  }

  /** The full jaffle-shop DAG as a [[Registry]] — staging as views, marts
    * as tables (reference: dbt_project.yml:23-27), edges per SURVEY.md §3.2.
    */
  def registry: Registry = new Registry(Seq(
    Model("stg_customers", Seq("raw_customers"), Materialization.View,
      refs => stgCustomers(refs("raw_customers"))),
    Model("stg_orders", Seq("raw_orders"), Materialization.View,
      refs => stgOrders(refs("raw_orders"))),
    Model("stg_payments", Seq("raw_payments"), Materialization.View,
      refs => stgPayments(refs("raw_payments"))),
    Model("customers", Seq("stg_customers", "stg_orders", "stg_payments"), Materialization.Table,
      refs => customers(refs("stg_customers"), refs("stg_orders"), refs("stg_payments")),
      columnDocs = Map(
        "customer_id" -> "Unique identifier for a customer",
        "first_order" -> "Date of the customer's first order",
        "most_recent_order" -> "Date of the customer's most recent order",
        "number_of_orders" -> "Count of the customer's orders (NULL if none)",
        "customer_lifetime_value" -> "Total amount the customer has paid"
      ),
      // the dashboard's usual access path is a customer_id point lookup
      // or range: range-cluster the mart and commit stats so state-aware
      // builds land skippable (graft.model.TableLayout — the cluster_by
      // config analog; irrelevant to the 100-row demo's cost, the point
      // is the declared-once layout surface)
      layout = graft.model.TableLayout(clusterBy = Seq("customer_id"))),
    Model("orders", Seq("stg_orders", "stg_payments"), Materialization.Table,
      refs => orders(refs("stg_orders"), refs("stg_payments")),
      columnDocs = Map(
        "order_id" -> "Unique identifier for an order",
        // the doc-block REFERENCE form — reference models/schema.yml:54
        // `description: '{{ doc("orders_status") }}'`
        "status" -> """doc("orders_status")""",
        "amount" -> "Total order amount (sum of payments, dollars)"
      ),
      layout = graft.model.TableLayout(clusterBy = Seq("order_date"),
        statsColumns = Seq("order_id")))
  ), docBlocks = DocBlocks, overview = Some(Overview))
}
