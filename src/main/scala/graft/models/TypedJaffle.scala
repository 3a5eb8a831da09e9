package graft.models

import java.sql.Date

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed case-class surface for the jaffle entities (SURVEY §1.4): all
  * columns are primitives, so Encoders are trivial and a schema change
  * becomes a compile error for downstream code.
  *
  * Idiom note: transformations stay in the COLUMN algebra
  * (`select(...).as[T]`), not `Dataset.map` — the typed view is a schema
  * contract at the API boundary; execution remains columnar Catalyst with
  * full pushdown/codegen. `.map` with JVM lambdas would deserialize every
  * row and is reserved for genuine per-row imperative logic (see
  * MultimodalOps.decodeImage).
  */
object TypedJaffle {

  final case class RawCustomer(id: Int, first_name: Option[String], last_name: Option[String])
  final case class RawOrder(id: Int, user_id: Option[Int], order_date: Option[Date], status: Option[String])
  final case class RawPayment(id: Int, order_id: Option[Int], payment_method: Option[String], amount: Option[Int])

  final case class StgCustomer(customer_id: Int, first_name: Option[String], last_name: Option[String])
  final case class StgOrder(order_id: Int, customer_id: Option[Int], order_date: Option[Date], status: Option[String])
  final case class StgPayment(payment_id: Int, order_id: Option[Int], payment_method: Option[String],
      amount: Option[BigDecimal])

  def rawCustomers(spark: SparkSession, seedDir: String): Dataset[RawCustomer] = {
    import spark.implicits._
    graft.seed.SeedLoader.loadCsv(spark, s"$seedDir/raw_customers.csv",
      graft.schema.Schemas.rawCustomers).as[RawCustomer]
  }

  def stgCustomers(raw: Dataset[RawCustomer]): Dataset[StgCustomer] = {
    import raw.sparkSession.implicits._
    Jaffle.stgCustomers(raw.toDF()).as[StgCustomer]
  }

  def stgOrders(raw: Dataset[RawOrder]): Dataset[StgOrder] = {
    import raw.sparkSession.implicits._
    Jaffle.stgOrders(raw.toDF()).as[StgOrder]
  }

  def stgPayments(raw: Dataset[RawPayment]): Dataset[StgPayment] = {
    import raw.sparkSession.implicits._
    Jaffle.stgPayments(raw.toDF()).as[StgPayment]
  }

  /** Typed end-to-end example: per-status order counts through the typed
    * aggregation API (groupByKey/count — deserializing, so reserved for
    * demos and genuine per-object logic; the relational marts remain
    * DataFrame-based, see Jaffle.orders).
    */
  final case class StatusCount(status: String, n: Long)

  def ordersByStatus(stg: Dataset[StgOrder]): Dataset[StatusCount] = {
    import stg.sparkSession.implicits._
    stg.groupByKey(_.status.getOrElse("unknown"))
      .count()
      .map { case (status, n) => StatusCount(status, n) }
  }
}
