package graft.schema

import org.apache.spark.sql.types._

/** Pinned schemas for the reference seeds (never `inferSchema` at runtime).
  *
  * Types replicate what dbt's seed loader (agate) infers for
  * jaffle-shop-classic's three CSVs and what the reference's ER diagram
  * declares (reference: etc/dbdiagram_definition.txt:1-19 — int/date/varchar).
  * See SURVEY.md §1.3.
  */
object Schemas {

  /** reference: seeds/raw_customers.csv (header `id,first_name,last_name`). */
  val rawCustomers: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType)
  ))

  /** reference: seeds/raw_orders.csv (header `id,user_id,order_date,status`). */
  val rawOrders: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("user_id", IntegerType),
    StructField("order_date", DateType),
    StructField("status", StringType)
  ))

  /** reference: seeds/raw_payments.csv (header `id,order_id,payment_method,amount`).
    * `amount` is in cents (reference: models/staging/stg_payments.sql:18).
    */
  val rawPayments: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("order_id", IntegerType),
    StructField("payment_method", StringType),
    StructField("amount", IntegerType)
  ))

  /** Money type for cents→dollars conversion (SURVEY.md §1.4): exact decimal,
    * not double — bit-stable for money at 100 TB scale.
    */
  val money: DecimalType = DecimalType(16, 2)
}
