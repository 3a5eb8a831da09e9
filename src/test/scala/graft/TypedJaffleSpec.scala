package graft

import graft.models.TypedJaffle
import graft.models.TypedJaffle._
import graft.seed.SeedLoader

/** The typed surface must be a pure view over the untyped models — same
  * rows, compile-checked schema. */
class TypedJaffleSpec extends SparkSpec {
  import spark.implicits._

  private val seedDir = "/root/reference/seeds"

  test("typed staging datasets carry the same rows as the DataFrame models") {
    val rawC = TypedJaffle.rawCustomers(spark, seedDir)
    val typed: Seq[StgCustomer] = TypedJaffle.stgCustomers(rawC).collect().toSeq
    assert(typed.size === 100)
    assert(typed.map(_.customer_id).distinct.size === 100)
    // field-level access is compile-checked; spot value from the CSV
    assert(typed.find(_.customer_id == 1).get.first_name === Some("Michael"))
  }

  test("typed payments expose money as BigDecimal after the cents cast") {
    val raw = SeedLoader.loadCsv(spark, s"$seedDir/raw_payments.csv",
      graft.schema.Schemas.rawPayments).as[RawPayment]
    val pays = TypedJaffle.stgPayments(raw).collect()
    assert(pays.length === 113)
    val p1 = pays.find(_.payment_id == 1).get
    assert(p1.amount === Some(BigDecimal("10.00"))) // 1000 cents
  }

  test("typed aggregation example produces the status histogram") {
    val raw = SeedLoader.loadCsv(spark, s"$seedDir/raw_orders.csv",
      graft.schema.Schemas.rawOrders).as[RawOrder]
    val counts = TypedJaffle.ordersByStatus(TypedJaffle.stgOrders(raw))
      .collect().map(c => c.status -> c.n).toMap
    assert(counts("completed") === 67L) // SURVEY §1.2 distribution
    assert(counts.values.sum === 99L)
  }
}
