package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality operators — the engine's equivalent of dbt's
  * four schema-test macros (SURVEY.md §2.6). Each returns the *violating
  * rows*; a check passes iff the result is empty, exactly dbt's
  * rows-returned = failures contract.
  *
  * Scale notes: every check is a single distributed pass —
  * `unique` is a partial+final hash aggregation, `relationships` a
  * left-anti join the planner can broadcast when the parent's keys are
  * small. `passes` uses `isEmpty` (limit-1 under the hood), not count().
  */
object Checks {

  /** dbt `unique` (used e.g. reference: models/schema.yml:11): keys
    * appearing more than once, NULLs exempt. */
  def unique(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNotNull)
      .groupBy(col(column))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** dbt `not_null` (reference: models/schema.yml:12 et al.): rows with a
    * NULL in the column. */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** dbt `accepted_values` (reference: models/schema.yml:56-57): distinct
    * non-NULL values outside the accepted set (NULLs pass, matching dbt). */
  def acceptedValues(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    df.filter(col(column).isNotNull && !col(column).isin(values: _*))
      .select(col(column))
      .distinct()

  /** dbt `relationships` (reference: models/schema.yml:46-48): child FK
    * values with no matching parent PK — a left-anti join. NULL FKs pass.
    */
  def relationships(child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame = {
    val parentKeys = parent.select(col(pk).as("__parent_key")).distinct()
    child
      .filter(col(fk).isNotNull)
      .join(parentKeys, col(fk) === col("__parent_key"), "left_anti")
  }

  /** dbt `source freshness` analog (sources.yml `loaded_at_field` +
    * `warn_after`/`error_after`): per group, the newest record
    * timestamp, its staleness against an anchor instant, and the
    * pass/warn/error verdict. The anchor defaults to the newest
    * timestamp in the whole table, so the check is deterministic and
    * replayable; production callers pass the wall clock as `anchor`.
    * The verdict compares the UN-FLOORED microsecond staleness
    * strictly-greater against the thresholds — dbt's rule: a source
    * exactly `warn_after` old still passes, it warns only strictly
    * after (flooring to minutes first would have warned a
    * boundary-age source a full minute early). The reported
    * `staleness_minutes` column is still floored integer minutes for
    * display; only the verdict uses microseconds, so the compare has
    * no float rounding anywhere. One hash aggregate + a 1-row
    * broadcast — the check costs one scan however many groups there
    * are.
    */
  def sourceFreshness(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      warnAfterMinutes: Long,
      errorAfterMinutes: Long,
      anchor: Option[Column] = None): DataFrame = {
    require(warnAfterMinutes <= errorAfterMinutes,
      "warn_after must not exceed error_after")
    val latest = df.groupBy(col(groupCol)).agg(max(col(tsCol)).as("latest_ts"))
    val withAnchor = anchor match {
      case Some(a) => latest.withColumn("__anchor", a)
      case None => latest.crossJoin(broadcast(df.agg(max(col(tsCol)).as("__anchor"))))
    }
    withAnchor
      .withColumn("__stale_us",
        expr("unix_micros(__anchor) - unix_micros(latest_ts)"))
      .withColumn("staleness_minutes", expr("__stale_us div 60000000"))
      .withColumn("freshness_status",
        when(col("__stale_us") <= lit(warnAfterMinutes * 60000000L), "pass")
          .when(col("__stale_us") <= lit(errorAfterMinutes * 60000000L), "warn")
          .otherwise("error"))
      .drop("__anchor", "__stale_us")
  }

  /** A named check bound to a relation, for declarative suites. */
  final case class Check(name: String, violations: () => DataFrame) {
    def passes: Boolean = violations().isEmpty
  }

  /** Build the reference's full 20-test suite against resolved relations
    * (SURVEY.md §5 — models/staging/schema.yml 8 tests +
    * models/schema.yml 12 tests).
    */
  def jaffleSuite(rel: Map[String, DataFrame]): Seq[Check] = {
    import graft.models.Jaffle.{OrderStatuses, PaymentMethods}
    def c(name: String)(v: => DataFrame) = Check(name, () => v)
    Seq(
      // models/staging/schema.yml
      c("stg_customers.customer_id.unique")(unique(rel("stg_customers"), "customer_id")),
      c("stg_customers.customer_id.not_null")(notNull(rel("stg_customers"), "customer_id")),
      c("stg_orders.order_id.unique")(unique(rel("stg_orders"), "order_id")),
      c("stg_orders.order_id.not_null")(notNull(rel("stg_orders"), "order_id")),
      c("stg_orders.status.accepted_values")(acceptedValues(rel("stg_orders"), "status", OrderStatuses)),
      c("stg_payments.payment_id.unique")(unique(rel("stg_payments"), "payment_id")),
      c("stg_payments.payment_id.not_null")(notNull(rel("stg_payments"), "payment_id")),
      c("stg_payments.payment_method.accepted_values")(
        acceptedValues(rel("stg_payments"), "payment_method", PaymentMethods)),
      // models/schema.yml
      c("customers.customer_id.unique")(unique(rel("customers"), "customer_id")),
      c("customers.customer_id.not_null")(notNull(rel("customers"), "customer_id")),
      c("orders.order_id.unique")(unique(rel("orders"), "order_id")),
      c("orders.order_id.not_null")(notNull(rel("orders"), "order_id")),
      c("orders.customer_id.not_null")(notNull(rel("orders"), "customer_id")),
      c("orders.customer_id.relationships")(
        relationships(rel("orders"), "customer_id", rel("customers"), "customer_id")),
      c("orders.status.accepted_values")(acceptedValues(rel("orders"), "status", OrderStatuses)),
      c("orders.amount.not_null")(notNull(rel("orders"), "amount"))
    ) ++ PaymentMethods.map { m =>
      c(s"orders.${m}_amount.not_null")(notNull(rel("orders"), s"${m}_amount"))
    }
  }
}
