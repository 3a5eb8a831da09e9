package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-deterministic money sums — single source of truth for both the
  * Spark expression and its DuckDB SQL mirror.
  *
  * `round(sum(double), 2)` is NOT reproducible across engines: distributed
  * partial aggregation and a serial engine accumulate in different orders,
  * the two sums differ by ~1ulp, and occasionally that straddles a
  * rounding boundary (observed: 2/1500 groups at sf0.01). Accumulating in
  * DECIMAL(18,4) is exact and order-independent, so both engines produce
  * the *identical* decimal, and the final cast back to double is
  * deterministic.
  *
  * The per-row double→DECIMAL(18,4) cast CAN hit exact rounding ties on
  * dyadic values (0.03125 terminates with a 5 in the 5th decimal); both
  * Spark (HALF_UP) and DuckDB (half away from zero) resolve positive ties
  * upward, so the cast still agrees — that rounding-rule agreement, not
  * tie impossibility, is the invariant to preserve if either side changes.
  *
  * DECIMAL(18,4) holds ±10^14 — headroom for per-group sums at 100 TB
  * (Spark widens the accumulator to DECIMAL(28,4) anyway).
  */
object ExactSums {

  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** SQL mirror of [[dsum]] for the DuckDB oracle. */
  def dsumSql(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"

  /** [[dsum]] split into a reassociable pair, for manually pushing the
    * partial aggregate below a join (a rewrite Catalyst does not do):
    * `dsumPartial` at the fine grouping, `dsumFinal` over the partials at
    * the final grouping. Decimal addition is exact and associative, so
    * sum-of-partials ≡ one flat [[dsum]] bit-for-bit — the same oracle
    * SQL keeps matching. (Spark widens the partial to DECIMAL(28,4) and
    * the final to DECIMAL(38,4): overflow headroom at any realistic SF.)
    */
  def dsumPartial(c: Column): Column = sum(c.cast(DecimalType(18, 4)))
  def dsumFinal(partial: Column): Column = sum(partial).cast("double")

  /** Exact order-independent AVERAGE: [[dsum]] divided by the row count
    * as DOUBLES. Both operands are engine-identical (the decimal sum is
    * exact; the count is an integer) and IEEE double division is
    * deterministic, so both engines produce the identical double —
    * unlike a running double-sum average, whose accumulation order
    * differs between a distributed and a serial engine. Dividing the
    * DECIMALs instead would hit the engines' different decimal-division
    * scale rules; double-then-divide sidesteps that. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** SQL mirror of [[davg]] for the DuckDB oracle. */
  def davgSql(expr: String): String = s"(${dsumSql(expr)} / count(*))"
}
