package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * PREFER AQE: Spark's OptimizeSkewedJoin splits hot partitions of
  * shuffle joins at runtime with no code change (demonstrated live in
  * PlanAuditSpec "AQE splits a skewed shuffle join"); reach for explicit
  * salting only where AQE cannot rewrite — a skew-keyed AGGREGATION
  * (with or without a join after it), a join shape AQE won't touch
  * (e.g. inside a cogroup), or a dimension too big to broadcast where
  * you need the spread decided at write time (the classic hot-user /
  * hot-item 100 TB failure mode).
  *
  * [[saltedJoin]] implements the standard two-sided trick: the fact side
  * gets a deterministic per-row salt in [0, factor); the dimension side is
  * replicated `factor` ways so every (key, salt) pair finds its match. Hot
  * keys then spread over `factor` reducers instead of one. Result equals
  * the plain equi-join exactly (verified by spec).
  */
object SkewOps {

  /** Inner equi-join of fact ⋈ dim on `key`, with the fact side salted
    * `factor` ways. `saltSource` must be a column (or expression) that
    * varies within a hot key — a row id, an event id, any high-cardinality
    * attribute — so rows of one key spread across salts deterministically.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltSource: Column,
      factor: Int = 8
  ): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltSource), lit(factor)).cast("int"))
    val replicated = dim.withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
