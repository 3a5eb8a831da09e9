package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's testdata tables under /root/testdata/sf{N}
  * (one parquet per table — see TESTDATA.md / FIXTURES.md).
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // round-7 testdata stores every timestamp as TIMESTAMP(MICROS,
    // isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ by
    // default — but the engine (and the DuckDB oracle comparison path,
    // proven over six rounds) is built on TIMESTAMP in a UTC-pinned
    // session: unix_micros/window/watermark all require the LTZ type.
    // Disabling NTZ inference reads the same micros as LTZ instants —
    // in a UTC session the wall-clock values are identical, so this is
    // a type-level normalization, not a value change.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Historically events.ts was parquet TIMESTAMP(NANOS), which Spark's
    * schema converter rejects outright — so this reads the raw nanos as
    * long (legacy conf) and converts with integer division — NOT `/`
    * (double division would lose precision: epoch-nanos ≈ 1.7e18 exceeds
    * double's 2^53 exact-integer range). Truncation matches DuckDB's own
    * ns→µs handling bit-for-bit. Round-7 testdata regenerated ts as
    * TIMESTAMP(MICROS), which Spark reads natively — the conversion is
    * now type-gated so BOTH generations of the data load identically
    * (same pattern as EventStreams.eventParquetStream and st4's sentinel).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
}
